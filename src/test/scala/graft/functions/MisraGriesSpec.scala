package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** The Misra-Gries guarantee, checked directly on the sketch operations
  * (no Spark): after any sequence of reduce/merge, every item whose true
  * frequency exceeds n/(k+1) is present in the summary.
  */
class MisraGriesSpec extends AnyFunSuite {

  private def run(k: Int, streams: Seq[Seq[String]]): Seq[String] = {
    val mg = new MisraGries(k)
    // sketch each partition independently, then merge — the distributed shape
    val partials = streams.map(st => st.foldLeft(mg.zero)((b, x) => mg.reduce(b, ("g", x))))
    mg.finish(partials.foldLeft(mg.zero)(mg.merge))
  }

  test("guaranteed: items above n/(k+1) always survive partitioned reduce + merge") {
    val rnd = new Random(42)
    for (trial <- 1 to 20) {
      val k = 8
      // a skewed stream: few heavy items + long uniform tail
      val heavy = Seq.fill(400)(s"h${rnd.nextInt(2)}")
      val tail = Seq.fill(600)(s"t${rnd.nextInt(200)}")
      val all = rnd.shuffle(heavy ++ tail)
      val parts = all.grouped(all.length / 4 + 1).toSeq
      val got = run(k, parts).toSet
      val n = all.length
      val exact = all.groupBy(identity).view.mapValues(_.size).toMap
      val mustSurvive = exact.collect { case (i, c) if c > n / (k + 1) => i }
      mustSurvive.foreach(i => assert(got.contains(i), s"trial $trial lost heavy item $i"))
      assert(got.size <= k, s"trial $trial summary exceeded k")
    }
  }

  test("uniform stream never inflates the summary beyond k") {
    val all = (1 to 1000).map(i => s"u${i % 300}")
    val got = run(16, all.grouped(97).toSeq)
    assert(got.size <= 16)
  }
}
