package graft.queries

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** q160 DSIR importance weights on a crafted fixture: a raw document
  * written in the target domain's vocabulary must outweigh one written
  * in a disjoint vocabulary — the ordering property importance
  * resampling relies on.
  */
class DsirSpec extends AnyFunSuite {
  private lazy val spark = graft.Engine.session("test")

  test("q160: target-vocabulary docs outweigh off-domain docs; weights are length-comparable") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("q160fix-").toString
    val rng = new scala.util.Random(7)
    def words(n: Int, vocab: Seq[String]) =
      (1 to n).map(_ => vocab(rng.nextInt(vocab.size))).mkString(" ")
    val targetVocab = (1 to 50).map(i => s"medical$i")
    val webVocab = (1 to 50).map(i => s"spam$i")
    val docs =
      // the target domain sample (source = src0)
      (1L to 20L).map(i => (i, words(60, targetVocab), "src0")) ++
        Seq(
          (100L, words(60, targetVocab), "src1"), // in-domain raw doc
          (101L, words(60, webVocab), "src1"),    // off-domain raw doc
          (102L, words(30, targetVocab) + " " + words(30, webVocab), "src1") // mixed
        )
    docs.toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val w = graft.SparkEntry
      .queries("q160_dsir_weights")(s, dir)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(2))
      .toMap
    info(s"weights: in-domain ${w(100L)}, mixed ${w(102L)}, off-domain ${w(101L)}")
    assert(w(100L) > w(102L), s"in-domain ${w(100L)} !> mixed ${w(102L)}")
    assert(w(102L) > w(101L), s"mixed ${w(102L)} !> off-domain ${w(101L)}")
    // only raw docs are scored
    assert(!w.contains(1L))

    // the resampling manifest: exactly ceil(3/5) = 1 doc sampled, and
    // the derandomized Gumbel draw is identical across runs
    def sample() = graft.SparkEntry
      .queries("q161_dsir_sample")(s, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getString(4)))
      .toSeq
    val run1 = sample()
    assert(run1.count(_._3 == "sampled") == 1, run1.mkString(", "))
    assert(sample() == run1, "the derandomized draw changed between runs")
  }
}
