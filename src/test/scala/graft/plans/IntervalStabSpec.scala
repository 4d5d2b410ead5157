package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The interval-stab join (custom SparkStrategy + SparkPlan) must be a
  * pure plan substitution: identical results to the nested-loop
  * semantics on adversarial data (duplicates, containment, empty and
  * point intervals, nulls, boundary hits), engage only where it wins,
  * and stand down for patterns other strategies own.
  */
class IntervalStabSpec extends AnyFunSuite {
  private lazy val spark = graft.Engine.session("test")
  import spark.implicits._

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** Random intervals incl. empties (lo > hi), points, duplicates,
    * nulls; points incl. exact boundary values and nulls.
    */
  private def fixtures(seed: Int) = {
    val rnd = new scala.util.Random(seed)
    val intervals = (0 until 300).map { i =>
      val lo = rnd.nextInt(1000) - 500
      val len = rnd.nextInt(8) match {
        case 0 => 0              // point/empty interval
        case 1 => -5             // inverted (always empty)
        case _ => rnd.nextInt(200)
      }
      (i.toLong,
        if (rnd.nextInt(20) == 0) None else Some(lo.toDouble),
        if (rnd.nextInt(20) == 0) None else Some((lo + len).toDouble))
    }
    val points = (0 until 2000).map { i =>
      // hit interval boundaries often so inclusive/exclusive edges are
      // actually exercised
      val v = intervals(rnd.nextInt(intervals.size))._2
        .map(_ + (if (rnd.nextBoolean()) 0.0 else rnd.nextInt(5) - 2))
      (i.toLong, if (rnd.nextInt(25) == 0) None else v)
    }
    (points, intervals)
  }

  private def brute(
      points: Seq[(Long, Option[Double])],
      intervals: Seq[(Long, Option[Double], Option[Double])],
      loIncl: Boolean,
      hiIncl: Boolean): Set[(Long, Long)] =
    (for {
      (pid, pOpt) <- points
      p <- pOpt.toSeq
      (iid, loOpt, hiOpt) <- intervals
      lo <- loOpt.toSeq
      hi <- hiOpt.toSeq
      if (if (loIncl) p >= lo else p > lo) && (if (hiIncl) p <= hi else p < hi)
    } yield (pid, iid)).toSet

  test("engages on a pure band join and matches brute-force on adversarial data") {
    val (points, intervals) = fixtures(11)
    val pdf = points.toDF("pid", "p")
    val idf = intervals.toDF("iid", "lo", "hi")
    for ((loIncl, hiIncl) <- Seq((true, false), (true, true), (false, false), (false, true))) {
      val loCond = if (loIncl) col("p") >= col("lo") else col("p") > col("lo")
      val hiCond = if (hiIncl) col("p") <= col("hi") else col("p") < col("hi")
      val joined = pdf.join(idf, loCond && hiCond)
      assert(planOf(joined).contains("IntervalStabJoin"), s"incl=($loIncl,$hiIncl)")
      val got = joined.select(col("pid"), col("iid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == brute(points, intervals, loIncl, hiIncl), s"incl=($loIncl,$hiIncl)")
    }
  }

  test("operand order and side order do not matter; residual conjuncts filter candidates") {
    val (points, intervals) = fixtures(23)
    val pdf = points.toDF("pid", "p")
    val idf = intervals.toDF("iid", "lo", "hi")
    // bounds written reversed (lo <= p, hi > p), intervals on the LEFT
    val joined = idf.join(pdf, col("lo") <= col("p") && col("hi") > col("p"))
    assert(planOf(joined).contains("IntervalStabJoin"))
    val got = joined.select(col("pid"), col("iid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute(points, intervals, loIncl = true, hiIncl = false))
    // a residual NON-equality conjunct must be applied per candidate
    // (an equality residual would correctly hand the whole join to
    // BroadcastHashJoin — covered by the stand-down test below)
    val withExtra = pdf.join(idf,
      col("p") >= col("lo") && col("p") < col("hi") && col("pid") =!= col("iid"))
    assert(planOf(withExtra).contains("IntervalStabJoin"))
    val gotExtra = withExtra.select(col("pid"), col("iid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expExtra = brute(points, intervals, loIncl = true, hiIncl = false)
      .filter { case (a, b) => a != b }
    assert(gotExtra == expExtra)
  }

  test("stands down when an equality conjunct exists (hash join owns it)") {
    val pdf = (0 until 100).map(i => (i.toLong, i % 7, i.toDouble)).toDF("pid", "k", "p")
    val idf = (0 until 20).map(i => (i.toLong, i % 7, i * 5.0, i * 5.0 + 20)).toDF("iid", "ik", "lo", "hi")
    val joined = pdf.join(idf,
      col("k") === col("ik") && col("p") >= col("lo") && col("p") < col("hi"))
    val plan = planOf(joined)
    assert(!plan.contains("IntervalStabJoin"), plan.take(1500))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"), plan.take(1500))
  }

  test("signed zero and NaN follow SQL comparison semantics, not Double.compareTo") {
    // Spark's nanSafeCompare treats -0.0 == 0.0 (Double.compareTo orders
    // -0.0 < 0.0) and NaN as greatest with NaN == NaN. The stab index
    // must agree with the BroadcastNestedLoopJoin it replaces on both.
    val intervals = Seq(
      (1L, 0.0, 1.0),
      (2L, -1.0, -0.0),
      (3L, -0.0, 0.5),
      (4L, 5.0, Double.NaN))
    val points = Seq((1L, -0.0), (2L, 0.0), (3L, 0.3), (4L, -0.5), (5L, Double.NaN))
    val idf = intervals.toDF("iid", "lo", "hi")
    val pdf = points.toDF("pid", "p")
    val joined = pdf.join(idf, col("p") >= col("lo") && col("p") <= col("hi"))
    assert(planOf(joined).contains("IntervalStabJoin"))
    val got = joined.select(col("pid"), col("iid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // SQL-semantics brute force: normalize -0.0 to 0.0, then
    // Double.compare (whose NaN handling already matches Spark's)
    def norm(d: Double) = if (d == 0.0) 0.0 else d
    def le(a: Double, b: Double) = java.lang.Double.compare(norm(a), norm(b)) <= 0
    val expected = (for {
      (pid, p) <- points
      (iid, lo, hi) <- intervals
      if le(lo, p) && le(p, hi)
    } yield (pid, iid)).toSet
    assert(got == expected)
    // the discriminating pairs: a -0.0 probe must stab a [0.0, _] interval
    assert(got.contains((1L, 1L)) && got.contains((2L, 2L)) && got.contains((5L, 4L)))
  }

  test("non-binary string collations are honored by the index ordering") {
    // UTF8_LCASE orders case-insensitively; binary UTF8String.compareTo
    // would put "C" (0x43) before "b" (0x62) and miss the match.
    val idf = Seq((1L, "b", "d"), (2L, "Apple", "cat"), (3L, "M", "z"))
      .toDF("iid", "lo", "hi")
      .select(col("iid"),
        collate(col("lo"), "UTF8_LCASE").as("lo"),
        collate(col("hi"), "UTF8_LCASE").as("hi"))
    val pdf = Seq((1L, "C"), (2L, "BANANA"), (3L, "n"), (4L, "aardvark"))
      .toDF("pid", "p")
      .select(col("pid"), collate(col("p"), "UTF8_LCASE").as("p"))
    val joined = pdf.join(idf, col("p") >= col("lo") && col("p") <= col("hi"))
    assert(planOf(joined).contains("IntervalStabJoin"))
    val got = joined.select(col("pid"), col("iid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // case-insensitive brute force (ASCII data, so lowercase+binary
    // compare is exactly UTF8_LCASE)
    val expected = (for {
      (pid, p) <- Seq((1L, "c"), (2L, "banana"), (3L, "n"), (4L, "aardvark"))
      (iid, lo, hi) <- Seq((1L, "b", "d"), (2L, "apple", "cat"), (3L, "m", "z"))
      if lo <= p && p <= hi
    } yield (pid, iid)).toSet
    assert(got == expected)
    assert(got.contains((1L, 1L)), "case-insensitive 'C' in ['b','d'] must match")
  }

  test("probe-side partitioning survives the join: no re-shuffle before a downstream agg") {
    val (points, intervals) = fixtures(31)
    val pdf = points.toDF("pid", "p").repartition(col("pid"))
    val idf = intervals.toDF("iid", "lo", "hi")
    val agg = pdf.join(idf, col("p") >= col("lo") && col("p") < col("hi"))
      .groupBy(col("pid")).count()
    agg.collect()
    // AQE's toString repeats the tree under "== Initial Plan ==" — count
    // exchanges in the executed (final) section only
    val plan = agg.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("IntervalStabJoin"), plan.take(1500))
    // exactly the one explicit repartition exchange: the join propagates
    // HashPartitioning(pid), so the groupBy(pid) adds no exchange
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n${plan.take(2000)}")
  }

  test("timestamp points stab timestamp intervals") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(mins: Int) = new java.sql.Timestamp(base.getTime + mins * 60000L)
    val iv = (0 until 10).map(i => (i.toLong, ts(i * 60), ts(i * 60 + 90))).toDF("iid", "lo", "hi")
    val pt = (0 until 200).map(i => (i.toLong, ts(i * 3))).toDF("pid", "p")
    val joined = pt.join(iv, col("p") >= col("lo") && col("p") < col("hi"))
    assert(planOf(joined).contains("IntervalStabJoin"))
    // overlapping 90-min windows every 60 min: interior points hit 1-2
    val perPoint = joined.groupBy(col("pid")).count().collect().map(_.getLong(1))
    assert(perPoint.nonEmpty && perPoint.forall(n => n >= 1 && n <= 2))
    val total = joined.count()
    // exact expectation from driver-side recomputation
    val expected = (0 until 200).map { i =>
      (0 until 10).count(j => i * 3 >= j * 60 && i * 3 < j * 60 + 90)
    }.sum
    assert(total == expected)
  }
}
