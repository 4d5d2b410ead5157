package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Engine-side invariants for the round-10 planning/ordering additions —
  * q198 (leakage-safe cluster split), q199 (token-budget epoch planner),
  * q200 (deterministic epoch shuffle), q201 (score-vs-rules
  * calibration). The DuckDB hash gate is the oracle; these pin the
  * semantic properties the gate can't express: conservation (every doc
  * accounted for exactly once), the planner's arithmetic identities,
  * contiguous per-shard positions, and the monotonicity the
  * construction guarantees.
  */
class PlannerShuffleSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"
  private lazy val spark = graft.Engine.session("test")

  private def docCount: Long =
    graft.Engine.table(spark, dir, "documents").count()

  test("q198: conservation, majority-train, and a real near-dup correction") {
    val rows = graft.SparkEntry
      .queries("q198_leakage_split")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).sorted.toSeq == Seq("test", "train", "val"))
    val total = docCount
    assert(rows.map(_._2).sum == total, "every doc lands in exactly one split")
    val train = rows.find(_._1 == "train").get
    assert(train._2 > rows.filter(_._1 != "train").map(_._2).sum, "train majority")
    rows.foreach { case (sp, nDocs, nClusters, chars, moved) =>
      assert(nClusters <= nDocs, s"$sp: more clusters than docs")
      assert(moved <= nDocs && moved >= 0, s"$sp: moved out of range")
      assert(chars > 0, s"$sp: empty split")
    }
    // sf0.01 has verified near-dup pairs (q52's gate depends on them),
    // so at least one cluster must be multi-doc somewhere
    assert(rows.map(r => r._2 - r._3).sum > 0, "no multi-doc cluster found")
    graft.Engine.releaseScratch(spark)
  }

  test("q199: planner arithmetic identities hold exactly") {
    val rows = graft.SparkEntry
      .queries("q199_token_budget")(spark, dir)
      .collect()
      .map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5), r.getLong(6)))
    val budget = 3L * rows.map(_._2).sum
    // each target is round(budget * p / tp): per-source error < 0.5, so
    // the plan's total allocation is within nSources/2 of the budget
    assert(math.abs(rows.map(_._4).sum - budget) <= rows.length, s"allocation drifts from budget")
    val wsum = rows.map(_._3).sum
    assert(math.abs(wsum - 1.0) <= 5e-7 * rows.length, s"weights sum $wsum")
    rows.foreach { case (src, n, _, target, epochs, capped, deficit) =>
      val e = BigDecimal(target.toDouble / n.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(epochs == e, s"$src: epochs $epochs != recomputed $e")
      assert(capped == math.min(epochs, 4.0), s"$src: cap mismatch")
      assert(deficit == target - math.min(target, 4L * n), s"$src: deficit mismatch")
      assert(deficit >= 0 && target > 0)
    }
    graft.Engine.releaseScratch(spark)
  }

  test("q200: a permutation — every doc once, contiguous per-shard positions") {
    val df = graft.SparkEntry.queries("q200_epoch_shuffle")(spark, dir)
    val total = docCount
    assert(df.count() == total)
    assert(df.select(col("doc_id")).distinct().count() == total, "doc repeated or dropped")
    val perShard = df
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("c"),
        min(col("pos")).as("lo"),
        max(col("pos")).as("hi"),
        countDistinct(col("pos")).as("dp"))
      .collect()
    assert(perShard.nonEmpty && perShard.length <= 16)
    perShard.foreach { r =>
      val (sh, c, lo, hi, dp) =
        (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(sh >= 0 && sh < 16, s"shard $sh out of range")
      assert(lo == 1L && hi == c && dp == c, s"shard $sh: positions not contiguous 1..$c")
    }
    // stable placement: the shard column IS Layout.shardOf(doc_id, 16) —
    // epoch salt changes order, never placement
    val misplaced = df
      .withColumn("expect", graft.operators.Layout.shardOf(col("doc_id"), 16))
      .filter(col("shard") =!= col("expect"))
      .count()
    assert(misplaced == 0)
    graft.Engine.releaseScratch(spark)
  }

  test("q205: unordered pairs normalized, counts consistent with the q52 pair graph") {
    val rows = graft.SparkEntry
      .queries("q205_source_overlap")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty, "no overlap found — sf0.01 has verified near-dup pairs")
    rows.foreach { case (a, b, p, da, db) =>
      assert(a <= b, s"pair ($a,$b) not normalized")
      assert(p >= 1 && da >= 1 && db >= 1 && da <= p && db <= p, s"($a,$b): $p/$da/$db")
    }
    // the matrix is a partition of the verified pair list: totals match
    val totalPairs = graft.SparkEntry
      .queries("q52_minhash_lsh")(spark, dir)
      .count()
    assert(rows.map(_._3).sum == totalPairs, "matrix drops or double-counts pairs")
    graft.Engine.releaseScratch(spark)
  }

  test("q201: exact deciles, ordered boundaries, monotone classifier rate") {
    val rows = graft.SparkEntry
      .queries("q201_score_calibration")(spark, dir)
      .collect()
      .map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.map(_._1).toSeq == (0L to 9L), "exactly deciles 0..9")
    // decile sizes from exact rank arithmetic differ by at most 1
    assert(rows.map(_._2).max - rows.map(_._2).min <= 1)
    // boundaries partition the logit axis in order
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 <= b._3, s"decile ${a._1} max ${a._4} > decile ${b._1} min ${b._3}")
    }
    // verdict = (logit >= 0) and deciles are ordered by logit, so the
    // classifier keep rate is nondecreasing BY CONSTRUCTION
    assert(rows.map(_._5).sliding(2).forall { case Array(a, b) => a <= b })
    rows.foreach { r =>
      assert(r._5 >= 0 && r._5 <= 1000000 && r._6 >= 0 && r._6 <= 1000000)
    }
    // the independent rule signal must not be vacuous on the gated corpus
    assert(rows.map(_._6).distinct.length > 1, "rule curve is flat — audit says nothing")
    graft.Engine.releaseScratch(spark)
  }
}
