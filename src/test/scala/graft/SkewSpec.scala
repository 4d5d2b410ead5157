package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join handling: a join where one key holds most of the fact
  * rows must have its oversized shuffle partition SPLIT at runtime
  * (OptimizeSkewedJoin marks the sort-merge join skew=true). This is
  * the runtime complement to EtlOps.saltedJoin — the two strategies a
  * 100 TB engine needs for skew; the spec proves the AQE path actually
  * engages rather than being config wishful thinking.
  */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = Engine.session("test")

  test("AQE splits the skewed partition of a sort-merge join (skew=true in the final plan)") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      // force a shuffle join and make "skewed" reachable at local scale
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256k")
      conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")

      // 95% of fact rows share key 0, padded with INCOMPRESSIBLE bytes
      // (the skew threshold meters compressed shuffle size — a constant
      // pad deflates to nothing and never trips it)
      val fact = spark
        .range(200000)
        .select(
          when(col("id") % 20 =!= 0, 0L).otherwise(col("id") % 100).as("k"),
          concat(md5(col("id").cast("string")), md5((col("id") + 7).cast("string")),
            md5((col("id") + 13).cast("string")), md5((col("id") + 31).cast("string"))).as("pad")
        )
      val dim = spark.range(100).select(col("id").as("k"), col("id").as("v"))
      // max(pad) keeps the pad column alive through the shuffle — column
      // pruning would otherwise drop it and deflate the hot partition
      // below the skew threshold
      val joined = fact
        .join(dim, "k")
        .groupBy(col("v"))
        .agg(count(lit(1)).as("n"), max(col("pad")).as("mp"))

      val rows = joined.collect()
      // correctness first: row count per key must match the skew exactly
      val hot = rows.find(_.getAs[Long]("v") == 0L).get.getAs[Long]("n")
      assert(hot == 190000L + 2000L, s"hot key count $hot")

      // the executed adaptive plan must have engaged the skew-join split
      val finalPlan = joined.queryExecution.executedPlan
        .collectFirst { case a: AdaptiveSparkPlanExec => a.executedPlan.toString }
        .getOrElse(joined.queryExecution.executedPlan.toString)
      assert(finalPlan.contains("skew=true"), finalPlan.take(1500))
    } finally {
      saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None)    => conf.unset(k)
      }
    }
  }
}
