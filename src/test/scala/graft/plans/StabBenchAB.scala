package graft.plans

import org.apache.spark.sql.functions._

/** One-off A/B for PERF.md: the interval-stab operator vs
  * BroadcastNestedLoopJoin on the q146 shape (price bands x orders),
  * swept over interval counts I = 1k / 10k / 100k. Band width shrinks
  * as 600000/I so the bands always tile the same price range and each
  * probe row matches ~1 band: per-row work is O(log I + 1) for the stab
  * index vs O(I) for BNLJ, so the gap must WIDEN roughly linearly in I
  * — the theory check the single I=1000 point couldn't make.
  * B forces BNLJ by zeroing the broadcast threshold (the stab strategy
  * declines) while keeping an explicit broadcast hint (so the builtin
  * planner still picks BNLJ, not a cartesian).
  */
object StabBenchAB {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session("stab-ab")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val orders = graft.Engine.table(spark, dir, "orders")
    def bands(i: Int) = {
      val w = 600000.0 / i
      spark
        .range(i)
        .select(col("id").as("band"), (col("id") * w).as("lo"), ((col("id") + 1) * w).as("hi"))
    }
    def run(label: String, i: Int, forceBnlj: Boolean): Unit = {
      val key = "spark.sql.autoBroadcastJoinThreshold"
      val prev = spark.conf.get(key)
      if (forceBnlj) spark.conf.set(key, "0")
      try {
        val b = if (forceBnlj) broadcast(bands(i)) else bands(i)
        val df = orders
          .join(b, col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
          .groupBy(col("band"))
          .agg(count(lit(1)).as("n"))
        df.count() // warm
        val times = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); df.count(); (System.nanoTime() - t0) / 1e9
        }
        val plan = df.queryExecution.executedPlan.toString
        val op =
          if (plan.contains("IntervalStabJoin")) "IntervalStabJoin"
          else if (plan.contains("BroadcastNestedLoopJoin")) "BroadcastNestedLoopJoin"
          else "other"
        println(f"AB $label%-12s op=$op%-24s min=${times.min}%.3f s runs=${times.map(t => f"$t%.3f").mkString(",")}")
      } finally spark.conf.set(key, prev)
    }
    for (i <- Seq(1000, 10000, 100000)) {
      run(s"stab-$i", i, forceBnlj = false)
      run(s"bnlj-$i", i, forceBnlj = true)
    }
    spark.stop()
  }
}
