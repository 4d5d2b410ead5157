package graft.queries

import org.apache.spark.sql.functions._

/** One-off for PERF.md: within-cluster pair volume of the SemDeDup
  * clustering (q147/q148) at each scale. With k = max(16, ceil(n/256))
  * the expected pair count is ~n·(256-1)/2 — LINEAR in n; a fixed k=16
  * would give n²·15/512 — quadratic. Run over several sf dirs and the
  * pairs column must grow ~proportionally to n, not n².
  *
  *   sbt "Test/runMain graft.queries.SemDedupPairCount /root/testdata/sf0.01 /root/testdata/sf0.1 target/sf1"
  */
object SemDedupPairCount {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session("semdedup-pairs")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1", "target/sf1")
    dirs.foreach { dir =>
      val sizes = SimilarityOps.kmeansAssign(spark, dir).groupBy(col("cid")).count()
      val r = sizes.agg(
        sum(col("count")).as("n"),
        count(lit(1)).as("k_used"),
        max(col("count")).as("max_cluster"),
        sum(col("count") * (col("count") - 1) / 2).as("pairs")
      ).collect()(0)
      println(s"SEMDEDUP-PAIRS dir=$dir n=${r.get(0)} k_nonempty=${r.get(1)} " +
        s"max_cluster=${r.get(2)} within_cluster_pairs=${r.get(3)}")
    }
    spark.stop()
  }
}
