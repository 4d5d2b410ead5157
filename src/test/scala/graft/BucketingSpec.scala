package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located joins via bucketing — the no-shuffle join strategy for
  * repeatedly-joined big tables at scale: both sides bucketed and
  * sorted on the join key join with zero Exchange in the plan.
  */
class BucketingSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = Engine.session("test")

  test("bucketed fact tables sort-merge join without any shuffle exchange") {
    // the catalog is in-memory per JVM but the warehouse dir persists;
    // clear orphaned locations from previous runs before saveAsTable
    for (t <- Seq("li_bucketed", "ord_bucketed")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"/tmp/graft-warehouse/$t")
      if (loc.exists) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles.foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    Engine
      .table(spark, dir, "lineitem")
      .write
      .mode("overwrite")
      .bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    Engine
      .table(spark, dir, "orders")
      .write
      .mode("overwrite")
      .bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey")
      .saveAsTable("ord_bucketed")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      val li = spark.table("li_bucketed")
      val ord = spark.table("ord_bucketed")
      val joined = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle in:\n$plan")

      // correctness: same cardinality as the unbucketed join
      val expected = Engine
        .table(spark, dir, "lineitem")
        .join(Engine.table(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .count()
      assert(joined.count() == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
