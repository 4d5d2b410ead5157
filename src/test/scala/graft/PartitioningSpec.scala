package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partitioned layouts — the other half of the 100 TB story: writes
  * partitioned by a predicate column let the reader prune whole
  * directories (PartitionFilters in the scan, not data filters).
  */
class PartitioningSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = Engine.session("test")

  test("partitioned write enables partition pruning at the scan") {
    val out = Files.createTempDirectory("graft-part-").toString + "/lineitem_by_flag"
    Engine
      .table(spark, dir, "lineitem")
      .write
      .partitionBy("l_returnflag")
      .parquet(out)

    val pruned = spark.read
      .parquet(out)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_quantity"))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    // the predicate must appear as a partition filter on the scan
    assert(
      plan.replaceAll("\\s+", " ").contains("PartitionFilters: [isnotnull(l_returnflag"),
      s"partition filter missing:\n$plan"
    )

    // and the result matches the unpartitioned filter
    val expected = Engine.table(spark, dir, "lineitem").filter(col("l_returnflag") === "R").count()
    assert(pruned.count() == expected)
  }
}
