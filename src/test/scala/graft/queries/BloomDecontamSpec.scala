package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q178 (bloom-prefiltered decontamination) must be value-identical to
  * q64 (the exact broadcast-join form) — the bloom probe never has
  * false negatives, so prefilter + exact join = exact join — while
  * actually pruning the corpus shingle stream before the shuffle.
  */
class BloomDecontamSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"
  private lazy val spark = graft.Engine.session("test")

  test("q178 result equals q64 row-for-row") {
    val q64 = graft.SparkEntry.queries("q64_decontaminate")(spark, dir)
    val q178 = graft.SparkEntry.queries("q178_bloom_decontam")(spark, dir)
    assert(q64.collect().toSeq == q178.collect().toSeq)
    graft.Engine.releaseScratch(spark)
  }

  test("the two queries share one oracle string object") {
    val o = graft.SparkEntry.oracleSql
    assert(o("q64_decontaminate") eq o("q178_bloom_decontam"))
  }

  test("bloom probe has no false negatives and prunes effectively") {
    val docs = graft.Engine.table(spark, dir, "documents")
    val keys = docs
      .filter(col("source") === "src0")
      .select(xxhash64(col("doc_id")).as("h"))
    val n = keys.count().max(1L)
    val bloom = keys.stat.bloomFilter("h", n, 0.01)
    val bytes = graft.functions.BloomOps.serialize(bloom)
    val probe = docs.select(xxhash64(col("doc_id")).as("h"), col("source"))
    // every true member passes
    val misses = probe
      .filter(col("source") === "src0")
      .filter(!graft.functions.BloomOps.mightContain(bytes, col("h")))
      .count()
    assert(misses == 0)
    // non-members are mostly pruned (fpp 0.01, generous slack)
    val nonMembers = probe.filter(col("source") =!= "src0")
    val passed = nonMembers
      .filter(graft.functions.BloomOps.mightContain(bytes, col("h")))
      .count()
    assert(passed <= nonMembers.count() * 0.2 + 5, s"fp too high: $passed")
  }

  test("a NULL filter literal yields NULL, not an NPE at codegen") {
    val r = spark
      .sql("SELECT graft_bloom_contains(CAST(NULL AS BINARY), 42L) AS v")
      .head()
    assert(r.isNullAt(0))
  }

  test("a non-foldable filter argument is rejected at analysis") {
    val df = spark
      .range(1)
      .select(col("id"), col("id").cast("string").cast("binary").as("b"))
    val err = intercept[Exception] {
      df.select(expr("graft_bloom_contains(b, id)")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("foldable"), err.getMessage)
  }
}
