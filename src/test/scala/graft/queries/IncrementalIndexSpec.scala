package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persisted-index incremental dedup (q136): the property that makes
  * dedup sustainable day over day is that run N+1 touches only the
  * delta — it reads the STORED hash index, never re-hashes the corpus.
  */
class IncrementalIndexSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = graft.Engine.session("test")

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-incr-").toString

  test("day-1 plan reads batch + stored index only — no full-corpus md5 scan") {
    val work = tmp()
    val indexDir = DedupOps.buildHashIndex(spark, dir, work)
    val survivors = DedupOps.incrementalAgainstIndex(spark, dir, indexDir)
    val plan = survivors.queryExecution.executedPlan.toString
    // the stored index IS read
    assert(plan.contains("hash_index"), s"plan does not read the stored index:\n$plan")
    // the batch is hashed ONCE into a materialized narrow projection
    // (Scan ExistingRDD = the lazy localCheckpoint); after that no
    // parquet scan of the documents table remains anywhere in the day-1
    // plan — i.e. the history side comes from the STORED index, never
    // from re-hashing the corpus
    val docScans = plan.sliding("documents.parquet".length).count(_ == "documents.parquet")
    assert(docScans == 0, s"day-1 plan re-scans the corpus ($docScans scans):\n$plan")
    assert(plan.contains("ExistingRDD"), s"materialized batch missing from plan:\n$plan")
    // and the materialized batch really is the batch slice, not the
    // corpus: it holds exactly the doc_id % 5 == 0 rows
    val batchRows = graft.Engine
      .table(spark, dir, "documents")
      .filter(col("doc_id") % 5 === 0)
      .count()
    val survivorInput = DedupOps.incrementalAgainstIndex(spark, dir, indexDir)
    assert(survivorInput.count() <= batchRows)
    graft.Engine.releaseScratch(spark)
  }

  test("q136 output matches q126 and the index grows by exactly the batch's new hashes") {
    val work = tmp()
    val indexDir = DedupOps.buildHashIndex(spark, dir, work)
    val before = spark.read.parquet(indexDir).count()
    val survivors = DedupOps.incrementalAgainstIndex(spark, dir, indexDir).localCheckpoint()
    val newHashes = survivors.select(col("h")).distinct().count()
    survivors.select(col("h")).distinct().write.mode("append").parquet(indexDir)
    val after = spark.read.parquet(indexDir).count()
    assert(after == before + newHashes, s"index $before + $newHashes != $after")
    // day-2 property: re-running the batch against the grown index drops
    // everything (the batch's hashes are now history)
    val rerun = DedupOps.incrementalAgainstIndex(spark, dir, indexDir).count()
    assert(rerun == 0, s"day-2 rerun should be fully deduped, got $rerun rows")
    // and the registered q136 equals the self-contained q126 (same
    // survivors, different plan economics)
    val got = survivors
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))
      .collect()
    val want = graft.SparkEntry
      .queries("q126_incremental_dedup")(spark, dir)
      .collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) => assert(g == w) }
    graft.Engine.releaseScratch(spark)
  }
}
