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

  test("day-2 batch runs against the APPENDED index — cumulative, not rebuild-per-run") {
    // day-0: history index (doc_id % 5 != 0). day-1: batch %5 == 0,
    // survivors' hashes appended. day-2: batch %10 == 0 — a SUBSET of
    // day-1's batch, so every day-2 hash entered the index only via the
    // append (no doc %10 == 0 is in the day-0 history, and the corpus
    // has no exact-duplicate texts). Day-2 surviving 0 rows is
    // therefore only possible if the appended index is what the
    // anti-join consults; the un-appended control proves the converse.
    val work = tmp()
    val indexDir = DedupOps.buildHashIndex(spark, dir, work)
    val day1 = DedupOps.incrementalAgainstIndex(spark, dir, indexDir).localCheckpoint()
    assert(day1.count() > 0)
    // negative control BEFORE the append: a copy of the day-0 index
    val controlDir = tmp() + "/hash_index_control"
    spark.read.parquet(indexDir).write.parquet(controlDir)
    day1.select(col("h")).distinct().write.mode("append").parquet(indexDir)
    val day2Pred = col("doc_id") % 10 === 0
    val day2 = DedupOps.incrementalAgainstIndex(spark, dir, indexDir, day2Pred)
    // batch-2's plan reads the appended index, hashes only its own
    // slice (ExistingRDD materialization), and never re-scans the corpus
    val plan = day2.queryExecution.executedPlan.toString
    assert(plan.contains("hash_index"), s"day-2 plan does not read the stored index:\n$plan")
    assert(!plan.contains("hash_index_control"))
    assert(plan.contains("ExistingRDD"), s"day-2 batch not the materialized slice:\n$plan")
    val docScans = plan.sliding("documents.parquet".length).count(_ == "documents.parquet")
    assert(docScans == 0, s"day-2 plan re-scans the corpus ($docScans scans):\n$plan")
    assert(day2.count() == 0, "day-2 batch must be fully dropped by the appended hashes")
    // against the un-appended day-0 control the same batch all survives:
    // the drop above really came from the appended day-1 hashes
    val controlSurvivors =
      DedupOps.incrementalAgainstIndex(spark, dir, controlDir, day2Pred).count()
    val day2Batch = graft.Engine
      .table(spark, dir, "documents")
      .filter(day2Pred)
      .count()
    assert(controlSurvivors == day2Batch,
      s"control: expected all $day2Batch day-2 rows to survive, got $controlSurvivors")
    graft.Engine.releaseScratch(spark)
  }
}
