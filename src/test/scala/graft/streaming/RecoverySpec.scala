package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Checkpoint recovery: a streaming query stopped mid-stream and
  * restarted from the same checkpoint must process every input exactly
  * once — the offset log replays the in-flight batch with the SAME
  * batchId, so a sink that is idempotent per batchId (here: one
  * overwritten directory per batch) ends with no duplicates and no
  * gaps. This is the engine-level guarantee that replaces the
  * reference's re-queue-on-worker-death machinery for streams.
  */
class RecoverySpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = graft.Engine.session("test")

  test("restart from checkpoint is exactly-once across batches") {
    // split events into 4 files so the stream has 4 micro-batches
    val in = Files.createTempDirectory("graft-rec-in-").toString
    val src = graft.Engine.table(spark, dir, "events").select(col("event_id"))
    src.repartition(4).write.mode("overwrite").parquet(in)
    val ck = Files.createTempDirectory("graft-rec-ck-").toString
    val out = Files.createTempDirectory("graft-rec-out-").toString

    def startQuery() =
      spark.readStream
        .schema(src.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(in)
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", ck)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
          // idempotent by batchId: replaying the batch overwrites its dir
          batch.write.mode("overwrite").parquet(s"$out/batch_id=$batchId")
        }
        .start()

    // run until at least one batch is committed, then stop mid-stream
    def sinkHasOutput: Boolean = {
      val ls = Files.list(Paths.get(out))
      try ls.findFirst().isPresent
      finally ls.close()
    }
    val q1 = startQuery()
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    while (!sinkHasOutput && System.nanoTime() < deadline) {
      Thread.sleep(100)
    }
    q1.stop()
    q1.awaitTermination()

    // restart from the same checkpoint; drain the rest
    val q2 = startQuery()
    try q2.processAllAvailable()
    finally q2.stop()

    val sunk = spark.read.parquet(out).select(col("event_id"))
    assert(sunk.count() == src.count(), "exactly-once: no gaps, no duplicates")
    assert(sunk.except(src).count() == 0 && src.except(sunk).count() == 0)
  }
}
