package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Structured Streaming surface over the events table — additive to the
  * reference (which has no stream concepts, SURVEY §1.1), required of a
  * modern pipeline engine: windowed aggregation with a watermark and
  * arbitrary stateful processing via mapGroupsWithState.
  *
  * Locally these are driven from the parquet file as a file-stream
  * source with a memory sink (`processAllAvailable`); at scale the same
  * plans run unchanged over Kafka/file streams with checkpointing —
  * state lives in the state store, partitioned by the grouping key.
  */
object EventStreaming {

  /** The events table as a file-source stream (schema from the batch
    * read; ts arrives as bigint nanos — converted like Engine.table).
    */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    val batchSchema = spark.read.parquet(s"$dir/events.parquet").schema
    // the file-stream source wants a directory: stream the sf dir with a
    // glob filter selecting just the events table
    val raw = spark.readStream
      .schema(batchSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    // same writer-dependent ts dispatch as Engine.table: bigint nanos
    // (legacy nanosAsLong read) vs native TIMESTAMP_NTZ micros
    batchSchema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** Tumbling 1-hour windowed counts per event type with a 2-hour
    * watermark. Returns the streaming DataFrame (caller attaches sink).
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"), col("sum_value"))

  final case class UserAgg(user_id: Long, n_events: Long, total_value: Double)

  /** Arbitrary stateful processing: running per-user totals via
    * mapGroupsWithState (the KeyValueGroupedDataset state API).
    */
  def userTotals(spark: SparkSession, events: DataFrame): Dataset[UserAgg] = {
    import spark.implicits._
    events
      .select(col("user_id"), col("value"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Double)], state: GroupState[UserAgg]) =>
          val prev = state.getOption.getOrElse(UserAgg(uid, 0L, 0.0))
          val (n, v) = rows.foldLeft((prev.n_events, prev.total_value)) { case ((c, s), (_, x)) =>
            (c + 1, s + x)
          }
          val next = UserAgg(uid, n, v)
          state.update(next)
          next
      }
  }

  final case class UserStats(user_id: Long, n_events: Long, max_value: Double)

  /** transformWithState processor (the Spark 4 arbitrary-state API that
    * supersedes mapGroupsWithState): typed ValueState per key, explicit
    * TTL hooks, timer support. Here: running per-user count + max.
    */
  final class UserStatsProcessor extends StatefulProcessor[Long, (Long, Double), UserStats] {
    @transient private var st: ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Double)](
        "agg",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble),
        TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[(Long, Double)],
        timerValues: TimerValues): Iterator[UserStats] = {
      val prev = if (st.exists()) st.get() else (0L, Double.NegativeInfinity)
      val (n, m) = rows.foldLeft(prev) { case ((c, mx), (_, v)) => (c + 1, math.max(mx, v)) }
      st.update((n, m))
      Iterator.single(UserStats(key, n, m))
    }
  }

  /** Running per-user stats through transformWithState. Requires the
    * RocksDB state store provider (the API is built on its column
    * families); the caller sets that conf for the query's session.
    */
  def userStatsTws(spark: SparkSession, events: DataFrame): Dataset[UserStats] = {
    import spark.implicits._
    events
      .select(col("user_id"), col("value"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new UserStatsProcessor, TimeMode.None(), OutputMode.Update())
  }

  final case class ClosedSession(user_id: Long, start_us: Long, n_events: Long)
  final case class OpenSession(start_us: Long, last_us: Long, n: Long)

  /** Closed-session emission via flatMapGroupsWithState — the 0..N
    * outputs-per-group-per-trigger member of the KeyValueGroupedDataset
    * state API (mapGroupsWithState emits exactly one): a session CLOSES
    * when a later event arrives more than 30 minutes after it, at which
    * point it is emitted; the still-open session lives on in state and
    * is never emitted (deterministic under replay — each user's last
    * session stays open forever). Timestamps are carried as exact
    * microseconds so the gap comparison is engine-identical.
    */
  def closedSessions(spark: SparkSession, events: DataFrame): Dataset[ClosedSession] = {
    import spark.implicits._
    val gapUs = 30L * 60 * 1000000
    events
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Long)], state: GroupState[OpenSession]) =>
          // iterator order within a trigger is unspecified — sort by time
          val times = rows.map(_._2).toSeq.sorted
          val out = Seq.newBuilder[ClosedSession]
          var open = state.getOption
          times.foreach { t =>
            open = open match {
              case Some(s) if t - s.last_us > gapUs =>
                out += ClosedSession(uid, s.start_us, s.n)
                Some(OpenSession(t, t, 1))
              case Some(s) => Some(s.copy(last_us = t, n = s.n + 1))
              case None    => Some(OpenSession(t, t, 1))
            }
          }
          open.foreach(state.update)
          out.result().iterator
      }
  }

  /** Drive a streaming DataFrame to completion against a memory sink and
    * return the materialized result. Batch-on-stream harness for tests
    * and Verify.
    */
  def runToMemory(
      spark: SparkSession,
      df: DataFrame,
      name: String,
      mode: OutputMode = OutputMode.Complete()
  ): DataFrame = {
    // Local harness: put the checkpoint (offset/commit logs + state
    // store, all fsync'd per micro-batch) on tmpfs. In production this
    // would be durable shared storage — the fsync cost is the price of
    // exactly-once recovery, not something to skip.
    val ckRoot =
      if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get("/dev/shm"))) "/dev/shm"
      else System.getProperty("java.io.tmpdir")
    val ck = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(ckRoot), s"graft-ck-$name-")
    // State partition count: each stateful shuffle partition pays a
    // fixed per-micro-batch state-store commit (delta write + fsync), so
    // locally fewer, fatter state partitions win (measured: q92 dedup
    // 4.0s @ 32 -> 2.8s @ 8 on sf0.1). On a cluster this is sized to
    // cores once at first start — it's baked into the checkpoint. The
    // conf flip is scoped to query start (restored below); the engine
    // runs streaming queries sequentially, and sbt runs forked suites
    // sequentially, so nothing else reads the conf mid-flip.
    val partKey = "spark.sql.shuffle.partitions"
    val prevParts = spark.conf.get(partKey)
    val q =
      try {
        spark.conf.set(partKey, math.min(8, prevParts.toInt).toString)
        df.writeStream
          .format("memory")
          .queryName(name)
          .outputMode(mode)
          .option("checkpointLocation", ck.toString)
          .start()
      } finally spark.conf.set(partKey, prevParts)
    try q.processAllAvailable()
    finally {
      q.stop()
      // best-effort cleanup: tmpfs space is RAM
      try {
        import scala.jdk.CollectionConverters._
        val walk = java.nio.file.Files.walk(ck)
        try walk.iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
        finally walk.close()
      } catch { case _: Throwable => () }
    }
    // Register for reclamation: the memory sink pins the full result in
    // driver memory until its temp view is dropped. Engine.releaseScratch
    // drops it after the caller has consumed the returned DataFrame.
    graft.Engine.sinkViews.add(name)
    spark.table(name)
  }
}
