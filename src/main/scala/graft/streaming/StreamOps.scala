package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import graft.QueryDef
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Driver-registry entries for the Structured Streaming surface: each
  * replays the finite events table through a real streaming query
  * (file-stream source -> windowed/stateful transform -> memory sink)
  * and returns the materialized result, which must equal the batch
  * semantics the DuckDB oracle expresses.
  */
object StreamOps {

  private val seq = new AtomicInteger(0)
  private def sinkName(prefix: String): String = s"${prefix}_${seq.incrementAndGet()}"

  val entries: Seq[QueryDef] = Seq(
    // ---------------------------------------------------------------- q90
    QueryDef(
      "q90_stream_hourly",
      (s, dir) => {
        val stream = EventStreaming.eventsStream(s, dir)
        EventStreaming
          .runToMemory(s, EventStreaming.hourlyCounts(stream), sinkName("q90"))
          .orderBy(col("hour"), col("event_type"))
      },
      Some("""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
             count(*) AS n, round(sum(value), 2) AS sum_value
             FROM events GROUP BY 1, 2 ORDER BY hour, event_type""")
    ),
    // ---------------------------------------------------------------- q91
    QueryDef(
      "q91_stream_user_totals",
      (s, dir) => {
        val stream = EventStreaming.eventsStream(s, dir)
        EventStreaming
          .runToMemory(s, EventStreaming.userTotals(s, stream).toDF(), sinkName("q91"),
            OutputMode.Update())
          .select(col("user_id"), col("n_events"), round(col("total_value"), 2).as("total_value"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value
             FROM events GROUP BY user_id ORDER BY user_id""")
    ),
    // ---------------------------------------------------------------- q92
    // Streaming dedup: dropDuplicatesWithinWatermark keys the state on
    // event_id AND lets the watermark evict entries older than the delay,
    // so state is bounded on an unbounded stream (plain
    // dropDuplicates("event_id") would grow state forever). Duplicates
    // arriving within the 2-hour delay of each other dedup exactly.
    QueryDef(
      "q92_stream_dedup",
      (s, dir) => {
        val stream = EventStreaming
          .eventsStream(s, dir)
          .withWatermark("ts", "2 hours")
          .dropDuplicatesWithinWatermark("event_id")
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_unique"))
        EventStreaming
          .runToMemory(s, stream, sinkName("q92"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, CAST(count(DISTINCT event_id) AS BIGINT) AS n_unique
             FROM events GROUP BY event_type ORDER BY event_type""")
    )
  )
}
