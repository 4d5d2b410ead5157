package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Watermark semantics under controlled event-time injection: windows
  * close once the watermark passes, and data later than the watermark is
  * dropped — the property that bounds state size on an unbounded stream.
  */
class WatermarkSpec extends AnyFunSuite {
  private lazy val spark = graft.Engine.session("test")

  private def ts(hhmm: String): Timestamp = Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  test("append-mode window agg drops events later than the watermark") {
    import spark.implicits._
    val input = MemoryStream[(Timestamp, String)](spark)
    val agg = input
      .toDF()
      .toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes").as("w"), col("k"))
      .count()
      .select(col("w.start").as("start"), col("k"), col("count"))

    val q = agg.writeStream.format("memory").queryName("wm_test").outputMode("append").start()
    try {
      // window [10:00,10:10): three on-time events
      input.addData((ts("10:01"), "a"), (ts("10:04"), "a"), (ts("10:09"), "a"))
      q.processAllAvailable()
      // advance event time so the watermark (max - 10m) passes 10:10
      input.addData((ts("10:25"), "a"))
      q.processAllAvailable()
      // this event belongs to the closed window — must be dropped
      input.addData((ts("10:02"), "a"))
      q.processAllAvailable()
      // close the second window too
      input.addData((ts("10:45"), "a"))
      q.processAllAvailable()

      val rows = spark.table("wm_test").collect()
      val first = rows.filter(_.getAs[Timestamp]("start") == ts("10:00"))
      assert(first.length == 1)
      // 3, not 4: the late 10:02 event never lands in the closed window
      assert(first.head.getAs[Long]("count") == 3L)
    } finally q.stop()
  }
}
