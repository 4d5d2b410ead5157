package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** The streaming plans must agree with their batch equivalents when a
  * finite parquet input is replayed through the stream.
  */
class EventStreamingSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = graft.Engine.session("test")

  test("streaming hourly counts equal the batch aggregation") {
    val stream = EventStreaming.eventsStream(spark, dir)
    val got = EventStreaming
      .runToMemory(spark, EventStreaming.hourlyCounts(stream), "hourly_test")
      .orderBy(col("hour"), col("event_type"))
      .collect()
    val want = graft.Engine
      .table(spark, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("hour"), col("event_type"))
      .collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) => assert(g == w) }
  }

  test("stateful user totals equal batch per-user aggregation") {
    val stream = EventStreaming.eventsStream(spark, dir)
    val got = EventStreaming
      .runToMemory(spark, EventStreaming.userTotals(spark, stream).toDF(), "user_totals_test",
        OutputMode.Update())
      .orderBy(col("user_id"))
      .collect()
    val want = graft.Engine
      .table(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .orderBy(col("user_id"))
      .collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getAs[Long]("user_id") == w.getAs[Long]("user_id"))
      assert(g.getAs[Long]("n_events") == w.getAs[Long]("n_events"))
      assert(math.abs(g.getAs[Double]("total_value") - w.getAs[Double]("total_value")) < 1e-9)
    }
  }

  test("releaseScratch drops consumed memory-sink temp views") {
    // Each memory-sink run pins its full result in driver memory behind a
    // temp view; a long-lived session (Bench runs ~30 streaming results)
    // must reclaim them. Contract: after the result is consumed and
    // releaseScratch runs, no sink views remain registered.
    val stream = EventStreaming.eventsStream(spark, dir)
    val n = EventStreaming
      .runToMemory(spark, EventStreaming.hourlyCounts(stream), "sink_reclaim_test")
      .count()
    assert(n > 0)
    assert(spark.catalog.tableExists("sink_reclaim_test"))
    graft.Engine.releaseScratch(spark)
    assert(!spark.catalog.tableExists("sink_reclaim_test"))
    assert(graft.Engine.sinkViews.isEmpty)
  }
}
