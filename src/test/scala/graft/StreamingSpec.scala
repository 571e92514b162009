package graft

import graft.streaming.Streams
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch/stream duality (SURVEY.md §2.7): the same aggregates through the
  * real streaming engine (StateStore, Trigger.AvailableNow) must equal the
  * batch answers over the same parquet data.
  */
class StreamingSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  private def batchEvents = Tables.events(spark, sf)

  test("complete-mode streaming global count equals batch count (A3/K2)") {
    val streamed = Streams.runCompleteToMemory(
      spark, Streams.globalCount(Streams.eventsStream(spark, sf)), "t_count")
    assert(streamed.collect()(0).getLong(0) == batchEvents.count())
  }

  test("complete-mode hourly windowed counts equal batch windows") {
    val streamed = Streams.runCompleteToMemory(
      spark, Streams.hourlyCounts(Streams.eventsStream(spark, sf)), "t_hourly")
      .select(col("w.start").as("hr"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val batch = batchEvents
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("hr"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch)
  }

  test("append-mode + watermark emits exactly the finalized windows, matching batch") {
    val delay = "1 hour"
    val streamed = Streams.runToMemory(
      spark, Streams.hourlyCountsAppend(Streams.eventsStream(spark, sf), delay),
      "t_hourly_append", mode = "append")
      .select(col("w.start").as("hr"), col("w.end").as("he"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(2), r.getLong(3))).toSet

    // watermark after the final batch = max event time - delay; append mode
    // emits exactly the windows whose end is at or before that watermark
    val maxTs = batchEvents.agg(max(col("ts"))).collect()(0).getTimestamp(0)
    val batchFinalized = batchEvents
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .filter(col("w.end") <= lit(maxTs) - expr(s"INTERVAL $delay"))
      .select(col("w.start").as("hr"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    assert(streamed.nonEmpty, "append run emitted nothing — watermark never flushed")
    assert(streamed == batchFinalized)
  }
}
