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

  test("sessionize: a late event inside the watermark merges without rewinding session bounds") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $s:00")
    val mem = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val sessions = Streams.sessionize(
      mem.toDF.toDF("user_id", "event_id", "ts"), gapSec = 1800, delay = "4 hours")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-late-").toString
    val q = sessions.toDF.writeStream.outputMode("append")
      .format("memory").queryName("t_late")
      .option("checkpointLocation", ckpt).start()
    try {
      mem.addData((1L, 1L, ts("10:00")), (1L, 2L, ts("10:10")))
      q.processAllAvailable()
      mem.addData((1L, 3L, ts("09:45"))) // late but within the 4 h watermark
      q.processAllAvailable()
      // 30 min after the TRUE last event (10:10) — must still merge; a
      // rewound lastMs (09:45) would mis-split here
      mem.addData((1L, 4L, ts("10:40")))
      q.processAllAvailable()
      assert(spark.table("t_late").count() == 0, "session split prematurely after late event")
      // VERY late (> gap before the session start): cannot merge — emits
      // as its own closed singleton session at batch end
      mem.addData((1L, 6L, ts("08:00")))
      q.processAllAvailable()
      val early = spark.table("t_late")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
      assert(early == Set((1L, ts("08:00"), 1L)))
      mem.addData((1L, 5L, ts("11:30"))) // true gap > 30 min → closes the open session
      q.processAllAvailable()
      val rows = spark.table("t_late")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
      assert(rows == Set(
        (1L, ts("08:00"), 1L),
        (1L, ts("09:45"), 4L))) // start min'd to the within-gap late event
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization equals the batch session set (closed + timed-out)") {
    val gapMs = 1800000L
    val streamed = Streams.runToMemory(
      spark, Streams.sessionize(Streams.eventsStream(spark, sf)).toDF(),
      "t_sessions", mode = "append")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet

    // batch replay of the emission rule
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val ms = (expr("unix_micros(ts)") / 1000).cast("long")
    val numbered = batchEvents
      .withColumn("ms", ms)
      .withColumn("new_sess",
        when(col("ms") - lag(col("ms"), 1).over(w) > gapMs
          || lag(col("ts"), 1).over(w).isNull, 1).otherwise(0))
      .withColumn("sess_no", sum(col("new_sess")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val wmMs = numbered.agg(max(col("ms"))).collect()(0).getLong(0)
    val sess = numbered.groupBy("user_id", "sess_no")
      .agg(min(col("ts")).as("sess_start"), max(col("ms")).as("last_ms"),
        count(lit(1)).as("n_events"))
      .withColumn("is_tail",
        col("sess_no") === max(col("sess_no")).over(
          Window.partitionBy("user_id")))
    val expected = sess
      .filter(!col("is_tail") || col("last_ms") + gapMs < wmMs)
      .select("user_id", "sess_start", "n_events")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet

    assert(streamed.nonEmpty)
    assert(streamed == expected)
    // and the state actually bounds: tail sessions within the gap of
    // stream end are withheld, so streamed is a strict subset of all
    val all = sess.count()
    assert(streamed.size < all)
  }

  test("left-outer stream-stream join: null-extends exactly the watermark-expired unmatched lefts") {
    def side(t: String, prefix: String) =
      Streams.eventsStream(spark, sf).filter(col("event_type") === t)
        .select(col("event_id").as(s"${prefix}_event_id"),
          col("user_id").as(s"${prefix}_user_id"), col("ts").as(s"${prefix}_ts"))
    val streamed = Streams.runToMemory(
      spark, Streams.streamStreamJoin(
        side("purchase", "p"), side("click", "c"),
        "p_user_id", "c_user_id", "p_ts", "c_ts", windowSec = 1800,
        joinType = "left_outer"),
      "t_outer", mode = "append")
      .select("p_event_id", "c_event_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet

    // batch replay of the rule: matched pairs always emit; an unmatched
    // purchase emits null-extended iff the final global watermark
    // (min of both sides' max ts − delay) passed its event time
    val p = batchEvents.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id").as("pu"), col("ts").as("pts"))
    val c = batchEvents.filter(col("event_type") === "click")
      .select(col("event_id").as("cid"), col("user_id").as("cu"), col("ts").as("cts"))
    val cond = col("cu") === col("pu") &&
      col("cts") >= col("pts") - expr("INTERVAL 1800 SECONDS") && col("cts") <= col("pts")
    val matched = p.join(c, cond)
      .select(col("pid"), col("cid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val wm = math.min(
      p.agg(max(expr("unix_micros(pts)"))).collect()(0).getLong(0),
      c.agg(max(expr("unix_micros(cts)"))).collect()(0).getLong(0)) - 3600000000L
    val expired = p.join(c, cond, "left_anti")
      .filter(expr("unix_micros(pts)") < wm)
      .select("pid").collect().map(r => (r.getLong(0), -1L)).toSet
    assert(streamed == matched ++ expired)
    // the withholding is real: some unmatched purchase is younger than the
    // watermark and therefore absent
    val allUnmatched = p.join(c, cond, "left_anti").count()
    assert(expired.size < allUnmatched)
  }

  test("stream-stream join is state-store-provider independent (HDFS vs RocksDB)") {
    assume(GraftSession.rocksDbAvailable, "rocksdbjni native lib unavailable")
    val confKey = "spark.sql.streaming.stateStore.providerClass"
    def run(provider: String, tag: String): Set[(Long, Long)] = {
      val prev = spark.conf.getOption(confKey)
      spark.conf.set(confKey, provider)
      try {
        def side(t: String, prefix: String) =
          Streams.eventsStream(spark, sf).filter(col("event_type") === t)
            .select(col("event_id").as(s"${prefix}_event_id"),
              col("user_id").as(s"${prefix}_user_id"), col("ts").as(s"${prefix}_ts"))
        Streams.runToMemory(
          spark, Streams.streamStreamJoin(
            side("purchase", "p"), side("click", "c"),
            "p_user_id", "c_user_id", "p_ts", "c_ts", windowSec = 1800),
          s"t_prov_$tag", mode = "append")
          .select("p_event_id", "c_event_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      } finally prev match {
        case Some(v) => spark.conf.set(confKey, v)
        case None => spark.conf.unset(confKey)
      }
    }
    val viaHdfs = run(
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
      "hdfs")
    val viaRocks = run(GraftSession.ROCKSDB_PROVIDER, "rocks")
    assert(viaRocks.nonEmpty)
    assert(viaHdfs == viaRocks)
  }
}
