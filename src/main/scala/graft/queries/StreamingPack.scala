package graft.queries

import graft.QueryDef
import graft.streaming.Streams
import org.apache.spark.sql.functions._

/** Streaming pack (SURVEY.md §2.7): the reference's streaming semantics run
  * through the REAL streaming engine (readStream → StateStore-backed agg →
  * memory sink, Trigger.AvailableNow), then compared to batch oracles —
  * batch/stream duality means the final complete-mode table must equal the
  * batch answer over the same data.
  */
object StreamingPack {

  def all: Seq[QueryDef] = Seq(

    // ---- q33: A3/K2 — streaming global COUNT(*), complete mode -------------
    QueryDef(
      "q33_stream_count",
      "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events") { (s, d) =>
      Streams.runCompleteToMemory(
        s, Streams.globalCount(Streams.eventsStream(s, d)), "mq33")
        .select(col("count").as("n"))
    },

    // ---- q34: event-time tumbling windows through the streaming engine -----
    QueryDef(
      "q34_stream_hourly",
      """SELECT DATE_TRUNC('hour', ts) AS hr, event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM events
        |GROUP BY DATE_TRUNC('hour', ts), event_type
        |ORDER BY hr, event_type""".stripMargin) { (s, d) =>
      Streams.runCompleteToMemory(
        s, Streams.hourlyCounts(Streams.eventsStream(s, d)), "mq34")
        .select(col("w.start").as("hr"), col("event_type"), col("n"))
        .orderBy("hr", "event_type")
    },

    // ---- q37: append-mode + watermark — the state-bounding shape -----------
    // Emits exactly the finalized windows: end <= watermark, where the
    // final-batch watermark is max event time minus the 1 h delay
    // (equality with batch asserted in StreamingSpec; semantics replayed
    // by the oracle's max-ts cutoff).
    QueryDef(
      "q37_stream_hourly_append",
      """WITH mx AS (SELECT max(ts) AS m FROM events)
        |SELECT DATE_TRUNC('hour', ts) AS hr, event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM events, mx
        |WHERE DATE_TRUNC('hour', ts) + INTERVAL 1 HOUR <= m - INTERVAL 1 HOUR
        |GROUP BY DATE_TRUNC('hour', ts), event_type
        |ORDER BY hr, event_type""".stripMargin) { (s, d) =>
      Streams.runToMemory(
        s, Streams.hourlyCountsAppend(Streams.eventsStream(s, d), "1 hour"),
        "mq37", mode = "append")
        .select(col("w.start").as("hr"), col("event_type"), col("n"))
        .orderBy("hr", "event_type")
    }
  )
}
