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
    }
  )
}
