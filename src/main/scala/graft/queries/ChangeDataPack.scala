package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Changes
import org.apache.spark.sql.functions._

/** Change-data pack: changelog compaction and SCD2 history over the events
  * table — the maintenance operators behind the reference's
  * write-the-whole-table-per-run JDBC step
  * (`/root/reference/spark_airports_final.py:96-104`), re-expressed as the
  * shapes that survive 100 TB: compact a keyed changelog with one partial
  * aggregation, keep attribute history as validity intervals.
  */
object ChangeDataPack {

  def all: Seq[QueryDef] = Seq(

    // ---- q105: CDC changelog compaction — latest row per key ---------------
    // Spark runs the aggregation form (max_by over a struct ordinal: partial
    // map-side combine, the shuffle carries one candidate per key per
    // partition). The oracle runs the window form (row_number DESC = 1,
    // full shuffle+sort). Two different algorithms, same answer.
    QueryDef(
      "q105_cdc_compaction",
      """SELECT user_id, event_type, ts AS last_ts, value AS last_value,
        |  n_versions
        |FROM (
        |  SELECT user_id, event_type, ts, value,
        |    CAST(COUNT(*) OVER (PARTITION BY user_id, event_type) AS BIGINT)
        |      AS n_versions,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
      Changes.latestByKey(
        Tables.events(s, d).select("user_id", "event_type", "ts", "event_id", "value"),
        keys = Seq("user_id", "event_type"), ord = Seq("ts", "event_id"))
        .select(col("user_id"), col("event_type"),
          col("ts").as("last_ts"), col("value").as("last_value"),
          col("n_versions"))
        .orderBy("user_id", "event_type")
    },

    // ---- q106: SCD type-2 intervals — attribute history per key ------------
    // Per-user event_type timeline compressed to change rows, each carrying
    // its validity interval [valid_from, valid_to) and a version number.
    // All three window passes share one (key, ord) partitioning; (ts,
    // event_id) totally orders each user's timeline so ties cannot
    // reorder between engines.
    QueryDef(
      "q106_scd2_intervals",
      """WITH ordered AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev_type
        |  FROM events),
        |changes AS (
        |  SELECT user_id, event_type, ts, event_id FROM ordered
        |  WHERE prev_type IS NULL OR event_type <> prev_type)
        |SELECT user_id, event_type, ts AS valid_from,
        |  LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    AS valid_to,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    AS BIGINT) AS version_no
        |FROM changes
        |ORDER BY user_id, version_no""".stripMargin) { (s, d) =>
      Changes.scd2(
        Tables.events(s, d).select("user_id", "event_type", "ts", "event_id"),
        key = "user_id", attr = "event_type", tsCol = "ts",
        ord = Seq("ts", "event_id"))
        .orderBy("user_id", "version_no")
    }
  )
}
