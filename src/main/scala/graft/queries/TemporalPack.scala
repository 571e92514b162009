package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.TemporalJoins
import org.apache.spark.sql.functions._

/** Temporal-join pack: as-of and bounded range joins — operators Spark has
  * no built-in for, composed scale-safely (one equi-shuffle, no inequality
  * fan-out; see [[TemporalJoins]]). DuckDB has a native ASOF JOIN, which
  * makes a sharp oracle: two completely different algorithms must agree
  * row-for-row.
  */
object TemporalPack {

  def all: Seq[QueryDef] = Seq(

    // ---- q45: as-of join — each event's most recent prior order ------------
    QueryDef(
      "q45_asof_join",
      """WITH o AS (
        |  SELECT o_custkey AS k, CAST(o_orderdate AS TIMESTAMP) AS ots,
        |    max(o_orderkey) AS okey,
        |    max_by(o_totalprice, o_orderkey) AS oprice
        |  FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id,
        |  o.okey AS last_orderkey, o.oprice AS last_totalprice
        |FROM events e
        |ASOF LEFT JOIN o ON e.user_id = o.k AND e.ts >= o.ots
        |ORDER BY e.event_id""".stripMargin) { (s, d) =>
      // one deterministic row per (custkey, date): the max orderkey wins
      val o = Tables.orders(s, d)
        .groupBy(col("o_custkey").as("k"), col("o_orderdate").cast("timestamp").as("ots"))
        .agg(max(col("o_orderkey")).as("okey"),
          max_by(col("o_totalprice"), col("o_orderkey")).as("oprice"))
      TemporalJoins.asofJoin(
        Tables.events(s, d).select("event_id", "user_id", "ts"),
        "user_id", "ts", o, "k", "ots",
        struct(col("okey"), col("oprice")), asofCol = "__asof")
        .select(col("event_id"), col("user_id"),
          col("__asof.okey").as("last_orderkey"),
          col("__asof.oprice").as("last_totalprice"))
        .orderBy("event_id")
    },

    // ---- q46: range join — events within 1 h after each purchase -----------
    QueryDef(
      "q46_range_join",
      """SELECT a.event_id, CAST(COUNT(*) AS BIGINT) AS n_in_window
        |FROM events a
        |JOIN events b ON b.user_id = a.user_id
        |  AND b.ts >= a.ts AND b.ts < a.ts + INTERVAL 1 HOUR
        |WHERE a.event_type = 'purchase'
        |GROUP BY a.event_id
        |ORDER BY a.event_id""".stripMargin) { (s, d) =>
      val events = Tables.events(s, d)
      TemporalJoins.rangeJoinCount(
        events.filter(col("event_type") === "purchase"), "event_id",
        "user_id", "ts", events, "user_id", "ts", windowSec = 3600)
        .orderBy("event_id")
    }
  )
}
