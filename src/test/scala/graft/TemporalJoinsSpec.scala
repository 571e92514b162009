package graft

import java.sql.Timestamp

import graft.operators.TemporalJoins
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge semantics of the temporal joins: tie timestamps, missing priors,
  * exact window boundaries.
  */
class TemporalJoinsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin: latest prior payload, ties match, no prior → null") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 11:00:00"), 110.0),
      (2L, ts("2024-01-01 12:00:00"), 200.0))
      .toDF("k", "qts", "px")
    val trades = Seq(
      (10L, 1L, ts("2024-01-01 10:30:00")),  // between quotes → 100
      (11L, 1L, ts("2024-01-01 11:00:00")),  // tie with quote  → 110
      (12L, 1L, ts("2024-01-01 09:00:00")),  // before any      → null
      (13L, 2L, ts("2024-01-01 13:00:00")),  // other key       → 200
      (14L, 3L, ts("2024-01-01 13:00:00")))  // unseen key      → null
      .toDF("trade_id", "k", "tts")
    val got = TemporalJoins.asofJoin(trades, "k", "tts", quotes, "k", "qts",
      struct(col("px")), asofCol = "q")
      .select(col("trade_id"), col("q.px"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got == Map(
      10L -> Some(100.0), 11L -> Some(110.0), 12L -> None,
      13L -> Some(200.0), 14L -> None))
  }

  test("asofJoinForward: earliest following payload, ties match, none after → null") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 11:00:00"), 110.0),
      (2L, ts("2024-01-01 12:00:00"), 200.0))
      .toDF("k", "qts", "px")
    val trades = Seq(
      (10L, 1L, ts("2024-01-01 10:30:00")),  // between quotes → 110
      (11L, 1L, ts("2024-01-01 11:00:00")),  // tie with quote → 110
      (12L, 1L, ts("2024-01-01 11:30:00")),  // after all      → null
      (13L, 2L, ts("2024-01-01 11:00:00")),  // other key      → 200
      (14L, 3L, ts("2024-01-01 11:00:00")))  // unseen key     → null
      .toDF("trade_id", "k", "tts")
    val got = TemporalJoins.asofJoinForward(trades, "k", "tts", quotes, "k", "qts",
      struct(col("px")), asofCol = "q")
      .select(col("trade_id"), col("q.px"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got == Map(
      10L -> Some(110.0), 11L -> Some(110.0), 12L -> None,
      13L -> Some(200.0), 14L -> None))
  }

  test("rangeJoinCount: inclusive start, exclusive end, bucket-boundary windows") {
    val anchors = Seq((1L, 7L, ts("2024-01-01 10:30:00"))).toDF("aid", "k", "ats")
    val others = Seq(
      (7L, ts("2024-01-01 10:30:00")),  // == start → in
      (7L, ts("2024-01-01 11:29:59")),  // just inside (next bucket) → in
      (7L, ts("2024-01-01 11:30:00")),  // == end → out
      (7L, ts("2024-01-01 10:29:59")),  // before → out
      (8L, ts("2024-01-01 10:45:00")))  // other key → out
      .toDF("k", "ots")
    val got = TemporalJoins.rangeJoinCount(
      anchors, "aid", "k", "ats", others, "k", "ots", windowSec = 3600)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L))
  }

  test("rangeJoinCount buckets pre-1970 (negative-epoch) timestamps correctly") {
    // floor semantics matter below epoch 0: truncating division would put
    // 1969-12-31 23:30 in bucket 0 alongside 1970-00:30 and drop matches
    val anchors = Seq((1L, 7L, ts("1969-12-31 23:30:00"))).toDF("aid", "k", "ats")
    val others = Seq(
      (7L, ts("1969-12-31 23:30:00")),  // == start → in
      (7L, ts("1970-01-01 00:29:59")),  // just inside, across epoch 0 → in
      (7L, ts("1970-01-01 00:30:00")),  // == end → out
      (7L, ts("1969-12-31 23:29:59")))  // before → out
      .toDF("k", "ots")
    val got = TemporalJoins.rangeJoinCount(
      anchors, "aid", "k", "ats", others, "k", "ots", windowSec = 3600)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L))
  }

  test("asofJoin refuses a left side whose columns collide with reserved names") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "x")).toDF("k", "tts", "__side")
    val right = Seq((1L, ts("2024-01-01 09:00:00"), 1.0)).toDF("k", "qts", "px")
    val e = intercept[IllegalArgumentException] {
      TemporalJoins.asofJoin(left, "k", "tts", right, "k", "qts", struct(col("px")))
    }
    assert(e.getMessage.contains("__side"))
    // output-name collision is the same corruption class: a left column
    // named like asofCol would be silently overwritten
    val left2 = Seq((1L, ts("2024-01-01 10:00:00"), "x")).toDF("k", "tts", "asof")
    val e2 = intercept[IllegalArgumentException] {
      TemporalJoins.asofJoin(left2, "k", "tts", right, "k", "qts", struct(col("px")))
    }
    assert(e2.getMessage.contains("asof"))
  }

  test("rangeJoinCount includeEmpty emits zero-count rows for unmatched anchors") {
    val anchors = Seq(
      (1L, 7L, ts("2024-01-01 10:30:00")),
      (2L, 9L, ts("2024-01-01 10:30:00")))  // key 9 has no right rows
      .toDF("aid", "k", "ats")
    val others = Seq((7L, ts("2024-01-01 10:45:00"))).toDF("k", "ots")
    val inner = TemporalJoins.rangeJoinCount(
      anchors, "aid", "k", "ats", others, "k", "ots", windowSec = 3600)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inner == Map(1L -> 1L)) // default: unmatched anchor omitted
    val full = TemporalJoins.rangeJoinCount(
      anchors, "aid", "k", "ats", others, "k", "ots", windowSec = 3600,
      includeEmpty = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(full == Map(1L -> 1L, 2L -> 0L))
  }

  test("asofJoin equals the naive inequality join on real events × orders") {
    val events = Tables.events(spark, TestSpark.sf).select("event_id", "user_id", "ts")
    val orders = Tables.orders(spark, TestSpark.sf)
      .groupBy(col("o_custkey").as("k"), col("o_orderdate").cast("timestamp").as("ots"))
      .agg(max(col("o_orderkey")).as("okey"))
    val fast = TemporalJoins.asofJoin(events, "user_id", "ts", orders, "k", "ots",
      struct(col("okey")), asofCol = "a")
      .select(col("event_id"), col("a.okey"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // naive: inequality join + argmax over (ots, okey)
    val naive = events.join(orders,
        events("user_id") === orders("k") && orders("ots") <= events("ts"), "left")
      .groupBy("event_id")
      .agg(max_by(col("okey"), struct(col("ots"), col("okey"))).as("okey"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(fast == naive)
    assert(fast.nonEmpty)
  }

  test("rangeJoinCount equals the naive inequality join on real events") {
    val events = Tables.events(spark, TestSpark.sf)
    val anchors = events.filter(col("event_type") === "signup")
    val fast = TemporalJoins.rangeJoinCount(
      anchors, "event_id", "user_id", "ts", events, "user_id", "ts", 7200)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val naive = anchors.as("a").join(events.as("b"),
        col("b.user_id") === col("a.user_id") &&
          col("b.ts") >= col("a.ts") &&
          col("b.ts") < col("a.ts") + expr("INTERVAL 2 HOURS"))
      .groupBy(col("a.event_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == naive)
  }
}
