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

  /** Shared oracle for q176 (batch) and q180 (streaming): per-hour counts
    * are mergeable sums, so the incrementally-maintained hourly MV scored
    * once at the end must land on the byte-identical CUSUM verdict (the
    * q116-vs-q105 / q158-vs-q155 same-oracle trick, for drift detection). */
  private val CUSUM_SQL =
    """WITH c AS (
      |  SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS c
      |  FROM events GROUP BY event_type, date_trunc('hour', ts)),
      |k AS (
      |  SELECT event_type, COUNT(*) AS n_hours,
      |    (SUM(c) + COUNT(*) - 1) // COUNT(*) AS k
      |  FROM c GROUP BY event_type),
      |p AS (
      |  SELECT c.event_type, c.h, k.k, k.n_hours,
      |    SUM(c.c - k.k) OVER (PARTITION BY c.event_type ORDER BY c.h
      |      ROWS UNBOUNDED PRECEDING) AS pfx
      |  FROM c JOIN k USING (event_type)),
      |s AS (
      |  SELECT event_type, h, k, n_hours,
      |    pfx - LEAST(MIN(pfx) OVER (PARTITION BY event_type ORDER BY h
      |      ROWS UNBOUNDED PRECEDING), 0) AS s
      |  FROM p)
      |SELECT event_type,
      |  CAST(MAX(n_hours) AS BIGINT) AS n_hours,
      |  CAST(MAX(k) AS BIGINT) AS k_allowance,
      |  CAST(MAX(s) AS BIGINT) AS max_s,
      |  CAST(SUM(CASE WHEN s > 3 * k THEN 1 ELSE 0 END) AS BIGINT) AS n_alarm_hours,
      |  MIN(CASE WHEN s > 3 * k THEN h END) AS first_alarm_hour
      |FROM s GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** The CUSUM scoring pass over an hourly-count relation
    * (event_type, h, c) — two keyed windows, all-integer; see q176. */
  private def cusumScore(hourly: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val allowance = hourly.groupBy("event_type")
      .agg(count(lit(1)).as("n_hours"),
        // DIV, not `/`: Column./ on longs is DOUBLE division, and a
        // truncating cast of a double quotient can land one off the
        // exact integer ceiling at scale
        expr("(sum(c) + count(1) - 1) DIV count(1)").as("k"))
    val w = Window.partitionBy("event_type").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cusum = hourly.join(broadcast(allowance), "event_type")
      .withColumn("pfx", sum(col("c") - col("k")).over(w))
      .withColumn("s", col("pfx") - least(min(col("pfx")).over(w), lit(0L)))
    cusum.groupBy("event_type")
      .agg(max(col("n_hours")).as("n_hours"),
        max(col("k")).as("k_allowance"),
        max(col("s")).as("max_s"),
        sum(when(col("s") > lit(3) * col("k"), 1L).otherwise(0L))
          .as("n_alarm_hours"),
        min(when(col("s") > lit(3) * col("k"), col("h")))
          .as("first_alarm_hour"))
      .orderBy("event_type")
  }

  /** Staged 3-file copy of events per sf dir (cached for the JVM) — q180's
    * micro-batch replay source, one file per AvailableNow batch. Written
    * from the ts-normalized load so the stream side reads plain zoned
    * timestamps. */
  private val eventStages =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def stagedEventBatches(
      s: org.apache.spark.sql.SparkSession, d: String): String =
    eventStages.computeIfAbsent(d, _ => {
      val dir = java.nio.file.Files.createTempDirectory("graft-q180-src-")
      sys.addShutdownHook(graft.streaming.Streams.deleteRecursively(dir))
      Tables.events(s, d).repartition(3)
        .write.mode("overwrite").parquet(dir.toString)
      dir.toString
    })

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
    },

    // ---- q176: CUSUM rate-drift detection via the prefix-sum identity ------
    // The classic one-sided CUSUM s_t = max(0, s_{t-1} + (x_t - k)) is a
    // sequential recurrence — the naive implementation is a per-key loop.
    // The identity s_t = P_t - min(0, min_{j<=t} P_j), with P the running
    // sum of (x_t - k), turns it into TWO keyed window functions (cumulative
    // sum + running min) — fully parallel across keys, no recursion, no UDF,
    // each key's series sorted only inside its own window partition.
    // Applied to the per-hour event-rate series per event_type: allowance
    // k = ceil(mean hourly count) (integer ceiling — exact cross-engine),
    // alarm when s exceeds 3k. All-integer math end-to-end; the output is
    // the per-type drift verdict (max excursion, alarm hours, first alarm).
    QueryDef("q176_cusum_drift", CUSUM_SQL) { (s, d) =>
      cusumScore(Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("c")))
    },

    // ---- q180: streaming CUSUM — incremental hourly MV, scored on merge ----
    // The deployed form of q176: the hourly-count materialized view is
    // maintained incrementally from the stream (per-batch keyed count
    // partials — counts are a commutative monoid, so batch boundaries can
    // straddle hours freely), persisted idempotently (dynamic overwrite of
    // the batch's own partition — a micro-batch retry can never double its
    // rows, cf. q130), and the CUSUM scoring pass runs over the merged MV.
    // Hash-checked against q176's byte-identical oracle: maintenance and
    // recompute must agree exactly. At 100 TB the stream never re-scans
    // history — refresh cost is the batch's, the scoring pass is
    // hours×types-sized.
    QueryDef("q180_stream_cusum", CUSUM_SQL) { (s, d) =>
      val srcDir = stagedEventBatches(s, d)
      val store = TextDedupPack.clearedStore(d, "graft-q180-hourly-")
      val schema = s.read.parquet(srcDir).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(srcDir)
      graft.streaming.Streams.runForeachBatch(s, stream, (batch, batchId) =>
        batch.groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("c"))
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(store.toString))
      cusumScore(s.read.parquet(store.toString)
        .groupBy("event_type", "h").agg(sum(col("c")).as("c")))
    }
  )
}
