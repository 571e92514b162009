package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's core ETL surface, re-expressed Spark-first.
  *
  * Pipeline semantics (reference `spark_airports_final.py:19-101`):
  * Kafka-JSON wire → CAST(value AS STRING) (P1) → `from_json` with explicit
  * all-string schema, PERMISSIVE (P2) → struct flatten `select("data.*")`
  * (P3) → `when/otherwise` conditional cast with typed null literals
  * (P4/P5/P6) → null/validity filter (F1) → cleaned 5-col table → global
  * multi-aggregate stats (A1) → sink. Malformed JSON yields a null struct
  * (all-null row) and is dropped by the filter — *permissive-then-drop*.
  *
  * Missing keys are possible on the wire: the reference's NiFi
  * `AttributesToJSON` omits absent attributes (`Null Value=false`,
  * `tp.xml:1296`), so `from_json` must produce nulls for them (it does).
  *
  * Scale notes: every step here is a narrow map — no shuffle until the
  * stats aggregate (partial+final hash agg). The parse/clean path is pure
  * codegen'd Catalyst expressions (no UDFs), so it whole-stage-codegens
  * into the scan.
  */
object Etl {

  /** Canonical wire schema — all strings, as the reference's final job
    * declares (`spark_airports_final.py:35-41`). */
  val airportSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("icao", StringType),
    StructField("name", StringType),
    StructField("lat", StringType),
    StructField("lon", StringType)))

  /** Typed-parse variant (`spark-jars/spark_airports_final.py:40-44`):
    * lat/lon DoubleType directly — bad coords silently null inside
    * from_json. */
  val airportSchemaTyped: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("icao", StringType),
    StructField("name", StringType),
    StructField("lat", DoubleType),
    StructField("lon", DoubleType)))

  /** OpenAIP-like HTTP response page: {"items":[{airport},...]}. */
  val pageSchema: StructType =
    StructType(Seq(StructField("items", ArrayType(airportSchema))))

  /** P1+P2+P3: binary Kafka value → UTF-8 string → parsed struct →
    * flattened columns. Input must have a binary (or string) `value`
    * column; output columns = airportSchema fields. */
  def parse(wire: DataFrame, schema: StructType = airportSchema): DataFrame =
    wire
      .selectExpr("CAST(value AS STRING) AS value_str")
      .select(from_json(col("value_str"), schema).as("data"))
      .select("data.*")

  /** P4/P5/P6: conditional cast of string coords to double; '' and
    * non-numeric → null (requires ANSI off, pinned in GraftSession). */
  private def cleanCoord(c: Column): Column =
    when(c =!= "" && c.isNotNull, c.cast(DoubleType))
      .otherwise(lit(null).cast(DoubleType))

  /** P4-P7 + F1: the reference's clean step
    * (`spark_airports_final.py:53-60`). */
  def clean(parsed: DataFrame): DataFrame =
    parsed
      .withColumn("latitude", cleanCoord(col("lat")))
      .withColumn("longitude", cleanCoord(col("lon")))
      .filter(col("latitude").isNotNull && col("longitude").isNotNull)
      .select("id", "name", "icao", "latitude", "longitude")

  /** A1: the reference's global multi-aggregate
    * (`spark_airports_final.py:67-74`), decimal-exact averages for
    * cross-engine determinism. */
  def stats(cleaned: DataFrame): DataFrame =
    cleaned.agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("id")).as("n_ids"),
      (sum(col("latitude").cast(DecimalType(18, 4))).cast("double") / count(lit(1))).as("avg_lat"),
      (sum(col("longitude").cast(DecimalType(18, 4))).cast("double") / count(lit(1))).as("avg_lon"),
      min(col("latitude")).as("min_lat"),
      max(col("latitude")).as("max_lat"))

  /** P10 + K3 shape: re-serialize rows to the keyed Kafka wire format the
    * NiFi flow produces (`AttributesToJSON` → `PublishKafka`,
    * `tp.xml:1281,875`). Null fields are omitted by `to_json`, matching
    * NiFi `Null Value=false`. */
  def toWire(df: DataFrame, keyCol: String, fields: Seq[String]): DataFrame =
    df.select(col(keyCol).as("key"),
      to_json(struct(fields.map(col): _*)).as("value"))

  /** §2.10 NiFi SplitJson emulation: explode `$.items[*]` of an HTTP
    * response page body into one row per item. */
  def splitItems(pages: DataFrame, bodyCol: String): DataFrame =
    pages
      .select(explode(from_json(col(bodyCol), pageSchema).getField("items")).as("item"))
      .select("item.*")

  /** F3 + full lifecycle: the reference's batch job
    * (`spark_airports_final.py`, §3.1) with the 8-actions-no-cache quirk
    * fixed by a single persist. Returns (cleanedCount, stats row count)
    * after writing `cleaned` via `sink`; short-circuits on empty input
    * exactly like the reference's `if count > 0` gate.
    */
  def runBatch(
      spark: SparkSession,
      wire: DataFrame,
      sink: DataFrame => Unit): (Long, Long) = {
    val n = wire.count()              // A2 action #1, gate input
    if (n == 0) (0L, 0L)              // F3 empty-topic short-circuit
    else {
      val cleaned = clean(parse(wire)).persist()
      try {
        val nClean = cleaned.count()  // A2 action #2
        val st = stats(cleaned)
        val nStats = st.count()
        sink(cleaned)                 // K1-equivalent durable write
        (nClean, nStats)
      } finally { cleaned.unpersist(); () }
    }
  }
}
