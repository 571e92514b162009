package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md / FIXTURES.md §2).
  *
  * All loads are plain parquet scans — column pruning and predicate pushdown
  * reach the scan via Catalyst, so callers should `select`/`filter` early and
  * let the optimizer prune (verified via `.explain("formatted")`:
  * `PushedFilters` / `ReadSchema`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark does not read
    * natively — read it as long (legacy.parquet.nanosAsLong, set in
    * [[GraftSession.tune]]) and truncate to microseconds, exactly as
    * DuckDB's ns→µs TIMESTAMP conversion does.
    */
  def events(s: SparkSession, d: String): DataFrame =
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** `documents`, fanned out to one partition per core BEFORE heavy per-row
    * text work (shingling, per-row signatures). The fixture is a single
    * parquet split, so without this every pre-shuffle map stage runs on one
    * core; the explicit partition count matters — an unpinned repartition
    * is AQE-coalesced back to ~one task at fixture volume. At deploy scale
    * the source has many splits and this helper is a no-op to drop (it
    * exists so the fixture-shape workaround lives in ONE place, not
    * sprinkled through operators).
    */
  def documentsSpread(s: SparkSession, d: String): DataFrame =
    documents(s, d).repartition(
      s.sparkContext.defaultParallelism,
      org.apache.spark.sql.functions.col("doc_id"))
}
