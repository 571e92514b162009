package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data operators: changelog compaction (latest row per key) and
  * SCD type-2 interval building — the lakehouse-maintenance face of the
  * reference's batch upsert-into-Postgres step
  * (`/root/reference/spark_airports_final.py:96-104` overwrites the whole
  * table each run; at 100 TB the viable equivalent is compacting a
  * changelog into current state and keeping attribute history as validity
  * intervals).
  *
  * Scale notes:
  *   - [[latestByKey]] is a single `max_by(struct(payload), struct(ord))`
  *     aggregation — partial map-side combine keeps one candidate row per
  *     key per partition, so the shuffle carries |keys| rows, not |input|.
  *     The window-function alternative (row_number over key ORDER BY ord
  *     DESC) shuffles and SORTS the full input; the oracle uses exactly
  *     that alternative, so two different algorithms must agree.
  *   - [[scd2]] is the genuinely order-dependent operator (intervals need
  *     the per-key timeline), so it pays one keyed shuffle + sort and
  *     does all three window passes (change detection, interval close,
  *     version numbering) inside the SAME window partitioning — Catalyst
  *     plans a single Exchange+Sort reused by all three.
  */
object Changes {

  /** Compact a changelog to its latest row per key: for each distinct
    * `keys` combination keep the payload of the row with the greatest
    * `ord` tuple (lexicographic; make the last element unique for full
    * determinism), plus an `n_versions` count of compacted-away rows.
    */
  def latestByKey(df: DataFrame, keys: Seq[String], ord: Seq[String]): DataFrame = {
    val payload = df.columns.filterNot(keys.contains).toSeq
    val compacted = df
      .groupBy(keys.map(col): _*)
      .agg(
        max_by(struct(payload.map(col): _*), struct(ord.map(col): _*)).as("__last"),
        count(lit(1)).as("n_versions"))
    compacted.select(
      keys.map(col) ++ payload.map(c => col(s"__last.`$c`").as(c)) :+ col("n_versions"): _*)
  }

  /** Merge two-or-more already-compacted states (each row carrying an
    * `n_versions` count): keep the payload of the greatest `ord` tuple,
    * SUM the version counts. This is the per-micro-batch MERGE step of
    * the streaming CDC path (q116) — associative and commutative, so any
    * batch split of the changelog folds to the same state (asserted in
    * ChangesSpec, pinned cross-engine by q116's oracle).
    */
  def mergeCompacted(df: DataFrame, keys: Seq[String], ord: Seq[String]): DataFrame = {
    val payload = df.columns.filterNot(c => keys.contains(c) || c == "n_versions").toSeq
    df.groupBy(keys.map(col): _*)
      .agg(
        max_by(struct(payload.map(col): _*), struct(ord.map(col): _*)).as("__last"),
        sum(col("n_versions")).as("n_versions"))
      .select(
        keys.map(col) ++ payload.map(c => col(s"__last.`$c`").as(c)) :+ col("n_versions"): _*)
  }

  /** SCD type-2 history of one attribute: per `key`, order by `ord`,
    * compress consecutive runs of equal `attr`, and emit one row per run
    * with `valid_from` (first `tsCol` of the run), `valid_to` (start of
    * the next run; null while current) and a 1-based `version_no`.
    * `ord` columns must totally order each key's timeline.
    */
  def scd2(df: DataFrame, key: String, attr: String, tsCol: String,
           ord: Seq[String]): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ord.map(col): _*)
    val changes = df
      .withColumn("__prev", lag(col(attr), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col(attr))
      .drop("__prev")
    // the change rows are a subset of the input, already keyed: the second
    // window pass re-sorts only the compressed rows
    val w2 = Window.partitionBy(key).orderBy(ord.map(col): _*)
    changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w2))
      .withColumn("version_no", row_number().over(w2).cast("long"))
      .select(col(key), col(attr), col("valid_from"), col("valid_to"), col("version_no"))
  }
}
