package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: concatenate documents in a stable
  * order and cut the stream into fixed-capacity context windows
  * ("concat-and-chunk"). A document belongs to the window its FIRST token
  * lands in; a document may straddle its window's end — that is the
  * standard packing semantics (the trainer masks across the boundary).
  *
  * Implementation is a per-group running prefix sum (window function) —
  * deterministic given the order column, no driver-side state. The window
  * is an ordered scan WITHIN each group: at 100 TB don't pack one global
  * group — pack per shard (e.g. group = (lang, shard_id) where shard_id
  * comes from [[Sampling.hashBucket]]), which keeps every partition's scan
  * independent and bounded while preserving determinism. Group cardinality
  * is the parallelism.
  */
object Packing {

  /** Adds `bin` (0-based window index within the group) and `start_offset`
    * (token offset of the doc's first token within its group's stream).
    */
  def concatAndChunk(
      df: DataFrame, groupCols: Seq[String], orderCol: String,
      tokenCol: String, capacity: Int): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("start_offset", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .withColumn("bin", floor(col("start_offset") / capacity).cast("long"))
  }
}
