package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling/split assignment for training
  * pipelines. A corpus split must be (a) stable across runs, engines and
  * cluster sizes — re-shuffling data between train and eval silently leaks
  * eval into training; (b) pure map-side — no shuffle, no global ordering;
  * (c) salt-keyed, so a new experiment re-draws assignments without
  * touching the data.
  *
  * The bucket hash is the first 8 hex chars of md5("salt:id") — the same
  * portable construction the dedup oracles use (identical in Spark and
  * DuckDB), uniform enough for percent-level splits and cheap (one md5 per
  * row, codegen'd).
  */
object Sampling {

  /** Deterministic bucket in [0, buckets) from a salted md5 of the id. */
  def hashBucket(id: Column, salt: String, buckets: Int = 100): Column =
    conv(substring(md5(concat(lit(salt + ":"), id.cast("string"))), 1, 8), 16, 10)
      .cast("long") % buckets

  /** A split-name column from cumulative percent weights, e.g.
    * `Seq("train" -> 80, "val" -> 10, "test" -> 10)`. Weights must sum to
    * 100; every row lands in exactly one split.
    */
  def splitColumn(id: Column, salt: String, splits: Seq[(String, Int)]): Column = {
    require(splits.map(_._2).sum == 100, "split weights must sum to 100")
    require(splits.forall(_._2 > 0), "split weights must be positive")
    val b = hashBucket(id, salt)
    val cuts = splits.scanLeft(0)(_ + _._2).tail // cumulative upper bounds
    splits.init.zip(cuts.init)
      .foldLeft(Option.empty[Column]) { case (acc, ((name, _), hi)) =>
        Some(acc.fold(when(b < hi, name))(_.when(b < hi, name)))
      }
      .fold(lit(splits.head._1))(_.otherwise(splits.last._1))
  }
}
