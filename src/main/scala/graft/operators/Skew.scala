package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit salt-based skew handling — the pre-shuffle complement to AQE's
  * runtime skew-join split (which GraftSession pins on).
  *
  * AQE can only split a skewed partition AFTER a shuffle materializes it;
  * salting changes the key space so the hot key never concentrates in the
  * first place. Use it when one side is replicable (dimension-sized or
  * already filtered) and a handful of keys dominate — the classic
  * power-law join.
  */
object Skew {

  /** Inner equi-join with the left side's hot keys spread over `salts`
    * reducers: each left row gets a deterministic salt from `saltBy`
    * (pick a high-cardinality column, e.g. the row's id), the right side
    * is replicated `salts`×, and the join runs on (key, salt).
    * Result set is identical to `left.join(right, key)` — only the
    * shuffle distribution changes. Right-side cost: `salts`× replication,
    * so keep `salts` ≲ executor count and the right side small.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salts: Int, saltBy: Column): DataFrame = {
    require(salts > 0, "salts must be positive")
    val l = left.withColumn("__salt", pmod(xxhash64(saltBy), lit(salts)).cast("int"))
    val r = right.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
