package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation for shuffled equi-joins: salt the fact side, replicate
  * the dimension side.
  *
  * When one join key holds a disproportionate share of the fact rows, the
  * plain shuffled join sends that entire share to ONE reducer — the
  * classic straggler that turns a 1000-executor join into a single-task
  * wait. Salting splits each fact key across `salts` sub-keys (map-side,
  * no extra shuffle) and replicates each dimension row `salts` times, so
  * the hot key's rows land on `salts` reducers. The trade: the dim side
  * shuffles `salts`× its size — worth it exactly when the dim is much
  * smaller than the hot key's fact share but too big (or the plan
  * disallows) broadcasting. AQE's skew-join handles the sort-merge case
  * at runtime; this operator is the explicit form that also covers
  * shuffled-hash joins, works without AQE, and composes under further
  * aggregation.
  *
  * The salt routes rows but cannot change the join result: every fact row
  * meets every dim row of its key exactly once (the dim copy with the
  * matching salt). SkewSpec asserts equality with the plain join on a
  * planted-hot-key dataset; q111's oracle is the plain join in DuckDB.
  */
object Skew {

  /** Inner equi-join of `fact` and `dim` on `factKey == dimKey`, salted
    * `salts` ways. `saltSrc` is any fact column (ideally unique) hashed to
    * route rows — the choice affects balance, never the result.
    */
  def saltedEquiJoin(fact: DataFrame, dim: DataFrame,
                     factKey: String, dimKey: String, saltSrc: String,
                     salts: Int): DataFrame = {
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(col(saltSrc)), lit(salts)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    // shuffle_hash hint: the whole point is the no-broadcast plan — with a
    // broadcastable dim Spark would elide the shuffle and the salt
    salted.join(replicated.hint("shuffle_hash"),
      salted(factKey) === replicated(dimKey) &&
        salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
