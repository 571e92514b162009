package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark has no built-in operator for — as-of and bounded
  * range joins — composed from shuffles that stay linear in the data
  * (preference (a) of the custom-operator ladder: composition beats a
  * custom physical operator when the plan shape is already right).
  *
  * The naive formulations are inequality joins, which Spark plans as
  * broadcast-nested-loop or cartesian — quadratic fan-out at scale. Both
  * operators here instead shuffle ONCE on an equi-key:
  *   - as-of: tag both sides, union, and take the last non-null right
  *     payload over a (key, time) window — one exchange on key, one sort,
  *     zero fan-out (the classic log-structured as-of).
  *   - range: quantize time into window-sized buckets; each left row
  *     probes only the ≤2 buckets its window spans — the join is a plain
  *     (key, bucket) equi-join and the residual inequality filters locally.
  */
object TemporalJoins {

  /** The shared union-window core of both as-of directions: tag the two
    * sides, union, ONE (key, time, side) window pass, keep left rows.
    * `rightSide` orders right rows before (0) or after (2) left rows (1)
    * at equal timestamps — ties match in BOTH directions; `pick` is
    * last-ignoreNulls over a backward frame or first-ignoreNulls over a
    * forward one. One copy of the reserved-name guard and the cast/tie
    * discipline so the two directions cannot desynchronize (they are
    * composed as mirrors by q283). */
  private def asofCore(name: String,
                       left: DataFrame, lKey: String, lTs: String,
                       right: DataFrame, rKey: String, rTs: String,
                       payload: Column, asofCol: String,
                       rightSide: Int,
                       frame: org.apache.spark.sql.expressions.WindowSpec,
                       pick: Column => Column): DataFrame = {
    // the left side keeps all its columns, so neither the internal working
    // names nor the OUTPUT column may collide — silently overwriting a
    // caller's column would corrupt its data (r3 advice)
    val reserved = Seq("__k", "__t", "__p", "__side", asofCol)
    val clash = reserved.filter(left.columns.contains)
    require(clash.isEmpty,
      s"$name: left columns ${clash.mkString(", ")} collide with reserved " +
        s"internal/output names (${reserved.mkString(", ")}) — rename them first")
    val r = right.select(col(rKey).as("__k"), col(rTs).cast("timestamp").as("__t"),
      payload.as("__p"), lit(rightSide).as("__side"))
    val l = left
      .withColumn("__k", col(lKey))
      .withColumn("__t", col(lTs).cast("timestamp"))
      .withColumn("__side", lit(1))
    l.unionByName(r, allowMissingColumns = true)
      .withColumn(asofCol, pick(col("__p")).over(frame))
      .filter(col("__side") === 1)
      .drop("__k", "__t", "__p", "__side")
  }

  /** As-of join: for each left row, the latest right payload whose
    * `rTs` ≤ the left row's `lTs`, matched on key (null when no prior
    * right row exists). `payload` should be a struct of the right columns
    * wanted; pre-dedup the right side to one row per (key, ts) for
    * deterministic results. Output = every left column + `asofCol`.
    */
  def asofJoin(left: DataFrame, lKey: String, lTs: String,
               right: DataFrame, rKey: String, rTs: String,
               payload: Column, asofCol: String = "asof"): DataFrame =
    // right rows sort before left rows at equal timestamps → ties match
    asofCore("asofJoin", left, lKey, lTs, right, rKey, rTs, payload, asofCol,
      rightSide = 0,
      frame = Window.partitionBy("__k").orderBy(col("__t"), col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow),
      pick = p => last(p, ignoreNulls = true))

  /** Forward as-of join: for each left row, the EARLIEST right payload
    * whose `rTs` ≥ the left row's `lTs` (the mirror of [[asofJoin]];
    * equal timestamps match). Same single-exchange union-window shape —
    * right rows sort AFTER left rows at equal timestamps and the frame
    * looks forward. Pre-dedup the right side to one row per (key, ts). */
  def asofJoinForward(left: DataFrame, lKey: String, lTs: String,
                      right: DataFrame, rKey: String, rTs: String,
                      payload: Column, asofCol: String = "asof"): DataFrame =
    // left rows sort before right rows at equal timestamps → ties match
    asofCore("asofJoinForward", left, lKey, lTs, right, rKey, rTs, payload,
      asofCol, rightSide = 2,
      frame = Window.partitionBy("__k").orderBy(col("__t"), col("__side"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing),
      pick = p => first(p, ignoreNulls = true))

  /** Bounded range-join count: for each left row (identified by `leftId`),
    * the number of right rows with the same key and `rTs` in
    * [`lTs`, `lTs` + windowSec). Time is quantized into window-sized
    * buckets; a left row probes its own bucket and the next, so the join
    * is a (key, bucket) equi-join with local residual filters — fan-out
    * is bounded by bucket occupancy, never |left|×|right|.
    *
    * By default, left rows with zero in-window matches are OMITTED (inner
    * join semantics — matches the SQL-oracle formulation). Pass
    * `includeEmpty = true` to get one row per distinct left id with a 0
    * count instead (one extra keyed left-join on the id).
    */
  def rangeJoinCount(left: DataFrame, leftId: String, lKey: String, lTs: String,
                     right: DataFrame, rKey: String, rTs: String,
                     windowSec: Long, countCol: String = "n_in_window",
                     includeEmpty: Boolean = false): DataFrame = {
    val winUs = windowSec * 1000000L
    // exact integer floor-division: strip the non-negative pmod remainder,
    // then `div` truncates losslessly. Correct for pre-1970 (negative)
    // epochs and immune to the 2^53 precision cliff a double-division
    // round-trip has (r3 advice)
    def bucket(us: Column): Column =
      call_function("div", us - pmod(us, lit(winUs)), lit(winUs))
    val lBuckets = left.select(col(leftId).as("__lid"), col(lKey).as("__k"),
        unix_micros(col(lTs)).as("__lus"))
      .withColumn("__b", explode(array(
        bucket(col("__lus")), bucket(col("__lus") + winUs))))
      .dropDuplicates("__lid", "__b")
    val rBuckets = right.select(col(rKey).as("__k"),
      unix_micros(col(rTs)).as("__rus"),
      bucket(unix_micros(col(rTs))).as("__b"))
    val counts = lBuckets.join(rBuckets, Seq("__k", "__b"))
      .filter(col("__rus") >= col("__lus") && col("__rus") < col("__lus") + winUs)
      .groupBy(col("__lid"))
      .agg(count(lit(1)).as(countCol))
    if (!includeEmpty) counts.select(col("__lid").as(leftId), col(countCol))
    else left.select(col(leftId).as("__lid")).distinct()
      .join(counts, Seq("__lid"), "left")
      .select(col("__lid").as(leftId),
        coalesce(col(countCol), lit(0L)).as(countCol))
  }
}
