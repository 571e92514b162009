package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Exact order statistics without a total sort.
  *
  * `approx_percentile` (q64/q140) is the right default at 100 TB, but audit
  * queries — SLA cut-offs, exact medians for a data card, reconciling a
  * sketch against truth — need the EXACT rank-k value. The naive plan is a
  * global sort (a full shuffle of the corpus); this operator finds each
  * rank by iterative range refinement instead:
  *
  *   1. one agg for (min, max, count);
  *   2. per round, bucket the still-open ranges into `buckets` equal-width
  *      integer cells and count per cell — one scan with a broadcast
  *      3-row range table, one partial-agg'd groupBy whose output is at
  *      most ranks*buckets rows (metadata-sized, collected to the driver
  *      like Ivf's centroids);
  *   3. walk the histogram to find the cell holding the target rank,
  *      recurse into it. Each round divides the candidate range by
  *      `buckets`, so a 64-bit domain closes in at most ceil(64/log2 B)
  *      rounds (5 at the default 8192); a round's scan touches only rows
  *      still inside an open range, which shrinks geometrically.
  *
  * The input column is persisted across rounds (one projected LONG per
  * row); rank invariant: `base` always equals the exact number of rows
  * strictly below `lo`, so the target rank stays inside [lo, hi] until
  * lo == hi, which IS the answer. Ties, duplicates and negative values are
  * all handled by counting alone — nothing compares floats and nothing
  * depends on partitioning, so the result is deterministic on any cluster.
  */
object Quantiles {

  /** The exact rank-th smallest value (1-indexed, rank in [1, n]) of
    * `valueCol` (integral) for every requested rank. Null values are
    * excluded. Returns rank -> value.
    */
  def exactRanks(
      df: DataFrame,
      valueCol: String,
      ranks: Seq[Long],
      buckets: Int = 8192): Map[Long, Long] =
    run(df, valueCol, lit(1L), (_, _) => ranks, buckets)._2

  /** WEIGHTED exact percentiles: the p-th value is the smallest x whose
    * cumulative weight reaches ceil(W*p/100) of the total weight W —
    * e.g. with weight = n_chars, p=50 is the doc length below which half
    * the corpus' characters live. Weights must be positive integers; the
    * refinement loop is identical to the unweighted one with per-cell
    * SUM(weight) instead of COUNT — unweighted IS weight 1. Returns
    * (p, weightRank, value) sorted by p.
    */
  def exactWeightedPercentiles(
      df: DataFrame,
      valueCol: String,
      weightCol: String,
      percents: Seq[Int],
      buckets: Int = 8192): Seq[(Int, Long, Long)] = {
    require(percents.forall(p => p >= 1 && p <= 100), "percent must be 1..100")
    val (w, byRank) =
      run(df, valueCol, col(weightCol).cast("long"),
        (ww, _) => percents.map(p => math.max(1L, (ww * p + 99) / 100)), buckets)
    percents.sorted.map { p =>
      val k = math.max(1L, (w * p + 99) / 100)
      (p, k, byRank(k))
    }
  }

  /** Exact p-th percentiles (p in integer percent, 1..100) with rank
    * k_p = ceil(n*p/100) clamped to >= 1. Returns (p, rank, value) sorted
    * by p — n is counted once, on the same persisted projection the
    * refinement rounds reuse.
    */
  def exactPercentiles(
      df: DataFrame,
      valueCol: String,
      percents: Seq[Int],
      buckets: Int = 8192): Seq[(Int, Long, Long)] = {
    require(percents.forall(p => p >= 1 && p <= 100), "percent must be 1..100")
    val (n, byRank) =
      run(df, valueCol, lit(1L),
        (nn, _) => percents.map(p => math.max(1L, (nn * p + 99) / 100)), buckets)
    percents.sorted.map { p =>
      val k = math.max(1L, (n * p + 99) / 100)
      (p, k, byRank(k))
    }
  }

  /** Shared refinement loop over weighted ranks (weight 1 = plain rank);
    * `mkRanks` receives (totalWeight, (min, max)). */
  private def run(
      df: DataFrame,
      valueCol: String,
      weight: org.apache.spark.sql.Column,
      mkRanks: (Long, (Long, Long)) => Seq[Long],
      buckets: Int): (Long, Map[Long, Long]) = {
    // >= 4 keeps the unsigned bucket width below 2^62 + 1, so it is always
    // a positive signed long even when the open range spans the full
    // 64-bit domain
    require(buckets >= 4, "need at least 4 buckets per round")
    val spark = df.sparkSession
    import spark.implicits._
    val v = df.select(col(valueCol).cast("long").as("x"), weight.as("w"))
      .filter(col("x").isNotNull && col("w").isNotNull && col("w") > 0)
      .persist()
    try {
      val Row(mn: Long, mx: Long, n: Long) =
        v.agg(min("x"), max("x"), sum("w")).head()
      val ranks = mkRanks(n, (mn, mx))
      require(ranks.nonEmpty && ranks.forall(k => k >= 1 && k <= n),
        s"ranks must lie in [1, $n]")
      // per rank: (lo, hi, base) with base = exact weight strictly below lo
      var st: Map[Long, (Long, Long, Long)] =
        ranks.distinct.map(k => k -> (mn, mx, 0L)).toMap
      while (st.exists { case (_, (lo, hi, _)) => lo < hi }) {
        val open = st.collect { case (k, (lo, hi, _)) if lo < hi =>
          // hi - lo read as UNSIGNED: a range spanning most of the 64-bit
          // domain (lo << 0 << hi) wraps negative in signed arithmetic.
          // wd = floor_u(range/buckets) + 1 >= 1 always covers the range
          // in <= buckets+1 cells, and wd == 1 closes the range this round
          val wd = java.lang.Long.divideUnsigned(hi - lo, buckets) + 1L
          (k, lo, hi, wd)
        }.toSeq
        val rdf = open.toDF("k", "lo", "hi", "wd")
        val hist = v
          .join(broadcast(rdf), col("x") >= col("lo") && col("x") <= col("hi"))
          // bucket = floor_u((x - lo) / wd), all in exact integer math:
          // x - lo is the UNSIGNED offset (wraps negative as a signed
          // long), so divide via the halving identity
          //   u = 2h + bit, floor(u/wd) = 2*floor(h/wd)
          //                 + floor((2*(h mod wd) + bit)/wd)
          // with h = shiftrightunsigned(u, 1) < 2^63. Plain `/` would
          // round through a double (wrong past 2^53) and DIV on the
          // signed offset mis-buckets wide domains.
          .groupBy(col("k"), expr(
            "(shiftrightunsigned(x - lo, 1) DIV wd) * 2 + " +
              "((shiftrightunsigned(x - lo, 1) % wd) * 2 + ((x - lo) & 1)) DIV wd").as("b"))
          .agg(sum("w").as("c"))
          .collect()
          .groupBy(_.getLong(0))
        for ((k, lo0, _, wd) <- open) {
          val (_, hi0, base0) = st(k)
          val cells = hist.getOrElse(k, Array.empty[Row])
            .map(r => (r.getLong(1), r.getLong(2)))
            .sortBy(_._1)
          var cum = base0
          var done = false
          for ((b, c) <- cells if !done) {
            if (cum + c >= k) {
              // b*wd <= range, so the wrapped product + wrapped add land
              // on the true (in-domain) cell start; the cell-end candidate
              // can overflow past Long.Max — saturate to hi0
              val lo1 = lo0 + b * wd
              val cand = lo1 + wd - 1
              val hi1 = if (cand < lo1) hi0 else math.min(hi0, cand)
              st += k -> (if (lo1 == hi1 || wd == 1L) (lo1, lo1, cum)
                          else (lo1, hi1, cum))
              done = true
            } else cum += c
          }
          assert(done, s"rank $k fell out of its range — invariant broken")
        }
      }
      (n, st.map { case (k, (lo, _, _)) => k -> lo })
    } finally v.unpersist()
  }
}
