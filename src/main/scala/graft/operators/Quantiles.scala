package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Exact order statistics without a total sort.
  *
  * `approx_percentile` (q64/q140) is the right default at 100 TB, but audit
  * queries — SLA cut-offs, exact medians for a data card, reconciling a
  * sketch against truth — need the EXACT rank-k value. The naive plan is a
  * global sort (a full shuffle of the corpus); this operator finds each
  * rank by iterative range refinement instead:
  *
  *   1. one agg for per-group (min, max, total weight);
  *   2. per round, bucket the still-open ranges into `buckets` equal-width
  *      integer cells and sum weights per cell — one scan with a broadcast
  *      range table, one partial-agg'd groupBy whose output is at most
  *      openRanges*buckets rows (metadata-sized, collected to the driver
  *      like Ivf's centroids);
  *   3. walk the histogram to find the cell holding the target rank,
  *      recurse into it. Each round divides the candidate range by
  *      `buckets`, so a 64-bit domain closes in at most ceil(64/log2 B)
  *      rounds (5 at the default 8192); a round's scan touches only rows
  *      still inside an open range, which shrinks geometrically.
  *
  * The input is persisted across rounds as one projected (group, LONG,
  * weight) row; rank invariant: `base` always equals the exact weight
  * strictly below `lo`, so the target rank stays inside [lo, hi] until
  * lo == hi, which IS the answer. Ties, duplicates and negative values are
  * all handled by counting alone — nothing compares floats and nothing
  * depends on partitioning, so the result is deterministic on any cluster.
  * Weighted ranks (weight != 1) and per-group states share the same loop:
  * unweighted is weight 1, ungrouped is one group.
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
    run(df, lit(""), valueCol, lit(1L), (_, _, _) => ranks, buckets)._2
      .map { case ((_, k), v) => k -> v }

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
    val (totals, byRank) =
      run(df, lit(""), valueCol, lit(1L),
        (_, nn, _) => percents.map(p => rankOf(nn, p)), buckets)
    val n = totals("")
    percents.sorted.map { p =>
      val k = rankOf(n, p)
      (p, k, byRank(("", k)))
    }
  }

  /** WEIGHTED exact percentiles: the p-th value is the smallest x whose
    * cumulative weight reaches ceil(W*p/100) of the total weight W —
    * e.g. with weight = n_chars, p=50 is the doc length below which half
    * the corpus' characters live. Weights must be positive integers;
    * unweighted IS weight 1. Returns (p, weightRank, value) sorted by p.
    */
  def exactWeightedPercentiles(
      df: DataFrame,
      valueCol: String,
      weightCol: String,
      percents: Seq[Int],
      buckets: Int = 8192): Seq[(Int, Long, Long)] = {
    require(percents.forall(p => p >= 1 && p <= 100), "percent must be 1..100")
    val (totals, byRank) =
      run(df, lit(""), valueCol, col(weightCol).cast("long"),
        (_, ww, _) => percents.map(p => rankOf(ww, p)), buckets)
    val w = totals("")
    percents.sorted.map { p =>
      val k = rankOf(w, p)
      (p, k, byRank(("", k)))
    }
  }

  /** PER-GROUP exact percentiles: every group refines its own ranges in
    * the SAME rounds — one scan per round covers all groups' open ranges
    * via the broadcast range table, so the round count is driven by the
    * widest group, not the group count. Driver state is
    * O(groups × percents) triples; the per-round histogram is at most
    * openRanges × buckets cells (use a smaller `buckets` for very many
    * groups). Returns (group, p, rank, value) sorted.
    */
  def exactGroupPercentiles(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      percents: Seq[Int],
      buckets: Int = 1024): Seq[(String, Int, Long, Long)] = {
    require(percents.forall(p => p >= 1 && p <= 100), "percent must be 1..100")
    val (totals, byRank) =
      run(df, col(groupCol).cast("string"), valueCol, lit(1L),
        (_, nn, _) => percents.map(p => rankOf(nn, p)), buckets)
    totals.keys.toSeq.sorted.flatMap { g =>
      percents.sorted.map { p =>
        val k = rankOf(totals(g), p)
        (g, p, k, byRank((g, k)))
      }
    }
  }

  /** ceil(n*p/100) clamped to >= 1. */
  private def rankOf(n: Long, p: Int): Long = math.max(1L, (n * p + 99) / 100)

  /** Shared refinement loop over (group, weighted rank) states; `mkRanks`
    * receives (group, totalWeight, (min, max)) per group. Returns
    * (per-group total weight, (group, rank) -> value). */
  private def run(
      df: DataFrame,
      group: Column,
      valueCol: String,
      weight: Column,
      mkRanks: (String, Long, (Long, Long)) => Seq[Long],
      buckets: Int): (Map[String, Long], Map[(String, Long), Long]) = {
    // >= 4 keeps the unsigned bucket width below 2^62 + 1, so it is always
    // a positive signed long even when the open range spans the full
    // 64-bit domain
    require(buckets >= 4, "need at least 4 buckets per round")
    val spark = df.sparkSession
    import spark.implicits._
    val v = df.select(group.as("g"), col(valueCol).cast("long").as("x"), weight.as("w"))
      .filter(col("g").isNotNull && col("x").isNotNull &&
        col("w").isNotNull && col("w") > 0)
      .persist()
    try {
      val stats = v.groupBy("g").agg(min("x"), max("x"), sum("w"))
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      require(stats.nonEmpty, "no non-null rows")
      val totals = stats.map { case (g, (_, _, n)) => g -> n }
      // per (group, rank): (lo, hi, base) with base = exact weight
      // strictly below lo within the group
      var st: Map[(String, Long), (Long, Long, Long)] =
        stats.flatMap { case (g, (mn, mx, n)) =>
          val ranks = mkRanks(g, n, (mn, mx))
          require(ranks.nonEmpty && ranks.forall(k => k >= 1 && k <= n),
            s"group $g: ranks must lie in [1, $n]")
          ranks.distinct.map(k => (g, k) -> (mn, mx, 0L))
        }
      while (st.exists { case (_, (lo, hi, _)) => lo < hi }) {
        val open = st.collect { case ((g, k), (lo, hi, _)) if lo < hi =>
          // hi - lo read as UNSIGNED: a range spanning most of the 64-bit
          // domain (lo << 0 << hi) wraps negative in signed arithmetic.
          // wd = floor_u(range/buckets) + 1 >= 1 always covers the range
          // in <= buckets+1 cells, and wd == 1 closes the range this round
          val wd = java.lang.Long.divideUnsigned(hi - lo, buckets) + 1L
          (g, k, lo, hi, wd)
        }.toSeq
        val rdf = open.toDF("gg", "k", "lo", "hi", "wd")
        val hist = v
          .join(broadcast(rdf),
            col("g") === col("gg") && col("x") >= col("lo") && col("x") <= col("hi"))
          // bucket = floor_u((x - lo) / wd), all in exact integer math:
          // x - lo is the UNSIGNED offset (wraps negative as a signed
          // long), so divide via the halving identity
          //   u = 2h + bit, floor(u/wd) = 2*floor(h/wd)
          //                 + floor((2*(h mod wd) + bit)/wd)
          // with h = shiftrightunsigned(u, 1) < 2^63. Plain `/` would
          // round through a double (wrong past 2^53) and DIV on the
          // signed offset mis-buckets wide domains.
          .groupBy(col("g"), col("k"), expr(
            "(shiftrightunsigned(x - lo, 1) DIV wd) * 2 + " +
              "((shiftrightunsigned(x - lo, 1) % wd) * 2 + ((x - lo) & 1)) DIV wd").as("b"))
          .agg(sum("w").as("c"))
          .collect()
          .groupBy(r => (r.getString(0), r.getLong(1)))
        for ((g, k, lo0, _, wd) <- open) {
          val (_, hi0, base0) = st((g, k))
          val cells = hist.getOrElse((g, k), Array.empty[Row])
            .map(r => (r.getLong(2), r.getLong(3)))
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
              st += (g, k) -> (if (lo1 == hi1 || wd == 1L) (lo1, lo1, cum)
                               else (lo1, hi1, cum))
              done = true
            } else cum += c
          }
          assert(done, s"group $g rank $k fell out of its range — invariant broken")
        }
      }
      (totals, st.map { case (gk, (lo, _, _)) => gk -> lo })
    } finally v.unpersist()
  }
}
