package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics beyond [[Components]]: fixed-point PageRank.
  *
  * Ranks are scaled BIGINTs (1.0 → 1e6) and every step uses integral
  * `div` — integer addition is associative and engine-independent, so the
  * result is bit-identical regardless of partitioning, aggregation order,
  * or engine (the property that lets an iterative "float" algorithm be
  * oracle-hash-checked; a double-summed PageRank differs in ulps between
  * any two shuffle layouts).
  *
  * Scale: each iteration is one keyed join of the persisted degree-
  * annotated edge list against the current rank table and one keyed
  * aggregation — the standard Pregel-as-join shape. At a fixed small
  * iteration count the lineage stays flat; an until-convergence variant
  * would add per-round `localCheckpoint` + an `observe` metric exactly
  * like [[Components.connectedComponents]].
  */
object Graph {

  /** `iters` rounds of damping-0.85 PageRank over `edges` (directed
    * (src, dst) pairs; pass both directions for an undirected graph).
    * Returns (id, rank) for every node with at least one OUT-edge, rank
    * scaled by 1e6: rank'(v) = 0.15 + 0.85 · Σ_{u→v} rank(u)/outdeg(u)
    * in fixed-point (`div`) arithmetic.
    *
    * EAGER: the returned frame is `localCheckpoint`ed — the rank table is
    * node-sized (metadata-scale next to the edge list), and materializing
    * inside the call lets the 2·iters iteration shuffles run at a width
    * sized from the MEASURED edge count (same rationale and formula as
    * [[Components.connectedComponents]]: AQE's parallelismFirst refuses to
    * coalesce below defaultParallelism, so fixed-width iteration stages on
    * a contracted graph pay task-launch overhead ~4× the useful work —
    * measured 3.0 s → 1.5 s on a 16k-edge graph at local[32]). The
    * degree-annotation pass over the full edge list still runs at the
    * session width; only the rank iterations narrow. Eagerness also lets
    * the internal edge-list cache be released before returning (the
    * previous lazy form leaked its persisted frame — callers couldn't
    * unpersist a cache they never saw). The shuffle-width conf is set and
    * restored around the iterations; concurrent actions on the same
    * session may observe it (see q124's builder-level snapshot).
    */
  def fixedPointPageRank(edges: DataFrame, src: String, dst: String,
                         iters: Int): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.select(col(src).as("u"), col(dst).as("v"))
    val deg = e.groupBy("u").agg(count(lit(1)).as("od"))
    // (u, v, od): scanned once per iteration — persisted, not recomputed
    val ed = e.join(deg, "u").persist()
    val shuffleKey = "spark.sql.shuffle.partitions"
    val configuredWidth = spark.conf.get(shuffleKey).toInt
    try {
      // materializes ed (the full-width pass) and measures the graph
      val nEdges = ed.count()
      spark.conf.set(shuffleKey,
        Components.roundWidth(configuredWidth, nEdges).toString)
      // r0 from the CACHED ed, not from deg — deg's lineage rescans the
      // caller's edge frame, which the cache exists to avoid
      var ranks = ed.select(col("u")).distinct()
        .select(col("u").as("id"), lit(1000000L).as("r"))
      for (_ <- 1 to iters) {
        ranks = ed.join(ranks, col("u") === col("id"))
          .select(col("v"), expr("r div od").as("c"))
          .groupBy("v")
          .agg(expr("CAST(150000 + (85 * sum(c)) div 100 AS BIGINT)").as("r"))
          .select(col("v").as("id"), col("r"))
      }
      ranks.localCheckpoint()
    } finally {
      spark.conf.set(shuffleKey, configuredWidth.toString)
      ed.unpersist(blocking = false)
    }
  }

  /** Personalized (seeded) PageRank: the restart mass lands ONLY on the
    * seed set, so rank measures proximity to the seeds along the graph —
    * the quality-propagation primitive (seed = curated/known-good docs,
    * rank = how strongly the match graph vouches for everything else).
    * Same fixed-point integer discipline as [[fixedPointPageRank]]
    * (bit-identical under any partitioning ⇒ oracle-hash-checkable):
    * r'(v) = [v ∈ seeds]·0.15 + 0.85 · Σ_{u→v} r(u)/outdeg(u), r0 =
    * [v ∈ seeds]·1e6. Nodes unreachable from any seed stay at exactly 0.
    * `seedPred` marks the seed rows (a Column over `id`). The node set is
    * the union of BOTH edge endpoints, so sinks (and seeds without
    * out-edges on a directed graph) are ranked rather than dropped.
    */
  def personalizedPageRank(edges: DataFrame, src: String, dst: String,
                           seedPred: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
                           iters: Int): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.select(col(src).as("u"), col(dst).as("v"))
    val deg = e.groupBy("u").agg(count(lit(1)).as("od"))
    val ed = e.join(deg, "u").persist()
    // nodes = BOTH endpoint sets, not just out-degree holders: a sink (or
    // an isolated seed on a directed graph) has no out-edges but must
    // still appear — and a seed among them must keep its restart mass.
    val nodes = e.select(col("u").as("id"))
      .unionByName(e.select(col("v").as("id")))
      .distinct().persist()
    // same eager measured-width discipline (and cache lifecycle) as
    // [[fixedPointPageRank]] — see its scaladoc
    val shuffleKey = "spark.sql.shuffle.partitions"
    val configuredWidth = spark.conf.get(shuffleKey).toInt
    try {
      val nEdges = ed.count()
      spark.conf.set(shuffleKey,
        Components.roundWidth(configuredWidth, nEdges).toString)
      val restart = when(seedPred(col("id")), lit(150000L)).otherwise(lit(0L))
      var ranks = nodes.select(col("id"),
        when(seedPred(col("id")), lit(1000000L)).otherwise(lit(0L)).as("r"))
      for (_ <- 1 to iters) {
        val contrib = ed.join(ranks, col("u") === col("id"))
          .select(col("v"), expr("r div od").as("c"))
          .groupBy("v")
          .agg(expr("CAST((85 * sum(c)) div 100 AS BIGINT)").as("rc"))
        ranks = nodes
          .join(contrib, col("v") === col("id"), "left")
          .select(col("id"), (restart + coalesce(col("rc"), lit(0L))).as("r"))
      }
      ranks.localCheckpoint()
    } finally {
      spark.conf.set(shuffleKey, configuredWidth.toString)
      ed.unpersist(blocking = false)
      nodes.unpersist(blocking = false)
    }
  }
}
