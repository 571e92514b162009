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
  * Scale: each iteration is one keyed join of the degree-annotated edge
  * list against the current rank table and one keyed aggregation — the
  * standard Pregel-as-join shape. The iteration width is expressed IN THE
  * PLAN (`repartition(w, key)`), never via session conf: the edge list is
  * routed through one explicit hash exchange on the join key that
  * `ReuseExchange` materializes once and every iteration reads back, and
  * each iteration's rank table comes out of its own width-`w` exchange
  * already co-partitioned for the next join — so after the single edge
  * shuffle, an iteration costs exactly ONE exchange (the contribution
  * re-key), and nothing mutates `spark.sql.shuffle.partitions` (the r11
  * conf-mutation form was invisible to concurrent queries on the same
  * session and un-assertable from the plan). Trade-off: the contribution
  * aggregation's map-side combine now runs after its exchange, so raw
  * (v, c) rows shuffle uncombined — bounded by one edge-list volume per
  * iteration, and at 100 TB the dominant win is the other direction: the
  * cached edge list never re-shuffles per iteration (the bucketed-join
  * layout a cluster job would choose).
  */
object Graph {

  /** The lazy iteration plan over a degree-annotated edge list
    * `ed(u, v, od)`: `iters` rounds of damping-0.85 fixed-point PageRank
    * at explicit width `w`. Exposed for plan tests — [[fixedPointPageRank]]
    * measures `w` and checkpoints the result; this builder stays lazy so a
    * spec can assert every exchange in the plan is width `w` and that the
    * edge side of each iteration join introduces no exchange beyond the
    * one reused `repartition`.
    */
  private[graft] def rankRounds(ed: DataFrame, w: Int, iters: Int): DataFrame = {
    val edP = ed.repartition(w, col("u"))
    // r0 from edP: the alias-projected partitioning (u→id, width w) already
    // satisfies the distinct, and the next join — no exchange either way
    var ranks = edP.select(col("u").as("id")).distinct()
      .select(col("id"), lit(1000000L).as("r"))
    for (_ <- 1 to iters) {
      ranks = edP.join(ranks, col("u") === col("id"))
        .select(col("v"), expr("r div od").as("c"))
        .repartition(w, col("v"))
        .groupBy("v")
        .agg(expr("CAST(150000 + (85 * sum(c)) div 100 AS BIGINT)").as("r"))
        .select(col("v").as("id"), col("r"))
    }
    ranks
  }

  /** `iters` rounds of damping-0.85 PageRank over `edges` (directed
    * (src, dst) pairs; pass both directions for an undirected graph).
    * Returns (id, rank) for every node with at least one OUT-edge, rank
    * scaled by 1e6: rank'(v) = 0.15 + 0.85 · Σ_{u→v} rank(u)/outdeg(u)
    * in fixed-point (`div`) arithmetic.
    *
    * EAGER: the returned frame is `localCheckpoint`ed — the rank table is
    * node-sized (metadata-scale next to the edge list), and materializing
    * inside the call lets the iteration exchanges run at a width sized
    * from the MEASURED edge count (same formula as
    * [[Components.roundWidth]]: AQE's parallelismFirst refuses to coalesce
    * below defaultParallelism, so fixed-width iteration stages on a small
    * graph pay task-launch overhead ~4× the useful work — measured
    * 3.0 s → 1.5 s on a 16k-edge graph at local[32]). The degree-
    * annotation pass over the full edge list runs at the session width;
    * only the iterations narrow, via in-plan `repartition` (see the object
    * scaladoc — no session conf is read-modified, so concurrent queries
    * on the same session are unaffected). Eagerness also lets the
    * internal edge-list cache be released before returning.
    */
  def fixedPointPageRank(edges: DataFrame, src: String, dst: String,
                         iters: Int): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.select(col(src).as("u"), col(dst).as("v"))
    val deg = e.groupBy("u").agg(count(lit(1)).as("od"))
    // (u, v, od): built once at session width, persisted; the single
    // reused width-w exchange inside rankRounds reads this cache once
    val ed = e.join(deg, "u").persist()
    try {
      val nEdges = ed.count()
      val w = Components.roundWidth(
        spark.conf.get("spark.sql.shuffle.partitions").toInt, nEdges)
      rankRounds(ed, w, iters).localCheckpoint()
    } finally ed.unpersist(blocking = false)
  }

  /** Lazy iteration plan for [[personalizedPageRank]] at explicit width
    * `w`, over the degree-annotated edge list `ed(u, v, od)` and the node
    * universe `nodes(id)` (need not be pre-deduplicated — the distinct
    * rides the width-`w` exchange). Same exchange discipline as
    * [[rankRounds]]; the per-iteration left join against the node universe
    * consumes the one reused width-`w` exchange over `nodes`.
    */
  private[graft] def personalizedRounds(
      ed: DataFrame, nodes: DataFrame,
      seedPred: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      w: Int, iters: Int): DataFrame = {
    val edP = ed.repartition(w, col("u"))
    // distinct AFTER the width-w exchange: (id, w) partitioning satisfies
    // it, so the node universe costs one exchange total, not two
    val nodesP = nodes.repartition(w, col("id")).distinct()
    val restart = when(seedPred(col("id")), lit(150000L)).otherwise(lit(0L))
    var ranks = nodesP.select(col("id"),
      when(seedPred(col("id")), lit(1000000L)).otherwise(lit(0L)).as("r"))
    for (_ <- 1 to iters) {
      val contrib = edP.join(ranks, col("u") === col("id"))
        .select(col("v"), expr("r div od").as("c"))
        .repartition(w, col("v"))
        .groupBy("v")
        .agg(expr("CAST((85 * sum(c)) div 100 AS BIGINT)").as("rc"))
      ranks = nodesP
        .join(contrib, col("v") === col("id"), "left")
        .select(col("id"), (restart + coalesce(col("rc"), lit(0L))).as("r"))
    }
    ranks
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
    // Not persisted, not pre-deduplicated: its only consumers flow through
    // personalizedRounds' single reused width-w exchange (which the
    // distinct rides), and that exchange materializes once.
    val nodes = e.select(col("u").as("id"))
      .unionByName(e.select(col("v").as("id")))
    try {
      val nEdges = ed.count()
      val w = Components.roundWidth(
        spark.conf.get("spark.sql.shuffle.partitions").toInt, nEdges)
      personalizedRounds(ed, nodes, seedPred, w, iters).localCheckpoint()
    } finally ed.unpersist(blocking = false)
  }
}
