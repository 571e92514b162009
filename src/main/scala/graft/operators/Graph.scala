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
  * standard Pregel-as-join shape. The iterations run inside a
  * [[Components.narrowClone]] — a conf-isolated `newSession()` whose
  * `spark.sql.shuffle.partitions` is the measured round width — so every
  * exchange, aggregation, and checkpoint plans at the width the measured
  * edge count warrants while the CALLER's session conf is never touched
  * (the r11 form narrowed the shared conf around the rounds — racy under
  * concurrent queries; the r12 form spelled the width as in-plan
  * `repartition(w, key)` of the raw contributions, which pushed the
  * aggregations' partial step after the exchange — edge-volume rows
  * shuffled uncombined — and left the agg/checkpoint stages at full
  * width, measured 1.5–2.5× slower across the family at sf0.1). Inside
  * the clone the edge list is routed through one hash exchange on the
  * join key that every iteration reads back, each iteration's only
  * exchange is the contribution aggregation's map-side-combined shuffle,
  * and results are rebound to the caller's session before returning.
  */
object Graph {

  /** The lazy iteration plan over a degree-annotated edge list
    * `ed(u, v, od)`: `iters` rounds of damping-0.85 fixed-point PageRank.
    * Width comes from the session `ed` is bound to — the
    * [[Components.narrowClone]] in production, a narrowed test session in
    * PlanSpec. Exposed for plan tests: a spec can assert every exchange
    * is at the narrow width, that the edge side of each iteration join
    * introduces no exchange beyond the one reused `repartition`, and that
    * each iteration's only exchange is the contribution aggregation's —
    * whose partial (map-side combine) runs inside the join stage.
    */
  private[graft] def rankRounds(ed: DataFrame, iters: Int): DataFrame = {
    val edP = ed.repartition(col("u"))
    // r0 from edP: the alias-projected partitioning (u→id) already
    // satisfies the distinct, and the next join — no exchange either way
    var ranks = edP.select(col("u").as("id")).distinct()
      .select(col("id"), lit(1000000L).as("r"))
    for (_ <- 1 to iters) {
      // ONE exchange per iteration: the contribution sum's. Its partial
      // agg runs map-side in the join stage (per-partition repeats of a
      // target node combine before the shuffle — the r12 form
      // repartitioned the raw (v, c) pairs BEFORE the groupBy, shuffling
      // edge-volume rows uncombined, measured 1.5× slower: q109 3.14 s →
      // 4.75 s at sf0.1), and its output partitioning — hash(v) at the
      // clone width, aliased to id — already co-partitions the next
      // iteration's join with edP.
      ranks = edP.join(ranks, col("u") === col("id"))
        .select(col("v"), expr("r div od").as("c"))
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
    * inside the call lets the iterations run in a
    * [[Components.narrowClone]] sized from the MEASURED edge count (same
    * formula as [[Components.roundWidth]]: AQE's parallelismFirst refuses
    * to coalesce below defaultParallelism, so fixed-width iteration
    * stages on a small graph pay task-launch overhead ~4× the useful
    * work — measured 3.0 s → 1.5 s on a 16k-edge graph at local[32]).
    * The degree-annotation pass over the full edge list runs at the
    * caller's session width; only the iterations narrow, inside the
    * conf-isolated clone (see the object scaladoc — the caller's session
    * conf is never touched). Eagerness also lets the internal edge-list
    * cache be released before returning; the checkpointed result is
    * rebound to the caller's session.
    */
  def fixedPointPageRank(edges: DataFrame, src: String, dst: String,
                         iters: Int): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.select(col(src).as("u"), col(dst).as("v"))
    val deg = e.groupBy("u").agg(count(lit(1)).as("od"))
    // (u, v, od): materialized once at session width via eager
    // localCheckpoint — a block scan any session of the context can read
    // (cross-session cache substitution is unreliable; see
    // [[Components.connectedComponents]]). The single reused narrow
    // exchange inside rankRounds reads these blocks once; they free via
    // the ContextCleaner when the returned checkpoint drops them.
    val ed = e.join(deg, "u").localCheckpoint()
    val nEdges = ed.count()
    val w = Components.roundWidth(
      spark.conf.get("spark.sql.shuffle.partitions").toInt, nEdges)
    val s2 = Components.narrowClone(spark, w)
    Components.rebind(
      rankRounds(Components.rebind(ed, s2), iters).localCheckpoint(),
      spark)
  }

  /** Lazy iteration plan for [[personalizedPageRank]] over the
    * degree-annotated edge list `ed(u, v, od)` and the node universe
    * `nodes(id)` (need not be pre-deduplicated — the distinct rides the
    * narrow exchange). Width comes from the session the inputs are bound
    * to, as in [[rankRounds]]; the per-iteration left join against the
    * node universe consumes the one reused narrow exchange over `nodes`,
    * and the contribution aggregation — each iteration's only exchange —
    * is map-side combined, its hash(v) output co-partitioning the left
    * join.
    */
  private[graft] def personalizedRounds(
      ed: DataFrame, nodes: DataFrame,
      seedPred: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      iters: Int): DataFrame = {
    val edP = ed.repartition(col("u"))
    // distinct AFTER the narrow exchange: the hash(id) partitioning
    // satisfies it, so the node universe costs one exchange total, not two
    val nodesP = nodes.repartition(col("id")).distinct()
    val restart = when(seedPred(col("id")), lit(150000L)).otherwise(lit(0L))
    var ranks = nodesP.select(col("id"),
      when(seedPred(col("id")), lit(1000000L)).otherwise(lit(0L)).as("r"))
    for (_ <- 1 to iters) {
      // agg is the iteration's only exchange — map-side combine upstream;
      // see [[rankRounds]]
      val contrib = edP.join(ranks, col("u") === col("id"))
        .select(col("v"), expr("r div od").as("c"))
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
    // eager checkpoint for cross-session rebinding — see fixedPointPageRank
    val ed = e.join(deg, "u").localCheckpoint()
    // nodes = BOTH endpoint sets, not just out-degree holders: a sink (or
    // an isolated seed on a directed graph) has no out-edges but must
    // still appear — and a seed among them must keep its restart mass.
    // Derived from the CHECKPOINTED ed (u plus its neighbors v), not from
    // the raw edge pipeline: every out-edge holder contributes its u and
    // every in-edge holder appears as some u's v, so the id universe is
    // identical — and the upstream pair pipeline is never re-run for it.
    // Not pre-deduplicated: its only consumers flow through
    // personalizedRounds' single reused narrow exchange (which the
    // distinct rides), and that exchange materializes once.
    val nodes = ed.select(col("u").as("id"))
      .unionByName(ed.select(col("v").as("id")))
    val nEdges = ed.count()
    val w = Components.roundWidth(
      spark.conf.get("spark.sql.shuffle.partitions").toInt, nEdges)
    val s2 = Components.narrowClone(spark, w)
    Components.rebind(
      personalizedRounds(Components.rebind(ed, s2),
        Components.rebind(nodes, s2), seedPred, iters).localCheckpoint(),
      spark)
  }
}
