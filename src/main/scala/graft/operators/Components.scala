package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge list — the clustering step that turns
  * near-duplicate PAIRS (MinHash/SimHash/embedding candidates) into dedup
  * CLUSTERS, so a pipeline can keep one canonical document per group of
  * mutual near-dups instead of reasoning about pairwise edges.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) re-expressed in
  * DataFrame operations. Each round is two rounds of keyed groupBy-min +
  * join — no driver-side graph, no vertex collect — and the edge set
  * monotonically contracts toward a union of stars centered at each
  * component's minimum id. Converges in O(log² n) rounds (2–6 in practice;
  * a path graph of 10⁶ nodes needs ~20, which naive min-label propagation
  * — O(diameter) rounds — could never finish).
  *
  * At 100 TB: per round the shuffles are keyed on node id and the edge set
  * only shrinks, so the dominant cost is the first round over the raw pair
  * list. Each round's output is `localCheckpoint`ed — iterative plans nest
  * ~5× per round, so without truncation the logical plan (and every
  * explain/codegen walk over it) grows exponentially; checkpointing resets
  * it to a scan of the materialized round. On a real cluster prefer
  * `sparkContext.setCheckpointDir` + reliable `checkpoint()` — local
  * checkpoints die with an executor. Superseded rounds' blocks are released
  * by the ContextCleaner once unreferenced.
  */
object Components {

  /** Shared measured-shuffle-width formula for iterative rounds (CC,
    * PageRank, personalized PR, LPA): ~2M edge rows per partition, at
    * least 1, never above the session's configured width. One definition
    * so the rows-per-partition target cannot drift between operators. */
  private[graft] def roundWidth(configuredWidth: Int, rows: Long): Int =
    math.max(1L, math.min(configuredWidth.toLong, rows / 2000000L + 1L)).toInt

  /** (id, component) for every node that appears in `edges`; `component` is
    * the minimum node id of the connected component. Self-loops and
    * duplicate/reversed edges are tolerated. Nodes with no edges don't
    * appear — left-join the vertex set and coalesce to taste.
    *
    * Round shuffle width is sized from the MEASURED edge count (each
    * round's count already rides the checkpoint job): ~2M edge rows per
    * partition, clamped to [1, session `spark.sql.shuffle.partitions`].
    * Rationale: the edge set contracts monotonically, and AQE's default
    * `coalescePartitions.parallelismFirst=true` refuses to coalesce below
    * `defaultParallelism` — so late rounds over a few thousand surviving
    * edges were scheduling full-width stages whose task-launch overhead
    * dominated the round (measured: 5 rounds at width 32 = 6.3 s vs 3.0 s
    * at width 4 on an 8k-edge graph). At 10⁹ edges the same formula gives
    * ~500 partitions — the width a cluster wants — and the cap means a
    * submit-time `spark.sql.shuffle.partitions` is never exceeded. The
    * width lives IN THE PLAN — each star round routes its input through an
    * explicit `repartition(w, ...)` whose partitioning the round's groupBy
    * and join then reuse — so nothing mutates session conf and concurrent
    * queries on the same session are unaffected (the r11 form narrowed
    * `spark.sql.shuffle.partitions` around each round).
    */
  def connectedComponents(
      edges: DataFrame, srcCol: String, dstCol: String,
      maxRounds: Int = 25,
      scope: CacheScope = CacheScope.sessionManaged): DataFrame = {
    // canonical big→small orientation, self-loops dropped, one row per pair
    var e = scope.persist(
      edges
        .select(
          greatest(col(srcCol), col(dstCol)).as("u"),
          least(col(srcCol), col(dstCol)).as("v"))
        .filter(col("u") =!= col("v"))
        .distinct())
    var n = e.count()
    var chk: Option[(java.math.BigDecimal, Long)] = None
    var converged = n == 0L
    var rounds = 0
    val spark = edges.sparkSession
    val configuredWidth = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // `<= maxRounds`: detection consumes a round — the loop only learns it
    // converged one iteration AFTER the edge set stops changing, so a graph
    // needing exactly maxRounds productive rounds gets one extra detection
    // round instead of a spurious failure.
    while (!converged && rounds <= maxRounds) {
      val w = roundWidth(configuredWidth, n)
      // the observe metric rides the SAME job that materializes the eager
      // localCheckpoint (which also truncates lineage) — no separate count()
      // action per round
      val metricName = s"__cc_n_$rounds"
      // Convergence = equal count AND equal order-independent digest, all
      // riding the SAME job that materializes the checkpoint — fixpoint
      // detection costs no extra action. Count alone is not enough (the
      // alternating stars can oscillate through equal-size sets). The
      // digest is a PAIR of independent order-independent reductions over
      // the per-edge 64-bit hash: its exact decimal SUM and its bitwise
      // XOR. A lone sum is not collision-resistant on structured ids —
      // two swapped edges whose hash deltas cancel (h(a)+h(b) =
      // h(c)+h(d)) already defeat it — but a cancellation in the additive
      // group and in GF(2)^64 simultaneously, under the same hash, within
      // the one-star-round reachable set, has no structural shortcut:
      // XOR discards the carries that make additive cancellation
      // constructible, so a collision needs h-values agreeing in both
      // groups at once (~2⁻¹²⁸ accidental). The previous implementation
      // confirmed with an authoritative exceptAll job; that paid a full
      // extra set-difference action at every fixpoint to close a window
      // this digest pair closes for free.
      val obs = starRound(e, w).observe(metricName, count(lit(1)),
        sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)")),
        expr("bit_xor(xxhash64(u, v))"))
      val next = obs.localCheckpoint()
      val metric = obs.queryExecution.observedMetrics.get(metricName)
      val nNext = metric.map(_.getLong(0))
        .getOrElse(next.count()) // defensive: metrics missing ⇒ count directly
      val chkNext = metric.map(r => (
        Option(r.getDecimal(1)).getOrElse(java.math.BigDecimal.ZERO),
        if (r.isNullAt(2)) 0L else r.getLong(2)))
      converged = nNext == n && ((chk, chkNext) match {
        case (Some((sa, xa)), Some((sb, xb))) =>
          sa.compareTo(sb) == 0 && xa == xb
        // defensive: observed metrics unavailable — fall back to the exact
        // set-difference so the loop can still terminate
        case _ => next.exceptAll(e).isEmpty
      })
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        System.err.println(s"[cc] round $rounds: n=$n -> $nNext converged=$converged")
      e.unpersist(blocking = false)
      e = next
      n = nNext
      chk = chkNext
      rounds += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxRounds productive rounds " +
          "+ 1 detection round (raise maxRounds; expected O(log² n))")
    // fixpoint is a union of stars: every non-min node has exactly one edge
    // to its component min; the mins label themselves
    e.select(col("u").as("id"), col("v").as("component"))
      .unionByName(
        e.select(col("v").as("id")).distinct()
          .select(col("id"), col("id").as("component")))
  }

  /** One large-star + small-star round at explicit width `w` — the lazy
    * plan [[connectedComponents]] checkpoints per round. Exposed for plan
    * tests: every exchange in the round is a width-`w` `repartition`
    * whose partitioning the round's groupBy-min and join both reuse (the
    * star's neighborhood scan is shuffled ONCE and read by both the min
    * aggregation and the join probe), so a spec can assert both the
    * width and the exchange count.
    */
  private[graft] def starRound(e: DataFrame, w: Int): DataFrame =
    smallStar(largeStar(e, w), w)

  /** Large-star: every node connects its strictly-larger neighbors to the
    * minimum of its neighborhood (including itself). Output keeps the
    * big→small orientation: emitted (v, m) has v > u ≥ m.
    */
  private def largeStar(e: DataFrame, w: Int): DataFrame = {
    val und = e.select(col("u"), col("v"))
      .unionByName(e.select(col("v").as("u"), col("u").as("v")))
      .repartition(w, col("u"))
    val mins = und.groupBy("u").agg(min("v").as("mn"))
      .select(col("u"), least(col("u"), col("mn")).as("m"))
    und.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
      .repartition(w, col("u"), col("v"))
      .distinct()
  }

  /** Small-star: every node connects its smaller-or-equal neighbors (and
    * itself) to its minimum neighbor. Input and output are big→small
    * oriented (u > v).
    */
  private def smallStar(e: DataFrame, w: Int): DataFrame = {
    val eP = e.repartition(w, col("u"))
    val mins = eP.groupBy("u").agg(min("v").as("m"))
    eP.join(mins, "u")
      .filter(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
      .unionByName(mins.select(col("u"), col("m").as("v")))
      .filter(col("u") =!= col("v"))
      .repartition(w, col("u"), col("v"))
      .distinct()
  }
}
