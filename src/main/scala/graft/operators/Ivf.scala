package graft.operators

import graft.functions.VectorExprs.{dot => vdot}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the coarse-quantizer
  * scale path beyond SRP-LSH: k-means centroids partition the corpus into
  * `nlist` cells; a query probes its `nprobe` nearest cells and exact
  * re-ranks only those candidates.
  *
  * Design for 100 TB:
  *   - The centroid model is tiny (nlist × dim doubles) and driver-held,
  *     broadcast into every expression as literals — the same shape as the
  *     LSH hyperplane matrix. Training collects ONLY per-cell running means
  *     (nlist × dim rows per iteration), never vectors.
  *   - Cell assignment is a codegen'd argmin over nlist dot products per
  *     row ([[graft.functions.VectorExprs.dot]]); the corpus shuffles once
  *     on cell id (in a real deployment: write bucketed/partitioned by
  *     cell, so probes prune partitions instead of shuffling).
  *   - The probe is a keyed equi-join on cell id with the (small) query
  *     side broadcast — candidate count is corpus/nlist × nprobe per query,
  *     never N².
  */
object Ivf {

  /** Squared L2 distance to a fixed centroid, via dots (‖v‖² is shared
    * across all centroids by codegen subexpression elimination). */
  private def dist2(v: Column, c: Array[Double]): Column = {
    val cArr = array(c.toIndexedSeq.map(lit(_)): _*)
    val cNorm = c.map(x => x * x).sum
    vdot(v, v) - lit(2.0) * vdot(v, cArr) + lit(cNorm)
  }

  /** (dist², cell) structs — struct ordering gives lexicographic argmin. */
  private def cellStructs(v: Column, centroids: Array[Array[Double]]): Seq[Column] =
    centroids.toIndexedSeq.zipWithIndex.map { case (c, i) =>
      struct(dist2(v, c).as("d"), lit(i).as("cid"))
    }

  /** Nearest cell id for a vector column. */
  def assignCell(v: Column, centroids: Array[Array[Double]]): Column =
    array_min(array(cellStructs(v, centroids): _*)).getField("cid")

  /** The `nprobe` nearest cell ids, nearest first. */
  def probeCells(v: Column, centroids: Array[Array[Double]], nprobe: Int): Column =
    slice(transform(array_sort(array(cellStructs(v, centroids): _*)),
      s => s.getField("cid")), 1, nprobe)

  /** Deterministic Lloyd's k-means over a float-vector column, expressed
    * entirely as DataFrame ops. Init = `nlist` corpus vectors chosen by
    * seeded hash order. Each iteration: codegen'd argmin assignment, then
    * per-(cell, dim) mean via posexplode — only nlist × dim aggregated
    * doubles ever reach the driver. Empty cells keep their previous
    * centroid.
    */
  def kmeansCentroids(df: DataFrame, idCol: String, vecCol: String,
                      nlist: Int, iters: Int = 3, seed: Long = 42L): Array[Array[Double]] = {
    var centroids: Array[Array[Double]] = df
      .select(col(idCol), col(vecCol))
      .orderBy(xxhash64(col(idCol), lit(seed)))
      .limit(nlist)
      .select(col(vecCol).cast("array<double>"))
      .collect()
      .map(_.getSeq[Double](0).toArray)
    (1 to iters).foreach { _ =>
      val assigned = df.select(col(vecCol).as("v"),
        assignCell(col(vecCol), centroids).as("cid"))
      val means = assigned
        .select(col("cid"), posexplode(col("v")))
        .groupBy("cid", "pos")
        .agg(avg(col("col")).as("m"))
        .collect()
      val next = centroids.map(_.clone())
      means.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
      centroids = next
    }
    centroids
  }

  /** Shared probe tail: join cell-assigned corpus (nid, nvec, cid) with
    * the exploded probe set (qid, qvec, cid), exact cosine re-rank, top-k.
    * One implementation so the ad-hoc and partitioned variants cannot
    * drift on tie-break or self-pair semantics.
    *
    * `broadcastProbes` is a caller-made boundedness promise: true (the
    * production probe shape — a small query set against a huge corpus)
    * force-broadcasts the probe side, which is also what lets dynamic
    * partition pruning skip unprobed cells on the partitioned layout.
    * Callers whose probe set scales WITH the corpus (the all-pairs recall
    * audits q77/q98) must pass false so AQE picks the join strategy — a
    * forced broadcast there would be the q123 OOM pattern. */
  private def probeScoreRank(c: DataFrame, q: DataFrame, k: Int,
                             broadcastProbes: Boolean): DataFrame = {
    val scored = c.join(if (broadcastProbes) broadcast(q) else q, "cid")
      .filter(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
        Similarity.cosine(col("qvec"), col("nvec")).as("cos_sim"))
    val w = Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("nid"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }

  /** IVF top-k: assign corpus to cells once, probe `nprobe` cells per
    * query, exact cosine re-rank. Output (qid, nid, cos_sim, rk). */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              nlist: Int = 16, nprobe: Int = 4,
              iters: Int = 3, seed: Long = 42L,
              broadcastProbes: Boolean = true): DataFrame = {
    val centroids = kmeansCentroids(corpus, idCol, vecCol, nlist, iters, seed)
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec"),
      assignCell(col(vecCol), centroids).as("cid"))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"),
      explode(probeCells(col(vecCol), centroids, nprobe)).as("cid"))
    probeScoreRank(c, q, k, broadcastProbes)
  }

  /** Oracle-replayable Lloyd's k-means + cluster profile in fixed-point
    * integer arithmetic — the q109 trick applied to the IVF quantizer, so
    * an iterative "float" algorithm becomes hash-checkable:
    *
    *   - each float coordinate is quantized ONCE via an exact power-of-two
    *     scale (float→double is exact; ×2^k is exact; floor is exact), so
    *     both engines see identical integers;
    *   - a constant offset makes every coordinate non-negative, so the
    *     centroid-mean floor division (`div` here, `//` in DuckDB, which
    *     disagree on negatives) is engine-identical;
    *   - distances/means/drift are integer sums — associative, so results
    *     are bit-identical under any partitioning or merge order;
    *   - argmin ties break by cell id via lexicographic struct-min;
    *   - init = the `nlist` vectors ranked by a portable 60-bit md5 hash.
    *
    * Unlike [[kmeansCentroids]] (driver-held nlist×dim means), this path
    * keeps the centroid tables AS DataFrames end-to-end — nothing ever
    * reaches the driver, and each round is a broadcast-nlist cross join
    * (per-row map work) plus one keyed (cell, dim) aggregation, so the
    * shape survives a corpus of any size.
    *
    * Returns per final cell: (cid, n_vecs, mean_dist, drift_l1) where
    * mean_dist is the floor-mean quantized squared distance under the
    * final assignment and drift_l1 the L1 centroid movement of the last
    * Lloyd round — the convergence/balance profile an IVF deploy watches
    * (skewed cells ⇒ bad probe latency; high drift ⇒ train longer).
    */
  /** Exact power-of-two fixed-point quantization of a float-vector column
    * — the ONE lossy step of the oracle-replayable k-means: float→double
    * is exact, ×2^k is exact, floor is exact, and the constant offset
    * makes every coordinate non-negative so floor division (`div` /
    * DuckDB `//`) is engine-identical downstream. */
  def quantizeVec(vecCol: Column, scale: Int = 1024, offset: Long = 1024L): Column =
    transform(vecCol, x => floor(x.cast("double") * scale).cast("long") + offset)

  /** The fixed-point Lloyd core over a pre-quantized `(vid, qv)` frame:
    * `iters` rounds of integer Lloyd from a portable md5-ranked init.
    * Returns (final centroids `(cid, c)`, previous-round centroids, final
    * assignment `(vid, cid, dist)`). Shared by the q150 profile and the
    * q193 IVF-SQ8 index so the replayable quantizer cannot drift between
    * its consumers. The caller should persist/checkpoint `qv` — it is
    * scanned by every round. */
  private[graft] def fixedPointLloyd(qv: DataFrame, nlist: Int, iters: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    require(nlist >= 1 && iters >= 1)
    val hh = conv(substring(md5(col("vid").cast("string")), 1, 15), 16, 10)
      .cast("long")
    val wInit = Window.orderBy("h", "vid")
    val c0 = qv.select(col("vid"), col("qv"), hh.as("h"))
      .orderBy("h", "vid").limit(nlist)
      .select((row_number().over(wInit) - 1).cast("long").as("cid"),
        col("qv").as("c"))
    def assign(cents: DataFrame): DataFrame =
      qv.crossJoin(broadcast(cents))
        .select(col("vid"), col("cid"),
          aggregate(zip_with(col("qv"), col("c"), (a, b) => (a - b) * (a - b)),
            lit(0L), (acc, x) => acc + x).as("dist"))
        .groupBy("vid")
        .agg(min(struct(col("dist"), col("cid"))).as("mn"))
        .select(col("vid"), col("mn.cid").as("cid"), col("mn.dist").as("dist"))
    def update(prev: DataFrame, asg: DataFrame): DataFrame = {
      val means = asg.join(qv, "vid")
        .select(col("cid"), posexplode(col("qv")))
        .groupBy("cid", "pos")
        .agg(expr("sum(col) div count(1)").as("m"))
      // empty cells keep their previous centroid (coalesce per dimension)
      prev.select(col("cid"), posexplode(col("c")))
        .join(means, Seq("cid", "pos"), "left")
        .groupBy("cid")
        .agg(transform(
          array_sort(collect_list(struct(col("pos"),
            coalesce(col("m"), col("col")).as("v")))),
          s => s.getField("v")).as("c"))
    }
    // Eager per-round materialization (the fixedPointPageRank idiom): each
    // round executes ONCE against the caller's persisted qv and lands in a
    // localCheckpoint-backed frame, so (a) round r+1 and every downstream
    // consumer read a block scan instead of re-executing an iters-deep lazy
    // tree, and (b) the caller can release its qv persist the moment this
    // returns (ADVICE r13: q193/q150's persist leaked for the session's
    // lifetime because the lazily-returned frames still referenced it).
    // cents/prev are nlist-row; the final assignment is corpus-sized but
    // one narrow (vid, cid, dist) pass — the same table an IVF build
    // materializes into its cell layout anyway.
    var prev = c0.localCheckpoint()
    var cents = prev
    for (_ <- 1 to iters) {
      prev = cents
      cents = update(cents, assign(cents)).localCheckpoint()
    }
    // limit(nlist) is a no-op on content (the centroid table holds exactly
    // nlist rows) but restores STATIC boundedness evidence on the
    // checkpoint-backed frame — callers broadcast the centroids, and the
    // PlanSpec audit rightly refuses a forced broadcast whose lineage is
    // an opaque LogicalRDD leaf
    (cents.limit(nlist), prev.limit(nlist), assign(cents).localCheckpoint())
  }

  def fixedPointKmeansProfile(df: DataFrame, idCol: String, vecCol: String,
                              nlist: Int, iters: Int,
                              scale: Int = 1024, offset: Long = 1024L): DataFrame = {
    val qv = df.select(col(idCol).as("vid"),
      quantizeVec(col(vecCol), scale, offset).as("qv"))
      .persist()
    // fixedPointLloyd is eager (checkpoint-backed returns), so the persist
    // is releasable the moment it returns — without the unpersist the
    // blocks leak for the session's lifetime (ADVICE r13)
    val (cents, prev, fin) =
      try fixedPointLloyd(qv, nlist, iters)
      finally qv.unpersist(blocking = false)
    val cnt = fin.groupBy("cid")
      .agg(count(lit(1)).as("n_vecs"),
        expr("sum(dist) div count(1)").as("mean_dist"))
    val dr = cents.join(prev.select(col("cid"), col("c").as("cp")), "cid")
      .select(col("cid"),
        aggregate(zip_with(col("c"), col("cp"), (a, b) => abs(a - b)),
          lit(0L), (acc, x) => acc + x).as("drift_l1"))
    cents.select("cid")
      .join(cnt, Seq("cid"), "left")
      .join(dr, Seq("cid"))
      .select(col("cid"),
        coalesce(col("n_vecs"), lit(0L)).as("n_vecs"),
        coalesce(col("mean_dist"), lit(0L)).as("mean_dist"),
        col("drift_l1"))
      .orderBy("cid")
  }

  /** The 100 TB corpus layout: parquet partitioned by cell id. A probe is
    * then an equi-join on the partition column with the broadcast query
    * side, so dynamic partition pruning restricts the scan to the probed
    * cells' directories — the corpus is neither fully scanned nor shuffled
    * (PlanSpec asserts the pruning expression in the scan's partition
    * filters). Cell assignment happens once, at write time; `Append` mode
    * is the incremental-ingest path — new vectors land in their cells'
    * directories without touching existing files (q98 drives it from a
    * real streaming query). */
  def writeCellPartitioned(corpus: DataFrame, idCol: String, vecCol: String,
                           centroids: Array[Array[Double]], path: String,
                           mode: SaveMode = SaveMode.Overwrite): Unit =
    corpus
      .select(col(idCol), col(vecCol), assignCell(col(vecCol), centroids).as("cid"))
      .write.mode(mode).partitionBy("cid").parquet(path)

  /** IVF top-k against a [[writeCellPartitioned]] layout: same probe shape
    * as [[ivfTopK]], but cell assignment is pre-materialized in the
    * partition layout, so the cid join prunes partitions instead of
    * assigning + shuffling the corpus. */
  def ivfTopKPartitioned(spark: SparkSession, path: String, queries: DataFrame,
                         idCol: String, vecCol: String, k: Int,
                         centroids: Array[Array[Double]], nprobe: Int = 4,
                         broadcastProbes: Boolean = true): DataFrame = {
    val c = spark.read.parquet(path)
      .select(col(idCol).as("nid"), col(vecCol).as("nvec"), col("cid"))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"),
      explode(probeCells(col(vecCol), centroids, nprobe)).as("cid"))
    probeScoreRank(c, q, k, broadcastProbes)
  }
}
