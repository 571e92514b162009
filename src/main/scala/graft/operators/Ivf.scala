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
    val cArr = array(c.map(lit(_)): _*)
    val cNorm = c.map(x => x * x).sum
    vdot(v, v) - lit(2.0) * vdot(v, cArr) + lit(cNorm)
  }

  /** (dist², cell) structs — struct ordering gives lexicographic argmin. */
  private def cellStructs(v: Column, centroids: Array[Array[Double]]): Seq[Column] =
    centroids.zipWithIndex.map { case (c, i) =>
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
    * drift on tie-break or self-pair semantics. */
  private def probeScoreRank(c: DataFrame, q: DataFrame, k: Int): DataFrame = {
    val scored = c.join(broadcast(q), "cid")
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
              iters: Int = 3, seed: Long = 42L): DataFrame = {
    val centroids = kmeansCentroids(corpus, idCol, vecCol, nlist, iters, seed)
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec"),
      assignCell(col(vecCol), centroids).as("cid"))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"),
      explode(probeCells(col(vecCol), centroids, nprobe)).as("cid"))
    probeScoreRank(c, q, k)
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
                         centroids: Array[Array[Double]], nprobe: Int = 4): DataFrame = {
    val c = spark.read.parquet(path)
      .select(col(idCol).as("nid"), col(vecCol).as("nvec"), col("cid"))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"),
      explode(probeCells(col(vecCol), centroids, nprobe)).as("cid"))
    probeScoreRank(c, q, k)
  }
}
