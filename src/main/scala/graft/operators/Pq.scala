package graft.operators

import graft.functions.VectorExprs.{dot => vdot}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the compressed-domain ANN path beyond
  * SRP-LSH ([[Similarity]]) and IVF ([[Ivf]]): the vector space is split
  * into `m` orthogonal subspaces, each quantized by its own `ks`-centroid
  * codebook, so a vector compresses to `m` small codes and an approximate
  * distance needs only `m` table lookups per pair (asymmetric distance
  * computation, ADC) instead of `dim` multiplies.
  *
  * Design for 100 TB:
  *   - The codebook model is tiny (m × ks × dim/m doubles — a few KB),
  *     trained by the same driver-held k-means as [[Ivf.kmeansCentroids]]
  *     (only per-cell means ever reach the driver) and broadcast back into
  *     codegen'd expressions as literals.
  *   - The ADC scan touches ONLY the code table (m ints per vector here;
  *     m bytes once packed to binary in a production layout) — the full
  *     vectors stay in cold storage and are fetched by a keyed join for
  *     the `cand` ADC survivors per query only. That is the whole point of
  *     PQ: the hot scan is ~dim/m× smaller than the corpus.
  *   - Queries broadcast with a precomputed m·ks distance lookup table
  *     each; the scan is a broadcast nested-loop whose per-pair cost is m
  *     array lookups + adds, all inside whole-stage codegen.
  *   - Exact cosine re-rank of the top-`cand` ADC candidates restores
  *     ranking fidelity (standard IVFADC practice).
  */
object Pq {

  /** Squared L2 distance between a (sub)vector column and a fixed centroid
    * (cf. Ivf's private dist2 — ‖v‖² shared across centroids by codegen
    * subexpression elimination). */
  private def dist2(v: Column, c: Array[Double]): Column = {
    val cArr = array(c.toIndexedSeq.map(lit(_)): _*)
    val cNorm = c.map(x => x * x).sum
    vdot(v, v) - lit(2.0) * vdot(v, cArr) + lit(cNorm)
  }

  /** Train `m` per-subspace codebooks of `ks` centroids each over a
    * `dim`-dimensional float-vector column. Returns books(j)(c) = centroid
    * c of subspace j (dim/m doubles). Each subspace trains independently
    * with its own seed — m small k-means over sliced vectors. */
  def codebooks(df: DataFrame, idCol: String, vecCol: String,
                dim: Int, m: Int = 8, ks: Int = 16,
                iters: Int = 2, seed: Long = 42L): Array[Array[Array[Double]]] = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val sub = dim / m
    (0 until m).map { j =>
      val sliced = df.select(col(idCol), slice(col(vecCol), j * sub + 1, sub).as("__sv"))
      Ivf.kmeansCentroids(sliced, idCol, "__sv", ks, iters, seed + j)
    }.toArray
  }

  /** PQ code array (array&lt;int&gt;, length m): per subspace, the index of
    * the nearest codebook centroid — m independent codegen'd argmins. */
  def encode(v: Column, books: Array[Array[Array[Double]]]): Column = {
    val sub = books(0)(0).length
    array(books.indices.map(j =>
      Ivf.assignCell(slice(v, j * sub + 1, sub), books(j))): _*)
  }

  /** Per-query ADC lookup table: a flat array&lt;double&gt; of length m·ks
    * with lut[j·ks + c] = ‖q_j − books(j)(c)‖² — computed once per query
    * row, broadcast with it. */
  def adcLut(v: Column, books: Array[Array[Array[Double]]]): Column = {
    val ks = books(0).length
    val sub = books(0)(0).length
    array((for (j <- books.indices; c <- 0 until ks) yield
      dist2(slice(v, j * sub + 1, sub), books(j)(c))): _*)
  }

  /** ADC approximate distance between a code array and a query LUT:
    * Σ_j lut[j·ks + codes[j]] — m lookups, no vector math. */
  def adcDistance(codes: Column, lut: Column, m: Int, ks: Int): Column =
    aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
      (acc, j) => acc +
        element_at(lut, (j * ks + element_at(codes, j + 1) + 1).cast("int")))

  /** Shared tail: keep the top `cand` ADC candidates per query, fetch full
    * vectors for the survivors only (keyed joins; query side broadcast),
    * exact-cosine re-rank to top k. One implementation so the flat-scan
    * and IVFADC variants cannot drift on tie-break semantics. */
  private def rerankTail(adcScored: DataFrame, corpus: DataFrame, queries: DataFrame,
                         idCol: String, vecCol: String, k: Int, cand: Int,
                         broadcastQueries: Boolean = true): DataFrame = {
    val wAdc = Window.partitionBy("qid").orderBy(col("adc"), col("nid"))
    val candidates = adcScored
      .withColumn("ar", row_number().over(wAdc))
      .filter(col("ar") <= cand)
      .select("qid", "nid")
    val scored = candidates
      .join(corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec")), "nid")
      .join({
        val qv = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
        if (broadcastQueries) broadcast(qv) else qv
      }, "qid")
      .select(col("qid"), col("nid"),
        Similarity.cosine(col("qvec"), col("nvec")).as("cos_sim"))
    val w = Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("nid"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }

  /** PQ top-k, flat ADC scan: train codebooks, encode the corpus, ADC-scan
    * codes against broadcast query LUTs, exact-cosine re-rank the top
    * `cand` ADC candidates per query. Output (qid, nid, cos_sim, rk),
    * rk ≤ k by descending exact cosine (ties by nid). The scan is
    * O(N·|Q|) pairs (at m lookups each) — right for small query sets;
    * [[ivfAdcTopK]] is the composition that scales the query side. */
  def pqTopK(corpus: DataFrame, queries: DataFrame,
             idCol: String, vecCol: String, k: Int, dim: Int,
             m: Int = 8, ks: Int = 16, cand: Int = 32,
             iters: Int = 2, seed: Long = 42L,
             precomputed: Option[Array[Array[Array[Double]]]] = None): DataFrame = {
    // the codebook model is reusable across queries over the same corpus
    // (cf. VectorPack's per-sf cache) — training is the only driver-side
    // iteration in the pipeline, everything after is one declarative plan
    val books = precomputed.getOrElse(
      codebooks(corpus, idCol, vecCol, dim, m, ks, iters, seed))
    // the hot scan: codes only — no vectors
    val codes = corpus.select(col(idCol).as("nid"), encode(col(vecCol), books).as("codes"))
    val q = queries.select(col(idCol).as("qid"), adcLut(col(vecCol), books).as("lut"))
    val adc = codes.crossJoin(broadcast(q))
      .filter(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"), adcDistance(col("codes"), col("lut"), m, ks).as("adc"))
    rerankTail(adc, corpus, queries, idCol, vecCol, k, cand)
  }

  /** IVFADC — the published IVF+PQ composition (Jégou et al.): the coarse
    * quantizer assigns each corpus vector to a cell, a query ADC-scans
    * only its `nprobe` nearest cells, so per-query work drops from O(N) to
    * O(N·nprobe/nlist) and the scan becomes a KEYED equi-join on cell id
    * (broadcast query side) instead of a cross join — the shape that
    * scales the query side to millions. Any centroid model works
    * correctness-wise (the coarse stage only gates recall); an exact-copy
    * twin always shares its query's FIRST probed cell, so planted-recall
    * certainty survives the composition (q95 hash-audits it). */
  def ivfAdcTopK(corpus: DataFrame, queries: DataFrame,
                 idCol: String, vecCol: String, k: Int, dim: Int,
                 centroids: Array[Array[Double]], nprobe: Int = 2,
                 m: Int = 8, ks: Int = 16, cand: Int = 32,
                 iters: Int = 2, seed: Long = 42L,
                 precomputed: Option[Array[Array[Array[Double]]]] = None,
                 broadcastProbes: Boolean = true): DataFrame = {
    val books = precomputed.getOrElse(
      codebooks(corpus, idCol, vecCol, dim, m, ks, iters, seed))
    // hot scan inputs: codes + cell id only (a vector lives in ONE cell,
    // so no candidate pair can duplicate across the probe explosion)
    val codes = corpus.select(col(idCol).as("nid"),
      Ivf.assignCell(col(vecCol), centroids).as("cid"),
      encode(col(vecCol), books).as("codes"))
    val q = queries.select(col(idCol).as("qid"),
      explode(Ivf.probeCells(col(vecCol), centroids, nprobe)).as("cid"),
      adcLut(col(vecCol), books).as("lut"))
    // broadcastProbes: same caller-made boundedness promise as
    // Ivf.probeScoreRank — false when the query set scales with the corpus
    // (q95's all-pairs recall audit), so AQE picks the join strategy
    val adc = codes.join(if (broadcastProbes) broadcast(q) else q, "cid")
      .filter(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"), adcDistance(col("codes"), col("lut"), m, ks).as("adc"))
    rerankTail(adc, corpus, queries, idCol, vecCol, k, cand, broadcastProbes)
  }
}
