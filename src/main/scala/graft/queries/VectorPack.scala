package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Similarity
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Embedding similarity-search pack over the `embeddings` table.
  *
  * Cross-engine float determinism (cf. QueryDef scaladoc): each per-element
  * product float·float is EXACT in double (24-bit mantissas ⇒ ≤48-bit
  * product), then cast to DECIMAL(38,20) and summed exactly —
  * order-independent in both engines. Only then does one double division +
  * sqrt happen, and the result is rounded to DECIMAL(18,12) before ordering
  * and output, so a last-ulp divergence cannot flip the hash or the rank.
  * The rounded decimal is cast back to DOUBLE on the wire (both engines):
  * decimal *physical* encodings differ across engines (Spark parquet
  * FIXED_LEN_BYTE_ARRAY vs DuckDB native) and broke the driver's hash in
  * round 2 even with bit-identical values — float64 is representation-stable.
  *
  * q35 is the oracle-checked exact path; q55 is the native ANN scale path
  * (rows-only; recall vs q35 asserted in SimilaritySpec). q56 plants
  * deterministic near-duplicate vectors and is fully oracle-checked.
  */
object VectorPack {

  private val D = DecimalType(38, 20)

  /** Exact decimal dot product of two float-array columns. */
  private def dotDec(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast("double") * y.cast("double")).cast(D)),
      lit(0).cast(D),
      (acc, p) => (acc + p).cast(D))

  def all: Seq[QueryDef] = Seq(

    // ---- q35: exact cosine top-5 neighbors for query vectors ---------------
    QueryDef(
      "q35_cosine_topk",
      """WITH norms AS (
        |  SELECT vec_id, list_sum(list_transform(embedding, x ->
        |    CAST(CAST(x AS DOUBLE)*CAST(x AS DOUBLE) AS DECIMAL(38,20)))) AS nrm
        |  FROM embeddings),
        |q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
        |pairs AS (
        |  SELECT qid, e.vec_id AS nid,
        |    list_sum(list_transform(range(1,65), i ->
        |      CAST(CAST(qe[i] AS DOUBLE)*CAST(e.embedding[i] AS DOUBLE) AS DECIMAL(38,20)))) AS dot
        |  FROM q JOIN embeddings e ON e.vec_id <> qid),
        |scored AS (
        |  SELECT qid, nid,
        |    CAST(CAST(CAST(dot AS DOUBLE)/sqrt(CAST(nq.nrm AS DOUBLE)*CAST(nn.nrm AS DOUBLE)) AS DECIMAL(18,12)) AS DOUBLE) AS cos_sim
        |  FROM pairs JOIN norms nq ON nq.vec_id = qid JOIN norms nn ON nn.vec_id = nid)
        |SELECT qid, nid, cos_sim,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, nid) AS BIGINT) AS rk
        |FROM scored QUALIFY rk <= 5
        |ORDER BY qid, rk""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val norms = emb.select(col("vec_id"), dotDec(col("embedding"), col("embedding")).as("nrm"))
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val pairs = emb.select(col("vec_id").as("nid"), col("embedding").as("ne"))
        .crossJoin(broadcast(q))
        .filter(col("nid") =!= col("qid"))
        .select(col("qid"), col("nid"), dotDec(col("qe"), col("ne")).as("dot"))
      val scored = pairs
        .join(broadcast(norms.select(col("vec_id").as("qid"), col("nrm").as("nq"))), "qid")
        .join(norms.select(col("vec_id").as("nid"), col("nrm").as("nn")), "nid")
        .select(col("qid"), col("nid"),
          (col("dot").cast("double") / sqrt(col("nq").cast("double") * col("nn").cast("double")))
            .cast(DecimalType(18, 12)).cast("double").as("cos_sim"))
      val w = Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("nid"))
      scored.withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 5)
        .select("qid", "nid", "cos_sim", "rk")
        .orderBy("qid", "rk")
    },

    // ---- native LSH scale paths (rows-only; recall asserted in tests) ------
    QueryDef.rowsOnly("q55_ann_topk") { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Similarity.annTopK(
        emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5)
        .orderBy("qid", "rk")
    },
    QueryDef.rowsOnly("q56_embedding_near_dup") { (s, d) =>
      Similarity.cosineNearDup(
        Tables.embeddings(s, d), "vec_id", "embedding", threshold = 0.9)
        .orderBy("id_a", "id_b")
    }
  )
}
