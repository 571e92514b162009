package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi–Sunter probabilistic record linkage (Fellegi & Sunter, "A theory
  * for record linkage", JASA 1969 — public literature), shared by the batch
  * (q186) and streaming (q188) faces.
  *
  * The scoring layer runs AFTER blocking: each candidate pair's
  * field-agreement pattern gets a likelihood ratio
  * `Π m_f/u_f (agree) · (1-m_f)/(1-u_f) (disagree)`, where `u_f` — the
  * chance two NON-matching records agree on field f — is estimated EXACTLY
  * from the value-frequency distribution (`u_f = Σ_v n_v(n_v-1) / N(N-1)`,
  * pure BIGINT arithmetic) and `m_f` — the chance true matches agree — is a
  * model constant per field. Cross-engine bit-stability: the ratio is a
  * fixed-order product of quotients of exact BIGINT-derived doubles,
  * floored to integer basis points (the q133 raw-IEEE-quotient
  * discipline). Overflow/exactness bounds (ADVICE r12/r13): the weights
  * are structured as `(uden/num) · (mNum/mDen)` — two double quotients
  * and one multiply, NO BIGINT-product-with-constant anywhere — so the
  * first integer overflow is `uden = N(N-1)` itself at N ≈ 3.0·10⁹ rows
  * (vs N ≈ 6.8·10⁸ for the old `mDen·uden` form). BIT-IDENTICAL-to-DuckDB
  * replay additionally needs the BIGINT→double conversions exact, which
  * holds while uden < 2^53 (N ≈ 9.5·10⁷); past that the linkage itself is
  * fine (the ratio carries ~1-ulp conversion noise around a 40.0
  * threshold) — only the cross-engine replay stops being exact.
  *
  * 100 TB shape: candidate generation is ONE keyed shuffle on the blocking
  * key (skew pre-flighted by q171's profiler; any blocking family — LSH
  * q28, prefix q131, sorted-neighborhood q177, PassJoin q170 — can feed
  * it); the u-model is three keyed aggs reduced to one broadcast scalar
  * row; scoring is map-side arithmetic on candidates only. Quadratic only
  * in block occupancy, never in the table.
  *
  * The planted ground truth used by both queries lives here too: every
  * custkey%5==0 customer gets a "dirty twin" at +1e6 (last name char
  * replaced, attributes copied, segment perturbed for custkey%10!=0 — a
  * true match the scorer must accept with one field disagreeing) and every
  * custkey%7==3 an "impostor" at +2e6 (IDENTICAL name, nation/segment/band
  * all changed — a distinct entity sharing a name, which name-only matching
  * would falsely merge).
  */
object Linkage {

  val TWIN_OFFSET = 1000000L
  val IMPOSTOR_OFFSET = 2000000L

  /** Per-row plant-soundness guard (ADVICE r12): the planted id ranges
    * [TWIN_OFFSET, 2·TWIN_OFFSET) and [IMPOSTOR_OFFSET, …) are disjoint
    * from base ids ONLY while max(c_custkey) < TWIN_OFFSET (TPC-H customer
    * crosses 1M keys at SF ≈ 7). Past that, [[pairClass]]'s `id_a <
    * TWIN_OFFSET` test and q190's id-range member-class sums would
    * silently corrupt the ground truth — so every record builder routes
    * the key through this guard and fails loudly instead. Two codegen'd
    * comparisons per row, same idiom as `Tables.normalizeTs`'s epoch
    * guard; a deployment at larger SF derives the offsets from the
    * observed max key instead. */
  private def guardedKey(k: Column): Column =
    when(k >= TWIN_OFFSET, raise_error(concat(
      lit("Linkage plant offsets collide with real keys: c_custkey "),
      k.cast("string"),
      lit(s" >= TWIN_OFFSET ($TWIN_OFFSET) — derive offsets from max(c_custkey)")))
      .cast("bigint"))
      .otherwise(k)

  /** Linkage-normalized view of the customer table:
    * (id, name, nation, seg, band). */
  def baseRecords(cust: DataFrame): DataFrame =
    cust.select(guardedKey(col("c_custkey")).as("id"), col("c_name").as("name"),
      col("c_nationkey").as("nation"), col("c_mktsegment").as("seg"),
      bandOf(col("c_acctbal")).as("band"))

  /** Planted dirty twins: true matches with a one-char name edit. */
  def dirtyRecords(cust: DataFrame): DataFrame =
    cust.filter(col("c_custkey") % 5 === 0).select(
      (guardedKey(col("c_custkey")) + TWIN_OFFSET).as("id"),
      concat(col("c_name").substr(lit(1), length(col("c_name")) - 1), lit("Z"))
        .as("name"),
      col("c_nationkey").as("nation"),
      when(col("c_custkey") % 10 === 0, col("c_mktsegment"))
        .otherwise(concat(lit("Z"), col("c_mktsegment"))).as("seg"),
      bandOf(col("c_acctbal")).as("band"))

  /** Planted impostors: same name, every scored field changed. */
  def impostorRecords(cust: DataFrame): DataFrame =
    cust.filter(col("c_custkey") % 7 === 3).select(
      (guardedKey(col("c_custkey")) + IMPOSTOR_OFFSET).as("id"),
      col("c_name").as("name"),
      ((col("c_nationkey") + 1) % 25).as("nation"),
      concat(lit("X"), col("c_mktsegment")).as("seg"),
      bandOf(lit(10000.0) - col("c_acctbal")).as("band"))

  private def bandOf(acctbal: Column): Column = floor(acctbal / 1000.0)

  /** Standard equality blocking key: name minus its last character —
    * lossless for BOTH planted classes by construction (twins differ only
    * in the last char, impostors not at all). */
  def blockKey: Column = col("name").substr(lit(1), length(col("name")) - 1)

  /** The u-probability model as ONE scalar row `(uden, un, us, ub)`:
    * `u_f = <num>/uden` with `uden = N(N-1)` and `<num> = Σ_v n_v(n_v-1)`
    * per field, all exact BIGINTs from three keyed aggs. */
  def uModel(recs: DataFrame): DataFrame = {
    def uNum(c: String, as: String) =
      recs.groupBy(c).agg(count(lit(1)).as("c"))
        .agg(sum(col("c") * (col("c") - 1)).as(as))
    recs.agg(count(lit(1)).as("n"))
      .select((col("n") * (col("n") - 1)).as("uden"))
      .crossJoin(broadcast(uNum("nation", "un")))
      .crossJoin(broadcast(uNum("seg", "us")))
      .crossJoin(broadcast(uNum("band", "ub")))
  }

  /** Likelihood ratio over the three agreement indicators; expects the
    * pair columns `n_a/n_b, s_a/s_b, b_a/b_b` and the [[uModel]] scalars in
    * scope. m-constants: 19/20 (nation), 4/5 (segment), 9/10 (band). */
  def likelihoodRatio: Column = {
    val uden = col("uden")
    // agree weight = m/u = (uden/num) · (mNum/mDen); disagree weight =
    // (1-m)/(1-u) = (uden/(uden-num)) · ((mDen-mNum)/mDen) — the
    // (mDen-mNum) factor must be computed, not assumed 1: the current
    // constants all happen to have mNum = mDen-1, but the helper must stay
    // correct for any m. The m-quotient is a plan-time double CONSTANT
    // (same correctly-rounded IEEE value both engines fold to), so the
    // runtime op sequence is one divide + one multiply and no BIGINT
    // product with a constant is ever formed (overflow bound in the
    // object scaladoc). Order fixed: (uden/num) first, then · m — the
    // oracle SQL mirrors the exact same shape.
    def w(agree: Column, mNum: Long, mDen: Long, num: Column) =
      when(agree, uden.cast("double") / num.cast("double")
          * lit(mNum.toDouble / mDen.toDouble))
        .otherwise(uden.cast("double") / (uden - num).cast("double")
          * lit((mDen - mNum).toDouble / mDen.toDouble))
    w(col("n_a") === col("n_b"), 19L, 20L, col("un")) *
      w(col("s_a") === col("s_b"), 4L, 5L, col("us")) *
      w(col("b_a") === col("b_b"), 9L, 10L, col("ub"))
  }

  /** Three-way decision on the ratio: match / possible / non_match. */
  def decisionOf(lr: Column): Column =
    when(lr >= 40.0, "match").when(lr >= 1.0, "possible")
      .otherwise("non_match")

  /** Planted pair class from id arithmetic. `id_a < TWIN_OFFSET` pins id_a
    * to a BASE record: without it a (dirty_i, impostor_i) pair — diff
    * exactly TWIN_OFFSET and same block, since the dirty name's prefix
    * equals the impostor's — would be mislabeled 'twin'. */
  def pairClass: Column =
    when(col("id_b") - col("id_a") === TWIN_OFFSET &&
      col("id_a") % 5 === 0 && col("id_a") < TWIN_OFFSET, "twin")
      .when(col("id_b") - col("id_a") === IMPOSTOR_OFFSET &&
        col("id_a") % 7 === 3 && col("id_a") < TWIN_OFFSET, "impostor")
      .otherwise("background")

  /** Confusion-matrix aggregation over rows carrying
    * (pair_class, decision, bp). */
  def confusion(scored: DataFrame): DataFrame =
    scored.groupBy("pair_class", "decision")
      .agg(count(lit(1)).as("n_pairs"), sum(col("bp")).as("sum_score_bp"),
        min(col("bp")).as("min_score_bp"), max(col("bp")).as("max_score_bp"))
      .orderBy("pair_class", "decision")
}
