package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation additions (r16 continuation): readability scoring and
  * preference-pair assembly — the two curation passes a training-data
  * pipeline runs between raw quality gates (q25/q70/q172) and dataset
  * assembly (q68-q73, q252).
  *
  * Shared determinism discipline (QueryDef scaladoc): all scores are exact
  * integer arithmetic (scaled rationals, floor division on non-negative
  * numerators so Spark `div` == DuckDB `//`), every window/order carries a
  * unique tiebreaker.
  */
object CurationPack {

  def all: Seq[QueryDef] = Seq(

    // ---- q300: corpus datasheet ---------------------------------------------
    // The registry's capstone composition: the per-source "datasheet for
    // datasets" row (Gebru et al. 2021 — the documentation artifact every
    // released corpus ships) assembled in ONE query from the machinery
    // the registry already trusts — volume (docs, tokens), exact dedup
    // accounting (the q85 fingerprint), language spread + dominant
    // language, and length distribution (exact interpolated percentiles,
    // the q49 discipline). One pass over the corpus feeds one keyed agg;
    // the top-language pick is a per-source window bounded by the
    // language dimension; the join is source-keyed on 20 rows.
    //
    // Determinism: integer counts and floor-div basis points; the only
    // doubles are the percentile interpolation (q49's cross-engine
    // precedent) and ONE division tok_sum/n_docs on exact integers.
    QueryDef(
      "q300_corpus_datasheet",
      """WITH fp AS (
        |  SELECT source, lang, n_chars,
        |    len(string_split(text, ' ')) AS tk,
        |    md5(trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z ]', '', 'g'), '  *', ' ', 'g'))) AS fp
        |  FROM documents),
        |b AS (
        |  SELECT source, COUNT(*) AS n_docs, SUM(tk) AS tok_sum,
        |    COUNT(DISTINCT fp) AS n_distinct, COUNT(DISTINCT lang) AS n_langs,
        |    quantile_cont(n_chars, 0.5) AS p50, quantile_cont(n_chars, 0.9) AS p90
        |  FROM fp GROUP BY source),
        |lc AS (SELECT source, lang, COUNT(*) AS c FROM documents GROUP BY 1, 2),
        |tl AS (SELECT source, lang FROM (
        |         SELECT source, lang,
        |           ROW_NUMBER() OVER (PARTITION BY source
        |             ORDER BY c DESC, lang) AS rn
        |         FROM lc) WHERE rn = 1)
        |SELECT b.source, CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(tok_sum AS BIGINT) AS tok_sum,
        |  CAST(n_distinct AS BIGINT) AS n_distinct,
        |  CAST((n_docs - n_distinct) * 10000 // n_docs AS BIGINT)
        |    AS dup_rate_bp,
        |  CAST(n_langs AS BIGINT) AS n_langs, tl.lang AS top_lang,
        |  p50 AS p50_chars, p90 AS p90_chars,
        |  CAST(tok_sum AS DOUBLE) / n_docs AS mean_tokens
        |FROM b JOIN tl ON tl.source = b.source
        |ORDER BY b.source""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val base = docs.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("tok_sum"),
        countDistinct(TextDedupPack.docFp).as("n_distinct"),
        countDistinct(col("lang")).as("n_langs"),
        percentile(col("n_chars"), lit(0.5)).as("p50_chars"),
        percentile(col("n_chars"), lit(0.9)).as("p90_chars"))
      val lc = docs.groupBy("source", "lang").agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("source").orderBy(col("c").desc, col("lang"))
      val top = lc.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("source"), col("lang").as("top_lang"))
      base.join(top, "source")
        .select(col("source"), col("n_docs"), col("tok_sum"),
          col("n_distinct"),
          expr("CAST((n_docs - n_distinct) * 10000 div n_docs AS BIGINT)")
            .as("dup_rate_bp"),
          col("n_langs"), col("top_lang"),
          col("p50_chars"), col("p90_chars"),
          (col("tok_sum").cast("double") / col("n_docs")).as("mean_tokens"))
        .orderBy("source")
    },

    // ---- q269: Flesch-Kincaid readability bands -----------------------------
    // The classic readability screen (Kincaid et al. 1975 — public formula:
    // 0.39·W/S + 11.8·Y/W − 15.59) used by web-corpus curation to route
    // documents into grade bands (e.g. educational-value weighting).
    // Words = the engine's standard space-token count; sentences = runs of
    // [.!?] (floored at 1); syllables = vowel-group runs [aeiouy]+ — the
    // documented heuristic estimator, not a dictionary.
    //
    // Determinism: the grade is computed ×100 as ONE floor division of
    // exact BIGINTs: fk_x100 = (39·W² + 1180·Y·S + 8441·S·W) div (S·W)
    // − 10000 (the +10000/−10000 shift keeps the numerator positive, so
    // Spark's truncating `div` and DuckDB's flooring `//` agree). No
    // doubles anywhere.
    //
    // 100 TB shape: three regexp counts per row riding the scan + one
    // band CASE — pure map-side, whole-stage-codegen, zero shuffles
    // before the (tiny) band rollup ... which this query skips: output is
    // per-doc so downstream passes can join it without re-deriving.
    QueryDef(
      "q269_readability",
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS words,
        |    CAST(GREATEST(1, len(regexp_extract_all(text, '[.!?]+'))) AS BIGINT) AS sentences,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS syllables
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, words, sentences, syllables,
        |    (39*words*words + 1180*syllables*sentences + 8441*sentences*words)
        |      // (sentences*words) - 10000 AS fk_x100
        |  FROM m)
        |SELECT doc_id, words, sentences, syllables,
        |  CAST(fk_x100 AS BIGINT) AS fk_x100,
        |  CASE WHEN fk_x100 < 500 THEN 'elementary'
        |       WHEN fk_x100 < 900 THEN 'middle'
        |       WHEN fk_x100 < 1300 THEN 'high'
        |       ELSE 'college' END AS band
        |FROM g
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val m = Tables.documents(s, d).select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("words"),
        greatest(lit(1L),
          size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0))).cast("long"))
          .as("sentences"),
        size(regexp_extract_all(lower(col("text")), lit("[aeiouy]+"), lit(0)))
          .cast("long").as("syllables"))
      val g = m.withColumn("fk_x100",
        expr("(39*words*words + 1180*syllables*sentences + 8441*sentences*words)" +
          " div (sentences*words) - 10000"))
      g.select(col("doc_id"), col("words"), col("sentences"), col("syllables"),
          col("fk_x100"),
          when(col("fk_x100") < 500, "elementary")
            .when(col("fk_x100") < 900, "middle")
            .when(col("fk_x100") < 1300, "high")
            .otherwise("college").as("band"))
        .orderBy("doc_id")
    },

    // ---- q275: preference-pair (DPO/RLHF) assembly --------------------------
    // The pair-construction pass over an n-samples-per-prompt generation
    // batch (Rafailov et al. 2023 consume exactly this shape): responses
    // arrive in groups of 4 per prompt (prompt_id = doc_id div 4 — the
    // generator's batch layout), a scalar reward ranks them, and the pass
    // emits (chosen, rejected) = (argmax, argmin) per prompt gated on a
    // minimum reward margin. Reward here = type-token ratio ×1000 (an
    // exact-integer quality proxy: distinct space-tokens over tokens —
    // floor division on non-negative ints). Pairs then face a per-source
    // quota: rank by margin within the chosen doc's source and mark the
    // top 25 kept — the q210/q232 discipline of COMPUTING the gate flag
    // instead of silently filtering, so the oracle checks both sides of
    // the cut.
    //
    // 100 TB shape: reward is map-side; argmax/argmin are ONE keyed
    // max_by/min_by agg on prompt_id (partial-agg friendly, no window over
    // the corpus); only the per-source quota uses a window, and that input
    // is already 1 row per prompt. Broadcast nothing, shuffle twice (both
    // on small keys).
    QueryDef(
      "q275_dpo_pairs",
      """WITH scored AS (
        |  SELECT doc_id, source, doc_id // 4 AS prompt_id,
        |    (1000 * len(list_distinct(string_split(lower(text), ' '))))
        |      // len(string_split(text, ' ')) AS reward
        |  FROM documents),
        |keyed AS (
        |  SELECT *, reward * 1000000 - doc_id AS ok FROM scored),
        |pairs AS (
        |  SELECT prompt_id,
        |    max_by(doc_id, ok) AS chosen_id,
        |    min_by(doc_id, ok) AS rejected_id,
        |    max_by(source, ok) AS source,
        |    MAX(reward) - MIN(reward) AS margin,
        |    COUNT(*) AS n_cands
        |  FROM keyed GROUP BY prompt_id),
        |gated AS (
        |  SELECT *, CASE WHEN margin >= 20 THEN 1 ELSE 0 END AS margin_ok
        |  FROM pairs),
        |ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY margin DESC, prompt_id) AS rk
        |  FROM gated WHERE margin_ok = 1)
        |SELECT prompt_id, chosen_id, rejected_id, source,
        |  CAST(margin AS BIGINT) AS margin,
        |  CAST(n_cands AS BIGINT) AS n_cands,
        |  CAST(margin_ok AS BIGINT) AS margin_ok,
        |  CAST(CASE WHEN rk <= 25 THEN 1 ELSE 0 END AS BIGINT) AS kept
        |FROM ranked
        |UNION ALL
        |SELECT prompt_id, chosen_id, rejected_id, source,
        |  CAST(margin AS BIGINT), CAST(n_cands AS BIGINT),
        |  CAST(0 AS BIGINT), CAST(0 AS BIGINT)
        |FROM gated WHERE margin_ok = 0
        |ORDER BY prompt_id""".stripMargin) { (s, d) =>
      val scored = Tables.documents(s, d).select(
        col("doc_id"), col("source"),
        expr("doc_id div 4").as("prompt_id"),
        expr("(1000 * size(array_distinct(split(lower(text), ' '))))" +
          " div size(split(text, ' '))").as("reward"))
      // argmax/argmin by the packed key reward·1e6 − doc_id: unique (doc_id
      // is), so reward ties go to the SMALLER doc_id on the max side and
      // the LARGER on the min side — identically in both engines.
      // PRECONDITION (ADVICE r16): the pack is order-correct only while the
      // within-group doc_id spread is < 1e6 — here prompt_id = doc_id div 4
      // bounds it at 3. If the grouping key ever changes to admit wider
      // groups, rank within the group by doc_id first and pack THAT rank
      // instead, or rewards differing by 1 invert against doc_id gaps >1e6.
      val keyed = scored.withColumn("ok",
        col("reward") * 1000000L - col("doc_id"))
      val pairs = keyed.groupBy("prompt_id").agg(
        max_by(col("doc_id"), col("ok")).as("chosen_id"),
        min_by(col("doc_id"), col("ok")).as("rejected_id"),
        max_by(col("source"), col("ok")).as("source"),
        (max(col("reward")) - min(col("reward"))).as("margin"),
        count(lit(1)).as("n_cands"))
      val gated = pairs.withColumn("margin_ok",
        when(col("margin") >= 20, 1L).otherwise(0L))
      val w = Window.partitionBy("source")
        .orderBy(col("margin").desc, col("prompt_id"))
      val kept = gated.filter(col("margin_ok") === 1L)
        .withColumn("kept",
          when(row_number().over(w) <= 25, 1L).otherwise(0L))
      val out = kept.unionByName(
        gated.filter(col("margin_ok") === 0L).withColumn("kept", lit(0L)))
      out.select(col("prompt_id"), col("chosen_id"), col("rejected_id"),
          col("source"), col("margin"), col("n_cands"), col("margin_ok"),
          col("kept"))
        .orderBy("prompt_id")
    }
  )
}
