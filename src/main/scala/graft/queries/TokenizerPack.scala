package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

// Shared text-dedup primitives live in TextDedupPack and are visible
// package-wide; the tokenizer family consumes them unqualified via this import.
import TextDedupPack._

/** Tokenizer training/encoding operators — the TokenizerPack family split
  * out of TextDedupPack along its family seam (r16, verdict item 7; zero
  * query renames): BPE merge-pair learning (q134, Sennrich et al. ACL'16),
  * corpus encoding with the learned merges (q135), tokenizer fertility per
  * language (q211), and Unicode NFC canonicalization (q126, native
  * expression).
  */
object TokenizerPack {

  /** q134's merge-round count (learned merge-table size). */
  private[queries] val BPE_ROUNDS = 3

  /** q134 SQL fragments, generated from one place so the Spark loop and
    * the unrolled oracle CTEs cannot drift. Symbol sequences live as
    * '||'-delimited strings ('||sym||sym||'): symbols never contain '|',
    * so the merge of pair (x, y) is replace('|x||y|' → '|xy|') — anchored
    * on the inner separator, it matches ONLY symbol-boundary-aligned
    * occurrences and scans left-to-right non-overlapping, which is
    * exactly greedy BPE application (verified cross-engine: Spark and
    * DuckDB `replace` agree on the [a,a,a,a] overlap case). */
  private[queries] object BpeSql {
    /** (freq, a: symbol array) from a '||'-string column `s`. */
    val symsFromS = "list_filter(string_split(s, '||'), x -> x <> '')"
    /** adjacent-pair keys 'x|y' from symbol array `a` (safe: no '|'
      * inside symbols). */
    val pairKeys = "list_transform(range(1, len(a)), i -> a[i] || '|' || a[i+1])"
    /** symbols in `s` = number of '||' separators − 1, pure length math. */
    val nSyms = "((length(s) - length(replace(s, '||', ''))) // 2 - 1)"
    def mergePattern(pkExpr: String) = s"'|' || replace($pkExpr, '|', '||') || '|'"
    def mergeRepl(pkExpr: String) = s"'|' || replace($pkExpr, '|', '') || '|'"

    /** The full learn-round CTE chain (tok, v0, then p/b/v/s per round,
      * vocab states carrying (t, freq, s)) — shared verbatim by the q134
      * and q135 oracles so the learned table cannot drift between the
      * learn report and the encode that applies it. */
    lazy val learnCtes: String = {
      val rounds = (0 until BPE_ROUNDS).map { r =>
        s"""p$r AS (SELECT pk, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
           |    SELECT freq, unnest($pairKeys) AS pk FROM (
           |      SELECT freq, $symsFromS AS a FROM v$r)) GROUP BY pk),
           |b$r AS (SELECT pk, cnt FROM p$r ORDER BY cnt DESC, pk LIMIT 1),
           |v${r + 1} AS (SELECT t, freq,
           |    replace(s, ${mergePattern(s"b$r.pk")},
           |      ${mergeRepl(s"b$r.pk")}) AS s
           |  FROM v$r, b$r),
           |s$r AS (SELECT CAST($r AS BIGINT) AS round, b$r.pk AS pair,
           |    b$r.cnt AS pair_count,
           |    CAST(SUM(freq * $nSyms) AS BIGINT) AS total_symbols_after
           |  FROM v${r + 1}, b$r GROUP BY b$r.pk, b$r.cnt)""".stripMargin
      }.mkString(",\n")
      s"""tok AS (
         |  SELECT t, COUNT(*) AS freq FROM (
         |    SELECT unnest(string_split(text, ' ')) AS t FROM documents)
         |  WHERE regexp_matches(t, '^[A-Za-z0-9]+$$') GROUP BY t),
         |v0 AS (SELECT t, freq,
         |  '||' || array_to_string(regexp_extract_all(t, '.'), '||') || '||' AS s
         |  FROM tok),
         |$rounds""".stripMargin
    }
  }

  /** Spark mirror of [[BpeSql.nSyms]]. */
  private[queries] val BpeNSymsExpr =
    expr("(length(s) - length(replace(s, '||', ''))) div 2 - 1")

  /** Run the BPE learn loop: returns the per-round vocab states
    * (index 0 = char-split init, index r+1 = after merge r; each carries
    * (t, freq, s)) and the learned merge table as driver-held
    * (pair, weighted-count) values — [[BPE_ROUNDS]] one-row lookups, the
    * Ivf-centroid pattern. Shared by q134 (reports the rounds) and q135
    * (applies the learned table to encode the corpus). */
  private[queries] def bpeLearn(s: org.apache.spark.sql.SparkSession, d: String)
      : (IndexedSeq[org.apache.spark.sql.DataFrame], Seq[(String, Long)]) = {
    val tok = Tables.documentsSpread(s, d)
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(col("t").rlike("^[A-Za-z0-9]+$"))
      .groupBy("t").agg(count(lit(1)).as("freq"))
    var vocab = tok.select(col("t"), col("freq"),
      concat(lit("||"),
        concat_ws("||", regexp_extract_all(col("t"), lit("."), lit(0))),
        lit("||")).as("s"))
    val states = IndexedSeq.newBuilder[org.apache.spark.sql.DataFrame]
    val merges = Seq.newBuilder[(String, Long)]
    states += vocab
    for (_ <- 0 until BPE_ROUNDS) {
      val a = filter(split(col("s"), "\\|\\|"), x => x =!= "")
      val pairKeys = when(size(a) > 1,
        transform(sequence(lit(1), size(a) - 1),
          i => concat(element_at(a, i), lit("|"), element_at(a, i + 1))))
        .otherwise(array().cast("array<string>"))
      val pairs = vocab.select(col("freq"), explode(pairKeys).as("pk"))
        .groupBy("pk").agg(sum(col("freq")).as("cnt"))
      val best = pairs.orderBy(col("cnt").desc, col("pk")).limit(1).collect()(0)
      val (pk, cnt) = (best.getString(0), best.getLong(1))
      val pat = "|" + pk.replace("|", "||") + "|"
      val rep = "|" + pk.replace("|", "") + "|"
      vocab = vocab.select(col("t"), col("freq"),
        expr(s"replace(s, '$pat', '$rep')").as("s"))
      states += vocab
      merges += (pk -> cnt)
    }
    (states.result(), merges.result())
  }

  def all: Seq[QueryDef] = Seq(
    // ---- q134: BPE merge-pair learning -------------------------------------
    // Completes q40's honest gap ("real BPE needs a learned merge table"):
    // learn the table. Classic shape: aggregate the corpus ONCE into the
    // Zipf-bounded (type, freq) vocabulary, then iterate on types — each
    // round counts adjacent symbol pairs weighted by freq (one keyed agg),
    // picks the most frequent pair (deterministic tiebreak), and applies
    // the merge greedily left-to-right via the anchored '|x||y|' replace
    // (see BpeSql — Spark and DuckDB replace() agree bit-for-bit,
    // including overlap cases). The learned merge list is the driver-held
    // model (BPE_ROUNDS 1-row lookups, like Ivf's centroids); per-round
    // work is O(|vocab| · avg_len) regardless of corpus size. The oracle
    // unrolls the identical rounds as CTEs, so pair choice, tie-breaks,
    // greedy application and the symbol-count ledger are all hash-checked.
    QueryDef(
      "q134_bpe_learn", {
        s"""WITH ${BpeSql.learnCtes}
           |SELECT round, pair, pair_count, total_symbols_after
           |FROM (${(0 until BPE_ROUNDS).map("SELECT * FROM s" + _).mkString(" UNION ALL ")})
           |ORDER BY round""".stripMargin
      }) { (s, d) =>
      val (vocabRounds, merges) = bpeLearn(s, d)
      val summaries = merges.zipWithIndex.map { case ((pk, cnt), r) =>
        vocabRounds(r + 1)
          .agg(sum(col("freq") * BpeNSymsExpr).as("tsa"))
          .select(lit(r.toLong).as("round"), lit(pk).as("pair"),
            lit(cnt).as("pair_count"), col("tsa").cast("long").as("total_symbols_after"))
      }
      summaries.reduce(_ unionAll _).orderBy("round")
    },

    // ---- q135: encode the corpus with the learned BPE merges ---------------
    // The apply side of q134: every alphanumeric token encodes through the
    // final vocab state (token → its post-merge symbol count), and the
    // per-language ledger reports chars vs subwords — the compression the
    // learned table buys. The encode join is token-stream ⋈ broadcast
    // vocab (the vocabulary is Zipf-bounded; its symbol strings are the
    // whole model). The oracle replays the SAME learn chain (BpeSql
    // .learnCtes, shared verbatim with q134) and then the same join, so
    // learn and apply cannot drift.
    QueryDef(
      "q135_bpe_encode", {
        s"""WITH ${BpeSql.learnCtes},
           |enc AS (SELECT t, ${BpeSql.nSyms} AS nsub FROM v$BPE_ROUNDS),
           |tokl AS (
           |  SELECT lang, unnest(string_split(text, ' ')) AS t FROM documents)
           |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           |  CAST(SUM(length(tokl.t)) AS BIGINT) AS n_chars,
           |  CAST(SUM(enc.nsub) AS BIGINT) AS n_subwords
           |FROM tokl JOIN enc ON enc.t = tokl.t
           |GROUP BY lang
           |ORDER BY lang""".stripMargin
      }) { (s, d) =>
      val (states, _) = bpeLearn(s, d)
      val enc = states(BPE_ROUNDS).select(col("t"), BpeNSymsExpr.as("nsub"))
      Tables.documentsSpread(s, d)
        .select(col("lang"), explode(split(col("text"), " ")).as("t"))
        // `enc` spans every alphanumeric word TYPE — a Heaps-law-unbounded
        // vocabulary at corpus scale — so no forced broadcast (AQE decides)
        .join(enc, "t")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_tokens"),
          sum(length(col("t")).cast("long")).as("n_chars"),
          sum(col("nsub").cast("long")).as("n_subwords"))
        .orderBy("lang")
    },

    // ---- q211: tokenizer fertility per language -----------------------------
    // The multilingual-tokenizer-bias audit run before committing a vocab:
    // fertility (subwords per word) and chars-per-subword differ sharply by
    // language under a shared BPE table, and high-fertility languages pay
    // more sequence length per unit text (Rust/ács-style fertility
    // studies). Re-uses q134's learned table verbatim (BpeSql.learnCtes in
    // the oracle, bpeLearn on the Spark side — learn and audit cannot
    // drift) and adds what q135's ledger lacks: the single-subword share
    // (words the vocab covers whole), worst-case fertility, and the two
    // ratios as DECIMAL(18,8)-rounded quotients of exact integer aggs.
    //
    // 100 TB shape: identical to q135 — token stream ⋈ vocab (Zipf-bounded
    // type table, AQE decides the strategy), then ONE map-side-combined
    // per-lang agg; ratios are per-group scalars computed after the
    // reduction. Nothing beyond q135's cost.
    QueryDef(
      "q211_tokenizer_fertility", {
        s"""WITH ${BpeSql.learnCtes},
           |enc AS (SELECT t, ${BpeSql.nSyms} AS nsub FROM v$BPE_ROUNDS),
           |tokl AS (
           |  SELECT lang, unnest(string_split(text, ' ')) AS t FROM documents),
           |j AS (SELECT lang, tokl.t AS t, enc.nsub AS nsub
           |      FROM tokl JOIN enc ON enc.t = tokl.t)
           |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_words,
           |  CAST(SUM(nsub) AS BIGINT) AS n_subwords,
           |  CAST(SUM(CASE WHEN nsub = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_single,
           |  CAST(MAX(nsub) AS BIGINT) AS max_fertility,
           |  CAST(CAST(CAST(SUM(nsub) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
           |    AS DECIMAL(18,8)) AS DOUBLE) AS fertility,
           |  CAST(CAST(CAST(SUM(length(t)) AS DOUBLE) / CAST(SUM(nsub) AS DOUBLE)
           |    AS DECIMAL(18,8)) AS DOUBLE) AS chars_per_subword
           |FROM j
           |GROUP BY lang
           |ORDER BY lang""".stripMargin
      }) { (s, d) =>
      val (states, _) = bpeLearn(s, d)
      val enc = states(BPE_ROUNDS).select(col("t"), BpeNSymsExpr.as("nsub"))
      Tables.documentsSpread(s, d)
        .select(col("lang"), explode(split(col("text"), " ")).as("t"))
        .join(enc, "t")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_words"),
          sum(col("nsub").cast("long")).as("n_subwords"),
          sum(when(col("nsub") === 1, 1L).otherwise(0L)).as("n_single"),
          max(col("nsub").cast("long")).as("max_fertility"),
          sum(length(col("t")).cast("long")).as("n_chars"))
        .select(col("lang"), col("n_words"), col("n_subwords"),
          col("n_single"), col("max_fertility"),
          (col("n_subwords").cast("double") / col("n_words").cast("double"))
            .cast(DecimalType(18, 8)).cast("double").as("fertility"),
          (col("n_chars").cast("double") / col("n_subwords").cast("double"))
            .cast(DecimalType(18, 8)).cast("double").as("chars_per_subword"))
        .orderBy("lang")
    },


    // ---- q126: Unicode NFC canonicalization (native expression) ------------
    // Hash-keyed text operators silently under-deduplicate on corpora that
    // mix precomposed and decomposed Unicode — "é" (U+00E9) and "é"
    // (U+0065 U+0301) are different bytes to md5/xxhash64. This query runs
    // the codegen'd [[graft.functions.TextExprs.nfc]] expression (Spark has
    // no NFC builtin; pure-ASCII rows take an allocation-free identity
    // path) over the corpus with planted decomposed sequences appended,
    // and reports per-doc character counts before/after composition plus
    // the normalized tail — DuckDB's `nfc_normalize` implements the same
    // canonical composition, so the result is hash-checked cross-engine.
    QueryDef(
      "q126_nfc_normalize",
      // chr(101)||chr(769) = e + COMBINING ACUTE, chr(776) = COMBINING
      // DIAERESIS — NFC composes both pairs, shrinking the text by 2 chars
      """WITH raws AS (
        |  SELECT doc_id,
        |    text || ' caf' || chr(101) || chr(769) || ' u' || chr(776) || 'ber' AS raw
        |  FROM documents),
        |n AS (SELECT doc_id, raw, nfc_normalize(raw) AS nfc FROM raws)
        |SELECT doc_id,
        |  CAST(length(raw) AS BIGINT) AS len_raw,
        |  CAST(length(nfc) AS BIGINT) AS len_nfc,
        |  substring(nfc, length(nfc) - 9, 10) AS norm_tail
        |FROM n
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      // decomposed on purpose (explicit escapes so no editor can silently
      // NFC-compose the source): e+U+0301, u+U+0308 -> NFC composes both,
      // so len_nfc = len_raw - 2 on every row
      val raw = concat(col("text"), lit(" caf" + "e\u0301" + " u\u0308" + "ber"))
      Tables.documents(s, d)
        .select(col("doc_id"), raw.as("raw"))
        .select(col("doc_id"), col("raw"),
          graft.functions.TextExprs.nfc(col("raw")).as("nfc"))
        .select(col("doc_id"),
          length(col("raw")).cast("long").as("len_raw"),
          length(col("nfc")).cast("long").as("len_nfc"),
          substring(col("nfc"), -10, 10).as("norm_tail"))
        .orderBy("doc_id")
    },

    // ---- q264: language-ID confidence margin (top-2 profile gap) -----------
    // q26 predicts a language; a ROUTING decision (which tokenizer, which
    // quality model, which per-language quota) additionally needs to know
    // HOW SURE the profile is — the standard margin heuristic: the gap
    // between the best and second-best stopword-profile scores. A doc
    // with margin 0 matched two profiles equally (mixed/quoted text); a
    // doc with best = 0 matched nothing ('und'). The gate emitted here
    // (margin >= 2 AND best > 0) is the route/hold-for-review split.
    // Second-best is computed by sorting the 4-score array — identical
    // integer sort in both engines, no branchy max-of-rest arithmetic.
    //
    // 100 TB shape: pure map-side token-set scoring riding the scan
    // (the q26 plan with two more array ops); no shuffle at all before
    // the final per-doc projection.
    QueryDef(
      "q264_lang_margin", {
        def cnt(words: Seq[String]) =
          s"len(list_filter(string_split(text, ' '), x -> x IN (${words.map("'" + _ + "'").mkString(",")})))"
        s"""WITH scores AS (
           |  SELECT doc_id,
           |    ${cnt(STOP_EN)} AS s_en, ${cnt(STOP_FR)} AS s_fr,
           |    ${cnt(STOP_DE)} AS s_de, ${cnt(STOP_ES)} AS s_es
           |  FROM documents),
           |srt AS (
           |  SELECT doc_id, s_en, s_fr, s_de, s_es,
           |    list_sort([s_en, s_fr, s_de, s_es]) AS srtd
           |  FROM scores)
           |SELECT doc_id,
           |  CASE WHEN s_en = 0 AND s_fr = 0 AND s_de = 0 AND s_es = 0 THEN 'und'
           |       WHEN s_en >= greatest(s_fr, s_de, s_es) THEN 'en'
           |       WHEN s_fr >= greatest(s_de, s_es) THEN 'fr'
           |       WHEN s_de >= s_es THEN 'de'
           |       ELSE 'es' END AS pred_lang,
           |  CAST(srtd[4] AS BIGINT) AS best_hits,
           |  CAST(srtd[3] AS BIGINT) AS second_hits,
           |  CAST(srtd[4] - srtd[3] AS BIGINT) AS margin,
           |  CAST(CASE WHEN srtd[4] - srtd[3] >= 2 AND srtd[4] > 0
           |    THEN 1 ELSE 0 END AS BIGINT) AS confident
           |FROM srt
           |ORDER BY doc_id""".stripMargin
      }) { (s, d) =>
      val toks = split(col("text"), " ")
      def cnt(words: Seq[String]) =
        size(filter(toks, x => x.isin(words: _*))).cast("long")
      Tables.documents(s, d)
        .select(col("doc_id"),
          cnt(STOP_EN).as("s_en"), cnt(STOP_FR).as("s_fr"),
          cnt(STOP_DE).as("s_de"), cnt(STOP_ES).as("s_es"))
        .withColumn("srtd",
          array_sort(array(col("s_en"), col("s_fr"), col("s_de"), col("s_es"))))
        .select(col("doc_id"),
          when(col("s_en") === 0 && col("s_fr") === 0 &&
            col("s_de") === 0 && col("s_es") === 0, "und")
            .when(col("s_en") >= greatest(col("s_fr"), col("s_de"), col("s_es")), "en")
            .when(col("s_fr") >= greatest(col("s_de"), col("s_es")), "fr")
            .when(col("s_de") >= col("s_es"), "de")
            .otherwise("es").as("pred_lang"),
          element_at(col("srtd"), 4).as("best_hits"),
          element_at(col("srtd"), 3).as("second_hits"),
          (element_at(col("srtd"), 4) - element_at(col("srtd"), 3)).as("margin"),
          when(element_at(col("srtd"), 4) - element_at(col("srtd"), 3) >= 2L
            && element_at(col("srtd"), 4) > 0L, 1L).otherwise(0L)
            .as("confident"))
        .orderBy("doc_id")
    },

    // ---- q274: WordPiece greedy longest-match-first encode ------------------
    // The second tokenizer family next to BPE (q134/q135): WordPiece (Wu
    // et al. 2016, the BERT tokenizer) encodes each word by repeatedly
    // taking the LONGEST vocab piece matching at the cursor, emitting
    // "##"-marked continuations, and collapsing the whole word to [UNK]
    // if any position has no match (or the word exceeds the length cap —
    // 15 here, BERT ships 100). Vocab here is derived from the corpus:
    // the 26 letters plus the top-120 bigrams and top-60 trigrams by
    // occurrence-weighted frequency (ties by gram) — then COLLECTED and
    // inlined as literal arrays, because a learned tokenizer vocab is a
    // bounded artifact you ship to every executor, not a join side: the
    // encode loop is 15 rounds of pure codegen'd expressions (3
    // array_contains probes per round), zero joins, zero shuffles on the
    // hot path. One simplification vs BERT, documented: a single shared
    // vocab for initial and continuation pieces (the ## mark is
    // presentation). The oracle re-derives the vocab and replays the
    // greedy cursor as a recursive CTE, so every piece boundary is
    // hash-checked.
    //
    // 100 TB shape: the encode is per-row bounded work riding the scan;
    // the vocab derivation is two keyed gram counts (partial-agg
    // friendly) + a top-K cut. Words table capped at the top 300 by
    // frequency (the working set a fertility audit reads).
    QueryDef(
      "q274_wordpiece_encode",
      """WITH w0 AS (
        |  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
        |  FROM documents),
        |wc AS (SELECT word, COUNT(*) AS cnt FROM w0 GROUP BY word),
        |g2 AS (
        |  SELECT g, SUM(cnt) AS w FROM (
        |    SELECT cnt, unnest(list_transform(range(1, length(word)),
        |      i -> substring(word, CAST(i AS INT), 2))) AS g
        |    FROM wc WHERE length(word) >= 2)
        |  GROUP BY g),
        |v2 AS (SELECT g FROM g2
        |       QUALIFY ROW_NUMBER() OVER (ORDER BY w DESC, g) <= 120),
        |g3 AS (
        |  SELECT g, SUM(cnt) AS w FROM (
        |    SELECT cnt, unnest(list_transform(range(1, length(word) - 1),
        |      i -> substring(word, CAST(i AS INT), 3))) AS g
        |    FROM wc WHERE length(word) >= 3)
        |  GROUP BY g),
        |v3 AS (SELECT g FROM g3
        |       QUALIFY ROW_NUMBER() OVER (ORDER BY w DESC, g) <= 60),
        |ws AS (SELECT word, cnt FROM wc
        |       QUALIFY ROW_NUMBER() OVER (ORDER BY cnt DESC, word) <= 300),
        |enc AS (
        |  WITH RECURSIVE st(word, cnt, pos, np, pieces, unk) AS (
        |    SELECT word, cnt, 1, 0, '', length(word) > 15 FROM ws
        |    UNION ALL
        |    SELECT e.word, e.cnt,
        |      e.pos + CASE WHEN m3.g IS NOT NULL THEN 3
        |                   WHEN m2.g IS NOT NULL THEN 2
        |                   WHEN ascii(substring(e.word, CAST(e.pos AS INT), 1))
        |                     BETWEEN 97 AND 122 THEN 1 ELSE 0 END,
        |      e.np + 1,
        |      e.pieces ||
        |        CASE WHEN e.pieces = '' THEN '' ELSE ' ' END ||
        |        CASE WHEN e.pos > 1 THEN '##' ELSE '' END ||
        |        CASE WHEN m3.g IS NOT NULL
        |               THEN substring(e.word, CAST(e.pos AS INT), 3)
        |             WHEN m2.g IS NOT NULL
        |               THEN substring(e.word, CAST(e.pos AS INT), 2)
        |             WHEN ascii(substring(e.word, CAST(e.pos AS INT), 1))
        |               BETWEEN 97 AND 122
        |               THEN substring(e.word, CAST(e.pos AS INT), 1)
        |             ELSE '' END,
        |      NOT (m3.g IS NOT NULL OR m2.g IS NOT NULL OR
        |        ascii(substring(e.word, CAST(e.pos AS INT), 1))
        |          BETWEEN 97 AND 122)
        |    FROM st e
        |    LEFT JOIN v3 m3 ON m3.g = substring(e.word, CAST(e.pos AS INT), 3)
        |    LEFT JOIN v2 m2 ON m2.g = substring(e.word, CAST(e.pos AS INT), 2)
        |    WHERE e.pos <= length(e.word) AND NOT e.unk)
        |  SELECT * FROM st),
        |fin AS (
        |  SELECT word, cnt, pos, np, pieces, unk,
        |    ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos DESC, np DESC) AS rk
        |  FROM enc)
        |SELECT word, CAST(cnt AS BIGINT) AS cnt,
        |  CAST(CASE WHEN unk THEN 1 ELSE 0 END AS BIGINT) AS is_unk,
        |  CAST(CASE WHEN unk THEN -1 ELSE np END AS BIGINT) AS n_pieces,
        |  CASE WHEN unk THEN NULL ELSE pieces END AS pieces
        |FROM fin WHERE rk = 1
        |ORDER BY word""".stripMargin) { (s, d) =>
      val words0 = Tables.documents(s, d)
        .select(explode(regexp_extract_all(lower(col("text")),
          lit("[a-z]+"), lit(0))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("cnt"))
        .persist()
      def topGrams(glen: Int, k: Int): Seq[String] = {
        val exploded = words0.filter(length(col("word")) >= glen)
          .select(col("cnt"), explode(expr(
            s"transform(sequence(1, length(word) - ${glen - 1})," +
              s" i -> substring(word, i, $glen))")).as("g"))
          .groupBy("g").agg(sum(col("cnt")).as("w"))
        // total order (w desc, g) then limit → TakeOrderedAndProject, a
        // per-partition top-k + driver merge; no single-partition window
        // (r16 verdict item 8)
        exploded.orderBy(col("w").desc, col("g")).limit(k)
          .select("g").collect().map(_.getString(0)).toSeq
      }
      // the learned artifact: bounded by the literal top-K cuts. words0
      // feeds the two eager collects below plus the returned lazy plan;
      // unpersist as soon as the collects are done (ADVICE r16 — a cached
      // table must not outlive the query in a long-lived session JVM).
      // The final action recomputes words0 once — one scan + keyed agg.
      val (v2, v3) =
        try (topGrams(2, 120), topGrams(3, 60))
        finally words0.unpersist(blocking = false)
      // same TakeOrdered shape for the top-300 vocab cut (total order:
      // cnt desc, then word)
      val ws = words0.orderBy(col("cnt").desc, col("word")).limit(300)
        .select(col("word"), col("cnt"),
          lit(1).as("pos"), lit(0L).as("np"), lit("").as("pieces"),
          (length(col("word")) > 15).as("unk"))
      val a2 = typedlit(v2)
      val a3 = typedlit(v3)
      val encoded = (1 to 15).foldLeft(ws) { (df, _) =>
        df.withColumn("active", !col("unk") && col("pos") <= length(col("word")))
          .withColumn("c3", col("word").substr(col("pos"), lit(3)))
          .withColumn("c2", col("word").substr(col("pos"), lit(2)))
          .withColumn("c1", col("word").substr(col("pos"), lit(1)))
          .withColumn("m3", array_contains(a3, col("c3")))
          .withColumn("m2", array_contains(a2, col("c2")))
          .withColumn("m1", ascii(col("c1")).between(97, 122))
          .withColumn("adv", when(!col("active"), 0)
            .when(col("m3"), 3).when(col("m2"), 2).when(col("m1"), 1)
            .otherwise(0))
          .withColumn("piece", when(col("m3"), col("c3"))
            .when(col("m2"), col("c2")).otherwise(col("c1")))
          .withColumn("pieces", when(!col("active") || col("adv") === 0,
            col("pieces")).otherwise(concat(col("pieces"),
              when(col("pieces") === "", "").otherwise(" "),
              when(col("pos") > 1, "##").otherwise(""), col("piece"))))
          .withColumn("np", col("np") +
            when(col("active") && col("adv") > 0, 1L).otherwise(0L))
          .withColumn("unk", col("unk") ||
            (col("active") && col("adv") === 0))
          .withColumn("pos", col("pos") + when(col("active"), col("adv"))
            .otherwise(lit(0)))
          .drop("active", "c3", "c2", "c1", "m3", "m2", "m1", "adv", "piece")
      }
      encoded.select(col("word"), col("cnt"),
          when(col("unk"), 1L).otherwise(0L).as("is_unk"),
          when(col("unk"), -1L).otherwise(col("np")).as("n_pieces"),
          when(col("unk"), lit(null).cast("string"))
            .otherwise(col("pieces")).as("pieces"))
        .orderBy("word")
    },

  )
}
