package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Dedup
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Text-analysis + deduplication pack over the `documents` table — the
  * training-data-pipeline operator family (exact dedup, fingerprinting,
  * token/quality stats, language-ID heuristic, n-gram Jaccard near-dup,
  * MinHash-LSH, SimHash).
  *
  * Oracle-checked variants use only cross-engine-identical primitives
  * (md5, substring/instr on its hex output, integer arithmetic, IEEE double
  * division), so DuckDB replays them bit-for-bit. The xxhash64-based
  * native variants in [[graft.operators.Dedup]] are the 100 TB scale path
  * and are driver-checked rows-only.
  */
object TextDedupPack {

  private[queries] val STOP_EN = Seq("the", "a", "of", "and", "is")
  private[queries] val STOP_FR = Seq("le", "la", "et", "un", "une")
  private[queries] val STOP_DE = Seq("der", "die", "und", "ein", "ist")
  private[queries] val STOP_ES = Seq("el", "los", "y", "una", "es")

  /** Document-frequency cap for near-dup shingles: a gram shared by more
    * than this many documents is stopword-class (no near-dup signal) and is
    * dropped *before* any pair join — the self-join fan-out per gram is then
    * bounded at cap², so join size is O(#grams · cap²) instead of
    * Σ df(gram)², which is quadratic in duplicated content and detonates at
    * 100 TB. Jaccard is computed over the capped shingle space on BOTH
    * engines (q27/q28 oracles apply the identical filter). At the test SFs
    * max df is 25, so the capped results coincide with the uncapped ones.
    */
  private val MAX_GRAM_DF = 100

  /** LSH band-bucket occupancy cap for q28 — mirrors Dedup.lshCandidates:
    * a band value shared by more than this many docs would pair-explode. */
  private val MAX_BUCKET = 100

  /** doc_id offset distinguishing q65's planted simhash twins. */
  private val SIMHASH_TWIN_OFFSET = 1000000L

  /** doc_id offset distinguishing q88/q89's planted exact-copy twins. */
  private val NATIVE_TWIN_OFFSET = 1000000L

  /** Token width of q86's sub-document units. The fixture corpus is flat
    * word streams (no newlines), so fixed 16-token segments stand in for
    * the paragraph/line splitter a web corpus would use — the dedup
    * machinery downstream of the split is identical. */
  private val SEG_TOKENS = 16

  /** q99's bigram count floor: a collocation needs this much support
    * before its PMI is meaningful (and the floor caps the scored table). */
  private val PMI_MIN_COUNT = 5

  /** q125's Count-Min grid: depth (independent hash rows) and width
    * (counters per row). ε = e/width ≈ 0.5% of the token stream, failure
    * probability e^-depth ≈ 2%. 4×512 longs = 16 KiB of mergeable state
    * regardless of vocabulary size. */
  private val CM_DEPTH = 4
  private val CM_WIDTH = 512

  /** q125's fixed probe set: high- and mid-frequency tokens from the
    * fixture vocabulary, plus a token absent from the corpus (its estimate
    * is pure collision mass — the sketch's documented overestimate, never
    * an undercount). */
  private val CM_PROBES = Seq("join", "scan", "row", "data", "the",
    "order", "vector", "zzz_absent_token")

  /** Count-Min cell assignment for every row of `df`: (tc, r, c) for each
    * of the [[CM_DEPTH]] hash rows, c = md5('r:'||token) low-32 mod
    * [[CM_WIDTH]] — the portable md5 idiom (cf. q28). Shared by the q125
    * batch grid and q130's per-micro-batch grids. */
  private def cmCells(df: org.apache.spark.sql.DataFrame, tc: String) = df.select(
    col(tc),
    explode(array((0 until CM_DEPTH).map { r =>
      struct(lit(r).as("r"),
        (conv(substring(md5(concat(lit(s"$r:"), col(tc))), 1, 8), 16, 10)
          .cast("long") % CM_WIDTH).as("c"))
    }: _*)).as("rc"))
    .select(col(tc), col("rc.r").as("r"), col("rc.c").as("c"))

  /** The probe/estimate/exact-verify tail over a finished counter grid
    * (r, c, cnt): estimate = min over hash rows of the probed cells,
    * joined with the exact corpus counts of the same probes. Shared by
    * q125 and q130 — their counter grids differ only in HOW they were
    * accumulated (one pass vs per-micro-batch merge). */
  private def cmAnswer(s: org.apache.spark.sql.SparkSession,
                       counters: org.apache.spark.sql.DataFrame,
                       toks: org.apache.spark.sql.DataFrame) = {
    import s.implicits._
    val probes = CM_PROBES.toDF("token")
    val est = cmCells(probes, "token")
      .join(broadcast(counters), Seq("r", "c"), "left")
      .groupBy("token")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cm_est"))
    val exact = toks.filter(col("t").isin(CM_PROBES: _*))
      .groupBy(col("t").as("token")).agg(count(lit(1)).as("exact_count"))
    probes
      .join(est, "token")
      .join(exact, Seq("token"), "left")
      .select(col("token"),
        coalesce(col("exact_count"), lit(0L)).as("exact_count"),
        col("cm_est"),
        (col("cm_est") - coalesce(col("exact_count"), lit(0L))).as("over_err"))
      .orderBy("token")
  }

  /** q134's merge-round count (learned merge-table size). */
  private val BPE_ROUNDS = 3

  /** q144's synchronous label-propagation round count. */
  private val LPA_ROUNDS = 3

  /** q238's fixed peel-round count (the q109 fixed-point discipline: both
    * engines unroll EXACTLY this many rounds — the result is the round-4
    * peel state, converged or not, so the replay is structural). */
  private val KCORE_ROUNDS = 4

  /** q144/q241 shared oracle: LPA_ROUNDS unrolled majority-vote label
    * rounds over the symmetric Jaccard match graph — q241's streaming
    * answer must hash-match the identical batch formulation. */
  private lazy val LPA_MATCH_ORACLE: String = {
    val rounds = (1 to LPA_ROUNDS).map { r =>
      s"""l$r AS (SELECT v AS id, lab FROM (
         |    SELECT e.v, l.lab, COUNT(*) AS c,
         |      ROW_NUMBER() OVER (PARTITION BY e.v
         |        ORDER BY COUNT(*) DESC, l.lab) AS rn
         |    FROM ed e JOIN l${r - 1} l ON l.id = e.u
         |    GROUP BY e.v, l.lab) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH $PAIRS_SQL,
       |ed AS (SELECT doc_a AS u, doc_b AS v FROM jpairs
       |       UNION ALL SELECT doc_b, doc_a FROM jpairs),
       |l0 AS (SELECT DISTINCT u AS id, u AS lab FROM ed),
       |$rounds
       |SELECT lab AS community, CAST(COUNT(*) AS BIGINT) AS n_members,
       |  MIN(id) AS min_member
       |FROM l$LPA_ROUNDS
       |GROUP BY lab
       |ORDER BY community""".stripMargin
  }

  /** q144/q241 shared LPA core over a checkpointed symmetric edge list
    * `ed(u, v)`: LPA_ROUNDS majority-vote rounds (ties to the smallest
    * label) from singleton labels, run inside a conf-isolated
    * Components.narrowClone at the measured width (one reused narrow
    * repartition over the edge list; the vote count's partial agg runs
    * map-side inside the join stage, the label-choice groupBy plans its
    * own narrow partial-combined exchange; the caller session's conf is
    * never touched). Returns the node-sized (id, lab) table checkpointed
    * and rebound to the caller's session. */
  private def lpaLabels(s: org.apache.spark.sql.SparkSession,
                        ed: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val nEdges = ed.count()
    val w = graft.operators.Components.roundWidth(
      s.conf.get("spark.sql.shuffle.partitions").toInt, nEdges)
    val s2 = graft.operators.Components.narrowClone(s, w)
    val edP = graft.operators.Components.rebind(ed, s2)
      .repartition(col("u"))
    var l = edP.select(col("u").as("id")).distinct()
      .select(col("id"), col("id").as("lab"))
    for (_ <- 1 to LPA_ROUNDS) {
      l = edP.join(l, col("u") === col("id"))
        .select(col("v"), col("lab"))
        .groupBy(col("v"), col("lab")).agg(count(lit(1)).as("c"))
        .groupBy(col("v"))
        .agg(max_by(col("lab"), struct(col("c"), lit(0L) - col("lab"))).as("lab"))
        .select(col("v").as("id"), col("lab"))
    }
    graft.operators.Components.rebind(l.localCheckpoint(), s)
  }

  /** q145's personalized-PageRank iteration count. */
  private val PPR_ITERS = 4

  /** q147's BFS hop budget (contamination blast radius). */
  private val SPREAD_HOPS = 3

  /** q195: walks per start node and steps per walk. */
  private val WALKS_PER_NODE = 2
  private val WALK_STEPS = 4

  /** q198 skip-gram context radius: pairs are (node_t, node_{t±j}) for
    * j ≤ SKIP_WINDOW within one walk — word2vec's window parameter. */
  private val SKIP_WINDOW = 2

  /** q134 SQL fragments, generated from one place so the Spark loop and
    * the unrolled oracle CTEs cannot drift. Symbol sequences live as
    * '||'-delimited strings ('||sym||sym||'): symbols never contain '|',
    * so the merge of pair (x, y) is replace('|x||y|' → '|xy|') — anchored
    * on the inner separator, it matches ONLY symbol-boundary-aligned
    * occurrences and scans left-to-right non-overlapping, which is
    * exactly greedy BPE application (verified cross-engine: Spark and
    * DuckDB `replace` agree on the [a,a,a,a] overlap case). */
  private object BpeSql {
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
  private val BpeNSymsExpr =
    expr("(length(s) - length(replace(s, '||', ''))) div 2 - 1")

  /** Run the BPE learn loop: returns the per-round vocab states
    * (index 0 = char-split init, index r+1 = after merge r; each carries
    * (t, freq, s)) and the learned merge table as driver-held
    * (pair, weighted-count) values — [[BPE_ROUNDS]] one-row lookups, the
    * Ivf-centroid pattern. Shared by q134 (reports the rounds) and q135
    * (applies the learned table to encode the corpus). */
  private def bpeLearn(s: org.apache.spark.sql.SparkSession, d: String)
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

  /** The q125 oracle — and, verbatim, the q130 oracle: Count-Min grids
    * merge by cell-wise addition, so the per-micro-batch accumulation is
    * algebraically the one-pass grid and both paths must hash-match the
    * same SQL (the q105/q116 shared-oracle trick, applied to sketches). */
  private lazy val CM_ORACLE: String = {
    def cellSql(src: String, out: String): String =
      (0 until CM_DEPTH).map(r =>
        s"SELECT $out, $r AS r, ('0x' || substring(md5('$r:' || $out), 1, 8))::BIGINT % $CM_WIDTH AS c FROM $src")
        .mkString("\n  UNION ALL\n  ")
    s"""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS t FROM documents),
       |probes AS (SELECT unnest([${CM_PROBES.map("'" + _ + "'").mkString(",")}]) AS token),
       |cells AS (
       |  ${cellSql("tok", "t")}),
       |counters AS (
       |  SELECT r, c, CAST(COUNT(*) AS BIGINT) AS cnt FROM cells GROUP BY r, c),
       |pcells AS (
       |  ${cellSql("probes", "token")}),
       |est AS (
       |  SELECT token, MIN(COALESCE(cnt, 0)) AS cm_est
       |  FROM pcells LEFT JOIN counters USING (r, c)
       |  GROUP BY token),
       |exact AS (
       |  SELECT t AS token, CAST(COUNT(*) AS BIGINT) AS exact_count
       |  FROM tok GROUP BY t)
       |SELECT p.token, COALESCE(e.exact_count, 0) AS exact_count,
       |  est.cm_est, est.cm_est - COALESCE(e.exact_count, 0) AS over_err
       |FROM probes p
       |JOIN est ON est.token = p.token
       |LEFT JOIN exact e ON e.token = p.token
       |ORDER BY p.token""".stripMargin
  }

  /** q100's winnowing window (consecutive 3-gram hashes per window). The
    * guarantee: any shared run of ≥ WINNOW_W + 2 tokens between two docs
    * shares at least one selected fingerprint. */
  private val WINNOW_W = 4

  /** Shared winnowing CTEs (DuckDB dialect, cf. q100's scaladoc): `toks`
    * (docs with ≥3 tokens), `g` (60-bit 3-gram hash array), `sel` (sorted
    * distinct selected positions `sp` per winnowing window). Shared by
    * q100 (fingerprint emission) and q103 (fingerprint matching) so the
    * selection rule cannot drift between the two. */
  private lazy val WinnowSqlCtes: String = {
    val W = WINNOW_W
    s"""toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
       |  WHERE len(string_split(text, ' ')) >= 3),
       |g AS (
       |  SELECT doc_id, list_transform(range(1, len(t) - 1), i ->
       |    ('0x' || substring(md5(t[CAST(i AS INT)] || ' ' || t[CAST(i+1 AS INT)] || ' ' ||
       |      t[CAST(i+2 AS INT)]), 1, 15))::BIGINT) AS h
       |  FROM toks),
       |sel AS (
       |  SELECT doc_id, h,
       |    list_sort(list_distinct(list_transform(
       |      range(1, greatest(len(h) - $W + 1, 1) + 1), i ->
       |        i + len(h[CAST(i AS INT):CAST(i + $W - 1 AS INT)])
       |          - list_position(list_reverse(h[CAST(i AS INT):CAST(i + $W - 1 AS INT)]),
       |                          list_min(h[CAST(i AS INT):CAST(i + $W - 1 AS INT)]))))) AS sp
       |  FROM g)""".stripMargin
  }

  /** Spark side of [[WinnowSqlCtes]]: (doc_id, __g gram-hash array, __sp
    * sorted distinct selected positions). Pure per-row array math. */
  private def winnowSelected(s: org.apache.spark.sql.SparkSession, d: String) = {
    val W = WINNOW_W
    val t = col("__t")
    val g = col("__g")
    val grams = Tables.documentsSpread(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("__t"))
      .filter(size(t) >= 3)
      .select(col("doc_id"),
        transform(sequence(lit(1), size(t) - 2), i =>
          conv(substring(md5(concat_ws(" ",
            element_at(t, i), element_at(t, i + 1), element_at(t, i + 2))), 1, 15),
            16, 10).cast("long")).as("__g"))
    val selPos = array_sort(array_distinct(transform(
      sequence(lit(1), greatest(size(g) - (W - 1), lit(1))), { i =>
        val sl = slice(g, i, lit(W))
        i + size(sl) - array_position(reverse(sl), array_min(sl)).cast("int")
      })))
    grams.select(col("doc_id"), g, selPos.as("__sp"))
  }

  /** q103's fingerprint-df cap (boilerplate guard, cf. MAX_GRAM_DF) and
    * minimum shared-fingerprint support for a match pair. */
  private val FP_MAX_DF = 100
  private val FP_MIN_SHARED = 2

  /** Shared winnowing-match CTE chain (DuckDB dialect): [[WinnowSqlCtes]]
    * extended with `fp` (distinct selected fingerprints), `capped` (df ≤
    * [[FP_MAX_DF]]) and `mpairs` (doc pairs sharing ≥ [[FP_MIN_SHARED]]
    * fingerprints). Shared by q103 (emits the pairs) and q109 (runs
    * PageRank over them) so the match graph cannot drift between the two.
    */
  private lazy val WinnowPairsSqlCtes: String =
    s"""$WinnowSqlCtes,
       |fp AS (
       |  SELECT DISTINCT doc_id, unnest(list_transform(sp, p ->
       |    h[CAST(p AS INT)])) AS fph
       |  FROM sel),
       |capped AS (SELECT doc_id, fph FROM (
       |    SELECT doc_id, fph, COUNT(*) OVER (PARTITION BY fph) AS df FROM fp)
       |  WHERE df <= $FP_MAX_DF),
       |mpairs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |    CAST(COUNT(*) AS BIGINT) AS n_shared
       |  FROM capped a JOIN capped b ON b.fph = a.fph AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id
       |  HAVING COUNT(*) >= $FP_MIN_SHARED)""".stripMargin

  /** Spark side of [[WinnowPairsSqlCtes]]: (id_a, id_b, n_shared) winnowing
    * match pairs, id_a < id_b. Both sides of the self-join scan the same
    * persisted capped fingerprint set. */
  private def winnowMatchPairs(s: org.apache.spark.sql.SparkSession, d: String) = {
    val fp = winnowSelected(s, d)
      .select(col("doc_id"),
        explode(array_distinct(transform(col("__sp"), p =>
          element_at(col("__g"), p.cast("int"))))).as("fph"))
    val capped = graft.operators.Occupancy.cap(fp, Seq("fph"), FP_MAX_DF,
      persistResult = true)
    capped.select(col("doc_id").as("id_a"), col("fph"))
      .join(capped.select(col("doc_id").as("id_b"), col("fph")), "fph")
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= FP_MIN_SHARED)
  }

  /** q104's fixed retrieval query (BM25). Deterministic constant — tokens
    * absent from the corpus simply contribute no term (tf = 0). */
  private val BM25_QUERY = Seq("the", "of", "la", "der", "el")

  /** DuckDB CTE chain ending in `scored(doc_id, bm25)` — q104's scoring,
    * shared verbatim with the hybrid-retrieval fusion (q182/q183 in
    * VectorPack) so the two oracles cannot drift on a constant. Already
    * stripMargin'd: interpolate only at line ends (see the `||` gotcha in
    * the verify skill). */
  private[queries] lazy val Bm25SqlCtes: String = {
    val qlist = BM25_QUERY.map(q =>
      s"{tok: '$q', tf: len(list_filter(t, x -> x = '$q'))}").mkString(", ")
    s"""base AS (
       |  SELECT doc_id, len(string_split(text, ' ')) AS dl,
       |    string_split(text, ' ') AS t
       |  FROM documents),
       |n AS (
       |  SELECT COUNT(*) AS nd,
       |    CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
       |  FROM base),
       |tf AS (
       |  SELECT doc_id, dl, u.tok AS tok, u.tf AS tf FROM (
       |    SELECT doc_id, dl, unnest([$qlist]) AS u FROM base)),
       |dfc AS (
       |  SELECT tok, CAST(SUM(CASE WHEN tf > 0 THEN 1 ELSE 0 END) AS BIGINT) AS dfc
       |  FROM tf GROUP BY tok),
       |terms AS (
       |  SELECT doc_id,
       |    CAST(ln(1 + (nd - dfc + 0.5) / (dfc + 0.5))
       |      * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
       |      AS DECIMAL(38,20)) AS term
       |  FROM tf JOIN dfc USING (tok) CROSS JOIN n
       |  WHERE tf > 0),
       |scored AS (
       |  SELECT doc_id,
       |    CAST(CAST(CAST(SUM(term) AS DOUBLE) AS DECIMAL(18,8)) AS DOUBLE) AS bm25
       |  FROM terms GROUP BY doc_id)""".stripMargin
  }

  /** Spark side of [[Bm25SqlCtes]]: (doc_id, bm25) for every document
    * containing ≥1 query token. Per-doc term frequencies are map-side
    * array filters (no token explode); document frequencies one tiny
    * partial-agg'd shuffle broadcast back. */
  private[queries] def bm25Scores(s: org.apache.spark.sql.SparkSession,
                                  d: String): org.apache.spark.sql.DataFrame = {
    val t = col("__t")
    val base = Tables.documentsSpread(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("__t"))
      .select(col("doc_id"), size(t).cast("long").as("dl"), t)
    val n = base.agg(count(lit(1)).as("nd"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val tfRows = base.select(col("doc_id"), col("dl"),
        explode(array(BM25_QUERY.map(q =>
          struct(lit(q).as("tok"),
            size(filter(t, x => x === q)).cast("long").as("tf"))): _*)).as("u"))
      .select(col("doc_id"), col("dl"), col("u.tok").as("tok"), col("u.tf").as("tf"))
      .persist() // df agg + term scoring share it
    val dfc = tfRows.groupBy("tok")
      .agg(sum(when(col("tf") > 0, 1L).otherwise(0L)).as("dfc"))
    val terms = tfRows.filter(col("tf") > 0)
      .join(broadcast(dfc), "tok")
      .crossJoin(broadcast(n))
      .select(col("doc_id"),
        (log(lit(1) + (col("nd") - col("dfc") + lit(0.5)) / (col("dfc") + lit(0.5)))
          * (col("tf") * lit(2.2))
          / (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
          .cast(DecimalType(38, 20)).as("term"))
    terms.groupBy("doc_id")
      .agg(sum(col("term")).cast("double")
        .cast(DecimalType(18, 8)).cast("double").as("bm25"))
  }

  /** q96's duplicated-window width (tokens). Sub-segment spans: q86 removes
    * whole duplicated 16-token segments aligned to a fixed grid; q96 slides
    * a 5-token window at every offset, so copied spans are caught wherever
    * they start and only the covered tokens are dropped. */
  private val SPAN_W = 5

  /** q149's exact-mining minimum repeat length (tokens) — matches the
    * 8-gram granularity of q72's decontamination machinery. */
  private val DUP_L = 8

  /** Shared SQL for distinct word-3-gram extraction with the df cap
    * (DuckDB dialect), over any docs relation `src` with (doc_id, text). */
  private[queries] def gramsSql(src: String): String =
    s"""toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM $src
       |          WHERE len(string_split(text, ' ')) >= 3),
       |grams_all AS (SELECT DISTINCT doc_id,
       |            unnest(list_transform(range(1, len(t) - 1),
       |                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS gram
       |          FROM toks),
       |grams AS (SELECT doc_id, gram FROM (
       |            SELECT doc_id, gram, COUNT(*) OVER (PARTITION BY gram) AS df
       |            FROM grams_all)
       |          WHERE df <= $MAX_GRAM_DF)""".stripMargin

  private val GRAMS_SQL = gramsSql("documents")

  /** q177's sorted-neighborhood window width (rows compared after each row
    * in blocking-key order). */
  private val SN_W = 3

  /** Shared SQL for the q27 near-dup pair pipeline (DuckDB dialect):
    * capped grams → co-occurrence counts → Jaccard ≥ 0.5 pairs as `jpairs`.
    * q67 builds its connected-components oracle on top of it; q73 replays
    * it over the quality-filtered docs relation. */
  private[queries] def pairsSql(src: String): String =
    s"""${gramsSql(src)},
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
       |co AS (SELECT g1.doc_id AS doc_a, g2.doc_id AS doc_b, COUNT(*) AS common
       |       FROM grams g1 JOIN grams g2
       |         ON g1.gram = g2.gram AND g1.doc_id < g2.doc_id
       |       GROUP BY g1.doc_id, g2.doc_id),
       |jpairs AS (SELECT doc_a, doc_b,
       |    common * 1.0 / (sa.n + sb.n - common) AS jaccard
       |  FROM co
       |  JOIN sizes sa ON sa.doc_id = doc_a
       |  JOIN sizes sb ON sb.doc_id = doc_b
       |  WHERE common * 1.0 / (sa.n + sb.n - common) >= 0.5)""".stripMargin

  private val PAIRS_SQL = pairsSql("documents")

  /** DuckDB SQL for the portable 16-minhash / 4-band construction over a
    * CTE named `grams` with (doc_id, gram): yields the `mh` and `bands`
    * CTEs. Shared by the q28 and q75 oracles so the salt format, slice
    * width and band grouping can never drift between them (the Spark
    * mirror is q28's aggregate build and Dedup.portableBandBuckets —
    * their equivalence is pinned in DedupSpec). */
  private[queries] def minhashBandsSql: String = {
    val mhCols = (0 until 16).map(i =>
      s"MIN(substring(md5('${i / 4}:' || gram), ${(i % 4) * 8 + 1}, 8)) AS mh$i")
      .mkString(",\n    ")
    val bandSelects = (0 until 4).map { b =>
      val cat = (b * 4 until b * 4 + 4).map(i => s"mh$i").mkString(" || ")
      s"SELECT doc_id, $b AS band, md5($cat) AS bh FROM mh"
    }.mkString("\n  UNION ALL\n  ")
    s"""mh AS (SELECT doc_id,
       |    $mhCols
       |  FROM grams GROUP BY doc_id),
       |bands AS (
       |  $bandSelects)""".stripMargin
  }

  /** Spark-side distinct word-3-gram extraction with the df cap:
    * (doc_id, gram string). Tokenizes via an explicit projection so the
    * split runs once per row, not once per element_at. Persisted — q27/q28
    * reuse the gram set 3-4× (sizes, both join sides); Bench/Verify clear
    * the cache between queries.
    */
  private[queries] def sparkGramsOf(docs: org.apache.spark.sql.DataFrame) = {
    val t = col("t")
    val grams = docs
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(t) >= 3)
      .select(col("doc_id"),
        explode(array_distinct(transform(
          sequence(lit(1), size(t) - 2),
          i => concat_ws(" ", element_at(t, i), element_at(t, i + 1), element_at(t, i + 2))
        ))).as("gram"))
    graft.operators.Occupancy.cap(grams, Seq("gram"), MAX_GRAM_DF, persistResult = true)
  }

  private def sparkGrams(s: org.apache.spark.sql.SparkSession, d: String) =
    sparkGramsOf(Tables.documentsSpread(s, d))

  /** One staged multi-split copy of `documents` per sf dir (4 parquet
    * files), built on first use and reused for the JVM's lifetime — the
    * replayable "4 ingest days" source q85 streams with
    * maxFilesPerTrigger=1. Deleted at JVM exit (cf. VectorPack.ivfLayout).
    */
  private val docBatchStages =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** One reusable per-batch-artifact store dir per (prefix, sf dir) —
    * cf. docBatchStages: the dir and its JVM-exit cleanup hook are created
    * once; each invocation clears the previous run's contents so min-of-2
    * bench plus correctness runs in one JVM don't accumulate dirs or
    * shutdown hooks. q85 stores HLL sketches here, q130 Count-Min grids. */
  private val sketchStores =
    new java.util.concurrent.ConcurrentHashMap[String, java.nio.file.Path]()
  private[queries] def clearedStore(d: String, prefix: String): java.nio.file.Path = {
    val p = sketchStores.computeIfAbsent(s"$prefix:$d", _ => {
      val dir = java.nio.file.Files.createTempDirectory(prefix)
      sys.addShutdownHook(graft.streaming.Streams.deleteRecursively(dir))
      dir
    })
    import scala.jdk.CollectionConverters._
    val children = java.nio.file.Files.list(p).iterator().asScala.toSeq
    children.foreach(graft.streaming.Streams.deleteRecursively)
    p
  }
  private[queries] def stagedDocBatches(s: org.apache.spark.sql.SparkSession, d: String): String =
    docBatchStages.computeIfAbsent(d, _ => {
      val dir = java.nio.file.Files.createTempDirectory("graft-q85-src-")
      sys.addShutdownHook(graft.streaming.Streams.deleteRecursively(dir))
      Tables.documents(s, d).repartition(4)
        .write.mode("overwrite").parquet(dir.toString)
      dir.toString
    })

  /** One staged 4-file copy of the exact-Jaccard PAIR list per sf dir —
    * the match-edge stream q194 ingests with maxFilesPerTrigger=1 (the
    * "pairs arrive as candidates are discovered" shape). Built on first
    * use, deleted at JVM exit; cf. [[stagedDocBatches]]. */
  private val pairBatchStages =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private[queries] def stagedPairBatches(s: org.apache.spark.sql.SparkSession, d: String): String =
    pairBatchStages.computeIfAbsent(d, _ => {
      val dir = java.nio.file.Files.createTempDirectory("graft-q194-src-")
      sys.addShutdownHook(graft.streaming.Streams.deleteRecursively(dir))
      jaccardPairs(s, d).select("doc_a", "doc_b").repartition(4)
        .write.mode("overwrite").parquet(dir.toString)
      dir.toString
    })

  /** One staged parquet copy of the q195 walk corpus per sf dir — built
    * on first use by [[walkCorpus]] and then SHARED by all four
    * walk-family queries (q195 emits it, q198 pairs over it, q206
    * GloVe-weights over it, q208 draws negatives from it), so a fleet
    * run pays the WALK_STEPS checkpoint ladder ONCE instead of 4×
    * (r14 fleet: ~10 s rebuilt). The corpus is all-BIGINT (start, walk,
    * step, node), so the parquet round trip is exact and every consumer
    * stays hash-identical to its direct-build answer. Deleted at JVM
    * exit; cf. [[stagedPairBatches]]. */
  private val walkCorpusStages =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def stagedWalkCorpus(s: org.apache.spark.sql.SparkSession,
                               d: String): org.apache.spark.sql.DataFrame = {
    val dir = walkCorpusStages.computeIfAbsent(d, _ => {
      val p = java.nio.file.Files.createTempDirectory("graft-walks-")
      sys.addShutdownHook(graft.streaming.Streams.deleteRecursively(p))
      walkCorpus(s, d).write.mode("overwrite").parquet(p.toString)
      p.toString
    })
    s.read.parquet(dir)
  }

  /** One staged 4-file copy of the WINNOW match-pair list per sf dir —
    * q200's edge stream (the q109 graph arriving incrementally); cf.
    * [[stagedPairBatches]] (which stages the q67/q194 Jaccard pairs). */
  private val winnowPairStages =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private[queries] def stagedWinnowPairBatches(
      s: org.apache.spark.sql.SparkSession, d: String): String =
    winnowPairStages.computeIfAbsent(d, _ => {
      val dir = java.nio.file.Files.createTempDirectory("graft-q200-src-")
      sys.addShutdownHook(graft.streaming.Streams.deleteRecursively(dir))
      winnowMatchPairs(s, d).select("id_a", "id_b").repartition(4)
        .write.mode("overwrite").parquet(dir.toString)
      dir.toString
    })

  /** Spark side of [[pairsSql]]: exact n-gram Jaccard near-dup pairs
    * (doc_a, doc_b, jaccard ≥ 0.5), unordered. Shared by q27 (pair listing),
    * q67 (connected-components clustering of the same pairs) and q73 (the
    * corpus-build composition over quality-filtered docs). */
  private[queries] def jaccardPairsOf(docs: org.apache.spark.sql.DataFrame) = {
    val grams = sparkGramsOf(docs)
    val sizes = grams.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val pairs = grams.as("g1")
      .join(grams.as("g2"),
        col("g1.gram") === col("g2.gram") && col("g1.doc_id") < col("g2.doc_id"))
      .groupBy(col("g1.doc_id").as("doc_a"), col("g2.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common"))
    val jc = col("common") * lit(1.0) / (col("na") + col("nb") - col("common"))
    pairs
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), jc.as("jaccard"))
      .filter(jc >= 0.5)
  }

  private def jaccardPairs(s: org.apache.spark.sql.SparkSession, d: String) =
    jaccardPairsOf(Tables.documentsSpread(s, d))

  /** q131's Jaccard threshold. */
  private val PREFIX_THETA = 0.5

  /** UNCAPPED distinct word-3-grams (doc_id, gram) — q131 needs the full
    * gram sets (its pruning is the lossless prefix filter, not the df
    * cap). Persisted: prefix build + both verify sides + sizes scan it. */
  private def uncappedGrams(s: org.apache.spark.sql.SparkSession, d: String) = {
    val t = col("t")
    Tables.documentsSpread(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(t) >= 3)
      .select(col("doc_id"),
        explode(array_distinct(transform(
          sequence(lit(1), size(t) - 2),
          i => concat_ws(" ", element_at(t, i), element_at(t, i + 1), element_at(t, i + 2))
        ))).as("gram"))
      .persist()
  }

  /** Candidate pairs from the prefix filter: per doc, keep the
    * n - ceil(θ·n) + 1 grams smallest in the GLOBAL (df, gram) order and
    * self-join on those. Lossless for J ≥ θ: the guaranteed overlap
    * (≥ ceil(θ·|a|) and ≥ ceil(θ·|b|)) cannot fit entirely in either
    * doc's dropped suffix, so the prefixes intersect. Buckets are small
    * by construction — prefixes are each doc's RAREST grams. */
  private[graft] def prefixJoinCandidates(
      grams: org.apache.spark.sql.DataFrame,
      precomputedSizes: Option[org.apache.spark.sql.DataFrame] = None) = {
    val dfCounts = grams.groupBy("gram").agg(count(lit(1)).as("__df"))
    // caller may pass its per-doc gram counts (q131 needs them again for
    // the jaccard denominator) so the corpus-wide agg runs once, not twice
    val sizes = precomputedSizes.getOrElse(
      grams.groupBy("doc_id").agg(count(lit(1)).as("__n")))
    // ceil(θ·n) with θ = 0.5 in exact integer arithmetic: (n + 1) div 2
    val prefix = grams.join(dfCounts, "gram").join(sizes, "doc_id")
      .withColumn("__rk", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("__df"), col("gram"))))
      .filter(col("__rk") <= col("__n") - expr("(__n + 1) div 2") + 1)
      .select(col("doc_id"), col("gram"), col("__n"))
    // length filter (Vernica et al.): J(a,b) ≥ θ ⟹ max(|a|,|b|) ≤ |min|/θ
    // (θ = 1/2 ⟹ max ≤ 2·min, exact in integers) — prunes size-mismatched
    // candidate pairs map-side with zero recall loss
    prefix.select(col("doc_id").as("doc_a"), col("gram"), col("__n").as("__na"))
      .join(prefix.select(col("doc_id").as("doc_b"), col("gram"), col("__n").as("__nb")), "gram")
      .filter(col("doc_a") < col("doc_b")
        && greatest(col("__na"), col("__nb")) <= lit(2) * least(col("__na"), col("__nb")))
      .select("doc_a", "doc_b").distinct()
  }

  /** q131: exact gram-Jaccard ≥ θ pairs via prefix filtering — only
    * candidate pairs pay the intersect-count, and the candidate set
    * provably contains every qualifying pair. */
  private[graft] def prefixJoinPairs(s: org.apache.spark.sql.SparkSession, d: String) = {
    val grams = uncappedGrams(s, d)
    val sizes = grams.groupBy("doc_id").agg(count(lit(1)).as("n")).persist()
    val common = prefixJoinCandidates(grams,
        Some(sizes.select(col("doc_id"), col("n").as("__n"))))
      .join(grams.withColumnRenamed("doc_id", "doc_a"), "doc_a")
      .join(grams.select(col("doc_id").as("doc_b"), col("gram")), Seq("doc_b", "gram"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("common"))
    val jc = col("common") * lit(1.0) / (col("na") + col("nb") - col("common"))
    common
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), jc.as("jaccard"))
      .filter(col("jaccard") >= PREFIX_THETA)
  }

  def all: Seq[QueryDef] = Seq(

    // ---- q22: exact dedup by content hash ----------------------------------
    QueryDef(
      "q22_dedup_exact",
      """SELECT md5(text) AS fp, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM documents
        |GROUP BY md5(text)
        |ORDER BY keep_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .groupBy(md5(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy("keep_id")
    },

    // ---- q23: normalized-fingerprint dedup stats per source ----------------
    QueryDef(
      "q23_fingerprint_dedup",
      """SELECT source,
        |  COUNT(*) AS n_docs,
        |  COUNT(DISTINCT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z ]', '', 'g'), ' +', ' ', 'g')))) AS n_unique
        |FROM documents
        |GROUP BY source
        |ORDER BY source""".stripMargin) { (s, d) =>
      val norm = trim(regexp_replace(regexp_replace(lower(col("text")), "[^a-z ]", ""), " +", " "))
      Tables.documents(s, d)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), countDistinct(md5(norm)).as("n_unique"))
        .orderBy("source")
    },

    // ---- q24: token counting per language ----------------------------------
    QueryDef(
      "q24_text_tokens",
      """SELECT lang,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
        |  MIN(len(string_split(text, ' '))) AS min_tokens,
        |  MAX(len(string_split(text, ' '))) AS max_tokens,
        |  CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
        |FROM documents
        |GROUP BY lang
        |ORDER BY lang""".stripMargin) { (s, d) =>
      val ntok = size(split(col("text"), " ")).cast("long")
      Tables.documents(s, d)
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(ntok).as("total_tokens"),
          min(ntok).as("min_tokens"),
          max(ntok).as("max_tokens"),
          (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"))
        .orderBy("lang")
    },

    // ---- q25: quality scoring per source -----------------------------------
    QueryDef(
      "q25_text_quality",
      s"""WITH scored AS (
         |  SELECT source,
         |    len(list_filter(string_split(text, ' '),
         |        x -> x IN (${STOP_EN.map("'" + _ + "'").mkString(",")})))
         |      * 1.0 / len(string_split(text, ' ')) AS stop_ratio,
         |    list_sum(list_transform(string_split(text, ' '), x -> length(x)))
         |      * 1.0 / len(string_split(text, ' ')) AS avg_word_len,
         |    len(string_split(text, ' ')) AS n_tok
         |  FROM documents)
         |SELECT source,
         |  COUNT(*) AS n_docs,
         |  CAST(SUM(CAST(stop_ratio AS DECIMAL(18,8))) AS DOUBLE) / COUNT(*) AS avg_stop_ratio,
         |  CAST(SUM(CAST(avg_word_len AS DECIMAL(18,8))) AS DOUBLE) / COUNT(*) AS avg_word_len,
         |  CAST(SUM(CASE WHEN n_tok < 40 THEN 1 ELSE 0 END) AS BIGINT) AS n_short
         |FROM scored
         |GROUP BY source
         |ORDER BY source""".stripMargin) { (s, d) =>
      val toks = split(col("text"), " ")
      val ntok = size(toks)
      val stopRatio = size(filter(toks, x => x.isin(STOP_EN: _*))) * lit(1.0) / ntok
      val awl = aggregate(transform(toks, x => length(x)), lit(0), (a, x) => a + x) * lit(1.0) / ntok
      Tables.documents(s, d)
        .select(col("source"), stopRatio.as("stop_ratio"), awl.as("avg_word_len"), ntok.as("n_tok"))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          (sum(col("stop_ratio").cast(DecimalType(18, 8))).cast("double") / count(lit(1))).as("avg_stop_ratio"),
          (sum(col("avg_word_len").cast(DecimalType(18, 8))).cast("double") / count(lit(1))).as("avg_word_len"),
          sum(when(col("n_tok") < 40, 1).otherwise(0)).as("n_short"))
        .orderBy("source")
    },

    // ---- q26: language-ID heuristic (stopword profiles) --------------------
    QueryDef(
      "q26_lang_id", {
        def cnt(words: Seq[String]) =
          s"len(list_filter(string_split(text, ' '), x -> x IN (${words.map("'" + _ + "'").mkString(",")})))"
        s"""WITH scores AS (
           |  SELECT lang,
           |    ${cnt(STOP_EN)} AS s_en, ${cnt(STOP_FR)} AS s_fr,
           |    ${cnt(STOP_DE)} AS s_de, ${cnt(STOP_ES)} AS s_es
           |  FROM documents)
           |SELECT lang,
           |  CASE WHEN s_en = 0 AND s_fr = 0 AND s_de = 0 AND s_es = 0 THEN 'und'
           |       WHEN s_en >= greatest(s_fr, s_de, s_es) THEN 'en'
           |       WHEN s_fr >= greatest(s_de, s_es) THEN 'fr'
           |       WHEN s_de >= s_es THEN 'de'
           |       ELSE 'es' END AS pred_lang,
           |  COUNT(*) AS n
           |FROM scores
           |GROUP BY 1, 2
           |ORDER BY lang, pred_lang""".stripMargin
      }) { (s, d) =>
      val toks = split(col("text"), " ")
      def cnt(words: Seq[String]) = size(filter(toks, x => x.isin(words: _*)))
      Tables.documents(s, d)
        .select(col("lang"),
          cnt(STOP_EN).as("s_en"), cnt(STOP_FR).as("s_fr"),
          cnt(STOP_DE).as("s_de"), cnt(STOP_ES).as("s_es"))
        .select(col("lang"),
          when(col("s_en") === 0 && col("s_fr") === 0 && col("s_de") === 0 && col("s_es") === 0, "und")
            .when(col("s_en") >= greatest(col("s_fr"), col("s_de"), col("s_es")), "en")
            .when(col("s_fr") >= greatest(col("s_de"), col("s_es")), "fr")
            .when(col("s_de") >= col("s_es"), "de")
            .otherwise("es").as("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "pred_lang")
    },

    // ---- q27: exact n-gram Jaccard near-duplicate pairs --------------------
    QueryDef(
      "q27_ngram_jaccard",
      s"""WITH $PAIRS_SQL
         |SELECT doc_a, doc_b, jaccard FROM jpairs
         |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
      jaccardPairs(s, d).orderBy("doc_a", "doc_b")
    },

    // ---- q67: near-dup CLUSTERS — connected components over q27's pairs ----
    // Pairs aren't what a dedup pipeline keeps: it needs one canonical doc
    // per transitive near-dup group (a~b, b~c ⇒ {a,b,c} even when a,c never
    // paired). Spark side runs operators.Components (alternating
    // large-star/small-star, O(log² n) keyed rounds — no driver-side graph);
    // the oracle replays it as a recursive-CTE transitive closure, feasible
    // because the oracle runs at test SFs. Canonical = min doc_id.
    QueryDef(
      "q67_dedup_clusters",
      s"""WITH RECURSIVE $PAIRS_SQL,
         |und AS (SELECT doc_a AS u, doc_b AS v FROM jpairs
         |        UNION ALL
         |        SELECT doc_b AS u, doc_a AS v FROM jpairs),
         |reach(u, v) AS (
         |  SELECT u, v FROM und
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u),
         |comp AS (SELECT u AS doc_id, least(u, MIN(v)) AS cluster_id
         |         FROM reach GROUP BY u)
         |SELECT cluster_id, doc_id,
         |  CAST(CASE WHEN doc_id = cluster_id THEN 1 ELSE 0 END AS BIGINT) AS is_canonical
         |FROM comp
         |ORDER BY cluster_id, doc_id""".stripMargin) { (s, d) =>
      graft.operators.Components
        .connectedComponents(jaccardPairs(s, d).select("doc_a", "doc_b"),
          "doc_a", "doc_b")
        .select(col("component").as("cluster_id"), col("id").as("doc_id"),
          when(col("id") === col("component"), 1L).otherwise(0L).as("is_canonical"))
        .orderBy("cluster_id", "doc_id")
    },

    // ---- q28: MinHash-LSH near-dup (md5-salted, oracle-replayable) ---------
    // 16 hash functions from 4 salted md5s: each md5's 32 hex chars yield
    // four 8-char (32-bit) slices — distinct bit regions of a strong hash
    // are independent enough for MinHash banding, and the md5 work (the
    // dominant cost of this portable path) drops 4×. Final pairs are
    // exact-Jaccard-verified regardless, so hash quality only moves recall.
    QueryDef(
      "q28_minhash_lsh", {
        s"""WITH $GRAMS_SQL,
           |$minhashBandsSql,
           |bandsc AS (SELECT doc_id, band, bh FROM (
           |             SELECT doc_id, band, bh,
           |               COUNT(*) OVER (PARTITION BY band, bh) AS n
           |             FROM bands)
           |           WHERE n <= $MAX_BUCKET),
           |cand AS (SELECT DISTINCT b1.doc_id AS doc_a, b2.doc_id AS doc_b
           |         FROM bandsc b1 JOIN bandsc b2
           |           ON b1.band = b2.band AND b1.bh = b2.bh
           |          AND b1.doc_id < b2.doc_id),
           |sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
           |common AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS common
           |           FROM cand c
           |           JOIN grams g1 ON g1.doc_id = c.doc_a
           |           JOIN grams g2 ON g2.doc_id = c.doc_b AND g2.gram = g1.gram
           |           GROUP BY c.doc_a, c.doc_b)
           |SELECT doc_a, doc_b,
           |  common * 1.0 / (sa.n + sb.n - common) AS jaccard
           |FROM common
           |JOIN sizes sa ON sa.doc_id = doc_a
           |JOIN sizes sb ON sb.doc_id = doc_b
           |WHERE common * 1.0 / (sa.n + sb.n - common) >= 0.5
           |ORDER BY doc_a, doc_b""".stripMargin
      }) { (s, d) =>
      val grams = sparkGrams(s, d)
      // 4 slices per salted md5 (CSE computes each md5 once per row)
      val mhAggs = (0 until 16).map(i =>
        min(substring(md5(concat(lit(s"${i / 4}:"), col("gram"))), (i % 4) * 8 + 1, 8)).as(s"mh$i"))
      // persist: the 4 band branches below each scan mh
      val mh = grams.groupBy("doc_id").agg(mhAggs.head, mhAggs.tail: _*).persist()
      val bands = (0 until 4).map { b =>
        mh.select(col("doc_id"), lit(b).as("band"),
          md5(concat((b * 4 until b * 4 + 4).map(i => col(s"mh$i")): _*)).as("bh"))
      }.reduce(_ unionByName _)
      // persisted: both sides of the candidate self-join scan it
      val bandsc = graft.operators.Occupancy.cap(
        bands, Seq("band", "bh"), MAX_BUCKET, persistResult = true)
      val cand = bandsc.as("b1")
        .join(bandsc.as("b2"),
          col("b1.band") === col("b2.band") && col("b1.bh") === col("b2.bh")
            && col("b1.doc_id") < col("b2.doc_id"))
        .select(col("b1.doc_id").as("doc_a"), col("b2.doc_id").as("doc_b"))
        .distinct()
      val sizes = grams.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val common = cand
        .join(grams.select(col("doc_id").as("doc_a"), col("gram")), "doc_a")
        .join(grams.select(col("doc_id").as("doc_b"), col("gram")), Seq("doc_b", "gram"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("common"))
      val jc = col("common") * lit(1.0) / (col("na") + col("nb") - col("common"))
      common
        .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
        .select(col("doc_a"), col("doc_b"), jc.as("jaccard"))
        .filter(jc >= 0.5)
        .orderBy("doc_a", "doc_b")
    },

    // ---- q29: 16-bit SimHash fingerprints (md5-hex-bit, oracle-replayable) -
    QueryDef(
      "q29_simhash", {
        val bitSql = (0 until 16).map { j =>
          val hexPos = j / 4 + 1
          val shift = j % 4
          s"""CASE WHEN 2 * len(list_filter(string_split(text, ' '),
             |    x -> ((instr('0123456789abcdef', substring(md5(x), $hexPos, 1)) - 1) >> $shift) & 1 = 1))
             |  > len(string_split(text, ' ')) THEN ${1 << j} ELSE 0 END""".stripMargin
        }.mkString("\n  + ")
        s"""SELECT doc_id,
           |  $bitSql AS simhash16
           |FROM documents
           |ORDER BY doc_id""".stripMargin
      }) { (s, d) =>
      val toks = split(col("text"), " ")
      val bitCols = (0 until 16).map { j =>
        val hexPos = j / 4 + 1
        val shift = j % 4
        val bitSet = (x: org.apache.spark.sql.Column) =>
          shiftright(instr2(lit("0123456789abcdef"), substring(md5(x), hexPos, 1)) - 1, shift)
            .bitwiseAND(1) === 1
        when(lit(2) * size(filter(toks, x => bitSet(x))) > size(toks), 1 << j).otherwise(0)
      }
      Tables.documents(s, d)
        .select(col("doc_id"), bitCols.reduce(_ + _).as("simhash16"))
        .orderBy("doc_id")
    },

    // ---- q83: distinctive-term extraction (tf/df keyword scoring) ----------
    // Per doc, the 3 terms most distinctive of it: high in-doc frequency,
    // rare across the corpus — scored tf/df (monotone in tf·idf for any
    // fixed idf shape, but with NO transcendental in the sort key: ln()
    // implementations differ across engines at the ulp, an IEEE division
    // does not). Shuffles: (doc, token) tf agg, token df agg, one keyed
    // join, one per-doc rank window — every stage partial-agg friendly or
    // keyed; the token universe is never collected.
    QueryDef(
      "q83_distinctive_terms",
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
        |tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM tok GROUP BY doc_id, t),
        |df AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY t),
        |scored AS (
        |  SELECT doc_id, tf.t AS token,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id
        |      ORDER BY tf * 1.0 / df DESC, tf.t) AS rk
        |  FROM tf JOIN df ON df.t = tf.t)
        |SELECT doc_id, token, CAST(rk AS BIGINT) AS rk
        |FROM scored
        |WHERE rk <= 3
        |ORDER BY doc_id, rk""".stripMargin) { (s, d) =>
      val tf = Tables.documentsSpread(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
        .groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("t").agg(count(lit(1)).as("df"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id")
        .orderBy((col("tf") * lit(1.0) / col("df")).desc, col("t"))
      tf.join(df, "t")
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 3)
        .select(col("doc_id"), col("t").as("token"), col("rk"))
        .orderBy("doc_id", "rk")
    },

    // ---- q78: repetition scoring (Gopher repetition-rule family) -----------
    // Degenerate/templated text shows up as token repetition long before a
    // human reads it: per doc, the fraction of tokens taken by the single
    // most frequent token, and the distinct-token ratio. Shape: explode →
    // (doc, token) count → per-doc max/count — two keyed aggregations, both
    // partial-agg friendly (the token universe is never collected). Report
    // per source with the decimal-sum average trick.
    QueryDef(
      "q78_repetition",
      """WITH tok AS (
        |  SELECT doc_id, source, len(string_split(text, ' ')) AS ntok,
        |    unnest(string_split(text, ' ')) AS t
        |  FROM documents),
        |pertok AS (
        |  SELECT doc_id, source, ntok, t, COUNT(*) AS c
        |  FROM tok GROUP BY doc_id, source, ntok, t),
        |perdoc AS (
        |  SELECT doc_id, source, ntok, MAX(c) AS cmax, COUNT(*) AS ndistinct
        |  FROM pertok GROUP BY doc_id, source, ntok),
        |scored AS (
        |  SELECT source, cmax * 1.0 / ntok AS top_frac,
        |    ndistinct * 1.0 / ntok AS distinct_ratio
        |  FROM perdoc)
        |SELECT source,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN top_frac > 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS n_repetitive,
        |  CAST(SUM(CAST(top_frac AS DECIMAL(18,8))) AS DOUBLE) / COUNT(*) AS avg_top_frac,
        |  CAST(SUM(CAST(distinct_ratio AS DECIMAL(18,8))) AS DOUBLE) / COUNT(*) AS avg_distinct_ratio
        |FROM scored
        |GROUP BY source
        |ORDER BY source""".stripMargin) { (s, d) =>
      val tok = Tables.documentsSpread(s, d)
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).as("ntok"),
          explode(split(col("text"), " ")).as("t"))
      val perDoc = tok
        .groupBy("doc_id", "source", "ntok", "t").agg(count(lit(1)).as("c"))
        .groupBy("doc_id", "source", "ntok")
        .agg(max(col("c")).as("cmax"), count(lit(1)).as("ndistinct"))
      perDoc
        .select(col("source"),
          (col("cmax") * lit(1.0) / col("ntok")).as("top_frac"),
          (col("ndistinct") * lit(1.0) / col("ntok")).as("distinct_ratio"))
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("top_frac") > 0.2, 1).otherwise(0)).as("n_repetitive"),
          (sum(col("top_frac").cast(DecimalType(18, 8))).cast("double") /
            count(lit(1))).as("avg_top_frac"),
          (sum(col("distinct_ratio").cast(DecimalType(18, 8))).cast("double") /
            count(lit(1))).as("avg_distinct_ratio"))
        .orderBy("source")
    },

    // ---- q40: BPE-ish tokenization — regex tokens + 4-char subword chunks --
    // Whitespace counting is q24; this is the subword path a training-data
    // pipeline budgets with: regexp tokenizer (letters|digits|punct) and a
    // fixed-width chunking as the BPE stand-in (real BPE needs a learned
    // merge table — the counting/vocab plumbing is identical). The subword
    // explode is the only shuffle-feeding step; everything per-row is
    // map-side.
    QueryDef(
      "q40_bpe_tokens", {
        val pat = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
        s"""WITH per_doc AS (
           |  SELECT lang, regexp_extract_all(text, '$pat') AS toks
           |  FROM documents),
           |a AS (
           |  SELECT lang, COUNT(*) AS n_docs,
           |    CAST(SUM(len(toks)) AS BIGINT) AS total_tokens
           |  FROM per_doc GROUP BY lang),
           |subs AS (
           |  SELECT lang,
           |    unnest(flatten(list_transform(toks, w ->
           |      list_transform(range(1, (length(w)+3)//4 + 1), i ->
           |        substring(w, (i-1)*4 + 1, 4))))) AS sub
           |  FROM per_doc),
           |b AS (
           |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS total_subwords,
           |    CAST(COUNT(DISTINCT sub) AS BIGINT) AS vocab_subwords
           |  FROM subs GROUP BY lang)
           |SELECT a.lang, n_docs, total_tokens, total_subwords, vocab_subwords
           |FROM a JOIN b ON a.lang = b.lang
           |ORDER BY a.lang""".stripMargin
      }) { (s, d) =>
      val pat = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
      val perDoc = Tables.documents(s, d)
        .select(col("lang"), regexp_extract_all(col("text"), lit(pat), lit(0)).as("toks"))
        .persist()
      val a = perDoc.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum(size(col("toks"))).as("total_tokens"))
      val subs = perDoc.select(col("lang"),
        explode(flatten(transform(col("toks"), w =>
          transform(sequence(lit(1), floor((length(w) + 3) / 4).cast("int")),
            i => w.substr((i - 1) * 4 + 1, lit(4)))))).as("sub"))
      val b = subs.groupBy("lang")
        .agg(count(lit(1)).as("total_subwords"),
          countDistinct(col("sub")).as("vocab_subwords"))
      a.join(b, "lang").orderBy("lang")
    },

    // ---- q41: rolling-hash document fingerprint ----------------------------
    // Order-sensitive polynomial rolling hash over per-word codes
    // (Karp-Rabin shape: fp ← fp·P + code mod M). Unlike q22's md5-of-text,
    // the rolling form is incrementally maintainable (append a word in
    // O(1)) — the fingerprint a streaming ingest keeps per growing doc.
    // All-integer arithmetic, exact in both engines.
    QueryDef(
      "q41_rolling_fingerprint",
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(7::BIGINT,
        |      list_transform(string_split(text, ' '), w ->
        |        CAST(length(w) * 31 + ascii(substring(w, 1, 1)) AS BIGINT))),
        |    (acc, x) -> (acc * 1000003 + x) % 2147483647) AS fp
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val code = (w: org.apache.spark.sql.Column) =>
        (length(w) * 31 + ascii(substring(w, 1, 1))).cast("long")
      Tables.documents(s, d)
        .select(col("doc_id"),
          aggregate(transform(split(col("text"), " "), code), lit(7L),
            (acc, x) => (acc * 1000003L + x) % 2147483647L).as("fp"))
        .orderBy("doc_id")
    },

    // ---- q43: HLL approximate distinct next to the exact answer ------------
    // approx_count_distinct is the 100 TB path for cardinality (HLL++ —
    // fixed-size sketch, one pass, map-side mergeable; exact countDistinct
    // expands to a two-phase shuffle of every distinct value). The raw
    // estimate is engine-specific (so it can never hash-match DuckDB), but
    // the property that makes it USABLE — |est − exact| ≤ 3σ = 3·rsd·exact —
    // is deterministic for a fixed fixture, so the query emits that check as
    // a column and the oracle replays it as the constant TRUE next to its
    // own COUNT(DISTINCT). Hash-green (r15, upgraded from rows-only): the
    // oracle now pins the exact count AND the estimate's error band; the
    // raw estimate value stays asserted in DedupSpec. The portable-register
    // HLL twin with a fully replayed estimate is q204.
    QueryDef(
      "q43_approx_distinct",
      """SELECT source,
        |  COUNT(DISTINCT md5(trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z ]', '', 'g'), '  *', ' ', 'g')))) AS n_exact,
        |  TRUE AS approx_ok
        |FROM documents GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .groupBy(col("source"))
        .agg(
          countDistinct(docFp).as("n_exact"),
          approx_count_distinct(docFp, rsd = 0.05).as("n_approx"))
        .select(col("source"), col("n_exact"),
          (abs(col("n_approx") - col("n_exact")).cast("double")
            <= col("n_exact").cast("double") * lit(0.15)).as("approx_ok"))
        .orderBy("source")
    },

    // ---- q85: incremental cardinality — per-batch HLL sketches, merged -----
    // The cross-batch story q43's one-pass HLL doesn't cover, run through the
    // REAL streaming engine: the corpus is staged as 4 parquet splits and
    // replayed via readStream with maxFilesPerTrigger=1, so each micro-batch
    // is a genuine ingest day. foreachBatch aggregates a FIXED-SIZE mergeable
    // Datasketches HLL of each batch's normalized fingerprints per source and
    // PERSISTS the sketch bytes next to the batch (a parquet sketch store);
    // the corpus-wide distinct count comes from UNIONING the stored sketches
    // — old batches are never rescanned. That is the 100 TB incremental-
    // dedup accounting loop: state is O(sketch), not O(keys), and the HLL
    // union is register-wise max, so the merged estimate is independent of
    // how ingest happened to be batched.
    //
    // Hash-green (r15, upgraded from rows-only): sketch BINARIES are
    // engine-specific, but the two properties the store contract rests on
    // are deterministic booleans — (a) batching-independence: the estimate
    // of the union of per-batch sketches EQUALS the single-pass whole-corpus
    // sketch's estimate (register-wise max is associative/commutative/
    // idempotent, so same lgK ⇒ identical merged registers), and (b) the
    // merged estimate sits inside the Datasketches ~3σ band of the exact
    // count. The oracle replays both as constant TRUE next to its own
    // COUNT(DISTINCT), pinning rows+schema+exact counts+both invariants.
    // The raw estimate value stays asserted in DedupSpec; the portable-
    // register streaming twin with a fully replayed estimate is q205.
    QueryDef(
      "q85_incremental_distinct",
      """WITH fp AS (
        |  SELECT source, md5(trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z ]', '', 'g'), '  *', ' ', 'g'))) AS fp
        |  FROM documents)
        |SELECT source, COUNT(DISTINCT fp) AS n_exact,
        |  TRUE AS merge_lossless, TRUE AS within_band
        |FROM fp GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      val norm = docFp
      val srcDir = stagedDocBatches(s, d)
      // one reusable store per sf dir, cleared per invocation; deleted at
      // JVM exit, not eagerly — the returned plan lazily reads it
      val store = clearedStore(d, "graft-q85-sketches-")
      val schema = s.read.parquet(srcDir).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(srcDir)
      graft.streaming.Streams.runForeachBatch(s, stream, (batch, batchId) =>
        batch.select(col("source"), norm.as("fp"))
          .groupBy("source")
          .agg(hll_sketch_agg(col("fp")).as("sk"))
          .withColumn("batch_id", lit(batchId))
          // idempotent under micro-batch retry (foreachBatch is
          // at-least-once): dynamic overwrite replaces ONLY this batch's
          // partition, so a replayed batch can never double its rows into
          // the store's cell-wise/union merge
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(store.toString))
      val merged = s.read.parquet(store.toString)
        .groupBy("source")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("n_merged"))
      val single = Tables.documents(s, d)
        .groupBy("source")
        .agg(hll_sketch_estimate(hll_sketch_agg(norm)).as("n_single"))
      val exact = Tables.documents(s, d)
        .select(col("source"), norm.as("fp"))
        .groupBy("source").agg(countDistinct(col("fp")).as("n_exact"))
      merged.join(single, "source").join(exact, "source")
        .select(col("source"), col("n_exact"),
          (col("n_merged") === col("n_single")).as("merge_lossless"),
          (abs(col("n_merged") - col("n_exact")).cast("double")
            <= greatest(lit(3.0), col("n_exact").cast("double") * lit(0.09)))
            .as("within_band"))
        .orderBy("source")
    },

    // ---- q47: heavy-hitter tokens — MG sketch prune, then exact verify -----
    // The 100 TB shape for "which tokens exceed 1/(k+1) of a language's
    // volume": pass 1 builds a Misra-Gries sketch per lang (fixed k-counter
    // state, mergeable partials — functions.MisraGries; never shuffles the
    // token universe). MG guarantees its tracked set contains EVERY token
    // with true frequency > N/(k+1). Pass 2 exact-counts only the ≤k
    // tracked candidates (broadcast join prunes everything else map-side
    // before the shuffle) and keeps those above the threshold. Because the
    // final filter is on exact counts, the result equals the exact
    // heavy-hitter set regardless of sketch merge order — so it is fully
    // oracle-checkable, while the sketch still does the scale-critical
    // pruning. (The oracle, lacking the sketch, counts all tokens.)
    QueryDef(
      "q47_heavy_hitters",
      """WITH toks AS (SELECT lang, unnest(string_split(text, ' ')) AS t FROM documents),
        |tot AS (SELECT lang, COUNT(*) AS n FROM toks GROUP BY lang),
        |cnt AS (SELECT lang, t, COUNT(*) AS c FROM toks GROUP BY lang, t)
        |SELECT cnt.lang AS lang, t AS token, c AS cnt
        |FROM cnt JOIN tot ON cnt.lang = tot.lang
        |WHERE c * 51 > n
        |ORDER BY lang, token""".stripMargin) { (s, d) =>
      val k = 50
      val mg = udaf(new graft.functions.MisraGries(k))
      // scanned twice (sketch pass + exact pass) — persisted; Bench/Verify
      // clear the cache between queries
      val toks = Tables.documents(s, d)
        .select(col("lang"), explode(split(col("text"), " ")).as("t"))
        .persist()
      val candidates = toks.groupBy("lang").agg(mg(col("t")).as("hh"))
        .select(col("lang"), explode(map_keys(col("hh"))).as("t"))
      val totals = toks.groupBy("lang").agg(count(lit(1)).as("n"))
      toks.join(broadcast(candidates), Seq("lang", "t"))
        .groupBy("lang", "t").agg(count(lit(1)).as("cnt"))
        .join(broadcast(totals), "lang")
        .filter(col("cnt") * (k + 1) > col("n"))
        .select(col("lang"), col("t").as("token"), col("cnt"))
        .orderBy("lang", "token")
    },

    // ---- native xxhash64 scale-path variants (rows-only checks) ------------
    QueryDef.rowsOnly("q51_dedup_minhash_native") { (s, d) =>
      Dedup.nearDuplicates(Tables.documentsSpread(s, d), "doc_id", "text")
    },
    QueryDef.rowsOnly("q52_dedup_simhash_native") { (s, d) =>
      val sim = Dedup.simHash64(Tables.documentsSpread(s, d), "doc_id", "text")
      Dedup.simHashNearDup(sim, "doc_id", maxDist = 8).orderBy("id_a", "id_b")
    },
    // q67's clustered endpoint for the 100 TB path: connected components
    // over the NATIVE xxhash64 MinHash-LSH pairs (q51) instead of the
    // portable md5 pairs — the full scale pipeline shingle → sign → band →
    // verify → cluster with numeric signatures end to end. Rows-only (the
    // signatures have no DuckDB twin); the clustering operator itself is
    // hash-checked via q67 and ComponentsSpec, and q51 ⊇ q27 pair recall is
    // asserted in DedupSpec.
    QueryDef.rowsOnly("q74_dedup_clusters_native") { (s, d) =>
      val pairs = Dedup.nearDuplicates(Tables.documentsSpread(s, d), "doc_id", "text")
      graft.operators.Components
        .connectedComponents(pairs.select("id_a", "id_b"), "id_a", "id_b")
        .select(col("component").as("cluster_id"), col("id").as("doc_id"),
          when(col("id") === col("component"), 1L).otherwise(0L).as("is_canonical"))
        .orderBy("cluster_id", "doc_id")
    },
    // ---- q65: simhash blocking with PLANTED hamming-distance ground truth --
    // q52's xxhash64 signatures have no DuckDB twin, so the blocking
    // operator itself gets an oracle here: portable 60-bit signatures
    // (md5-hex → BIGINT, identical in both engines), plus a planted twin
    // per doc_id < 50 at EXACTLY hamming distance 3 (three contiguous bits
    // flipped: sig XOR (7 << (doc_id % 58))). The operator's pigeonhole
    // blocking guarantees recall for distance ≤ maxDist and its final
    // filter makes precision exact, so its output must equal the oracle's
    // brute-force all-pairs xor/bit_count scan — hash-checked.
    QueryDef(
      "q65_simhash_planted",
      s"""WITH base AS (
         |  SELECT doc_id, ('0x' || substring(md5(text), 1, 15))::BIGINT AS simhash
         |  FROM documents),
         |twins AS (
         |  SELECT doc_id + $SIMHASH_TWIN_OFFSET AS tid,
         |    xor(simhash, 7::BIGINT << CAST(doc_id % 58 AS INT)) AS sh
         |  FROM base WHERE doc_id < 50),
         |sims AS (
         |  SELECT doc_id, simhash FROM base
         |  UNION ALL
         |  SELECT tid AS doc_id, sh AS simhash FROM twins)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |FROM sims a JOIN sims b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
         |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      val base = Tables.documents(s, d)
        .select(col("doc_id"),
          conv(substring(md5(col("text")), 1, 15), 16, 10).cast("long").as("simhash"))
      val mask = call_function("shiftleft", lit(7L), pmod(col("doc_id"), lit(58)).cast("int"))
      val sims = base.unionByName(
        base.filter(col("doc_id") < 50).select(
          (col("doc_id") + SIMHASH_TWIN_OFFSET).as("doc_id"),
          col("simhash").bitwiseXOR(mask).as("simhash")))
      Dedup.simHashNearDup(sims, "doc_id", maxDist = 8)
        .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
        .orderBy("id_a", "id_b")
    },

    // ---- q86: paragraph-level exact dedup (C4/RefinedWeb sub-doc dedup) ----
    // The sub-document complement of q22/q53's whole-doc dedup: docs split
    // into fixed 16-token segments, and only the corpus-wide FIRST occurrence
    // of each exact segment survives (first = lowest (doc_id, seg_id) —
    // deterministic across runs and cluster sizes). Removes boilerplate
    // repeated ACROSS documents that whole-doc hashing cannot see. Shape:
    // per-row split/explode (map-side), ONE keyed shuffle on the segment
    // text (Dedup.markFirstUnits), one keyed re-assembly agg — the kept_md5
    // pins the exact surviving text, not just counts.
    QueryDef(
      "q86_paragraph_dedup",
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |segs AS (
         |  SELECT doc_id, CAST(u.sid AS BIGINT) AS seg_id, u.seg AS seg FROM (
         |    SELECT doc_id,
         |      unnest(list_transform(range(0, CAST(CEIL(len(t) / $SEG_TOKENS.0) AS INT)), i ->
         |        {sid: i, seg: array_to_string(t[CAST(i*$SEG_TOKENS + 1 AS INT):CAST(i*$SEG_TOKENS + $SEG_TOKENS AS INT)], ' ')})) AS u
         |    FROM toks)),
         |ranked AS (
         |  SELECT doc_id, seg_id, seg,
         |    ROW_NUMBER() OVER (PARTITION BY seg ORDER BY doc_id, seg_id) AS rn
         |  FROM segs)
         |SELECT doc_id,
         |  COUNT(*) AS n_segs,
         |  CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(COUNT(*) - SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
         |  md5(COALESCE(string_agg(CASE WHEN rn = 1 THEN seg END, ' ' ORDER BY seg_id), '')) AS kept_md5
         |FROM ranked
         |GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val t = col("__t")
      val nseg = ceil(size(t) / lit(SEG_TOKENS.toDouble)).cast("int")
      val segs = Tables.documentsSpread(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("__t"))
        .select(col("doc_id"),
          posexplode(transform(sequence(lit(0), nseg - 1),
            i => concat_ws(" ", slice(t, i * SEG_TOKENS + 1, lit(SEG_TOKENS))))))
        .select(col("doc_id"), col("pos").cast("long").as("seg_id"), col("col").as("seg"))
      Dedup.markFirstUnits(segs, "doc_id", "seg_id", "seg")
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_segs"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
          // kept segments re-assembled in seg_id order: collect_list skips
          // the nulls of non-kept rows, array_sort orders the (seg_id, seg)
          // structs lexicographically = by position
          md5(concat_ws(" ",
            transform(
              array_sort(collect_list(when(col("kept"), struct(col("seg_id"), col("seg"))))),
              x => x.getField("seg")))).as("kept_md5"))
        .select(col("doc_id"), col("n_segs"), col("n_kept"),
          (col("n_segs") - col("n_kept")).as("n_dropped"), col("kept_md5"))
        .orderBy("doc_id")
    },

    // ---- q88/q89: planted-recall audits for the native xxhash64 paths ------
    // The q76/q77 trick applied to text dedup: q51/q52's signatures are
    // engine-specific (no DuckDB twin), but their RECALL is an oracle-
    // expressible constant. Plant one exact-copy twin per doc_id < 50; an
    // exact copy has identical shingle sets → identical MinHash signatures →
    // every band collides (q88), and an identical token stream → identical
    // simhash → hamming 0, surfaced by every chunk block (q89). Both are
    // certainties, not probabilistic LSH events, so the expected answer is a
    // constant-true row per twin. INTENTIONALLY strict (cf. q76): a missing
    // twin yields twin_found=0 and a null score → hash-red.
    QueryDef(
      "q88_minhash_planted_recall",
      // the ≥3-token guard on BOTH sides pins the fixture assumption the
      // strict oracle rides on: Dedup.shingles drops docs shorter than one
      // 3-gram, so a short doc's twin is (correctly) invisible to MinHash —
      // it must be excluded from the audit, not scored as a miss
      """SELECT doc_id, CAST(1 AS BIGINT) AS twin_found, CAST(1.0 AS DOUBLE) AS jaccard
        |FROM documents WHERE doc_id < 50 AND len(string_split(text, ' ')) >= 3
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val base = Tables.documentsSpread(s, d).select(col("doc_id"), col("text"))
      val corpus = base.unionByName(
        base.filter(col("doc_id") < 50)
          .select((col("doc_id") + NATIVE_TWIN_OFFSET).as("doc_id"), col("text")))
      val twinPairs = Dedup.nearDuplicates(corpus, "doc_id", "text")
        .filter(col("id_b") === col("id_a") + NATIVE_TWIN_OFFSET && col("id_a") < 50)
      base.filter(col("doc_id") < 50 && size(split(col("text"), " ")) >= 3)
        .select(col("doc_id"))
        .join(twinPairs, col("doc_id") === col("id_a"), "left")
        .select(col("doc_id"),
          when(col("id_b").isNotNull, 1L).otherwise(0L).as("twin_found"),
          col("jaccard"))
        .orderBy("doc_id")
    },

    QueryDef(
      "q89_simhash_planted_recall",
      """SELECT doc_id, CAST(1 AS BIGINT) AS twin_found, CAST(0 AS BIGINT) AS hamming
        |FROM documents WHERE doc_id < 50 ORDER BY doc_id""".stripMargin) { (s, d) =>
      val base = Tables.documentsSpread(s, d).select(col("doc_id"), col("text"))
      val corpus = base.unionByName(
        base.filter(col("doc_id") < 50)
          .select((col("doc_id") + NATIVE_TWIN_OFFSET).as("doc_id"), col("text")))
      val sim = Dedup.simHash64(corpus, "doc_id", "text")
      val twinPairs = Dedup.simHashNearDup(sim, "doc_id", maxDist = 8)
        .filter(col("id_b") === col("id_a") + NATIVE_TWIN_OFFSET && col("id_a") < 50)
      base.filter(col("doc_id") < 50).select(col("doc_id"))
        .join(twinPairs, col("doc_id") === col("id_a"), "left")
        .select(col("doc_id"),
          when(col("id_b").isNotNull, 1L).otherwise(0L).as("twin_found"),
          col("hamming").cast("long").as("hamming"))
        .orderBy("doc_id")
    },

    QueryDef(
      "q53_dedup_exact_native",
      """SELECT doc_id, lang, source, n_chars FROM (
        |  SELECT doc_id, lang, source, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |  FROM documents)
        |WHERE rn = 1
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Dedup.exact(Tables.documents(s, d), Seq("text"), "doc_id")
        .select("doc_id", "lang", "source", "n_chars").orderBy("doc_id")
    },

    // ---- q90: token-rarity quality profile ---------------------------------
    // The corpus-statistics quality signal q70's per-doc rules can't see:
    // how much of each doc is made of corpus-RARE tokens (gibberish, OOV,
    // mangled encodings score rare-heavy). A unigram-LM log-prob score
    // would need ln(), whose last ulp differs across engines — so rarity
    // is INTEGER arithmetic only: a token is rare when its collection
    // frequency is below half the corpus mean (c·2·vocab ≤ N — corpus-
    // relative, so the definition survives any vocabulary size), and the
    // per-doc argmin (rarest token, ties broken lexicographically) is a
    // rank-1 window row. Every output is a count or a token: exact in
    // both engines by construction, no float anywhere.
    // Shape at 100 TB: one partial-agg'd (token → cf) count, the 1-row
    // (total, vocab) broadcast, one keyed join token-stream × cf (the
    // only big shuffle — same shape as q83's df join), then a per-doc
    // window + groupBy (doc-sized sorts).
    QueryDef(
      "q90_token_rarity",
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |cf AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
        |n AS (SELECT CAST(SUM(c) AS BIGINT) AS total, CAST(COUNT(*) AS BIGINT) AS vocab FROM cf),
        |r AS (
        |  SELECT doc_id, tok, c, total, vocab,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c, tok) AS rn
        |  FROM toks JOIN cf USING (tok) CROSS JOIN n)
        |SELECT doc_id,
        |  COUNT(*) AS n_tok,
        |  CAST(SUM(CASE WHEN c * 2 * vocab <= total THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
        |  MIN(c) AS min_cf,
        |  MAX(CASE WHEN rn = 1 THEN tok END) AS rarest_tok
        |FROM r
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      // token stream scanned twice (cf pass + rarity pass) — persisted
      val toks = Tables.documentsSpread(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .persist()
      val cf = toks.groupBy("tok").agg(count(lit(1)).as("c"))
      val n = cf.agg(sum(col("c")).as("total"), count(lit(1)).as("vocab"))
      val w = Window.partitionBy("doc_id").orderBy(col("c"), col("tok"))
      toks.join(cf, "tok").crossJoin(broadcast(n))
        .withColumn("rn", row_number().over(w))
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_tok"),
          sum(when(col("c") * 2 * col("vocab") <= col("total"), 1L)
            .otherwise(0L)).as("n_rare"),
          min(col("c")).as("min_cf"),
          max(when(col("rn") === 1, col("tok"))).as("rarest_tok"))
        .orderBy("doc_id")
    },

    // ---- q96: cross-doc duplicate-span removal (substring-level dedup) -----
    // The sliding-window approximation of suffix-array substring dedup
    // (Lee et al., "Deduplicating Training Data Makes Language Models
    // Better"): a token is removed iff it is covered by any 5-token window
    // whose text also occurs in a LOWER-id document — the span keeps its
    // first occurrence corpus-wide and disappears everywhere else,
    // wherever in the doc the copy starts (q86's fixed segments only catch
    // grid-aligned copies). Shape: window hashing is per-row map work; the
    // first-occurrence pass is ONE keyed agg on the window hash; flagged
    // starts come back via a keyed join + per-doc collect; coverage and
    // re-assembly are per-row array math (O(ntok · dup_spans), no shuffle).
    // kept_md5 pins the exact surviving text on both engines.
    QueryDef(
      "q96_duplicate_span_removal",
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |w AS (
         |  SELECT doc_id, CAST(u.st AS BIGINT) AS st, u.wh AS wh FROM (
         |    SELECT doc_id, unnest(list_transform(range(1, len(t) - ${SPAN_W - 2}), i ->
         |      {st: i, wh: md5(array_to_string(t[CAST(i AS INT):CAST(i + ${SPAN_W - 1} AS INT)], ' '))})) AS u
         |    FROM d WHERE len(t) >= $SPAN_W)),
         |f AS (SELECT wh, MIN(doc_id) AS fd FROM w GROUP BY wh),
         |dl AS (
         |  SELECT w.doc_id, list(w.st) AS ds FROM w JOIN f USING (wh)
         |  WHERE f.fd < w.doc_id GROUP BY w.doc_id),
         |cov AS (
         |  SELECT d.doc_id, d.t, COALESCE(dl.ds, []::BIGINT[]) AS ds
         |  FROM d LEFT JOIN dl USING (doc_id)),
         |k AS (
         |  SELECT doc_id, t, list_filter(range(1, len(t) + 1),
         |    p -> len(list_filter(ds, s -> s <= p AND p < s + $SPAN_W)) = 0) AS kp
         |  FROM cov)
         |SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tok,
         |  CAST(len(t) - len(kp) AS BIGINT) AS n_removed,
         |  md5(COALESCE(array_to_string(list_transform(kp, p -> t[CAST(p AS INT)]), ' '), '')) AS kept_md5
         |FROM k
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val t = col("__t")
      val docs = Tables.documentsSpread(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("__t"))
      // window table scanned twice (first-occurrence agg + flag join)
      val wins = docs.filter(size(t) >= SPAN_W)
        .select(col("doc_id"),
          posexplode(transform(sequence(lit(1), size(t) - (SPAN_W - 1)),
            i => md5(concat_ws(" ",
              (0 until SPAN_W).map(k => element_at(t, i + k)): _*)))))
        .select(col("doc_id"), (col("pos") + 1).cast("long").as("st"),
          col("col").as("wh"))
        .persist()
      val first = wins.groupBy("wh").agg(min(col("doc_id")).as("fd"))
      val dupStarts = wins.join(first, "wh")
        .filter(col("fd") < col("doc_id"))
        .groupBy("doc_id").agg(collect_list(col("st")).as("ds"))
      val ds = coalesce(col("ds"), array().cast("array<bigint>"))
      val keptPos = filter(sequence(lit(1L), size(t).cast("long")),
        p => !exists(ds, st => st <= p && p < st + SPAN_W))
      docs.join(dupStarts, Seq("doc_id"), "left")
        .select(
          col("doc_id"),
          size(t).cast("long").as("n_tok"),
          (size(t) - size(keptPos)).cast("long").as("n_removed"),
          md5(concat_ws(" ",
            transform(keptPos, p => element_at(t, p.cast("int"))))).as("kept_md5"))
        .orderBy("doc_id")
    },

    // ---- q149: exact min-length duplicate-substring mining -----------------
    // The guaranteed semantics q96 approximates: every maximal repeated
    // substring of >= DUP_L tokens, via the gram reduction (a position is
    // in a >= L-token repeat iff covered by a duplicated L-gram; maximal
    // runs of covered positions = the maximal repeated spans). 100% recall
    // by construction — no sampling, no windows skipped. See
    // [[graft.operators.Dedup.duplicateSpans]] for the scale analysis
    // (one keyed agg + one keyed join + a per-doc window).
    QueryDef(
      "q149_duplicate_substrings",
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |g AS (
         |  SELECT doc_id, CAST(u.st AS BIGINT) AS st, u.gh AS gh FROM (
         |    SELECT doc_id, unnest(list_transform(range(1, len(t) - ${DUP_L - 2}), i ->
         |      {st: i, gh: md5(array_to_string(t[CAST(i AS INT):CAST(i + ${DUP_L - 1} AS INT)], ' '))})) AS u
         |    FROM d WHERE len(t) >= $DUP_L)),
         |gs AS (SELECT gh, COUNT(*) AS occ, COUNT(DISTINCT doc_id) AS ndocs
         |       FROM g GROUP BY gh),
         |dup AS (SELECT g.doc_id, g.st, gs.ndocs FROM g JOIN gs USING (gh)
         |        WHERE gs.occ >= 2),
         |lagged AS (
         |  SELECT doc_id, st, ndocs,
         |    LAG(st) OVER (PARTITION BY doc_id ORDER BY st) AS pst
         |  FROM dup),
         |isl AS (
         |  SELECT doc_id, st, ndocs,
         |    SUM(CASE WHEN st - pst > $DUP_L THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY doc_id ORDER BY st) AS island
         |  FROM lagged)
         |SELECT doc_id, MIN(st) AS span_start,
         |  MAX(st) - MIN(st) + $DUP_L AS span_len,
         |  CAST(COUNT(*) AS BIGINT) AS n_grams,
         |  CAST(MAX(ndocs) AS BIGINT) AS n_sources
         |FROM isl GROUP BY doc_id, island
         |ORDER BY doc_id, span_start""".stripMargin) { (s, d) =>
      graft.operators.Dedup.duplicateSpans(
          Tables.documentsSpread(s, d)
            .select(col("doc_id"), split(col("text"), " ").as("__t")),
          "doc_id", "__t", DUP_L)
        .orderBy("doc_id", "span_start")
    },

    // ---- q152: self-repetition coverage — degenerate-loop detection --------
    // The generated-text failure q78's unigram stats can't see: a doc that
    // CYCLES (the same 5-token-or-longer phrase repeated inside one
    // document) has normal token frequencies but high self-repeat
    // coverage. Reuses the q149 span machinery in within-doc mode (a gram
    // is duplicated only if it recurs in the SAME doc), then reports per
    // source: docs, loopy docs (>= 30% of positions covered), average
    // coverage in integer basis points (floor per doc, floor of the mean —
    // no float anywhere, so no cross-engine rounding surface), and the
    // worst doc's covered-token count. The fixture corpus contains no
    // natural 5-gram self-repeats (an all-zero board would be trivially
    // green even with broken machinery), so every doc_id % 5 == 0 doc is
    // PLANTED with a loop — its own first 12 tokens appended three times,
    // the same deterministic augmentation on both engines — giving the
    // detector known nonzero ground truth it must score exactly.
    QueryDef(
      "q152_self_repetition",
      s"""WITH pl AS (
         |  SELECT doc_id, source,
         |    CASE WHEN doc_id % 5 = 0
         |         THEN text || ' ' || hd || ' ' || hd || ' ' || hd
         |         ELSE text END AS text
         |  FROM (SELECT doc_id, source, text,
         |          array_to_string(string_split(text, ' ')[1:12], ' ') AS hd
         |        FROM documents)),
         |d AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM pl),
         |g AS (
         |  SELECT doc_id, CAST(u.st AS BIGINT) AS st, u.gh AS gh FROM (
         |    SELECT doc_id, unnest(list_transform(range(1, len(t) - ${SPAN_W - 2}), i ->
         |      {st: i, gh: md5(array_to_string(t[CAST(i AS INT):CAST(i + ${SPAN_W - 1} AS INT)], ' '))})) AS u
         |    FROM d WHERE len(t) >= $SPAN_W)),
         |gs AS (SELECT doc_id, gh FROM g GROUP BY doc_id, gh HAVING COUNT(*) >= 2),
         |dup AS (SELECT g.doc_id, g.st FROM g JOIN gs
         |        ON gs.doc_id = g.doc_id AND gs.gh = g.gh),
         |lagged AS (
         |  SELECT doc_id, st,
         |    LAG(st) OVER (PARTITION BY doc_id ORDER BY st) AS pst
         |  FROM dup),
         |isl AS (
         |  SELECT doc_id, st,
         |    SUM(CASE WHEN st - pst > $SPAN_W THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY doc_id ORDER BY st) AS island
         |  FROM lagged),
         |spans AS (SELECT doc_id, MAX(st) - MIN(st) + $SPAN_W AS span_len
         |          FROM isl GROUP BY doc_id, island),
         |cov AS (SELECT doc_id, SUM(span_len) AS covered FROM spans GROUP BY doc_id),
         |perdoc AS (
         |  SELECT d.source, len(d.t) AS ntok, COALESCE(c.covered, 0) AS covered
         |  FROM d LEFT JOIN cov c USING (doc_id))
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN covered * 10 >= ntok * 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_loopy,
         |  CAST(SUM(covered * 10000 // ntok) // COUNT(*) AS BIGINT) AS avg_cov_bp,
         |  CAST(MAX(covered) AS BIGINT) AS max_covered
         |FROM perdoc GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      val hd = concat_ws(" ", slice(split(col("text"), " "), 1, 12))
      val docs = Tables.documentsSpread(s, d)
        .select(col("doc_id"), col("source"),
          when(col("doc_id") % 5 === 0,
            concat_ws(" ", col("text"), hd, hd, hd))
            .otherwise(col("text")).as("text"))
        .select(col("doc_id"), col("source"), split(col("text"), " ").as("__t"))
      val cov = graft.operators.Dedup.duplicateSpans(
          docs.select(col("doc_id"), col("__t")), "doc_id", "__t",
          SPAN_W, withinDoc = true)
        .groupBy("doc_id").agg(sum(col("span_len")).as("covered"))
      docs.select(col("doc_id"), col("source"),
          size(col("__t")).cast("long").as("ntok"))
        .join(cov, Seq("doc_id"), "left")
        .withColumn("covered", coalesce(col("covered"), lit(0L)))
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("covered") * 10 >= col("ntok") * 3, 1L).otherwise(0L)).as("n_loopy"),
          expr("sum(covered * 10000 div ntok) div count(1)").as("avg_cov_bp"),
          max(col("covered")).as("max_covered"))
        .orderBy("source")
    },

    // ---- q99: PMI collocation mining — top adjacent-bigram associations ----
    // Corpus analysis for tokenizer/vocab design: which adjacent token
    // pairs co-occur far above chance. PMI = ln(P(ab) / (P(a)·P(b))) over
    // ADJACENT bigrams only — the pair stream is linear in the token
    // stream (never all-pairs), partial-agg'd into (a, b) counts, then two
    // keyed joins attach the unigram counts. Cross-engine: the PMI
    // argument c_ab·T_uni²/(c_a·c_b·T_bi) is evaluated as the identical
    // double expression on both sides, the single ln() is rounded to
    // DECIMAL(18,8), and the global top-50 orders by the ROUNDED score
    // with a lexicographic (a, b) tiebreak — so the cut is deterministic.
    QueryDef(
      "q99_pmi_bigrams",
      s"""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |uni AS (
         |  SELECT unnest(t) AS w FROM toks),
         |ucnt AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY w),
         |bi AS (
         |  SELECT unnest(list_transform(range(1, len(t)), i ->
         |    {a: t[CAST(i AS INT)], b: t[CAST(i+1 AS INT)]})) AS u
         |  FROM toks WHERE len(t) >= 2),
         |bcnt AS (SELECT u.a AS a, u.b AS b, COUNT(*) AS c_ab FROM bi GROUP BY u.a, u.b),
         |tot AS (
         |  SELECT (SELECT SUM(c) FROM ucnt) AS t_uni,
         |         (SELECT SUM(c_ab) FROM bcnt) AS t_bi),
         |scored AS (
         |  SELECT a, b, c_ab,
         |    CAST(CAST(ln(CAST(c_ab AS DOUBLE) * t_uni * t_uni
         |      / (ca.c * cb.c * t_bi)) AS DECIMAL(18,8)) AS DOUBLE) AS pmi
         |  FROM bcnt JOIN ucnt ca ON ca.w = a JOIN ucnt cb ON cb.w = b
         |  CROSS JOIN tot
         |  WHERE c_ab >= $PMI_MIN_COUNT)
         |SELECT a, b, CAST(c_ab AS BIGINT) AS c_ab, pmi,
         |  CAST(ROW_NUMBER() OVER (ORDER BY pmi DESC, a, b) AS BIGINT) AS rk
         |FROM scored QUALIFY rk <= 50
         |ORDER BY rk""".stripMargin) { (s, d) =>
      val t = col("__t")
      val toks = Tables.documentsSpread(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("__t"))
        .persist() // unigram + bigram passes share the token arrays
      val ucnt = toks.select(explode(t).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
      val bcnt = toks.filter(size(t) >= 2)
        .select(explode(transform(sequence(lit(1), size(t) - 1),
          i => struct(element_at(t, i).as("a"), element_at(t, i + 1).as("b")))).as("u"))
        .select(col("u.a").as("a"), col("u.b").as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
      val tot = ucnt.agg(sum(col("c")).as("t_uni"))
        .crossJoin(bcnt.agg(sum(col("c_ab")).as("t_bi")))
      val scored = bcnt.filter(col("c_ab") >= PMI_MIN_COUNT)
        .join(ucnt.select(col("w").as("a"), col("c").as("ca")), "a")
        .join(ucnt.select(col("w").as("b"), col("c").as("cb")), "b")
        .crossJoin(broadcast(tot))
        .select(col("a"), col("b"), col("c_ab"),
          log(col("c_ab").cast("double") * col("t_uni") * col("t_uni") /
            (col("ca") * col("cb") * col("t_bi")))
            .cast(DecimalType(18, 8)).cast("double").as("pmi"))
      val w = Window.orderBy(col("pmi").desc, col("a"), col("b"))
      scored.withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 50)
        .orderBy("rk")
    },

    // ---- q100: winnowing fingerprints (MOSS-style robust selection) --------
    // The guaranteed-recall fingerprinting scheme (Schleimer/Wilkerson/
    // Aiken): hash every 3-gram, slide a window of 4 consecutive hashes,
    // select each window's MINIMUM (rightmost on ties), dedupe positions.
    // Any shared token run of ≥ w+2 tokens between two documents then
    // shares at least one selected fingerprint — the density/recall
    // trade-off q41's every-position rolling hash can't make. Entirely
    // per-row array math (no shuffle before the final sort); the 60-bit
    // md5-prefix hash is the portable construction, xxhash64 being the
    // drop-in at deploy. Docs shorter than one full window winnow their
    // single truncated window — the slice-length term keeps the rightmost
    // arithmetic exact there too, on both engines.
    QueryDef(
      "q100_winnowing",
      s"""WITH $WinnowSqlCtes
         |SELECT doc_id,
         |  CAST(len(h) AS BIGINT) AS n_grams,
         |  CAST(len(sp) AS BIGINT) AS n_fp,
         |  md5(array_to_string(list_transform(sp, p ->
         |    CAST(p AS VARCHAR) || ':' || CAST(h[CAST(p AS INT)] AS VARCHAR)), ',')) AS fp_md5
         |FROM sel
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val g = col("__g")
      val sp = col("__sp")
      winnowSelected(s, d).select(
          col("doc_id"),
          size(g).cast("long").as("n_grams"),
          size(sp).cast("long").as("n_fp"),
          md5(concat_ws(",", transform(sp, p =>
            concat(p.cast("string"), lit(":"),
              element_at(g, p.cast("int")).cast("string"))))).as("fp_md5"))
        .orderBy("doc_id")
    },

    // ---- q103: winnowing fingerprint matching (the MOSS match step) --------
    // Closing the fingerprinting loop: docs sharing ≥2 winnowing-selected
    // hashes are overlap candidates — the match MOSS runs on the q100
    // selection, with the guarantee that any ≥6-token shared run surfaces.
    // Same bounded shape as every match stage here: fingerprints with df
    // over the cap are boilerplate and dropped BEFORE the self-join
    // (identical filter in the oracle), so fan-out per fingerprint is
    // capped; the join is keyed on the hash; support counts are exact.
    QueryDef(
      "q103_winnow_matches",
      s"""WITH $WinnowPairsSqlCtes
         |SELECT id_a, id_b, n_shared FROM mpairs
         |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      winnowMatchPairs(s, d).orderBy("id_a", "id_b")
    },

    // ---- q101: character-entropy quality scoring (pure map-side) -----------
    // The Shannon-entropy filter web pipelines run next to the q70 rules:
    // very low character entropy = repeated filler/padding, very high =
    // random bytes/encoded blobs — both useless as training text. Computed
    // ENTIRELY within each row: distinct chars via array_distinct of the
    // char split, per-char counts via length-minus-replace (no explode, no
    // shuffle, codegen'd string ops), H = Σ (c/n)·ln(n/c) summed exactly
    // as DECIMAL(38,20) inside the row and rounded to DECIMAL(18,8) — the
    // distinct-order difference between engines cannot move the exact
    // decimal sum, and ulp-level ln() drift dies in the rounding.
    QueryDef(
      "q101_char_entropy",
      """WITH base AS (
        |  SELECT doc_id, text, length(text) AS n,
        |    list_distinct(string_split(text, '')) AS cs
        |  FROM documents WHERE length(text) > 0),
        |scored AS (
        |  SELECT doc_id, n, len(cs) AS n_distinct_chars,
        |    list_sum(list_transform(cs, ch ->
        |      CAST((CAST(n - length(replace(text, ch, '')) AS DOUBLE) / n)
        |        * ln(CAST(n AS DOUBLE) / (n - length(replace(text, ch, ''))))
        |        AS DECIMAL(38,20)))) AS hsum
        |  FROM base)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_chars_text,
        |  CAST(n_distinct_chars AS BIGINT) AS n_distinct_chars,
        |  CAST(CAST(CAST(hsum AS DOUBLE) AS DECIMAL(18,8)) AS DOUBLE) AS entropy
        |FROM scored
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val n = col("__n")
      val cnt = (ch: org.apache.spark.sql.Column) =>
        n - length(call_function("replace", col("text"), ch, lit("")))
      Tables.documents(s, d)
        .filter(length(col("text")) > 0)
        .select(col("doc_id"), col("text"), length(col("text")).as("__n"),
          array_distinct(split(col("text"), "")).as("__cs"))
        .select(col("doc_id"),
          n.cast("long").as("n_chars_text"),
          size(col("__cs")).cast("long").as("n_distinct_chars"),
          aggregate(
            transform(col("__cs"), ch =>
              ((cnt(ch).cast("double") / n) * log(n.cast("double") / cnt(ch)))
                .cast(DecimalType(38, 20))),
            lit(0).cast(DecimalType(38, 20)),
            (acc, x) => (acc + x).cast(DecimalType(38, 20)))
            .cast("double").cast(DecimalType(18, 8)).cast("double").as("entropy"))
        .orderBy("doc_id")
    },

    // ---- q104: BM25 retrieval scoring over the corpus ----------------------
    // The retrieval face of the quality stack: rank documents against a
    // fixed query by BM25 (k1=1.2, b=0.75, the Robertson positive-idf
    // form). Per-doc term frequencies are pure map-side array filters (no
    // token explode — only |query| rows emitted per doc); document
    // frequencies are one tiny agg broadcast back; the scored table holds
    // only docs containing ≥1 query token. Cross-engine: every constant
    // is written as the same literal on both sides (2.2, 0.25, never
    // k1+1), avgdl is one exact-integer division, the ln() rides the
    // decimal-sum + DECIMAL(18,8) rounding discipline, and the top-50 cut
    // orders by the ROUNDED score with doc_id tiebreak.
    QueryDef(
      "q104_bm25",
      s"""WITH $Bm25SqlCtes
         |SELECT doc_id, bm25,
         |  CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS rk
         |FROM scored QUALIFY rk <= 50
         |ORDER BY rk""".stripMargin) { (s, d) =>
      val scored = bm25Scores(s, d)
      val w = Window.orderBy(col("bm25").desc, col("doc_id"))
      scored.withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 50)
        .orderBy("rk")
    },

    // ---- q107: fuzzy dedup via deletion-neighborhood blocking --------------
    // Edit-distance-1 entity resolution at scale: each string emits itself
    // plus every 1-deletion variant as blocking keys; two strings within
    // Levenshtein distance 1 ALWAYS share a key (substitution at i → both
    // sides' delete-at-i variants collide; insert/delete → the longer
    // side's deletion equals the shorter side itself), so the keyed join
    // has 100% recall — no O(n²) pair scan. Bucket width is naturally
    // bounded by |alphabet|·len (every member of a bucket re-inserts one
    // char into the same base string), so the self-join cannot fan out.
    // The oracle is the honest brute-force O(n²) Levenshtein join — two
    // completely different algorithms must produce identical twin sets
    // (driver gate runs sf0.01: 1500² candidate pairs, fine for DuckDB;
    // the Spark side stays the blocked shape that survives 100 TB).
    QueryDef(
      "q107_fuzzy_name_dedup",
      """WITH p AS (
        |  SELECT a.c_custkey AS ida, b.c_custkey AS idb
        |  FROM customer a JOIN customer b
        |    ON a.c_custkey < b.c_custkey
        |   AND abs(length(a.c_name) - length(b.c_name)) <= 1
        |   AND levenshtein(a.c_name, b.c_name) <= 1),
        |u AS (SELECT ida AS id, idb AS twin FROM p
        |      UNION ALL SELECT idb, ida FROM p)
        |SELECT id AS c_custkey, CAST(COUNT(*) AS BIGINT) AS n_fuzzy_twins,
        |  MIN(twin) AS min_twin
        |FROM u GROUP BY id
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val name = col("c_name")
      // self + all 1-deletion variants (array_distinct: deleting either of
      // two equal adjacent chars yields the same variant)
      val delKeys = array_distinct(concat(
        array(name),
        transform(sequence(lit(1), length(name)), i =>
          concat(name.substr(lit(1), i - 1),
            name.substr(i + 1, length(name) - i)))))
      // persisted: both sides of the blocking self-join scan the same
      // exploded variant table (len+1 rows per customer)
      val keyed = Tables.customer(s, d)
        .select(col("c_custkey"), name, explode(delKeys).as("k"))
        .persist()
      val pairs = keyed.select(col("c_custkey").as("ida"), name.as("na"), col("k"))
        .join(keyed.select(col("c_custkey").as("idb"), name.as("nb"), col("k")), "k")
        .filter(col("ida") < col("idb"))
        .select("ida", "idb", "na", "nb").distinct()
        .filter(levenshtein(col("na"), col("nb")) <= 1)
      val u = pairs.select(col("ida").as("id"), col("idb").as("twin"))
        .unionAll(pairs.select(col("idb").as("id"), col("ida").as("twin")))
      u.groupBy(col("id").as("c_custkey"))
        .agg(count(lit(1)).as("n_fuzzy_twins"), min(col("twin")).as("min_twin"))
        .orderBy("c_custkey")
    },

    // ---- q108: inverted-index construction (df-capped posting lists) -------
    // The index-build behind q104's BM25 scoring: term → sorted posting
    // list. Scale discipline: the df pass runs FIRST (count is partial-agg
    // friendly — the shuffle carries one (term, count) per partition, not
    // the postings), the df band [2, 100] drops singleton noise and
    // stopword terms, and only then are postings collected — so no
    // collect_list ever materializes an uncapped stopword list (the
    // classic index-build OOM at 100 TB). The kept-term set is broadcast
    // back against the token stream.
    QueryDef(
      "q108_inverted_index",
      """WITH toks AS (
        |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents)
        |SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
        |  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
        |FROM toks GROUP BY term
        |HAVING COUNT(*) BETWEEN 2 AND 100
        |ORDER BY term""".stripMargin) { (s, d) =>
      val toks = Tables.documentsSpread(s, d)
        .select(col("doc_id"),
          explode(array_distinct(split(col("text"), " "))).as("term"))
      val kept = toks.groupBy("term")
        .agg(count(lit(1)).as("df"))
        .filter(col("df").between(2, 100))
      // `kept` is a df-filtered vocabulary subset — still Heaps-law unbounded
      // at corpus scale, so no forced broadcast (AQE decides)
      toks.join(kept, "term")
        .groupBy("term", "df")
        .agg(array_sort(collect_list(col("doc_id"))).as("__ids"))
        .select(col("term"), col("df"),
          concat_ws(",", transform(col("__ids"), _.cast("string"))).as("postings"))
        .orderBy("term")
    },

    // ---- q109: graph centrality over the match graph (fixed-point PR) -----
    // Canonical-document selection for dedup clusters by link analysis:
    // 5 PageRank iterations (d = 0.85) over the symmetric q103 winnowing
    // match graph. Arithmetic is FIXED-POINT BIGINT (ranks scaled by 1e6,
    // `div` for contributions) — integer addition is associative, so the
    // result is bit-identical regardless of aggregation order or engine,
    // which is what makes an iterative float algorithm hash-checkable at
    // all. Each iteration is one keyed join + aggregation against the
    // persisted degree-annotated edge list; at unbounded iteration count
    // the lineage would need per-round localCheckpoint (cf. Components),
    // at a fixed 5 rounds the plan stays flat.
    QueryDef(
      "q109_match_pagerank", PR_MATCH_ORACLE) { (s, d) =>
      // persisted: deg and the degree-annotated edge list both scan the
      // symmetric edge set, and mp itself is a match-pair self-join.
      // fixedPointPageRank is EAGER (returns a localCheckpoint-backed
      // frame), so the cache is releasable the moment it returns — without
      // the unpersist nothing downstream ever references it again and the
      // blocks leak for the session's lifetime (ADVICE r11).
      val mp = winnowMatchPairs(s, d)
      val edges = mp.select(col("id_a").as("u"), col("id_b").as("v"))
        .unionAll(mp.select(col("id_b").as("u"), col("id_a").as("v")))
        .persist()
      val pr =
        try graft.operators.Graph.fixedPointPageRank(edges, "u", "v", iters = 5)
        finally edges.unpersist(blocking = false)
      pr.select(col("id").as("doc_id"), col("r").as("pr_rank"))
        .orderBy("doc_id")
    },

    // ---- q124: canonical-doc selection — components × centrality -----------
    // The step dedup pipelines actually ship: group near-dup docs into
    // clusters (connected components over the q103 match graph) and pick
    // each cluster's canonical representative by CENTRALITY (the q109
    // fixed-point rank — most-connected version wins) instead of the
    // naive min-id. Composition of two individually-green iterative
    // operators; the oracle replays both (recursive-CTE closure + the 5
    // unrolled PageRank rounds) and must agree on every cluster's
    // canonical pick — ties broken by lowest doc_id on both sides.
    QueryDef(
      "q124_canonical_selection", {
        val iters = (1 to 5).map { k =>
          val prev = if (k == 1) "r0" else s"i${k - 1}"
          s"""i$k AS (
             |  SELECT ed.v AS id,
             |    CAST(150000 + (85 * SUM(pr.r // ed.od)) // 100 AS BIGINT) AS r
             |  FROM ed JOIN $prev pr ON pr.id = ed.u GROUP BY ed.v)""".stripMargin
        }.mkString(",\n")
        s"""WITH RECURSIVE $WinnowPairsSqlCtes,
           |und AS (SELECT id_a AS u, id_b AS v FROM mpairs
           |        UNION ALL SELECT id_b, id_a FROM mpairs),
           |reach(u, v) AS (
           |  SELECT u, v FROM und
           |  UNION
           |  SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u),
           |comp AS (SELECT u AS doc_id, least(u, MIN(v)) AS cluster_id
           |         FROM reach GROUP BY u),
           |deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS od
           |        FROM und GROUP BY u),
           |ed AS (SELECT e.u, e.v, d.od FROM und e JOIN deg d ON d.u = e.u),
           |r0 AS (SELECT u AS id, CAST(1000000 AS BIGINT) AS r FROM deg),
           |$iters,
           |ranked AS (
           |  SELECT c.cluster_id, c.doc_id, i5.r,
           |    ROW_NUMBER() OVER (PARTITION BY c.cluster_id
           |                       ORDER BY i5.r DESC, c.doc_id) AS rn
           |  FROM comp c JOIN i5 ON i5.id = c.doc_id)
           |SELECT cluster_id,
           |  MIN(CASE WHEN rn = 1 THEN doc_id END) AS canonical_doc,
           |  MIN(CASE WHEN rn = 1 THEN r END) AS canonical_rank,
           |  CAST(COUNT(*) AS BIGINT) AS cluster_size
           |FROM ranked
           |GROUP BY cluster_id
           |ORDER BY cluster_id""".stripMargin
      }) { (s, d) =>
      val mp = winnowMatchPairs(s, d).persist()
      mp.count() // materialize ONCE at session width before both consumers
      val edges = mp.select(col("id_a").as("u"), col("id_b").as("v"))
        .unionAll(mp.select(col("id_b").as("u"), col("id_a").as("v")))
      // CC and PR are independent given mp — both are internally eager
      // (CC's rounds, PR's checkpoint), so running them sequentially
      // serializes two latency-bound iterative phases over a tiny
      // contracted graph. Overlap them: CC on a helper thread, PR on this
      // one; Spark's scheduler interleaves their small stages across idle
      // cores. Both express their measured iteration width IN THE PLAN
      // (explicit repartition — see Components/Graph), so the overlap
      // touches no session state and needs no snapshot/restore (the r11
      // form mutated spark.sql.shuffle.partitions from both threads).
      // Results are unaffected by width or interleaving (both phases are
      // exact integer fixed-point); the oracle hash pins that.
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      var fCc: Option[Future[org.apache.spark.sql.DataFrame]] = None
      val (comp, ranks) = try {
        val f = Future {
          graft.operators.Components
            .connectedComponents(mp.select("id_a", "id_b"), "id_a", "id_b")
            .select(col("component").as("cluster_id"), col("id").as("doc_id"))
        }
        fCc = Some(f)
        val r = graft.operators.Graph
          .fixedPointPageRank(edges, "u", "v", iters = 5)
          .select(col("id").as("__rid"), col("r"))
        (Await.result(f, scala.concurrent.duration.Duration.Inf), r)
      } finally {
        // quiesce the CC thread before releasing the cache: if PR threw,
        // an orphaned future would still be running jobs against mp after
        // the unpersist. CC is bounded by maxRounds, so the quiesce
        // always terminates.
        fCc.foreach(f => scala.util.Try(
          Await.ready(f, scala.concurrent.duration.Duration.Inf)))
        // both consumers are eager and checkpoint-backed once the future
        // has quiesced — nothing references the mp cache after this point
        // (ADVICE r11: the unreleased persist leaked for the session's
        // lifetime)
        mp.unpersist(blocking = false)
      }
      // canonical pick = argmax (r, -doc_id): a single max_by hash-agg
      // (partial-agg'd map-side, no per-cluster sort) replaces the
      // row_number window — same selection the oracle's rn = 1 makes,
      // deterministic because (r, doc_id) is unique per row.
      val ord = struct(col("r"), negate(col("doc_id")))
      comp.join(ranks, col("doc_id") === col("__rid"))
        .groupBy("cluster_id")
        .agg(max_by(col("doc_id"), ord).as("canonical_doc"),
          max_by(col("r"), ord).as("canonical_rank"),
          count(lit(1)).as("cluster_size"))
        .orderBy("cluster_id")
    },

    // ---- q125: Count-Min sketch frequency estimation -----------------------
    // The third mergeable frequency sketch alongside Misra-Gries (q47) and
    // HLL (q43): a fixed D×W counter grid where token t increments cell
    // (r, md5(r:t) mod W) per row r, and estimate(t) = min over rows —
    // always ≥ the true count, over by at most the collision mass. State
    // is O(D·W) regardless of vocabulary, every cell update is a keyed
    // count (partial-agg friendly), and grids merge by cell-wise addition
    // — the streaming/shard-merge shape. Hashing is the portable md5 idiom
    // (cf. q28), so the FULL sketch — grid, probe cells, estimates, and
    // the exact-count verifier — replays bit-for-bit in the oracle: the
    // over_err column pins the ≥-exact invariant as hashed fact.
    QueryDef("q125_countmin_sketch", CM_ORACLE) { (s, d) =>
      val toks = Tables.documentsSpread(s, d)
        .select(explode(split(col("text"), " ")).as("t"))
      val counters = cmCells(toks, "t")
        .groupBy("r", "c").agg(count(lit(1)).as("cnt"))
      cmAnswer(s, counters, toks)
    },

    // ---- q130: streaming incremental Count-Min merge -----------------------
    // q125's deploy shape for continuous ingest (what q116 is to q105, for
    // sketches): each micro-batch computes ITS OWN D×W grid (≤ D·W rows,
    // ~16 KiB) and appends it to a grid store; the corpus-wide sketch is
    // the cell-wise SUM of the per-batch grids — Count-Min's merge is
    // exact addition, so the merged grid is bit-identical to the one-pass
    // grid and this query hash-checks against the SAME oracle as q125
    // through the real streaming engine. New data never rescans old
    // batches: per batch work is O(batch + D·W), state is O(batches·D·W)
    // compactable to O(D·W) by re-summing.
    QueryDef("q130_stream_countmin", CM_ORACLE) { (s, d) =>
      val srcDir = stagedDocBatches(s, d)
      val store = clearedStore(d, "graft-q130-grid-")
      val schema = s.read.parquet(srcDir).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(srcDir)
      graft.streaming.Streams.runForeachBatch(s, stream, (batch, batchId) =>
        cmCells(batch.select(explode(split(col("text"), " ")).as("t")), "t")
          .groupBy("r", "c").agg(count(lit(1)).as("cnt"))
          .withColumn("batch_id", lit(batchId))
          // idempotent under micro-batch retry (foreachBatch is
          // at-least-once): dynamic overwrite replaces ONLY this batch's
          // partition, so a replayed batch can never double its rows into
          // the store's cell-wise/union merge
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(store.toString))
      val counters = s.read.parquet(store.toString)
        .groupBy("r", "c").agg(sum(col("cnt")).as("cnt"))
      val toks = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("t"))
      cmAnswer(s, counters, toks)
    },

    // ---- q147: k-hop contamination spread (bounded BFS) --------------------
    // The blast-radius query decontamination needs: given flagged docs
    // (portable stand-in: doc_id % 11 = 0), which docs sit within K
    // near-dup hops — i.e. would removing the flagged docs leave behind
    // close paraphrases? Bounded synchronous BFS: dist(v) starts 0 on
    // flagged nodes, each round takes min(dist, 1 + min over neighbors) —
    // one keyed join + one keyed min per round, K rounds unrolled in the
    // oracle. Unreached docs report dist −1 (portable NULL-free form).
    QueryDef(
      "q147_contamination_spread", {
        val rounds = (1 to SPREAD_HOPS).map { r =>
          s"""d$r AS (
             |  SELECT n.id,
             |    CAST(LEAST(n.dist,
             |      COALESCE(m.nd + 1, ${Int.MaxValue})) AS BIGINT) AS dist
             |  FROM d${r - 1} n LEFT JOIN (
             |    SELECT e.v, MIN(p.dist) AS nd
             |    FROM ed e JOIN d${r - 1} p ON p.id = e.u
             |    WHERE p.dist < ${Int.MaxValue}
             |    GROUP BY e.v) m ON m.v = n.id)""".stripMargin
        }.mkString(",\n")
        s"""WITH $PAIRS_SQL,
           |ed AS (SELECT doc_a AS u, doc_b AS v FROM jpairs
           |       UNION ALL SELECT doc_b, doc_a FROM jpairs),
           |d0 AS (SELECT DISTINCT u AS id,
           |    CAST(CASE WHEN u % 11 = 0 THEN 0 ELSE ${Int.MaxValue} END AS BIGINT)
           |      AS dist
           |  FROM ed),
           |$rounds
           |SELECT id AS doc_id,
           |  CASE WHEN dist >= ${Int.MaxValue} THEN CAST(-1 AS BIGINT) ELSE dist END
           |    AS hops
           |FROM d$SPREAD_HOPS
           |ORDER BY doc_id""".stripMargin
      }) { (s, d) =>
      val INF = Int.MaxValue.toLong
      val jp = jaccardPairs(s, d)
      val ed = jp.select(col("doc_a").as("u"), col("doc_b").as("v"))
        .unionAll(jp.select(col("doc_b").as("u"), col("doc_a").as("v")))
        .persist()
      var dist = ed.select(col("u").as("id")).distinct()
        .select(col("id"),
          when(col("id") % 11 === 0, lit(0L)).otherwise(lit(INF)).as("dist"))
      for (_ <- 1 to SPREAD_HOPS) {
        val relaxed = ed.join(dist.filter(col("dist") < INF), col("u") === col("id"))
          .groupBy(col("v")).agg(min(col("dist")).as("nd"))
        dist = dist.join(relaxed, col("v") === col("id"), "left")
          .select(col("id"),
            least(col("dist"), coalesce(col("nd") + 1, lit(INF))).as("dist"))
      }
      dist
        .select(col("id").as("doc_id"),
          when(col("dist") >= INF, lit(-1L)).otherwise(col("dist")).as("hops"))
        .orderBy("doc_id")
    },

    // ---- q145: personalized PageRank from a seed set -----------------------
    // Quality propagation: restart mass lands ONLY on seed docs (here the
    // portable rule doc_id % 7 = 0 stands in for a curated list), so rank
    // measures how strongly the match graph vouches for each doc's
    // proximity to the seeds — nodes unreachable from every seed stay at
    // exactly 0 (asserted in GraphSpec). Same fixed-point integer
    // discipline as q109, so the iterative result is bit-identical under
    // any partitioning and the 4 rounds unroll as oracle CTEs.
    QueryDef(
      "q145_personalized_pagerank", {
        val iters = (1 to PPR_ITERS).map { k =>
          val prev = if (k == 1) "r0" else s"i${k - 1}"
          s"""c$k AS (
             |  SELECT ed.v, CAST((85 * SUM(pr.r // ed.od)) // 100 AS BIGINT) AS rc
             |  FROM ed JOIN $prev pr ON pr.id = ed.u GROUP BY ed.v),
             |i$k AS (
             |  SELECT n.id,
             |    CAST(CASE WHEN n.id % 7 = 0 THEN 150000 ELSE 0 END
             |      + COALESCE(c$k.rc, 0) AS BIGINT) AS r
             |  FROM nodes n LEFT JOIN c$k ON c$k.v = n.id)""".stripMargin
        }.mkString(",\n")
        s"""WITH $PAIRS_SQL,
           |edges AS (SELECT doc_a AS u, doc_b AS v FROM jpairs
           |          UNION ALL SELECT doc_b, doc_a FROM jpairs),
           |deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS od
           |        FROM edges GROUP BY u),
           |ed AS (SELECT e.u, e.v, d.od FROM edges e JOIN deg d ON d.u = e.u),
           |nodes AS (SELECT u AS id FROM deg),
           |r0 AS (SELECT id,
           |  CAST(CASE WHEN id % 7 = 0 THEN 1000000 ELSE 0 END AS BIGINT) AS r
           |  FROM nodes),
           |$iters
           |SELECT id AS doc_id, r AS ppr FROM i$PPR_ITERS
           |ORDER BY doc_id""".stripMargin
      }) { (s, d) =>
      val jp = jaccardPairs(s, d)
      val edges = jp.select(col("doc_a").as("u"), col("doc_b").as("v"))
        .unionAll(jp.select(col("doc_b").as("u"), col("doc_a").as("v")))
        .persist()
      // personalizedPageRank is eager (checkpoint-backed result) — the
      // edge cache is dead the moment it returns (cf. q109)
      val ppr =
        try graft.operators.Graph.personalizedPageRank(
          edges, "u", "v", id => id % 7 === 0, iters = PPR_ITERS)
        finally edges.unpersist(blocking = false)
      ppr.select(col("id").as("doc_id"), col("r").as("ppr"))
        .orderBy("doc_id")
    },

    // ---- q143: triangle count + clustering coefficient ---------------------
    // Structural audit of the near-dup graph beyond components (q67) and
    // centrality (q109/q124): triangles distinguish tight clone-cliques
    // from chains of marginal matches (high clustering ⇒ a real duplicate
    // family; low ⇒ transitive borderline pairs CC would still merge).
    // One ordered 3-way self-join on the (a<b) edge list — each join is
    // keyed, fan-out bounded by the capped pair degree — then a per-node
    // unnest + count. Shares jpairs with q27/q67 so the graph cannot
    // drift. coefficient = 2·tri / (deg·(deg−1)), e-notation double
    // literals (decimal-literal gotcha, cf. q141).
    QueryDef(
      "q143_triangle_clustering",
      s"""WITH $PAIRS_SQL,
         |deg AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS deg FROM (
         |    SELECT doc_a AS id FROM jpairs
         |    UNION ALL SELECT doc_b FROM jpairs) GROUP BY id),
         |tri AS (SELECT e1.doc_a AS x, e1.doc_b AS y, e2.doc_b AS z
         |  FROM jpairs e1
         |  JOIN jpairs e2 ON e2.doc_a = e1.doc_b
         |  JOIN jpairs e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b),
         |nt AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n_tri FROM (
         |    SELECT unnest([x, y, z]) AS id FROM tri) GROUP BY id)
         |SELECT deg.id AS doc_id, deg.deg, COALESCE(nt.n_tri, 0) AS n_tri,
         |  CASE WHEN deg.deg < 2 THEN 0e0
         |       ELSE 2e0 * COALESCE(nt.n_tri, 0) / (deg.deg * (deg.deg - 1)) END
         |    AS clustering
         |FROM deg LEFT JOIN nt ON nt.id = deg.id
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val jp = jaccardPairs(s, d)
        .select(col("doc_a").as("a"), col("doc_b").as("b")).persist()
      val deg = jp.select(col("a").as("id")).unionAll(jp.select(col("b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("deg"))
      val tri = jp.as("e1")
        .join(jp.as("e2"), col("e2.a") === col("e1.b"))
        .join(jp.as("e3"), col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
        .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
      val nodeTri = tri.select(explode(array(col("x"), col("y"), col("z"))).as("id"))
        .groupBy("id").agg(count(lit(1)).as("n_tri"))
      val ntri = coalesce(col("n_tri"), lit(0L))
      deg.join(nodeTri, Seq("id"), "left")
        .select(col("id").as("doc_id"), col("deg"), ntri.as("n_tri"),
          when(col("deg") < 2, lit(0.0))
            .otherwise(lit(2.0) * ntri / (col("deg") * (col("deg") - 1)))
            .as("clustering"))
        .orderBy("doc_id")
    },

    // ---- q144: label-propagation communities -------------------------------
    // The third clustering lens on the match graph: synchronous label
    // propagation with a deterministic vote (most-frequent neighbor
    // label, ties to the smallest) for LPA_ROUNDS rounds. Each round is
    // one keyed join + one keyed vote aggregation (max_by on Spark, the
    // ROW_NUMBER formulation in the oracle — the q105 pattern of partial-
    // agg impl vs window-form oracle). Communities ≠ components: LPA
    // splits chains that CC merges, which is exactly the moderation a
    // dedup reviewer wants next to q67.
    QueryDef(
      "q144_label_propagation", LPA_MATCH_ORACLE) { (s, d) =>
      val jp = jaccardPairs(s, d)
        .select(col("doc_a").as("a"), col("doc_b").as("b"))
      // eager checkpoint, not persist: the LPA rounds run in a session
      // clone, which reads checkpoint blocks directly (cross-session
      // cache substitution is unreliable — see
      // Components.connectedComponents)
      val ed = jp.select(col("a").as("u"), col("b").as("v"))
        .unionAll(jp.select(col("b").as("u"), col("a").as("v")))
        .localCheckpoint()
      val labels =
        try lpaLabels(s, ed)
        finally ed.unpersist(blocking = false) // checkpoint blocks free on dereference; no-op kept for clarity
      labels.groupBy("lab")
        .agg(count(lit(1)).as("n_members"), min(col("id")).as("min_member"))
        .select(col("lab").as("community"), col("n_members"), col("min_member"))
        .orderBy("community")
    },

    // ---- q241: streaming incremental label propagation ---------------------
    // The q194/q200 versioned-state pattern applied to the community
    // view: match edges arrive (the staged Jaccard-pair files,
    // maxFilesPerTrigger=1) and every micro-batch re-derives the
    // LPA_ROUNDS community assignment of the graph seen so far — the
    // ingest-time shape of topic/community tracking over a growing
    // near-dup graph. State is the accumulated edge list in versioned
    // parquet (write v{batchId}, read previous — idempotent under
    // micro-batch replay); per batch the FULL fixed-round LPA re-runs
    // from singleton labels over state ∪ batch inside the narrow clone
    // (label warm-starting is deliberately NOT used — q144's contract is
    // exactly-LPA_ROUNDS-from-singletons, the fixed-round replay that
    // makes the iterative answer hash-checkable; a warm-started label
    // table over a grown edge set answers a different recurrence). The
    // final batch's communities hash-match batch q144's oracle VERBATIM.
    // Like q200 (and unlike q194's compressing CC state), LPA votes need
    // every edge each round — the honest per-batch cost is bounded
    // rounds over the current graph.
    QueryDef(
      "q241_stream_incremental_lpa", LPA_MATCH_ORACLE) { (s, d) =>
      val srcDir = stagedPairBatches(s, d)
      val store = clearedStore(d, "graft-q241-lpa-")
      val latestEdges =
        new java.util.concurrent.atomic.AtomicReference[String](null)
      val latestLabels =
        new java.util.concurrent.atomic.AtomicReference[String](null)
      val schema = s.read.parquet(srcDir).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(srcDir)
      graft.streaming.Streams.runForeachBatch(s, stream, (batch, batchId) => {
        val ss = batch.sparkSession
        // merge against the store version keyed by batchId-1, NOT the
        // in-memory latest pointer: if foreachBatch (at-least-once)
        // replays this batch after the pointer advanced, the pointer
        // would union the batch's edges on top of a state that already
        // contains them — and LPA votes are multiplicity-sensitive, so a
        // doubled edge changes the answer. Reading v{batchId-1} makes the
        // replay rewrite v{batchId} byte-identically instead (r15, ADVICE)
        val prevV = s"$store/edges_v${batchId - 1}"
        val merged =
          if (batchId > 0 && new java.io.File(prevV).isDirectory)
            ss.read.parquet(prevV).unionByName(
              batch.select(col("doc_a"), col("doc_b")))
          else batch.select(col("doc_a"), col("doc_b"))
        val edgesV = s"$store/edges_v$batchId"
        merged.write.mode("overwrite").parquet(edgesV)
        latestEdges.set(edgesV)
        val mp = ss.read.parquet(edgesV)
        val sym = mp.select(col("doc_a").as("u"), col("doc_b").as("v"))
          .unionAll(mp.select(col("doc_b").as("u"), col("doc_a").as("v")))
          .localCheckpoint()
        val labels =
          try lpaLabels(ss, sym)
          finally sym.unpersist(blocking = false)
        val labelsV = s"$store/labels_v$batchId"
        labels.write.mode("overwrite").parquet(labelsV)
        latestLabels.set(labelsV)
      })
      Option(latestLabels.get()) match {
        case Some(last) =>
          s.read.parquet(last)
            .groupBy("lab")
            .agg(count(lit(1)).as("n_members"), min(col("id")).as("min_member"))
            .select(col("lab").as("community"), col("n_members"),
              col("min_member"))
            .orderBy("community")
        case None =>
          // zero micro-batches fired — match batch q144's empty answer
          s.range(0).select(col("id").as("community"),
            col("id").as("n_members"), col("id").as("min_member"))
      }
    },

    // ---- q238: 2-core peel over the near-dup graph ---------------------------
    // Core decomposition — the graph-side spam/template-farm detector the
    // corpus graph family still lacked: nodes that survive iterated
    // "drop everything with degree < 2" sit in dense duplication
    // structure (rings and mats of near-dups), while chain/star periphery
    // peels away. KCORE_ROUNDS is FIXED (the q109/q144 discipline): both
    // engines unroll exactly 4 peel rounds — degrees over the surviving
    // edge set, drop nodes under 2, keep edges with both ends alive — and
    // report the round-4 state (in_core + residual degree), converged or
    // not, so the replay is structural, never a convergence race.
    //
    // 100 TB shape: each round is one map-side-combined degree agg + two
    // keyed semi-joins on the edge list — edge-linear, node-sized state,
    // per-round localCheckpoint truncating lineage (the q195 ladder);
    // all rounds run inside the conf-isolated narrowClone at measured
    // width, result rebound node-sized. No windows, no driver graph.
    QueryDef(
      "q238_kcore_peel", {
        // each e_{r-1} is referenced three times per round (degree agg +
        // both semi-join sides); DuckDB inlines CTEs by default, so the
        // plan re-expands the whole jpairs pipeline 3^r times and
        // exhausts spill at sf0.1 — MATERIALIZED pins each round once
        val rounds = (1 to KCORE_ROUNDS).map { r =>
          s"""d$r AS MATERIALIZED (SELECT u, COUNT(*) AS c FROM e${r - 1} GROUP BY u),
             |a$r AS MATERIALIZED (SELECT u FROM d$r WHERE c >= 2),
             |e$r AS MATERIALIZED (SELECT e.u, e.v FROM e${r - 1} e
             |        JOIN a$r x ON x.u = e.u JOIN a$r y ON y.u = e.v)""".stripMargin
        }.mkString(",\n")
        s"""WITH $PAIRS_SQL,
           |e0 AS MATERIALIZED (SELECT doc_a AS u, doc_b AS v FROM jpairs
           |       UNION ALL SELECT doc_b, doc_a FROM jpairs),
           |n0 AS (SELECT DISTINCT u FROM e0),
           |$rounds,
           |fd AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS c
           |       FROM e$KCORE_ROUNDS GROUP BY u)
           |SELECT n0.u AS node_id,
           |  CAST(CASE WHEN a$KCORE_ROUNDS.u IS NOT NULL THEN 1 ELSE 0 END
           |    AS BIGINT) AS in_core,
           |  CAST(COALESCE(fd.c, 0) AS BIGINT) AS core_deg
           |FROM n0
           |LEFT JOIN a$KCORE_ROUNDS ON a$KCORE_ROUNDS.u = n0.u
           |LEFT JOIN fd ON fd.u = n0.u
           |ORDER BY node_id""".stripMargin
      }) { (s, d) =>
      val jp = jaccardPairs(s, d)
        .select(col("doc_a").as("a"), col("doc_b").as("b"))
      val ed = jp.select(col("a").as("u"), col("b").as("v"))
        .unionAll(jp.select(col("b").as("u"), col("a").as("v")))
        .localCheckpoint()
      val peeled = try {
        val nEdges = ed.count()
        val w = graft.operators.Components.roundWidth(
          s.conf.get("spark.sql.shuffle.partitions").toInt, nEdges)
        val s2 = graft.operators.Components.narrowClone(s, w)
        val nodes0 = graft.operators.Components.rebind(ed, s2)
          .select("u").distinct().localCheckpoint()
        var e = graft.operators.Components.rebind(ed, s2)
          .repartition(col("u"))
        var alive = nodes0
        for (_ <- 1 to KCORE_ROUNDS) {
          alive = e.groupBy("u").agg(count(lit(1)).as("c"))
            .filter(col("c") >= 2).select("u").localCheckpoint()
          e = e.join(alive, "u")
            .join(alive.select(col("u").as("v")), "v")
            .select("u", "v").localCheckpoint()
        }
        val fd = e.groupBy("u").agg(count(lit(1)).as("c"))
        val out = nodes0
          .join(alive.select(col("u"), lit(1L).as("in_core")), Seq("u"), "left")
          .join(fd, Seq("u"), "left")
          .select(col("u").as("node_id"),
            coalesce(col("in_core"), lit(0L)).as("in_core"),
            coalesce(col("c"), lit(0L)).as("core_deg"))
        graft.operators.Components.rebind(out.localCheckpoint(), s)
      } finally ed.unpersist(blocking = false)
      peeled.orderBy("node_id")
    },

    // ---- q139: streaming top-k via per-batch partial top-k merge -----------
    // q136's exact-mergeability, exercised by the streaming engine: each
    // micro-batch computes its own per-source top-5 (k rows of state per
    // group) and appends those PARTIAL top-k rows to a store; the final
    // answer re-aggregates the stored partials with the same TopKRows —
    // exact merge means partial-of-partials IS the global top-k, so the
    // result hash-checks against the plain window oracle over the whole
    // table. State per batch is k rows per group, never the batch.
    QueryDef(
      "q139_stream_topk",
      """SELECT source, rk, nch, did FROM (
        |  SELECT source, CAST(n_chars AS DOUBLE) AS nch, doc_id AS did,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rk
        |  FROM documents)
        |WHERE rk <= 5
        |ORDER BY source, rk""".stripMargin) { (s, d) =>
      val topk = udaf(new graft.functions.TopKRows(5))
      val srcDir = stagedDocBatches(s, d)
      val store = clearedStore(d, "graft-q139-topk-")
      val schema = s.read.parquet(srcDir).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(srcDir)
      graft.streaming.Streams.runForeachBatch(s, stream, (batch, batchId) =>
        batch.groupBy("source")
          .agg(topk(col("n_chars").cast("double"), col("doc_id"), col("doc_id")).as("tk"))
          .select(col("source"), explode(col("tk")).as("row"))
          .select(col("source"), col("row._1").as("nch"), col("row._2").as("did"))
          .withColumn("batch_id", lit(batchId))
          // idempotent under micro-batch retry (foreachBatch is
          // at-least-once): dynamic overwrite replaces ONLY this batch's
          // partition, so a replayed batch can never double its rows into
          // the store's cell-wise/union merge
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(store.toString))
      s.read.parquet(store.toString)
        .groupBy("source")
        .agg(topk(col("nch"), col("did"), col("did")).as("tk"))
        .select(col("source"), posexplode(col("tk")).as(Seq("pos", "row")))
        .select(col("source"), (col("pos") + 1).cast("long").as("rk"),
          col("row._1").as("nch"), col("row._2").as("did"))
        .orderBy("source", "rk")
    },

    // ---- q131: prefix-filtered set-similarity join (PPJoin family) ---------
    // The PRINCIPLED scale path for q27's gram-Jaccard pairs: order each
    // doc's grams by global rarity (df, gram) and index only the first
    // n - ceil(θ·n) + 1 of them — if J(a,b) ≥ θ then common ≥ ceil(θ·|a|)
    // and ≥ ceil(θ·|b|), so the two prefixes MUST share a gram (Vernica et
    // al.'s prefix principle). Candidates come from a self-join on the
    // RAREST grams only (small buckets by construction — no df cap, no
    // recall loss), then only candidates pay the exact intersect-count.
    // Same answer as the brute-force oracle, guaranteed — where q27's
    // MAX_GRAM_DF cap trades completeness for the bound, the prefix
    // filter gets both. DedupSpec pins candidates < brute-force pairs.
    QueryDef(
      "q131_prefix_join",
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
         |          WHERE len(string_split(text, ' ')) >= 3),
         |grams AS (SELECT DISTINCT doc_id,
         |            unnest(list_transform(range(1, len(t) - 1),
         |                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS gram
         |          FROM toks),
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
         |co AS (SELECT g1.doc_id AS doc_a, g2.doc_id AS doc_b, COUNT(*) AS common
         |       FROM grams g1 JOIN grams g2
         |         ON g1.gram = g2.gram AND g1.doc_id < g2.doc_id
         |       GROUP BY g1.doc_id, g2.doc_id)
         |SELECT doc_a, doc_b, common * 1.0 / (sa.n + sb.n - common) AS jaccard
         |FROM co
         |JOIN sizes sa ON sa.doc_id = doc_a
         |JOIN sizes sb ON sb.doc_id = doc_b
         |WHERE common * 1.0 / (sa.n + sb.n - common) >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
      prefixJoinPairs(s, d)
        .select(col("doc_a"), col("doc_b"), col("jaccard"))
        .orderBy("doc_a", "doc_b")
    },

    // ---- q161: asymmetric containment join (quote/subset detection) --------
    // Jaccard (q27/q131) misses the quote case: a short doc copied INTO a
    // long one scores low symmetric similarity but containment
    // C(a->b) = |G(a) ∩ G(b)| / |G(a)| = 1. The prefix principle carries
    // over asymmetrically: if C >= θ then common >= ceil(θ·|a|), which
    // cannot fit in a's dropped suffix of ceil(θ·|a|) - 1 grams — so
    // probing only a's |a| - ceil(θ·|a|) + 1 RAREST grams against the
    // full posting list is lossless, and join cost is bounded by the df
    // of rare grams, not all-pairs. Verification then counts exact
    // overlap for candidates only; the oracle is UNCAPPED brute force.
    // The fixture corpus has no cross-doc quotes, so every doc_id % 7 == 0
    // doc PLANTS one: its first 24 tokens re-enter as doc_id + 1000000,
    // the same augmentation on both engines — each planted quote MUST
    // surface with containment 10000 bp exactly.
    QueryDef(
      "q161_containment_join",
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000 AS doc_id,
         |    array_to_string(string_split(text, ' ')[1:24], ' ') AS text
         |  FROM documents WHERE doc_id % 7 = 0),
         |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM corpus
         |          WHERE len(string_split(text, ' ')) >= 3),
         |grams AS (SELECT DISTINCT doc_id,
         |            unnest(list_transform(range(1, len(t) - 1),
         |                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS gram
         |          FROM toks),
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
         |co AS (SELECT a.doc_id AS contained_id, b.doc_id AS container_id,
         |         COUNT(*) AS common
         |       FROM grams a JOIN grams b
         |         ON a.gram = b.gram AND a.doc_id <> b.doc_id
         |       GROUP BY a.doc_id, b.doc_id)
         |SELECT contained_id, container_id, CAST(common AS BIGINT) AS common,
         |  CAST(sa.n AS BIGINT) AS na,
         |  CAST(common * 10000 // sa.n AS BIGINT) AS cont_bp
         |FROM co JOIN sizes sa ON sa.doc_id = contained_id
         |WHERE common * 10 >= sa.n * 8
         |ORDER BY contained_id, container_id""".stripMargin) { (s, d) =>
      val base = Tables.documentsSpread(s, d)
      val corpus = base.select(col("doc_id"), col("text")).unionByName(
        base.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + lit(1000000L)).as("doc_id"),
            concat_ws(" ", slice(split(col("text"), " "), 1, 24)).as("text")))
      val t = col("t")
      val grams = corpus
        .select(col("doc_id"), split(col("text"), " ").as("t"))
        .filter(size(t) >= 3)
        .select(col("doc_id"),
          explode(array_distinct(transform(
            sequence(lit(1), size(t) - 2),
            i => concat_ws(" ", element_at(t, i), element_at(t, i + 1), element_at(t, i + 2))
          ))).as("gram"))
        .persist()
      val sizes = grams.groupBy("doc_id").agg(count(lit(1)).as("na"))
      val dfc = grams.groupBy("gram").agg(count(lit(1)).as("__df"))
      // ceil(0.8·n) = (8n + 9) div 10, all integer
      val pref = grams.join(dfc, "gram")
        .join(sizes.select(col("doc_id"), col("na").as("__n")), "doc_id")
        .withColumn("__rk", row_number().over(
          Window.partitionBy("doc_id").orderBy(col("__df"), col("gram"))))
        .filter(col("__rk") <= col("__n") - expr("(__n * 8 + 9) div 10") + 1)
        .select(col("doc_id").as("contained_id"), col("gram"))
      val cands = pref
        .join(grams.select(col("doc_id").as("container_id"), col("gram")), "gram")
        .filter(col("contained_id") =!= col("container_id"))
        .select("contained_id", "container_id").distinct()
      val common = cands
        .join(grams.select(col("doc_id").as("contained_id"), col("gram")), "contained_id")
        .join(grams.select(col("doc_id").as("container_id"), col("gram")),
          Seq("container_id", "gram"))
        .groupBy("contained_id", "container_id").agg(count(lit(1)).as("common"))
      common
        .join(sizes.select(col("doc_id").as("contained_id"), col("na")), "contained_id")
        .filter(col("common") * 10 >= col("na") * 8)
        .select(col("contained_id"), col("container_id"), col("common"), col("na"),
          expr("common * 10000 div na").as("cont_bp"))
        .orderBy("contained_id", "container_id")
    },

    // ---- q164: Heaps-law vocabulary growth audit ---------------------------
    // The data-card curve behind vocab/tokenizer planning: distinct types
    // seen in the first N tokens of the corpus, on an N grid. The type
    // unit is the word 3-GRAM (the fixture's token vocabulary is a
    // closed 31-word set that saturates by N=1000 — gram types keep
    // growing like real text). "First N tokens" needs a global token
    // order — exactly GlobalIds.prefixSum (q163's backbone) on per-doc
    // token counts: each doc learns the token mass strictly before it in
    // doc_id order, a gram's global position is that offset + its start
    // index, and a type's FIRST position is one keyed min-agg.
    // vocab(N) = types with first_pos <= N — a broadcast grid join over
    // the gram-type table, never the corpus. No one-reducer window
    // anywhere; the oracle computes the same curve from a cumulative
    // window.
    QueryDef(
      "q164_vocab_growth",
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |o AS (SELECT doc_id, len(t) AS ntok FROM d),
         |c AS (SELECT doc_id,
         |    COALESCE(SUM(ntok) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
         |  FROM o),
         |gr AS (SELECT doc_id, u.i AS pos, u.g AS g FROM (
         |    SELECT doc_id, unnest(list_transform(range(1, len(t) - 1),
         |      i -> {i: i, g: t[i] || ' ' || t[i+1] || ' ' || t[i+2]})) AS u
         |    FROM d WHERE len(t) >= 3)),
         |fp AS (SELECT gr.g, MIN(c.cumb + gr.pos) AS first_pos
         |       FROM gr JOIN c USING (doc_id) GROUP BY gr.g)
         |SELECT CAST(gd.n AS BIGINT) AS n,
         |  CAST(SUM(CASE WHEN fp.first_pos <= gd.n THEN 1 ELSE 0 END) AS BIGINT) AS vocab
         |FROM (VALUES (1000), (5000), (10000), (50000), (100000), (500000)) AS gd(n)
         |CROSS JOIN fp
         |GROUP BY gd.n
         |ORDER BY n""".stripMargin) { (s, d) =>
      import s.implicits._
      val t = col("t")
      val docs = Tables.documentsSpread(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("t"))
      val off = graft.operators.GlobalIds.prefixSum(
        docs.select(col("doc_id"), size(t).as("ntok")),
        Seq(col("doc_id")), "ntok", "cumb")
      val first = docs
        .filter(size(t) >= 3)
        .select(col("doc_id"), explode(transform(
          sequence(lit(1), size(t) - 2),
          i => struct(i.as("pos"), concat_ws(" ",
            element_at(t, i), element_at(t, i + 1), element_at(t, i + 2)).as("g"))
        )).as("u"))
        .select(col("doc_id"), col("u.pos").as("pos"), col("u.g").as("g"))
        .join(off.select("doc_id", "cumb"), "doc_id")
        .groupBy("g")
        .agg(min(col("cumb") + col("pos")).as("first_pos"))
      val grid = Seq(1000L, 5000L, 10000L, 50000L, 100000L, 500000L).toDF("n")
      first.crossJoin(broadcast(grid))
        .groupBy("n")
        .agg(sum(when(col("first_pos") <= col("n"), 1L).otherwise(0L)).as("vocab"))
        .orderBy("n")
    },

    // ---- q165: Zipf slope fit (log-log rank-frequency regression) ----------
    // q164's companion data-card number: how Zipfian is the corpus? Least-
    // squares slope of ln(freq) on ln(rank) over the gram-type table.
    // Rank assignment uses GlobalIds.assign on (count DESC, gram) — the
    // no-one-reducer ranking from q157, here over the Zipf-bounded TYPE
    // table — and all four regression sums are exact DECIMAL(38,20)
    // ledgers of identically-evaluated double terms (the q93/q120
    // pattern), so partial-agg order can't move an ulp; slope and
    // intercept round once to DECIMAL(18,8) at the end. A healthy crawl
    // sits near slope -1; generated/templated text drifts shallow.
    QueryDef(
      "q165_zipf_slope",
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |gr AS (SELECT u AS g FROM (
         |    SELECT unnest(list_transform(range(1, len(t) - 1),
         |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS u
         |    FROM d WHERE len(t) >= 3)),
         |cnt AS (SELECT g, COUNT(*) AS c FROM gr GROUP BY g),
         |r AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, g) AS rk FROM cnt),
         |s AS (SELECT COUNT(*) AS n,
         |    SUM(CAST(ln(rk) AS DECIMAL(38,20))) AS sx,
         |    SUM(CAST(ln(c) AS DECIMAL(38,20))) AS sy,
         |    SUM(CAST(ln(rk) * ln(c) AS DECIMAL(38,20))) AS sxy,
         |    SUM(CAST(ln(rk) * ln(rk) AS DECIMAL(38,20))) AS sxx
         |  FROM r),
         |f AS (SELECT n,
         |    (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
         |      (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS sl,
         |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
         |  FROM s)
         |SELECT CAST(n AS BIGINT) AS n_types,
         |  CAST(CAST(sl AS DECIMAL(18,8)) AS DOUBLE) AS slope,
         |  CAST(CAST((syd - sl * sxd) / n AS DECIMAL(18,8)) AS DOUBLE) AS intercept
         |FROM f""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.types.DecimalType
      val t = col("t")
      val cnt = Tables.documentsSpread(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("t"))
        .filter(size(t) >= 3)
        .select(explode(transform(
          sequence(lit(1), size(t) - 2),
          i => concat_ws(" ", element_at(t, i), element_at(t, i + 1), element_at(t, i + 2))
        )).as("g"))
        .groupBy("g").agg(count(lit(1)).as("c"))
      val ranked = graft.operators.GlobalIds.assign(
        cnt, Seq(col("c").desc, col("g")), "rk")
      val sums = ranked.agg(
        count(lit(1)).as("n"),
        sum(log(col("rk")).cast(DecimalType(38, 20))).as("sx"),
        sum(log(col("c")).cast(DecimalType(38, 20))).as("sy"),
        sum((log(col("rk")) * log(col("c"))).cast(DecimalType(38, 20))).as("sxy"),
        sum((log(col("rk")) * log(col("rk"))).cast(DecimalType(38, 20))).as("sxx"))
      sums
        .select(col("n"),
          ((col("n") * col("sxy").cast("double") -
            col("sx").cast("double") * col("sy").cast("double")) /
            (col("n") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double"))).as("sl"),
          col("sx").cast("double").as("sxd"), col("sy").cast("double").as("syd"))
        .select(col("n").as("n_types"),
          col("sl").cast(DecimalType(18, 8)).cast("double").as("slope"),
          (((col("syd") - col("sl") * col("sxd")) / col("n")))
            .cast(DecimalType(18, 8)).cast("double").as("intercept"))
    },

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

    // ---- q170: edit-distance similarity join (PassJoin segments) -----------
    // Typo-cluster mining over the part-name dictionary: every unordered
    // name pair within edit distance 1, with how many parts each spelling
    // covers — the merge-or-flag decision table for entity normalization.
    // Algorithm: [[graft.operators.EditDistance.passJoin]] — k+1-segment
    // blocking with an equality candidate join and exact levenshtein
    // verify (100% recall by pigeonhole; EditDistanceSpec proves it
    // against brute force over random strings at k = 1 and 2). Distinct
    // from q107's deletion-neighborhood blocking: segments index k+1 short
    // keys per string instead of len+1 variants of len-1 chars, so the
    // index stays linear in dictionary bytes for long strings and k > 1.
    // The dictionary is distinct-aggregated FIRST (names, not rows, drive
    // the join: at 100 TB the part table shrinks to its name dictionary
    // before any pair work), and Spark/DuckDB `levenshtein` share plain
    // Levenshtein semantics, so the blocked result hash-matches the
    // brute-force oracle.
    QueryDef(
      "q170_edit_distance_join",
      """WITH dict AS (
        |  SELECT p_name AS name, COUNT(*) AS cnt FROM part GROUP BY p_name)
        |SELECT a.name AS name_a, b.name AS name_b,
        |  CAST(levenshtein(a.name, b.name) AS BIGINT) AS ed,
        |  CAST(a.cnt AS BIGINT) AS parts_a, CAST(b.cnt AS BIGINT) AS parts_b
        |FROM dict a JOIN dict b
        |  ON a.name < b.name
        | AND abs(length(a.name) - length(b.name)) <= 1
        | AND levenshtein(a.name, b.name) <= 1
        |ORDER BY name_a, name_b""".stripMargin) { (s, d) =>
      val dict = Tables.part(s, d)
        .groupBy(col("p_name").as("name"))
        .agg(count(lit(1)).as("cnt"))
        .persist()
      val pairs = graft.operators.EditDistance.passJoin(dict, "name", "name", 1)
        .select(col("ida").as("name_a"), col("idb").as("name_b"), col("ed"))
      pairs
        .join(dict.select(col("name").as("name_a"), col("cnt").as("parts_a")), "name_a")
        .join(dict.select(col("name").as("name_b"), col("cnt").as("parts_b")), "name_b")
        .select("name_a", "name_b", "ed", "parts_a", "parts_b")
        .orderBy("name_a", "name_b")
    },

    // ---- q177: sorted-neighborhood blocking (sort-based candidate gen) -----
    // The third classic blocking family next to LSH (q28) and prefix
    // filtering (q131): normalize, SORT by a blocking key, and compare only
    // rows within a fixed window w of each other in sort order. Candidates
    // are linear in n·w instead of quadratic, and the sort is ONE balanced
    // range exchange (GlobalIds.assign — never a one-reducer ROW_NUMBER);
    // the window join is w cheap rank-equi-joins (rn+i = rn), not an
    // inequality fan-out. Candidates then face the SAME exact-Jaccard
    // verify as every other blocking path, so precision is exact by
    // construction and only recall depends on the key. Key = first 16
    // alphanumeric chars of the lowercased text — near-dups that share a
    // prefix sort adjacent.
    QueryDef(
      "q177_sorted_neighborhood",
      s"""WITH $GRAMS_SQL,
         |sorted AS (
         |  SELECT doc_id,
         |    ROW_NUMBER() OVER (ORDER BY
         |      substring(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), 1, 16),
         |      doc_id) AS rn
         |  FROM documents),
         |cand AS (
         |  SELECT DISTINCT LEAST(a.doc_id, b.doc_id) AS doc_a,
         |    GREATEST(a.doc_id, b.doc_id) AS doc_b
         |  FROM sorted a JOIN sorted b ON b.rn - a.rn BETWEEN 1 AND $SN_W),
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
         |common AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS common
         |           FROM cand c
         |           JOIN grams g1 ON g1.doc_id = c.doc_a
         |           JOIN grams g2 ON g2.doc_id = c.doc_b AND g2.gram = g1.gram
         |           GROUP BY c.doc_a, c.doc_b)
         |SELECT doc_a, doc_b,
         |  common * 1.0 / (sa.n + sb.n - common) AS jaccard
         |FROM common
         |JOIN sizes sa ON sa.doc_id = doc_a
         |JOIN sizes sb ON sb.doc_id = doc_b
         |WHERE common * 1.0 / (sa.n + sb.n - common) >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
      val key = substring(
        regexp_replace(lower(col("text")), "[^a-z0-9]", ""), 1, 16)
      val sorted = graft.operators.GlobalIds.assign(
        Tables.documentsSpread(s, d).select(col("doc_id"), key.as("k")),
        Seq(col("k"), col("doc_id")), "rn")
        .select("doc_id", "rn")
        // both sides of the w rank-equi-joins scan it; localCheckpoint, not
        // persist — no cache entry to leak, blocks free on GC (cf. GlobalIds)
        .localCheckpoint()
      val cand = sorted
        .select(col("doc_id").as("id_a"),
          explode(array((1 to SN_W).map(i => col("rn") + i): _*)).as("rn"))
        .join(sorted.withColumnRenamed("doc_id", "id_b"), "rn")
        .select(least(col("id_a"), col("id_b")).as("doc_a"),
          greatest(col("id_a"), col("id_b")).as("doc_b"))
        .distinct()
      val grams = sparkGrams(s, d)
      val sizes = grams.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val common = cand
        .join(grams.select(col("doc_id").as("doc_a"), col("gram")), "doc_a")
        .join(grams.select(col("doc_id").as("doc_b"), col("gram")),
          Seq("doc_b", "gram"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("common"))
      val jc = col("common") * lit(1.0) / (col("na") + col("nb") - col("common"))
      common
        .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
        .select(col("doc_a"), col("doc_b"), jc.as("jaccard"))
        .filter(jc >= 0.5)
        .orderBy("doc_a", "doc_b")
    },

    // ---- q179: mojibake / encoding-damage gate (planted ground truth) ------
    // Real web corpora carry UTF-8-decoded-as-Latin-1 double encodings
    // ('é' → 'Ã©'), replacement chars and stray C0 controls; a training
    // pipeline gates them out before tokenization. The fixture corpus is
    // clean, so damage is PLANTED deterministically (docs with
    // doc_id % 7 == 0 get the classic double-encode: every 'e' → 'Ã©',
    // PLUS one appended ' Ã©' token so the plant is content-independent —
    // a planted doc carries damage even if a regenerated fixture doc has
    // no 'e' at all) and the detector must flag exactly the planted set —
    // same planted-ground-truth pattern as q65/q76/q88. Detection is pure
    // per-row expression work (length-difference counting of damage
    // patterns — no regex engine divergence: counts come from global
    // replace), aggregated per source.
    QueryDef(
      "q179_mojibake_gate",
      """WITH damaged AS (
        |  SELECT doc_id, source,
        |    CASE WHEN doc_id % 7 = 0 THEN replace(text, 'e', 'Ã©') || ' Ã©' ELSE text END AS text,
        |    CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END AS planted
        |  FROM documents),
        |scored AS (
        |  SELECT doc_id, source, planted,
        |    length(text) - length(replace(text, 'Ã', '')) AS n_moji,
        |    length(text) - length(replace(replace(text, chr(65533), ''), chr(7), '')) AS n_repl
        |  FROM damaged)
        |SELECT source,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(planted) AS BIGINT) AS n_planted,
        |  CAST(SUM(CASE WHEN n_moji + n_repl > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
        |  CAST(SUM(CASE WHEN (n_moji + n_repl > 0) <> (planted = 1) THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch,
        |  CAST(SUM(n_moji) AS BIGINT) AS total_moji
        |FROM scored
        |GROUP BY source
        |ORDER BY source""".stripMargin) { (s, d) =>
      val damaged = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          when(col("doc_id") % 7 === 0,
            concat(regexp_replace(col("text"), "e", "Ã©"), lit(" Ã©")))
            .otherwise(col("text")).as("text"),
          when(col("doc_id") % 7 === 0, 1L).otherwise(0L).as("planted"))
      // translate, not regexp_replace: literal single-char removal, no
      // regex semantics in the hot loop -- count = length difference
      val nMoji = (length(col("text")) -
        length(translate(col("text"), "\u00c3", ""))).as("n_moji")
      val nRepl = (length(col("text")) -
        length(translate(col("text"), "\ufffd\u0007", ""))).as("n_repl")
      damaged.select(col("source"), col("planted"), nMoji, nRepl)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("planted")).as("n_planted"),
          sum(when(col("n_moji") + col("n_repl") > 0, 1L).otherwise(0L))
            .as("n_flagged"),
          sum(when((col("n_moji") + col("n_repl") > 0) =!= (col("planted") === 1), 1L)
            .otherwise(0L)).as("n_mismatch"),
          sum(col("n_moji")).as("total_moji"))
        .orderBy("source")
    },

    // ---- q186: Fellegi–Sunter probabilistic record linkage -----------------
    // The probabilistic scoring layer entity resolution runs AFTER blocking
    // (Fellegi & Sunter, "A theory for record linkage", JASA 1969 — public
    // literature): each candidate pair's field-agreement pattern is scored
    // by a likelihood ratio Π m_f/u_f (agree) · (1-m_f)/(1-u_f) (disagree),
    // where u_f — the chance two NON-matching records agree on field f —
    // is estimated EXACTLY from the data's value-frequency distribution
    // (u_f = Σ_v n_v(n_v-1) / N(N-1), pure BIGINT arithmetic), and m_f —
    // the chance true matches agree — is a model constant (19/20, 4/5,
    // 9/10 for nation/segment/balance-band). Ground truth is PLANTED on
    // the customer table (cf. q107/q179): every custkey%5==0 customer gets
    // a "dirty twin" at +1e6 (last name char replaced, attributes copied,
    // segment perturbed for half of them — a true match the scorer must
    // accept even with one field disagreeing) and every custkey%7==3 gets
    // an "impostor" at +2e6 (IDENTICAL name, all attributes changed — a
    // distinct entity sharing a name, which name-only matching would
    // falsely merge and the FS score must reject). Candidates come from
    // standard equality blocking on name-minus-last-char — the 4th classic
    // blocking family next to LSH (q28), prefix filtering (q131) and
    // sorted neighborhood (q177); lossless for BOTH planted classes by
    // construction (twins differ only in the last char, impostors not at
    // all). Output is the (pair_class × decision) confusion matrix with
    // exact basis-point score sums.
    //
    // Cross-engine bit-stability: LR is a product of three quotients of
    // exact BIGINT-derived doubles (< 2^53, conversion exact) evaluated in
    // fixed left-associative order — the q133 raw-IEEE-quotient
    // discipline — then floored to integer basis points.
    //
    // 100 TB shape: candidate generation is ONE keyed shuffle on the
    // blocking key (block-size skew is exactly what q171's profiler
    // pre-flights); the u-model is three keyed aggs reduced to one
    // broadcast scalar row; scoring is map-side expression work on
    // candidates. Nothing is quadratic in the table — only in block
    // occupancy, which the blocking key bounds.
    QueryDef(
      "q186_record_linkage",
      """WITH recs AS (
        |  SELECT c_custkey AS id, c_name AS name, c_nationkey AS nation,
        |    c_mktsegment AS seg, CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS band
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey + 1000000, substring(c_name, 1, length(c_name) - 1) || 'Z',
        |    c_nationkey,
        |    CASE WHEN c_custkey % 10 = 0 THEN c_mktsegment ELSE 'Z' || c_mktsegment END,
        |    CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT)
        |  FROM customer WHERE c_custkey % 5 = 0
        |  UNION ALL
        |  SELECT c_custkey + 2000000, c_name, (c_nationkey + 1) % 25,
        |    'X' || c_mktsegment,
        |    CAST(FLOOR((10000.0 - c_acctbal) / 1000.0) AS BIGINT)
        |  FROM customer WHERE c_custkey % 7 = 3),
        |scal AS (
        |  SELECT CAST(n * (n - 1) AS BIGINT) AS uden, un, us, ub
        |  FROM (SELECT COUNT(*) AS n FROM recs),
        |    (SELECT CAST(SUM(c * (c - 1)) AS BIGINT) AS un
        |     FROM (SELECT COUNT(*) AS c FROM recs GROUP BY nation)),
        |    (SELECT CAST(SUM(c * (c - 1)) AS BIGINT) AS us
        |     FROM (SELECT COUNT(*) AS c FROM recs GROUP BY seg)),
        |    (SELECT CAST(SUM(c * (c - 1)) AS BIGINT) AS ub
        |     FROM (SELECT COUNT(*) AS c FROM recs GROUP BY band))),
        |pairs AS (
        |  SELECT a.id AS id_a, b.id AS id_b,
        |    a.nation = b.nation AS agr_n, a.seg = b.seg AS agr_s,
        |    a.band = b.band AS agr_b
        |  FROM recs a JOIN recs b
        |    ON substring(a.name, 1, length(a.name) - 1)
        |     = substring(b.name, 1, length(b.name) - 1)
        |   AND a.id < b.id),
        |scored AS (
        |  SELECT
        |    CASE WHEN id_b - id_a = 1000000 AND id_a % 5 = 0
        |           AND id_a < 1000000 THEN 'twin'
        |         WHEN id_b - id_a = 2000000 AND id_a % 7 = 3
        |           AND id_a < 1000000 THEN 'impostor'
        |         ELSE 'background' END AS pair_class,
        |    (CASE WHEN agr_n THEN CAST(uden AS DOUBLE) / CAST(un AS DOUBLE) * (19.0 / 20.0)
        |          ELSE CAST(uden AS DOUBLE) / CAST(uden - un AS DOUBLE) * (1.0 / 20.0) END)
        |    * (CASE WHEN agr_s THEN CAST(uden AS DOUBLE) / CAST(us AS DOUBLE) * (4.0 / 5.0)
        |            ELSE CAST(uden AS DOUBLE) / CAST(uden - us AS DOUBLE) * (1.0 / 5.0) END)
        |    * (CASE WHEN agr_b THEN CAST(uden AS DOUBLE) / CAST(ub AS DOUBLE) * (9.0 / 10.0)
        |            ELSE CAST(uden AS DOUBLE) / CAST(uden - ub AS DOUBLE) * (1.0 / 10.0) END)
        |      AS lr
        |  FROM pairs, scal)
        |SELECT pair_class,
        |  CASE WHEN lr >= 40.0 THEN 'match' WHEN lr >= 1.0 THEN 'possible'
        |       ELSE 'non_match' END AS decision,
        |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  CAST(SUM(CAST(FLOOR(lr * 10000.0) AS BIGINT)) AS BIGINT) AS sum_score_bp,
        |  CAST(MIN(CAST(FLOOR(lr * 10000.0) AS BIGINT)) AS BIGINT) AS min_score_bp,
        |  CAST(MAX(CAST(FLOOR(lr * 10000.0) AS BIGINT)) AS BIGINT) AS max_score_bp
        |FROM scored
        |GROUP BY pair_class, decision
        |ORDER BY pair_class, decision""".stripMargin) { (s, d) =>
      import graft.operators.Linkage
      val cust = Tables.customer(s, d)
      val recs = Linkage.baseRecords(cust)
        .unionByName(Linkage.dirtyRecords(cust))
        .unionByName(Linkage.impostorRecords(cust))
      val scal = Linkage.uModel(recs)
      def side(suf: String) = recs.select(Linkage.blockKey.as("k"),
        col("id").as(s"id_$suf"), col("nation").as(s"n_$suf"),
        col("seg").as(s"s_$suf"), col("band").as(s"b_$suf"))
      val pairs = side("a").join(side("b"), Seq("k"))
        .filter(col("id_a") < col("id_b"))
        .crossJoin(broadcast(scal))
      val lr = Linkage.likelihoodRatio
      Linkage.confusion(pairs.select(
        Linkage.pairClass.as("pair_class"),
        Linkage.decisionOf(lr).as("decision"),
        floor(lr * 10000.0).as("bp")))
    },

    // ---- q190: golden-record survivorship (entity-resolution capstone) -----
    // The step entity resolution exists FOR: q186's match decisions become
    // transitive clusters (operators.Components — the same O(log² n)
    // keyed-rounds CC as q67, here over the FS 'match' pairs), and each
    // cluster collapses to ONE golden record by explicit survivorship
    // rules: canonical id = min member id (the CC convention), nation from
    // the canonical record, segment by majority vote (tie → lexicographic
    // — a deterministic rule, not arg_max luck), band = max. Records that
    // match nothing survive as their own singleton cluster. The oracle
    // replays CC as a recursive-CTE closure (q67's trick, feasible at test
    // SFs) over the identical match set.
    //
    // 100 TB shape: matches are the FS-gated candidate pairs (linear via
    // blocking), CC is keyed rounds with measured widths, and survivorship
    // is two keyed aggs + one cluster-partitioned window (clusters are
    // near-dup-group-sized, never corpus-sized) + two joins back on
    // cluster_id. Nothing quadratic, no driver-side graph.
    QueryDef(
      "q190_golden_record",
      s"""WITH RECURSIVE recs AS (
         |  SELECT c_custkey AS id, c_name AS name, c_nationkey AS nation,
         |    c_mktsegment AS seg, CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS band
         |  FROM customer
         |  UNION ALL
         |  SELECT c_custkey + 1000000, substring(c_name, 1, length(c_name) - 1) || 'Z',
         |    c_nationkey,
         |    CASE WHEN c_custkey % 10 = 0 THEN c_mktsegment ELSE 'Z' || c_mktsegment END,
         |    CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT)
         |  FROM customer WHERE c_custkey % 5 = 0
         |  UNION ALL
         |  SELECT c_custkey + 2000000, c_name, (c_nationkey + 1) % 25,
         |    'X' || c_mktsegment,
         |    CAST(FLOOR((10000.0 - c_acctbal) / 1000.0) AS BIGINT)
         |  FROM customer WHERE c_custkey % 7 = 3),
         |scal AS (
         |  SELECT CAST(n * (n - 1) AS BIGINT) AS uden, un, us, ub
         |  FROM (SELECT COUNT(*) AS n FROM recs),
         |    (SELECT CAST(SUM(c * (c - 1)) AS BIGINT) AS un
         |     FROM (SELECT COUNT(*) AS c FROM recs GROUP BY nation)),
         |    (SELECT CAST(SUM(c * (c - 1)) AS BIGINT) AS us
         |     FROM (SELECT COUNT(*) AS c FROM recs GROUP BY seg)),
         |    (SELECT CAST(SUM(c * (c - 1)) AS BIGINT) AS ub
         |     FROM (SELECT COUNT(*) AS c FROM recs GROUP BY band))),
         |cpairs AS (
         |  SELECT a.id AS id_a, b.id AS id_b,
         |    a.nation = b.nation AS agr_n, a.seg = b.seg AS agr_s,
         |    a.band = b.band AS agr_b
         |  FROM recs a JOIN recs b
         |    ON substring(a.name, 1, length(a.name) - 1)
         |     = substring(b.name, 1, length(b.name) - 1)
         |   AND a.id < b.id),
         |matches AS (
         |  SELECT id_a, id_b FROM (
         |    SELECT id_a, id_b,
         |      (CASE WHEN agr_n THEN CAST(uden AS DOUBLE) / CAST(un AS DOUBLE) * (19.0 / 20.0)
         |            ELSE CAST(uden AS DOUBLE) / CAST(uden - un AS DOUBLE) * (1.0 / 20.0) END)
         |      * (CASE WHEN agr_s THEN CAST(uden AS DOUBLE) / CAST(us AS DOUBLE) * (4.0 / 5.0)
         |              ELSE CAST(uden AS DOUBLE) / CAST(uden - us AS DOUBLE) * (1.0 / 5.0) END)
         |      * (CASE WHEN agr_b THEN CAST(uden AS DOUBLE) / CAST(ub AS DOUBLE) * (9.0 / 10.0)
         |              ELSE CAST(uden AS DOUBLE) / CAST(uden - ub AS DOUBLE) * (1.0 / 10.0) END)
         |        AS lr
         |    FROM cpairs, scal)
         |  WHERE lr >= 40.0),
         |und AS (SELECT id_a AS u, id_b AS v FROM matches
         |        UNION ALL
         |        SELECT id_b AS u, id_a AS v FROM matches),
         |reach(u, v) AS (
         |  SELECT u, v FROM und
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u),
         |comp AS (SELECT u AS id, least(u, MIN(v)) AS cluster_id
         |         FROM reach GROUP BY u),
         |members AS (
         |  SELECT r.id, COALESCE(c.cluster_id, r.id) AS cluster_id,
         |    r.nation, r.seg, r.band
         |  FROM recs r LEFT JOIN comp c ON c.id = r.id),
         |segc AS (SELECT cluster_id, seg, COUNT(*) AS cnt
         |         FROM members GROUP BY cluster_id, seg),
         |segw AS (SELECT cluster_id, seg,
         |    ROW_NUMBER() OVER (PARTITION BY cluster_id
         |                       ORDER BY cnt DESC, seg) AS rn
         |  FROM segc),
         |agg AS (SELECT cluster_id,
         |    CAST(COUNT(*) AS BIGINT) AS n_members,
         |    CAST(MAX(band) AS BIGINT) AS band_max,
         |    CAST(SUM(CASE WHEN id >= 1000000 AND id < 2000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_twin_members,
         |    CAST(SUM(CASE WHEN id >= 2000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_impostor_members
         |  FROM members GROUP BY cluster_id)
         |SELECT a.cluster_id, a.n_members,
         |  CAST(r.nation AS BIGINT) AS canonical_nation,
         |  s.seg AS golden_seg, a.band_max,
         |  a.n_twin_members, a.n_impostor_members
         |FROM agg a
         |JOIN recs r ON r.id = a.cluster_id
         |JOIN segw s ON s.cluster_id = a.cluster_id AND s.rn = 1
         |ORDER BY a.cluster_id""".stripMargin) { (s, d) =>
      import graft.operators.{Components, Linkage}
      val cust = Tables.customer(s, d)
      val recs = Linkage.baseRecords(cust)
        .unionByName(Linkage.dirtyRecords(cust))
        .unionByName(Linkage.impostorRecords(cust))
      val scal = Linkage.uModel(recs)
      def side(suf: String) = recs.select(Linkage.blockKey.as("k"),
        col("id").as(s"id_$suf"), col("nation").as(s"n_$suf"),
        col("seg").as(s"s_$suf"), col("band").as(s"b_$suf"))
      val matches = side("a").join(side("b"), Seq("k"))
        .filter(col("id_a") < col("id_b"))
        .crossJoin(broadcast(scal))
        .filter(Linkage.likelihoodRatio >= 40.0)
        .select("id_a", "id_b")
      val comp = Components.connectedComponents(matches, "id_a", "id_b")
        .select(col("id").as("__cid"), col("component"))
      val members = recs
        .join(comp, col("id") === col("__cid"), "left")
        .select(col("id"), coalesce(col("component"), col("id")).as("cluster_id"),
          col("nation"), col("seg"), col("band"))
      val segw = members.groupBy("cluster_id", "seg").agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("cluster_id").orderBy(col("cnt").desc, col("seg"))))
        .filter(col("rn") === 1)
        .select(col("cluster_id"), col("seg").as("golden_seg"))
      val agg = members.groupBy("cluster_id").agg(
        count(lit(1)).as("n_members"), max(col("band")).as("band_max"),
        sum(when(col("id") >= Linkage.TWIN_OFFSET &&
          col("id") < Linkage.IMPOSTOR_OFFSET, 1L).otherwise(0L))
          .as("n_twin_members"),
        sum(when(col("id") >= Linkage.IMPOSTOR_OFFSET, 1L).otherwise(0L))
          .as("n_impostor_members"))
      agg
        .join(recs.select(col("id").as("cluster_id"),
          col("nation").cast("long").as("canonical_nation")), "cluster_id")
        .join(segw, "cluster_id")
        .select(col("cluster_id"), col("n_members"), col("canonical_nation"),
          col("golden_seg"), col("band_max"), col("n_twin_members"),
          col("n_impostor_members"))
        .orderBy("cluster_id")
    },

    // ---- q192: linkage threshold sweep — precision/recall over the LR cut --
    // q186 decides at LR >= 40.0; this query makes that cutoff a MEASURED
    // choice instead of a magic constant (the q148 eval-harness pattern
    // applied to linkage): the same scored candidate pairs are evaluated
    // against a ladder of thresholds, with planted twins as ground-truth
    // positives and impostors+background as negatives, producing the
    // threshold → (tp, fp, fn, tn, precision, recall) table an operator
    // reads to place the cut. All-integer: scores are the floored basis
    // points q186 already emits, thresholds compare in basis points, and
    // precision/recall are floor-divided basis points — exactly
    // replayable (Spark `div` ≡ DuckDB `//` on non-negatives).
    //
    // 100 TB shape: one extra map-side cross join of the scored pairs
    // against a 9-row broadcast threshold list, then a 9-group
    // aggregation with map-side partial combine — the sweep costs one
    // pass over the candidates, nothing quadratic, no extra shuffle of
    // the pair stream beyond the 9-key agg exchange.
    QueryDef(
      "q192_linkage_threshold_sweep",
      """WITH recs AS (
        |  SELECT c_custkey AS id, c_name AS name, c_nationkey AS nation,
        |    c_mktsegment AS seg, CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS band
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey + 1000000, substring(c_name, 1, length(c_name) - 1) || 'Z',
        |    c_nationkey,
        |    CASE WHEN c_custkey % 10 = 0 THEN c_mktsegment ELSE 'Z' || c_mktsegment END,
        |    CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT)
        |  FROM customer WHERE c_custkey % 5 = 0
        |  UNION ALL
        |  SELECT c_custkey + 2000000, c_name, (c_nationkey + 1) % 25,
        |    'X' || c_mktsegment,
        |    CAST(FLOOR((10000.0 - c_acctbal) / 1000.0) AS BIGINT)
        |  FROM customer WHERE c_custkey % 7 = 3),
        |scal AS (
        |  SELECT CAST(n * (n - 1) AS BIGINT) AS uden, un, us, ub
        |  FROM (SELECT COUNT(*) AS n FROM recs),
        |    (SELECT CAST(SUM(c * (c - 1)) AS BIGINT) AS un
        |     FROM (SELECT COUNT(*) AS c FROM recs GROUP BY nation)),
        |    (SELECT CAST(SUM(c * (c - 1)) AS BIGINT) AS us
        |     FROM (SELECT COUNT(*) AS c FROM recs GROUP BY seg)),
        |    (SELECT CAST(SUM(c * (c - 1)) AS BIGINT) AS ub
        |     FROM (SELECT COUNT(*) AS c FROM recs GROUP BY band))),
        |pairs AS (
        |  SELECT a.id AS id_a, b.id AS id_b,
        |    a.nation = b.nation AS agr_n, a.seg = b.seg AS agr_s,
        |    a.band = b.band AS agr_b
        |  FROM recs a JOIN recs b
        |    ON substring(a.name, 1, length(a.name) - 1)
        |     = substring(b.name, 1, length(b.name) - 1)
        |   AND a.id < b.id),
        |scored AS (
        |  SELECT
        |    CASE WHEN id_b - id_a = 1000000 AND id_a % 5 = 0
        |           AND id_a < 1000000 THEN 1 ELSE 0 END AS is_pos,
        |    CAST(FLOOR((
        |    (CASE WHEN agr_n THEN CAST(uden AS DOUBLE) / CAST(un AS DOUBLE) * (19.0 / 20.0)
        |          ELSE CAST(uden AS DOUBLE) / CAST(uden - un AS DOUBLE) * (1.0 / 20.0) END)
        |    * (CASE WHEN agr_s THEN CAST(uden AS DOUBLE) / CAST(us AS DOUBLE) * (4.0 / 5.0)
        |            ELSE CAST(uden AS DOUBLE) / CAST(uden - us AS DOUBLE) * (1.0 / 5.0) END)
        |    * (CASE WHEN agr_b THEN CAST(uden AS DOUBLE) / CAST(ub AS DOUBLE) * (9.0 / 10.0)
        |            ELSE CAST(uden AS DOUBLE) / CAST(uden - ub AS DOUBLE) * (1.0 / 10.0) END)
        |    ) * 10000.0) AS BIGINT) AS bp
        |  FROM pairs, scal),
        |thr AS (SELECT * FROM (VALUES (1), (2), (5), (10), (20), (40), (80),
        |                              (160), (320)) v(t)),
        |swept AS (
        |  SELECT CAST(t AS BIGINT) AS threshold,
        |    CAST(SUM(CASE WHEN is_pos = 1 AND bp >= t * 10000 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |    CAST(SUM(CASE WHEN is_pos = 0 AND bp >= t * 10000 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |    CAST(SUM(CASE WHEN is_pos = 1 AND bp < t * 10000 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
        |    CAST(SUM(CASE WHEN is_pos = 0 AND bp < t * 10000 THEN 1 ELSE 0 END) AS BIGINT) AS tn
        |  FROM scored, thr GROUP BY t)
        |SELECT threshold, tp, fp, fn, tn,
        |  CASE WHEN tp + fp = 0 THEN NULL
        |       ELSE CAST((tp * 10000) // (tp + fp) AS BIGINT) END AS precision_bp,
        |  CASE WHEN tp + fn = 0 THEN NULL
        |       ELSE CAST((tp * 10000) // (tp + fn) AS BIGINT) END AS recall_bp
        |FROM swept
        |ORDER BY threshold""".stripMargin) { (s, d) =>
      import graft.operators.Linkage
      import s.implicits._
      val cust = Tables.customer(s, d)
      val recs = Linkage.baseRecords(cust)
        .unionByName(Linkage.dirtyRecords(cust))
        .unionByName(Linkage.impostorRecords(cust))
      val scal = Linkage.uModel(recs)
      def side(suf: String) = recs.select(Linkage.blockKey.as("k"),
        col("id").as(s"id_$suf"), col("nation").as(s"n_$suf"),
        col("seg").as(s"s_$suf"), col("band").as(s"b_$suf"))
      val scored = side("a").join(side("b"), Seq("k"))
        .filter(col("id_a") < col("id_b"))
        .crossJoin(broadcast(scal))
        .select(
          when(Linkage.pairClass === "twin", 1L).otherwise(0L).as("is_pos"),
          floor(Linkage.likelihoodRatio * 10000.0).as("bp"))
      val thr = Seq(1L, 2L, 5L, 10L, 20L, 40L, 80L, 160L, 320L)
        .toDF("threshold")
      val hit = col("bp") >= col("threshold") * 10000
      val swept = scored.crossJoin(broadcast(thr))
        .groupBy("threshold")
        .agg(
          sum(when(col("is_pos") === 1 && hit, 1L).otherwise(0L)).as("tp"),
          sum(when(col("is_pos") === 0 && hit, 1L).otherwise(0L)).as("fp"),
          sum(when(col("is_pos") === 1 && !hit, 1L).otherwise(0L)).as("fn"),
          sum(when(col("is_pos") === 0 && !hit, 1L).otherwise(0L)).as("tn"))
      swept.select(col("threshold"), col("tp"), col("fp"), col("fn"), col("tn"),
          when(col("tp") + col("fp") === 0, lit(null).cast("long"))
            .otherwise(expr("(tp * 10000) div (tp + fp)")).as("precision_bp"),
          when(col("tp") + col("fn") === 0, lit(null).cast("long"))
            .otherwise(expr("(tp * 10000) div (tp + fn)")).as("recall_bp"))
        .orderBy("threshold")
    },

    // ---- q194: streaming incremental connected components ------------------
    // Incremental entity resolution at ingest — the q116-versioned-state
    // trick applied to q67's clustering: match pairs ARRIVE as
    // micro-batches (as candidate generation discovers them) and each
    // batch folds into a persistent component state WITHOUT ever
    // re-reading the pair history. State = the star edges (id →
    // component) of the clusters so far — NODE-sized, the contraction CC
    // itself converges to — and per batch the engine runs
    // `Components.connectedComponents` over state ∪ new edges only.
    // Correct because a component's star preserves exactly its
    // connectivity: CC(stars(G₁) ∪ E₂) = CC(G₁ ∪ E₂), and connectivity is
    // associative-commutative over edge arrival order, so ANY batch split
    // yields the same final clustering — which is what the oracle pins
    // (the identical recursive-closure SQL as batch q67, hash-exact).
    //
    // 100 TB shape: the alternative — re-cluster the full pair corpus on
    // every ingest — reads history linear in corpus age; this reads
    // O(|nodes| + |batch|) per merge. Each per-batch CC runs in the
    // narrow session clone at its measured width (tiny for incremental
    // merges: the state is already a union of stars, so late batches
    // converge in 1–2 rounds), and state versions ping-pong as parquet
    // (a lakehouse MERGE in parquet terms, cf. q116).
    QueryDef(
      "q194_stream_incremental_cc",
      s"""WITH RECURSIVE $PAIRS_SQL,
         |und AS (SELECT doc_a AS u, doc_b AS v FROM jpairs
         |        UNION ALL
         |        SELECT doc_b AS u, doc_a AS v FROM jpairs),
         |reach(u, v) AS (
         |  SELECT u, v FROM und
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u),
         |comp AS (SELECT u AS doc_id, least(u, MIN(v)) AS cluster_id
         |         FROM reach GROUP BY u)
         |SELECT cluster_id, doc_id,
         |  CAST(CASE WHEN doc_id = cluster_id THEN 1 ELSE 0 END AS BIGINT) AS is_canonical
         |FROM comp
         |ORDER BY cluster_id, doc_id""".stripMargin) { (s, d) =>
      val srcDir = stagedPairBatches(s, d)
      val store = clearedStore(d, "graft-q194-cc-")
      val latest = new java.util.concurrent.atomic.AtomicReference[String](null)
      val schema = s.read.parquet(srcDir).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(srcDir)
      graft.streaming.Streams.runForeachBatch(s, stream, (batch, batchId) => {
        val newEdges = batch.select(col("doc_a").as("u"), col("doc_b").as("v"))
        val merged = Option(latest.get()) match {
          case Some(prev) =>
            batch.sparkSession.read.parquet(prev)
              .select(col("id").as("u"), col("component").as("v"))
              .unionByName(newEdges)
          case None => newEdges
        }
        val comp = graft.operators.Components
          .connectedComponents(merged, "u", "v")
        val next = s"$store/v$batchId"
        comp.write.mode("overwrite").parquet(next)
        latest.set(next)
      })
      Option(latest.get()) match {
        case Some(last) =>
          s.read.parquet(last)
            .select(col("component").as("cluster_id"), col("id").as("doc_id"),
              when(col("id") === col("component"), 1L).otherwise(0L)
                .as("is_canonical"))
            .orderBy("cluster_id", "doc_id")
        case None =>
          // zero micro-batches fired (no staged pair files at this SF) —
          // match batch q67's empty-input answer instead of NPE-ing
          s.range(0).select(col("id").as("cluster_id"), col("id").as("doc_id"),
            col("id").as("is_canonical"))
      }
    },

    // ---- q195: deterministic random walks over the match graph -------------
    // The graph-embedding data-prep primitive (DeepWalk, Perozzi et al.
    // KDD'14; node2vec's p=q=1 case): WALKS_PER_NODE truncated random
    // walks of WALK_STEPS steps from every node, emitted as (start, walk,
    // step, node) rows — the "sentences" a skip-gram embedder consumes.
    // The walk is made ORACLE-REPLAYABLE by derandomizing the step draw:
    // each node's neighbors get a dense rank r ∈ [0, od) (ROW_NUMBER by
    // neighbor id — deterministic, ties impossible on distinct pairs),
    // and step t moves to the neighbor with
    //   r = H(start, walk, t−1, node) mod od,
    // H being the portable 60-bit md5 both engines compute bit-identically
    // (the q65 trick). H is keyed on the FULL walk state, so the two
    // walks from one start diverge and revisits of a node at different
    // steps redraw independently — the statistical shape DeepWalk wants,
    // with none of the engine-specific RNG that would make this
    // rows-only.
    //
    // 100 TB shape: one degree agg + one per-node neighbor-rank window
    // (bounded by max degree, never corpus-wide) + WALK_STEPS keyed
    // joins of the walk frontier (|nodes|·WALKS_PER_NODE rows — node-
    // sized) against the ranked edge list; the edge list is checkpointed
    // once and every step probes it by key. Nothing quadratic, state is
    // the frontier, and the emitted corpus is nodes × walks × steps rows
    // — the same asymptotics as the walk corpus any embedding pipeline
    // materializes.
    QueryDef(
      "q195_random_walks",
      s"""WITH $WALKS_SQL_CTES
         |SELECT start, walk, step, node
         |FROM walks
         |ORDER BY start, walk, step""".stripMargin) { (s, d) =>
      stagedWalkCorpus(s, d).orderBy("start", "walk", "step")
    },

    // ---- q198: walk → skip-gram pair generation ----------------------------
    // What the q195 walk corpus exists FOR: a word2vec-style embedder
    // (DeepWalk/node2vec) trains on (center, context) co-occurrence pairs
    // within a ±SKIP_WINDOW window of each walk position — this query
    // materializes that pair/count table. Self-join-free by construction:
    // contexts come from lead(node, j) over the (start, walk) partition
    // ordered by step (j = 1..SKIP_WINDOW), then each forward pair is
    // emitted in both directions — the same multiset the oracle's
    // symmetric step-range join produces. Fully hash-checkable because
    // q195's corpus itself replays exactly (derandomized step draw).
    //
    // 100 TB shape: ONE shuffle to co-locate each walk's WALK_STEPS+1
    // rows (partitions are walk-count-sized, each window tiny and
    // bounded), a map-side explode bounded by SKIP_WINDOW, and one
    // map-side-combined count agg on (center, context) — the pair
    // vocabulary, near-dup-graph-sized, never corpus-scale. No self-join
    // anywhere: the window pass replaces the quadratic walks⋈walks the
    // oracle can afford only at test SF.
    QueryDef(
      "q198_skipgram_pairs",
      s"""WITH $WALKS_SQL_CTES,
         |$SKIPGRAM_CTX_CTE
         |SELECT center, context, CAST(COUNT(*) AS BIGINT) AS n_pairs
         |FROM ctx
         |GROUP BY center, context
         |ORDER BY center, context""".stripMargin) { (s, d) =>
      skipgramPairs(s, d).orderBy("center", "context")
    },

    // ---- q200: streaming incremental PageRank over the match graph ---------
    // q194's versioned-state pattern applied to the last iterative-family
    // member: match edges ARRIVE (the staged winnow-pair files,
    // maxFilesPerTrigger=1) and every micro-batch re-derives the
    // centrality ranking of the graph seen so far — the ingest-time shape
    // of q124's canonical-doc selection, where each pair discovery can
    // reshuffle which cluster member is canonical. State is the
    // accumulated EDGE list in versioned parquet (the q116 MERGE trick:
    // write v{batchId}, read v{batchId-1} — idempotent under micro-batch
    // replay); per batch, the full 5 fixed-point rounds re-run from the
    // uniform init over state ∪ batch inside the narrow clone
    // (Graph.fixedPointPageRank — conf-isolated width, checkpointed
    // rounds), and the node-sized rank table lands in its own version.
    // Rank warm-starting is deliberately NOT used: q109's contract is
    // exactly-5-rounds-from-uniform (that fixed-round integer replay is
    // what makes an iterative algorithm hash-checkable at all), and a
    // warm-started rank over a grown edge set answers a different
    // recurrence — so the warm state here is the edge store, not the
    // ranks, and the final batch's output hash-matches batch q109's
    // oracle verbatim. Unlike q194's CC (whose star-edge state COMPRESSES
    // pair history to node size), PR needs every edge each round — the
    // honest per-batch cost is bounded rounds over the current graph,
    // which is precisely what a production rank-on-ingest pipeline pays.
    QueryDef(
      "q200_stream_incremental_pagerank", PR_MATCH_ORACLE) { (s, d) =>
      val srcDir = stagedWinnowPairBatches(s, d)
      val store = clearedStore(d, "graft-q200-pr-")
      val latestEdges =
        new java.util.concurrent.atomic.AtomicReference[String](null)
      val latestRanks =
        new java.util.concurrent.atomic.AtomicReference[String](null)
      val schema = s.read.parquet(srcDir).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(srcDir)
      graft.streaming.Streams.runForeachBatch(s, stream, (batch, batchId) => {
        val ss = batch.sparkSession
        // read v{batchId-1}, not the latest pointer: PR degrees are
        // multiplicity-sensitive, so an at-least-once replay after the
        // pointer advanced must not union the batch's edges twice —
        // keyed store reads make the replay byte-identical (r15, ADVICE;
        // same fix as q241)
        val prevV = s"$store/edges_v${batchId - 1}"
        val merged =
          if (batchId > 0 && new java.io.File(prevV).isDirectory)
            ss.read.parquet(prevV).unionByName(
              batch.select(col("id_a"), col("id_b")))
          else batch.select(col("id_a"), col("id_b"))
        val edgesV = s"$store/edges_v$batchId"
        merged.write.mode("overwrite").parquet(edgesV)
        latestEdges.set(edgesV)
        val mp = ss.read.parquet(edgesV)
        val sym = mp.select(col("id_a").as("u"), col("id_b").as("v"))
          .unionAll(mp.select(col("id_b").as("u"), col("id_a").as("v")))
        val pr = graft.operators.Graph
          .fixedPointPageRank(sym, "u", "v", iters = 5)
        val ranksV = s"$store/ranks_v$batchId"
        pr.write.mode("overwrite").parquet(ranksV)
        latestRanks.set(ranksV)
      })
      Option(latestRanks.get()) match {
        case Some(last) =>
          s.read.parquet(last)
            .select(col("id").as("doc_id"), col("r").as("pr_rank"))
            .orderBy("doc_id")
        case None =>
          // zero micro-batches fired — match batch q109's empty answer
          s.range(0).select(col("id").as("doc_id"), col("id").as("pr_rank"))
      }
    },

    // ---- q201: node2vec second-order biased walks --------------------------
    // The search-bias generalization of q195 (Grover & Leskovec, KDD'16 —
    // public literature): step t's draw depends on the PREVIOUS node, so
    // the walk interpolates between BFS-like (stay near) and DFS-like
    // (wander) exploration. Transition weights with p=2, q=1/2, scaled ×2
    // to stay integer: returning to prev costs 1 (1/p·2), a neighbor of
    // prev costs 2 (1·2), a distance-2 hop costs 4 (1/q·2); step 1 (no
    // prev yet) is uniform. The draw is derandomized on the full
    // second-order state — r = H(start, walk, t−1, prev, node) mod
    // Σweights, selected by cumulative-weight interval over the dense
    // neighbor rank — so the biased corpus replays exactly in DuckDB,
    // interval-selection and all (a float alias-table draw would be
    // rows-only). Distance-1 detection is a keyed LEFT join of the
    // candidate (prev, x) pair against the edge set — no adjacency list
    // ever materializes per row.
    //
    // 100 TB shape: per step, one keyed join of the node-sized frontier
    // against the ranked edge list (fan-out = frontier degrees, bounded
    // by the edge count), one keyed membership join, and two windows
    // partitioned per (start, walk) — each window partition is one
    // node's neighbor list, bounded by max degree, never corpus-wide.
    // Per-step localCheckpoint keeps the union O(steps), the q195
    // discipline.
    QueryDef(
      "q201_node2vec_walks", {
        val steps = (1 to WALK_STEPS).map { t =>
          s"""c$t AS (SELECT p.start, p.walk, p.node, p.prev, r.v, r.r,
             |    CASE WHEN r.v = p.prev THEN 1
             |         WHEN p.prev IS NULL THEN 1
             |         WHEN e.u IS NOT NULL THEN 2 ELSE 4 END AS w
             |  FROM b${t - 1} p
             |  JOIN rnk r ON r.u = p.node
             |  LEFT JOIN und e ON e.u = p.prev AND e.v = r.v),
             |u$t AS (SELECT *,
             |    SUM(w) OVER (PARTITION BY start, walk ORDER BY r
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
             |    SUM(w) OVER (PARTITION BY start, walk) AS tw,
             |    ('0x' || substring(md5(CAST(start AS VARCHAR) || ':' ||
             |      CAST(walk AS VARCHAR) || ':' || CAST(${t - 1} AS VARCHAR) || ':' ||
             |      CAST(COALESCE(prev, -1) AS VARCHAR) || ':' ||
             |      CAST(node AS VARCHAR)), 1, 15))::BIGINT AS h
             |  FROM c$t),
             |b$t AS (SELECT start, walk, CAST($t AS BIGINT) AS step,
             |    v AS node, node AS prev
             |  FROM u$t WHERE cw - w <= h % tw AND h % tw < cw)""".stripMargin
        }.mkString(",\n")
        val unionAll = (0 to WALK_STEPS)
          .map(t => s"SELECT start, walk, step, node FROM b$t")
          .mkString(" UNION ALL ")
        s"""WITH $WALK_GRAPH_CTES,
           |b0 AS (SELECT d.u AS start, CAST(k.k AS BIGINT) AS walk,
           |    CAST(0 AS BIGINT) AS step, d.u AS node,
           |    CAST(NULL AS BIGINT) AS prev
           |  FROM deg d CROSS JOIN (VALUES $WALK_IDS_SQL) k(k)),
           |$steps
           |SELECT start, walk, step, node
           |FROM ($unionAll)
           |ORDER BY start, walk, step""".stripMargin
      }) { (s, d) =>
      import s.implicits._
      val (und, deg, rnk) = walkGraph(s, d)
      val prevEdge = und.select(col("u").as("pu"), col("v").as("pv"))
        .withColumn("d1", lit(1))
      val wOrd = Window.partitionBy("start", "walk").orderBy("r")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy("start", "walk")
      var cur = deg.select(col("u").as("start"))
        .crossJoin((0L until WALKS_PER_NODE.toLong).toDF("walk"))
        .select(col("start"), col("walk"), lit(0L).as("step"),
          col("start").as("node"), lit(null).cast("long").as("prev"))
      val levels = scala.collection.mutable.ArrayBuffer(
        cur.select("start", "walk", "step", "node"))
      for (t <- 1 to WALK_STEPS) {
        val h = conv(substring(md5(concat_ws(":",
          col("start"), col("walk"), col("step"),
          coalesce(col("prev"), lit(-1L)), col("node"))), 1, 15), 16, 10)
          .cast("long")
        cur = cur
          .join(rnk, col("u") === col("node")).drop("u")
          .join(prevEdge,
            col("pu") === col("prev") && col("pv") === col("v"), "left")
          .withColumn("w",
            when(col("v") === col("prev"), 1L)
              .when(col("prev").isNull, 1L)
              .when(col("d1") === 1, 2L)
              .otherwise(4L))
          .withColumn("cw", sum(col("w")).over(wOrd))
          .withColumn("tw", sum(col("w")).over(wAll))
          .withColumn("rd", h % col("tw"))
          .filter(col("cw") - col("w") <= col("rd") && col("rd") < col("cw"))
          .select(col("start"), col("walk"), lit(t.toLong).as("step"),
            col("v").as("node"), col("node").as("prev"))
          .localCheckpoint() // the q195 per-step discipline
        levels += cur.select("start", "walk", "step", "node")
      }
      levels.reduce(_ unionByName _).orderBy("start", "walk", "step")
    },

    // ---- q204: HyperLogLog from first principles, integer-replayed ---------
    // q43/q85 are rows-only because built-in sketch BINARIES are
    // engine-specific — but the HLL ALGORITHM (Flajolet-Fusy-Gandouet-
    // Meunier 2007, public literature) is not. Built from the portable md5
    // idiom, every step replays in DuckDB: bucket j = first 2 hex chars
    // (m = 256 registers), rank rho = leading-zero count of the next 48
    // bits + 1 — computed by TRIMMING LEADING '0' HEX DIGITS (4 zero bits
    // each) plus a 4-way CASE on the first surviving digit, so no log2()
    // ever runs. The register sum is replayed as the INTEGER
    // S = Σ 2^(49−M_j) (absent buckets contribute 2^49; max 256·2^49 = 2^57,
    // no overflow) — a bit-exact cross-engine check of the whole sketch
    // state, stronger than comparing a rounded estimate. The estimate
    // α_m·m²·2^49/S is one fixed IEEE expression; the small-range
    // linear-counting branch m·ln(m/V) follows the q93 ln discipline
    // (DECIMAL rounding absorbs last-ulp libm divergence). n_exact is the
    // in-query verifier, as in q43.
    //
    // 100 TB shape: one scan, one map-side-combinable (source, j) max — at
    // most 256 register rows per source survive the shuffle regardless of
    // corpus size, then a 256-row-per-source finalize. The production path
    // stays approx_count_distinct (HLL++, binary-mergeable); this query
    // pins the algorithm itself under the oracle so the sketch family's
    // correctness story no longer rests on rows-only checks alone.
    QueryDef("q204_hll_replay", HLL_ORACLE_BATCH) { (s, d) =>
      val docs = Tables.documents(s, d)
      val ex = docs.groupBy("source")
        .agg(countDistinct(docFp).as("n_exact"))
      hllFinalize(hllRegisters(docs))
        .join(ex, "source")
        .select("source", "n_exact", "v_zero", "s_reg", "est_hll")
        .orderBy("source")
    },

    // ---- q205: streaming HLL — per-batch registers, max-merged -------------
    // q85's incremental-cardinality loop with the portable q204 sketch in
    // place of the engine-specific binary: each micro-batch (real streaming
    // engine, maxFilesPerTrigger=1) reduces to its own (source, j, m)
    // register rows — O(256 · sources) regardless of batch size — persisted
    // under batch_id with dynamic partition overwrite (idempotent under
    // foreachBatch's at-least-once replay, the q85/q153 discipline). The
    // corpus-wide answer max-merges the stored registers; because register
    // max is associative, commutative, and idempotent, the merged state is
    // IDENTICAL to the single-pass batch sketch no matter how ingest was
    // batched — so the streaming answer hash-matches the same DuckDB oracle
    // as q204's finalize, with old batches never rescanned. That is the
    // sketch-store contract a 100 TB ingest pipeline runs on, now
    // oracle-checked end to end instead of rows-only.
    QueryDef("q205_stream_hll_merge", HLL_ORACLE_STREAM) { (s, d) =>
      val srcDir = stagedDocBatches(s, d)
      val store = clearedStore(d, "graft-q205-hll-")
      val schema = s.read.parquet(srcDir).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(srcDir)
      graft.streaming.Streams.runForeachBatch(s, stream, (batch, batchId) =>
        hllRegisters(batch)
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(store.toString))
      val merged = s.read.parquet(store.toString)
        .groupBy("source", "j").agg(max(col("m")).as("m"))
      hllFinalize(merged).orderBy("source")
    },

    // ---- q206: GloVe co-occurrence statistics over the walk corpus ---------
    // The OTHER embedding objective the walk corpus feeds: GloVe
    // (Pennington-Socher-Manning, EMNLP'14, public literature) trains
    // against distance-weighted co-occurrence counts X_ij = Σ 1/d — not
    // q198's flat pair counts — with sample weight f(X) = (X/x_max)^0.75
    // capped at 1, and regression target ln(X). The 1/d weights are kept
    // INTEGER by scaling with LCM(1..SKIP_WINDOW) = 2 (w_d = 2/d ∈ {2,1}),
    // so x_scaled replays exactly; X = x_scaled/2 is one exact-integer IEEE
    // quotient, and the two derived doubles (pow-0.75 and ln — both
    // last-ulp-risky libm calls) follow the q93 DECIMAL(18,8) rounding
    // discipline.
    //
    // 100 TB shape: identical to q198 (one walk-partition window pass, a
    // map-side explode bounded by SKIP_WINDOW, one map-side-combined sum on
    // (center, context)) — the weight rides along as a literal per lead
    // offset, so the distance never needs a self-join to recover. The
    // finalize is per-pair arithmetic on the vocabulary-sized pair table.
    QueryDef(
      "q206_glove_cooc",
      s"""WITH $WALKS_SQL_CTES,
         |ctx AS (
         |  SELECT a.node AS center, b.node AS context,
         |    CAST($GLOVE_LCM / abs(a.step - b.step) AS BIGINT) AS wd
         |  FROM walks a JOIN walks b
         |    ON a.start = b.start AND a.walk = b.walk
         |   AND b.step BETWEEN a.step - $SKIP_WINDOW AND a.step + $SKIP_WINDOW
         |   AND b.step <> a.step),
         |agg AS (
         |  SELECT center, context, CAST(SUM(wd) AS BIGINT) AS x_scaled
         |  FROM ctx GROUP BY center, context),
         |fin AS (
         |  SELECT center, context, x_scaled,
         |    CAST(x_scaled AS DOUBLE) / CAST($GLOVE_LCM.0 AS DOUBLE) AS x
         |  FROM agg)
         |SELECT center, context, x_scaled,
         |  CAST(CAST(CASE WHEN x < CAST(100.0 AS DOUBLE)
         |    THEN power(x / CAST(100.0 AS DOUBLE), CAST(0.75 AS DOUBLE))
         |    ELSE CAST(1.0 AS DOUBLE) END AS DECIMAL(18,8)) AS DOUBLE) AS fx,
         |  CAST(CAST(ln(x) AS DECIMAL(18,8)) AS DOUBLE) AS log_x
         |FROM fin
         |ORDER BY center, context""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("start", "walk").orderBy("step")
      val fwd = stagedWalkCorpus(s, d)
        .select(col("node").as("center"),
          array((1 to SKIP_WINDOW).map(j =>
            struct(lead(col("node"), j).over(w).as("context"),
              lit((GLOVE_LCM / j).toLong).as("wd"))): _*).as("cands"))
        .select(col("center"), explode(col("cands")).as("c"))
        .select(col("center"), col("c.context").as("context"),
          col("c.wd").as("wd"))
        .filter(col("context").isNotNull)
      val agg0 = fwd
        .unionByName(fwd.select(col("context").as("center"),
          col("center").as("context"), col("wd")))
        .groupBy("center", "context")
        .agg(sum(col("wd")).as("x_scaled"))
      val x = col("x_scaled").cast("double") / lit(GLOVE_LCM.toDouble)
      agg0.select(col("center"), col("context"), col("x_scaled"),
          when(x < lit(100.0), pow(x / lit(100.0), lit(0.75)))
            .otherwise(lit(1.0))
            .cast(DecimalType(18, 8)).cast("double").as("fx"),
          log(x).cast(DecimalType(18, 8)).cast("double").as("log_x"))
        .orderBy("center", "context")
    },

    // ---- q208: SGNS negative-sampling table ---------------------------------
    // The third leg of the embedding-prep trio (q198 positives, q206 GloVe
    // stats): skip-gram-with-negative-sampling (Mikolov et al., NeurIPS'13)
    // draws K noise words per positive pair from the unigram^(3/4)
    // distribution. Made exactly replayable twice over:
    //   1. the fractional-power weight floor(c^0.75) is computed as the
    //      INTEGER fourth root of c³ — a floor(power()) candidate corrected
    //      by one exact integer comparison step, so engine-specific pow
    //      rounding can never flip a weight;
    //   2. the draw replays word2vec's OWN published mechanism — the
    //      unigram table where word i occupies w_i consecutive slots,
    //      indexed uniformly — with slot positions assigned by
    //      GlobalIds.prefixSum (two-phase balanced prefix sum, never a
    //      one-reducer window) and the index h = md5(center:context:slot)
    //      mod Σw, so "weighted draw" becomes one EQUI-join on position.
    // Collisions (negative == center/context) are flagged, not resampled —
    // resampling is an unbounded loop; flagging is the bounded, replayable
    // policy and downstream can drop or keep flagged rows.
    //
    // 100 TB shape: the expanded table is Σ floor(c^0.75) rows —
    // sub-corpus-scale by concavity — built from one keyed count + one
    // prefix sum; draws are pairs × K rows joined by KEY (position), no
    // interval/range join, no broadcast of the vocabulary. Everything
    // map-side-combinable before its one shuffle.
    QueryDef(
      "q208_sgns_negatives", {
        val negIds = (1 to K_NEG).map(n => s"($n)").mkString(", ")
        // DuckDB inlines CTEs: `walks` (whose own chain re-expands the
        // jpairs pipeline per step) is referenced by BOTH the unigram
        // count and the context CTE, and wts by three consumers — at
        // sf0.1 the re-expanded plan exhausts spill. MATERIALIZED pins
        // the walk corpus, the weights, and the pair set once each.
        val walksM =
          WALKS_SQL_CTES.replace("walks AS (", "walks AS MATERIALIZED (")
        s"""WITH $walksM,
           |$SKIPGRAM_CTX_CTE,
           |pairs AS MATERIALIZED (SELECT center, context FROM ctx GROUP BY center, context),
           |cnt AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS c FROM walks GROUP BY node),
           |wt0 AS (SELECT node, c*c*c AS c3,
           |    CAST(floor(power(c*c*c, 0.25)) AS BIGINT) AS r0 FROM cnt),
           |wts AS MATERIALIZED (SELECT node,
           |    CASE WHEN (r0+1)*(r0+1)*(r0+1)*(r0+1) <= c3 THEN r0+1
           |         WHEN r0*r0*r0*r0 > c3 THEN r0-1 ELSE r0 END AS w
           |  FROM wt0),
           |lad AS (SELECT node, w,
           |    CAST(COALESCE(SUM(w) OVER (ORDER BY node
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
           |  FROM wts),
           |tot AS (SELECT CAST(SUM(w) AS BIGINT) AS tw FROM wts),
           |expanded AS (SELECT node AS neg_node,
           |    off + unnest(range(1, w + 1)) AS pos FROM lad),
           |draws AS (
           |  SELECT p.center, p.context, CAST(k.n AS BIGINT) AS n,
           |    ('0x' || substring(md5(CAST(p.center AS VARCHAR) || ':' ||
           |      CAST(p.context AS VARCHAR) || ':' ||
           |      CAST(k.n AS VARCHAR)), 1, 15))::BIGINT % t.tw + 1 AS pos
           |  FROM pairs p CROSS JOIN (VALUES $negIds) k(n) CROSS JOIN tot t)
           |SELECT d.center, d.context, d.n, e.neg_node,
           |  CAST(CASE WHEN e.neg_node = d.center OR e.neg_node = d.context
           |    THEN 1 ELSE 0 END AS BIGINT) AS is_collision
           |FROM draws d JOIN expanded e ON e.pos = d.pos
           |ORDER BY center, context, n""".stripMargin
      }) { (s, d) =>
      // ONE walk build feeds both the unigram counts and the positive
      // pairs — and since r15 the build itself is the fleet-shared
      // staged parquet (BenchOne r14: 9.5 s two-build vs one-build at
      // sf0.1; staging shares that one build across q195/q198/q206 too)
      val wc = stagedWalkCorpus(s, d)
      val cnt = wc.groupBy("node")
        .agg(count(lit(1)).as("c"))
      // integer fourth root of c^3 = floor(c^0.75): floor(pow) is within
      // ±1 of truth, one comparison step pins it exactly — staged through
      // withColumn so the r0 subtree is built once (cf. the q187/q199
      // expression-tree lesson)
      val wts = cnt
        .withColumn("c3", col("c") * col("c") * col("c"))
        .withColumn("r0",
          floor(pow(col("c3").cast("double"), lit(0.25))).cast("long"))
        .withColumn("w",
          when((col("r0") + 1) * (col("r0") + 1) * (col("r0") + 1) *
            (col("r0") + 1) <= col("c3"), col("r0") + 1)
            .when(col("r0") * col("r0") * col("r0") * col("r0") > col("c3"),
              col("r0") - 1)
            .otherwise(col("r0")))
        .select("node", "w")
      val ladder = graft.operators.GlobalIds.prefixSum(
        wts, Seq(col("node")), "w", "off")
      val expanded = ladder.select(col("node").as("neg_node"),
        explode(sequence(col("off") + 1, col("off") + col("w"))).as("pos"))
      val tot = wts.agg(sum(col("w")).as("tw"))
      val draws = skipgramPairsOf(wc).select("center", "context")
        .crossJoin(broadcast(tot))
        .select(col("center"), col("context"),
          explode(array((1 to K_NEG).map(n => lit(n.toLong)): _*)).as("n"),
          col("tw"))
        .withColumn("pos",
          conv(substring(md5(concat_ws(":",
            col("center"), col("context"), col("n"))), 1, 15), 16, 10)
            .cast("long") % col("tw") + 1)
      draws.join(expanded, "pos")
        .select(col("center"), col("context"), col("n"), col("neg_node"),
          when(col("neg_node") === col("center") ||
            col("neg_node") === col("context"), 1L).otherwise(0L)
            .as("is_collision"))
        .orderBy("center", "context", "n")
    },

    // ---- q210: dedup-weighted corpus sampling --------------------------------
    // Between "keep everything" and "keep one canonical per cluster" (q67)
    // sits the policy modern corpus builds actually use (SemDeDup/SoftDeDup
    // family): keep each document with probability 1/|cluster|, so every
    // near-dup cluster contributes ONE document in expectation — the
    // deduplicated DISTRIBUTION is preserved while which copy survives
    // stays diverse, and unique documents (|cluster| = 1) are kept with
    // probability exactly 1. The Bernoulli draw is derandomized portably:
    // keep iff md5₆₀(salt:doc_id) mod |cluster| = 0 — an exact-integer rule
    // both engines replay bit-for-bit (bias ≤ |cluster|/2⁶⁰), no float
    // threshold anywhere. Emits EVERY doc with its kept flag (the audit
    // view; the corpus build is `WHERE kept = 1`).
    //
    // 100 TB shape: cluster structure comes from operators.Components
    // (O(log² n) keyed rounds, node-sized state); sizes are one map-side-
    // combined count on the component table; membership + size attach via
    // two keyed joins against the node-sized cluster table (docs outside
    // any pair never enter the CC — the LEFT joins default them to
    // singleton); the draw itself is pure map-side. Nothing scans pair
    // history after the CC.
    QueryDef(
      "q210_dedup_weighted_sample",
      s"""WITH RECURSIVE $PAIRS_SQL,
         |und AS (SELECT doc_a AS u, doc_b AS v FROM jpairs
         |        UNION ALL
         |        SELECT doc_b AS u, doc_a AS v FROM jpairs),
         |reach(u, v) AS (
         |  SELECT u, v FROM und
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u),
         |comp AS (SELECT u AS doc_id, least(u, MIN(v)) AS cluster_id
         |         FROM reach GROUP BY u),
         |sz AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS csize
         |       FROM comp GROUP BY cluster_id),
         |alld AS (
         |  SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
         |    CAST(COALESCE(s.csize, 1) AS BIGINT) AS cluster_size
         |  FROM documents d
         |  LEFT JOIN comp c ON c.doc_id = d.doc_id
         |  LEFT JOIN sz s ON s.cluster_id = c.cluster_id)
         |SELECT doc_id, cluster_id, cluster_size,
         |  CAST(CASE WHEN ('0x' || substring(md5('$DWS_SALT:' ||
         |      CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % cluster_size = 0
         |    THEN 1 ELSE 0 END AS BIGINT) AS kept
         |FROM alld
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val clusters = graft.operators.Components
        .connectedComponents(jaccardPairs(s, d).select("doc_a", "doc_b"),
          "doc_a", "doc_b")
        .select(col("id").as("doc_id"), col("component").as("cid"))
      val sz = clusters.groupBy("cid").agg(count(lit(1)).as("csize"))
      val h = conv(substring(md5(concat(lit(s"$DWS_SALT:"),
        col("doc_id").cast("string"))), 1, 15), 16, 10).cast("long")
      Tables.documents(s, d).select("doc_id")
        .join(clusters, Seq("doc_id"), "left")
        .join(sz, Seq("cid"), "left")
        .select(col("doc_id"),
          coalesce(col("cid"), col("doc_id")).as("cluster_id"),
          coalesce(col("csize"), lit(1L)).as("cluster_size"))
        .withColumn("kept",
          when(h % col("cluster_size") === 0L, 1L).otherwise(0L))
        .orderBy("doc_id")
    },

    // ---- q214: LSH banding parameter sweep ----------------------------------
    // q192 made q186's match cutoff a measured choice; q214 does the same
    // for q28's banding: with 16 minhashes, every (bands b × rows r)
    // factorization — (16,1) (8,2) (4,4) (2,8) (1,16) — is run in ONE
    // query, each measured against the EXACT ground truth (q27's uncapped
    // Jaccard ≥ 0.5 pairs, PAIRS_SQL shared verbatim): candidate volume
    // (the cost axis), recall and precision in exact integer basis points
    // (the quality axes). The S-curve tradeoff (more bands → higher
    // recall, more candidates) becomes a 5-row table instead of folklore.
    // The minhash construction is q28's, verbatim (same salts, same hex
    // slices), so the sweep tunes exactly the operator that ships.
    //
    // 100 TB shape: the sweep costs 31 band rows per doc (vs q28's 4) —
    // still linear in the corpus, never quadratic: buckets are
    // occupancy-capped per (b, band, bh) exactly as q28's, candidates
    // come from the keyed bucket self-join, and the truth join is keyed
    // on the pair. The per-config ledger is one map-side-combined count
    // over the candidate table; n_truth is one broadcast scalar.
    QueryDef(
      "q214_lsh_banding_sweep", {
        val mhCols = (0 until 16).map(i =>
          s"MIN(substring(md5('${i / 4}:' || gram), ${(i % 4) * 8 + 1}, 8)) AS mh$i")
          .mkString(",\n    ")
        val bandSelects = SWEEP_CONFIGS.flatMap { case (b, r) =>
          (0 until b).map { i =>
            val cat = (i * r until i * r + r).map(k => s"mh$k").mkString(" || ")
            s"SELECT doc_id, $b AS b, $r AS r, $i AS band, md5($cat) AS bh FROM mh"
          }
        }.mkString("\n  UNION ALL\n  ")
        s"""WITH $PAIRS_SQL,
           |mh AS (SELECT doc_id,
           |    $mhCols
           |  FROM grams GROUP BY doc_id),
           |sb AS (
           |  $bandSelects),
           |sbc AS (SELECT doc_id, b, r, band, bh FROM (
           |          SELECT *, COUNT(*) OVER (PARTITION BY b, band, bh) AS n
           |          FROM sb)
           |        WHERE n <= $MAX_BUCKET),
           |cand AS (SELECT DISTINCT s1.b AS b, s1.r AS r,
           |           s1.doc_id AS doc_a, s2.doc_id AS doc_b
           |         FROM sbc s1 JOIN sbc s2
           |           ON s1.b = s2.b AND s1.band = s2.band AND s1.bh = s2.bh
           |          AND s1.doc_id < s2.doc_id),
           |tr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM jpairs),
           |per AS (
           |  SELECT b, r, CAST(COUNT(*) AS BIGINT) AS n_candidates,
           |    CAST(SUM(CASE WHEN j.doc_a IS NOT NULL THEN 1 ELSE 0 END)
           |      AS BIGINT) AS n_caught
           |  FROM cand c LEFT JOIN jpairs j
           |    ON j.doc_a = c.doc_a AND j.doc_b = c.doc_b
           |  GROUP BY b, r)
           |SELECT CAST(b AS BIGINT) AS b, CAST(r AS BIGINT) AS r,
           |  n_candidates, n_truth, n_caught,
           |  CAST(CASE WHEN n_truth = 0 THEN 0
           |    ELSE 10000 * n_caught // n_truth END AS BIGINT) AS recall_bp,
           |  CAST(CASE WHEN n_candidates = 0 THEN 0
           |    ELSE 10000 * n_caught // n_candidates END AS BIGINT) AS precision_bp
           |FROM per CROSS JOIN tr
           |ORDER BY b DESC""".stripMargin
      }) { (s, d) =>
      val grams = sparkGrams(s, d)
      val mhAggs = (0 until 16).map(i =>
        min(substring(md5(concat(lit(s"${i / 4}:"), col("gram"))),
          (i % 4) * 8 + 1, 8)).as(s"mh$i"))
      // 31 band branches below all scan mh — persisted, as q28's 4 are
      val mh = grams.groupBy("doc_id").agg(mhAggs.head, mhAggs.tail: _*).persist()
      val sb = SWEEP_CONFIGS.flatMap { case (b, r) =>
        (0 until b).map { i =>
          mh.select(col("doc_id"), lit(b.toLong).as("b"), lit(r.toLong).as("r"),
            lit(i.toLong).as("band"),
            md5(concat((i * r until i * r + r).map(k => col(s"mh$k")): _*)).as("bh"))
        }
      }.reduce(_ unionByName _)
      val sbc = graft.operators.Occupancy.cap(
        sb, Seq("b", "band", "bh"), MAX_BUCKET, persistResult = true)
      val cand = sbc.as("s1")
        .join(sbc.as("s2"),
          col("s1.b") === col("s2.b") && col("s1.band") === col("s2.band") &&
            col("s1.bh") === col("s2.bh") && col("s1.doc_id") < col("s2.doc_id"))
        .select(col("s1.b").as("b"), col("s1.r").as("r"),
          col("s1.doc_id").as("doc_a"), col("s2.doc_id").as("doc_b"))
        .distinct()
      val truth = jaccardPairs(s, d).select(col("doc_a"), col("doc_b"),
        lit(1L).as("hit"))
      val tr = truth.agg(count(lit(1)).as("n_truth"))
      cand.join(truth, Seq("doc_a", "doc_b"), "left")
        .groupBy("b", "r")
        .agg(count(lit(1)).as("n_candidates"),
          sum(coalesce(col("hit"), lit(0L))).as("n_caught"))
        .crossJoin(broadcast(tr))
        .select(col("b"), col("r"), col("n_candidates"), col("n_truth"),
          col("n_caught"),
          when(col("n_truth") === 0L, 0L)
            .otherwise(expr("10000 * n_caught div n_truth")).as("recall_bp"),
          when(col("n_candidates") === 0L, 0L)
            .otherwise(expr("10000 * n_caught div n_candidates")).as("precision_bp"))
        .orderBy(col("b").desc)
    },

    // ---- q217: common-neighbor link prediction on the match graph -----------
    // The dedup-ops "suggested merges" view: non-edge pairs that share
    // near-dup neighbors are the near-misses the threshold clipped (a~m,
    // m~b but a≁b) — exactly what a reviewer triages before lowering a
    // cutoff, and the classical link-prediction baseline (common
    // neighbors + neighborhood Jaccard; Liben-Nowell & Kleinberg '03).
    // All-integer: cn is a count, the neighborhood Jaccard is exact basis
    // points 10000·cn div (deg_a + deg_b − cn) — no deg×deg product ever
    // forms (the Linkage uModel overflow lesson; preferential attachment
    // is deliberately NOT emitted for that reason). The θ = 0.5 graph is
    // all tight cliques at test SFs (zero open wedges — q67's clusters
    // are complete), so the fixture PLANTS the near-miss shape the query
    // exists to find: for doc_id < 25, a prefix-2/3 and a suffix-2/3
    // variant — each ~2/3-Jaccard to its base (edge), ~1/3 to each other
    // (non-edge) — an open L–doc–R wedge per planted doc, built
    // identically in both engines from pure token slicing.
    //
    // 100 TB shape: one keyed 2-path self-join on the middle node (the
    // known Σ deg(m)² frontier cost of link prediction — bounded here
    // because the match graph is sparse by construction: its edges come
    // from df-capped gram overlap), one LEFT ANTI join against the edge
    // list to drop existing pairs, two keyed degree joins. Candidates,
    // not pairs-of-everything: only 2-hop pairs are ever materialized.
    QueryDef(
      "q217_link_prediction",
      s"""WITH pre AS (
         |  SELECT doc_id, string_split(text, ' ') AS t,
         |    len(string_split(text, ' ')) AS n,
         |    (2 * len(string_split(text, ' ')) + 2) // 3 AS k
         |  FROM documents
         |  WHERE doc_id < 25 AND len(string_split(text, ' ')) >= 9),
         |pl AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id + $LP_OFFSET_L,
         |    array_to_string(list_slice(t, 1, k), ' ') FROM pre
         |  UNION ALL SELECT doc_id + $LP_OFFSET_R,
         |    array_to_string(list_slice(t, n - k + 1, n), ' ') FROM pre),
         |${pairsSql("pl")},
         |und AS (SELECT doc_a AS u, doc_b AS v FROM jpairs
         |        UNION ALL SELECT doc_b, doc_a FROM jpairs),
         |deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS dg FROM und GROUP BY u),
         |p2 AS (SELECT n1.u AS a, n2.v AS b, CAST(COUNT(*) AS BIGINT) AS cn
         |       FROM und n1 JOIN und n2 ON n2.u = n1.v AND n1.u < n2.v
         |       GROUP BY n1.u, n2.v),
         |cand AS (SELECT p2.a, p2.b, p2.cn FROM p2
         |         LEFT JOIN jpairs j ON j.doc_a = p2.a AND j.doc_b = p2.b
         |         WHERE j.doc_a IS NULL)
         |SELECT c.a AS doc_a, c.b AS doc_b, c.cn AS common_neighbors,
         |  da.dg AS deg_a, db.dg AS deg_b,
         |  CAST(10000 * c.cn // (da.dg + db.dg - c.cn) AS BIGINT) AS nb_jaccard_bp
         |FROM cand c JOIN deg da ON da.u = c.a JOIN deg db ON db.u = c.b
         |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
      // persisted: both 2-path sides, the anti-join probe, and both
      // degree joins re-read the edge list
      val jp = jaccardPairsOf(plantedWedgeDocs(s, d))
        .select(col("doc_a").as("a"), col("doc_b").as("b")).persist()
      val und = jp.select(col("a").as("u"), col("b").as("v"))
        .unionAll(jp.select(col("b").as("u"), col("a").as("v")))
      val deg = und.groupBy("u").agg(count(lit(1)).as("dg"))
      val p2 = und.as("n1")
        .join(und.as("n2"),
          col("n2.u") === col("n1.v") && col("n1.u") < col("n2.v"))
        .groupBy(col("n1.u").as("a"), col("n2.v").as("b"))
        .agg(count(lit(1)).as("cn"))
      p2.join(jp, Seq("a", "b"), "left_anti")
        .join(deg.select(col("u").as("a"), col("dg").as("deg_a")), "a")
        .join(deg.select(col("u").as("b"), col("dg").as("deg_b")), "b")
        .select(col("a").as("doc_a"), col("b").as("doc_b"),
          col("cn").as("common_neighbors"), col("deg_a"), col("deg_b"),
          expr("10000 * cn div (deg_a + deg_b - cn)").as("nb_jaccard_bp"))
        .orderBy("doc_a", "doc_b")
    },

    // ---- q219: quality-based survivorship per near-dup cluster ---------------
    // q67 keeps the MIN-ID copy; real pipelines keep the BEST copy — the
    // document-level face of q190's golden-record survivorship, with the
    // survivor picked by q141's linear quality model
    // (TrainingPack.qualityLogitCol, shared so the model that classifies
    // is the model that selects; ties break on doc_id). Emits the
    // per-cluster ledger: survivor, its logit, and the worst member's
    // logit — the quality spread that motivates replacing min-id with
    // quality survivorship in the first place.
    //
    // 100 TB shape: the CC gives node-sized cluster state; the logit is
    // one map-side expression on the scan; the rank window partitions BY
    // CLUSTER (bounded partitions — never a global sort); one map-side-
    // combined per-cluster agg. The logit is the q141 e-notation IEEE
    // expression, bit-identical cross-engine, so ordering and the emitted
    // doubles replay exactly.
    QueryDef(
      "q219_quality_survivorship",
      s"""WITH RECURSIVE $PAIRS_SQL,
         |und AS (SELECT doc_a AS u, doc_b AS v FROM jpairs
         |        UNION ALL
         |        SELECT doc_b AS u, doc_a AS v FROM jpairs),
         |reach(u, v) AS (
         |  SELECT u, v FROM und
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u),
         |comp AS (SELECT u AS doc_id, least(u, MIN(v)) AS cluster_id
         |         FROM reach GROUP BY u),
         |f AS (SELECT doc_id, n_chars, ${TrainingPack.qualityExprsSql}
         |  FROM documents),
         |lg AS (SELECT doc_id,
         |    -3e0 + 2e-2 * ntok + 6e-1 * awl - 25e0 * symratio + 8e-1 * nstop AS logit
         |  FROM f),
         |m AS (SELECT c.cluster_id, c.doc_id, l.logit,
         |    ROW_NUMBER() OVER (PARTITION BY c.cluster_id
         |      ORDER BY l.logit DESC, c.doc_id) AS rn
         |  FROM comp c JOIN lg l USING (doc_id))
         |SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members,
         |  MAX(CASE WHEN rn = 1 THEN doc_id END) AS canonical_doc,
         |  MAX(CASE WHEN rn = 1 THEN logit END) AS canonical_logit,
         |  MIN(logit) AS min_logit
         |FROM m GROUP BY cluster_id
         |ORDER BY cluster_id""".stripMargin) { (s, d) =>
      val clusters = graft.operators.Components
        .connectedComponents(jaccardPairs(s, d).select("doc_a", "doc_b"),
          "doc_a", "doc_b")
        .select(col("id").as("doc_id"), col("component").as("cluster_id"))
      val lg = Tables.documents(s, d)
        .select(col("doc_id"), TrainingPack.qualityLogitCol.as("logit"))
      val w = Window.partitionBy("cluster_id")
        .orderBy(col("logit").desc, col("doc_id"))
      clusters.join(lg, "doc_id")
        .withColumn("rn", row_number().over(w))
        .groupBy("cluster_id")
        .agg(count(lit(1)).as("n_members"),
          max(when(col("rn") === 1, col("doc_id"))).as("canonical_doc"),
          max(when(col("rn") === 1, col("logit"))).as("canonical_logit"),
          min(col("logit")).as("min_logit"))
        .orderBy("cluster_id")
    },

    // ---- q220: positional phrase search --------------------------------------
    // The index feature q108's posting lists lack: EXACT phrase matching
    // needs token POSITIONS, and the match is position arithmetic — terms
    // t1 t2 t3 co-occur with pos, pos+1, pos+2 in one doc. Self-tuning
    // fixture: the phrase is the corpus's most frequent word trigram
    // (deterministic count-desc/lexicographic-asc top-1), so the query is
    // meaningful at any SF without a planted literal. The match runs the
    // way a positional index does: each term's postings are filtered
    // FIRST against the broadcast phrase row (three term-selective
    // streams, not a corpus-wide join), then two keyed (doc_id, pos)
    // equi-joins apply the adjacency arithmetic.
    //
    // 100 TB shape: the position table is one map-side posexplode; the
    // top-phrase model is a map-side-combined count + a 1-row broadcast;
    // each postings stream is pre-filtered to one term before joining, so
    // join inputs are term-frequency-sized, not corpus-sized; the final
    // per-doc agg is map-side combined. No windows, no sorts beyond the
    // output ORDER BY.
    QueryDef(
      "q220_phrase_search",
      """WITH toksrc AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |toks AS (
        |  SELECT doc_id, u.pos AS pos, u.tok AS tok FROM (
        |    SELECT doc_id,
        |      unnest(list_transform(range(1, len(t) + 1),
        |        i -> {pos: i, tok: t[i]})) AS u
        |    FROM toksrc)),
        |tri AS (
        |  SELECT unnest(list_transform(range(1, len(t) - 1),
        |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
        |  FROM toksrc WHERE len(t) >= 3),
        |top AS (SELECT g FROM (SELECT g, COUNT(*) AS c FROM tri GROUP BY g)
        |        ORDER BY c DESC, g LIMIT 1),
        |pw AS (SELECT string_split(g, ' ')[1] AS w1,
        |       string_split(g, ' ')[2] AS w2,
        |       string_split(g, ' ')[3] AS w3, g FROM top),
        |hits AS (
        |  SELECT a.doc_id, a.pos, pw.g FROM toks a
        |  JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        |  JOIN toks c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
        |  CROSS JOIN pw
        |  WHERE a.tok = pw.w1 AND b.tok = pw.w2 AND c.tok = pw.w3)
        |SELECT doc_id, ANY_VALUE(g) AS phrase,
        |  CAST(COUNT(*) AS BIGINT) AS n_occ,
        |  CAST(MIN(pos) AS BIGINT) AS first_pos
        |FROM hits
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      // postings scanned by the top-phrase build and all three term
      // streams — persisted
      val toks = Tables.documentsSpread(s, d)
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("p0", "tok")))
        .select(col("doc_id"), (col("p0") + 1).as("pos"), col("tok"))
        .persist()
      val tarr = col("t")
      val tri = Tables.documentsSpread(s, d)
        .select(split(col("text"), " ").as("t"))
        .filter(size(tarr) >= 3)
        .select(explode(transform(sequence(lit(1), size(tarr) - 2), i =>
          concat_ws(" ", element_at(tarr, i), element_at(tarr, i + 1),
            element_at(tarr, i + 2)))).as("g"))
      val top = tri.groupBy("g").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("g")).limit(1)
      val pw = top.select(element_at(split(col("g"), " "), 1).as("w1"),
        element_at(split(col("g"), " "), 2).as("w2"),
        element_at(split(col("g"), " "), 3).as("w3"), col("g"))
      def term(w: String, posAs: String) = toks.crossJoin(broadcast(pw))
        .filter(col("tok") === col(w))
        .select(col("doc_id"), col("pos").as(posAs),
          if (w == "w1") col("g") else lit(null).as("__drop"))
        .drop("__drop")
      val a = term("w1", "pos")
      val b = term("w2", "posb").select(col("doc_id").as("doc_b"), col("posb"))
      val c = term("w3", "posc").select(col("doc_id").as("doc_c"), col("posc"))
      a.join(b, col("doc_b") === col("doc_id") && col("posb") === col("pos") + 1)
        .join(c, col("doc_c") === col("doc_id") && col("posc") === col("pos") + 2)
        .groupBy("doc_id")
        .agg(first(col("g")).as("phrase"), count(lit(1)).as("n_occ"),
          min(col("pos")).cast("long").as("first_pos"))
        .orderBy("doc_id")
    },

    // ---- q221: URL canonicalization dedup ------------------------------------
    // Crawl dedup's FIRST line of defense, upstream of any content hash:
    // the same page arrives under many URL spellings (scheme/host case,
    // www. prefix, default :443 port, trailing slash, tracking params in
    // varying order, fragments). Each doc gets a deterministically-varied
    // raw URL over a planted canonical identity (g = doc_id % 200 drives
    // host+path+kept-param, so every variant class collides back to one
    // known form); the canonicalizer then lowercases scheme+host ONLY
    // (path case is significant in real URLs), strips the default port /
    // www. prefix / fragment / trailing slash, drops utm_*/gclid/fbclid
    // params and sorts the survivors. Self-verifying like q82: recovered=1
    // iff the canonical equals the planted expected form, group-wide.
    //
    // 100 TB shape: canonicalization is pure map-side string work riding
    // the scan; the only shuffle is the groupBy on the canonical key (the
    // dedup aggregation itself, partially aggregated map-side except the
    // exact DISTINCT raw count, which needs the group's rows — acceptable
    // because group size = variants-per-page, not corpus-sized). No joins,
    // no windows.
    QueryDef(
      "q221_url_canonical_dedup", URL_DEDUP_ORACLE) { (s, d) =>
      canonicalUrls(Tables.documentsSpread(s, d))
        .groupBy("canonical_url")
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("keep_id"),
          countDistinct(col("url")).as("n_raw"),
          min(when(col("canonical_url") === col("expected"), 1L).otherwise(0L))
            .as("recovered"))
        .orderBy("canonical_url")
    },

    // ---- q225: streaming incremental URL dedup -------------------------------
    // q221 made incremental — the q216/q205 shared-oracle pairing applied
    // to crawl ingest: each micro-batch of documents reduces to its own
    // (canonical_url, url) increment rows — cnt / min_id / recovered are
    // all mergeable (sum, min, min) — persisted under batch_id (idempotent
    // dynamic overwrite under foreachBatch's at-least-once replay). The
    // final ledger sum/min-merges the stored increments per (canonical,
    // url), then folds to canonical groups, so the streaming gate
    // hash-matches batch q221's oracle VERBATIM no matter how ingest was
    // batched. The n_raw distinct count — NOT sum-mergeable — is what
    // forces the two-level state: distinct raw spellings are the state
    // rows themselves (bounded by variants-per-page), and the count falls
    // out of the final per-canonical fold for free.
    //
    // 100 TB shape: O(distinct (canonical,url) in batch) state written per
    // batch, O(batches · variants) total, zero re-reads of ingest
    // history; the merge is two keyed aggs over the increment store.
    QueryDef(
      "q225_stream_url_dedup", URL_DEDUP_ORACLE) { (s, d) =>
      val srcDir = stagedDocBatches(s, d)
      val store = clearedStore(d, "graft-q225-url-")
      val schema = s.read.parquet(srcDir).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(srcDir)
      graft.streaming.Streams.runForeachBatch(s, stream, (batch, batchId) =>
        canonicalUrls(batch)
          .groupBy("canonical_url", "url")
          .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("min_id"),
            min(when(col("canonical_url") === col("expected"), 1L)
              .otherwise(0L)).as("rec"))
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(store.toString))
      s.read.parquet(store.toString)
        .groupBy("canonical_url", "url")
        .agg(sum(col("cnt")).as("cnt"), min(col("min_id")).as("min_id"),
          min(col("rec")).as("rec"))
        .groupBy("canonical_url")
        .agg(sum(col("cnt")).as("n_docs"), min(col("min_id")).as("keep_id"),
          count(lit(1)).as("n_raw"), min(col("rec")).as("recovered"))
        .orderBy("canonical_url")
    },

    // ---- q232: per-domain crawl quota ----------------------------------------
    // The politeness/diversity cap a crawl scheduler enforces over q226's
    // registered domains: keep at most K documents per domain, survivors
    // chosen by a deterministic salted-hash priority (so re-runs and
    // re-partitions elect the SAME survivors — a crawl quota that churns
    // its keep-set re-crawls the diff every time). K=3 binds at every SF
    // (the fixture's domain classes carry ≥4 docs).
    //
    // 100 TB shape: the selection is the q136/TopKRows discipline —
    // fixed-k mergeable state per (domain, map partition), shuffle
    // carries ≤ K rows per group per partition, NEVER a per-domain sort
    // (the window formulation is the oracle, not the engine path). The
    // 48-bit md5-prefix priority is exact in a double, so the aggregator
    // tiebreak (score desc = priority asc, doc_id) replays the oracle's
    // ORDER BY bit-for-bit.
    QueryDef(
      "q232_domain_quota", DOMAIN_QUOTA_ORACLE) { (s, d) =>
      quotaTopK(quotaProject(Tables.documentsSpread(s, d)))
        .orderBy("regdom", "rk")
    },

    // ---- q235: streaming incremental per-domain crawl quota -------------------
    // q232 maintained as the crawl streams in — the q225/q227 shared-oracle
    // pairing applied to the quota: fixed-K selection is MERGEABLE
    // (top-K of a union == top-K of per-part top-Ks), so each micro-batch
    // reduces to ≤ K candidate rows per domain (its own TopKRows pass),
    // persisted under batch_id (idempotent dynamic overwrite under
    // foreachBatch's at-least-once replay); the final fold re-takes top-K
    // over the candidate store. Hash-matches batch q232's oracle VERBATIM
    // no matter how ingest was batched — the scheduler's keep-set is
    // stable across restarts by construction (same salted priority, same
    // merge identity).
    //
    // 100 TB shape: state is ≤ K rows per (domain, batch) — the quota's
    // own output asymptotics, never the crawl history; both the per-batch
    // pass and the final fold are map-side-combined TopKRows aggs (no
    // window, no per-domain sort anywhere — the window formulation is the
    // oracle, not the engine path).
    QueryDef(
      "q235_stream_domain_quota", DOMAIN_QUOTA_ORACLE) { (s, d) =>
      val srcDir = stagedDocBatches(s, d)
      val store = clearedStore(d, "graft-q235-quota-")
      val schema = s.read.parquet(srcDir).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(srcDir)
      graft.streaming.Streams.runForeachBatch(s, stream, (batch, batchId) =>
        quotaTopK(quotaProject(batch))
          .select(col("regdom"), col("doc_id"), col("prio"))
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(store.toString))
      quotaTopK(s.read.parquet(store.toString)
          .select("regdom", "doc_id", "prio"))
        .orderBy("regdom", "rk")
    },

    // ---- q233: n-gram novelty score ------------------------------------------
    // The dedup diagnostic between exact-dup and near-dup: per document,
    // what fraction of its distinct 8-grams appears in NO other document?
    // Low novelty with no exact/near-dup match is the "stitched from
    // common text" signal (template farms, boilerplate mosaics) that
    // doc-level fingerprints miss. Integer basis points (the q192/q214
    // ledger discipline); docs shorter than 8 tokens have no grams and no
    // row — the honest answer.
    //
    // 100 TB shape: grams travel as fixed-width md5 hashes (the shuffle
    // key never carries text); the df count and the per-doc fold are both
    // map-side-combined aggs; the join back is keyed on the same hash.
    // Unlike the near-dup pair path there is NO self-join — novelty needs
    // df only, so the heaviest object is the gram-count table.
    QueryDef(
      "q233_ngram_novelty",
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |g AS (
        |  SELECT DISTINCT doc_id, gh FROM (
        |    SELECT doc_id,
        |      unnest(list_transform(range(1, len(tk) - 6),
        |        i -> md5(array_to_string(tk[i:i+7], ' ')))) AS gh
        |    FROM t WHERE len(tk) >= 8)),
        |df AS (SELECT gh, COUNT(*) AS dfc FROM g GROUP BY gh)
        |SELECT doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_grams,
        |  CAST(SUM(CASE WHEN dfc = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
        |  CAST(10000 * SUM(CASE WHEN dfc = 1 THEN 1 ELSE 0 END) // COUNT(*)
        |    AS BIGINT) AS novelty_bp
        |FROM g JOIN df USING (gh)
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val tk = col("tk")
      val g = Tables.documentsSpread(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
        .filter(size(tk) >= 8)
        .select(col("doc_id"),
          explode(transform(sequence(lit(1), size(tk) - 7), i =>
            md5(concat_ws(" ", slice(tk, i, lit(8)))))).as("gh"))
        .distinct()
        .persist()
      val df = g.groupBy("gh").agg(count(lit(1)).as("dfc"))
      g.join(df, "gh")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("dfc") === 1, 1L).otherwise(0L)).as("n_unique"))
        .select(col("doc_id"), col("n_grams"), col("n_unique"),
          expr("10000 * n_unique div n_grams").as("novelty_bp"))
        .orderBy("doc_id")
    },

    // ---- q228: multi-phrase blocklist scan -----------------------------------
    // q220 generalized from one phrase to a phrase TABLE — the deny-list
    // filter every corpus runs (toxic phrases, banned boilerplate,
    // known-leak strings): find every positional occurrence of ANY listed
    // phrase in one pass. Self-tuning like q220: the blocklist is the
    // corpus's own top-5 word bigrams (count-desc/lexicographic top-5),
    // so the query is meaningful at any SF without planted literals. The
    // match is the positional-index shape: postings pre-filter against
    // the BROADCAST blocklist's first words (a semi-join, not a literal
    // — the part q220's single phrase couldn't exercise), then one keyed
    // (doc_id, pos) adjacency join verifies the second word. Policy: a
    // doc with ≥ 2 hits is blocked.
    //
    // 100 TB shape: postings are one map-side posexplode (persisted —
    // the bigram model and both match streams share it); the blocklist
    // model is a map-side-combined count + 5-row broadcast; match
    // streams are first-word-selective before the adjacency equi-join;
    // the per-doc agg is map-side combined. No windows, no corpus sort.
    QueryDef(
      "q228_phrase_blocklist",
      """WITH toksrc AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |toks AS (
        |  SELECT doc_id, u.pos AS pos, u.tok AS tok FROM (
        |    SELECT doc_id,
        |      unnest(list_transform(range(1, len(t) + 1),
        |        i -> {pos: i, tok: t[i]})) AS u
        |    FROM toksrc)),
        |bi AS (
        |  SELECT unnest(list_transform(range(1, len(t)),
        |    i -> t[i] || ' ' || t[i+1])) AS g
        |  FROM toksrc WHERE len(t) >= 2),
        |bl AS (
        |  SELECT g, string_split(g, ' ')[1] AS w1, string_split(g, ' ')[2] AS w2
        |  FROM (SELECT g, COUNT(*) AS c FROM bi GROUP BY g
        |        ORDER BY c DESC, g LIMIT 5)),
        |hits AS (
        |  SELECT a.doc_id, bl.g FROM toks a
        |  JOIN bl ON a.tok = bl.w1
        |  JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        |             AND b.tok = bl.w2)
        |SELECT doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_hits,
        |  CAST(COUNT(DISTINCT g) AS BIGINT) AS n_phrases,
        |  MIN(g) AS top_phrase,
        |  CAST(CASE WHEN COUNT(*) >= 2 THEN 1 ELSE 0 END AS BIGINT) AS blocked
        |FROM hits
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val toks = Tables.documentsSpread(s, d)
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("p0", "tok")))
        .select(col("doc_id"), (col("p0") + 1).as("pos"), col("tok"))
        .persist()
      val tarr = col("t")
      val bl = Tables.documentsSpread(s, d)
        .select(split(col("text"), " ").as("t"))
        .filter(size(tarr) >= 2)
        .select(explode(transform(sequence(lit(1), size(tarr) - 1), i =>
          concat_ws(" ", element_at(tarr, i), element_at(tarr, i + 1))))
          .as("g"))
        .groupBy("g").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("g")).limit(5)
        .select(col("g"),
          element_at(split(col("g"), " "), 1).as("w1"),
          element_at(split(col("g"), " "), 2).as("w2"))
      val a = toks.join(broadcast(bl), col("tok") === col("w1"))
        .select(col("doc_id"), col("pos"), col("w2"), col("g"))
      val b = toks.select(col("doc_id").as("doc_b"), col("pos").as("pos_b"),
        col("tok").as("tok_b"))
      a.join(b, col("doc_b") === col("doc_id") && col("pos_b") === col("pos") + 1
          && col("tok_b") === col("w2"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_hits"),
          countDistinct(col("g")).as("n_phrases"),
          min(col("g")).as("top_phrase"))
        .select(col("doc_id"), col("n_hits"), col("n_phrases"),
          col("top_phrase"),
          when(col("n_hits") >= 2, 1L).otherwise(0L).as("blocked"))
        .orderBy("doc_id")
    },

    // ---- q226: registered-domain rollup with longest-suffix match ------------
    // The eTLD+1 grouping every crawl pipeline needs before per-domain
    // quotas or blocklists: 'cdn.assets.site3.co.uk' belongs to
    // 'site3.co.uk', and deriving that requires LONGEST-match against a
    // public-suffix list ('co.uk' must beat its own suffix 'uk' — naive
    // TLD split yields the wrong registrant for every ccTLD-second-level
    // host). Hosts are planted over 4 subdomain classes × 3 suffix
    // classes with the expected registered domain carried alongside
    // (recovered=1 iff derivation matches the plant, group-wide); a
    // 3-entry blocklist marks domains the corpus must drop.
    //
    // 100 TB shape: the suffix list is a tiny broadcast (the real PSL is
    // ~9k rows — still broadcast-sized); the longest-match is a
    // broadcast nested-loop ends_with join + one per-doc struct-max agg
    // (no window, no corpus sort); the rollup is one keyed agg on the
    // registered domain. Blocklist membership is a literal IN over the
    // broadcast list.
    QueryDef(
      "q226_registered_domain",
      """WITH hosts AS (
        |  SELECT doc_id,
        |    (CASE WHEN doc_id % 7 < 2 THEN ''
        |          WHEN doc_id % 7 < 4 THEN 'www.'
        |          WHEN doc_id % 7 < 6 THEN 'cdn.assets.'
        |          ELSE 'm.' END) ||
        |    'site' || CAST(doc_id % 40 AS VARCHAR) || '.' ||
        |    (CASE doc_id % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'co.uk'
        |          ELSE 'org' END) AS host,
        |    'site' || CAST(doc_id % 40 AS VARCHAR) || '.' ||
        |    (CASE doc_id % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'co.uk'
        |          ELSE 'org' END) AS expected
        |  FROM documents),
        |sfx(s) AS (VALUES ('com'), ('org'), ('uk'), ('co.uk')),
        |m AS (
        |  SELECT doc_id, host, expected, s,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id
        |      ORDER BY len(s) DESC, s) AS rk
        |  FROM hosts JOIN sfx ON ends_with(host, '.' || s)),
        |reg AS (
        |  SELECT doc_id, host, expected,
        |    regexp_extract(substring(host, 1, len(host) - len(s) - 1),
        |      '([^.]+)$', 1) || '.' || s AS regdom,
        |    s AS suffix
        |  FROM m WHERE rk = 1)
        |SELECT regdom, MIN(suffix) AS suffix,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(COUNT(DISTINCT host) AS BIGINT) AS n_hosts,
        |  CAST(CASE WHEN regdom IN ('site7.com', 'site13.co.uk', 'site21.org')
        |    THEN 1 ELSE 0 END AS BIGINT) AS blocked,
        |  CAST(MIN(CASE WHEN regdom = expected THEN 1 ELSE 0 END) AS BIGINT)
        |    AS recovered
        |FROM reg
        |GROUP BY regdom
        |ORDER BY regdom""".stripMargin) { (s, d) =>
      val did = col("doc_id")
      val suffix = when(did % 3 === 0, lit("com"))
        .when(did % 3 === 1, lit("co.uk")).otherwise(lit("org"))
      val expected = concat(lit("site"), (did % 40).cast("string"),
        lit("."), suffix)
      val host = concat(
        when(did % 7 < 2, lit("")).when(did % 7 < 4, lit("www."))
          .when(did % 7 < 6, lit("cdn.assets.")).otherwise(lit("m.")),
        expected)
      import s.implicits._
      val sfx = Seq("com", "org", "uk", "co.uk").toDF("s")
      val m = Tables.documentsSpread(s, d)
        .select(did, host.as("host"), expected.as("expected"))
        .join(broadcast(sfx),
          col("host").endsWith(concat(lit("."), col("s"))))
      val best = m.groupBy("doc_id", "host", "expected")
        .agg(max(struct(length(col("s")).as("l"), col("s").as("s"))).as("b"))
        .select(col("doc_id"), col("host"), col("expected"),
          col("b").getField("s").as("s"))
      val regdom = concat(
        regexp_extract(
          expr("substring(host, 1, length(host) - length(s) - 1)"),
          "([^.]+)$", 1),
        lit("."), col("s"))
      best
        .select(col("host"), col("expected"), col("s").as("suffix"),
          regdom.as("regdom"))
        .groupBy("regdom")
        .agg(min(col("suffix")).as("suffix"),
          count(lit(1)).as("n_docs"),
          countDistinct(col("host")).as("n_hosts"),
          min(when(col("regdom") === col("expected"), 1L).otherwise(0L))
            .as("recovered"))
        .select(col("regdom"), col("suffix"), col("n_docs"), col("n_hosts"),
          when(col("regdom").isin("site7.com", "site13.co.uk", "site21.org"),
            1L).otherwise(0L).as("blocked"),
          col("recovered"))
        .orderBy("regdom")
    },

    // ---- q224: cross-source token-overlap matrix -----------------------------
    // The corpus-composition audit run before mixing sources into one
    // training set: for every source pair, how much vocabulary do they
    // share? Emits exact |A∩B| plus Jaccard and containment
    // (overlap-coefficient) as integer basis points — the all-integer
    // ledger discipline of q192/q214, so both engines agree bit-for-bit.
    // High containment of a small source inside a big one is the
    // "this source is a subset crawl of that one" signal that pure
    // doc-level dedup misses.
    //
    // 100 TB shape: the distinct (source, token) projection is one
    // map-side-combined aggregation; the pair join is keyed on token with
    // per-key fan-out bounded by the SOURCE dimension (≤ C(|sources|,2)
    // pairs per token — a catalog-bounded constant, never corpus-sized);
    // per-source vocabulary sizes are a tiny broadcast into the final
    // 190-row ledger. The projection is persisted — it feeds the size agg
    // and both join sides from one computation.
    QueryDef(
      "q224_source_overlap_matrix", SRC_OVERLAP_ORACLE) { (s, d) =>
      overlapMatrix(
        Tables.documentsSpread(s, d)
          .select(col("source"), explode(split(col("text"), " ")).as("tok"))
          .distinct()
          .persist())
    },

    // ---- q227: streaming incremental source-overlap matrix -------------------
    // q224 made incremental — the corpus-composition audit maintained as
    // sources stream in: each micro-batch writes its own DISTINCT
    // (source, token) projection under batch_id (idempotent dynamic
    // overwrite; distinct is NOT sum-mergeable, so — as in q225 — the
    // state rows ARE the distinct pairs and the merge is a set union,
    // i.e. one more distinct over the increment store). The final matrix
    // then runs the identical pair-join ledger, so the streamed audit
    // hash-matches batch q224's oracle VERBATIM however ingest was
    // batched. State is vocabulary-sized — the same asymptotics as the
    // batch audit's own intermediate, never corpus-sized.
    QueryDef(
      "q227_stream_overlap_matrix", SRC_OVERLAP_ORACLE) { (s, d) =>
      val srcDir = stagedDocBatches(s, d)
      val store = clearedStore(d, "graft-q227-ovl-")
      val schema = s.read.parquet(srcDir).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(srcDir)
      graft.streaming.Streams.runForeachBatch(s, stream, (batch, batchId) =>
        batch
          .select(col("source"), explode(split(col("text"), " ")).as("tok"))
          .distinct()
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(store.toString))
      overlapMatrix(
        s.read.parquet(store.toString)
          .select(col("source"), col("tok"))
          .distinct()
          .persist())
    },

    // ---- q244: prefix-fingerprint truncation sweep ----------------------------
    // The ingest-cost policy q214 doesn't measure: at 100 TB, hashing
    // every document's FULL text for MinHash is a real fraction of the
    // ingest bill, and the standing shortcut is to fingerprint only the
    // document HEAD. This query measures what that costs: for each
    // truncation level (first 32 / 64 / 128 tokens), run the q28
    // construction (16 salted-md5 minhashes, 4 bands, occupancy-capped
    // buckets) over the TRUNCATED text and score its candidates against
    // the FULL-TEXT exact-Jaccard truth (PAIRS_SQL verbatim) — candidate
    // volume, recall and precision in exact integer basis points, one
    // row per level. Truncated fingerprints use uncapped distinct grams
    // (a ≤L-token prefix carries ≤L-2 grams; the df cap is a full-corpus
    // cost guard, and bucket occupancy is capped separately, per level).
    //
    // 100 TB shape: the sweep costs 3 gram projections bounded by the
    // truncation levels (the 32-token pass reads ~3% of the text bytes —
    // the actual payoff being measured), one unioned band build with the
    // (lvl, band, bh)-keyed occupancy cap, the keyed bucket self-join,
    // and a keyed truth join; the ledger is one map-side-combined count
    // per level. Nothing quadratic, nothing uncapped.
    QueryDef(
      "q244_prefix_fingerprint_sweep", {
        val mhCols = (0 until 16).map(i =>
          s"MIN(substring(md5('${i / 4}:' || gram), ${(i % 4) * 8 + 1}, 8)) AS mh$i")
          .mkString(",\n    ")
        val lvlBlocks = PREFIX_FP_LEVELS.map { l =>
          val bandSel = (0 until 4).map { b =>
            val cat = (b * 4 until b * 4 + 4).map(k => s"mh$k").mkString(" || ")
            s"SELECT doc_id, $b AS band, md5($cat) AS bh FROM mh$l"
          }.mkString("\n  UNION ALL\n  ")
          s"""g$l AS (
             |  SELECT DISTINCT doc_id,
             |    unnest(list_transform(range(1, len(tk4) - 1),
             |      i -> tk4[i] || ' ' || tk4[i+1] || ' ' || tk4[i+2])) AS gram
             |  FROM (SELECT doc_id, tk[1:$l] AS tk4 FROM tkt)
             |  WHERE len(tk4) >= 3),
             |mh$l AS (SELECT doc_id,
             |    $mhCols
             |  FROM g$l GROUP BY doc_id),
             |sb$l AS (
             |  $bandSel),
             |sbc$l AS (SELECT doc_id, band, bh FROM (
             |            SELECT *, COUNT(*) OVER (PARTITION BY band, bh) AS n
             |            FROM sb$l)
             |          WHERE n <= $MAX_BUCKET),
             |cand$l AS (SELECT DISTINCT CAST($l AS BIGINT) AS lvl,
             |             s1.doc_id AS doc_a, s2.doc_id AS doc_b
             |           FROM sbc$l s1 JOIN sbc$l s2
             |             ON s1.band = s2.band AND s1.bh = s2.bh
             |            AND s1.doc_id < s2.doc_id)""".stripMargin
        }.mkString(",\n")
        val candUnion = PREFIX_FP_LEVELS
          .map(l => s"SELECT * FROM cand$l").mkString(" UNION ALL ")
        s"""WITH $PAIRS_SQL,
           |tkt AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
           |$lvlBlocks,
           |cand AS ($candUnion),
           |tr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM jpairs),
           |per AS (
           |  SELECT lvl, CAST(COUNT(*) AS BIGINT) AS n_candidates,
           |    CAST(SUM(CASE WHEN j.doc_a IS NOT NULL THEN 1 ELSE 0 END)
           |      AS BIGINT) AS n_caught
           |  FROM cand c LEFT JOIN jpairs j
           |    ON j.doc_a = c.doc_a AND j.doc_b = c.doc_b
           |  GROUP BY lvl)
           |SELECT lvl, n_candidates, n_truth, n_caught,
           |  CAST(CASE WHEN n_truth = 0 THEN 0
           |    ELSE 10000 * n_caught // n_truth END AS BIGINT) AS recall_bp,
           |  CAST(CASE WHEN n_candidates = 0 THEN 0
           |    ELSE 10000 * n_caught // n_candidates END AS BIGINT)
           |    AS precision_bp
           |FROM per CROSS JOIN tr
           |ORDER BY lvl""".stripMargin
      }) { (s, d) =>
      val tk = split(col("text"), " ")
      val mhAggs = (0 until 16).map(i =>
        min(substring(md5(concat(lit(s"${i / 4}:"), col("gram"))),
          (i % 4) * 8 + 1, 8)).as(s"mh$i"))
      val sb = PREFIX_FP_LEVELS.map { l =>
        val tk4 = col("tk4")
        val mh = Tables.documentsSpread(s, d)
          .select(col("doc_id"), slice(tk, 1, l).as("tk4"))
          .filter(size(tk4) >= 3)
          .select(col("doc_id"),
            explode(array_distinct(transform(
              sequence(lit(1), size(tk4) - 2),
              i => concat_ws(" ", element_at(tk4, i), element_at(tk4, i + 1),
                element_at(tk4, i + 2))))).as("gram"))
          .groupBy("doc_id").agg(mhAggs.head, mhAggs.tail: _*)
        (0 until 4).map { b =>
          mh.select(lit(l.toLong).as("lvl"), col("doc_id"),
            lit(b.toLong).as("band"),
            md5(concat((b * 4 until b * 4 + 4).map(k => col(s"mh$k")): _*))
              .as("bh"))
        }.reduce(_ unionByName _)
      }.reduce(_ unionByName _)
      val sbc = graft.operators.Occupancy.cap(
        sb, Seq("lvl", "band", "bh"), MAX_BUCKET, persistResult = true)
      val cand = sbc.as("s1")
        .join(sbc.as("s2"),
          col("s1.lvl") === col("s2.lvl") && col("s1.band") === col("s2.band")
            && col("s1.bh") === col("s2.bh")
            && col("s1.doc_id") < col("s2.doc_id"))
        .select(col("s1.lvl").as("lvl"), col("s1.doc_id").as("doc_a"),
          col("s2.doc_id").as("doc_b"))
        .distinct()
      val truth = jaccardPairs(s, d).select("doc_a", "doc_b").persist()
      val nTruth = truth.agg(count(lit(1)).as("n_truth"))
      cand
        .join(truth.withColumn("hit", lit(1L)), Seq("doc_a", "doc_b"), "left")
        .groupBy("lvl")
        .agg(count(lit(1)).as("n_candidates"),
          sum(when(col("hit").isNotNull, 1L).otherwise(0L)).as("n_caught"))
        .crossJoin(broadcast(nTruth))
        .select(col("lvl"), col("n_candidates"), col("n_truth"),
          col("n_caught"),
          when(col("n_truth") === 0, 0L)
            .otherwise(expr("10000 * n_caught div n_truth")).as("recall_bp"),
          when(col("n_candidates") === 0, 0L)
            .otherwise(expr("10000 * n_caught div n_candidates"))
            .as("precision_bp"))
        .orderBy("lvl")
    },

    // ---- q234: cluster-aware leakage-free train/val split --------------------
    // q68 splits at the DOCUMENT level; with near-duplicates in the corpus
    // that leaks: a doc in train and its 0.9-Jaccard twin in val inflates
    // every eval number. The split policy corpus builds actually need
    // assigns whole NEAR-DUP CLUSTERS (q67's CC over the exact-Jaccard
    // pair graph) to a side: split = md5₆₀(salt:cluster_id) mod 10 < 8 →
    // train, else val. The ledger proves the property instead of assuming
    // it: leaked_pairs joins every near-dup pair against the CLUSTER
    // assignment (0 by construction — but computed, not asserted) while
    // naive_leaked_pairs runs the SAME pairs against the doc-level rule
    // with the same salt — the measured cost of splitting naively, the
    // q192/q214 "make the policy a measurement" discipline.
    //
    // 100 TB shape: cluster structure is operators.Components (O(log² n)
    // keyed rounds, node-sized state); the assignment is one LEFT join
    // against the node-sized cluster table + pure map-side hashing (docs
    // outside any pair default to singleton clusters); the leak audit is
    // two keyed joins on the pair ends; the per-split ledger is a
    // map-side-combined agg + one broadcast scalar row. Pair history is
    // scanned once, never re-read after the CC.
    QueryDef(
      "q234_cluster_split",
      s"""WITH RECURSIVE $PAIRS_SQL,
         |und AS (SELECT doc_a AS u, doc_b AS v FROM jpairs
         |        UNION ALL
         |        SELECT doc_b AS u, doc_a AS v FROM jpairs),
         |reach(u, v) AS (
         |  SELECT u, v FROM und
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u),
         |comp AS (SELECT u AS doc_id, least(u, MIN(v)) AS cluster_id
         |         FROM reach GROUP BY u),
         |asg AS (
         |  SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
         |    CASE WHEN ('0x' || substring(md5('$CAS_SALT:' ||
         |        CAST(COALESCE(c.cluster_id, d.doc_id) AS VARCHAR)), 1, 15))::BIGINT
         |        % 10 < 8 THEN 'train' ELSE 'val' END AS split,
         |    CASE WHEN ('0x' || substring(md5('$CAS_SALT:' ||
         |        CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
         |        % 10 < 8 THEN 'train' ELSE 'val' END AS naive_split
         |  FROM documents d
         |  LEFT JOIN comp c ON c.doc_id = d.doc_id),
         |lk AS (
         |  SELECT
         |    CAST(COALESCE(SUM(CASE WHEN a.split <> b.split
         |      THEN 1 ELSE 0 END), 0) AS BIGINT) AS leaked_pairs,
         |    CAST(COALESCE(SUM(CASE WHEN a.naive_split <> b.naive_split
         |      THEN 1 ELSE 0 END), 0) AS BIGINT) AS naive_leaked_pairs
         |  FROM jpairs p
         |  JOIN asg a ON a.doc_id = p.doc_a
         |  JOIN asg b ON b.doc_id = p.doc_b)
         |SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
         |  leaked_pairs, naive_leaked_pairs
         |FROM asg CROSS JOIN lk
         |GROUP BY split, leaked_pairs, naive_leaked_pairs
         |ORDER BY split""".stripMargin) { (s, d) =>
      // pairs feed the CC *and* the leak audit — persisted once
      val pairs = jaccardPairs(s, d).select("doc_a", "doc_b").persist()
      val clusters = graft.operators.Components
        .connectedComponents(pairs, "doc_a", "doc_b")
        .select(col("id").as("doc_id"), col("component").as("cid"))
      def h(c: org.apache.spark.sql.Column) =
        conv(substring(md5(concat(lit(s"$CAS_SALT:"),
          c.cast("string"))), 1, 15), 16, 10).cast("long")
      val sideOf = (c: org.apache.spark.sql.Column) =>
        when(h(c) % 10 < 8, "train").otherwise("val")
      val asg = Tables.documents(s, d).select("doc_id")
        .join(clusters, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cid"), col("doc_id")).as("cluster_id"))
        .withColumn("split", sideOf(col("cluster_id")))
        .withColumn("naive_split", sideOf(col("doc_id")))
        .persist()
      val lk = pairs
        .join(asg.select(col("doc_id").as("doc_a"), col("split").as("sa"),
          col("naive_split").as("nsa")), "doc_a")
        .join(asg.select(col("doc_id").as("doc_b"), col("split").as("sb"),
          col("naive_split").as("nsb")), "doc_b")
        .agg(
          coalesce(sum(when(col("sa") =!= col("sb"), 1L).otherwise(0L)),
            lit(0L)).as("leaked_pairs"),
          coalesce(sum(when(col("nsa") =!= col("nsb"), 1L).otherwise(0L)),
            lit(0L)).as("naive_leaked_pairs"))
      asg.groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("cluster_id")).as("n_clusters"))
        .crossJoin(broadcast(lk))
        .orderBy("split")
    },

    // ---- q242: corpus-assembly waterfall with per-doc drop attribution ------
    // The three keep/drop policies this pack proves in isolation — exact
    // dedup (q22's min-id-per-md5), near-dup cluster sampling (q210's
    // 1/|cluster| derandomized rule), per-domain quota (q232's salted-
    // priority top-K) — composed in the order a corpus build actually
    // runs them, with every document attributed to the FIRST stage that
    // dropped it. This is the waterfall table every dataset card reports
    // ("started with N, exact dedup removed X, near-dup sampling Y,
    // domain caps Z"), as one auditable per-doc plan: later stages see
    // only earlier stages' survivors (the near-dup graph is built over
    // exact-dedup survivors; the quota ranks only sampling survivors),
    // so the attribution is causal, not three independent flags.
    //
    // 100 TB shape: stage 1 is one map-side-combined min per content
    // hash; stage 2 is the q210 CC (node-sized state) + map-side draw;
    // stage 3 is the q232 mergeable TopKRows selection over the
    // already-thinned survivor set; the final attribution is three keyed
    // LEFT joins against node-sized flag tables. Nothing rescans pair
    // history after the CC; the quota never sorts a domain.
    QueryDef(
      "q242_corpus_waterfall",
      s"""WITH RECURSIVE keep1 AS (
         |  SELECT doc_id, md5(text) AS fp,
         |    MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep
         |  FROM documents),
         |survivors AS (
         |  SELECT d.* FROM documents d
         |  JOIN keep1 k ON k.doc_id = d.doc_id AND k.doc_id = k.keep),
         |${pairsSql("survivors")},
         |und AS (SELECT doc_a AS u, doc_b AS v FROM jpairs
         |        UNION ALL
         |        SELECT doc_b AS u, doc_a AS v FROM jpairs),
         |reach(u, v) AS (
         |  SELECT u, v FROM und
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u),
         |comp AS (SELECT u AS doc_id, least(u, MIN(v)) AS cluster_id
         |         FROM reach GROUP BY u),
         |csz AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS csize
         |        FROM comp GROUP BY cluster_id),
         |f2 AS (
         |  SELECT s.doc_id,
         |    CASE WHEN ('0x' || substring(md5('q242:' ||
         |        CAST(s.doc_id AS VARCHAR)), 1, 15))::BIGINT
         |      % CAST(COALESCE(z.csize, 1) AS BIGINT) = 0
         |    THEN 1 ELSE 0 END AS kept2
         |  FROM survivors s
         |  LEFT JOIN comp c ON c.doc_id = s.doc_id
         |  LEFT JOIN csz z ON z.cluster_id = c.cluster_id),
         |s2 AS (SELECT doc_id FROM f2 WHERE kept2 = 1),
         |q3 AS (
         |  SELECT doc_id,
         |    'site' || CAST(doc_id % 40 AS VARCHAR) || '.' ||
         |    (CASE doc_id % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'co.uk'
         |          ELSE 'org' END) AS regdom,
         |    ('0x' || substring(md5('q242q:' || CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
         |      AS prio
         |  FROM s2),
         |rk3 AS (
         |  SELECT doc_id,
         |    ROW_NUMBER() OVER (PARTITION BY regdom ORDER BY prio, doc_id)
         |      AS rk
         |  FROM q3),
         |f3 AS (SELECT doc_id FROM rk3 WHERE rk <= 3)
         |SELECT d.doc_id,
         |  CASE WHEN k.doc_id <> k.keep THEN 'exact_dup'
         |       WHEN f2.kept2 = 0 THEN 'cluster_sample'
         |       WHEN f3.doc_id IS NULL THEN 'domain_quota'
         |       ELSE 'kept' END AS status
         |FROM documents d
         |JOIN keep1 k ON k.doc_id = d.doc_id
         |LEFT JOIN f2 ON f2.doc_id = d.doc_id
         |LEFT JOIN f3 ON f3.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      val base = Tables.documentsSpread(s, d)
      val keep1 = base.select(col("doc_id"), md5(col("text")).as("fp"))
        .withColumn("keep", min(col("doc_id"))
          .over(org.apache.spark.sql.expressions.Window.partitionBy("fp")))
      // the min-per-fp window partitions by a content hash — group size =
      // copies-per-text, fixture-bounded; the oracle states the same form
      val surv = keep1.filter(col("doc_id") === col("keep"))
        .select("doc_id")
      val survDocs = base.join(surv, "doc_id").persist()
      val clusters = graft.operators.Components
        .connectedComponents(
          jaccardPairsOf(survDocs).select("doc_a", "doc_b"),
          "doc_a", "doc_b")
        .select(col("id").as("doc_id"), col("component").as("cid"))
      val csz = clusters.groupBy("cid").agg(count(lit(1)).as("csize"))
      val h2 = conv(substring(md5(concat(lit("q242:"),
        col("doc_id").cast("string"))), 1, 15), 16, 10).cast("long")
      val f2 = surv
        .join(clusters, Seq("doc_id"), "left")
        .join(csz, Seq("cid"), "left")
        .select(col("doc_id"),
          when(h2 % coalesce(col("csize"), lit(1L)) === 0L, 1L)
            .otherwise(0L).as("kept2"))
        .persist() // feeds the quota stage AND the final attribution
      val s2 = f2.filter(col("kept2") === 1L).select("doc_id")
      val regdom = concat(lit("site"), (col("doc_id") % 40).cast("string"),
        lit("."),
        when(col("doc_id") % 3 === 0, lit("com"))
          .when(col("doc_id") % 3 === 1, lit("co.uk")).otherwise(lit("org")))
      val prio = conv(substring(md5(concat(lit("q242q:"),
        col("doc_id").cast("string"))), 1, 12), 16, 10).cast("long")
      val topk = udaf(new graft.functions.TopKRows(3))
      val f3 = s2.select(regdom.as("regdom"), col("doc_id"), prio.as("prio"))
        .groupBy("regdom")
        .agg(topk((-col("prio")).cast("double"), col("doc_id"), lit(0L))
          .as("tk"))
        .select(explode(col("tk")).as("row"))
        .select(col("row._2").as("doc_id"), lit(1L).as("kept3"))
      keep1.select(col("doc_id"), col("keep"))
        .join(f2, Seq("doc_id"), "left")
        .join(f3, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("doc_id") =!= col("keep"), "exact_dup")
            .when(col("kept2") === 0L, "cluster_sample")
            .when(col("kept3").isNull, "domain_quota")
            .otherwise("kept").as("status"))
        .orderBy("doc_id")
    },

    // ---- q239: HLL inclusion-exclusion overlap vs q224's exact ledger --------
    // The calibration that decides whether the corpus-composition audit
    // can run on sketches: q224's exact |A∩B| costs a vocabulary-sized
    // shuffle per audit; the sketch path keeps 256 registers per source
    // (mergeable, the q204/q205 state) and estimates the intersection by
    // inclusion-exclusion — est(A) + est(B) − est(A∪B), where the union
    // sketch is just the per-bucket register MAX of the two sides (the
    // HLL property that makes this exact over sketches). Both the exact
    // ledger and the estimate are computed in ONE query and the signed
    // error lands in basis points — the q192/q214/q231 "measure the
    // policy" discipline applied to the sketch-vs-exact decision. Every
    // register is integer-replayed (the q204 rho discipline), every
    // estimate the same fixed IEEE expression, so even the ERROR column
    // hash-matches.
    //
    // 100 TB shape: the exact side is q224's (token-keyed pair join,
    // source-dimension-bounded fan-out); the sketch side is one map-side-
    // combined register max (≤ 256 rows per source survive any shuffle),
    // a catalog-bounded pair×register union fold, and broadcast attaches.
    // At audit time the production pipeline keeps ONLY the sketch path —
    // this query is the measured license for that substitution.
    QueryDef(
      "q239_hll_overlap_calibration",
      """WITH d AS (
        |  SELECT DISTINCT source, tok FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS tok
        |    FROM documents)),
        |sz AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY source),
        |pairs AS (
        |  SELECT a.source AS src_a, b.source AS src_b,
        |    CAST(COUNT(*) AS BIGINT) AS n_common
        |  FROM d a JOIN d b ON b.tok = a.tok AND a.source < b.source
        |  GROUP BY a.source, b.source),
        |hx AS (
        |  SELECT source, ('0x' || substring(md5(tok), 1, 2))::BIGINT AS j,
        |    ltrim(substring(md5(tok), 3, 12), '0') AS st
        |  FROM d),
        |reg AS (
        |  SELECT source, j, MAX(CASE WHEN st = '' THEN 49
        |    ELSE (12 - length(st)) * 4 +
        |      CASE WHEN instr('0123456789abcdef', substring(st, 1, 1)) - 1 >= 8 THEN 0
        |           WHEN instr('0123456789abcdef', substring(st, 1, 1)) - 1 >= 4 THEN 1
        |           WHEN instr('0123456789abcdef', substring(st, 1, 1)) - 1 >= 2 THEN 2
        |           ELSE 3 END + 1 END) AS m
        |  FROM hx GROUP BY source, j),
        |agg AS (
        |  SELECT source, CAST(256 - COUNT(*) AS BIGINT) AS v_zero,
        |    CAST(SUM(CAST(power(2, 49 - m) AS BIGINT))
        |      + (256 - COUNT(*)) * 562949953421312 AS BIGINT) AS s_reg
        |  FROM reg GROUP BY source),
        |hll AS (
        |  SELECT source,
        |    CAST(CAST(CASE WHEN e_raw <= CAST(640.0 AS DOUBLE) AND v_zero > 0
        |      THEN CAST(256.0 AS DOUBLE) * ln(CAST(256.0 AS DOUBLE) / CAST(v_zero AS DOUBLE))
        |      ELSE e_raw END AS DECIMAL(28,6)) AS DOUBLE) AS est_hll
        |  FROM (SELECT source, v_zero, s_reg,
        |      CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE)
        |          + CAST(1.079 AS DOUBLE) / CAST(256.0 AS DOUBLE))
        |        * CAST(65536.0 AS DOUBLE) * CAST(562949953421312.0 AS DOUBLE)
        |        / CAST(s_reg AS DOUBLE) AS e_raw
        |    FROM agg)),
        |ureg AS (
        |  SELECT p.src_a, p.src_b, r.j, MAX(r.m) AS m
        |  FROM pairs p JOIN reg r
        |    ON r.source = p.src_a OR r.source = p.src_b
        |  GROUP BY p.src_a, p.src_b, r.j),
        |uagg AS (
        |  SELECT src_a, src_b, CAST(256 - COUNT(*) AS BIGINT) AS v_zero,
        |    CAST(SUM(CAST(power(2, 49 - m) AS BIGINT))
        |      + (256 - COUNT(*)) * 562949953421312 AS BIGINT) AS s_reg
        |  FROM ureg GROUP BY src_a, src_b),
        |uhll AS (
        |  SELECT src_a, src_b,
        |    CAST(CAST(CASE WHEN e_raw <= CAST(640.0 AS DOUBLE) AND v_zero > 0
        |      THEN CAST(256.0 AS DOUBLE) * ln(CAST(256.0 AS DOUBLE) / CAST(v_zero AS DOUBLE))
        |      ELSE e_raw END AS DECIMAL(28,6)) AS DOUBLE) AS est_u
        |  FROM (SELECT src_a, src_b, v_zero, s_reg,
        |      CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE)
        |          + CAST(1.079 AS DOUBLE) / CAST(256.0 AS DOUBLE))
        |        * CAST(65536.0 AS DOUBLE) * CAST(562949953421312.0 AS DOUBLE)
        |        / CAST(s_reg AS DOUBLE) AS e_raw
        |    FROM uagg)),
        |est AS (
        |  SELECT p.src_a, p.src_b, p.n_common, sa.n AS n_a, sb.n AS n_b,
        |    ha.est_hll AS est_a, hb.est_hll AS est_b, u.est_u,
        |    CAST(CAST((ha.est_hll + hb.est_hll) - u.est_u AS DECIMAL(28,6))
        |      AS DOUBLE) AS est_common
        |  FROM pairs p
        |  JOIN sz sa ON sa.source = p.src_a
        |  JOIN sz sb ON sb.source = p.src_b
        |  JOIN hll ha ON ha.source = p.src_a
        |  JOIN hll hb ON hb.source = p.src_b
        |  JOIN uhll u ON u.src_a = p.src_a AND u.src_b = p.src_b)
        |SELECT src_a, src_b, n_a, n_b, n_common, est_a, est_b, est_u,
        |  est_common,
        |  CAST(FLOOR(CAST(10000.0 AS DOUBLE)
        |    * (est_common - CAST(n_common AS DOUBLE))
        |    / CAST(n_common AS DOUBLE)) AS BIGINT) AS err_bp
        |FROM est
        |ORDER BY src_a, src_b""".stripMargin) { (s, d) =>
      val dd = Tables.documentsSpread(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .distinct()
        .persist() // feeds the exact ledger AND the register build
      val ex = overlapMatrix(dd)
        .select("src_a", "src_b", "n_common", "n_a", "n_b")
      val regs = hllRegistersOf(dd, md5(col("tok"))).persist()
      val perSrc = hllFinalize(regs).select("source", "est_hll")
      val pl = ex.select("src_a", "src_b")
      val ureg = regs.join(broadcast(pl),
          col("source") === col("src_a") || col("source") === col("src_b"))
        .groupBy("src_a", "src_b", "j").agg(max(col("m")).as("m"))
      val uhll = hllFinalizeKeyed(ureg, Seq("src_a", "src_b"))
        .select(col("src_a"), col("src_b"), col("est_hll").as("est_u"))
      ex
        .join(broadcast(perSrc.select(col("source").as("src_a"),
          col("est_hll").as("est_a"))), "src_a")
        .join(broadcast(perSrc.select(col("source").as("src_b"),
          col("est_hll").as("est_b"))), "src_b")
        .join(broadcast(uhll), Seq("src_a", "src_b"))
        .withColumn("est_common",
          ((col("est_a") + col("est_b")) - col("est_u"))
            .cast(DecimalType(28, 6)).cast("double"))
        .withColumn("err_bp",
          floor(lit(10000.0) * (col("est_common") - col("n_common").cast("double"))
            / col("n_common").cast("double")).cast("long"))
        .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
          col("n_common"), col("est_a"), col("est_b"), col("est_u"),
          col("est_common"), col("err_bp"))
        .orderBy("src_a", "src_b")
    },

    // ---- q249: TextRank keyword extraction over the corpus word graph ------
    // TextRank (Mihalcea & Tarau, EMNLP 2004 — public literature): rank
    // words by PageRank over their co-occurrence graph and keep the top
    // scorers as corpus keywords — the unsupervised keyword/keyphrase
    // primitive summarization and tagging pipelines run over crawl
    // corpora. Graph: adjacent-token pairs (window 2, the paper's
    // default), symmetric, deduplicated, restricted to content words
    // (length ≥ 4, not in the stopword list — the paper's POS filter
    // approximated lexically). Ranks are the SAME integer fixed-point
    // recurrence as q109 (5 rounds from uniform, Graph.fixedPointPageRank)
    // so the oracle replays every round bit-for-bit; top-20 with the
    // deterministic (score DESC, word) tiebreak.
    //
    // 100 TB shape: the edge build is one map-side explode (bounded by
    // doc token count) + one distinct shuffle on the vocabulary-sized
    // pair set; the 5 rounds are keyed joins of the word-sized rank
    // table against the checkpointed edge list at the measured narrow
    // width (q109's plan); the final top-20 window sorts the word-sized
    // rank table, never the corpus.
    QueryDef(
      "q249_textrank_keywords", {
        val stops = STOP_EN.map("'" + _ + "'").mkString(",")
        val iters = (1 to 5).map { k =>
          val prev = if (k == 1) "r0" else s"i${k - 1}"
          s"""i$k AS (
             |  SELECT ed.v AS id,
             |    CAST(150000 + (85 * SUM(pr.r // ed.od)) // 100 AS BIGINT) AS r
             |  FROM ed JOIN $prev pr ON pr.id = ed.u GROUP BY ed.v)""".stripMargin
        }.mkString(",\n")
        s"""WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
           |raw AS (
           |  SELECT unnest(list_transform(range(1, len(t)), i ->
           |    {a: t[CAST(i AS INT)], b: t[CAST(i+1 AS INT)]})) AS u
           |  FROM toks WHERE len(t) >= 2),
           |adj AS (
           |  SELECT DISTINCT u.a AS a, u.b AS b FROM raw
           |  WHERE u.a <> u.b AND length(u.a) >= 4 AND length(u.b) >= 4
           |    AND u.a NOT IN ($stops) AND u.b NOT IN ($stops)),
           |edges AS (SELECT DISTINCT u, v FROM (
           |  SELECT a AS u, b AS v FROM adj UNION ALL SELECT b, a FROM adj)),
           |deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS od
           |        FROM edges GROUP BY u),
           |ed AS (SELECT e.u, e.v, d.od FROM edges e JOIN deg d ON d.u = e.u),
           |r0 AS (SELECT u AS id, CAST(1000000 AS BIGINT) AS r FROM deg),
           |$iters
           |SELECT CAST(ROW_NUMBER() OVER (ORDER BY r DESC, id) AS BIGINT) AS rk,
           |  id AS word, r AS score
           |FROM i5 QUALIFY rk <= 20
           |ORDER BY rk""".stripMargin
      }) { (s, d) =>
      val t = col("__t")
      val adj = Tables.documentsSpread(s, d)
        .select(split(col("text"), " ").as("__t"))
        .filter(size(t) >= 2)
        .select(explode(transform(sequence(lit(1), size(t) - 1),
          i => struct(element_at(t, i).as("a"), element_at(t, i + 1).as("b"))))
          .as("u"))
        .select(col("u.a").as("a"), col("u.b").as("b"))
        .filter(col("a") =!= col("b") &&
          length(col("a")) >= 4 && length(col("b")) >= 4 &&
          !col("a").isin(STOP_EN: _*) && !col("b").isin(STOP_EN: _*))
        .distinct()
      val edges = adj.select(col("a").as("u"), col("b").as("v"))
        .unionByName(adj.select(col("b").as("u"), col("a").as("v")))
        .distinct()
      val pr = graft.operators.Graph.fixedPointPageRank(edges, "u", "v", 5)
      val w = Window.orderBy(col("r").desc, col("id"))
      pr.withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 20)
        .select(col("rk"), col("id").as("word"), col("r").as("score"))
        .orderBy("rk")
    },

    // ---- q255: robots.txt REP evaluation (RFC 9309 longest-match) ----------
    // The crawl-side gate every web corpus passes before ingest: parse
    // each domain's robots.txt (one `User-agent: *` group — multi-group
    // UA selection is out of fixture scope) into Allow/Disallow prefix
    // rules, then decide every URL by the Robots Exclusion Protocol's
    // published rule (RFC 9309 §2.2.2): the rule with the LONGEST
    // matching prefix wins; an Allow/Disallow tie at equal length goes
    // to Allow; no matching rule means allowed. The fixture plants all
    // five verdict classes per domain (Allow override under a broader
    // Disallow, plain Disallow hits on two prefixes, the exact-prefix
    // boundary case, and a rule-free path), and the ENGINE parses the
    // actual robots TEXT — line split + directive regexp — so the rule
    // table comes from the parse, not the plant.
    //
    // 100 TB shape: the rule table is domain-catalog-sized → broadcast;
    // matching is one broadcast theta-join (fan-out bounded by
    // rules-per-domain, ~handfuls in practice) + one max_by keyed agg
    // (mergeable — ≤1 row per URL per partition crosses the shuffle);
    // the verdict is a left join back. No windows over the corpus.
    QueryDef(
      "q255_robots_rep_gate",
      """WITH o AS (
        |  SELECT doc_id, source, substring(source, 4) AS ord FROM documents),
        |urls AS (
        |  SELECT doc_id, source,
        |    CASE doc_id % 5
        |      WHEN 0 THEN '/private/ok' || ord || '/p' || CAST(doc_id AS VARCHAR)
        |      WHEN 1 THEN '/private/x' || CAST(doc_id AS VARCHAR)
        |      WHEN 2 THEN '/tmp' || ord || '/y' || CAST(doc_id AS VARCHAR)
        |      WHEN 3 THEN '/public/z' || CAST(doc_id AS VARCHAR)
        |      ELSE '/private' END AS path
        |  FROM o),
        |doms AS (SELECT DISTINCT source, substring(source, 4) AS ord
        |         FROM documents),
        |rules AS (
        |  SELECT source, '/private' AS prefix, 0 AS allow FROM doms
        |  UNION ALL SELECT source, '/private/ok' || ord, 1 FROM doms
        |  UNION ALL SELECT source, '/tmp' || ord, 0 FROM doms),
        |m AS (
        |  SELECT u.doc_id, r.prefix, r.allow,
        |    ROW_NUMBER() OVER (PARTITION BY u.doc_id
        |      ORDER BY length(r.prefix) DESC, r.allow DESC, r.prefix DESC) AS rk
        |  FROM urls u JOIN rules r
        |    ON r.source = u.source AND starts_with(u.path, r.prefix))
        |SELECT u.doc_id, u.source, u.path,
        |  CAST(COALESCE(m.allow, 1) AS BIGINT) AS allowed,
        |  m.prefix AS rule,
        |  CAST(COALESCE(length(m.prefix), -1) AS BIGINT) AS rule_len
        |FROM urls u LEFT JOIN (SELECT * FROM m WHERE rk = 1) m USING (doc_id)
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val did = col("doc_id")
      // to end-of-string, mirroring the oracle's substring(source, 4) —
      // a 10-char cap would silently diverge on long source ids (r16, ADVICE)
      val ord = expr("substring(source, 4)")
      val urls = Tables.documents(s, d)
        .select(did, col("source"),
          when(did % 5 === 0,
            concat(lit("/private/ok"), ord, lit("/p"), did.cast("string")))
            .when(did % 5 === 1, concat(lit("/private/x"), did.cast("string")))
            .when(did % 5 === 2,
              concat(lit("/tmp"), ord, lit("/y"), did.cast("string")))
            .when(did % 5 === 3, concat(lit("/public/z"), did.cast("string")))
            .otherwise(lit("/private")).as("path"))
      // ---- fixture: the robots.txt TEXT per domain ----
      val robots = Tables.documents(s, d)
        .select(col("source"), expr("substring(source, 4)").as("ord"))
        .distinct()
        .select(col("source"), concat(
          lit("User-agent: *\n"),
          lit("Disallow: /private\n"),
          lit("Allow: /private/ok"), col("ord"), lit("\n"),
          lit("Disallow: /tmp"), col("ord"), lit("\n")).as("txt"))
      // ---- the parse side sees ONLY (source, txt) from here on ----
      val lineRe = "^(Allow|Disallow): (.*)$"
      val rules = robots
        .select(col("source"), explode(split(col("txt"), "\n")).as("line"))
        .withColumn("dir", regexp_extract(col("line"), lineRe, 1))
        .withColumn("prefix", regexp_extract(col("line"), lineRe, 2))
        .filter(col("dir") =!= "")
        .select(col("source").as("rsource"), col("prefix"),
          when(col("dir") === "Allow", 1L).otherwise(0L).as("allow"))
      val best = urls
        .join(broadcast(rules),
          col("source") === col("rsource") &&
            col("path").startsWith(col("prefix")))
        .groupBy("doc_id")
        .agg(max_by(struct(col("allow"), col("prefix")),
          struct(length(col("prefix")), col("allow"), col("prefix")))
          .as("m"))
      urls.join(best, Seq("doc_id"), "left")
        .select(did, col("source"), col("path"),
          coalesce(col("m.allow"), lit(1L)).as("allowed"),
          col("m.prefix").as("rule"),
          coalesce(length(col("m.prefix")).cast("long"), lit(-1L))
            .as("rule_len"))
        .orderBy("doc_id")
    },
  )

  /** q214's banding sweep: every (bands, rows) factorization of the
    * 16-minhash signature, the b·r = 16 ladder. */
  private val SWEEP_CONFIGS = Seq((16, 1), (8, 2), (4, 4), (2, 8), (1, 16))

  /** q244's truncation ladder: fingerprint only the first N tokens. */
  private val PREFIX_FP_LEVELS = Seq(32, 64, 128)

  /** q217's planted-wedge id offsets (prefix / suffix variant). Disjoint
    * from base doc ids and [[NATIVE_TWIN_OFFSET]] plants only while
    * max(doc_id) < LP_OFFSET_L − NATIVE_TWIN_OFFSET; the builder guards
    * the base ids loudly (the Linkage plant-offset lesson, r13 ADVICE). */
  private val LP_OFFSET_L = 2000000L
  private val LP_OFFSET_R = 3000000L

  /** q217's fixture: documents plus, for doc_id < 25, a prefix-2/3 and a
    * suffix-2/3 token-slice variant — each ≈2/3-Jaccard to its base
    * (above the 0.5 edge threshold), ≈1/3 to each other (below) — one
    * open L–doc–R wedge per planted doc. Pure token slicing, replayed
    * verbatim in the oracle's `pre`/`pl` CTEs. */
  private def plantedWedgeDocs(s: org.apache.spark.sql.SparkSession,
                               d: String): org.apache.spark.sql.DataFrame = {
    val guarded = when(col("doc_id") >= LP_OFFSET_L - NATIVE_TWIN_OFFSET,
      raise_error(concat(lit("q217 plant-offset collision: doc_id "),
        col("doc_id").cast("string"),
        lit(s" >= ${LP_OFFSET_L - NATIVE_TWIN_OFFSET} — raise LP_OFFSET_*"))))
      .otherwise(col("doc_id"))
    val pre = Tables.documentsSpread(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .withColumn("n", size(col("t")))
      .filter(col("doc_id") < 25 && col("n") >= 9)
      .withColumn("k", expr("(2 * n + 2) div 3"))
    val lVar = pre.select((col("doc_id") + LP_OFFSET_L).as("doc_id"),
      concat_ws(" ", slice(col("t"), lit(1), col("k"))).as("text"))
    val rVar = pre.select((col("doc_id") + LP_OFFSET_R).as("doc_id"),
      concat_ws(" ", slice(col("t"), col("n") - col("k") + 1, col("k"))).as("text"))
    // the guard rides the base scan (per-row when(), codegen'd away on
    // the happy path) so id-space disjointness fails loudly, never silently
    Tables.documentsSpread(s, d).select(guarded.as("doc_id"), col("text"))
      .unionByName(lVar).unionByName(rVar)
  }

  /** q224's oracle — and, verbatim, q227's: distinct (source, token)
    * pairs merge by set union, so the streamed audit equals the one-pass
    * scan however ingest was batched. */
  private val SRC_OVERLAP_ORACLE: String =
    """WITH d AS (
        |  SELECT DISTINCT source, tok FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS tok
        |    FROM documents)),
        |sz AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY source),
        |pairs AS (
        |  SELECT a.source AS src_a, b.source AS src_b,
        |    CAST(COUNT(*) AS BIGINT) AS n_common
        |  FROM d a JOIN d b ON b.tok = a.tok AND a.source < b.source
        |  GROUP BY a.source, b.source)
        |SELECT src_a, src_b, n_common,
        |  sa.n AS n_a, sb.n AS n_b,
        |  CAST(10000 * n_common // (sa.n + sb.n - n_common) AS BIGINT)
        |    AS jaccard_bp,
        |  CAST(10000 * n_common //
        |    (CASE WHEN sa.n < sb.n THEN sa.n ELSE sb.n END) AS BIGINT)
        |    AS containment_bp
        |FROM pairs
        |JOIN sz sa ON sa.source = src_a
        |JOIN sz sb ON sb.source = src_b
        |ORDER BY src_a, src_b""".stripMargin

  /** q224's pair-ledger over a distinct (source, token) projection —
    * shared with q227's merged increment store. Caller persists the
    * projection (it feeds the size agg and both join sides). */
  private def overlapMatrix(dd: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val sz = dd.groupBy("source").agg(count(lit(1)).as("n"))
    val pairs = dd.select(col("source").as("src_a"), col("tok"))
      .join(dd.select(col("source").as("src_b"), col("tok")), "tok")
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_common"))
    pairs
      .join(broadcast(sz.select(col("source").as("src_a"), col("n").as("n_a"))),
        "src_a")
      .join(broadcast(sz.select(col("source").as("src_b"), col("n").as("n_b"))),
        "src_b")
      .select(col("src_a"), col("src_b"), col("n_common"),
        col("n_a"), col("n_b"),
        expr("10000 * n_common div (n_a + n_b - n_common)").as("jaccard_bp"),
        expr("10000 * n_common div (case when n_a < n_b then n_a else n_b end)")
          .as("containment_bp"))
      .orderBy("src_a", "src_b")
  }

  /** q221's oracle — and, verbatim, q225's: the per-(canonical, url)
    * increments merge by sum/min, so the streamed ledger equals the
    * one-pass scan however ingest was batched. */
  private val URL_DEDUP_ORACLE: String =
    """WITH b AS (
          |  SELECT doc_id, doc_id % 200 AS g,
          |    'example' || CAST((doc_id % 200) % 50 AS VARCHAR) || '.com' AS hb
          |  FROM documents),
          |h AS (
          |  SELECT doc_id, g,
          |    CASE WHEN doc_id % 4 < 2 THEN 'www.' || hb ELSE hb END AS hp,
          |    CASE WHEN doc_id % 2 = 0
          |      THEN 'utm_source=feed&utm_campaign=c' || CAST(doc_id % 9 AS VARCHAR) END AS t1,
          |    CASE WHEN doc_id % 3 = 1
          |      THEN 'gclid=g' || CAST(doc_id % 11 AS VARCHAR) END AS t2,
          |    'id=' || CAST(g AS VARCHAR) AS kp,
          |    'v=' || CAST(g % 3 AS VARCHAR) AS kp2
          |  FROM b),
          |raw AS (
          |  SELECT doc_id, g,
          |    (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END) || '://' ||
          |    (CASE WHEN doc_id % 2 = 0 THEN upper(hp) ELSE hp END) ||
          |    (CASE WHEN doc_id % 7 = 0 THEN ':443' ELSE '' END) ||
          |    '/articles/item-' || CAST(g AS VARCHAR) ||
          |    (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END) ||
          |    '?' ||
          |    (CASE WHEN doc_id % 2 = 0 THEN concat_ws('&', t1, kp2, t2, kp)
          |          ELSE concat_ws('&', kp, t1, t2, kp2) END) ||
          |    (CASE WHEN doc_id % 3 = 2 THEN '#sec-' || CAST(doc_id % 4 AS VARCHAR)
          |          ELSE '' END) AS url
          |  FROM h),
          |nf AS (
          |  SELECT doc_id, g, url, regexp_replace(url, '#.*$', '') AS nofrag FROM raw),
          |parts AS (
          |  SELECT doc_id, g, url,
          |    lower(regexp_extract(nofrag, '^([a-zA-Z]+)://', 1)) AS sch,
          |    regexp_replace(regexp_replace(
          |      lower(regexp_extract(nofrag, '^[a-zA-Z]+://([^/]+)', 1)),
          |      ':(443|80)$', ''), '^www\.', '') AS hostc,
          |    regexp_replace(
          |      regexp_extract(nofrag, '^[a-zA-Z]+://[^/]+([^?]*)', 1),
          |      '/+$', '') AS pathc,
          |    array_to_string(list_sort(list_filter(
          |      string_split(regexp_extract(nofrag, '\?(.*)$', 1), '&'),
          |      x -> NOT (starts_with(x, 'utm_') OR starts_with(x, 'gclid=')
          |                OR starts_with(x, 'fbclid=')))), '&') AS qc
          |  FROM nf),
          |canon AS (
          |  SELECT doc_id, url,
          |    sch || '://' || hostc || pathc ||
          |      (CASE WHEN qc = '' THEN '' ELSE '?' || qc END) AS canonical_url,
          |    'https://example' || CAST(g % 50 AS VARCHAR) || '.com/articles/item-' ||
          |      CAST(g AS VARCHAR) || '?id=' || CAST(g AS VARCHAR) ||
          |      '&v=' || CAST(g % 3 AS VARCHAR) AS expected
          |  FROM parts)
          |SELECT canonical_url,
          |  CAST(COUNT(*) AS BIGINT) AS n_docs,
          |  MIN(doc_id) AS keep_id,
          |  CAST(COUNT(DISTINCT url) AS BIGINT) AS n_raw,
          |  CAST(MIN(CASE WHEN canonical_url = expected THEN 1 ELSE 0 END) AS BIGINT)
          |    AS recovered
          |FROM canon
          |GROUP BY canonical_url
          |ORDER BY canonical_url""".stripMargin

  /** q221's raw-URL plant + canonicalizer over any documents slice —
    * emits (doc_id, url, expected, canonical_url). Shared with q225's
    * per-batch increments so the streaming gate replays the batch
    * semantics on each micro-batch. */
  private def canonicalUrls(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val did = col("doc_id")
      val g = did % 200
      val hb = concat(lit("example"), (g % 50).cast("string"), lit(".com"))
      val hp = when(did % 4 < 2, concat(lit("www."), hb)).otherwise(hb)
      val t1 = when(did % 2 === 0,
        concat(lit("utm_source=feed&utm_campaign=c"), (did % 9).cast("string")))
      val t2 = when(did % 3 === 1,
        concat(lit("gclid=g"), (did % 11).cast("string")))
      val kp = concat(lit("id="), g.cast("string"))
      val kp2 = concat(lit("v="), (g % 3).cast("string"))
      val url = concat(
        when(did % 2 === 0, lit("HTTPS")).otherwise(lit("https")), lit("://"),
        when(did % 2 === 0, upper(hp)).otherwise(hp),
        when(did % 7 === 0, lit(":443")).otherwise(lit("")),
        lit("/articles/item-"), g.cast("string"),
        when(did % 5 === 0, lit("/")).otherwise(lit("")),
        lit("?"),
        when(did % 2 === 0, concat_ws("&", t1, kp2, t2, kp))
          .otherwise(concat_ws("&", kp, t1, t2, kp2)),
        when(did % 3 === 2, concat(lit("#sec-"), (did % 4).cast("string")))
          .otherwise(lit("")))
      val nofrag = regexp_replace(col("url"), "#.*$", "")
      val sch = lower(regexp_extract(nofrag, "^([a-zA-Z]+)://", 1))
      val hostc = regexp_replace(regexp_replace(
        lower(regexp_extract(nofrag, "^[a-zA-Z]+://([^/]+)", 1)),
        ":(443|80)$", ""), "^www\\.", "")
      val pathc = regexp_replace(
        regexp_extract(nofrag, "^[a-zA-Z]+://[^/]+([^?]*)", 1), "/+$", "")
      val qc = array_join(array_sort(filter(
        split(regexp_extract(nofrag, "\\?(.*)$", 1), "&"),
        x => !(x.startsWith("utm_") || x.startsWith("gclid=")
          || x.startsWith("fbclid=")))), "&")
      val expected = concat(lit("https://example"), (g % 50).cast("string"),
        lit(".com/articles/item-"), g.cast("string"),
        lit("?id="), g.cast("string"), lit("&v="), (g % 3).cast("string"))
      docs
        .select(did, url.as("url"), expected.as("expected"))
        .select(col("doc_id"), col("url"), col("expected"),
          concat(sch, lit("://"), hostc, pathc,
            when(qc === "", lit("")).otherwise(concat(lit("?"), qc)))
            .as("canonical_url"))
  }

  /** q210's draw salt: decouples the keep/drop pattern from every other
    * md5-derandomized query over doc_id (q129's threshold draw included). */
  private val DWS_SALT = "q210"

  /** q234's split salt — shared by the cluster-level rule and the naive
    * doc-level rule so the two policies differ only in WHAT is hashed. */
  private val CAS_SALT = "q234"

  /** q232/q235's shared oracle: per registered domain, the K=3 docs with
    * the lowest 48-bit salted-md5 priority. The window formulation is the
    * ORACLE's; the engine path is the mergeable TopKRows aggregator. */
  private val DOMAIN_QUOTA_ORACLE =
    """WITH r AS (
      |  SELECT doc_id,
      |    'site' || CAST(doc_id % 40 AS VARCHAR) || '.' ||
      |    (CASE doc_id % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'co.uk'
      |          ELSE 'org' END) AS regdom,
      |    ('0x' || substring(md5('q232:' || CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
      |      AS prio
      |  FROM documents),
      |rk AS (
      |  SELECT regdom, doc_id, prio,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY regdom
      |      ORDER BY prio, doc_id) AS BIGINT) AS rk
      |  FROM r)
      |SELECT regdom, rk, doc_id, prio
      |FROM rk WHERE rk <= 3
      |ORDER BY regdom, rk""".stripMargin

  /** q232/q235's candidate projection: registered domain + 48-bit salted
    * priority, both pure functions of doc_id (map-side, rides the scan). */
  private def quotaProject(df: org.apache.spark.sql.DataFrame) = {
    val did = col("doc_id")
    val regdom = concat(lit("site"), (did % 40).cast("string"), lit("."),
      when(did % 3 === 0, lit("com")).when(did % 3 === 1, lit("co.uk"))
        .otherwise(lit("org")))
    val prio = conv(substring(md5(concat(lit("q232:"), did.cast("string"))),
      1, 12), 16, 10).cast("long")
    df.select(regdom.as("regdom"), did, prio.as("prio"))
  }

  /** q232/q235's shared selection: the K=3 lowest-priority docs per domain
    * via the mergeable TopKRows aggregator — ≤ K rows per group per map
    * partition cross the shuffle, never a per-domain sort. */
  private def quotaTopK(cand: org.apache.spark.sql.DataFrame) = {
    val topk = udaf(new graft.functions.TopKRows(3))
    cand.groupBy("regdom")
      .agg(topk((-col("prio")).cast("double"), col("doc_id"), col("prio"))
        .as("tk"))
      .select(col("regdom"), posexplode(col("tk")).as(Seq("pos", "row")))
      .select(col("regdom"), (col("pos") + 1).cast("long").as("rk"),
        col("row._2").as("doc_id"), col("row._3").as("prio"))
  }

  /** Negative draws per positive pair in q208 (word2vec's k). */
  private val K_NEG = 3

  /** Skip-gram context CTE shared by q198 (pair counts) and q208
    * (negative draws): symmetric ±SKIP_WINDOW co-occurrences within a
    * walk. Requires `walks` from [[WALKS_SQL_CTES]]. */
  private lazy val SKIPGRAM_CTX_CTE: String =
    s"""ctx AS (
       |  SELECT a.node AS center, b.node AS context
       |  FROM walks a JOIN walks b
       |    ON a.start = b.start AND a.walk = b.walk
       |   AND b.step BETWEEN a.step - $SKIP_WINDOW AND a.step + $SKIP_WINDOW
       |   AND b.step <> a.step)""".stripMargin

  /** The q198 skip-gram pair/count table (center, context, n_pairs) —
    * lead() windows per walk partition, both directions, one map-side-
    * combined count. Shared by q198 (emits it) and q208 (draws negatives
    * per distinct pair). */
  private def skipgramPairs(s: org.apache.spark.sql.SparkSession,
                            d: String): org.apache.spark.sql.DataFrame =
    skipgramPairsOf(stagedWalkCorpus(s, d))

  /** [[skipgramPairs]] over an ALREADY-BUILT walk corpus — q208 shares
    * one checkpointed walk between the pair table and the unigram
    * counts instead of re-running the step-join ladder. */
  private def skipgramPairsOf(
      wc: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy("start", "walk").orderBy("step")
    val fwd = wc
      .select(col("node").as("center"),
        array((1 to SKIP_WINDOW).map(j => lead(col("node"), j).over(w)): _*)
          .as("nexts"))
      .select(col("center"), explode(col("nexts")).as("context"))
      .filter(col("context").isNotNull)
    fwd
      .unionByName(fwd.select(col("context").as("center"),
        col("center").as("context")))
      .groupBy("center", "context")
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Integer scale for q206's 1/d GloVe distance weights:
    * LCM(1..SKIP_WINDOW), so every scaled weight LCM/d is exact. */
  private val GLOVE_LCM = 2

  /** Normalized document fingerprint shared by the HLL queries (q204/q205)
    * and the q43/q85 built-in-sketch variants: md5 of the lowercased
    * letters-and-spaces text, whitespace-collapsed. */
  private def docFp: org.apache.spark.sql.Column =
    md5(trim(regexp_replace(regexp_replace(lower(col("text")),
      "[^a-z ]", ""), "  *", " ")))

  /** q204/q205 register table: (source, j, m) with j = md5 first byte
    * (256 buckets) and m = max over docs of rho(next 48 bits). The rho
    * computation is pure string/integer work on md5 hex — hex-digit
    * leading-zero trim (4 bits per trimmed '0') + a 4-way CASE on the
    * first surviving digit — so DuckDB replays it exactly; an empty
    * suffix (all 48 bits zero) pins rho = 49. Map-side combinable: the
    * (source, j) max shuffles at most 256 rows per source. */
  private def hllRegisters(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    hllRegistersOf(docs, docFp)

  /** [[hllRegisters]] generalized to any md5-hex fingerprint column —
    * q239 sketches the token vocabulary (fp = md5(tok)) with the same
    * register construction the document sketch replays. */
  private def hllRegistersOf(docs: org.apache.spark.sql.DataFrame,
                             fp: org.apache.spark.sql.Column)
      : org.apache.spark.sql.DataFrame = {
    val st = ltrim(substring(fp, 3, 12), "0")
    val idx = instr2(lit("0123456789abcdef"), substring(st, 1, 1)) - 1
    val rho = when(length(st) === 0, 49)
      .otherwise((lit(12) - length(st)) * 4 +
        when(idx >= 8, 0).when(idx >= 4, 1).when(idx >= 2, 2).otherwise(3) + 1)
    docs.select(col("source"),
        conv(substring(fp, 1, 2), 16, 10).cast("long").as("j"),
        rho.cast("int").as("rho"))
      .groupBy("source", "j").agg(max(col("rho")).as("m"))
  }

  /** Finalize a (source, j, m) register table into the HLL answer row:
    * v_zero (registers never hit), the integer register sum
    * S = Σ 2^(49−M_j) with absent buckets at 2^49, and the estimate —
    * α₂₅₆·m²·2^49/S, or linear counting m·ln(m/V) in the small range
    * (E ≤ 2.5m, V > 0). Every constant is spelled as the same IEEE
    * expression the oracle uses; the final DECIMAL(28,6) rounding is the
    * q93 ln discipline. */
  private def hllFinalize(regs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    hllFinalizeKeyed(regs, Seq("source"))

  /** [[hllFinalize]] generalized to any grouping key — q239 finalizes
    * pair-union register tables keyed (src_a, src_b). */
  private def hllFinalizeKeyed(regs: org.apache.spark.sql.DataFrame,
                               keys: Seq[String])
      : org.apache.spark.sql.DataFrame = {
    val agg0 = regs.groupBy(keys.map(col): _*).agg(
      (lit(256L) - count(lit(1))).as("v_zero"),
      (sum(pow(lit(2.0), lit(49) - col("m")).cast("long")) +
        (lit(256L) - count(lit(1))) * lit(562949953421312L)).as("s_reg"))
    val eRaw = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0)) *
      lit(65536.0) * lit(562949953421312.0) / col("s_reg").cast("double")
    agg0.withColumn("e_raw", eRaw)
      .select(keys.map(col) ++ Seq(col("v_zero"), col("s_reg"),
        when(col("e_raw") <= lit(640.0) && col("v_zero") > 0,
          lit(256.0) * log(lit(256.0) / col("v_zero").cast("double")))
          .otherwise(col("e_raw"))
          .cast(DecimalType(28, 6)).cast("double").as("est_hll")): _*)
  }

  /** Shared oracle CTE chain for q204/q205, ending in
    * `hll(source, v_zero, s_reg, est_hll)` — the DuckDB replay of
    * [[hllRegisters]] + [[hllFinalize]]. `fp` is kept visible for q204's
    * exact-count verifier column. */
  private lazy val HLL_SQL_CTES: String =
    """fp AS (
      |  SELECT source,
      |    md5(trim(regexp_replace(regexp_replace(lower(text),
      |      '[^a-z ]', '', 'g'), '  *', ' ', 'g'))) AS fp
      |  FROM documents),
      |hx AS (
      |  SELECT source, ('0x' || substring(fp, 1, 2))::BIGINT AS j,
      |    ltrim(substring(fp, 3, 12), '0') AS st
      |  FROM fp),
      |reg AS (
      |  SELECT source, j, MAX(CASE WHEN st = '' THEN 49
      |    ELSE (12 - length(st)) * 4 +
      |      CASE WHEN instr('0123456789abcdef', substring(st, 1, 1)) - 1 >= 8 THEN 0
      |           WHEN instr('0123456789abcdef', substring(st, 1, 1)) - 1 >= 4 THEN 1
      |           WHEN instr('0123456789abcdef', substring(st, 1, 1)) - 1 >= 2 THEN 2
      |           ELSE 3 END + 1 END) AS m
      |  FROM hx GROUP BY source, j),
      |agg AS (
      |  SELECT source, CAST(256 - COUNT(*) AS BIGINT) AS v_zero,
      |    CAST(SUM(CAST(power(2, 49 - m) AS BIGINT))
      |      + (256 - COUNT(*)) * 562949953421312 AS BIGINT) AS s_reg
      |  FROM reg GROUP BY source),
      |est AS (
      |  SELECT source, v_zero, s_reg,
      |    CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE)
      |        + CAST(1.079 AS DOUBLE) / CAST(256.0 AS DOUBLE))
      |      * CAST(65536.0 AS DOUBLE) * CAST(562949953421312.0 AS DOUBLE)
      |      / CAST(s_reg AS DOUBLE) AS e_raw
      |  FROM agg),
      |hll AS (
      |  SELECT source, v_zero, s_reg,
      |    CAST(CAST(CASE WHEN e_raw <= CAST(640.0 AS DOUBLE) AND v_zero > 0
      |      THEN CAST(256.0 AS DOUBLE) * ln(CAST(256.0 AS DOUBLE) / CAST(v_zero AS DOUBLE))
      |      ELSE e_raw END AS DECIMAL(28,6)) AS DOUBLE) AS est_hll
      |  FROM est)""".stripMargin

  private lazy val HLL_ORACLE_BATCH: String =
    s"""WITH $HLL_SQL_CTES,
       |ex AS (SELECT source, COUNT(DISTINCT fp) AS n_exact
       |       FROM fp GROUP BY source)
       |SELECT h.source AS source, e.n_exact, h.v_zero, h.s_reg, h.est_hll
       |FROM hll h JOIN ex e ON e.source = h.source
       |ORDER BY source""".stripMargin

  private lazy val HLL_ORACLE_STREAM: String =
    s"""WITH $HLL_SQL_CTES
       |SELECT source, v_zero, s_reg, est_hll FROM hll
       |ORDER BY source""".stripMargin

  /** q109/q200 shared oracle: 5 unrolled fixed-point PageRank rounds over
    * the symmetric winnowing match graph — q200's streaming answer must
    * hash-match the identical batch formulation. */
  private lazy val PR_MATCH_ORACLE: String = {
    val iters = (1 to 5).map { k =>
      val prev = if (k == 1) "r0" else s"i${k - 1}"
      s"""i$k AS (
         |  SELECT ed.v AS id,
         |    CAST(150000 + (85 * SUM(pr.r // ed.od)) // 100 AS BIGINT) AS r
         |  FROM ed JOIN $prev pr ON pr.id = ed.u GROUP BY ed.v)""".stripMargin
    }.mkString(",\n")
    s"""WITH $WinnowPairsSqlCtes,
       |edges AS (SELECT id_a AS u, id_b AS v FROM mpairs
       |          UNION ALL SELECT id_b, id_a FROM mpairs),
       |deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS od
       |        FROM edges GROUP BY u),
       |ed AS (SELECT e.u, e.v, d.od FROM edges e JOIN deg d ON d.u = e.u),
       |r0 AS (SELECT u AS id, CAST(1000000 AS BIGINT) AS r FROM deg),
       |$iters
       |SELECT id AS doc_id, r AS pr_rank FROM i5
       |ORDER BY doc_id""".stripMargin
  }

  /** Shared walk-graph oracle CTEs: the symmetric Jaccard match edges
    * with per-node degree and dense neighbor rank — `und(u, v)`,
    * `deg(u, od)`, `rnk(u, v, r)`. Used by q195/q198 (first-order walks)
    * and q201 (second-order node2vec walks). */
  private lazy val WALK_GRAPH_CTES: String =
    s"""$PAIRS_SQL,
       |und AS (SELECT doc_a AS u, doc_b AS v FROM jpairs
       |        UNION ALL SELECT doc_b, doc_a FROM jpairs),
       |deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS od FROM und GROUP BY u),
       |rnk AS (SELECT u, v,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY u ORDER BY v) - 1 AS BIGINT) AS r
       |  FROM und)""".stripMargin

  private lazy val WALK_IDS_SQL: String =
    (0 until WALKS_PER_NODE).map(k => s"($k)").mkString(", ")

  /** q195/q198 shared oracle CTE chain, ending in
    * `walks(start, walk, step, node)` — the derandomized walk corpus. */
  private lazy val WALKS_SQL_CTES: String = {
    val steps = (1 to WALK_STEPS).map { t =>
      s"""w$t AS (SELECT p.start, p.walk, CAST($t AS BIGINT) AS step, r.v AS node
         |  FROM w${t - 1} p
         |  JOIN deg d ON d.u = p.node
         |  JOIN rnk r ON r.u = p.node AND r.r =
         |    ('0x' || substring(md5(CAST(p.start AS VARCHAR) || ':' ||
         |      CAST(p.walk AS VARCHAR) || ':' || CAST(p.step AS VARCHAR) || ':' ||
         |      CAST(p.node AS VARCHAR)), 1, 15))::BIGINT % d.od)""".stripMargin
    }.mkString(",\n")
    val unionAll = (0 to WALK_STEPS).map(t => s"SELECT * FROM w$t")
      .mkString(" UNION ALL ")
    s"""$WALK_GRAPH_CTES,
       |w0 AS (SELECT d.u AS start, CAST(k.k AS BIGINT) AS walk,
       |    CAST(0 AS BIGINT) AS step, d.u AS node
       |  FROM deg d CROSS JOIN (VALUES $WALK_IDS_SQL) k(k)),
       |$steps,
       |walks AS ($unionAll)""".stripMargin
  }

  /** The q195 walk corpus `(start, walk, step, node)` without final
    * ordering — shared by q195 (emits it) and q198 (skip-gram pairs over
    * it). See q195's scaladoc-comment for the derandomization scheme and
    * the 100 TB shape. */
  /** Spark-side walk graph shared by q195/q198/q201: the checkpointed
    * symmetric edge list plus its degree and dense-neighbor-rank views
    * (deg/rnk and every step join scan the checkpoint blocks instead of
    * re-running the pair pipeline per step). */
  private def walkGraph(s: org.apache.spark.sql.SparkSession, d: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
         org.apache.spark.sql.DataFrame) = {
    val jp = jaccardPairs(s, d)
    val und = jp.select(col("doc_a").as("u"), col("doc_b").as("v"))
      .unionAll(jp.select(col("doc_b").as("u"), col("doc_a").as("v")))
      .localCheckpoint()
    val deg = und.groupBy("u").agg(count(lit(1)).cast("long").as("od"))
    val rnk = und.withColumn("r",
      (row_number().over(Window.partitionBy("u").orderBy("v")) - 1).cast("long"))
    (und, deg, rnk)
  }

  private def walkCorpus(s: org.apache.spark.sql.SparkSession,
                         d: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val (_, deg, rnk) = walkGraph(s, d)
    var cur = deg.select(col("u").as("start"))
      .crossJoin((0L until WALKS_PER_NODE.toLong).toDF("walk"))
      .select(col("start"), col("walk"), lit(0L).as("step"),
        col("start").as("node"))
    val levels = scala.collection.mutable.ArrayBuffer(cur)
    for (t <- 1 to WALK_STEPS) {
      val h = conv(substring(md5(concat_ws(":",
        col("start"), col("walk"), col("step"), col("node"))), 1, 15), 16, 10)
        .cast("long")
      // per-step localCheckpoint (the Components/Graph round
      // convention): the final union reads each level's blocks, so
      // step t's join executes exactly ONCE — without it level t's
      // lazy plan re-runs all t prior joins and the union costs
      // O(steps²) join executions. The frontier is node-sized, so the
      // checkpoint is metadata-scale next to the edge list.
      cur = cur
        .join(deg, col("u") === col("node")).drop("u")
        .join(rnk, col("u") === col("node") && col("r") === h % col("od"))
        .select(col("start"), col("walk"), lit(t.toLong).as("step"),
          col("v").as("node"))
        .localCheckpoint()
      levels += cur
    }
    levels.reduce(_ unionByName _)
  }

  /** `functions.instr` only takes a literal needle; SQL `instr(str, substr)`
    * accepts two expressions — expose that via expr-compatible helper.
    */
  private def instr2(haystack: org.apache.spark.sql.Column, needle: org.apache.spark.sql.Column) =
    call_function("instr", haystack, needle)
}
