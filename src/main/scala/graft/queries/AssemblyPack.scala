package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

// Shared text-dedup primitives (pair SQL, cluster helpers, staged batch
// sources) live in TextDedupPack and are visible package-wide; the
// assembly family consumes them unqualified via this import.
import TextDedupPack._

/** Dataset-assembly operators over the near-dup cluster structure — the
  * AssemblyPack family split out of TextDedupPack along its family seam
  * (r16, verdict item 7; zero query renames): dedup-weighted sampling
  * (q210), quality-based cluster survivorship (q219), cluster-aware
  * leakage-free train/val splits (q234), and the corpus-assembly
  * waterfall with per-doc drop attribution (q242).
  */
object AssemblyPack {

  /** q210's draw salt: decouples the keep/drop pattern from every other
    * md5-derandomized query over doc_id (q129's threshold draw included). */
  private[queries] val DWS_SALT = "q210"

  /** q234's split salt — shared by the cluster-level rule and the naive
    * doc-level rule so the two policies differ only in WHAT is hashed. */
  private[queries] val CAS_SALT = "q234"

  def all: Seq[QueryDef] = Seq(
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


    // ---- q263: corpus-version delta dedup (crawl-refresh triage) -----------
    // The operation every recurring crawl runs between snapshots: classify
    // each NEW-snapshot document against the previous snapshot as CARRIED
    // (same normalized content fingerprint — skip reprocessing), MUTATED
    // (no exact match but a >= 0.5-Jaccard near-dup of some old doc — the
    // re-extraction/boilerplate-drift class that should reuse the old
    // doc's lineage), or NEW (process from scratch). Snapshots are the
    // doc_id parity halves (the portable stand-in for crawl ids); exact
    // carry uses q43's normalized md5 fingerprint, mutation uses the
    // q27 capped-gram exact-Jaccard pairs (PAIRS_SQL verbatim) restricted
    // to cross-parity pairs. Priority carried > mutated > new.
    //
    // 100 TB shape: the exact class is one fingerprint semi-join (keyed
    // on md5); the mutated class rides the existing capped near-dup pair
    // machinery (never all-pairs); the ledger is one keyed agg per
    // source. This is the pass that turns a 100 TB re-crawl into an
    // incremental job.
    QueryDef(
      "q263_version_delta",
      s"""WITH $PAIRS_SQL,
         |fp AS (
         |  SELECT doc_id, source,
         |    md5(trim(regexp_replace(regexp_replace(lower(text),
         |      '[^a-z ]', '', 'g'), '  *', ' ', 'g'))) AS fp,
         |    doc_id % 2 AS par
         |  FROM documents),
         |v1fp AS (SELECT DISTINCT fp FROM fp WHERE par = 0),
         |xp AS (
         |  SELECT CASE WHEN doc_a % 2 = 1 THEN doc_a ELSE doc_b END AS vid
         |  FROM jpairs
         |  WHERE doc_a % 2 <> doc_b % 2),
         |cls AS (
         |  SELECT f.source,
         |    CASE WHEN v1.fp IS NOT NULL THEN 'carried'
         |         WHEN x.vid IS NOT NULL THEN 'mutated'
         |         ELSE 'new' END AS cls
         |  FROM fp f
         |  LEFT JOIN v1fp v1 ON v1.fp = f.fp
         |  LEFT JOIN (SELECT DISTINCT vid FROM xp) x ON x.vid = f.doc_id
         |  WHERE f.par = 1)
         |SELECT source,
         |  CAST(COUNT(*) AS BIGINT) AS n_v2,
         |  CAST(SUM(CASE WHEN cls = 'carried' THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_carried,
         |  CAST(SUM(CASE WHEN cls = 'mutated' THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_mutated,
         |  CAST(SUM(CASE WHEN cls = 'new' THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_new
         |FROM cls
         |GROUP BY source
         |ORDER BY source""".stripMargin) { (s, d) =>
      val fp = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), docFp.as("fp"),
          (col("doc_id") % 2).as("par"))
      val v1fp = fp.filter(col("par") === 0)
        .select(col("fp").as("fp1")).distinct()
      val xp = jaccardPairs(s, d)
        .filter(col("doc_a") % 2 =!= col("doc_b") % 2)
        .select(when(col("doc_a") % 2 === 1, col("doc_a"))
          .otherwise(col("doc_b")).as("vid"))
        .distinct()
      fp.filter(col("par") === 1)
        .join(v1fp, col("fp") === col("fp1"), "left")
        .join(xp, col("vid") === col("doc_id"), "left")
        .select(col("source"),
          when(col("fp1").isNotNull, "carried")
            .when(col("vid").isNotNull, "mutated")
            .otherwise("new").as("cls"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_v2"),
          sum(when(col("cls") === "carried", 1L).otherwise(0L)).as("n_carried"),
          sum(when(col("cls") === "mutated", 1L).otherwise(0L)).as("n_mutated"),
          sum(when(col("cls") === "new", 1L).otherwise(0L)).as("n_new"))
        .orderBy("source")
    },

  )
}
