package graft

import graft.operators.{Packing, Redact, Sampling}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Training-data operators: deterministic splits, PII redaction, sequence
  * packing — properties the oracle hash can't express (stability across
  * runs, salt sensitivity, idempotence, exact packing semantics).
  */
class TrainingOpsSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}
  import spark.implicits._

  private def docs = Tables.documents(spark, sf)

  // ---- Sampling ----------------------------------------------------------

  private val SPLITS = Seq("train" -> 80, "val" -> 10, "test" -> 10)

  test("split is total, disjoint, and stable across evaluations") {
    val assigned = docs.select(col("doc_id"),
      Sampling.splitColumn(col("doc_id"), "s1", SPLITS).as("split"))
    assert(assigned.filter(col("split").isNull).count() == 0)
    val a = assigned.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = docs.select(col("doc_id"),
        Sampling.splitColumn(col("doc_id"), "s1", SPLITS).as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b, "same salt must give identical assignment")
    assert(a.size == docs.count())
  }

  test("split ratios approximate the weights") {
    val counts = docs
      .select(Sampling.splitColumn(col("doc_id"), "s1", SPLITS).as("split"))
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = counts.values.sum.toDouble
    // md5 buckets are uniform; at n=500 allow a generous binomial tolerance
    assert(math.abs(counts("train") / n - 0.80) < 0.08, counts.toString)
    assert(math.abs(counts.getOrElse("val", 0L) / n - 0.10) < 0.06, counts.toString)
    assert(math.abs(counts.getOrElse("test", 0L) / n - 0.10) < 0.06, counts.toString)
  }

  test("a different salt re-draws assignments") {
    val a = docs.select(col("doc_id"),
        Sampling.splitColumn(col("doc_id"), "s1", SPLITS).as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = docs.select(col("doc_id"),
        Sampling.splitColumn(col("doc_id"), "s2", SPLITS).as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val moved = a.count { case (id, s) => b(id) != s }
    // expected ~32% move (1 - Σ wᵢ²); any healthy re-draw moves plenty
    assert(moved > a.size / 10, s"only $moved of ${a.size} moved")
  }

  test("split weights must sum to 100") {
    intercept[IllegalArgumentException] {
      Sampling.splitColumn(col("doc_id"), "s", Seq("a" -> 50, "b" -> 40))
    }
  }

  // ---- Redact ------------------------------------------------------------

  test("redaction replaces exactly the planted PII") {
    val in = Seq(
      (1L, "mail me at a.b@x.co and 555-123-4567 or 123-45-6789 ok"),
      (2L, "no pii here at all"),
      (3L, "two mails x@y.org z@w.net")).toDF("id", "t")
    val out = in.select(col("id"), Redact.redact(col("t")).as("r"),
        Redact.piiCount(col("t")).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(out == Set(
      (1L, "mail me at <EMAIL> and <PHONE> or <SSN> ok", 3L),
      (2L, "no pii here at all", 0L),
      (3L, "two mails <EMAIL> <EMAIL>", 2L)))
  }

  test("redaction is idempotent") {
    val planted = docs.select(
      concat(col("text"), lit(" u"), col("doc_id").cast("string"),
        lit("@ex.com 555-000-1111 123-45-6789")).as("t"))
    val once = planted.select(Redact.redact(col("t")).as("r"))
    val twice = once.select(Redact.redact(col("r")).as("r"))
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
  }

  test("a phone number is consumed whole, never half-eaten by the SSN rule") {
    val out = Seq.tabulate(1)(_ => "call 555-123-4567 now").toDF("t")
      .select(Redact.redact(col("t"))).as[String].head()
    assert(out == "call <PHONE> now")
  }

  test("a phone-shaped span inside an email is counted once, not twice") {
    // the email rule consumes "555-123-4567@x.co" whole; the phone rule
    // counts on the already-redacted text, so the span can't double-count
    val (r, n) = Seq.tabulate(1)(_ => "ping 555-123-4567@x.co ok").toDF("t")
      .select(Redact.redact(col("t")), Redact.piiCount(col("t")))
      .as[(String, Long)].head()
    assert(r == "ping <EMAIL> ok")
    assert(n == 1L)
  }

  // ---- Packing -----------------------------------------------------------

  test("concat-and-chunk assigns docs to the window of their first token") {
    val in = Seq(
      ("en", 1L, 4L), ("en", 2L, 4L), ("en", 3L, 4L), ("en", 4L, 4L),
      ("fr", 1L, 11L), ("fr", 2L, 1L)).toDF("lang", "doc_id", "ntok")
    val out = Packing.concatAndChunk(in, Seq("lang"), "doc_id", "ntok", 10)
      .select("lang", "doc_id", "start_offset", "bin")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // en stream: offsets 0,4,8,12 → bins 0,0,0,1 (doc 3 straddles 10 but starts in bin 0)
    // fr stream: offsets 0,11 → bins 0,1
    assert(out == Set(
      ("en", 1L, 0L, 0L), ("en", 2L, 4L, 0L), ("en", 3L, 8L, 0L), ("en", 4L, 12L, 1L),
      ("fr", 1L, 0L, 0L), ("fr", 2L, 11L, 1L)))
  }

  test("packing conserves tokens and bins are contiguous per group") {
    val t = docs.select(col("lang"), col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("ntok"))
    val packed = Packing.concatAndChunk(t, Seq("lang"), "doc_id", "ntok", 512).persist()
    try {
      val total = t.agg(sum("ntok")).as[Long].head()
      assert(packed.agg(sum("ntok")).as[Long].head() == total)
      // bins 0..max all non-empty per lang
      val gaps = packed.groupBy("lang")
        .agg(countDistinct("bin").as("nbins"), max("bin").as("maxbin"))
        .filter(col("nbins") =!= col("maxbin") + 1)
      assert(gaps.count() == 0, "bin index has gaps")
      // every bin's first doc starts inside that bin's token window
      val bad = packed.groupBy("lang", "bin").agg(min("start_offset").as("first"))
        .filter(col("first") < col("bin") * 512 || col("first") >= (col("bin") + 1) * 512)
      assert(bad.count() == 0, "a bin's first doc starts outside its window")
    } finally packed.unpersist()
  }

  // ---- Decontamination ---------------------------------------------------

  test("contaminatedTrainDocs flags a partial 8-token quote, nothing else") {
    // q73's fixture never exercises the positive path (clones die in dedup
    // first), so pin it here: doc 2 quotes 8 consecutive tokens of test
    // doc 1 inside otherwise-different text (jaccard far below the dedup
    // threshold — exactly the leak only decontamination can see); doc 3
    // shares nothing; doc 4 is a val doc (never flagged); doc 5 is a test
    // doc quoting another test doc (train-side only).
    val quote = (1 to 8).map(i => s"q$i")
    val doc1 = (1 to 20).map(i => s"a$i")                       // test
    val doc2 = (1 to 12).map(i => s"b$i") ++ quote              // train
    val doc1q = doc1.take(6) ++ quote ++ doc1.drop(6)           // test, has quote
    val doc3 = (1 to 20).map(i => s"c$i")                       // train, clean
    val doc4 = doc1q                                            // val, has quote
    val lab = Seq(
      (1L, "test", doc1q), (2L, "train", doc2), (3L, "train", doc3),
      (4L, "val", doc4), (5L, "test", doc2)
    ).toDF("doc_id", "split", "t")
    val flagged = graft.queries.TrainingPack.contaminatedTrainDocs(lab)
      .as[Long].collect().toSet
    assert(flagged == Set(2L), s"expected only the quoting train doc: $flagged")
  }

  // ---- BloomFuncs --------------------------------------------------------

  test("bloom has no false negatives and a plausible false-positive rate") {
    import graft.functions.BloomFuncs
    val keys = (1 to 2000).map(i => s"key-$i").toDF("k")
    val bloom = BloomFuncs.build(keys, col("k"), expectedItems = 2000L)
    // every inserted key must probe true
    assert(keys.filter(!BloomFuncs.mightContain(bloom, col("k"))).count() == 0)
    // non-members probe true at ~fpp (1%) — allow a wide margin
    val others = (1 to 2000).map(i => s"other-$i").toDF("k")
    val fp = others.filter(BloomFuncs.mightContain(bloom, col("k"))).count()
    assert(fp < 200, s"false-positive count $fp way above sized fpp")
  }

  test("an empty build side yields a filter that rejects everything") {
    import graft.functions.BloomFuncs
    val empty = Seq.empty[String].toDF("k")
    val bloom = BloomFuncs.build(empty, col("k"), expectedItems = 100L)
    val probe = (1 to 50).map(i => s"x$i").toDF("k")
    assert(probe.filter(BloomFuncs.mightContain(bloom, col("k"))).count() == 0)
  }

  test("bloom prefilter + exact confirm equals the plain join") {
    import graft.functions.BloomFuncs
    val big = (1L to 3000L).map(i => (i, s"g${i % 700}")).toDF("id", "gram")
    val small = (0L to 99L).map(i => (i, s"g${i * 7}")).toDF("sid", "gram")
    val bloom = BloomFuncs.build(small, col("gram"), expectedItems = 1000L)
    val viaBloom = big.filter(BloomFuncs.mightContain(bloom, col("gram")))
      .join(small, "gram").select("id", "sid")
    val plain = big.join(small, "gram").select("id", "sid")
    assert(viaBloom.exceptAll(plain).isEmpty && plain.exceptAll(viaBloom).isEmpty)
    assert(plain.count() > 0, "fixture must actually join")
  }

  // ---- q93 unigram LM ----------------------------------------------------

  test("unigram NLL scores a known corpus exactly") {
    // corpus: "a a a a a b" + "a b c" — counts a=6 b=2 c=1; min-count 5
    // keeps only 'a' in vocab, so V=1, T=9; p(a)=(6+1)/11, p(oov)=1/11
    val in = Seq((1L, "a a a a a b"), (2L, "a b c")).toDF("doc_id", "text")
      .withColumn("source", lit("s")).withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("graft-q93-").toString
    in.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try {
      val out = SparkEntry.byName("q93_unigram_logprob").run(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toList
      val pA = 7.0 / 11.0
      val pOov = 1.0 / 11.0
      def r8(x: Double) = BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
      val d1 = r8((5 * -math.log(pA) + -math.log(pOov)) / 6)
      val d2 = r8((-math.log(pA) + 2 * -math.log(pOov)) / 3)
      assert(out.map(t => (t._1, t._2, t._3)) == List((1L, 6L, 1L), (2L, 3L, 2L)))
      assert(math.abs(out(0)._4 - d1) < 1e-7 && math.abs(out(1)._4 - d2) < 1e-7,
        s"$out vs ($d1, $d2)")
    } finally graft.streaming.Streams.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  // ---- q101 char entropy / q102 source divergence ------------------------

  test("char entropy matches hand-computed values on known strings") {
    val in = Seq((1L, "aaab"), (2L, "abcd"), (3L, "zzzz")).toDF("doc_id", "text")
      .withColumn("source", lit("s")).withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("graft-q101-").toString
    in.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try {
      val out = SparkEntry.byName("q101_char_entropy").run(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toList
      def r8(x: Double) = BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
      val h1 = r8(0.75 * math.log(4.0 / 3) + 0.25 * math.log(4.0))
      val h2 = r8(math.log(4.0)) // uniform over 4 chars
      assert(out.map(t => (t._1, t._2, t._3)) == List((1L, 4L, 2L), (2L, 4L, 4L), (3L, 4L, 1L)))
      assert(math.abs(out(0)._4 - h1) < 1e-7 && math.abs(out(1)._4 - h2) < 1e-7 &&
        out(2)._4 == 0.0, out.toString)
    } finally graft.streaming.Streams.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("JS divergence is zero for a single source and bounded by ln 2") {
    val real = SparkEntry.byName("q102_source_divergence").run(spark, sf)
      .collect().map(r => (r.getString(0), r.getDouble(3)))
    assert(real.nonEmpty)
    real.foreach { case (src, js) =>
      assert(js >= 0.0 && js <= math.log(2.0) + 1e-9, s"$src js=$js out of [0, ln2]")
    }
    // single-source corpus: source dist == corpus dist → divergence exactly 0
    val one = Seq((1L, "x y z"), (2L, "x y")).toDF("doc_id", "text")
      .withColumn("source", lit("only")).withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("graft-q102-").toString
    one.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try {
      val js = SparkEntry.byName("q102_source_divergence").run(spark, dir)
        .collect().map(r => r.getDouble(3)).toList
      assert(js == List(0.0), js.toString)
    } finally graft.streaming.Streams.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  // ---- q97 domain mixture ------------------------------------------------

  test("mixture rates are exact integer math and sampling respects them") {
    val out = SparkEntry.byName("q97_domain_mixture").run(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    val total = out.map(_._3).sum
    val nsrc = out.length
    out.foreach { case (src, nDocs, actual, target, rateBp, sDocs, sToks) =>
      assert(target == total / nsrc, s"$src target")
      assert(rateBp == math.min(10000L, target * 10000 / actual), s"$src rate")
      assert(sDocs <= nDocs && sToks <= actual, s"$src sample bounds")
      // the md5 bucket is uniform: sampled token mass ≈ rate × actual
      val expected = actual * rateBp / 10000.0
      assert(rateBp == 10000L || math.abs(sToks - expected) < 0.25 * actual + 1000,
        s"$src sampled $sToks vs expected ~$expected")
    }
    // at least one over-represented source must be downsampled
    assert(out.exists(_._5 < 10000L), "fixture should force downsampling")
  }

  test("q141 classifier splits the corpus and logits bound the threshold") {
    val rows = SparkEntry.byName("q141_quality_classifier").run(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    rows.foreach { case (src, n, kept, lo, hi) =>
      assert(kept <= n, src)
      assert(lo <= hi, src)
      // classification consistency: kept>0 requires a non-negative max,
      // dropped>0 requires a negative min
      if (kept > 0) assert(hi >= 0, src)
      if (kept < n) assert(lo < 0, src)
    }
    // the fixture must exercise BOTH classes or the query is vacuous
    assert(rows.map(_._3).sum > 0, "nothing kept")
    assert(rows.map(t => t._2 - t._3).sum > 0, "nothing dropped")
  }

  test("q148 confusion counts reconcile with q141 and the q70 gate") {
    val rows = SparkEntry.byName("q148_classifier_eval").run(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))
    // per source: tp+fp must equal q141's n_kept; the four cells sum to n_docs
    val kept = SparkEntry.byName("q141_quality_classifier").run(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { case (src, tp, fp, fn, tn, prec, rec) =>
      val (nDocs, nKept) = kept(src)
      assert(tp + fp == nKept, s"$src predicted-positive mismatch")
      assert(tp + fp + fn + tn == nDocs, s"$src cells don't cover the source")
      if (tp + fp > 0) assert(math.abs(prec - tp.toDouble / (tp + fp)) < 1e-12)
      if (tp + fn > 0) assert(math.abs(rec - tp.toDouble / (tp + fn)) < 1e-12)
    }
    // truth side reconciles with the q70 funnel's pass-all count
    val truthTotal = rows.map(r => r._2 + r._4).sum
    val gatePassed = Tables.documents(spark, sf)
      .filter(graft.queries.TrainingPack.qualityPassAll).count()
    assert(truthTotal == gatePassed)
  }

  test("q134 BPE learning matches an independent Scala replay") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.byName("q134_bpe_learn").run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))

    // plain-Scala replay: greedy left-to-right merge, (count desc, pair asc)
    // tie-break — independent of the delimited-string replace construction
    val freq = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(col("t").rlike("^[A-Za-z0-9]+$"))
      .groupBy("t").count()
      .collect().map(r => r.getString(0) -> r.getLong(1))
    var vocab: Seq[(List[String], Long)] =
      freq.map { case (t, f) => t.map(_.toString).toList -> f }.toSeq
    val expected = (0 until 3).map { r =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.zip(syms.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + f
        }
      }
      val ((a, b), cnt) = counts.toSeq.minBy { case ((x, y), c) => (-c, x + "|" + y) }
      def merge(syms: List[String]): List[String] = {
        val out = scala.collection.mutable.ListBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        out.toList
      }
      vocab = vocab.map { case (syms, f) => merge(syms) -> f }
      val total = vocab.map { case (syms, f) => syms.length * f }.sum
      (r.toLong, a + "|" + b, cnt, total)
    }
    assert(got.toList == expected.toList)
  }

  test("q133 priors shrink every source mean strictly toward the corpus mean") {
    val rows = SparkEntry.byName("q133_domain_prior").run(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // recover the corpus mean as the doc-weighted average of raw means
    val g = rows.map { case (_, n, m, _) => n * m }.sum / rows.map(_._2).sum
    rows.foreach { case (src, n, raw, shrunk) =>
      val lo = math.min(raw, g) - 1e-7
      val hi = math.max(raw, g) + 1e-7
      assert(shrunk >= lo && shrunk <= hi, s"$src: $shrunk outside [$lo, $hi]")
      // more evidence → less shrinkage: |shrunk-raw| ≤ K/(n+K)·|g-raw| + ulp
      val bound = 10.0 / (n + 10.0) * math.abs(g - raw) + 1e-7
      assert(math.abs(shrunk - raw) <= bound, s"$src shrank too far")
    }
  }

  test("q207 Luhn gate agrees with an independent Scala Luhn on every planted PAN") {
    // reference implementation, written independently of the SQL expression
    def luhnOk(digits: String): Boolean = {
      val s0 = digits.reverse.zipWithIndex.map { case (c, i) =>
        val d = c - '0'
        if (i % 2 == 1) { val dd = d * 2; if (dd > 9) dd - 9 else dd } else d
      }.sum
      s0 % 10 == 0
    }
    // known ISO/IEC 7812 vectors: a published valid test PAN and an
    // off-by-one corruption of it
    assert(luhnOk("4532015112830366"))
    assert(!luhnOk("4532015112830367"))
    val rows = SparkEntry.byName("q207_luhn_pan_gate").run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (docId, nCand, nValid) =>
      // exactly the one planted 16-digit run is card-length; the 4-digit
      // ref number must never enter the candidate set
      assert(nCand == 1L, s"doc $docId: n_candidates=$nCand")
      val pan = "4532" +
        f"${docId * 7919 % 100000000L}%08d" + f"${docId % 1000}%03d" +
        (docId % 10).toString
      val expected = if (luhnOk(pan)) 1L else 0L
      assert(nValid == expected, s"doc $docId pan=$pan")
    }
    // both classes must actually occur in the fixture
    assert(rows.exists(_._3 == 1L) && rows.exists(_._3 == 0L))
  }

  test("q243 IBAN gate agrees with an independent BigInteger mod-97 on every plant") {
    // reference implementation: full-precision BigInteger remainder over
    // the expanded rearranged number — no chunking, written independently
    // of the SQL's 9-digit fold
    def ibanOk(iban: String): Boolean = {
      val re = iban.substring(4) + iban.substring(0, 4)
      val digits = re.flatMap(c =>
        if (c.isLetter) (c - 'A' + 10).toString else c.toString)
      new java.math.BigInteger(digits).mod(java.math.BigInteger.valueOf(97))
        .intValue == 1
    }
    // a published example: the ISO 13616 illustrative GB IBAN
    assert(ibanOk("GB82WEST12345698765432"))
    assert(!ibanOk("GB82WEST12345698765433"))
    val rows = SparkEntry.byName("q243_iban_gate").run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (docId, nCand, nValid) =>
      assert(nCand == 1L, s"doc $docId: n_candidates=$nCand")
      val es = docId % 3 == 2
      val bb =
        if (es) "210004184500" + f"${docId * 104729 % 100000000L}%08d"
        else "37040044" + f"${docId * 7919 % 10000000000L}%010d"
      val cc = if (es) "ES" else "DE"
      // recompute the check digits the fixture's way, independently
      val pre = (bb + cc.flatMap(c => (c - 'A' + 10).toString) + "00")
      val m = new java.math.BigInteger(pre)
        .mod(java.math.BigInteger.valueOf(97)).intValue
      val ck = 98 - m + (if (docId % 3 == 1) 1 else 0)
      val iban = cc + f"$ck%02d" + bb
      val expected = if (ibanOk(iban)) 1L else 0L
      assert(nValid == expected, s"doc $docId iban=$iban")
      // the invalid class is invalid BY CONSTRUCTION, never by luck
      if (docId % 3 == 1) assert(expected == 0L, s"doc $docId")
    }
    assert(rows.exists(_._3 == 1L) && rows.exists(_._3 == 0L))
  }

  test("q245 reweighting ledger replays from a plain Scala unigram model") {
    val got = SparkEntry.byName("q245_domain_reweight").run(spark, sf)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(got.nonEmpty)
    val rows = Tables.documents(spark, sf).select("source", "text").collect()
      .map(r => (r.getString(0),
        r.getString(1).toLowerCase.replaceAll("[^a-z ]", "")
          .replaceAll("  *", " ").trim.split(" ").filter(_.nonEmpty).toSeq))
    val all = rows.flatMap(_._2)
    val cnt = all.groupBy(identity).map { case (t, o) => t -> o.length.toLong }
    val vocab = cnt.filter(_._2 >= 5)
    val bigT = all.length.toLong; val v = vocab.size.toLong
    def round8(x: Double) =
      BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    def nll(t: String) = BigDecimal(-math.log(
      (vocab.getOrElse(t, 0L) + 1.0) / (bigT + v + 1.0)))
      .setScale(20, BigDecimal.RoundingMode.HALF_UP)
    val sd = rows.groupBy(_._1).map { case (src, g) =>
      val toks = g.flatMap(_._2)
      src -> (toks.length.toLong, toks.map(nll).sum)
    }
    val gt = sd.values.map(_._1).sum
    val gmean = round8(sd.values.map(_._2).sum.toDouble / gt)
    val raws = sd.map { case (src, (n, s0)) =>
      val mean = round8(s0.toDouble / n)
      val excess = round8(mean - gmean)
      val base = 10000L * n / gt
      val delta = math.floor(2500.0 * excess).toLong
      src -> (n, mean, excess, base, delta, math.max(base + delta, 1L))
    }
    val tr = raws.values.map(_._6).sum
    raws.foreach { case (src, (n, mean, excess, base, delta, rw)) =>
      assert(got(src) == ((n, mean, excess, base, delta, 10000L * rw / tr)),
        s"source $src")
    }
    // the update must actually move weight somewhere at this sf
    assert(got.values.exists(v0 => v0._6 != v0._4))
  }

  test("q218 flags every planted key, passes every planted run, entropy re-derives") {
    val rows = SparkEntry.byName("q218_secret_scan").run(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.getString(3)), r.getDouble(4)))
    assert(rows.nonEmpty)
    def entropy(t: String): Double = {
      val n = t.length.toDouble
      val h = t.distinct.map { ch =>
        val c = t.count(_ == ch).toDouble
        BigDecimal((c / n) * math.log(n / c)).setScale(20, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      BigDecimal(h.toDouble).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    rows.foreach { case (doc, nc, nf, sample, maxE) =>
      assert(nc >= 1 && nf <= nc)
      if (doc % 4 == 0) {
        // the planted 35-char key MUST be flagged and carries key-like entropy
        assert(nf >= 1 && sample.isDefined, s"doc $doc key not flagged")
        assert(sample.get.startsWith("key") && entropy(sample.get) >= 2.2,
          s"doc $doc sample ${sample.get}")
      }
      if (doc % 4 == 1 && nc == 1) {
        // the 24-char single-letter run is the only candidate: zero entropy,
        // never flagged (the length-only false positive)
        assert(nf == 0 && maxE == 0.0, s"doc $doc run flagged")
      }
    }
    assert(rows.exists(_._3 > 0) && rows.exists(r => r._3 == 0 && r._2 > 0))
  }

  test("q222 drops exactly the per-source majority lines, keeps the 30% rider") {
    val rows = SparkEntry.byName("q222_boilerplate_lines").run(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    val base = docs.select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    def pageLines(id: Long, src: String, text: String): Seq[String] = {
      val sub =
        if (id % 10 < 3) Some(s"subscribe to the $src newsletter") else None
      Seq(s"site $src navigation menu home about", text) ++
        sub.toSeq :+ s"copyright $src all rights reserved"
    }
    val bySrc = base.groupBy(_._2)
    val dfm: Map[(String, String), Int] = bySrc.flatMap { case (src, ds) =>
      ds.flatMap { case (id, _, t) => pageLines(id, src, t).distinct.map((src, _)) }
        .groupBy(identity).map { case (k, v) => k -> v.size }
    }
    val nSrc = bySrc.map { case (src, ds) => src -> ds.map(_._1).distinct.size }
    val expect = base.map { case (id, src, t) =>
      val ls = pageLines(id, src, t)
      val kept = ls.filterNot(l => 2L * dfm((src, l)) > nSrc(src))
      val sub = if (id % 10 < 3) Some(s"subscribe to the $src newsletter") else None
      val clean = kept.mkString("\n")
      val wanted = (Seq(t) ++ sub.toSeq).mkString("\n")
      id -> (ls.size.toLong, kept.size.toLong, md5hex(clean),
        if (clean == wanted) 1L else 0L)
    }.toMap
    assert(rows.map(_._1).toSet == expect.keySet)
    rows.foreach { case (id, nl, nk, md, rec) =>
      assert((nl, nk, md, rec) == expect(id), s"doc $id")
    }
    // headers+footers must actually be dropped in every page
    assert(rows.forall { case (_, nl, nk, _, _) => nl - nk >= 2 })
    // most docs recover body+[rider] exactly; the exceptions are docs whose
    // body is itself a per-source majority line (mass exact dups — the
    // corpus plants them; dropping those too IS the CCNet semantics), and
    // the per-row equality above already proved each one against the replay
    assert(rows.count(_._5 == 1L) * 2 > rows.size, "majority not recovered")
    assert(rows.exists(_._2 == 4L) && rows.exists(_._2 == 3L))
  }

  test("q229 spans tile every window exactly, clips consistent with q71") {
    val CAP = 2048L
    val rows = SparkEntry.byName("q229_packing_spans").run(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (lang, bin, id, st, len, ch, ct) =>
      assert(st >= 0 && st < CAP && len >= 1 && st + len <= CAP,
        s"($lang,$bin,$id) span out of window")
      // a head-clipped segment always starts at 0; a tail-clipped one
      // always runs to the window end
      if (ch == 1) assert(st == 0, s"($lang,$bin,$id) head clip not at 0")
      if (ct == 1) assert(st + len == CAP, s"($lang,$bin,$id) tail clip short")
    }
    // per (lang, bin): spans are disjoint, sorted by start, and fill the
    // window completely for every bin except the lang's last
    val byBin = rows.groupBy(r => (r._1, r._2))
    val lastBin = rows.groupBy(_._1).map { case (l, g) => l -> g.map(_._2).max }
    byBin.foreach { case ((lang, bin), segs) =>
      val sorted = segs.sortBy(_._4).toSeq
      sorted.sliding(2).filter(_.size == 2).foreach { w =>
        assert(w(0)._4 + w(0)._5 == w(1)._4, s"($lang,$bin) gap/overlap")
      }
      assert(sorted.head._4 == 0, s"($lang,$bin) does not start at 0")
      val fill = segs.map(_._5).sum
      if (bin != lastBin(lang)) assert(fill == CAP, s"($lang,$bin) fill $fill")
      else assert(fill <= CAP)
    }
    // q71 consistency: a doc's FIRST segment count per (lang, bin) equals
    // q71's n_docs
    val q71 = SparkEntry.byName("q71_sequence_packing").run(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val firstSegs = rows.filter(_._6 == 0L).groupBy(r => (r._1, r._2))
      .map { case (k, g) => k -> g.size.toLong }
    assert(firstSegs == q71, "first-segment counts disagree with q71")
    // both clip classes occur (docs straddle windows at this sf)
    assert(rows.exists(_._6 == 1L) && rows.exists(_._7 == 1L))
  }

  test("q223 flags exactly the planted mixed-script tokens") {
    val rows = SparkEntry.byName("q223_script_mix_scan").run(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.getString(4)), r.getLong(5)))
    assert(rows.nonEmpty)
    val base = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(rows.map(_._1).toSet == base.keySet)
    def hasLat(t: String) = t.exists(c => c >= 'a' && c <= 'z')
    def hasCyr(t: String) = t.exists(c => c >= '\u0400' && c <= '\u04FF')
    rows.foreach { case (id, nTok, nMixed, nCyr, sample, rec) =>
      val spoof =
        if (id % 5 == 0) Some("p\u0430yp\u0430l-" + (id % 7)) else None
      val cyr =
        if (id % 7 == 0) Some("\u043f\u0440\u0438\u0432\u0435\u0442") else None
      val b42 = if (id % 4 == 0) Some("build42") else None
      val toks = base(id).split(" ").toSeq ++ spoof ++ cyr ++ b42
      val mixed = toks.filter(t => hasLat(t) && hasCyr(t))
      assert(nTok == toks.size, s"doc $id n_tokens")
      assert(nMixed == mixed.size && nMixed == spoof.size.toLong, s"doc $id mixed")
      assert(nCyr == toks.count(hasCyr) &&
        nCyr == (spoof.size + cyr.size).toLong, s"doc $id cyr")
      assert(sample == mixed.sorted.headOption, s"doc $id sample")
      assert(rec == 1L, s"doc $id recovered")
    }
    // all three plant classes occur, and the two must-NOT-flag classes
    // really never flag
    assert(rows.exists(_._3 > 0) && rows.exists(r => r._4 > r._3))
    assert(rows.filter(_._1 % 5 != 0).forall(_._3 == 0L))
  }

  test("q216 streaming drift gate is row-identical to batch q197") {
    // bin counts merge by exact addition, so the per-micro-batch
    // accumulated histogram must equal the one-pass scan — the same
    // batch-vs-stream equality HeavyHittersSpec pins for q125/q130
    val batch = SparkEntry.byName("q197_distribution_drift").run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val stream = SparkEntry.byName("q216_stream_drift_gate").run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(batch.length == 8 && stream.toSeq == batch.toSeq)
  }

  test("q215 alpha weights and budget ledger re-derive exactly in Scala") {
    val rows = SparkEntry.byName("q215_alpha_sampling_plan").run(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    // exact floor(c^0.75) via BigInt quartic search — fully independent
    // of both engines' pow()
    def pow34(c: Long): Long = {
      val c3 = BigInt(c).pow(3)
      var r = math.floor(math.pow(c.toDouble, 0.75)).toLong
      while (BigInt(r + 1).pow(4) <= c3) r += 1
      while (BigInt(r).pow(4) > c3) r -= 1
      r
    }
    val total = rows.map(_._2).sum
    val sw = rows.map(r => pow34(r._2)).sum
    rows.foreach { case (lang, c, w, shareBp, quota, rateBp) =>
      assert(w == pow34(c), s"$lang weight")
      assert(shareBp == w * 10000L / sw, s"$lang share")
      assert(quota == total / 2 / 10000 * shareBp, s"$lang quota")
      assert(rateBp == math.min(10000L, quota * 10000L / c), s"$lang rate")
    }
    // α < 1 flattens the mixture: shares are damped toward uniform
    val maxRaw = rows.maxBy(_._2)
    assert(maxRaw._4 * total <= maxRaw._2 * 10000L,
      "largest language's share exceeds its raw proportion")
  }

  test("q212 curriculum ranks are a difficulty permutation and the sqrt competence cuts hold") {
    val rows = SparkEntry.byName("q212_curriculum_schedule").run(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    val n = rows.length
    assert(n > 0)
    // rank is a permutation of 1..N in (avg_nll, doc_id) order
    assert(rows.map(_._3).sorted.toSeq == (1L to n.toLong))
    val byRank = rows.sortBy(_._3)
    assert(byRank.map(r => (r._2, r._1)).toSeq ==
      rows.map(r => (r._2, r._1)).sortBy(identity).toSeq)
    // first_epoch = smallest e with rank <= floor(N*sqrt(e/4))
    rows.foreach { case (doc, _, rank, fe) =>
      val expect = (1 to 4).find(e =>
        e == 4 || rank <= math.floor(n * math.sqrt(e / 4.0)).toLong).get
      assert(fe == expect.toLong, s"doc $doc rank $rank")
    }
    // the difficulty score is q93's avg_nll, verbatim
    val q93 = SparkEntry.byName("q93_unigram_logprob").run(spark, sf)
      .select("doc_id", "avg_nll").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { case (doc, nll, _, _) => assert(q93(doc) == nll) }
  }

  test("q211 fertility ledger is consistent with q135's encode totals") {
    val fert = SparkEntry.byName("q211_tokenizer_fertility").run(spark, sf)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
      .toMap
    val enc = SparkEntry.byName("q135_bpe_encode").run(spark, sf)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(fert.keySet == enc.keySet && fert.nonEmpty)
    fert.foreach { case (lang, (nw, nsub, nsingle, maxf, f, cps)) =>
      // same join, same corpus: totals must agree with q135 exactly
      assert((nw, nsub) == enc(lang), s"$lang totals diverge from q135")
      assert(nsingle >= 0 && nsingle <= nw)
      // every word is at least one subword; fertility sits in [1, maxf]
      assert(nsub >= nw && maxf >= 1)
      assert(f >= 1.0 && f <= maxf.toDouble, s"$lang fertility $f")
      // a subword is at least one char, so chars/subword >= 1
      assert(cps >= 1.0, s"$lang chars_per_subword $cps")
    }
  }

  test("q209 Kneser-Ney probabilities are in (0,1] and seen mass per history <= 1") {
    val rows = SparkEntry.byName("q209_kneser_ney").run(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(5), r.getLong(6),
        r.getDouble(7)))
    assert(rows.nonEmpty)
    rows.foreach { case (v, cvw, num, den, p) =>
      assert(cvw >= 5, s"$v: output below min count")
      assert(num > 0 && num <= den, s"$v: num=$num den=$den")
      assert(p > 0.0 && p <= 1.0, s"$v: p=$p")
    }
    // the interpolated-KN normalization property, restricted to emitted
    // rows: the seen probability mass of any history is at most 1 (the
    // remainder is the backoff mass of its unseen continuations)
    rows.groupBy(_._1).foreach { case (v, g) =>
      val mass = g.map(_._5).sum
      assert(mass <= 1.0 + 1e-6, s"history $v seen mass $mass > 1")
    }
  }
}
