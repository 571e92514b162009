package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The new analytics entries against independent formulations: q120's
  * decimal-moment correlation vs Spark's built-in corr(), q119's bins vs
  * their conservation laws, q118's profile vs direct counts.
  */
class AnalyticsSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  test("GlobalIds-backed queries leave no cached frames behind") {
    // r10 verdict: GlobalIds persisted its range exchange with no
    // reachable unpersist, so composing q157/q163/q164/q165/q173 in one
    // session accumulated cached partitions unbounded. The operator now
    // materializes via localCheckpoint (no cache-manager entry; blocks
    // free on GC) — composing every GlobalIds consumer back-to-back must
    // leave the session cache exactly as empty as it started.
    spark.catalog.clearCache()
    for (name <- Seq("q157_global_ids", "q163_shard_plan",
        "q164_vocab_growth", "q165_zipf_slope", "q173_epoch_shuffle")) {
      SparkEntry.byName(name).run(spark, sf).count()
      assert(spark.sharedState.cacheManager.isEmpty,
        s"$name left cached frames in the session")
    }
    // q173 + q177 composition (ADVICE r11): q177's sort frame used to be a
    // builder persist with no reachable release — now localCheckpoint-backed,
    // so the only cache the composition may leave is the documented
    // sessionManaged capped-grams internal of q177's verify stage
    SparkEntry.byName("q173_epoch_shuffle").run(spark, sf).count()
    SparkEntry.byName("q177_sorted_neighborhood").run(spark, sf).count()
    assert(cachedEntryCount <= 1,
      s"q173+q177 composition left $cachedEntryCount cached frames " +
        "(expected ≤ 1: the sessionManaged capped grams)")
    spark.catalog.clearCache()
    // direct operator composition, as a library consumer would
    val df = Tables.documents(spark, sf).select(col("doc_id"), col("n_chars"))
    operators.GlobalIds.assign(df, Seq(col("doc_id")), "gid").count()
    operators.GlobalIds.prefixSum(df, Seq(col("doc_id")), "n_chars", "pfx").count()
    assert(spark.sharedState.cacheManager.isEmpty)
  }

  test("measured-width iterative queries never disturb the session shuffle width") {
    // CC/PageRank/PPR/LPA express their measured round width IN THE PLAN
    // (explicit repartition — see PlanSpec's width audit); session conf
    // must come out of every builder exactly as it went in, with no
    // narrow-width window even transiently observable (the r11 form
    // mutated-and-restored it, which raced q124's concurrent CC ∥ PR)
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    // ADVICE r11: every persist these BUILDERS take feeds an EAGER,
    // checkpoint-backed operator (CC / PR / PPR / LPA), so those caches
    // must be released by the time the builder returns. What MAY remain
    // cached is the documented sessionManaged internals of the shared
    // candidate generators (winnowMatchPairs' capped fingerprints,
    // jaccardPairs' grams/pairs), released by the harness's clearCache —
    // pinned exactly below so any NEW unreleased builder persist (the
    // q109-edges/q124-mp leak class) fails this test.
    val expectedInternal = Map(
      "q109_match_pagerank" -> 1, // winnowMatchPairs: capped fingerprints
      "q124_canonical_selection" -> 1, // same capped (mp itself released)
      "q144_label_propagation" -> 2, // jaccardPairs: grams + match pairs
      "q145_personalized_pagerank" -> 2)
    for ((name, internal) <- expectedInternal) {
      spark.catalog.clearCache()
      SparkEntry.byName(name).run(spark, sf).count()
      assert(spark.conf.get(key) == before, s"$name leaked shuffle width")
      assert(cachedEntryCount <= internal,
        s"$name left ${cachedEntryCount} cached frames (expected ≤ $internal " +
          "sessionManaged internals) — a builder persist has no release")
    }
    spark.catalog.clearCache()
  }

  /** Number of entries in the session's CacheManager (its `cachedData`
    * field is private — reflection is test-only). `isEmpty` alone can't
    * distinguish "builder leaked its persist" from the documented
    * sessionManaged operator internals that legitimately stay cached
    * until `clearCache()`. */
  private def cachedEntryCount: Int = {
    val f = classOf[org.apache.spark.sql.execution.CacheManager]
      .getDeclaredField("cachedData")
    f.setAccessible(true)
    f.get(spark.sharedState.cacheManager).asInstanceOf[IndexedSeq[_]].size
  }

  test("q120 correlation matches built-in corr() to float tolerance") {
    val got = SparkEntry.byName("q120_correlation").run(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val li = Tables.lineitem(spark, sf)
    val builtin = li.agg(
      corr(col("l_quantity"), col("l_extendedprice")).as("qp"),
      corr(col("l_quantity"), col("l_discount")).as("qd"),
      corr(col("l_extendedprice"), col("l_discount")).as("pd")).head()
    assert(math.abs(got("quantity_price") - builtin.getDouble(0)) < 1e-6)
    assert(math.abs(got("quantity_discount") - builtin.getDouble(1)) < 1e-6)
    assert(math.abs(got("price_discount") - builtin.getDouble(2)) < 1e-6)
  }

  test("q119 bins conserve rows and total, and are ordered ranges") {
    val bins = SparkEntry.byName("q119_quantile_bins").run(spark, sf).collect()
    assert(bins.length == 10)
    val li = Tables.lineitem(spark, sf)
    assert(bins.map(_.getLong(1)).sum == li.count())
    // equal-frequency: bucket sizes differ by at most 1
    val sizes = bins.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1)
    // deciles are non-overlapping, increasing ranges
    val sorted = bins.sortBy(_.getLong(0))
    sorted.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(3) <= b.getDouble(2),
        s"bin ${a.getLong(0)} hi > bin ${b.getLong(0)} lo")
    }
  }

  test("q118 profile agrees with direct per-column counts") {
    val prof = SparkEntry.byName("q118_table_profile").run(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val li = Tables.lineitem(spark, sf)
    val n = li.count()
    for (c <- Seq("l_returnflag", "l_quantity")) {
      val (pn, pnull, pdist) = prof(c)
      assert(pn == n)
      assert(pnull == n - li.filter(col(c).isNotNull).count())
      assert(pdist == li.select(c).distinct().count())
    }
  }

  test("q127 zone maps: same block count per layout, sound scan sets") {
    val rows = SparkEntry.byName("q127_zonemap_prune").run(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows.keySet == Set("insertion", "lex", "zorder"))
    val blockCounts = rows.values.map(_._1).toSet
    assert(blockCounts.size == 1, s"layouts disagree on block count: $rows")
    rows.foreach { case (layout, (n, u, h, both)) =>
      assert(u <= n && h <= n, s"$layout scans more blocks than exist")
      // a conjunctive predicate prunes when EITHER dimension is disjoint
      assert(both <= math.min(u, h), s"$layout: both-scan exceeds a dimension")
      assert(both >= 1, s"$layout: predicate misses all data — vacuous fixture")
    }
    // lexicographic order must prune its leading column at least as well
    // as arrival order does
    assert(rows("lex")._2 <= rows("insertion")._2)
  }

  test("q128 compaction plan conserves files/bytes with contiguous bins") {
    val rows = SparkEntry.byName("q128_compaction_plan").run(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
    assert(rows.map(_.getLong(2)).sum == docs.count())
    val totalBytes = docs.select(sum(length(col("text")).cast("long"))).head.getLong(0)
    assert(rows.map(_.getLong(3)).sum == totalBytes)
    rows.groupBy(_.getString(0)).foreach { case (src, bins) =>
      val ids = bins.map(_.getLong(1)).sorted
      assert(ids.toList == (0L until ids.length).toList,
        s"$src: bins not contiguous from 0: ${ids.toSeq}")
      // doc ranges are disjoint and increasing with bin id
      bins.sortBy(_.getLong(1)).sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(5) < b.getLong(4),
          s"$src: bin ranges overlap")
        case _ =>
      }
    }
  }

  test("q140 approx buckets track the exact deciles within the sketch band") {
    // ground truth, independent of the query's own in-plan audit: rebuild
    // the bucket counts from the same cut model and hold the band directly
    val li = Tables.lineitem(spark, sf)
    val n = li.count()
    val cuts = li.agg(expr(
      "approx_percentile(l_extendedprice, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9), 10000)")
      .as("c")).head().getSeq[Double](0)
    val bucket = cuts.zipWithIndex.foldLeft(lit(1L)) { case (acc, (cut, i)) =>
      when(col("l_extendedprice") > cut, lit(i.toLong + 2)).otherwise(acc)
    }
    val counts = li.select(bucket.as("bin")).groupBy("bin").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == n, "rows not conserved")
    // approx_percentile(accuracy=10000): rank error <= n/accuracy per cut,
    // so each bucket count sits within 2n/accuracy (+slack) of n/10
    val tol = 2.0 * n / 10000 + 2
    (1L to 10L).foreach { b =>
      assert(math.abs(counts.getOrElse(b, 0L) - n / 10.0) <= tol,
        s"bin $b: ${counts.getOrElse(b, 0L)} vs ${n / 10.0} (tol $tol)")
    }
    // and the registered query's hash-pinned audits agree: all booleans 1
    val rows = SparkEntry.byName("q140_quantile_bucket_join").run(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 10L).toSeq)
    rows.foreach { r =>
      assert(r.getLong(1) == 1L, s"bin ${r.getLong(0)}: band_ok")
      assert(r.getLong(2) == 1L, s"bin ${r.getLong(0)}: mono_ok")
      assert(r.getLong(3) == 1L, s"bin ${r.getLong(0)}: rows_ok")
      assert(r.getLong(4) == 1L, s"bin ${r.getLong(0)}: mass_ok")
    }
  }

  test("q136 mergeable top-k is independent of input partitioning") {
    val topk = udaf(new graft.functions.TopKRows(5))
    def run(parts: Int) = Tables.lineitem(spark, sf)
      .repartition(parts)
      .groupBy("l_returnflag")
      .agg(topk(col("l_extendedprice"), col("l_orderkey"),
        col("l_linenumber").cast("long")).as("tk"))
      .select(col("l_returnflag"), posexplode(col("tk")).as(Seq("pos", "row")))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getStruct(2).toString))
      .sortBy(t => (t._1, t._2))
    assert(run(1).toSeq == run(13).toSeq)
    // and it agrees with the window formulation the oracle states
    val viaAgg = SparkEntry.byName("q136_topk_mergeable").run(spark, sf)
      .collect().map(_.toSeq).toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_returnflag")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    val viaWindow = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_extendedprice").as("price"),
        col("l_orderkey").as("okey"), col("l_linenumber").cast("long").as("lineno"),
        row_number().over(w).cast("long").as("rk"))
      .filter(col("rk") <= 5)
      .select("l_returnflag", "rk", "price", "okey", "lineno")
      .orderBy("l_returnflag", "rk")
      .collect().map(_.toSeq).toSeq
    assert(viaAgg == viaWindow)
  }

  test("q129 weighted sample keeps every full-weight doc, none twice") {
    val sample = SparkEntry.byName("q129_weighted_sample").run(spark, sf).collect()
    val ids = sample.map(_.getLong(0))
    assert(ids.distinct.length == ids.length)
    // weight caps at 1 for ntok >= 100: those docs are kept with certainty
    val fullWeight = Tables.documents(spark, sf)
      .filter(size(split(col("text"), " ")) >= 100)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(fullWeight.subsetOf(ids.toSet),
      s"missing ${fullWeight.diff(ids.toSet).size} certain-keep docs")
    // determinism: a second run reproduces the exact sample
    val again = SparkEntry.byName("q129_weighted_sample").run(spark, sf)
      .collect().map(_.getLong(0))
    assert(again.toSeq == ids.toSeq)
  }

  test("GlobalIds assigns a dense 1..n permutation invariant to partitioning (q157)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // duplicate keys force the tie-break to matter; id column makes the
    // order total
    val rows = (1L to 500L).map(i => (i, rnd.nextInt(20).toLong))
    val df = rows.toDF("id", "key")
    def run(parts: Int): Seq[(Long, Long)] =
      graft.operators.GlobalIds
        .assign(df, Seq(col("key").desc, col("id")), "gid", parts)
        .select("id", "gid").collect().map(r => (r.getLong(0), r.getLong(1)))
        .sortBy(_._1).toSeq
    val expected = rows.sortBy { case (id, key) => (-key, id) }
      .zipWithIndex.map { case ((id, _), i) => (id, i + 1L) }
      .sortBy(_._1)
    // dense permutation matching the total order, and bit-identical under
    // 3, 7 and 32 partitions — boundary placement must not matter
    for (p <- Seq(3, 7, 32)) {
      spark.catalog.clearCache()
      assert(run(p) == expected, s"partitions=$p")
    }
  }

  test("GlobalIds.prefixSum equals the sequential exclusive scan at any partitioning (q163)") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = (1L to 400L).map(i => (i, rnd.nextInt(100).toLong))
    val df = rows.toDF("id", "w")
    val expected = rows.sortBy(_._1)
      .scanLeft((0L, 0L)) { case ((_, cum), (id, w)) => (id, cum + w) }
      .init.zip(rows.sortBy(_._1)).map { case ((_, cumBefore), (id, _)) => (id, cumBefore) }
    for (p <- Seq(3, 7, 32)) {
      spark.catalog.clearCache()
      val got = graft.operators.GlobalIds
        .prefixSum(df, Seq(col("id")), "w", "cumb", p)
        .select("id", "cumb").collect().map(r => (r.getLong(0), r.getLong(1)))
        .sortBy(_._1).toSeq
      assert(got == expected, s"partitions=$p")
    }
  }

  test("q176 CUSUM window identity equals the sequential recurrence") {
    val got = SparkEntry.byName("q176_cusum_drift").run(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val hourly = Tables.events(spark, sf)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.get(1).toString, r.getLong(2)))
    assert(got.keySet == hourly.map(_._1).toSet)
    for ((tpe, rows) <- hourly.groupBy(_._1)) {
      // ISO timestamp strings sort chronologically
      val series = rows.sortBy(_._2).map(_._3)
      val n = series.length.toLong
      val k = (series.sum + n - 1) / n
      var s = 0L; var maxS = 0L; var alarms = 0L
      for (c <- series) {
        s = math.max(0L, s + (c - k))
        maxS = math.max(maxS, s)
        if (s > 3 * k) alarms += 1
      }
      val (gn, gk, gmax, galarm) = got(tpe)
      assert(gn == n && gk == k && gmax == maxS && galarm == alarms,
        s"$tpe: got ($gn,$gk,$gmax,$galarm) want ($n,$k,$maxS,$alarms)")
    }
  }

  test("q173 epoch positions form a dense 1..n permutation per epoch") {
    val rows = SparkEntry.byName("q173_epoch_shuffle").run(spark, sf).collect()
    val n = Tables.documents(spark, sf).count()
    for (e <- Seq(0L, 1L)) {
      val er = rows.filter(_.getLong(0) == e)
      assert(er.map(_.getLong(2)).sum == n, s"epoch $e doc count")
      assert(er.map(_.getLong(3)).min == 1L, s"epoch $e min pos")
      assert(er.map(_.getLong(4)).max == n, s"epoch $e max pos")
      assert(er.map(_.getLong(5)).sum == n * (n + 1) / 2, s"epoch $e pos sum")
    }
    // different epoch salts must give a different interleaving
    val bySrc = rows.groupBy(_.getString(1))
    assert(bySrc.values.exists(rs =>
      rs.map(_.getLong(5)).distinct.length > 1),
      "epoch 0 and 1 produced identical per-source position sums")
  }

  test("q177 sorted-neighborhood pairs are a subset of the exact q27 pairs") {
    val sn = SparkEntry.byName("q177_sorted_neighborhood").run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val exact = SparkEntry.byName("q27_ngram_jaccard").run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sn.forall(_._3 >= 0.5))
    assert(sn.map(p => (p._1, p._2)).toSet.subsetOf(exact),
      "sorted-neighborhood emitted a pair the exact-Jaccard join does not")
  }

  test("q178 merged MV is consistent with the direct recompute everywhere") {
    val rows = SparkEntry.byName("q178_incremental_mv").run(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(5) == 1L), "a month's merged partials diverged")
  }

  test("q179 mojibake gate flags exactly the planted damage") {
    // precondition, asserted explicitly so a fixture regeneration that
    // violates it fails HERE with a clear message instead of as a
    // confusing flagged/planted mismatch below: clean documents must not
    // naturally contain the damage markers the detector counts
    val dirtyClean = Tables.documents(spark, sf)
      .filter(col("doc_id") % 7 =!= 0)
      .filter(col("text").contains("\u00c3") || col("text").contains("\ufffd")
        || col("text").contains("\u0007"))
      .count()
    assert(dirtyClean == 0L,
      s"fixture precondition broken: $dirtyClean clean docs contain damage markers")
    val rows = SparkEntry.byName("q179_mojibake_gate").run(spark, sf).collect()
    val planted = Tables.documents(spark, sf)
      .filter(col("doc_id") % 7 === 0)
      .groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (r <- rows) {
      assert(r.getLong(4) == 0L, s"${r.getString(0)}: detector mismatched plant")
      assert(r.getLong(2) == planted.getOrElse(r.getString(0), 0L))
      assert(r.getLong(3) == r.getLong(2), "flagged != planted")
    }
  }
}
