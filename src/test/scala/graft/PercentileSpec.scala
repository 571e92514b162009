package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q64's exact-vs-approx percentile pairing: approx_percentile's rank-error
  * guarantee against the exact interpolated percentile (the q43 HLL
  * pattern, for quantiles).
  */
class PercentileSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  test("approx_percentile lands within the rank-error bound of exact") {
    // accuracy a ⇒ the returned DATA value's rank is within n/a of the
    // target rank (the sketch returns an actual element, not an
    // interpolation). Assert directly in rank space: the approx value must
    // lie between the order statistics at ranks (p ± 1/a)·n, with one
    // index of slack for floor/ceil convention differences.
    val acc = 1000
    val eps = 1.0 / acc
    val groups = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_quantity"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (g, rs) => g -> rs.map(_.getDouble(1)).sorted }
    assert(groups.nonEmpty)
    for (p <- Seq(0.5, 0.9)) {
      val approxRows = Tables.lineitem(spark, sf)
        .groupBy(col("l_returnflag"))
        .agg(approx_percentile(col("l_quantity"), lit(p), lit(acc)).as("approx"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      groups.foreach { case (g, sorted) =>
        val n = sorted.length
        val a = approxRows(g)
        val loIdx = math.max(0, math.floor((p - eps) * n).toInt - 1)
        val hiIdx = math.min(n - 1, math.ceil((p + eps) * n).toInt + 1)
        assert(a >= sorted(loIdx) && a <= sorted(hiIdx),
          s"p=$p group=$g n=$n: approx $a outside rank band " +
            s"[${sorted(loIdx)}, ${sorted(hiIdx)}] (idx $loIdx..$hiIdx)")
      }
    }
  }

  test("q64 emits exact columns plus all-green sketch-contract audits per group") {
    val df = SparkEntry.byName("q64_approx_percentiles").run(spark, sf)
    assert(df.columns.toSeq ==
      Seq("l_returnflag", "n", "median_qty", "p90_qty",
        "approx_median_ok", "approx_p90_ok", "member_ok"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    // the audits the oracle pins to 1 — the in-query rank check must agree
    // with this spec's ground-truth rank-band test above
    rows.foreach { r =>
      assert(r.getLong(4) == 1L, s"group ${r.getString(0)}: approx_median_ok")
      assert(r.getLong(5) == 1L, s"group ${r.getString(0)}: approx_p90_ok")
      assert(r.getLong(6) == 1L, s"group ${r.getString(0)}: member_ok")
    }
  }

  test("Quantiles.exactRanks matches sorted ground truth on adversarial data (q156)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // distributions the refinement loop must survive: heavy duplicates,
    // negatives, a range wider than 2^53 (the double-division trap), and
    // a constant column (range 0 — must close in round zero)
    val cases: Seq[(String, Seq[Long])] = Seq(
      "dups" -> Seq.fill(500)(rnd.nextInt(10).toLong),
      "negatives" -> Seq.fill(300)(rnd.nextInt(2000).toLong - 1000L),
      "wide" -> (Seq(Long.MinValue + 10, Long.MaxValue - 10) ++
        Seq.fill(200)(rnd.nextLong())),
      "constant" -> Seq.fill(100)(7L),
      "skew" -> (Seq.fill(400)(1L) ++ Seq.fill(3)(1000000L)))
    for ((label, xs) <- cases) {
      val sorted = xs.sorted
      val n = xs.size
      val ranks = Seq(1L, n / 2L + 1, n.toLong)
      // small bucket count forces multiple refinement rounds
      val got = graft.operators.Quantiles.exactRanks(xs.toDF("x"), "x", ranks, buckets = 4)
      for (k <- ranks)
        assert(got(k) == sorted((k - 1).toInt),
          s"$label rank $k: got ${got(k)}, want ${sorted((k - 1).toInt)}")
    }
  }

  test("Quantiles.exactWeightedPercentiles matches cumulative-weight ground truth (q159)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(400)((rnd.nextInt(50).toLong - 10L, rnd.nextInt(9).toLong + 1L))
    val df = rows.toDF("x", "w")
    val got = graft.operators.Quantiles
      .exactWeightedPercentiles(df, "x", "w", Seq(1, 25, 50, 90, 100), buckets = 4)
    val total = rows.map(_._2).sum
    val sorted = rows.sortBy(_._1)
    for ((p, k, v) <- got) {
      assert(k == math.max(1L, (total * p + 99) / 100))
      // ground truth: smallest x whose running weight reaches k
      val truth = sorted
        .scanLeft((0L, 0L)) { case ((_, cum), (x, w)) => (x, cum + w) }
        .tail.find(_._2 >= k).get._1
      assert(v == truth, s"p$p (weight rank $k): $v != $truth")
    }
    // weight-1 degenerates to the unweighted definition
    val ones = graft.operators.Quantiles
      .exactWeightedPercentiles(df.withColumn("w", lit(1L)), "x", "w", Seq(50), buckets = 4)
    val plain = graft.operators.Quantiles.exactPercentiles(df, "x", Seq(50), buckets = 4)
    assert(ones.map(t => (t._1, t._3)) == plain.map(t => (t._1, t._3)))
  }

  test("Quantiles.exactGroupPercentiles matches per-group sorted ground truth (q166)") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    // groups of very different sizes and ranges share the refinement
    // rounds; the widest group must not corrupt the narrow ones
    val rows = Seq.tabulate(600) { i =>
      val g = s"g${i % 4}"
      val x = if (i % 4 == 0) rnd.nextLong() else rnd.nextInt(100 * (i % 4 + 1)).toLong
      (g, x)
    }
    val got = graft.operators.Quantiles
      .exactGroupPercentiles(rows.toDF("g", "x"), "g", "x", Seq(10, 50, 99), buckets = 4)
    val byG = rows.groupBy(_._1).map { case (g, rs) => g -> rs.map(_._2).sorted }
    assert(got.map(_._1).toSet == byG.keySet)
    for ((g, p, k, v) <- got) {
      val sorted = byG(g)
      assert(k == math.max(1L, (sorted.length.toLong * p + 99) / 100))
      assert(v == sorted((k - 1).toInt), s"group $g p$p rank $k: $v != ${sorted((k - 1).toInt)}")
    }
  }

  test("Quantiles.exactPercentiles ranks agree with exactRanks on lineitem") {
    val df = Tables.lineitem(spark, sf)
      .select((col("l_extendedprice") * 100).cast("long").as("cents"))
    val ps = graft.operators.Quantiles.exactPercentiles(df, "cents", Seq(50, 99))
    val exact = df.collect().map(_.getLong(0)).sorted
    for ((p, k, v) <- ps) {
      assert(k == math.max(1L, (exact.length.toLong * p + 99) / 100))
      assert(v == exact((k - 1).toInt), s"p$p rank $k: $v != ${exact((k - 1).toInt)}")
    }
  }
}
