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
    // accuracy a ⇒ the reported value's rank is within n/a of the target
    // rank. Assert value-wise: the approx must lie between the exact
    // interpolated quantiles at p ± 1/a (clamped to [0,1]).
    val acc = 1000
    val eps = 1.0 / acc
    for (p <- Seq(0.5, 0.9)) {
      val lo = math.max(0.0, p - eps)
      val hi = math.min(1.0, p + eps)
      val rows = Tables.lineitem(spark, sf)
        .groupBy(col("l_returnflag"))
        .agg(
          percentile(col("l_quantity"), lit(lo)).as("lo"),
          percentile(col("l_quantity"), lit(hi)).as("hi"),
          approx_percentile(col("l_quantity"), lit(p), lit(acc)).as("approx"))
        .collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val (l, h, a) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
        assert(a >= l && a <= h,
          s"p=$p group=${r.get(0)}: approx $a outside exact rank band [$l, $h]")
      }
    }
  }

  test("q64 emits both exact and approx columns per group") {
    val df = SparkEntry.byName("q64_approx_percentiles").run(spark, sf)
    assert(df.columns.toSeq ==
      Seq("l_returnflag", "n", "median_qty", "p90_qty", "approx_median_qty", "approx_p90_qty"))
    assert(df.count() > 0)
  }
}
