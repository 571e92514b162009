package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The new analytics entries against independent formulations: q120's
  * decimal-moment correlation vs Spark's built-in corr(), q119's bins vs
  * their conservation laws, q118's profile vs direct counts.
  */
class AnalyticsSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

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
}
