package graft

import graft.functions.MisraGries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Misra-Gries guarantees against exact token counts: recall of every true
  * heavy hitter and the count error bound, independent of merge order.
  */
class HeavyHittersSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}
  import spark.implicits._

  private val k = 50

  test("every true heavy hitter surfaces, counts within the MG bound") {
    val tokens = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("t"))
    val n = tokens.count()
    val exact = tokens.groupBy("t").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val mg = udaf(new MisraGries(k))
    val sketch = tokens.agg(mg(col("t")).as("hh"))
      .collect()(0).getMap[String, Long](0)

    val slack = n / (k + 1)
    val trueHH = exact.filter(_._2 > slack)
    assert(trueHH.nonEmpty, "fixture has no heavy hitters — vacuous")
    trueHH.foreach { case (t, c) =>
      assert(sketch.contains(t), s"missed true heavy hitter '$t' ($c > $slack)")
    }
    sketch.foreach { case (t, c) =>
      val truth = exact.getOrElse(t, 0L)
      assert(c <= truth, s"overcount for '$t': $c > $truth")
      assert(c >= truth - slack, s"undercount beyond bound for '$t': $c < $truth - $slack")
    }
    assert(sketch.size <= k)
  }

  test("grouped sketch: per-lang heavy hitters hold the same guarantees") {
    val tokens = Tables.documents(spark, sf)
      .select(col("lang"), explode(split(col("text"), " ")).as("t"))
    val mg = udaf(new MisraGries(k))
    val perLang = tokens.groupBy("lang").agg(mg(col("t")).as("hh"))
      .collect().map(r => r.getString(0) -> r.getMap[String, Long](1)).toMap
    val exact = tokens.groupBy("lang", "t").count()
      .collect().groupBy(_.getString(0))
      .map { case (l, rows) => l -> rows.map(r => r.getString(1) -> r.getLong(2)).toMap }
    val ns = tokens.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perLang.keySet == exact.keySet)
    perLang.foreach { case (lang, sketch) =>
      val slack = ns(lang) / (k + 1)
      exact(lang).filter(_._2 > slack).foreach { case (t, c) =>
        assert(sketch.contains(t), s"[$lang] missed '$t' ($c > $slack)")
      }
    }
  }

  test("q125 count-min estimates never undercount and stay within eps*N") {
    val rows = SparkEntry.byName("q125_countmin_sketch").run(spark, sf).collect()
    assert(rows.length == 8)
    val n = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("t")).count()
    // CM guarantee: exact <= est <= exact + eps*N with eps = e/width (the
    // probabilistic bound holds per-row; min-of-4 makes a miss ~e^-4)
    val eps = math.E / 512
    rows.foreach { r =>
      val (token, exact, est) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(est >= exact, s"'$token' undercounted: $est < $exact")
      assert(est <= exact + (eps * n).ceil.toLong,
        s"'$token' over the CM bound: $est > $exact + ${(eps * n).ceil}")
    }
    val absent = rows.find(_.getString(0) == "zzz_absent_token").get
    assert(absent.getLong(1) == 0L)
  }

  test("q130 streaming per-batch grid merge equals the one-pass q125 sketch") {
    val batch = SparkEntry.byName("q125_countmin_sketch").run(spark, sf)
      .collect().map(_.toSeq).toSeq
    val streamed = SparkEntry.byName("q130_stream_countmin").run(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch, "cell-wise merged grids must be exact")
  }
}
