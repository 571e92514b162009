package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Rules

/** The declarative rulebook (operators/Rules.scala) against hand-counted
  * fixtures: NULL-means-violation semantics for row rules, duplicated-class
  * row counting for uniqueness, NULL-FK-is-not-an-orphan for referential —
  * plus the single-scan plan claim the scaladoc makes.
  */
class RulesSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("audit: one row per rule, NULL predicate counts as violation") {
    val df = Seq[(java.lang.Long, String)](
      (1L, "a"), (2L, "b"), (null, "a"), (50L, "z"), (3L, null))
      .toDF("v", "tag")
    val got = Rules.audit(df, Seq(
        Rules.notNull("v_not_null", col("v")),
        Rules.inRange("v_range", col("v"), lit(1L), lit(10L)),
        Rules.inSet("tag_domain", col("tag"), Seq("a", "b"))))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("v_not_null") == (5L, 1L))
    // v=50 out of range, v=NULL -> predicate NULL -> violation
    assert(got("v_range") == (5L, 2L))
    // tag=z out of set, tag=NULL -> violation
    assert(got("tag_domain") == (5L, 2L))
  }

  test("audit: N row rules fold into a single scan of the table") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("v", "tag")
    val plan = Rules.audit(df, Seq(
        Rules.notNull("r1", col("v")),
        Rules.inRange("r2", col("v"), lit(0L), lit(9L)),
        Rules.inSet("r3", col("tag"), Seq("a")),
        Rules.notNull("r4", col("tag"))))
      .queryExecution.executedPlan.toString
    val scans = "LocalTableScan".r.findAllIn(plan).size
    assert(scans == 1, s"expected 1 scan for 4 rules, got $scans:\n$plan")
  }

  test("audit: rejects an empty rulebook and quoted rule names") {
    val df = Seq((1L, "a")).toDF("v", "tag")
    intercept[IllegalArgumentException](Rules.audit(df, Nil))
    intercept[IllegalArgumentException](
      Rules.audit(df, Seq(Rules.notNull("bad'name", col("v")))))
  }

  test("unique: violations = rows living in duplicated key classes") {
    val df = Seq(("a", 1), ("a", 1), ("a", 2), ("b", 1), ("a", 1))
      .toDF("k1", "k2")
    val r = Rules.unique("u", df, Seq("k1", "k2")).head()
    assert(r.getString(0) == "u")
    assert(r.getLong(1) == 5L)
    // ("a",1) appears 3x -> 3 violating rows; the singletons contribute 0
    assert(r.getLong(2) == 3L)
  }

  test("referential: NULL FK is skipped, real orphans are counted") {
    val child = Seq[(java.lang.Long, String)](
      (1L, "x"), (2L, "y"), (null, "z"), (9L, "w"), (9L, "w2"))
      .toDF("fk", "payload")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = Rules.referential("fk_ok", child, "fk", parent, "pk").head()
    assert(r.getLong(1) == 5L)
    // fk=9 twice -> 2 orphans; fk=NULL is completeness, not referential
    assert(r.getLong(2) == 2L)
  }

  test("q172 rulebook: fixture violations land where the thresholds say") {
    val got = SparkEntry.byName("q172_quality_rulebook")
      .run(spark, TestSpark.sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.size == 7)
    assert(got("orders.custkey_not_null")._2 == 0L)
    assert(got("lineitem.orderkey_fk")._2 == 0L)
    // the whitelist excludes zh, which the generator does emit
    assert(got("documents.lang_whitelist")._2 > 0L)
    assert(got("documents.lang_whitelist")._1 == 500L)
  }
}
