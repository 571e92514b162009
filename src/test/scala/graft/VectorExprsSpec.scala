package graft

import graft.functions.VectorExprs
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native codegen'd FloatDot expression against the interpreted
  * higher-order-function formulation it replaced — must be bit-identical
  * (same order, same widening), on both the codegen and interpreted paths.
  */
class VectorExprsSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}
  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(transform(a, _.cast("double")), transform(b, _.cast("double")),
      (x, y) => x * y), lit(0.0), (acc, p) => acc + p)

  test("FloatDot is bit-identical to the HOF dot on real embeddings") {
    val emb = Tables.embeddings(spark, sf)
    val pairs = emb.select(col("vec_id"), col("embedding").as("a"))
      .join(emb.select((col("vec_id") + 1).as("vec_id"), col("embedding").as("b")), "vec_id")
    val drift = pairs.select(
      VectorExprs.dot(col("a"), col("b")).as("native"),
      hofDot(col("a"), col("b")).as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(drift.count() == 0)
  }

  test("FloatDot handles float×double (hyperplane) inputs and length mismatch") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(2.0d, 0.5d))).toDF("f", "d")
    // common prefix only: 1*2 + 2*0.5 = 3.0
    assert(df.select(VectorExprs.dot(col("f"), col("d"))).as[Double].collect()(0) == 3.0)
  }

  test("FloatDot: null array yields null; empty arrays yield 0") {
    val df = Seq(
      (Some(Seq(1.0f)), Some(Seq(1.0f))),
      (None, Some(Seq(1.0f))),
      (Some(Seq.empty[Float]), Some(Seq.empty[Float])))
      .toDF("a", "b")
    val got = df.select(VectorExprs.dot(col("a"), col("b"))).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
    assert(got == Seq(Some(1.0), None, Some(0.0)))
  }

  test("SrpBuckets equals the compositional per-bit formulation bit-for-bit") {
    val planes = graft.operators.Similarity.hyperplanes(dim = 64, bits = 12, tables = 8, seed = 42L)
    val flat = planes.flatten
    val emb = Tables.embeddings(spark, sf)
    // compositional ground truth: one dot per (table, bit)
    val refCols = (0 until 8).map { t =>
      (0 until 12).map { j =>
        val h = array(planes(t)(j).map(lit(_)): _*)
        when(VectorExprs.dot(col("embedding"), h) > 0, lit(1 << j)).otherwise(lit(0))
      }.reduce(_ + _).as(s"b$t")
    }
    val fused = emb.select(col("vec_id"),
      VectorExprs.srpBuckets(col("embedding"), flat, 12).as("bk"))
    val reference = emb.select(col("vec_id") +: refCols: _*)
    val joined = fused.join(reference, "vec_id")
    val drift = (0 until 8).map(t =>
      joined.filter(col("bk")(t) =!= col(s"b$t")).count()).sum
    assert(drift == 0)
    // null vector → null bucket array
    val nulls = Seq((1L, None: Option[Seq[Float]])).toDF("vec_id", "embedding")
      .select(VectorExprs.srpBuckets(col("embedding"), flat, 12))
      .collect()
    assert(nulls(0).isNullAt(0))
    // double-array vectors bucket identically to their float originals
    // (the compositional form accepted any numeric array — no regression)
    val both = emb.select(col("vec_id"),
        VectorExprs.srpBuckets(col("embedding"), flat, 12).as("f"),
        VectorExprs.srpBuckets(col("embedding").cast("array<double>"), flat, 12).as("d"))
      .filter(col("f") =!= col("d"))
    assert(both.count() == 0)
  }

  test("graft_dot rejects wrong arity with a clear error") {
    GraftExtensions.register(spark)
    val e = intercept[Exception](spark.sql("SELECT graft_dot(array(1.0F))").collect())
    assert(e.getMessage.contains("2 arguments") || e.getMessage.contains("graft_dot"))
  }

  test("graft_dot is callable from SQL after extension registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), array(3.0D, 4.0D)) AS d")
      .as[Double].collect()(0)
    assert(r == 11.0)
  }

  test("graft_jpeg_dims is callable from SQL after extension registration") {
    GraftExtensions.register(spark)
    // SOI ++ SOF0(len 11, precision 8, height 2, width 3, 1 component)
    val r = spark.sql(
      """SELECT graft_jpeg_dims(unhex('FFD8FFC0000B080002000301011100')) AS hw""")
      .as[java.lang.Long].collect()(0)
    assert(r == ((2L << 16) | 3L))
    val bad = spark.sql("SELECT graft_jpeg_dims(unhex('00')) AS hw")
      .as[java.lang.Long].collect()(0)
    assert(bad == -1L)
  }

  test("FloatDot interpreted path (eval without codegen) matches") {
    // force interpreted eval by constant-folding context: literal arrays
    val e = org.apache.spark.sql.graftbridge.FloatDot(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1.0f, 2.0f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(3.0d, 4.0d), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))
    assert(e.eval(null) == 11.0)
  }
}
