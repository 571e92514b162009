package graft

import graft.functions.LayoutExprs
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ZValue
import org.scalatest.funsuite.AnyFunSuite

/** Z-order expression: bit-level ground truth and the locality property
  * that justifies the layout (both-dimension-narrow row groups).
  */
class ZOrderSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}
  import spark.implicits._

  private def naiveInterleave(x: Long, y: Long): Long = {
    var z = 0L
    for (k <- 0 until 32) {
      z |= ((x >> k) & 1L) << (2 * k)
      z |= ((y >> k) & 1L) << (2 * k + 1)
    }
    z
  }

  test("magic-mask spread equals the naive per-bit interleave") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 1000) {
      val x = rnd.nextLong() & 0x7FFFFFFFL
      val y = rnd.nextLong() & 0x7FFFFFFFL
      assert((ZValue.spreadJava(x) | (ZValue.spreadJava(y) << 1))
        == naiveInterleave(x, y), s"x=$x y=$y")
    }
  }

  test("the column expression matches the naive interleave through codegen") {
    val df = spark.range(0, 4096)
      .select(col("id").as("x"), (col("id") * 2654435761L % 100000).as("y"))
    val got = df.select(col("x"), col("y"),
      LayoutExprs.zvalue(col("x"), col("y")).as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == naiveInterleave(r.getLong(0), r.getLong(1)))
    }
  }

  test("z-sorted blocks are narrow in BOTH dimensions; lexicographic is not") {
    // the measurable claim behind the layout, on a full 256x256 grid:
    // blocks of 256 rows under a y-major lexicographic sort are one full
    // row each (x extent 255, y extent 0); under z order they are 16x16
    // tiles (extent 15 in BOTH dims) — pruning works for either predicate
    val grid = spark.range(0, 65536)
      .select((col("id") % 256).as("x"), (col("id") / 256).cast("long").as("y"))
      .withColumn("z", LayoutExprs.zvalue(col("x"), col("y")))
    val block = 256
    def extents(sorted: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val rows = sorted.collect()
      val groups = rows.grouped(block).filter(_.length == block).toSeq
      val xe = groups.map(g => (g.map(_.getLong(0)).max - g.map(_.getLong(0)).min).toDouble)
      val ye = groups.map(g => (g.map(_.getLong(1)).max - g.map(_.getLong(1)).min).toDouble)
      (xe.sum / xe.length, ye.sum / ye.length)
    }
    val (zX, zY) = extents(grid.orderBy("z"))
    val (lexX, lexY) = extents(grid.orderBy("y", "x"))
    assert(zX == 15.0 && zY == 15.0, s"zX=$zX zY=$zY")
    assert(lexX == 255.0 && lexY == 0.0, s"lexX=$lexX lexY=$lexY")
    // worst-dimension extent: z order is 17x better than lexicographic
    assert(math.max(zX, zY) * 16 < math.max(lexX, lexY))
  }

  test("graft_zvalue is callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql("SELECT graft_zvalue(3L, 5L) AS z").head().getLong(0)
    assert(r == naiveInterleave(3L, 5L)) // 0b100111 = 39
    assert(r == 39L)
  }
}
