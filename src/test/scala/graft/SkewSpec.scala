package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("saltedJoin equals the plain join on a power-law keyed fixture") {
    // 90% of left rows share one key — the shape that melts a reducer
    val left = (1L to 2000L).map(i => (if (i % 10 == 0) i % 7 else 999L, i))
      .toDF("k", "row_id")
    val right = Seq((999L, "hot"), (0L, "a"), (1L, "b"), (2L, "c"), (42L, "never"))
      .toDF("k", "v")
    val plain = left.join(right, "k")
      .select("row_id", "v").as[(Long, String)].collect().toSet
    val salted = Skew.saltedJoin(left, right, "k", salts = 8, saltBy = col("row_id"))
      .select("row_id", "v").as[(Long, String)].collect().toSet
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("saltedJoin spreads a hot key across salt partitions") {
    val left = (1L to 1000L).map(i => (7L, i)).toDF("k", "row_id")
    val salts = left.withColumn("__salt", pmod(xxhash64(col("row_id")), lit(8)).cast("int"))
      .groupBy("__salt").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(salts.size == 8, s"hot key not spread: $salts")
    assert(salts.values.max < 1000, "everything still landed on one salt")
  }
}
