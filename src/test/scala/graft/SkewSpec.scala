package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted-join equivalence on a planted hot key: 90% of the fact rows
  * share one key, the classic single-reducer straggler shape.
  */
class SkewSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val hot = 7L
  private def fact = spark.range(0, 20000)
    .select(col("id").as("row_id"),
      when(col("id") % 10 =!= 0, hot).otherwise(col("id") % 100).as("k"),
      (col("id") * 3).as("payload"))
  private def dim = spark.range(0, 100)
    .select(col("id").as("dk"), concat(lit("d"), col("id")).as("dval"))

  test("saltedEquiJoin equals the plain join, row for row") {
    val salted = Skew.saltedEquiJoin(fact, dim, "k", "dk", "row_id", salts = 8)
      .select("row_id", "k", "payload", "dk", "dval")
    val plain = fact.join(dim, col("k") === col("dk"))
      .select("row_id", "k", "payload", "dk", "dval")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    assert(salted.count() == plain.count())
  }

  test("the hot key's rows really spread across all salts") {
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(col("row_id")), lit(8)).cast("int"))
    val spread = salted.filter(col("k") === hot)
      .select("__salt").distinct().count()
    assert(spread == 8)
  }

  test("no dim row is lost or duplicated for an unsalted-unique key") {
    // every fact row joins exactly one dim row — salting must not change
    // multiplicity even for keys with a single fact row
    val salted = Skew.saltedEquiJoin(fact, dim, "k", "dk", "row_id", salts = 8)
    assert(salted.count() == fact.join(dim, col("k") === col("dk")).count())
    val perRow = salted.groupBy("row_id").count()
      .filter(col("count") =!= 1).count()
    assert(perRow == 0)
  }
}
