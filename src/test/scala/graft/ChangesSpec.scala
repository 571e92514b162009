package graft

import java.sql.Timestamp

import graft.operators.Changes
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Change-data operators: compaction against the window-function ground
  * truth, SCD2 interval invariants on a hand-built timeline.
  */
class ChangesSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("latestByKey equals the row_number ground truth on events") {
    val e = Tables.events(spark, sf)
      .select("user_id", "event_type", "ts", "event_id", "value")
    val got = Changes.latestByKey(e,
      keys = Seq("user_id", "event_type"), ord = Seq("ts", "event_id"))
      .select("user_id", "event_type", "ts", "value", "n_versions")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id", "event_type")
    val expected = e
      .withColumn("n_versions", count(lit(1)).over(w))
      .withColumn("rn", row_number().over(
        w.orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("rn") === 1)
      .select("user_id", "event_type", "ts", "value", "n_versions")
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("latestByKey counts every version, keeps exactly one row per key") {
    val e = Tables.events(spark, sf)
      .select("user_id", "event_type", "ts", "event_id", "value")
    val got = Changes.latestByKey(e,
      keys = Seq("user_id", "event_type"), ord = Seq("ts", "event_id"))
    assert(got.count() ==
      e.select("user_id", "event_type").distinct().count())
    assert(got.agg(sum("n_versions")).as[Long].head() == e.count())
  }

  test("scd2 compresses runs and builds half-open back-to-back intervals") {
    val rows = Seq(
      (1L, "a", ts("2024-01-01 00:00:00"), 1L),
      (1L, "a", ts("2024-01-01 01:00:00"), 2L), // same run — compressed away
      (1L, "b", ts("2024-01-01 02:00:00"), 3L), // change → version 2
      (1L, "a", ts("2024-01-01 03:00:00"), 4L), // back to a → version 3
      (2L, "x", ts("2024-01-01 00:30:00"), 5L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val got = Changes.scd2(rows, "user_id", "event_type", "ts",
      Seq("ts", "event_id"))
      .orderBy("user_id", "version_no")
      .collect()
    assert(got.length == 4)
    val u1 = got.filter(_.getLong(0) == 1L)
    assert(u1.map(_.getString(1)).toSeq == Seq("a", "b", "a"))
    // each interval closes exactly where the next opens; the last is open
    assert(u1(0).getTimestamp(3) == u1(1).getTimestamp(2))
    assert(u1(1).getTimestamp(3) == u1(2).getTimestamp(2))
    assert(u1(2).isNullAt(3))
    assert(u1.map(_.getLong(4)).toSeq == Seq(1L, 2L, 3L))
    // singleton key: one open interval, version 1
    val u2 = got.filter(_.getLong(0) == 2L)
    assert(u2.length == 1 && u2(0).isNullAt(3) && u2(0).getLong(4) == 1L)
  }

  test("mergeCompacted folds any batch split to the batch-compaction answer") {
    val e = Tables.events(spark, sf)
      .select("user_id", "event_type", "ts", "event_id", "value")
    val keys = Seq("user_id", "event_type")
    val ord = Seq("ts", "event_id")
    val direct = Changes.latestByKey(e, keys, ord)
    // two different splits, folded incrementally like q116's foreachBatch
    for (nBatches <- Seq(2, 5)) {
      val folded = (0 until nBatches)
        .map(i => Changes.latestByKey(
          e.filter(pmod(col("event_id"), lit(nBatches)) === i), keys, ord))
        .reduce((a, b) => Changes.mergeCompacted(a.unionByName(b), keys, ord))
      assert(folded.exceptAll(direct).isEmpty && direct.exceptAll(folded).isEmpty,
        s"nBatches=$nBatches")
    }
  }

  test("scd2 tie on ts is broken deterministically by the ord tiebreaker") {
    val t0 = ts("2024-01-01 00:00:00")
    val rows = Seq(
      (1L, "a", t0, 2L),
      (1L, "b", t0, 1L) // same ts; event_id orders b before a
    ).toDF("user_id", "event_type", "ts", "event_id")
    val got = Changes.scd2(rows, "user_id", "event_type", "ts",
      Seq("ts", "event_id")).orderBy("version_no").collect()
    assert(got.map(_.getString(1)).toSeq == Seq("b", "a"))
  }

  test("q146 drops exactly the keys whose LATEST change is a tombstone") {
    import TestSpark.sf
    import org.apache.spark.sql.functions.col
    val live = SparkEntry.byName("q146_cdc_deletes").run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val all = SparkEntry.byName("q105_cdc_compaction").run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(live.subsetOf(all))
    assert(live.size < all.size, "fixture planted no effective tombstones — vacuous")
    // independent check of the drop rule: a key is dropped iff its
    // latest (ts, event_id) row has event_id % 10 == 0
    val latest = Tables.events(spark, sf)
      .select("user_id", "event_type", "ts", "event_id")
      .collect().map(r => ((r.getLong(0), r.getString(1)), (r.getTimestamp(2).getTime, r.getLong(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    all.foreach { k =>
      val tomb = latest(k)._2 % 10 == 0
      assert(live(k) == !tomb, s"$k tombstone=$tomb but live=${live(k)}")
    }
  }
}
