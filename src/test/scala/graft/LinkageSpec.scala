package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q186 Fellegi–Sunter linkage: planted ground truth must classify cleanly.
  *
  * The plant (TextDedupPack q186): every custkey%5==0 customer gets a dirty
  * twin (+1e6, last name char replaced, attributes copied, segment perturbed
  * for custkey%10!=0) and every custkey%7==3 an impostor (+2e6, identical
  * name, nation/segment/band all changed). Blocking on name-minus-last-char
  * is lossless for both classes by construction, so:
  *   - every planted twin pair must be found AND decided 'match' (its worst
  *     agreement pattern — one disagreeing field out of three — still clears
  *     the upper threshold under the fixture's value distributions);
  *   - every impostor pair must be found AND decided 'non_match' (all three
  *     scored fields disagree by construction; even a boundary band
  *     collision leaves the LR below 1).
  */
class LinkageSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  test("q186: planted twins all match, impostors all non-match, none missed") {
    val out = SparkEntry.byName("q186_record_linkage").run(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

    val cust = Tables.customer(spark, sf)
    val nTwin = cust.filter(col("c_custkey") % 5 === 0).count()
    val nImp = cust.filter(col("c_custkey") % 7 === 3).count()
    assert(nTwin > 0 && nImp > 0, "fixture must plant both classes")

    // twins: exactly one decision row, 'match', with full planted count
    val twinRows = out.filter(_._1._1 == "twin")
    assert(twinRows.keySet == Set(("twin", "match")),
      s"twin decisions: ${twinRows.keys}")
    assert(twinRows(("twin", "match")) == nTwin)

    // impostors: exactly one decision row, 'non_match', full planted count
    val impRows = out.filter(_._1._1 == "impostor")
    assert(impRows.keySet == Set(("impostor", "non_match")),
      s"impostor decisions: ${impRows.keys}")
    assert(impRows(("impostor", "non_match")) == nImp)
  }

  test("q188: streaming gate reaches the same planted guarantees as batch") {
    val out = SparkEntry.byName("q188_stream_record_linkage").run(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

    val cust = Tables.customer(spark, sf)
    val nTwin = cust.filter(col("c_custkey") % 5 === 0).count()
    val nImp = cust.filter(col("c_custkey") % 7 === 3).count()

    assert(out.filter(_._1._1 == "twin").keySet == Set(("twin", "match")))
    assert(out(("twin", "match")) == nTwin)
    assert(out.filter(_._1._1 == "impostor").keySet ==
      Set(("impostor", "non_match")))
    assert(out(("impostor", "non_match")) == nImp)
  }

  test("plant-offset guard: a custkey at/above TWIN_OFFSET fails loudly") {
    import graft.operators.Linkage
    import spark.implicits._
    // a customer table that has grown past the plant offset (TPC-H SF >= ~7):
    // every record builder must raise, not silently corrupt the ground truth
    val over = Seq((Linkage.TWIN_OFFSET, "Customer#000001", 7L, "BUILDING", 100.0))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_mktsegment", "c_acctbal")
    def messages(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    for (build <- Seq[org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame](
        Linkage.baseRecords, Linkage.dirtyRecords, Linkage.impostorRecords)) {
      // dirty/impostor builders filter on custkey%5==0 / %7==3 — TWIN_OFFSET
      // (1e6, %7==1) satisfies %5==0; 1000002 (%7==3) feeds the impostor
      // path, so every builder sees at least one over-offset row
      val keyed = over.unionByName(
        Seq((Linkage.TWIN_OFFSET + 2L, "Customer#000002", 7L, "BUILDING", 100.0))
          .toDF("c_custkey", "c_name", "c_nationkey", "c_mktsegment", "c_acctbal"))
      val e = intercept[Throwable] { build(keyed).collect() }
      assert(messages(e).contains("Linkage plant offsets collide"),
        s"guard must fire loudly, got: ${messages(e)}")
    }
    // negative control: keys strictly below the offset pass through unchanged
    val ok = Seq((999999L, "Customer#000003", 7L, "BUILDING", 100.0))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_mktsegment", "c_acctbal")
    assert(Linkage.baseRecords(ok).select("id").as[Long].collect().toSeq ==
      Seq(999999L))
  }

  test("q190: clusters partition the records; twins cluster with a base record") {
    import graft.operators.Linkage
    val df = SparkEntry.byName("q190_golden_record").run(spark, sf).cache()
    try {
      val cust = Tables.customer(spark, sf)
      val nBase = cust.count()
      val nTwin = cust.filter(col("c_custkey") % 5 === 0).count()
      val nImp = cust.filter(col("c_custkey") % 7 === 3).count()

      // the clusters PARTITION the augmented record set
      assert(df.agg(sum("n_members")).collect()(0).getLong(0) ==
        nBase + nTwin + nImp)
      assert(df.agg(sum("n_twin_members")).collect()(0).getLong(0) == nTwin)
      assert(df.agg(sum("n_impostor_members")).collect()(0).getLong(0) == nImp)

      // every twin's pair with its base is a guaranteed 'match', so any
      // cluster holding a twin must also hold a base record — and the
      // canonical (min id) of such a cluster is then always a base id
      assert(df.filter(col("n_twin_members") > 0 &&
        col("cluster_id") >= Linkage.TWIN_OFFSET).count() == 0)
    } finally df.unpersist()
  }
}
