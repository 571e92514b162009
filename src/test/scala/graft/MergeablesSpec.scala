package graft

import graft.functions.TopKRows
import org.scalacheck.{Gen, Prop, Test => SC}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the exactly-mergeable aggregation states: TopKRows'
  * merge must be order/split-independent and agree with a full sort
  * (plain Scala level — the Spark-level equivalences live in
  * AnalyticsSpec/HeavyHittersSpec; these drive thousands of random
  * splits through the raw Aggregator methods cheaply).
  */
class MergeablesSpec extends AnyFunSuite {

  private val agg = new TopKRows(5)

  private def direct(rows: Seq[(Double, Long, Long)]): Seq[(Double, Long, Long)] =
    rows.sortBy { case (s, a, b) => (-s, a, b) }.take(5)

  private val row: Gen[(Double, Long, Long)] = for {
    s <- Gen.chooseNum(0, 50).map(_.toDouble) // narrow range forces ties
    a <- Gen.chooseNum(0L, 20L)
    b <- Gen.chooseNum(0L, 20L)
  } yield (s, a, b)

  test("top-k of any split = top-k of the whole (exact mergeability)") {
    val prop = Prop.forAll(Gen.listOf(row), Gen.chooseNum(0, 100)) { (rows, cutPct) =>
      val cut = rows.length * cutPct / 100
      val (l, r) = rows.splitAt(cut)
      val viaSplit = agg.finish(agg.merge(
        l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce)))
      viaSplit == direct(rows)
    }
    val res = SC.check(SC.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("merge is commutative and respects the k bound") {
    val prop = Prop.forAll(Gen.listOf(row), Gen.listOf(row)) { (xs, ys) =>
      val bx = xs.foldLeft(agg.zero)(agg.reduce)
      val by = ys.foldLeft(agg.zero)(agg.reduce)
      agg.merge(bx, by) == agg.merge(by, bx) &&
        agg.merge(bx, by).size <= 5 &&
        agg.merge(bx, by) == direct(xs ++ ys)
    }
    val res = SC.check(SC.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }
}
