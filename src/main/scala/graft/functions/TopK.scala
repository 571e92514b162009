package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Per-group top-k as a typed `Aggregator` with fixed mergeable state —
  * the scale path for "top N rows per group".
  *
  * Why it matters at 100 TB: the window formulation
  * (`row_number() OVER (PARTITION BY g ORDER BY ...) <= k`, q10/q136's
  * oracle) shuffles AND sorts every row of every group; one skewed group
  * sorts its whole partition on one reducer. This aggregator keeps at most
  * k rows of state per group per map partition, combines map-side like
  * any partial aggregate, and merges by k-way capped merge — the shuffle
  * carries ≤ k rows per (group, map partition) instead of the group.
  *
  * Unlike a sketch, top-k is EXACTLY mergeable: the global top-k is the
  * top-k of any union of per-partition top-k's, so the result is
  * merge-order independent and hash-identical to the window formulation
  * (q136's oracle; AnalyticsSpec also pins partitioning-independence).
  *
  * Rows order by (score DESC, id1 ASC, id2 ASC) — the unique tiebreaker
  * discipline every deterministic top-k here follows.
  */
class TopKRows(k: Int)
    extends Aggregator[(Double, Long, Long), Seq[(Double, Long, Long)], Seq[(Double, Long, Long)]]
    with Serializable {
  require(k >= 1, s"k must be >= 1, got $k")

  /** Total order even for NaN scores: java.lang.Double.compare is total
    * (NaN sorts after +Inf, i.e. LAST under score-descending), where the
    * primitive `>`/`==` pair is not — a NaN in the input would make
    * sortWith's contract-violation exception reachable and merge results
    * order-dependent. Orders by (score DESC, id1 ASC, id2 ASC).
    */
  private def cmp(a: (Double, Long, Long), b: (Double, Long, Long)): Int = {
    val c = java.lang.Double.compare(b._1, a._1)
    if (c != 0) c
    else {
      val c2 = java.lang.Long.compare(a._2, b._2)
      if (c2 != 0) c2 else java.lang.Long.compare(a._3, b._3)
    }
  }

  override def zero: Seq[(Double, Long, Long)] = Vector.empty

  // buffers are kept sorted; insert into position (one O(k) scan) instead
  // of re-sorting the whole buffer on every accepted row
  override def reduce(
      b: Seq[(Double, Long, Long)], x: (Double, Long, Long)): Seq[(Double, Long, Long)] =
    if (b.size >= k && cmp(b.last, x) <= 0) b
    else {
      val i = b.indexWhere(e => cmp(x, e) < 0)
      val ins = if (i < 0) b :+ x else (b.take(i) :+ x) ++ b.drop(i)
      if (ins.size > k) ins.take(k) else ins
    }

  // both inputs are sorted: linear merge, stopping at k
  override def merge(
      b1: Seq[(Double, Long, Long)],
      b2: Seq[(Double, Long, Long)]): Seq[(Double, Long, Long)] = {
    val out = Vector.newBuilder[(Double, Long, Long)]
    var i = 0
    var j = 0
    var m = 0
    while (m < k && (i < b1.size || j < b2.size)) {
      if (j >= b2.size || (i < b1.size && cmp(b1(i), b2(j)) <= 0)) {
        out += b1(i); i += 1
      } else {
        out += b2(j); j += 1
      }
      m += 1
    }
    out.result()
  }

  override def finish(b: Seq[(Double, Long, Long)]): Seq[(Double, Long, Long)] = b

  override def bufferEncoder: Encoder[Seq[(Double, Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long, Long)]]()
}
