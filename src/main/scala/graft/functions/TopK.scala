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

  private def lt(a: (Double, Long, Long), b: (Double, Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && (a._2 < b._2 || (a._2 == b._2 && a._3 < b._3)))

  override def zero: Seq[(Double, Long, Long)] = Vector.empty

  override def reduce(
      b: Seq[(Double, Long, Long)], x: (Double, Long, Long)): Seq[(Double, Long, Long)] =
    if (b.size == k && lt(b.last, x)) b
    else ((b :+ x).sortWith(lt)).take(k)

  override def merge(
      b1: Seq[(Double, Long, Long)],
      b2: Seq[(Double, Long, Long)]): Seq[(Double, Long, Long)] =
    (b1 ++ b2).sortWith(lt).take(k)

  override def finish(b: Seq[(Double, Long, Long)]): Seq[(Double, Long, Long)] = b

  override def bufferEncoder: Encoder[Seq[(Double, Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long, Long)]]()
}
