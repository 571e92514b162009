package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Per-group k smallest DISTINCT longs as a typed `Aggregator` — the KMV
  * (k-minimum-values) distinct-sketch maintenance operator (q297/q298).
  *
  * Set semantics: a duplicate hash never occupies a second slot, which is
  * what makes the state a distinct SKETCH rather than a top-k of rows —
  * |union of streams| estimates correctly because min-k-of-union =
  * min-k-of(min-k ∪ min-k), duplicates collapsed. Exactly mergeable and
  * merge-order independent (capped sorted-set union is associative,
  * commutative, idempotent), so per-partition partial aggregation and the
  * streaming per-batch union (q298) reproduce the single-pass sketch
  * bit-for-bit — the same argument as TopKRows, plus idempotence.
  *
  * State is ≤ k longs per group per map partition; the shuffle carries
  * ≤ k values per (group, partition) — fixed-size mergeable state, the
  * 100 TB contract for distinct estimation (cf. the HLL register table
  * q204; KMV trades a slightly worse constant for an estimate both
  * engines replay EXACTLY from order statistics).
  */
class BottomKLongs(k: Int)
    extends Aggregator[Long, Seq[Long], Seq[Long]] with Serializable {
  require(k >= 1, s"k must be >= 1, got $k")

  override def zero: Seq[Long] = Vector.empty

  // buffers kept sorted ascending; insert into position, drop duplicates
  override def reduce(b: Seq[Long], x: Long): Seq[Long] =
    if (b.size >= k && b.last <= x) b
    else {
      val i = b.indexWhere(e => x <= e)
      if (i >= 0 && b(i) == x) b // already present: set semantics
      else {
        val ins = if (i < 0) b :+ x else (b.take(i) :+ x) ++ b.drop(i)
        if (ins.size > k) ins.take(k) else ins
      }
    }

  // both sorted: linear dedup merge, stopping at k
  override def merge(b1: Seq[Long], b2: Seq[Long]): Seq[Long] = {
    val out = Vector.newBuilder[Long]
    var i = 0
    var j = 0
    var m = 0
    var haveLast = false
    var last = 0L
    while (m < k && (i < b1.size || j < b2.size)) {
      val v =
        if (j >= b2.size || (i < b1.size && b1(i) <= b2(j))) { val t = b1(i); i += 1; t }
        else { val t = b2(j); j += 1; t }
      if (!haveLast || v != last) {
        out += v; last = v; haveLast = true; m += 1
      }
    }
    out.result()
  }

  override def finish(b: Seq[Long]): Seq[Long] = b

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
