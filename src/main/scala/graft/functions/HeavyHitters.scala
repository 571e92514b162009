package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters sketch as a typed `Aggregator` — the custom
  * aggregation surface (SURVEY §7.3): one pass, fixed k-counter state,
  * mergeable partials.
  *
  * Why it matters at 100 TB: the built-in way to "top tokens by count" is
  * groupBy(token).count + rank — a shuffle carrying EVERY distinct token.
  * This sketch keeps ≤ k counters per partition, merges map-side like any
  * partial aggregate, and guarantees: every item with true frequency
  * > N/(k+1) is present, and a reported count c satisfies
  * true − N/(k+1) ≤ c ≤ true (standard MG bounds, preserved under merge).
  *
  * The exact output depends on merge order (like any sketch); the
  * guarantees do not — HeavyHittersSpec asserts them against exact counts.
  */
class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]]
    with Serializable {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], x: String): Map[String, Long] =
    b.get(x) match {
      case Some(c) => b.updated(x, c + 1)
      case None if b.size < k => b.updated(x, 1L)
      case None => // decrement-all, drop zeros (amortized O(1) per item)
        b.view.mapValues(_ - 1).filter(_._2 > 0).toMap
    }

  override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
    val summed = b2.foldLeft(b1) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    }
    if (summed.size <= k) summed
    else {
      // subtract the (k+1)-th largest count from everything, keep > 0 —
      // the mergeable-summary trim that preserves the MG error bound
      val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
      summed.view.mapValues(_ - cut).filter(_._2 > 0).toMap
    }
  }

  override def finish(b: Map[String, Long]): Map[String, Long] = b

  // ExpressionEncoder (Catalyst-native MapType), not kryo — the buffer
  // serializes into the aggregation state store as a real map, and the
  // output column is a queryable map<string,bigint>
  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
