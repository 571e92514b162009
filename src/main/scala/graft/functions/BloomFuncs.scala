package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Bloom-filter build/probe over Spark's native sketch expressions — the
  * broadcast-semi-join primitive behind runtime row filters, exposed as a
  * library operator for membership prefilters (decontamination, blocklist
  * joins, incremental-ingest "seen before?" checks).
  *
  * Both sides hash with the SAME codegen'd `XxHash64` Catalyst expression
  * (seed 42, identical to `functions.xxhash64`), so a filter built by
  * [[bloomAgg]] is always probe-compatible with [[mightContain]]. The
  * serialized sketch is a few MB for tens of millions of keys at 1% fpp —
  * the driver-held-model pattern (cf. Ivf centroids): collect ONE fixed-size
  * binary, re-broadcast it as a literal into a map-side predicate.
  *
  * At 100 TB: build over the SMALL side (an eval set, a blocklist), probe
  * the big side before its only shuffle — false-positive rate is the only
  * extra data that reaches the join, and a bloom has NO false negatives, so
  * `prefilter → exact-confirm join` returns byte-identical results to the
  * plain join at a fraction of the shuffled volume.
  */
object BloomFuncs {

  /** Aggregate a column's values into one serialized bloom filter (binary),
    * sized for `expectedItems` at ~`fpp`. */
  def bloomAgg(c: Column, expectedItems: Long, fpp: Double = 0.01): Column = {
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedItems, fpp)
    ColumnBridge.column(
      new BloomFilterAggregate(
        new XxHash64(Seq(ColumnBridge.expression(c))),
        Literal(expectedItems), Literal(numBits))
        .toAggregateExpression())
  }

  /** Build the filter over `df`'s `keyCol` and return the serialized sketch
    * bytes (null-safe: an empty build side yields an empty filter that
    * rejects everything, which is the correct semi-join answer). */
  def build(df: DataFrame, keyCol: Column, expectedItems: Long,
            fpp: Double = 0.01): Array[Byte] = {
    val row = df.select(bloomAgg(keyCol, expectedItems, fpp).as("bf")).head()
    if (row.isNullAt(0)) {
      val bf = org.apache.spark.util.sketch.BloomFilter.create(1, fpp)
      val out = new java.io.ByteArrayOutputStream()
      bf.writeTo(out)
      out.toByteArray
    } else row.getAs[Array[Byte]](0)
  }

  /** Membership probe of a [[build]]-produced sketch — a pure map-side
    * codegen'd predicate (no false negatives; ~fpp false positives). */
  def mightContain(bloom: Array[Byte], c: Column): Column =
    ColumnBridge.column(
      BloomFilterMightContain(
        Literal(bloom),
        new XxHash64(Seq(ColumnBridge.expression(c)))))
}
