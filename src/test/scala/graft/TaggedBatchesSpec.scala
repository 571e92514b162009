package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** stagedTaggedBatches is the order-SENSITIVE staging under the q303/q304
  * warm-recurrence streams: their oracles replay batch b as "rows with
  * tag ≤ b", which is only sound if (a) batch membership equals the
  * portable pmod(a+b, 4) tag and (b) micro-batch ARRIVAL follows tag
  * order. Both pinned here through the real streaming engine.
  */
class TaggedBatchesSpec extends AnyFunSuite {
  import graft.TestSpark.spark

  test("tag = batchId, arrival in tag order, empty tags keep their slot") {
    import spark.implicits._
    // tags: (1+2)%4=3, (2+2)%4=0, (5+6)%4=3, (0+0)%4=0 — tags 1 and 2 EMPTY
    val pairs = Seq((1L, 2L), (2L, 2L), (5L, 6L), (0L, 0L)).toDF("a", "b")
    val dir = TextDedupPack.stagedTaggedBatches(
      "graft-test-tagged-", pairs, "a", "b", "spec")
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Set[Long])]()
    graft.streaming.Streams.runForeachBatch(spark, stream, (df, b) => {
      val tags = df.select(pmod(col("a") + col("b"), lit(4)).as("t"))
        .collect().map(_.getLong(0)).toSet
      seen.add((b, tags))
    })
    import scala.jdk.CollectionConverters._
    val byBatch = seen.asScala.toSeq.sortBy(_._1)
    // exactly 4 micro-batches, one per tag file, in tag order
    assert(byBatch.map(_._1) == Seq(0L, 1L, 2L, 3L))
    // every row's tag equals its batch id; empty tags arrive as empty batches
    assert(byBatch(0)._2 == Set(0L))
    assert(byBatch(1)._2 == Set.empty[Long])
    assert(byBatch(2)._2 == Set.empty[Long])
    assert(byBatch(3)._2 == Set(3L))
    // staging is memoized per (prefix, sf key) — same dir on re-ask
    assert(TextDedupPack.stagedTaggedBatches(
      "graft-test-tagged-", pairs, "a", "b", "spec") == dir)
  }
}
