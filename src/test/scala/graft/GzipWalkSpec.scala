package graft

import graft.queries.MultimodalPack
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.GZIPInputStream

/** q273's fixture validated by an INDEPENDENT production decoder:
  * java.util.zip.GZIPInputStream (which transparently consumes
  * concatenated members, exactly the Common Crawl shard shape) must
  * decode every planted stream and reproduce the doc-derived payload
  * byte-for-byte — so the engine-side walk is checked against real gzip
  * semantics, not its own mirror. */
class GzipWalkSpec extends AnyFunSuite {
  import TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  test("every planted stream decodes via java.util.zip; payloads match the doc slices") {
    val rows = MultimodalPack.gzipBlobs(spark, sf)
      .filter(col("doc_id") % 7 =!= 3)
      .collect()
    assert(rows.length > 300)
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val id = r.getLong(0)
      val in = new GZIPInputStream(
        new ByteArrayInputStream(r.getAs[Array[Byte]](1)))
      val out = new ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      val letters = docs(id).replaceAll("[^a-z]", "")
      val nm = 1 + (id % 2).toInt
      val expected = (1 to nm).map { i =>
        val start = (i - 1) * 30
        val len = (8 + ((id + i) % 9)).toInt
        letters.slice(start, math.min(letters.length, start + len))
      }.mkString
      assert(new String(out.toByteArray, "UTF-8") == expected, s"doc $id")
    }
  }

  test("raw-text rows are rejected by the decoder (the must-fail class)") {
    val raw = MultimodalPack.gzipBlobs(spark, sf)
      .filter(col("doc_id") % 7 === 3)
      .limit(5).collect()
    raw.foreach { r =>
      intercept[java.io.IOException] {
        new GZIPInputStream(new ByteArrayInputStream(r.getAs[Array[Byte]](1)))
      }
    }
  }
}
