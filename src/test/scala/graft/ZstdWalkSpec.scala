package graft

import com.github.luben.zstd.ZstdInputStream
import graft.queries.MultimodalPack
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

/** q280's fixture validated by an INDEPENDENT production decoder: zstd-jni
  * (the codec Spark itself ships for shuffle/parquet) must decode every
  * planted stream — skippable frames skipped, raw blocks passed through —
  * and reproduce the doc-derived payload byte-for-byte. */
class ZstdWalkSpec extends AnyFunSuite {
  import TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  test("every planted stream decodes via zstd-jni; payloads match the doc slices") {
    val rows = MultimodalPack.zstdBlobs(spark, sf)
      .filter(col("doc_id") % 7 =!= 3)
      .collect()
    assert(rows.length > 300)
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val id = r.getLong(0)
      val in = new ZstdInputStream(
        new ByteArrayInputStream(r.getAs[Array[Byte]](1)))
      in.setContinuous(true) // multi-frame streams, like the walk
      val out = new ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      val letters = docs(id).replaceAll("[^a-z]", "")
      val nf = 1 + (id % 2).toInt
      val expected = (1 to nf).map { i =>
        val start = (i - 1) * 30
        val len = (8 + ((id + i) % 9)).toInt
        letters.slice(start, math.min(letters.length, start + len))
      }.mkString
      assert(new String(out.toByteArray, "UTF-8") == expected, s"doc $id")
    }
  }

  test("raw-text rows are rejected by the decoder (the must-fail class)") {
    val raw = MultimodalPack.zstdBlobs(spark, sf)
      .filter(col("doc_id") % 7 === 3)
      .limit(5).collect()
    raw.foreach { r =>
      intercept[java.io.IOException] {
        val in = new ZstdInputStream(
          new ByteArrayInputStream(r.getAs[Array[Byte]](1)))
        in.read(new Array[Byte](16))
      }
    }
  }
}
