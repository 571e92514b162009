package graft

import graft.operators.{Multimodal, Similarity}
import graft.queries.MultimodalPack
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal binary-column operators: sniffing, frame sampling, and the
  * STUB decode→embed path feeding the near-dup family.
  */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}
  import spark.implicits._

  private def blobDf(rows: (Long, Array[Byte])*) =
    rows.toSeq.toDF("id", "content")

  test("sniffMime classifies each container magic and rejects prefixes") {
    val png = Multimodal.PNG_MAGIC ++ "payload".getBytes
    val jpeg = Multimodal.JPEG_MAGIC ++ "payload".getBytes
    val wav = Multimodal.RIFF_MAGIC ++ Array[Byte](1, 2, 3, 4) ++
      Multimodal.WAVE_TAG ++ "payload".getBytes
    val riffOnly = Multimodal.RIFF_MAGIC ++ "notwave___".getBytes
    val raw = "plain text".getBytes
    val truncatedPng = Multimodal.PNG_MAGIC.take(4)
    val got = blobDf(1L -> png, 2L -> jpeg, 3L -> wav, 4L -> riffOnly,
      5L -> raw, 6L -> truncatedPng)
      .select(col("id"), Multimodal.sniffMime(col("content")).as("mime"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(
      1L -> "image/png", 2L -> "image/jpeg", 3L -> "audio/wav",
      4L -> "application/octet-stream", 5L -> "application/octet-stream",
      6L -> "application/octet-stream"))
  }

  test("frames samples fixed windows at the stride and drops partial frames") {
    val bytes = Array.tabulate[Byte](80)(_.toByte) // frames at 0,32,64... 64+16=80 fits
    val got = Multimodal.frames(blobDf(1L -> bytes), "content",
      frameLen = 16, stride = 32, maxFrames = 4)
      .select(col("frame_no"), col("frame"))
      .collect().map(r => r.getInt(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(got.keySet == Set(0, 1, 2))
    assert(got(0).sameElements(bytes.slice(0, 16)))
    assert(got(1).sameElements(bytes.slice(32, 48)))
    assert(got(2).sameElements(bytes.slice(64, 80)))
  }

  private def be32(v: Int): Array[Byte] =
    Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  test("metadata decodes real PNG IHDR dimensions, null dims elsewhere") {
    // real PNG layout: magic(8) ++ chunk len 13 ++ "IHDR" ++ w(4,BE) ++ h(4,BE) ++ ...
    val png = Multimodal.PNG_MAGIC ++ be32(13) ++ Multimodal.IHDR_TAG ++
      be32(640) ++ be32(131072 + 480) ++ Array[Byte](8, 2, 0, 0, 0) ++
      Array.fill[Byte](50)(7)
    val jpeg = Multimodal.JPEG_MAGIC ++ Array.fill[Byte](20)(3)
    // PNG magic but a corrupted chunk tag must NOT be parsed as dims
    val badTag = Multimodal.PNG_MAGIC ++ be32(13) ++ "XXXX".getBytes ++
      be32(640) ++ be32(480) ++ Array[Byte](8, 2, 0, 0, 0)
    val rows = blobDf(1L -> png, 2L -> jpeg, 3L -> badTag)
      .select(col("id"), Multimodal.metadata(col("content")).as("m"))
      .select(col("id"), col("m.mime"), col("m.bytes"), col("m.width"), col("m.height"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    assert(rows(1L) == (("image/png", png.length.toLong, 640L, 131552L)))
    assert(rows(2L) == (("image/jpeg", jpeg.length.toLong, -1L, -1L)))
    assert(rows(3L) == (("image/png", badTag.length.toLong, -1L, -1L)))
  }

  test("wavMeta decodes little-endian fmt fields, null on non-canonical input") {
    def le16(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)
    def le32(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
    val wav = Multimodal.RIFF_MAGIC ++ le32(100) ++ Multimodal.WAVE_TAG ++
      Multimodal.FMT_TAG ++ le32(16) ++ le16(1) ++ le16(2) ++ le32(48000) ++
      Array.fill[Byte](20)(0)
    // RIFF/WAVE but first chunk is not "fmt " → sniffs as wav, no decode
    val weird = Multimodal.RIFF_MAGIC ++ le32(100) ++ Multimodal.WAVE_TAG ++
      "LIST".getBytes ++ le32(4) ++ Array.fill[Byte](8)(0)
    val rows = blobDf(1L -> wav, 2L -> weird)
      .select(col("id"), Multimodal.wavMeta(col("content")).as("w"))
      .select(col("id"), col("w.audio_format"), col("w.channels"), col("w.sample_rate"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(rows(1L) == ((1L, 2L, 48000L)))
    assert(rows(2L) == ((-1L, -1L, -1L)))
  }

  test("resizeStub truncates payload, preserves magic/mime, restamps dims") {
    val png = Multimodal.PNG_MAGIC ++ Array.fill[Byte](100)(7)
    val out = blobDf(1L -> png)
      .select(Multimodal.resizeStub(col("content"), 32).as("content"))
      .select(Multimodal.metadata(col("content")).as("m"))
      .select("m.mime", "m.bytes").collect()(0)
    assert(out.getString(0) == "image/png")
    assert(out.getLong(1) == 32)
  }

  test("featuresStub is deterministic, fixed-dim, centered") {
    val df = MultimodalPack.blobs(spark, sf)
      .select(col("doc_id"), Multimodal.featuresStub(col("content")).as("f"))
    val a = df.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val b = df.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(a == b)
    assert(a.values.forall(v => v.length == 8 && v.forall(x => x >= -0.5f && x < 0.5f)))
  }

  test("identical blobs surface as cos_sim == 1.0 pairs through the stub embed path") {
    // corpus texts are all distinct — plant exact duplicates like q57 does
    val base = MultimodalPack.blobs(spark, sf)
    val corpus = base.unionByName(
      base.filter(col("doc_id") < 50)
        .select((col("doc_id") + MultimodalPack.DUP_OFFSET).as("doc_id"), col("content")))
      .persist()
    val expected = corpus.as("a").join(corpus.as("b"),
        col("a.content") === col("b.content") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .as[(Long, Long)].collect().toSet
    assert(expected.nonEmpty, "fixture has no duplicated blobs — dedup check vacuous")
    val feats = corpus.select(col("doc_id"), Multimodal.featuresStub(col("content")).as("feat"))
    val got = Similarity.cosineNearDup(feats, "doc_id", "feat",
      threshold = 0.9999, dim = 8, bits = 8, tables = 4)
    val exact = got.filter(col("cos_sim") === 1.0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(expected.subsetOf(exact),
      s"missing identical-blob pairs: ${expected -- exact}")
    corpus.unpersist()
  }
}
