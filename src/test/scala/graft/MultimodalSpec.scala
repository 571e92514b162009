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

  private def seg(marker: Int, payload: Array[Byte]): Array[Byte] =
    Array(0xFF.toByte, marker.toByte,
      ((payload.length + 2) >>> 8).toByte, ((payload.length + 2) & 0xFF).toByte) ++ payload

  private def sof0(h: Int, w: Int): Array[Byte] =
    seg(0xC0, Array[Byte](8, (h >>> 8).toByte, (h & 0xFF).toByte,
      (w >>> 8).toByte, (w & 0xFF).toByte, 1, 1, 0x11, 0))

  test("JpegParse walks the segment list to the SOF dims") {
    import org.apache.spark.sql.graftbridge.JpegParse.parse
    val soi = Array(0xFF.toByte, 0xD8.toByte)
    def dims(p: Long): (Long, Long) = (p >> 16, p & 0xFFFF)
    // canonical: SOI ++ APP0 ++ DQT ++ SOF0 ++ payload
    val app0 = seg(0xE0, "JFIF".getBytes ++ Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    val dqt = seg(0xDB, Array.fill[Byte](65)(9))
    assert(dims(parse(soi ++ app0 ++ dqt ++ sof0(480, 640) ++ "data".getBytes)) == ((480L, 640L)))
    // progressive marker (SOF2 = C2) also carries dims
    val sof2 = seg(0xC2, Array[Byte](8, 1, 0, 2, 0, 1, 1, 0x11, 0))
    assert(dims(parse(soi ++ sof2)) == ((256L, 512L)))
    // fill bytes before a marker are legal padding
    val fill = Array.fill[Byte](3)(0xFF.toByte)
    assert(dims(parse(soi ++ fill ++ sof0(7, 9))) == ((7L, 9L)))
    // standalone markers (TEM, RST) carry no length and are skipped
    val standalone = Array(0xFF.toByte, 0x01.toByte, 0xFF.toByte, 0xD0.toByte)
    assert(dims(parse(soi ++ standalone ++ sof0(5, 6))) == ((5L, 6L)))
    // DHT (C4) is NOT a SOF even though it's in C0-CF
    val dht = seg(0xC4, Array.fill[Byte](20)(1))
    assert(dims(parse(soi ++ dht ++ sof0(3, 4))) == ((3L, 4L)))
  }

  test("JpegParse rejects streams without a reachable SOF") {
    import org.apache.spark.sql.graftbridge.JpegParse.parse
    val soi = Array(0xFF.toByte, 0xD8.toByte)
    assert(parse("not a jpeg".getBytes) == -1L)
    assert(parse(soi) == -1L) // nothing after SOI
    // EOI or SOS before any SOF
    assert(parse(soi ++ Array(0xFF.toByte, 0xD9.toByte)) == -1L)
    assert(parse(soi ++ seg(0xDA, Array[Byte](1, 1, 0)) ++ sof0(1, 2)) == -1L)
    // declared segment length overruns the buffer
    assert(parse(soi ++ Array[Byte](0xFF.toByte, 0xE0.toByte, 0x7F.toByte, 0xFF.toByte, 0)) == -1L)
    // truncated mid-SOF (length field says 11 but bytes stop at height)
    assert(parse(soi ++ Array[Byte](0xFF.toByte, 0xC0.toByte, 0, 11, 8, 0, 1)) == -1L)
    // garbage where a marker should be
    assert(parse(soi ++ "xx".getBytes) == -1L)
  }

  test("metadata decodes JPEG dims through the native expression") {
    val jpeg = Array(0xFF.toByte, 0xD8.toByte) ++
      seg(0xFE, "comment!".getBytes) ++ sof0(1080, 1920) ++ "payload".getBytes
    val row = blobDf(1L -> jpeg)
      .select(Multimodal.metadata(col("content")).as("m"))
      .select("m.mime", "m.width", "m.height").collect()(0)
    assert(row.getString(0) == "image/jpeg")
    assert(row.getLong(1) == 1920L)
    assert(row.getLong(2) == 1080L)
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

  test("mp4Meta walks the box list to mvhd; nulls on non-MP4/truncated input") {
    def be32(v: Long): Array[Byte] =
      Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def box(tag: String, payload: Array[Byte]): Array[Byte] =
      be32(8L + payload.length) ++ tag.getBytes("UTF-8") ++ payload
    def mvhd(ts: Long, dur: Long): Array[Byte] =
      box("mvhd", Array.fill[Byte](12)(0) ++ be32(ts) ++ be32(dur) ++
        MultimodalPack.MVHD_TAIL)
    val ftyp = box("ftyp", "isom".getBytes ++ be32(0L))
    val plain = ftyp ++ box("moov", mvhd(90000L, 450000L))
    // free box between ftyp and moov: the walk must hop over it
    val freed = ftyp ++ box("free", Array.fill[Byte](5)('X')) ++
      box("moov", mvhd(600L, 1234L))
    // version-1 mvhd (64-bit fields) is out of scope -> null, not garbage
    val v1 = ftyp ++ box("moov",
      box("mvhd", Array[Byte](1, 0, 0, 0) ++ Array.fill[Byte](8)(0) ++
        be32(600L) ++ be32(99L) ++ MultimodalPack.MVHD_TAIL))
    val truncated = plain.take(plain.length - 90) // mvhd body cut off
    val raw = "just some text, no boxes at all".getBytes("UTF-8")
    val got = blobDf(1L -> plain, 2L -> freed, 3L -> v1, 4L -> truncated,
      5L -> raw)
      .select(col("id"), Multimodal.mp4Meta(col("content")).as("m"))
      .select(col("id"), col("m.timescale"), col("m.duration"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(got(1L) == (Some(90000L), Some(450000L)))
    assert(got(2L) == (Some(600L), Some(1234L)))
    assert(got(3L) == (None, None))
    assert(got(4L) == (None, None))
    assert(got(5L) == (None, None))
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

  test("exifOrientation: both endiannesses decode; garbage, truncation, " +
       "hostile offsets, bad magic and out-of-range values all yield null") {
    import spark.implicits._
    def u16(v: Int, le: Boolean): Array[Byte] =
      if (le) Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
      else Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def u32(v: Int, le: Boolean): Array[Byte] =
      if (le) Array(v, v >> 8, v >> 16, v >> 24).map(x => (x & 0xFF).toByte)
      else Array(v >> 24, v >> 16, v >> 8, v).map(x => (x & 0xFF).toByte)
    def blob(le: Boolean, pad: Int, orient: Int, magic: Int = 42,
             ifdOffset: Option[Int] = None, truncate: Boolean = false,
             endianTag: Array[Byte] = null, countOverride: Option[Int] = None,
             orientTag: Int = 0x0112, orientType: Int = 3,
             orientCount: Int = 1, decoys: Int = 1): Array[Byte] = {
      val et = Option(endianTag).getOrElse(
        if (le) Multimodal.TIFF_LE else Multimodal.TIFF_BE)
      val entry0 = u16(0x010E, le) ++ u16(2, le) ++ u32(4, le) ++
        "desc".getBytes("UTF-8")
      val entry1 = u16(orientTag, le) ++ u16(orientType, le) ++
        u32(orientCount, le) ++ u16(orient, le) ++ Array[Byte](0, 0)
      val nEntries = countOverride.getOrElse(decoys + 1)
      val tiff = et ++ u16(magic, le) ++
        u32(ifdOffset.getOrElse(8 + pad), le) ++ Array.fill(pad)(0.toByte) ++
        u16(nEntries, le) ++
        Array.fill(decoys)(entry0).flatten ++ entry1 ++ u32(0, le)
      val head = Array(0xFF, 0xD8, 0xFF, 0xE1).map(_.toByte) ++
        u16(46 + pad + 12 * (decoys - 1), le = false) ++ Multimodal.EXIF_TAG
      val full = head ++ tiff ++ "payload".getBytes("UTF-8")
      if (truncate) full.take(head.length + 8) else full
    }
    def decode(bs: Array[Byte]*): Seq[Option[Long]] = {
      val df = bs.zipWithIndex.map { case (b, i) => (i, b) }.toDF("i", "content")
      df.select(col("i"), Multimodal.exifOrientation(col("content")).as("o"))
        .orderBy("i").collect()
        .map(r => if (r.isNullAt(1)) None else Some(r.getLong(1))).toSeq
    }
    val got = decode(
      blob(le = true, pad = 3, orient = 6),            // LE, padded header
      blob(le = false, pad = 0, orient = 3),           // BE, offset exactly 8
      "just some text bytes".getBytes("UTF-8"),        // not a JPEG at all
      blob(le = true, pad = 0, orient = 6, truncate = true), // IFD cut off
      blob(le = true, pad = 0, orient = 6, ifdOffset = Some(99999)), // hostile offset
      blob(le = true, pad = 0, orient = 6, magic = 43),      // wrong TIFF magic
      blob(le = false, pad = 1, orient = 6,
        endianTag = "XX".getBytes("UTF-8")),           // unknown byte order
      blob(le = true, pad = 2, orient = 0),            // below the spec range
      blob(le = false, pad = 2, orient = 9),           // above the spec range
      blob(le = true, pad = 0, orient = 6, countOverride = Some(0)), // empty IFD
      blob(le = true, pad = 0, orient = 6, countOverride = Some(5)), // count over the scan bound
      blob(le = false, pad = 0, orient = 6, orientType = 2),  // non-SHORT entry
      blob(le = true, pad = 0, orient = 6, orientCount = 2),  // count != 1
      blob(le = false, pad = 0, orient = 6, orientTag = 0x0113), // tag never present
      blob(le = true, pad = 1, orient = 7, decoys = 3))  // tag at scan position 4
    assert(got == Seq(Some(6L), Some(3L), None, None, None, None, None,
      None, None, None, None, None, None, None, Some(7L)), got)

    // absent-vs-unscanned (r15, ADVICE): the count-over-scan-bound blob
    // (n=5 > 4) yields a null orientation ABOVE — exifScanTruncated is the
    // flag that distinguishes that null from a genuinely absent tag
    def truncated(bs: Array[Byte]*): Seq[Boolean] = {
      val df = bs.zipWithIndex.map { case (b, i) => (i, b) }.toDF("i", "content")
      df.select(col("i"),
          Multimodal.exifScanTruncated(col("content")).as("t"))
        .orderBy("i").collect()
        .map(r => !r.isNullAt(1) && r.getBoolean(1)).toSeq
    }
    assert(truncated(
      blob(le = true, pad = 0, orient = 6, decoys = 5), // 6 entries: tag past horizon
      blob(le = true, pad = 3, orient = 6),             // 2 entries: fully scanned
      blob(le = true, pad = 1, orient = 7, decoys = 3), // 4 entries: at the bound
      "just some text bytes".getBytes("UTF-8")          // unparsed != truncated
    ) == Seq(true, false, false, false))
  }

  test("q230 GIF census agrees with the JDK's own ImageIO GIF reader") {
    val rows = SparkEntry.byName("q230_gif_census").run(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (Option(r.getString(1)), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(rows.nonEmpty)
    val blobs = graft.queries.MultimodalPack.gifBlobs(spark, sf)
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    assert(blobs.length == rows.size)
    var checkedGifs = 0
    blobs.foreach { case (id, bytes) =>
      val (ver, w, h, gct, nf, anim) = rows(id)
      if (id % 7 == 3) {
        // raw-text class: the walk must refuse it
        assert(ver.isEmpty && nf == -1L, s"doc $id raw not refused")
      } else {
        // external validation: the JDK GIF reader must accept the blob
        // and agree on canvas dims and frame count
        val in = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        assert(readers.hasNext, s"doc $id: ImageIO has no reader for blob")
        val rd = readers.next()
        rd.setInput(in)
        try {
          assert(rd.getFormatName.equalsIgnoreCase("gif"), s"doc $id format")
          assert(rd.getWidth(0) == w && rd.getHeight(0) == h, s"doc $id dims")
          assert(rd.getNumImages(true) == nf, s"doc $id frames")
        } finally { rd.dispose(); in.close() }
        assert(ver.contains(if (id % 2 == 0) "89a" else "87a"), s"doc $id ver")
        assert(anim == (if (nf > 1) 1L else 0L), s"doc $id animated")
        assert(gct == (if (id % 3 == 0) 6L else if (id % 3 == 2) 24L else 0L))
        checkedGifs += 1
      }
    }
    assert(checkedGifs > 0)
    // all three frame counts and both versions occur
    assert(Set(1L, 2L, 3L).subsetOf(
      rows.values.collect { case (Some("89a"), _, _, _, n, _) => n }.toSet))
    assert(rows.values.exists(_._1.contains("87a")))
  }

  test("q236 FLAC walk agrees with an independent per-byte JVM bit-parser") {
    val rows = SparkEntry.byName("q236_flac_streaminfo").run(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    assert(rows.nonEmpty)
    val blobs = graft.queries.MultimodalPack.flacBlobs(spark, sf)
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    assert(blobs.length == rows.size)
    blobs.foreach { case (id, bytes) =>
      if (id % 7 == 3) {
        assert(rows(id)._1 == -1L, s"doc $id raw not refused")
      } else {
        // independent decode route: per-byte shifts over the raw bytes
        // (the query does ONE conv of the 16-hex window + shift/mask)
        def u(i: Int) = bytes(i) & 0xff
        assert(new String(bytes.take(4), "ISO-8859-1") == "fLaC", s"doc $id")
        val hdr = u(4)
        assert((hdr & 0x7f) == 0 &&
          ((u(5) << 16) | (u(6) << 8) | u(7)) == 34, s"doc $id streaminfo")
        val q = 18 // 0-based offset of the 8 packed bytes
        val sr = (u(q) << 12) | (u(q + 1) << 4) | (u(q + 2) >> 4)
        val ch = ((u(q + 2) >> 1) & 7) + 1
        val bps = (((u(q + 2) & 1) << 4) | (u(q + 3) >> 4)) + 1
        val ts = ((u(q + 3) & 0xf).toLong << 32) |
          (u(q + 4).toLong << 24) | (u(q + 5) << 16) | (u(q + 6) << 8) | u(q + 7)
        var p = 42; var nb = 1L; var last = (hdr & 0x80) != 0
        var hc = false; var pad = 0L
        while (!last) {
          val b = u(p); val t = b & 0x7f
          val l = (u(p + 1) << 16) | (u(p + 2) << 8) | u(p + 3)
          if (t == 4) hc = true
          if (t == 1) pad += l
          nb += 1; last = (b & 0x80) != 0; p += 4 + l
        }
        assert(p == bytes.length, s"doc $id walk end")
        assert(rows(id) == ((sr.toLong, ch.toLong, bps.toLong, ts, nb,
          if (hc) 1L else 0L, pad)), s"doc $id")
      }
    }
    // all 4 tail layouts and several sample rates occur
    assert(rows.values.map(_._5).toSet.intersect(Set(1L, 2L, 3L)) ==
      Set(1L, 2L, 3L))
    assert(rows.values.map(_._1).filter(_ > 0).toSet.size >= 4)
  }

  test("q240 MP3 walk agrees with an independent per-byte JVM frame parser") {
    val rows = SparkEntry.byName("q240_mp3_sync_census").run(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(rows.nonEmpty)
    val blobs = graft.queries.MultimodalPack.mp3Blobs(spark, sf)
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    assert(blobs.length == rows.size)
    val brTable = Map(1 -> 32L, 2 -> 40L, 3 -> 48L, 4 -> 56L, 5 -> 64L)
    val srTable = Map(0 -> 44100L, 1 -> 48000L, 2 -> 32000L)
    blobs.foreach { case (id, bytes) =>
      if (id % 7 == 3) {
        assert(rows(id)._1 == -1L, s"doc $id raw not refused")
      } else {
        def u(i: Int) = bytes(i) & 0xff
        var p = 0
        var hasId3 = 0L; var tagB = 0L
        if (bytes.length >= 10 &&
            new String(bytes.take(3), "ISO-8859-1") == "ID3") {
          hasId3 = 1L
          // syncsafe: 7 bits per byte, MSB-first
          tagB = ((u(6) & 0x7f) << 21) | ((u(7) & 0x7f) << 14) |
            ((u(8) & 0x7f) << 7) | (u(9) & 0x7f)
          p = 10 + tagB.toInt
        }
        var nf = 0L; var kb = -1L; var sr0 = -1L; var ok = true
        while (ok && p < bytes.length) {
          if (u(p) == 0xff && u(p + 1) == 0xfb) {
            val b3 = u(p + 2)
            val kbf = brTable(b3 >> 4); val srf = srTable((b3 >> 2) & 3)
            if (kb < 0) { kb = kbf; sr0 = srf }
            else ok = ok && kbf == kb && srf == sr0
            nf += 1
            p += (144 * (kbf * 1000) / srf + ((b3 >> 1) & 1)).toInt
          } else ok = false
        }
        ok = ok && p == bytes.length && nf >= 1
        assert(ok, s"doc $id independent parse failed")
        assert(rows(id) == ((hasId3, tagB, nf, kb, sr0)), s"doc $id")
      }
    }
    // both syncsafe boundary classes occur (>127 needs the 2-byte form)
    val tags = rows.values.map(_._2).filter(_ > 0).toSet
    assert(tags.exists(_ <= 127L) && tags.exists(_ > 127L), tags)
    // all three frame counts and an ID3-absent class occur
    assert(rows.values.map(_._3).toSet.intersect(Set(1L, 2L, 3L)) ==
      Set(1L, 2L, 3L))
    assert(rows.values.exists(_._1 == 0L))
  }
}
