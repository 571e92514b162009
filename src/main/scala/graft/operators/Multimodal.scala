package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns as opaque binaries with typed
  * metadata — the Spark-side plumbing of a media pipeline: schema, magic-byte
  * sniffing, per-mime partitioning, frame sampling, feature extraction.
  *
  * All operators are pure Catalyst expressions over `BinaryType` (substring/
  * length/hex/xxhash64 all work on binaries and whole-stage-codegen): no
  * UDFs, no driver round-trips, so a 100 TB media table flows through scans
  * exactly like text — the binary column is never deserialized beyond the
  * bytes each expression touches.
  *
  * STUB boundary: this container has no image/audio codecs, so
  * [[featuresStub]] is a clearly-marked deterministic fake of the
  * decode→embed step (hash-derived, stable across runs). In production its
  * body — and only its body — is replaced by a real decoder behind the same
  * (binary → float vector) signature, e.g. batched JNI/ONNX inside
  * `mapPartitions`; everything upstream (sniff, metadata, partitioning) and
  * downstream (ANN over the vectors, near-dup) is real and tested.
  */
object Multimodal {

  val PNG_MAGIC: Array[Byte] =
    Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte, 0x0D, 0x0A, 0x1A, 0x0A)
  val JPEG_MAGIC: Array[Byte] = Array(0xFF.toByte, 0xD8.toByte, 0xFF.toByte)
  val RIFF_MAGIC: Array[Byte] = "RIFF".getBytes("UTF-8")
  val WAVE_TAG: Array[Byte] = "WAVE".getBytes("UTF-8")

  /** Magic-byte mime sniffing (container-format detection): PNG / JPEG /
    * WAV (RIFF….WAVE) / unknown. Binary substring + compare — codegen'd,
    * no hex round-trip. */
  def sniffMime(bin: Column): Column =
    when(substring(bin, 1, 8) === lit(PNG_MAGIC), "image/png")
      .when(substring(bin, 1, 3) === lit(JPEG_MAGIC), "image/jpeg")
      .when(substring(bin, 1, 4) === lit(RIFF_MAGIC) &&
        substring(bin, 9, 4) === lit(WAVE_TAG), "audio/wav")
      .otherwise("application/octet-stream")

  val IHDR_TAG: Array[Byte] = "IHDR".getBytes("UTF-8")

  /** Big-endian uint32 at 1-based byte offset `pos`, via a hex round-trip —
    * hex/conv are codegen'd builtins, so this stays inside whole-stage
    * codegen like every other expression here. */
  private def beUInt32(bin: Column, pos: Int): Column =
    conv(hex(substring(bin, pos, 4)), 16, 10).cast("long")

  /** Typed metadata struct for a media column: mime + byte size + decoded
    * dimensions. The dimension decode is a REAL header parse for both image
    * formats:
    *   - PNG: magic(8) ++ IHDR chunk (len(4) ++ "IHDR"(4) ++ width(4,
    *     big-endian) ++ height(4, big-endian) ++ ...) — width/height live at
    *     bytes 17-24 and two binary substrings decode them;
    *   - JPEG: dims live in a SOF segment at a data-dependent offset behind
    *     a variable-length segment list, so a fixed substring can't reach
    *     them — [[graft.functions.MediaExprs.jpegDimsPacked]] (native
    *     codegen'd segment walk) extracts them.
    * Inputs without a parseable header yield null dims — the honest answer
    * without a codec. */
  def metadata(bin: Column): Column = {
    val isPng = substring(bin, 1, 8) === lit(PNG_MAGIC) &&
      substring(bin, 13, 4) === lit(IHDR_TAG)
    // deterministic expression: Catalyst CSE collapses the two uses
    val jp = graft.functions.MediaExprs.jpegDimsPacked(bin)
    val jpegOk = substring(bin, 1, 3) === lit(JPEG_MAGIC) && jp >= 0
    struct(
      sniffMime(bin).as("mime"),
      length(bin).cast("long").as("bytes"),
      when(isPng, beUInt32(bin, 17))
        .when(jpegOk, jp.bitwiseAND(lit(0xFFFFL))).cast("long").as("width"),
      when(isPng, beUInt32(bin, 21))
        .when(jpegOk, shiftright(jp, 16).bitwiseAND(lit(0xFFFFL))).cast("long").as("height"))
  }

  val FMT_TAG: Array[Byte] = "fmt ".getBytes("UTF-8")

  /** Fixed-endian integer read: the byte order is known at PLAN-BUILD
    * time, so the reorder (or not) is applied in Scala — never as a
    * foldable `when(lit(...))` runtime branch. Not a style nit (r14
    * adjudication): the branch form duplicates the `pos` subtree ~5× per
    * read, and in a container walk positions NEST (the mvhd offset is a
    * function of the moov offset is a function of ftyp's size), so the
    * duplication multiplies through the walk — the optimizer folds it
    * away, but analysis pays for the pre-fold tree on every plan build
    * (measured: q187 0.7 → 2.1 s warm when beUInt32At routed through the
    * branched [[uintAt]]). [[uintAt]] stays for the TIFF walk, where
    * endianness is genuinely data. */
  private def uintAtFixed(bin: Column, pos: Column, nBytes: Int,
                          le: Boolean): Column = {
    val h = hex(bin.substr(pos.cast("int"), lit(nBytes)))
    val v =
      if (le) concat((nBytes to 1 by -1).map(i => substring(h, (i - 1) * 2 + 1, 2)): _*)
      else h
    conv(v, 16, 10).cast("long")
  }

  /** Little-endian uint32/uint16 at a LITERAL 1-based byte offset. */
  private def leUInt(bin: Column, pos: Int, nBytes: Int): Column =
    uintAtFixed(bin, lit(pos), nBytes, le = true)

  /** REAL WAV fmt-chunk parse: a canonical WAV file is RIFF(4) ++ size(4)
    * ++ "WAVE"(4) ++ "fmt "(4) ++ chunkSize(4) ++ audioFormat(2,LE) ++
    * channels(2,LE) ++ sampleRate(4,LE) ++ ... — so channels live at bytes
    * 23-24 and sample rate at 25-28, both little-endian. Non-WAV input (or
    * a WAV whose first chunk is not canonical "fmt ") yields nulls. */
  def wavMeta(bin: Column): Column = {
    val isWav = sniffMime(bin) === "audio/wav" &&
      substring(bin, 13, 4) === lit(FMT_TAG)
    struct(
      when(isWav, leUInt(bin, 21, 2)).as("audio_format"),
      when(isWav, leUInt(bin, 23, 2)).as("channels"),
      when(isWav, leUInt(bin, 25, 4)).as("sample_rate"))
  }

  /** Frame sampling: up to `maxFrames` fixed-length windows at a fixed
    * byte stride (a video keyframe / audio clip sampler shape). Emits one
    * row per (row, frame_no) with the frame bytes; frames that would run
    * past the end are dropped (`i·stride + frameLen ≤ length` — pure
    * integer predicate, no division). Row inflation is bounded by
    * `maxFrames`, and the explode happens after any pushed-down filters.
    */
  def frames(df: DataFrame, binCol: String, frameLen: Int = 16,
             stride: Int = 32, maxFrames: Int = 4): DataFrame =
    df
      .select(col("*"), explode(sequence(lit(0), lit(maxFrames - 1))).as("frame_no"))
      .filter(col("frame_no") * stride + frameLen <= length(col(binCol)))
      // functions.substring only takes literal positions; the SQL form
      // accepts expressions
      .withColumn("frame",
        expr(s"substring(`$binCol`, frame_no * $stride + 1, $frameLen)"))

  val FTYP_TAG: Array[Byte] = "ftyp".getBytes("UTF-8")
  val MOOV_TAG: Array[Byte] = "moov".getBytes("UTF-8")
  val FREE_TAG: Array[Byte] = "free".getBytes("UTF-8")
  val MVHD_TAG: Array[Byte] = "mvhd".getBytes("UTF-8")

  /** Big-endian uint32 at a DATA-DEPENDENT 1-based byte offset — the
    * 4-byte big-endian [[uintAtFixed]] (box offsets in a container walk
    * are data, not constants — but the byte ORDER is not, so no branch;
    * see the [[uintAtFixed]] scaladoc for why that matters). Positions
    * are guarded small by the callers before the int cast. */
  private def beUInt32At(bin: Column, pos: Column): Column =
    uintAtFixed(bin, pos, 4, le = false)

  private def tagAt(bin: Column, pos: Column): Column =
    bin.substr(pos.cast("int"), lit(4))

  /** REAL ISO-BMFF (MP4) top-level box walk → movie-header metadata:
    * `struct(timescale, duration)`, nulls when the input is not a parseable
    * MP4 — the video leg of the media-metadata family next to the PNG/JPEG/
    * WAV parses above.
    *
    * An MP4 is a sequence of boxes `size(4,BE) ++ type(4) ++ payload`; the
    * movie timescale/duration live in `moov`'s first child `mvhd`
    * (version 0: timescale at box offset +20, duration at +24 — ISO/IEC
    * 14496-12, public spec). The walk is genuinely data-dependent: `ftyp`'s
    * size varies with its compatible-brand list and an optional `free` box
    * may precede `moov`, so a fixed substring cannot reach the header — the
    * expression reads each box's size field to find the next (two hops
    * unrolled: `moov` as box 1 or, behind one `free`, box 2 — the canonical
    * fast-start layouts; a streaming-tail `moov` after `mdat` is out of
    * scope and yields null). Size fields are range-guarded BEFORE being
    * used as offsets, so hostile bytes cannot drive the substring positions
    * outside int range; every branch is plain codegen'd expression work.
    */
  def mp4Meta(bin: Column): Column = {
    val len = length(bin).cast("long")
    val z0 = beUInt32At(bin, lit(1))
    // every size field is range- AND length-guarded BEFORE use as an
    // offset: hostile bytes can't push the walk outside the payload, and
    // an oracle replay hits the exact same guard set (no partial-read
    // divergence between engines)
    val isFtyp = tagAt(bin, lit(5)) === lit(FTYP_TAG) &&
      z0.between(16L, 80L) && len >= z0 + 8
    val s1 = lit(1L) + z0
    val t1 = tagAt(bin, s1 + 4)
    val z1 = beUInt32At(bin, s1)
    val s2 = s1 + z1
    val moovS = when(isFtyp,
      when(t1 === lit(MOOV_TAG), s1)
        .when(t1 === lit(FREE_TAG) && z1.between(8L, 64L) && len >= s2 + 7 &&
          tagAt(bin, s2 + 4) === lit(MOOV_TAG), s2))
    // mvhd must be moov's first child, version 0
    val mvhdOk = moovS.isNotNull && len >= moovS + 35 &&
      tagAt(bin, moovS + 12) === lit(MVHD_TAG) &&
      bin.substr((moovS + 16).cast("int"), lit(1)) === lit(Array[Byte](0))
    val timescale = when(mvhdOk, beUInt32At(bin, moovS + 28))
    struct(
      when(timescale > 0, timescale).as("timescale"),
      when(timescale > 0, beUInt32At(bin, moovS + 32)).as("duration"))
  }

  val APP1_MARKER: Array[Byte] = Array(0xFF.toByte, 0xE1.toByte)
  /** "Exif\\0\\0" -- the APP1 EXIF identifier (4 ASCII chars + 2 NULs). */
  val EXIF_TAG: Array[Byte] =
    "Exif".getBytes("UTF-8") ++ Array[Byte](0, 0)
  val TIFF_LE: Array[Byte] = "II".getBytes("UTF-8")
  val TIFF_BE: Array[Byte] = "MM".getBytes("UTF-8")

  /** Unsigned int of `nBytes` at a DATA-DEPENDENT 1-based offset, in the
    * byte order selected by the `le` COLUMN — the primitive a TIFF walk
    * needs, where endianness itself is data ("II" vs "MM" in the header).
    * Hex round-trip + per-byte reorder, all codegen'd builtins; an
    * out-of-range position yields an empty substring ⇒ null, never a
    * crash. */
  private def uintAt(bin: Column, pos: Column, nBytes: Int, le: Column): Column = {
    val h = hex(bin.substr(pos.cast("int"), lit(nBytes)))
    val rev = concat((nBytes to 1 by -1).map(i => substring(h, (i - 1) * 2 + 1, 2)): _*)
    conv(when(le, rev).otherwise(h), 16, 10).cast("long")
  }

  /** REAL EXIF orientation decode: the JPEG APP1 → TIFF header → IFD0 walk
    * (TIFF 6.0 / EXIF 2.3, public specs) every image pipeline runs before
    * any pixel work — orientation 1–8 says how the camera was held, and
    * training on un-rotated pixels bakes the rotation in as noise.
    *
    * Genuinely data-dependent in THREE ways a fixed substring can't fake:
    * the TIFF byte order is itself data ("II" little / "MM" big — every
    * subsequent integer read switches on it), the IFD0 offset is read
    * from the header (not assumed 8 — writers pad), and the Orientation
    * tag (0x0112) is FOUND by scanning the IFD's 12-byte entries (here a
    * bounded unroll of the first 4 — fixture IFDs carry 2; real writers
    * put Orientation early in the mandated ascending-tag order, and real
    * IFD0s routinely carry ~10 entries, so only the SCAN is bounded, not
    * the accepted entry count). Every read is guarded: wrong
    * marker/endian/magic-42, an offset outside [8, 64], an empty IFD, a
    * payload shorter than the scanned prefix, a non-SHORT or non-count-1
    * orientation entry, or a value outside the spec's 1–8 all yield null
    * — the honest answer, never garbage. Pure codegen'd expressions.
    */
  /** Byte-order column of an APP1 TIFF blob (true = "II" little-endian).
    * Meaningful only where [[tiffIfdOk]] holds. */
  private def tiffLe(bin: Column): Column =
    substring(bin, 13, 2) === lit(TIFF_LE)

  /** True when the APP1 → TIFF header → IFD0 walk succeeds: JPEG SOI +
    * APP1 + "Exif\0\0", a valid endian marker and magic 42, an IFD0
    * offset in [8, 64], an entry count ≥ 1 and a payload covering the
    * scanned entry prefix. The parsed/unparsed discriminator the
    * EXIF-gated queries share. */
  def tiffIfdOk(bin: Column): Column = {
    val len = length(bin).cast("long")
    val isApp1 = substring(bin, 1, 3) === lit(JPEG_MAGIC) &&
      substring(bin, 3, 2) === lit(APP1_MARKER) &&
      substring(bin, 7, 6) === lit(EXIF_TAG)
    val tiff = lit(13L) // 1-based byte position of the TIFF origin
    val endian = substring(bin, 13, 2)
    val le = tiffLe(bin)
    val tiffOk = isApp1 && (le || endian === lit(TIFF_BE)) &&
      uintAt(bin, tiff + 2, 2, le) === 42L
    val o = uintAt(bin, tiff + 4, 4, le) // IFD0 offset, relative to the origin
    val ifd = tiff + o
    val oOk = tiffOk && o.between(8L, 64L) && len >= ifd + 1
    val n = uintAt(bin, ifd, 2, le)
    // Bound the SCAN, not the IFD: real IFD0s carry ~10 entries (ADVICE
    // r13 — rejecting n > 4 outright would null out virtually every real
    // JPEG), so accept any n >= 1 and walk only the first min(n, 4)
    // entries; the length guard covers exactly the scanned prefix.
    val scanned = least(n, lit(4L))
    oOk && n >= 1L && len >= ifd + 1 + scanned * 12
  }

  /** Shared IFD0 entry scan (first 4 entries): for the first entry
    * matching (tag, type, count), return `emit(entryPos, le)`; null when
    * [[tiffIfdOk]] fails or no scanned entry matches. `emit` is evaluated
    * PER CANDIDATE ENTRY inside the scan — the value read stays inside
    * the guarded branch instead of re-walking from a found position,
    * which matters for tree size: a re-walk would duplicate the whole
    * scan subtree once per byte the read touches. */
  private def ifdEntryScan(bin: Column, tag: Long, typ: Long, cnt: Long)
                          (emit: (Column, Column) => Column): Column = {
    val le = tiffLe(bin)
    val ifd = lit(13L) + uintAt(bin, lit(17L), 4, le)
    val n = uintAt(bin, ifd, 2, le)
    val nOk = tiffIfdOk(bin)
    val hits = (0 until 4).map { k =>
      val e = ifd + 2 + k * 12
      when(nOk && lit(k.toLong) < n &&
        uintAt(bin, e, 2, le) === tag &&
        uintAt(bin, e + 2, 2, le) === typ &&
        uintAt(bin, e + 4, 4, le) === cnt,
        emit(e, le))
    }
    coalesce(hits: _*)
  }

  /** True when IFD0 parsed but carries MORE entries than the bounded
    * prefix scan walks (n > 4): a tag yielding null may be absent OR
    * sitting past the scan horizon. Real IFD0s carry ~10 entries, so a
    * pipeline ingesting real JPEGs should route truncated rows to a
    * full parser instead of reading null as "no Orientation/GPS tag"
    * (r15, ADVICE — absent-vs-unscanned made distinguishable without
    * raising the unroll bound, which would double the byte-walk subtree
    * everywhere: the q187/q199 expression-tree lesson). */
  def exifScanTruncated(bin: Column): Column = {
    val le = tiffLe(bin)
    val ifd = lit(13L) + uintAt(bin, lit(17L), 4, le)
    tiffIfdOk(bin) && uintAt(bin, ifd, 2, le) > 4L
  }

  def exifOrientation(bin: Column): Column = {
    // Orientation (0x0112), type SHORT (3), count 1; value in the entry's
    // first 2 value bytes, valid range 1-8
    val orient = ifdEntryScan(bin, 0x0112L, 3L, 1L)(
      (e, le) => uintAt(bin, e + 8, 2, le))
    when(orient.between(1L, 8L), orient)
  }

  /** Absolute (1-based) position of the GPS IFD pointer entry (tag
    * 0x8825, type LONG (4), count 1) in IFD0 — the tag whose PRESENCE is
    * the image-side PII signal: its value points at the GPS IFD
    * (latitude/longitude/altitude/timestamp). Null when unparsed or
    * absent. The 12 bytes at this position are the redaction target.
    *
    * NOTE for composers: feeding a CONSTRUCTED binary (e.g. an `overlay`
    * splice) into this walk inlines that construction once per byte read
    * — stage it through a projection (`withColumn`) first so the walk
    * reads an attribute (q199 learned this as a driver OOM at sf0.001). */
  def gpsEntryPos(bin: Column): Column =
    ifdEntryScan(bin, 0x8825L, 4L, 1L)((e, _) => e)

  /** The GPS IFD offset (relative to the TIFF origin) read from the
    * pointer entry's 4-byte value, in the blob's own byte order. */
  def gpsIfdOffset(bin: Column): Column =
    ifdEntryScan(bin, 0x8825L, 4L, 1L)(
      (e, le) => uintAt(bin, e + 8, 4, le))

  /** STUB resize: byte-domain stand-in for an image resize — truncates the
    * payload to `targetBytes`, preserving the leading magic/header bytes so
    * mime and metadata survive. A real implementation decodes, resamples
    * and re-encodes inside the same (binary → binary) signature; everything
    * around it (schema, partitioning, metadata) is unchanged. */
  def resizeStub(bin: Column, targetBytes: Int): Column =
    substring(bin, 1, targetBytes)

  /** STUB decode→embed: a deterministic fake feature vector (dim values in
    * [-0.5, 0.5)) derived from the bytes via seeded xxhash64 — identical
    * blobs ⇒ identical features, so downstream ANN/near-dup pipelines are
    * exercised end-to-end without codecs. Replace the body with a real
    * decoder+model at deploy time; the signature and everything downstream
    * stay. */
  def featuresStub(bin: Column, dim: Int = 8): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      i => (pmod(xxhash64(bin, i), lit(1000000L)).cast("double") / 1000000.0d - 0.5d)
        .cast("float"))
}
