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

  /** Typed metadata struct for a media column: mime + byte size + STUB
    * decoded dimensions (deterministic fakes of a header parse — a real
    * PNG width lives at bytes 17-20; decoding it needs nothing more than
    * another substring, but the fixture blobs carry no real header). */
  def metadata(bin: Column): Column =
    struct(
      sniffMime(bin).as("mime"),
      length(bin).cast("long").as("bytes"),
      // STUB: fake decode — deterministic stand-ins for decoded dims
      pmod(length(bin), lit(1024)).cast("int").as("width"),
      pmod(length(bin), lit(768)).cast("int").as("height"))

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

  /** STUB resize: byte-domain stand-in for an image resize — truncates the
    * payload to `targetBytes` and restamps the stub dims, preserving the
    * magic so the mime survives. A real implementation decodes, resamples
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
