package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** The JPEG segment walk shared by interpreted eval and generated code.
  *
  * A top-level object (no companion class) compiles with static forwarders,
  * so generated Java calls `JpegParse.parse(bytes)` directly — the loop
  * stays out of the generated source (bounded class size) while remaining a
  * plain static call the JIT inlines.
  */
object JpegParse {

  /** Walk the segment list of a JPEG byte stream and return the frame
    * dimensions from the first SOF marker, packed as
    * `(height << 16) | width`; `-1` when the input is not a JPEG, is
    * truncated, or ends (EOI/SOS payload) before any SOF segment.
    *
    * Handles marker fill bytes (a marker may be preceded by any number of
    * 0xFF pad bytes) and standalone markers (TEM, RST0-7) that carry no
    * length field. SOF markers are C0–CF minus C4 (DHT), C8 (JPG) and CC
    * (DAC), per ITU T.81 §B.1.1.4.
    */
  def parse(b: Array[Byte]): Long = {
    val n = b.length
    if (n < 4 || b(0) != 0xFF.toByte || b(1) != 0xD8.toByte) return -1L
    var i = 2
    while (i < n) {
      if (b(i) != 0xFF.toByte) return -1L // lost marker alignment
      while (i < n && b(i) == 0xFF.toByte) i += 1 // skip fill bytes
      if (i >= n) return -1L
      val m = b(i) & 0xFF
      i += 1
      if (m == 0xD9) return -1L // EOI before any SOF
      else if (m == 0x01 || (m >= 0xD0 && m <= 0xD8)) {
        // TEM / RSTn / (nested) SOI: standalone, no length field
      } else {
        if (i + 1 >= n) return -1L
        val len = ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
        if (len < 2 || i + len > n) return -1L
        val isSof = m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC
        if (isSof) {
          if (len < 7) return -1L
          val h = ((b(i + 3) & 0xFF) << 8) | (b(i + 4) & 0xFF)
          val w = ((b(i + 5) & 0xFF) << 8) | (b(i + 6) & 0xFF)
          return (h.toLong << 16) | w.toLong
        }
        if (m == 0xDA) return -1L // SOS: entropy data follows, no SOF seen
        i += len
      }
    }
    -1L
  }
}

/** Native JPEG frame-dimension extraction over a BinaryType column.
  *
  * Unlike the PNG IHDR / WAV fmt parses (fixed offsets — plain `substring`
  * expressions), JPEG dimensions live in a SOF segment at a DATA-DEPENDENT
  * offset behind a variable-length segment list (APP0/COM/DQT/... each with
  * its own length field), so extraction is a loop — exactly the case that
  * justifies a custom expression over composing built-ins. Output is
  * `(height << 16) | width` packed in a long, `-1` when no SOF is found —
  * a sentinel rather than null keeps the expression inside
  * `nullSafeCodeGen` (output null iff input null).
  */
case class JpegDims(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "jpeg_dims"

  override protected def nullSafeEval(v: Any): Any =
    JpegParse.parse(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graftbridge.JpegParse.parse($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
