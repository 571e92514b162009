package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType}

/** Native gzip codec expressions for compressed-payload columns.
  *
  * Why this exists: at web-corpus scale the text payload usually ARRIVES
  * compressed (WARC members, per-record gzip blobs) and is best STORED
  * compressed next to its metadata; decode must therefore be per-row map
  * work inside whole-stage codegen, not a driver hop or a Python UDF.
  * Both expressions call a static JDK `java.util.zip` helper from
  * generated code — no external library, deterministic output
  * (`GZIPOutputStream` writes MTIME = 0 and a fixed header).
  *
  * [[GzipDecompress]] is PERMISSIVE like the reference's `from_json`
  * discipline: malformed, truncated, or CRC-corrupt input yields null
  * instead of failing the job — on untrusted 100 TB input a poisoned row
  * must cost one null, not a stage retry storm. A decompression bomb
  * guard caps the output at [[GzipCodec.MaxOutputBytes]] per row
  * (returning null beyond it), bounding executor memory against
  * adversarial payloads.
  */
case class GzipCompress(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "gzip_compress"

  override protected def nullSafeEval(b: Any): Any =
    GzipCodec.gzipJava(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = GzipCodec.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.gzipJava($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class GzipDecompress(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "gzip_decompress"

  override protected def nullSafeEval(b: Any): Any =
    GzipCodec.gunzipJava(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = GzipCodec.getClass.getName.stripSuffix("$")
      // corrupt input decodes to null, not an exception (permissive)
      s"""${ev.value} = $cls.gunzipJava($c);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GzipCodec {
  /** Decompression-bomb guard: max decoded bytes per row. */
  val MaxOutputBytes: Long = 64L * 1024 * 1024

  /** Called from generated code. */
  def gzipJava(in: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(in.length / 2 + 64)
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(in)
    g.close()
    bos.toByteArray
  }

  /** Called from generated code. Null on malformed/truncated/corrupt
    * input and on outputs beyond [[MaxOutputBytes]]. */
  def gunzipJava(in: Array[Byte]): Array[Byte] =
    try {
      val is = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(in))
      val bos = new java.io.ByteArrayOutputStream(math.min(in.length * 3 + 64, 1 << 16))
      val buf = new Array[Byte](8192)
      var total = 0L
      var n = is.read(buf)
      var bombed = false
      while (!bombed && n >= 0) {
        total += n
        if (total > MaxOutputBytes) bombed = true
        else {
          bos.write(buf, 0, n)
          n = is.read(buf)
        }
      }
      is.close()
      if (bombed) null else bos.toByteArray
    } catch {
      // ZipException (corrupt stream) is an IOException subclass — one
      // case covers both truncation and corruption
      case _: java.io.IOException => null
    }
}
