package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.{ColumnBridge, FloatDot, GzipCompress, GzipDecompress, JpegDims, NfcNormalize, ZValue}

/** Session extension registering graft's native SQL functions, so pure-SQL
  * users get the codegen'd expressions too:
  *
  *   spark.sql.extensions=graft.GraftExtensions   (submit-time, clusters)
  *   GraftExtensions.register(spark)              (live session, tests/REPL)
  *
  * Functions:
  *   graft_dot(array<float|double>, array<float|double>) → double
  *   graft_jpeg_dims(binary) → bigint ((height << 16) | width, -1 if not
  *     a parseable JPEG — unpack with shiftright/bitwiseAND)
  *   graft_zvalue(bigint, bigint) → bigint (Z-order/Morton interleave of
  *     the low 32 bits of each input — the multi-dimensional layout key)
  *   graft_nfc(string) → string (Unicode NFC canonical composition — the
  *     canonicalization hash-keyed text operators need first)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[FloatDot].getName, "graft_dot"),
      GraftExtensions.dotBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_jpeg_dims"),
      new ExpressionInfo(classOf[JpegDims].getName, "graft_jpeg_dims"),
      GraftExtensions.jpegDimsBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_zvalue"),
      new ExpressionInfo(classOf[ZValue].getName, "graft_zvalue"),
      GraftExtensions.zvalueBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      GraftExtensions.nfcBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_gzip"),
      new ExpressionInfo(classOf[GzipCompress].getName, "graft_gzip"),
      GraftExtensions.gzipBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_gunzip"),
      new ExpressionInfo(classOf[GzipDecompress].getName, "graft_gunzip"),
      GraftExtensions.gunzipBuilder))
  }
}

object GraftExtensions {
  private[graft] val dotBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 2,
      s"graft_dot requires exactly 2 arguments, got ${children.length}")
    FloatDot(children(0), children(1))
  }

  private[graft] val jpegDimsBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 1,
      s"graft_jpeg_dims requires exactly 1 argument, got ${children.length}")
    JpegDims(children.head)
  }

  private[graft] val zvalueBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 2,
      s"graft_zvalue requires exactly 2 arguments, got ${children.length}")
    ZValue(children(0), children(1))
  }

  private[graft] val nfcBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 1,
      s"graft_nfc requires exactly 1 argument, got ${children.length}")
    NfcNormalize(children.head)
  }

  private[graft] val gzipBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 1,
      s"graft_gzip requires exactly 1 argument, got ${children.length}")
    GzipCompress(children.head)
  }

  private[graft] val gunzipBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 1,
      s"graft_gunzip requires exactly 1 argument, got ${children.length}")
    GzipDecompress(children.head)
  }

  /** Register the same functions on an already-built session. */
  def register(spark: SparkSession): Unit = {
    ColumnBridge.registerTempFunction(spark, "graft_dot", dotBuilder)
    ColumnBridge.registerTempFunction(spark, "graft_jpeg_dims", jpegDimsBuilder)
    ColumnBridge.registerTempFunction(spark, "graft_zvalue", zvalueBuilder)
    ColumnBridge.registerTempFunction(spark, "graft_nfc", nfcBuilder)
    ColumnBridge.registerTempFunction(spark, "graft_gzip", gzipBuilder)
    ColumnBridge.registerTempFunction(spark, "graft_gunzip", gunzipBuilder)
  }
}
