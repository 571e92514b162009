package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.{ColumnBridge, JpegDims}

/** Public face of the native media expressions (see
  * [[org.apache.spark.sql.graftbridge.JpegDims]] for the codegen'd
  * implementation and why it lives in the bridge package).
  */
object MediaExprs {
  /** JPEG frame dims from the SOF segment walk, packed
    * `(height << 16) | width`; -1 when absent/invalid. */
  def jpegDimsPacked(bin: Column): Column =
    ColumnBridge.column(JpegDims(ColumnBridge.expression(bin)))
}
