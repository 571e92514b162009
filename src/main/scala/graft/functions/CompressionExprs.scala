package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.{ColumnBridge, GzipCompress, GzipDecompress}

/** Public face of the native gzip codec expressions — compressed-payload
  * columns (WARC-style per-record gzip) decoded as per-row codegen map
  * work. Also registered in SQL as `graft_gzip` / `graft_gunzip` via
  * [[graft.GraftExtensions]]. Decompress is permissive (null on corrupt
  * input) and bomb-guarded; see
  * [[org.apache.spark.sql.graftbridge.GzipCodec]].
  */
object CompressionExprs {
  def gzip(c: Column): Column =
    ColumnBridge.column(GzipCompress(ColumnBridge.expression(c)))
  def gunzip(c: Column): Column =
    ColumnBridge.column(GzipDecompress(ColumnBridge.expression(c)))
}
