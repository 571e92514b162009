package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.{ColumnBridge, ZValue}

/** Public face of the native data-layout expressions. */
object LayoutExprs {
  /** Codegen'd Z-order (Morton) interleave of two long columns — the sort
    * key for multi-dimensional data clustering: writing a table ordered by
    * `zvalue(a, b)` gives parquet row-groups that are simultaneously
    * narrow in BOTH a and b, so min/max pruning works for predicates on
    * either dimension (a single-column sort only prunes its own column).
    * Inputs must be non-negative and < 2³¹. */
  def zvalue(a: Column, b: Column): Column =
    ColumnBridge.column(ZValue(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
