package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.{ColumnBridge, FloatDot, SrpBuckets}

/** Public face of the native vector expressions (see
  * [[org.apache.spark.sql.graftbridge.FloatDot]] for the codegen'd
  * implementation and why it lives in the bridge package).
  */
object VectorExprs {
  /** Codegen'd dot product of two float/double array columns (double out). */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(FloatDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** All SRP bucket ids of a float-vector column in one fused expression:
    * element t = the `bits`-bit bucket of hash table t. `planes` is the
    * flattened (table-major) hyperplane matrix. */
  def srpBuckets(v: Column, planes: Array[Array[Double]], bits: Int): Column =
    ColumnBridge.column(SrpBuckets(ColumnBridge.expression(v), planes, bits))
}
