package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Z-order (Morton) interleave of two long columns: bit k of `left` lands
  * at bit 2k, bit k of `right` at bit 2k+1. Inputs are masked to their low
  * 32 bits, so with both inputs < 2³¹ the result is a non-negative long
  * whose ordering is the Z-curve over the (left, right) plane.
  *
  * Why a native expression: the data-layout write path computes one
  * z-value per row over the full table — the 12-op magic-mask spread
  * compiles into whole-stage codegen as straight-line long arithmetic
  * (no branches, no allocation), where a HOF/UDF formulation would fall
  * out of codegen entirely.
  *
  * The bit-spread is the standard mask sequence (each step doubles the
  * gap between occupied bits); the DuckDB oracle states the identical
  * arithmetic with decimal mask literals, so z-values are hash-comparable
  * cross-engine.
  */
case class ZValue(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "zvalue"

  @inline private def spread(v0: Long): Long = {
    var v = v0 & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    spread(a.asInstanceOf[Long]) | (spread(b.asInstanceOf[Long]) << 1)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = classOf[ZValue].getName
      s"${ev.value} = $cls.spreadJava($a) | ($cls.spreadJava($b) << 1);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZValue {
  /** Called from generated code (static-style entry for janino). */
  def spreadJava(v0: Long): Long = {
    var v = v0 & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }
}
