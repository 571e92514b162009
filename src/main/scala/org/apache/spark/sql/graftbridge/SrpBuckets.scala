package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All sign-random-projection bucket ids of a vector in one expression:
  * output[t] = Σ_j (v·planes[t][j] > 0) << j for each of the `tables`
  * hash tables.
  *
  * The compositional form — one dot-product expression per (table, bit) —
  * builds `tables × bits` expressions each holding a `dim`-literal array
  * (~12k expression nodes at 12×16×64), and analysis + codegen compile of
  * that tree dominates the query. Here the plane matrix rides along as ONE
  * codegen reference object and the whole projection is a single fused
  * loop nest; the plan shrinks to one node per scan.
  *
  * Accumulation order matches FloatDot (left-to-right, double), so bucket
  * ids are bit-identical to the compositional form.
  */
case class SrpBuckets(child: Expression, planes: Array[Array[Double]], bits: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(planes.nonEmpty && planes.length % bits == 0,
    "planes must hold tables × bits hyperplanes")

  private def tables: Int = planes.length / bits

  override def inputTypes: Seq[AbstractDataType] = Seq(
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "srp_buckets"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val f = isFloat
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var b = 0
      var j = 0
      while (j < bits) {
        val h = planes(t * bits + j)
        val n = math.min(arr.numElements(), h.length)
        var s = 0.0
        var d = 0
        while (d < n) {
          s += (if (f) arr.getFloat(d).toDouble else arr.getDouble(d)) * h(d)
          d += 1
        }
        if (s > 0) b |= (1 << j)
        j += 1
      }
      out(t) = b
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val p = ctx.addReferenceObj("planes", planes, "double[][]")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val n = ctx.freshName("n")
      val b = ctx.freshName("b")
      s"""
         |int[] $out = new int[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  int $b = 0;
         |  for (int $j = 0; $j < $bits; $j++) {
         |    double[] $h = $p[$t * $bits + $j];
         |    int $n = java.lang.Math.min($a.numElements(), $h.length);
         |    double $s = 0.0;
         |    for (int $d = 0; $d < $n; $d++) {
         |      $s += ${if (isFloat) s"(double) $a.getFloat($d)" else s"$a.getDouble($d)"} * $h[$d];
         |    }
         |    if ($s > 0) $b |= (1 << $j);
         |  }
         |  $out[$t] = $b;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
