package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StructField, StructType}

/** Fused pseudo-random sine projections: all K projections of a vector
  * under per-group salted hyperplanes in one generated call
  * (optimization guide §4 — round-17, the capped-family hot kernel).
  *
  * Replaces K separate
  * `aggregate(transform(vec, (x, i) => x * sin((i+1)·c_k + d_k + salt)),
  * 0d, _+_)` columns — higher-order functions are CodegenFallback in
  * Spark 4: each evaluated interpreted, each allocating an intermediate
  * array per row, each breaking whole-stage codegen, and the capped
  * bench config routes EVERY over-cap member row (corpus × tables for
  * the LSH route) through all K of them. Here one static kernel loops
  * the vector once per k with zero allocations beyond the K-field
  * output row.
  *
  * Bit-identical to the HOF formulation (spec-pinned in DedupSpec):
  * same `Math.sin`, same operand order
  * `x * sin(((i+1) * c_k + d_k) + salt)`, same left-to-right fold from
  * 0.0 — and the same null algebra: a NULL vector or NULL salt nulls
  * every projection (here: a NULL struct), a NULL element poisons each
  * fold (here: all K fields NULL, equivalent because every projection
  * reads the same vector).
  */
case class SinProjections(left: Expression, right: Expression,
                          mult: Array[Double], phase: Array[Double])
    extends BinaryExpression {

  private def k: Int = mult.length

  override def dataType: DataType =
    StructType((0 until k).map(i => StructField(s"p$i", DoubleType, nullable = true)))

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sin_projections requires (array<double>, double), got ${l.catalogString} and ${r.catalogString}")
    }

  private def checkElementNulls: Boolean = left.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  }

  override protected def nullSafeEval(v: Any, s: Any): Any =
    SinProjections.compute(v.asInstanceOf[ArrayData], s.asInstanceOf[Double],
      mult, phase, checkElementNulls)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val multRef = ctx.addReferenceObj("sinProjMult", mult, "double[]")
    val phaseRef = ctx.addReferenceObj("sinProjPhase", phase, "double[]")
    nullSafeCodeGen(ctx, ev, (v, s) =>
      s"${ev.value} = graft.functions.SinProjections.compute($v, $s, $multRef, $phaseRef, $checkElementNulls);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SinProjections =
    copy(left = newLeft, right = newRight)
}

object SinProjections {

  /** All K salted sine projections of one vector. A null element nulls
    * every field (each HOF fold would be poisoned by the same
    * element).
    */
  def compute(v: ArrayData, salt: Double, mult: Array[Double],
              phase: Array[Double], checkNulls: Boolean): InternalRow = {
    val k = mult.length
    val out = new Array[Any](k)
    val n = v.numElements()
    var hasNull = false
    if (checkNulls) {
      var i = 0
      while (!hasNull && i < n) { if (v.isNullAt(i)) hasNull = true; i += 1 }
    }
    if (!hasNull) {
      var j = 0
      while (j < k) {
        val c = mult(j)
        val d = phase(j)
        var acc = 0.0
        var i = 0
        while (i < n) {
          // operand order pinned to the HOF formulation:
          // x * sin(((i+1) * c) + d + salt), folded left-to-right
          acc = acc + v.getDouble(i) * Math.sin((i + 1).toDouble * c + d + salt)
          i += 1
        }
        out(j) = acc
        j += 1
      }
    }
    new GenericInternalRow(out)
  }

  /** Column-API entry point: struct p0..p{K-1} of the projections. */
  def apply(vec: Column, salt: Column, mult: Array[Double], phase: Array[Double]): Column =
    ColumnBridge.column(SinProjections(
      ColumnBridge.expression(vec), ColumnBridge.expression(salt), mult, phase))
}
