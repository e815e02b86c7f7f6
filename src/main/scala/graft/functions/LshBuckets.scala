package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** Fused random-hyperplane LSH bucketing: ALL `numTables` bucket longs
  * of a vector in one generated call (optimization guide §4 — round-17
  * item: "fused LshBuckets codegen expression").
  *
  * The per-bit formulation this replaces —
  * `when(ArrayDot(vec, lit_plane) >= 0, 1L << b).otherwise(0L)`
  * OR-reduced per table — unrolls numTables × bitsPerTable independent
  * ArrayDot calls into the projection. At the dedup_cosine bench config
  * (32 tables × 7 bits) that is 224 dot products whose LITERAL plane
  * arrays are each materialized per row (`CreateArray` of 64 lit
  * doubles), a generated method far past the JIT inlining budget — the
  * round-16 audit measured the store-build stage at ~50× its compute
  * floor. Here the planes live in ONE flat `double[]` reference and the
  * whole signature is a triple loop in a single static JVM kernel, so
  * the enclosing stage keeps whole-stage codegen and the kernel JITs
  * once.
  *
  * Bit-identical to the per-bit formulation (spec-pinned in
  * FunctionsSpec): the dot is the same left-to-right fold
  * `s += vec(i) * plane(i)` as [[ArrayDot]] with the same `>= 0` sign
  * test, and the degenerate inputs fold the same way — a NULL vector, a
  * length-mismatched vector, or a NULL element made every per-bit
  * `ArrayDot` null, so every `when` fell to `otherwise(0L)` and the
  * bucket became 0; the kernel returns all-zero buckets for exactly
  * those inputs. Output is a STRUCT of non-nullable longs (b0..b{T-1}),
  * so the extracted `bucket_t` columns keep the old columns' exact
  * non-nullable schema ([[LshBuckets.withBuckets]]).
  */
case class LshBuckets(child: Expression, planes: Array[Array[Array[Double]]])
    extends UnaryExpression {

  private def numTables: Int = planes.length
  private def bits: Int = planes(0).length
  private def dim: Int = planes(0)(0).length

  override def dataType: DataType =
    StructType((0 until numTables).map(t => StructField(s"b$t", LongType, nullable = false)))

  // Always emits a struct (all-zero buckets on degenerate input — the
  // per-bit formulation's when/otherwise fold), never null.
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_buckets requires an array<double> column, got ${other.catalogString}")
  }

  private def checkElementNulls: Boolean = child.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  }

  private lazy val flatPlanes: Array[Double] = {
    val out = new Array[Double](numTables * bits * dim)
    var p = 0
    for (t <- 0 until numTables; b <- 0 until bits; i <- 0 until dim) {
      out(p) = planes(t)(b)(i); p += 1
    }
    out
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    LshBuckets.compute(
      if (v == null) null else v.asInstanceOf[ArrayData],
      flatPlanes, numTables, bits, dim, checkElementNulls)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("lshPlanes", flatPlanes, "double[]")
    val c = child.genCode(ctx)
    val code =
      code"""
        |${c.code}
        |InternalRow ${ev.value} = graft.functions.LshBuckets.compute(
        |  ${c.isNull} ? null : ${c.value},
        |  $planesRef, $numTables, $bits, $dim, $checkElementNulls);
       """.stripMargin
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}

object LshBuckets {

  /** The kernel: all-tables bucket signature of one vector. Degenerate
    * inputs (null vector, length != dim, null element) yield all-zero
    * buckets — see the class doc for why that is the per-bit
    * formulation's exact fold.
    */
  def compute(v: ArrayData, planes: Array[Double], tables: Int, bits: Int,
              dim: Int, checkNulls: Boolean): InternalRow = {
    val out = new Array[Any](tables)
    var ok = v != null && v.numElements() == dim
    if (ok && checkNulls) {
      var i = 0
      while (ok && i < dim) { if (v.isNullAt(i)) ok = false; i += 1 }
    }
    if (!ok) {
      var t = 0
      while (t < tables) { out(t) = 0L; t += 1 }
    } else {
      var t = 0
      var p = 0
      while (t < tables) {
        var bk = 0L
        var b = 0
        while (b < bits) {
          var s = 0.0
          var i = 0
          while (i < dim) { s += v.getDouble(i) * planes(p + i); i += 1 }
          // Spark's `>=` on doubles is the TOTAL order (NaN greater
          // than everything), not Java's primitive compare — a NaN dot
          // SET the bit in the per-bit formulation, so it must here
          // too (FusionSpec pins the NaN row)
          if (s >= 0 || java.lang.Double.isNaN(s)) bk |= (1L << b)
          p += dim
          b += 1
        }
        out(t) = bk
        t += 1
      }
    }
    new GenericInternalRow(out)
  }

  /** Column-API entry point: the bucket-signature struct of `vec`. */
  def apply(vec: Column, planes: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(LshBuckets(ColumnBridge.expression(vec), planes))
}
