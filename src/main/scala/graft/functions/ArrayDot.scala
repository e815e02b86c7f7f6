package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst dot product over two `array<double>` columns.
  *
  * The built-in way to express a dot product is
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)` — two higher-order
  * functions that are evaluated interpreted, allocate an intermediate
  * array per row, and break whole-stage codegen. On the ANN/near-dup
  * hot path that runs per *candidate pair* (millions of times), which
  * measured ~100x slower than this expression: a single generated Java
  * loop over the two `ArrayData`, no allocation, codegen-friendly.
  */
case class ArrayDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // Analysis-time type validation (ExpectsInputTypes is private[sql]
  // in Spark 4, so the check is manual): the eval body calls getDouble,
  // so both children must be array<double>.
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"array_dot requires two array<double> arguments, got ${l.catalogString} and ${r.catalogString}")
    }

  // Observationally equivalent to the zip_with/aggregate HOF idiom (a
  // requirement for DotProductRewrite to be semantics-preserving):
  // unequal lengths → null (the HOF null-pads the shorter side, so its
  // fold yields null), and a null ELEMENT → null (null * y = null
  // poisons the HOF sum). The element checks are emitted only when the
  // child type says elements can be null, so the common
  // containsNull=false hot path keeps the tight branch-free loop.
  override def nullable: Boolean = true

  private def elementsNullable(e: Expression): Boolean = e.dataType match {
    case org.apache.spark.sql.types.ArrayType(_, containsNull) => containsNull
    case _ => true
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val checkNulls = elementsNullable(left) || elementsNullable(right)
    var i = 0
    var s = 0.0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val nullCheck =
        if (elementsNullable(left) || elementsNullable(right))
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

object ArrayDot {
  /** Column-API entry point: `array_dot(a, b)`. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
