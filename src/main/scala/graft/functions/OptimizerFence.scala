package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.DataType

/** Identity expression flagged non-deterministic — the Scala-expression
  * analog of the optimization guide's §4.4 `udf.asNondeterministic()`
  * fix for duplicated expensive expressions.
  *
  * The parse paths project an expensive one-pass extraction
  * (`RegexpExtractGroups` / `from_json`) and filter on its null-ness.
  * The optimizer pushes that filter below the projection (rewriting it
  * in terms of the extraction) and below the adaptive input spread —
  * so the round-16 plans executed the regex TWICE per surviving row
  * (`from_json` three times), with one copy trapped in the 1-task
  * pre-spread scan stage the spread exists to escape. Wrapping the
  * extraction in this fence forbids the optimizer from duplicating or
  * reordering across it, which pins extraction AND null filter above
  * the spread exchange: one evaluation per row, at full parallelism
  * (plan-verified in plans/r17, spec-pinned in SinkAndPlanSpec).
  *
  * The fence is semantically an identity — value, nullability, and
  * codegen all delegate to the child. `deterministic = false` is an
  * optimizer FENCE, not a semantic claim: the child itself must be
  * deterministic (results could otherwise genuinely differ under task
  * retry). Trade-off per the guide: other filters no longer push past
  * the fenced projection, so apply it only where the duplicated work
  * dominates anything pushdown could save — the whole-corpus parse
  * projections qualify (their inputs are raw lines; nothing below the
  * fence is prunable by the lost pushdown).
  */
case class OptimizerFence(child: Expression) extends UnaryExpression {

  override def dataType: DataType = child.dataType

  override def nullable: Boolean = child.nullable

  // The fence itself: never constant-folded, never duplicated by
  // filter pushdown, never reordered across.
  override lazy val deterministic: Boolean = false

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): OptimizerFence =
    copy(child = newChild)
}

object OptimizerFence {
  def apply(c: Column): Column =
    ColumnBridge.column(OptimizerFence(ColumnBridge.expression(c)))
}
