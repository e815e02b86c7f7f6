package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Native Catalyst count of DISTINCT adjacent token pairs in an
  * `array<string>` — the hot kernel of repetition scoring
  * (TextStats.repetition, a Gopher-style quality rule).
  *
  * The built-in route is the shingle pipeline:
  * `array_distinct(transform(sequence(...), i -> concat_ws(' ',
  * slice(toks, i, 2))))` then `size` — four nested higher-order
  * functions evaluated interpreted, materializing an index array, a
  * bigram-string array, and a dedup array per row. This expression is
  * one generated loop with a hash set: no intermediate ArrayData, and
  * it keeps the whole stage codegen'd.
  *
  * Equivalence to the shingle count: tokens come from `split(text,
  * ' ')`, so they cannot contain the separator space, and the
  * space-joined pair string is injective on pairs — distinct joined
  * strings == distinct pairs. Null ELEMENTS (absent from split output
  * but allowed by the type) are skipped at SEQUENCE level — tokens
  * bridge across a null, exactly like the shingle route's
  * concat_ws-then-resplit — so the two routes agree on any input
  * (fuzz-pinned on null/dup-heavy random arrays; a pair-local skip
  * demonstrably diverges on null-adjacent inputs). Fewer than two
  * non-null tokens → 0, matching the shingle guard.
  */
case class DistinctBigrams(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  // Fail at analysis time, not with a ClassCastException from the
  // generated loop: the eval body calls getUTF8String, so anything but
  // array<string> is a type error. (ExpectsInputTypes is private[sql]
  // in Spark 4, hence the manual check — same pattern as ArrayDot.)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"distinct_bigrams requires array<string>, got ${other.catalogString}")
  }

  private def elementsNullable: Boolean = child.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  }

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 2) 0
    else {
      // concat_ws skip semantics at SEQUENCE level: null elements are
      // removed before pairing, so tokens BRIDGE across a null — the
      // exact behavior of the shingle route, whose concat_ws-joined
      // string drops nulls before the re-split. (An earlier version
      // skipped nulls pair-locally, rendering (x, null) as "x"; the
      // randomized null-heavy fuzz caught it diverging from the
      // pipeline on null-adjacent arrays.)
      val set = new java.util.HashSet[String]()
      var prev: String = null
      var i = 0
      while (i < n) {
        if (!(elementsNullable && arr.isNullAt(i))) {
          val cur = arr.getUTF8String(i).toString
          if (prev != null) set.add(prev + " " + cur)
          prev = cur
        }
        i += 1
      }
      set.size()
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val set = ctx.freshName("set")
      val i = ctx.freshName("i")
      val prev = ctx.freshName("prev")
      val cur = ctx.freshName("cur")
      // sequence-level null skip, mirroring nullSafeEval: nulls are
      // removed before pairing (tokens bridge across a null), exactly
      // like the shingle route's concat_ws-then-resplit — only pay the
      // null check when the child type admits null elements
      val nullGuard = if (elementsNullable) s"if ($a.isNullAt($i)) continue;" else ""
      s"""
         |final int $n = $a.numElements();
         |if ($n < 2) {
         |  ${ev.value} = 0;
         |} else {
         |  java.util.HashSet $set = new java.util.HashSet();
         |  String $prev = null;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullGuard
         |    String $cur = $a.getUTF8String($i).toString();
         |    if ($prev != null) $set.add($prev + " " + $cur);
         |    $prev = $cur;
         |  }
         |  ${ev.value} = $set.size();
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): DistinctBigrams =
    copy(child = newChild)
}

object DistinctBigrams {
  /** Column-API entry point over a token array. */
  def apply(tokens: Column): Column =
    ColumnBridge.column(DistinctBigrams(ColumnBridge.expression(tokens)))
}
