package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Count-only set intersection over two `array<bigint>` columns —
  * observationally `size(array_intersect(a, b))` (distinct-element
  * semantics, null elements included when present on both sides, null
  * array → null) without materializing the intersection.
  *
  * The built-in idiom allocates the intersected array and an
  * OpenHashSet per row just to take its size. On the row-per-candidate
  * hot paths — the compact-forward triangle count (one intersection
  * per oriented edge) and the n-gram Jaccard/containment verify (one
  * per candidate pair) — only the COUNT is consumed, so the allocation
  * is pure overhead. This expression copies both sides into primitive
  * long buffers, sorts, and merge-counts distinct matches: no boxing,
  * no hash table, no result array, and the whole thing stays inside
  * whole-stage codegen as one static call.
  *
  * `assumeSorted = true` (Column API only, for producers that build
  * their arrays with `sort_array` once per GROUP rather than once per
  * probing row) skips the copy+sort entirely and merge-counts straight
  * over the ArrayData — ZERO allocation per row. That matters on the
  * triangle census, where the per-row buffer copies + dual sorts of
  * the general path were the dominant GC driver (each oriented edge
  * re-sorted both endpoint adjacency lists). Caller contract: both
  * arrays ascending with nulls FIRST (`sort_array` asc order); an
  * unsorted input silently undercounts, so only set it where the plan
  * provably sorts at the source.
  */
case class IntersectCount(left: Expression, right: Expression, assumeSorted: Boolean = false)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"intersect_count requires two array<bigint> arguments, got ${l.catalogString} and ${r.catalogString}")
    }

  override def nullable: Boolean = left.nullable || right.nullable

  override protected def nullSafeEval(a: Any, b: Any): Any =
    if (assumeSorted)
      IntersectCountUtil.countSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else
      IntersectCountUtil.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (assumeSorted) "countSorted" else "count"
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.IntersectCountUtil.$fn($a, $b)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): IntersectCount =
    copy(left = newLeft, right = newRight)
}

object IntersectCount {
  /** Column-API entry point: `intersect_count(a, b)`. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(IntersectCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column-API entry point with the sorted-input contract (see class
    * scaladoc): merge-counts in place, no per-row allocation.
    */
  def sorted(a: Column, b: Column): Column =
    ColumnBridge.column(IntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b), assumeSorted = true))
}

/** Plain object (no companion class name clash) so the Scala compiler
  * emits a static forwarder the generated Java can call directly.
  */
object IntersectCountUtil {

  /** |distinct(a) ∩ distinct(b)| with array_intersect's null-element
    * rule: a null element present on BOTH sides counts once.
    */
  def count(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    val xa = new Array[Long](na)
    val xb = new Array[Long](nb)
    var nullA = false
    var nullB = false
    var ca = 0
    var i = 0
    while (i < na) {
      if (a.isNullAt(i)) nullA = true
      else { xa(ca) = a.getLong(i); ca += 1 }
      i += 1
    }
    i = 0
    var cb = 0
    while (i < nb) {
      if (b.isNullAt(i)) nullB = true
      else { xb(cb) = b.getLong(i); cb += 1 }
      i += 1
    }
    java.util.Arrays.sort(xa, 0, ca)
    java.util.Arrays.sort(xb, 0, cb)
    var j = 0
    var k = 0
    var c = if (nullA && nullB) 1 else 0
    while (j < ca && k < cb) {
      val va = xa(j)
      val vb = xb(k)
      if (va == vb) {
        c += 1
        while (j < ca && xa(j) == va) j += 1
        while (k < cb && xb(k) == vb) k += 1
      } else if (va < vb) j += 1
      else k += 1
    }
    c
  }

  /** [[count]] for inputs already ascending with nulls first
    * (`sort_array` asc): merge-counts distinct matches directly over
    * the ArrayData — no buffers, no sorts, zero per-row allocation.
    */
  def countSorted(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    // sort_array asc puts nulls first: skip the null prefix, counting
    // the null element once when both sides carry it
    var j = 0
    var k = 0
    while (j < na && a.isNullAt(j)) j += 1
    while (k < nb && b.isNullAt(k)) k += 1
    var c = if (j > 0 && k > 0) 1 else 0
    while (j < na && k < nb) {
      val va = a.getLong(j)
      val vb = b.getLong(k)
      if (va == vb) {
        c += 1
        while (j < na && !a.isNullAt(j) && a.getLong(j) == va) j += 1
        while (k < nb && !b.isNullAt(k) && b.getLong(k) == vb) k += 1
      } else if (va < vb) j += 1
      else k += 1
    }
    c
  }
}
