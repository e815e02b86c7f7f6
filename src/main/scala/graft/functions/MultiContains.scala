package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern substring scan — the blocklist/keyword-tagging
  * primitive of a pretraining filter (documents matched against
  * thousands of banned or flagged literals). The naive route is one
  * `contains` per pattern: N full passes over every document, N
  * predicate nodes in the plan. This is ONE pass at any pattern
  * count: a compiled Aho–Corasick automaton (trie + BFS failure
  * links), built once per operator at analysis time from a foldable
  * pattern array — the [[RegexpExtractGroups]] compile-once contract
  * — and shipped to executors as a reference object.
  *
  * `multi_contains(text, array('a', 'b', ...))` returns the DISTINCT
  * patterns found in `text`, lexicographically sorted (deterministic
  * output, engine-reproducible: a SQL oracle re-derives it with
  * per-pattern `contains` + sort). Empty result = clean document;
  * null text → null. Matching is plain substring containment over
  * UTF-16 code units — exactly `String.contains` semantics, including
  * overlaps.
  */
case class MultiContains(subject: Expression, patterns: Expression)
    extends BinaryExpression {

  override def left: Expression = subject
  override def right: Expression = patterns

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (subject.dataType, patterns.dataType) match {
      case (StringType, ArrayType(StringType, _)) if !patterns.foldable =>
        TypeCheckResult.TypeCheckFailure(
          "multi_contains requires a foldable (literal) pattern array — the automaton compiles once per operator")
      case (StringType, ArrayType(StringType, _)) =>
        val arr = patterns.eval()
        if (arr == null)
          TypeCheckResult.TypeCheckFailure("multi_contains requires a non-null pattern array")
        else {
          val a = arr.asInstanceOf[ArrayData]
          val bad = (0 until a.numElements()).exists(i =>
            a.isNullAt(i) || a.getUTF8String(i).numBytes() == 0)
          if (a.numElements() == 0)
            TypeCheckResult.TypeCheckFailure("multi_contains requires at least one pattern")
          else if (bad)
            TypeCheckResult.TypeCheckFailure("multi_contains patterns must be non-null and non-empty")
          else TypeCheckResult.TypeCheckSuccess
        }
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"multi_contains requires (string, array<string>), got ${l.catalogString} and ${r.catalogString}")
    }

  @transient private lazy val automaton: AhoCorasick = {
    val a = patterns.eval().asInstanceOf[ArrayData]
    // duplicates collapse: output arrays are distinct pattern strings
    AhoCorasick((0 until a.numElements()).map(i => a.getUTF8String(i).toString).distinct.toArray)
  }

  override protected def nullSafeEval(s: Any, p: Any): Any =
    automaton.matched(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("ahoCorasick", automaton, classOf[AhoCorasick].getName)
    nullSafeCodeGen(ctx, ev, (s, _) => s"${ev.value} = $acRef.matched($s);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MultiContains =
    copy(subject = newLeft, patterns = newRight)
}

/** Compiled Aho–Corasick automaton over UTF-16 code units. Built on
  * the driver, serialized to executors, immutable thereafter.
  */
final class AhoCorasick private (
    private val next: Array[mutable.HashMap[Char, Int]],
    private val fail: Array[Int],
    private val out: Array[Array[Int]],
    private val sortedPatterns: Array[UTF8String],
    private val sortedIndexOf: Array[Int],
    val size: Int)
  extends Serializable {

  /** Distinct matched patterns, lexicographically sorted. */
  def matched(text: UTF8String): ArrayData = {
    val s = text.toString
    val hits = new Array[Boolean](size)
    var nHits = 0
    var node = 0
    var i = 0
    val n = s.length
    while (i < n && nHits < size) {
      val c = s.charAt(i)
      while (node != 0 && !next(node).contains(c)) node = fail(node)
      node = next(node).getOrElse(c, 0)
      val o = out(node)
      var j = 0
      while (j < o.length) {
        val sorted = sortedIndexOf(o(j))
        if (!hits(sorted)) { hits(sorted) = true; nHits += 1 }
        j += 1
      }
      i += 1
    }
    val res = new Array[Any](nHits)
    var k = 0
    var w = 0
    while (k < size) {
      if (hits(k)) { res(w) = sortedPatterns(k); w += 1 }
      k += 1
    }
    new GenericArrayData(res)
  }
}

object AhoCorasick {

  def apply(patterns: Array[String]): AhoCorasick = {
    val next = mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
    val outSets = mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Int])
    // trie
    patterns.zipWithIndex.foreach { case (p, id) =>
      var node = 0
      p.foreach { c =>
        node = next(node).getOrElseUpdate(c, {
          next += mutable.HashMap.empty[Char, Int]
          outSets += mutable.ArrayBuffer.empty[Int]
          next.length - 1
        })
      }
      outSets(node) += id
    }
    // BFS failure links; outputs accumulate along them
    val fail = Array.fill(next.length)(0)
    val queue = mutable.Queue.empty[Int]
    next(0).valuesIterator.foreach(queue.enqueue(_))
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      next(u).foreach { case (c, v) =>
        var f = fail(u)
        while (f != 0 && !next(f).contains(c)) f = fail(f)
        fail(v) = if (next(f).contains(c) && next(f)(c) != v) next(f)(c) else 0
        outSets(v) ++= outSets(fail(v))
        queue.enqueue(v)
      }
    }
    val order = patterns.indices.sortBy(patterns(_))
    val sortedIndexOf = new Array[Int](patterns.length)
    order.zipWithIndex.foreach { case (orig, sorted) => sortedIndexOf(orig) = sorted }
    new AhoCorasick(
      next.toArray,
      fail,
      outSets.map(_.distinct.toArray).toArray,
      order.map(i => UTF8String.fromString(patterns(i))).toArray,
      sortedIndexOf,
      patterns.length)
  }

  /** Column-API entry point: `pats` must be a literal array. */
  def multiContains(text: Column, pats: Column): Column =
    ColumnBridge.column(MultiContains(
      ColumnBridge.expression(text), ColumnBridge.expression(pats)))
}
