package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst shingler: DISTINCT xxhash64 values of the word
  * n-grams of a string, in one pass over the UTF-8 bytes — the hot
  * kernel of the whole dedup family (n-gram Jaccard, MinHash,
  * decontamination), which all explode shingles and immediately hash
  * them.
  *
  * The built-in route is `array_distinct(transform(sequence(...),
  * i -> concat_ws(' ', slice(split(text, ' '), i, n))))` followed by
  * `xxhash64` on each exploded element: five nested higher-order
  * functions, all CodegenFallback, materializing a token array, an
  * index array, an n-gram STRING array, and a dedup array per row —
  * profiled at ~0.4 ms/doc, it dominates every shingle-family query.
  * This expression never builds a string: a window of n consecutive
  * tokens joined by single spaces is exactly the original byte span
  * from the first token's start to the last token's end (tokens are
  * split on every single space, so the separators inside the span ARE
  * single spaces), so each shingle hash is XXH64 over a byte range of
  * the input, seed 42 (the `xxhash64` builtin's seed). Bit-equality
  * with the builtin chain is spec-tested corpus-wide.
  *
  * Split semantics match `split(text, ' ')` (Java `split` with
  * limit -1): a token boundary at EVERY space byte, empty tokens
  * preserved — 0x20 never occurs inside a UTF-8 multi-byte sequence,
  * so byte scanning is character-exact. Fewer than n tokens yields an
  * empty array (the builtin guard's `when(size(toks) >= n, ...)`).
  * Distinctness keeps first occurrence, matching `array_distinct`
  * modulo the (documented, accepted) xxhash64-collision caveat.
  */
case class ShingleHashes(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (n < 1)
      TypeCheckResult.TypeCheckFailure(s"shingle_hashes requires n >= 1, got $n")
    else child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"shingle_hashes requires a string column, got ${other.catalogString}")
    }

  override protected def nullSafeEval(v: Any): Any =
    ShingleHashes.compute(v.asInstanceOf[UTF8String], n, distinct)

  // The kernel is one static JVM method (JIT-compiled scala); the
  // generated code is a single call, so the enclosing stage stays in
  // whole-stage codegen with no fallback.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHashes.compute($c, $n, $distinct);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {

  /** Seed of Spark's `xxhash64` builtin. */
  private val Seed = 42L

  /** One-pass kernel: token boundaries by byte scan, then XXH64 over
    * each n-token byte span. `distinct = true` keeps first occurrences
    * (set semantics, the dedup-family contract); `distinct = false`
    * emits EVERY window in position order (index i = the shingle
    * starting at token i — the positional contract boilerplate-span
    * mining relies on).
    */
  def compute(s: UTF8String, n: Int, distinct: Boolean = true): ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes()
    var spaces = 0
    var i = 0
    while (i < len) {
      if (Platform.getByte(base, off + i) == 0x20) spaces += 1
      i += 1
    }
    val m = spaces + 1 // tokens, empties included — split(text, ' ') semantics
    if (m < n) return new GenericArrayData(Array.empty[Long])
    val starts = new Array[Int](m)
    val ends = new Array[Int](m)
    var k = 0
    i = 0
    while (i < len) {
      if (Platform.getByte(base, off + i) == 0x20) {
        ends(k) = i
        k += 1
        starts(k) = i + 1
      }
      i += 1
    }
    ends(m - 1) = len
    val w = m - n + 1
    val out = new Array[Long](w)
    val seen = if (distinct) new java.util.HashSet[java.lang.Long](Math.max(8, w * 2)) else null
    var cnt = 0
    var j = 0
    while (j < w) {
      val a = starts(j)
      val h = XXH64.hashUnsafeBytes(base, off + a, ends(j + n - 1) - a, Seed)
      if (seen == null || seen.add(h)) { out(cnt) = h; cnt += 1 }
      j += 1
    }
    new GenericArrayData(if (cnt == w) out else java.util.Arrays.copyOf(out, cnt))
  }

  /** Column-API entry point: distinct hashed word n-grams of `text`. */
  def apply(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(text), n))

  /** EVERY window in position order (non-distinct): array index i is
    * the hash of the n-gram starting at token i.
    */
  def positional(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(text), n, distinct = false))
}
