package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match dictionary segmentation — the tokenizer-
  * APPLICATION primitive (B30 counts whitespace/regex tokens; B47/B50
  * build vocabularies; this RUNS a vocabulary over text, the BERT
  * WordPiece / jieba-style greedy core): each whitespace word is cut
  * left to right, always taking the LONGEST vocab piece matching at
  * the current position; a position matching nothing emits one UNK
  * piece and advances one char. Returns `struct(n_pieces, n_unk)` per
  * document — the context-length planner's real-token count and the
  * out-of-vocabulary rate in one pass.
  *
  * The vocab compiles ONCE per operator at analysis time (foldable
  * literal array — the [[MultiContains]] contract) into a trie shipped
  * as a reference object; per row the generated code makes ONE call
  * into the trie walker — one pass over the text, no per-piece regex,
  * no join against a vocab table. Greedy-not-optimal is deliberate and
  * spec-pinned ("lean" under {le, a, n, lean-absent} cuts le+a+n = 3,
  * not the 2-piece optimum) — it is what WordPiece ships.
  *
  * Cross-engine exactness: greedy longest-match is deterministic, so a
  * DuckDB recursive CTE advancing `pos` by the max matching piece
  * length reproduces both counts integer-exactly (the
  * `vocab_tokenize` oracle).
  */
case class DictSegment(text: Expression, vocab: Expression)
    extends BinaryExpression {

  override def left: Expression = text
  override def right: Expression = vocab

  override def dataType: DataType = StructType(Seq(
    StructField("n_pieces", LongType, nullable = false),
    StructField("n_unk", LongType, nullable = false)))
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (text.dataType, vocab.dataType) match {
      case (StringType, ArrayType(StringType, _)) if !vocab.foldable =>
        TypeCheckResult.TypeCheckFailure(
          "dict_segment requires a foldable (literal) vocab array — the trie compiles once per operator")
      case (StringType, ArrayType(StringType, _)) =>
        val arr = vocab.eval()
        if (arr == null)
          TypeCheckResult.TypeCheckFailure("dict_segment requires a non-null vocab array")
        else {
          val a = arr.asInstanceOf[ArrayData]
          val bad = (0 until a.numElements()).exists(i =>
            a.isNullAt(i) || a.getUTF8String(i).numBytes() == 0 ||
              a.getUTF8String(i).toString.contains(' '))
          if (a.numElements() == 0)
            TypeCheckResult.TypeCheckFailure("dict_segment requires at least one vocab piece")
          else if (bad)
            TypeCheckResult.TypeCheckFailure(
              "dict_segment vocab pieces must be non-null, non-empty, and space-free")
          else TypeCheckResult.TypeCheckSuccess
        }
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dict_segment requires (string, array<string>), got ${l.catalogString} and ${r.catalogString}")
    }

  @transient private lazy val trie: SegTrie = {
    val a = vocab.eval().asInstanceOf[ArrayData]
    SegTrie((0 until a.numElements()).map(i => a.getUTF8String(i).toString).distinct.toArray)
  }

  override protected def nullSafeEval(t: Any, v: Any): Any =
    trie.segment(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val trieRef = ctx.addReferenceObj("segTrie", trie, classOf[SegTrie].getName)
    nullSafeCodeGen(ctx, ev, (t, _) => s"${ev.value} = $trieRef.segment($t);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DictSegment =
    copy(text = newLeft, vocab = newRight)
}

/** Vocab trie over UTF-16 code units. Built on the driver, serialized
  * to executors, immutable thereafter.
  */
final class SegTrie private (
    private val next: Array[mutable.HashMap[Char, Int]],
    private val terminal: Array[Boolean])
  extends Serializable {

  /** (n_pieces, n_unk) of the greedy segmentation of every
    * space-separated word in `text`. Word splitting follows
    * `split(text, ' ')` semantics: consecutive spaces yield empty
    * words, which contribute nothing.
    */
  def segment(text: UTF8String): InternalRow = {
    val s = text.toString
    val n = s.length
    var pieces = 0L
    var unk = 0L
    var i = 0
    while (i < n) {
      if (s.charAt(i) == ' ') { i += 1 }
      else {
        // word spans [i, end)
        var end = i
        while (end < n && s.charAt(end) != ' ') end += 1
        while (i < end) {
          // longest vocab piece matching at i = deepest TERMINAL on the walk
          var node = 0
          var depth = 0
          var best = 0
          var walking = true
          while (walking && i + depth < end) {
            next(node).get(s.charAt(i + depth)) match {
              case Some(child) =>
                node = child
                depth += 1
                if (terminal(node)) best = depth
              case None => walking = false
            }
          }
          if (best > 0) { pieces += 1L; i += best }
          else { pieces += 1L; unk += 1L; i += 1 } // UNK char
        }
      }
    }
    new GenericInternalRow(Array[Any](pieces, unk))
  }
}

object SegTrie {

  def apply(pieces: Array[String]): SegTrie = {
    val next = mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
    val terminal = mutable.ArrayBuffer(false)
    pieces.foreach { p =>
      var node = 0
      p.foreach { c =>
        node = next(node).getOrElseUpdate(c, {
          next += mutable.HashMap.empty[Char, Int]
          terminal += false
          next.length - 1
        })
      }
      terminal(node) = true
    }
    new SegTrie(next.toArray, terminal.toArray)
  }

  /** Column-API entry point: `vocab` must be a literal array. */
  def dictSegment(text: Column, vocab: Column): Column =
    ColumnBridge.column(DictSegment(
      ColumnBridge.expression(text), ColumnBridge.expression(vocab)))
}
