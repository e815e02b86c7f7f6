package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed size of a string's UTF-8 bytes — the direct
  * compression-ratio quality signal of pretraining pipelines
  * (complementing [[ByteEntropy]], which is the order-free
  * approximation): template junk and repeated boilerplate compress far
  * below natural prose because LZ77 exploits repetition ACROSS
  * positions, which a byte histogram cannot see. `deflate_len /
  * octet_length` is the classic "compression ratio" filter column.
  *
  * Row-local, no shuffle; one reusable per-thread [[Deflater]]
  * (allocation-free steady state — a Deflater holds native zlib state,
  * so per-row construction would thrash JNI allocations at 100 TB).
  * Level 6 (zlib default), fixed strategy → deterministic output size
  * for a given input on a given JVM. The oracle cannot re-run zlib in
  * SQL, so the query's precision oracle checks the emitted size
  * against hard information bounds and re-derives the ratio column
  * exactly (SURVEY §6 precision-oracle pattern).
  *
  * Null → null; empty string → the 8-byte empty DEFLATE+zlib wrapper.
  */
case class DeflateSize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"deflate_size requires a string column, got ${other.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    DeflateSize.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DeflateSize.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): DeflateSize =
    copy(child = newChild)
}

object DeflateSize {

  // one zlib stream per thread, reset between rows; `end()` is left to
  // thread death (finalizer) — executors reuse task threads, so the
  // steady state is one native allocation per core
  private val deflaters = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater = new Deflater(Deflater.DEFAULT_COMPRESSION)
  }

  def compute(s: UTF8String): Int = {
    val in = s.getBytes
    val d = deflaters.get()
    d.reset()
    d.setInput(in)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0
    while (!d.finished()) {
      total += d.deflate(buf)
    }
    total
  }

  /** Column-API entry point. */
  def apply(text: Column): Column =
    ColumnBridge.column(DeflateSize(ColumnBridge.expression(text)))
}
