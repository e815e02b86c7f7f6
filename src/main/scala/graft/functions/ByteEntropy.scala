package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy of a string's byte distribution, in nats — the
  * compression-ratio-style quality signal of pretraining pipelines:
  * boilerplate, repeated separators, and template junk have low
  * entropy; natural prose sits in a narrow band; random blobs sit
  * high. One generated pass over the UTF-8 bytes (a 256-bin histogram
  * + one log loop), row-local, no shuffle — the built-in route would
  * be explode-chars → two aggregations, a shuffle per doc batch for
  * what is conceptually a map.
  *
  * `H = −Σ_b (c_b/n)·ln(c_b/n)` over bytes b with count `c_b > 0`,
  * summed in ascending byte order — a DETERMINISTIC summation order,
  * so an oracle that sorts its terms the same way reproduces the
  * value exactly (on ASCII text bytes == characters and the byte
  * order is the character order). Empty string → 0.0; null → null.
  */
case class ByteEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"byte_entropy requires a string column, got ${other.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    ByteEntropy.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ByteEntropy.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): ByteEntropy =
    copy(child = newChild)
}

object ByteEntropy {

  def compute(s: UTF8String): Double = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numBytes()
    if (n == 0) return 0.0
    val hist = new Array[Int](256)
    var i = 0
    while (i < n) {
      hist(Platform.getByte(base, off + i) & 0xff) += 1
      i += 1
    }
    val dn = n.toDouble
    var h = 0.0
    var b = 0
    while (b < 256) {
      val c = hist(b)
      if (c > 0) {
        val p = c / dn
        h -= p * math.log(p)
      }
      b += 1
    }
    h
  }

  /** Column-API entry point. */
  def apply(text: Column): Column =
    ColumnBridge.column(ByteEntropy(ColumnBridge.expression(text)))
}
