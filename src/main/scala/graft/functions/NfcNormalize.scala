package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization — the canonical-composition pass every
  * text-dedup pipeline needs BEFORE hashing: "é" as U+00E9 and as
  * "e" + U+0301 (combining acute) are byte-different, so exact dedup,
  * MinHash shingles, and fingerprints all silently treat visually
  * identical documents as distinct until the corpus is normalized to
  * one canonical form (NFC is the web/W3C default).
  *
  * Spark has no normalization built-in; this is the
  * custom-Expression route (ByteEntropy's pattern): row-local,
  * null-preserving, codegen'd to a single static call around
  * `java.text.Normalizer` (ICU-equivalent canonical composition from
  * the JDK — no library dependency). The fast path skips composed
  * ASCII/Latin text: `Normalizer.isNormalized` is a cheap scan that
  * avoids allocating for the (overwhelmingly common) already-NFC
  * case, so the hot loop stays allocation-free on clean corpora.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string column, got ${other.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    NfcNormalize.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalize.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** Column-API entry point. */
  def apply(text: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(text)))
}
