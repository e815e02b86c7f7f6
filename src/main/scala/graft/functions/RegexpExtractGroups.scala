package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass multi-group regex extraction: returns all capture groups as
  * `array<string>` (1-indexed groups at 0-indexed positions), or NULL
  * when the pattern does not match (find semantics, like the
  * reference's `preg_match`, Worker.php:137).
  *
  * The built-in route for the monolog parse — one `rlike` plus one
  * `regexp_extract` per group — executes the same regex 7 times per
  * line. This is the transform every log line passes through
  * (reference Worker.php:131-140), so at 100 TB the 7x matters more
  * than anywhere else; here the regex runs once and the matcher is a
  * compiled per-partition mutable state, inside whole-stage codegen.
  *
  * `regexp` must be foldable (a literal pattern).
  */
case class RegexpExtractGroups(subject: Expression, regexp: Expression) extends BinaryExpression {

  override def left: Expression = subject
  override def right: Expression = regexp

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true

  // Analysis-time validation (ExpectsInputTypes is private[sql] in
  // Spark 4): both sides must be strings and the pattern must be a
  // non-null literal — patternStr is evaluated once per operator, not
  // per row, and doGenCode forces it eagerly, so a foldable NULL
  // pattern (e.g. CAST(NULL AS STRING)) must fail analysis rather than
  // NPE at codegen time.
  override def checkInputDataTypes(): TypeCheckResult =
    (subject.dataType, regexp.dataType) match {
      case (StringType, StringType) if !regexp.foldable =>
        TypeCheckResult.TypeCheckFailure(
          "regexp_groups requires a foldable (literal) pattern")
      case (StringType, StringType) if regexp.eval() == null =>
        TypeCheckResult.TypeCheckFailure(
          "regexp_groups requires a non-null pattern")
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"regexp_groups requires (string, string), got ${l.catalogString} and ${r.catalogString}")
    }

  @transient private lazy val patternStr: String =
    regexp.eval().asInstanceOf[UTF8String].toString
  @transient private lazy val compiled: Pattern = Pattern.compile(patternStr)

  override protected def nullSafeEval(s: Any, p: Any): Any = {
    val m = compiled.matcher(s.asInstanceOf[UTF8String].toString)
    if (m.find()) {
      val arr = new Array[Any](m.groupCount())
      var i = 1
      while (i <= m.groupCount()) {
        val g = m.group(i)
        arr(i - 1) = if (g == null) null else UTF8String.fromString(g)
        i += 1
      }
      new GenericArrayData(arr)
    } else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patternCls = classOf[Pattern].getName
    val patternLit = ctx.addReferenceObj("graftPattern", patternStr)
    val patternRef = ctx.addMutableState(patternCls, "graftCompiled",
      v => s"$v = $patternCls.compile((String) $patternLit);")
    nullSafeCodeGen(ctx, ev, (s, _) => {
      val m = ctx.freshName("m")
      val arr = ctx.freshName("arr")
      val i = ctx.freshName("i")
      s"""
         |java.util.regex.Matcher $m = $patternRef.matcher($s.toString());
         |if ($m.find()) {
         |  org.apache.spark.unsafe.types.UTF8String[] $arr =
         |    new org.apache.spark.unsafe.types.UTF8String[$m.groupCount()];
         |  for (int $i = 1; $i <= $m.groupCount(); $i++) {
         |    String g = $m.group($i);
         |    $arr[$i - 1] = g == null ? null : org.apache.spark.unsafe.types.UTF8String.fromString(g);
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
         |} else {
         |  ${ev.isNull} = true;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): RegexpExtractGroups =
    copy(subject = newLeft, regexp = newRight)
}

object RegexpExtractGroups {
  def apply(subject: Column, regexp: String): Column =
    ColumnBridge.column(RegexpExtractGroups(
      ColumnBridge.expression(subject),
      org.apache.spark.sql.catalyst.expressions.Literal(UTF8String.fromString(regexp), StringType)))
}
