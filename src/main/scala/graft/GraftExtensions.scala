package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{ArrayDot, ByteEntropy, DeflateSize, DictSegment, DistinctBigrams, FreqTopK, IntersectCount, MultiContains, NfcNormalize, RegexpExtractGroups, ShingleHashes}

/** Registers graft's native expressions with the SQL function registry,
  * so `SELECT array_dot(a, b)` / `regexp_groups(line, pat)` work from
  * SQL as well as the Column API.
  *
  * Two entry points:
  *  - config-driven: `spark.sql.extensions=graft.GraftExtensions`
  *    (the SparkSessionExtensions route for new sessions);
  *  - [[GraftExtensions.register]] for an already-built session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.registrations.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    ext.injectOptimizerRule(_ => graft.functions.DotProductRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}

object GraftExtensions {

  /** Arity check at analysis time — a builder indexing into `args`
    * directly would throw IndexOutOfBounds from inside the analyzer;
    * type validation happens in each expression's checkInputDataTypes.
    */
  private def arity(name: String, n: Int, args: Seq[Expression]): Unit =
    if (args.length != n)
      throw new IllegalArgumentException(
        s"$name expects $n argument(s), got ${args.length}")

  private def registrations: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("array_dot",
      new ExpressionInfo(classOf[ArrayDot].getName, "array_dot"),
      (args: Seq[Expression]) => { arity("array_dot", 2, args); ArrayDot(args(0), args(1)) }),
    ("regexp_groups",
      new ExpressionInfo(classOf[RegexpExtractGroups].getName, "regexp_groups"),
      (args: Seq[Expression]) => { arity("regexp_groups", 2, args); RegexpExtractGroups(args(0), args(1)) }),
    ("distinct_bigrams",
      new ExpressionInfo(classOf[DistinctBigrams].getName, "distinct_bigrams"),
      (args: Seq[Expression]) => { arity("distinct_bigrams", 1, args); DistinctBigrams(args(0)) }),
    ("freq_topk",
      new ExpressionInfo(classOf[FreqTopK].getName, "freq_topk"),
      (args: Seq[Expression]) => {
        arity("freq_topk", 3, args)
        FreqTopK(args(0), foldableInt("freq_topk k", args(1)), foldableInt("freq_topk capacity", args(2)))
      }),
    ("shingle_hashes",
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (args: Seq[Expression]) => {
        arity("shingle_hashes", 2, args)
        ShingleHashes(args(0), foldableInt("shingle_hashes n", args(1)))
      }),
    ("byte_entropy",
      new ExpressionInfo(classOf[ByteEntropy].getName, "byte_entropy"),
      (args: Seq[Expression]) => { arity("byte_entropy", 1, args); ByteEntropy(args(0)) }),
    ("deflate_size",
      new ExpressionInfo(classOf[DeflateSize].getName, "deflate_size"),
      (args: Seq[Expression]) => { arity("deflate_size", 1, args); DeflateSize(args(0)) }),
    ("nfc_normalize",
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (args: Seq[Expression]) => { arity("nfc_normalize", 1, args); NfcNormalize(args(0)) }),
    ("multi_contains",
      new ExpressionInfo(classOf[MultiContains].getName, "multi_contains"),
      (args: Seq[Expression]) => { arity("multi_contains", 2, args); MultiContains(args(0), args(1)) }),
    ("dict_segment",
      new ExpressionInfo(classOf[DictSegment].getName, "dict_segment"),
      (args: Seq[Expression]) => { arity("dict_segment", 2, args); DictSegment(args(0), args(1)) }),
    ("intersect_count",
      new ExpressionInfo(classOf[IntersectCount].getName, "intersect_count"),
      (args: Seq[Expression]) => { arity("intersect_count", 2, args); IntersectCount(args(0), args(1)) }))

  /** Extract a non-null foldable integer argument at analysis time —
    * k/capacity must be literals (they size driver-side structures).
    */
  private def foldableInt(what: String, e: Expression): Int = {
    require(e.foldable && e.eval() != null, s"$what must be a non-null integer literal")
    e.eval() match {
      case i: Int => i
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }
  }

  /** Register on an existing session (functions + the HOF-dot-product
    * rewrite rule).
    */
  def register(spark: SparkSession): Unit = {
    registrations.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), info, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(graft.functions.DotProductRewrite)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.functions.DotProductRewrite
    }
  }
}
