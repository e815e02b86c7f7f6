package graft.sim

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalar-quantized (int8) ANN — the memory/bandwidth scale path for
  * similarity search (LLM-pipeline brief): store each embedding as
  * `array<tinyint>` plus one float scale (4x smaller than float32,
  * 8x smaller than the double arrays the exact path carries), score
  * candidates with integer dot products, then re-rank only the
  * shortlist against the full-precision vectors.
  *
  * Quantization is symmetric per-vector max-abs: `scale = max|x|/127`,
  * `q_i = round(x_i / scale)` ∈ [-127, 127], and
  * `dot(a, b) ≈ scale_a * scale_b * Σ qa_i qb_i`. The approximation
  * error is bounded by the two rounding half-steps, so quantized
  * ranking tracks true ranking closely and a small shortlist margin
  * recovers what reordering loses (recall measured in AnnTextSpec).
  *
  * Two phases, both shuffle-light:
  *  1. candidate scoring: one pass over the QUANTIZED corpus (the only
  *     thing a 100 TB deployment keeps hot) with the quantized probe
  *     batch inlined as a literal — a Generate, no join — then a
  *     per-query top-`shortlist` window on int scores;
  *  2. exact re-rank: the tiny shortlist (|queries| x shortlist rows)
  *     joins back to the full-precision corpus by id — broadcast-sized
  *     by construction — and true cosine orders the final top-k.
  *
  * Emitted `sim` is TRUE cosine (phase 2), so the DuckDB precision
  * oracle (`annPrecisionSql`) re-derives it exactly; the quantized
  * scores only ever choose candidates.
  */
object Quantized {

  /** Quantize a double-array column: struct(scale float, q array<tinyint>). */
  def quantize(vec: Column): Column = {
    val scale = greatest(array_max(transform(vec, x => abs(x))), lit(1e-30)) / lit(127.0)
    struct(
      scale.cast("float").as("scale"),
      transform(vec, x => round(x / scale).cast("tinyint")).as("q"))
  }

  /** Integer dot product of two quantized arrays (codegen'd HOFs). */
  private def qdot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("int") * y.cast("int")),
      lit(0), (acc, x) => acc + x)

  /** @param queries   (qid, qvec array<double>) — small, inlined
    * @param corpus    (id, vec array<double>)
    * @param k         final neighbors per query
    * @param shortlist candidates re-ranked exactly (>= k)
    */
  def topK(queries: DataFrame, corpus: DataFrame, k: Int, shortlist: Int): DataFrame = {
    require(shortlist >= k, "shortlist must be >= k")
    val qRows: Array[Row] = queries.select("qid", "qvec").collect()
    require(qRows.nonEmpty, "empty probe batch")

    // quantize the probe batch driver-side, mirroring quantize()'s
    // executor arithmetic (max-abs / 127, round-half-up)
    val inlined = array(qRows.map { r =>
      val qv = r.getSeq[Double](1).toArray
      val scale = math.max(qv.map(math.abs).max, 1e-30) / 127.0
      // BigDecimal HALF_UP mirrors Spark's round() exactly (Math.round
      // is floor(x+0.5), which disagrees on negative half-steps)
      val q = qv.map(x => new java.math.BigDecimal(x / scale)
        .setScale(0, java.math.RoundingMode.HALF_UP).intValue())
      struct(
        lit(r.get(0)).as("qid"),
        lit(scale.toFloat).as("qscale"),
        array(q.map(lit(_)): _*).as("qq"),
        array(qv.map(lit(_)): _*).as("qvec"),
        lit(math.sqrt(qv.map(x => x * x).sum)).as("qn"))
    }: _*)

    // phase 1: quantized corpus only — at scale this is a separate,
    // 4x-smaller table; here it is derived in the same pass.
    // NOT spread (round 16): probe-batch work is too small to amortize
    // an extra exchange (measured net loss across the ANN family).
    val quant = corpus.select(col("id"), quantize(col("vec")).as("qv"))
    val probe = explode(inlined).as("p")
    val scored = quant
      .select(col("id"), col("qv"), probe)
      .where(col("p.qid") =!= col("id"))
      .select(
        col("p.qid").as("q"),
        col("id").as("neighbor"),
        (col("p.qscale") * col("qv.scale") *
          qdot(col("p.qq"), col("qv.q")).cast("double")).as("qscore"))
    val w1 = Window.partitionBy(col("q")).orderBy(col("qscore").desc, col("neighbor"))
    val cands = scored
      .withColumn("crank", row_number().over(w1))
      .where(col("crank") <= shortlist)
      .select(col("q"), col("neighbor"))

    // phase 2: exact re-rank of the shortlist against full precision;
    // the shortlist is |queries| x shortlist rows — broadcast it
    val qvecs = qRows.map { r =>
      val qv = r.getSeq[Double](1)
      r.get(0) -> qv
    }
    val qvecCol = qvecs.foldRight(lit(null).cast("array<double>")) { case ((qid, qv), e) =>
      when(col("q") === lit(qid), array(qv.map(lit(_)): _*)).otherwise(e)
    }
    val exact = corpus
      .join(broadcast(cands), col("id") === col("neighbor"))
      .withColumn("qvec", qvecCol)
      .select(
        col("q"), col("neighbor"),
        (Cosine.dot(col("qvec"), col("vec")) /
          (sqrt(Cosine.dot(col("qvec"), col("qvec"))) *
            sqrt(Cosine.dot(col("vec"), col("vec"))))).as("sim"))
    val w2 = Window.partitionBy(col("q")).orderBy(col("sim").desc, col("neighbor"))
    exact
      .withColumn("rank", row_number().over(w2))
      .where(col("rank") <= k)
      .select(col("q"), col("neighbor"), round(col("sim"), 4).as("sim"), col("rank"))
  }
}
