package graft.sim

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Brute-force cosine top-k — the exact baseline for ANN
  * (LLM-pipeline brief).
  *
  * The probe batch's contract is "small" (it is the brute-force
  * baseline: |queries| x |corpus| FLOPs), so it is collected and
  * inlined as a literal struct array; each corpus row `explode`s over
  * the batch — a Generate in the plan, NOT a join operator. That keeps
  * the single corpus pass with zero shuffle before the top-k window
  * and no BroadcastNestedLoopJoin anywhere (the blanket plan guard in
  * SinkAndPlanSpec covers this query). For probe batches too large to
  * inline, use LshAnn/IvfAnn — that size is exactly when brute force
  * stops being the right operator anyway.
  */
object Knn {

  /** Literal struct array of (qid, qvec, qn) for the probe batch; the
    * norm is folded left-to-right like [[Cosine.dot]] so driver and
    * executor arithmetic agree bit-for-bit.
    */
  private def inlineQueries(queries: DataFrame): Column = {
    val qRows: Array[Row] = queries.select("qid", "qvec").collect()
    require(qRows.nonEmpty, "empty probe batch")
    array(qRows.map { r =>
      val qv = r.getSeq[Double](1)
      var qn = 0.0
      qv.foreach(x => qn += x * x)
      struct(
        lit(r.get(0)).as("qid"),
        array(qv.map(lit(_)): _*).as("qvec"),
        lit(math.sqrt(qn)).as("qn"))
    }: _*)
  }

  /** Hard-negative mining — the contrastive-training data op: for each
    * probe, the top-k most similar corpus vectors with a DIFFERENT
    * label (near the anchor in embedding space, wrong class — the
    * negatives that actually teach). Same single-pass literal-probe
    * shape as [[topK]] with the probe's label carried in the inlined
    * struct; the label filter runs BEFORE the rank window, so ranks
    * are exact within the cross-label candidate set.
    *
    * @param queries (qid, qvec array<double>, qlabel)
    * @param corpus  (id, vec array<double>, label)
    */
  def hardNegatives(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val qRows: Array[Row] = queries.select("qid", "qvec", "qlabel").collect()
    require(qRows.nonEmpty, "empty probe batch")
    val inlined = array(qRows.map { r =>
      val qv = r.getSeq[Double](1)
      var qn = 0.0
      qv.foreach(x => qn += x * x)
      struct(
        lit(r.get(0)).as("qid"),
        array(qv.map(lit(_)): _*).as("qvec"),
        lit(math.sqrt(qn)).as("qn"),
        lit(r.get(2)).as("qlabel"))
    }: _*)
    val scored = corpus
      .select(col("id"), col("vec"), col("label"),
        sqrt(Cosine.dot(col("vec"), col("vec"))).as("cn"),
        explode(inlined).as("qq"))
      .where(col("qq.qid") =!= col("id") && col("qq.qlabel") =!= col("label"))
      .select(
        col("qq.qid").as("q"),
        col("id").as("neighbor"),
        (Cosine.dot(col("qq.qvec"), col("vec")) / (col("qq.qn") * col("cn"))).as("sim"))
    val w = Window.partitionBy(col("q")).orderBy(col("sim").desc, col("neighbor"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("q"), col("neighbor"), round(col("sim"), 4).as("sim"), col("rank"))
  }

  /** k-NN majority-vote classification — the weak-supervision /
    * quality-classifier shape of a training-data pipeline (label a
    * probe set from its nearest labeled exemplars): each probe takes
    * the label held by the most of its k nearest corpus vectors by
    * cosine. Ties break by higher best-similarity within the label,
    * then smaller label — fully deterministic, so the exact-kNN
    * oracle reproduces the vote bit for bit.
    *
    * Same "small probe batch" contract as [[topK]] (one corpus pass,
    * no join operator); the vote tail is a |probes|·k-row aggregate —
    * driver-scale — joined back to labels with the TINY side
    * broadcast. For probe sets too large to inline, generate
    * candidates with IvfAnn/LshAnn and reuse this vote tail shape.
    *
    * @param queries (qid, qvec array<double>) — small, inlined
    * @param corpus  (id, vec array<double>, label)
    */
  def classify(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val top = topK(queries, corpus.select("id", "vec"), k)
    val votes = corpus.select(col("id").as("neighbor"), col("label"))
      .join(broadcast(top), "neighbor")
      .groupBy(col("q"), col("label"))
      .agg(count(lit(1)).as("votes"), max(col("sim")).as("best_sim"))
    val w = Window.partitionBy(col("q"))
      .orderBy(col("votes").desc, col("best_sim").desc, col("label"))
    votes.withColumn("_vr", row_number().over(w))
      .where(col("_vr") === 1)
      .select(col("q"), col("label").as("pred"), col("votes"), col("best_sim"))
  }

  /** @param queries (qid, qvec array<double>) — small, inlined
    * @param corpus  (id, vec array<double>)
    */
  def topK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    // norms are per-vector, so compute them before the pair stage — the
    // |queries| x |corpus| stage then costs one dot product per pair.
    // NOT spread (round 16): probe batches are small by contract, so
    // the per-task work here is tiny and the extra exchange measured a
    // net LOSS on every ANN row (ann_bruteforce 0.8 → 1.6 s).
    val scored = corpus
      .select(col("id"), col("vec"),
        sqrt(Cosine.dot(col("vec"), col("vec"))).as("cn"),
        explode(inlineQueries(queries)).as("qq"))
      .where(col("qq.qid") =!= col("id"))
      .select(
        col("qq.qid").as("q"),
        col("id").as("neighbor"),
        (Cosine.dot(col("qq.qvec"), col("vec")) / (col("qq.qn") * col("cn"))).as("sim"))
    val w = Window.partitionBy(col("q")).orderBy(col("sim").desc, col("neighbor"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("q"), col("neighbor"), round(col("sim"), 4).as("sim"), col("rank"))
  }
}
