package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Hints.maybeBroadcast

/** Approximate nearest neighbors via random-hyperplane LSH
  * (LLM-pipeline brief — the scale path next to [[Knn]]'s exact
  * baseline).
  *
  * `numTables` independent hash tables of `bitsPerTable` hyperplane
  * sign bits each. A vector lands in one bucket per table; queries are
  * compared only against corpus vectors sharing a bucket in at least
  * one table, then exact-cosine reranked. Cost scales with bucket
  * collisions, not |corpus| — the all-pairs product never materializes.
  *
  * Hyperplanes are deterministic pseudo-random vectors derived from a
  * fixed seed so results are reproducible.
  */
object LshAnn {

  /** Deterministic hyperplane component: table t, bit b, dim d. */
  private def planes(numTables: Int, bitsPerTable: Int, dim: Int): Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(42)
    Array.fill(numTables, bitsPerTable, dim)(rnd.nextGaussian())
  }

  /** Append `bucket_t` columns (one long per table) to a vector frame.
    *
    * Round-17 (guide §4): the per-bit `when(ArrayDot(vec, plane) >= 0,
    * 1L << b)` unrolling — numTables × bitsPerTable dot products, each
    * materializing its literal plane array per row — is fused into ONE
    * [[graft.functions.LshBuckets]] expression (a single static kernel
    * over a flat plane matrix, bit-identical by FunctionsSpec). The
    * signature struct is computed in its own projection and the
    * `bucket_t` columns extracted in a second one: CollapseProject
    * never inlines a non-cheap producer referenced numTables times, so
    * the kernel runs once per row (asserted on the physical plan in
    * SinkAndPlanSpec).
    */
  def withBuckets(df: DataFrame, vecCol: String, numTables: Int, bitsPerTable: Int, dim: Int): DataFrame = {
    val hp = planes(numTables, bitsPerTable, dim)
    val sig = graft.functions.LshBuckets(col(vecCol), hp)
    df.withColumn("_lsh_sig", sig)
      .select(df.columns.map(col) ++
        (0 until numTables).map(t => col("_lsh_sig").getField(s"b$t").as(s"bucket_$t")): _*)
  }

  /** Approximate top-k: bucket-join per table, union candidates, exact
    * rerank.
    *
    * Default config is 16 tables × 6 bits — the measured pick, not the
    * cheapest: on CLUSTERED corpora (where queries in loose clusters
    * have true top-10 at lower cosine, so high-bit agreement is rare)
    * the old 8×8 default measured recall@10 = 0.73/0.78 at 1×/10×
    * while 16×6 holds 0.91/0.958 on the same corpora and 0.96+ on
    * uniform ones (SCALE.md "ANN recall on clustered corpora",
    * SCALE_DATA.jsonl sf0.1c/sf1c rows). Fewer bits per table widens
    * buckets (recall ↑, candidates ↑); more tables buys independent
    * chances. Candidate volume stays bucket-bounded either way.
    */
  def topK(
      queries: DataFrame, // (qid, qvec)
      corpus: DataFrame,  // (id, vec)
      k: Int,
      numTables: Int = 16,
      bitsPerTable: Int = 6,
      dim: Int = 64): DataFrame = {
    // Bucket probing moves only (id, table, bucket); vectors join back
    // onto the deduplicated candidate list for the exact rerank (same
    // shuffle-payload reasoning as CosineDedup.pairs).
    // NOT spread (round 16): the probe-batch contract keeps candidate
    // volume small here; the extra exchange measured neutral-to-loss
    // (the DEDUP families, whose whole-corpus candidate joins are the
    // heavy consumers, spread in CosineDedup.bucketStore instead).
    val qb = withBuckets(queries, "qvec", numTables, bitsPerTable, dim)
    val cb = withBuckets(corpus, "vec", numTables, bitsPerTable, dim)
    val qLong = qb.select(
      col("qid"),
      explode(array((0 until numTables).map(t => struct(lit(t).as("t"), col(s"bucket_$t").as("bk"))): _*)).as("tb"))
      .select(col("qid"), col("tb.t").as("t"), col("tb.bk").as("bk"))
    val cLong = cb.select(
      col("id"),
      explode(array((0 until numTables).map(t => struct(lit(t).as("t"), col(s"bucket_$t").as("bk"))): _*)).as("tb"))
      .select(col("id"), col("tb.t").as("t"), col("tb.bk").as("bk"))
    // The probe side is small by contract, but "small" is a runtime
    // fact, not a structural one — size-gate the hints so an outsized
    // probe batch degrades to a shuffle join instead of an OOM.
    val cands = maybeBroadcast(qLong).join(cLong,
        col("qid") =!= col("id") && qLong("t") === cLong("t") && qLong("bk") === cLong("bk"))
      .select(col("qid").as("q"), col("id").as("neighbor"))
      .dropDuplicates("q", "neighbor")
    val qv = queries.select(col("qid"), col("qvec"),
      sqrt(Cosine.dot(col("qvec"), col("qvec"))).as("qn"))
    val cv = corpus.select(col("id"), col("vec"),
      sqrt(Cosine.dot(col("vec"), col("vec"))).as("cn"))
    val scored = cands
      .join(maybeBroadcast(qv), col("q") === col("qid"))
      .join(cv, col("neighbor") === col("id"))
      .select(col("q"), col("neighbor"),
        (Cosine.dot(col("qvec"), col("vec")) / (col("qn") * col("cn"))).as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q")).orderBy(col("sim").desc, col("neighbor"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("q"), col("neighbor"), round(col("sim"), 4).as("sim"), col("rank"))
  }
}
