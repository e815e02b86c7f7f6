package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-style ANN (LLM-pipeline brief): partition the corpus into
  * `numCells` Voronoi cells around centroid vectors, probe only the
  * `nProbe` nearest cells per query, exact-rerank the candidates.
  *
  * Scale shape: assignment is one broadcast join of the (tiny) centroid
  * set against the corpus — |corpus| x numCells codegen'd dot products,
  * one pass, no corpus shuffle beyond the cell grouping. Queries touch
  * nProbe/numCells of the corpus. Centroids here are a deterministic
  * sample (first `numCells` ids) standing in for a k-means pass — the
  * operator shape (assign → probe → rerank) is identical with trained
  * centroids.
  */
object IvfAnn {

  /** (id, vec) → (id, vec, cell). */
  def assign(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val scored = corpus.as("c").join(broadcast(centroids.as("k")))
      .select(col("c.id").as("id"), col("c.vec").as("vec"), col("k.cid").as("cid"),
        Cosine.sim(col("c.vec"), col("k.cvec")).as("csim"))
    val w = Window.partitionBy("id").orderBy(col("csim").desc, col("cid"))
    scored.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("id"), col("vec"), col("cid").as("cell"))
  }

  def topK(
      queries: DataFrame, // (qid, qvec)
      corpus: DataFrame,  // (id, vec)
      k: Int,
      numCells: Int = 16,
      nProbe: Int = 4): DataFrame = {
    val centroids = corpus.where(col("id") < numCells)
      .select(col("id").as("cid"), col("vec").as("cvec"))
    val cells = assign(corpus, centroids)

    val probeScores = queries.as("q").join(broadcast(centroids.as("k")))
      .select(col("q.qid").as("qid"), col("q.qvec").as("qvec"), col("k.cid").as("cid"),
        Cosine.sim(col("q.qvec"), col("k.cvec")).as("csim"))
    val pw = Window.partitionBy("qid").orderBy(col("csim").desc, col("cid"))
    val probes = probeScores.withColumn("rn", row_number().over(pw))
      .where(col("rn") <= nProbe).select(col("qid"), col("qvec"), col("cid").as("cell"))

    val cands = probes.join(cells, Seq("cell")).where(col("qid") =!= col("id"))
      .select(col("qid").as("q"), col("id").as("neighbor"),
        Cosine.sim(col("qvec"), col("vec")).as("sim"))
    val w = Window.partitionBy("q").orderBy(col("sim").desc, col("neighbor"))
    cands.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("q"), col("neighbor"), round(col("sim"), 4).as("sim"), col("rank"))
  }
}
