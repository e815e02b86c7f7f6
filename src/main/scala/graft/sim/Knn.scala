package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Brute-force cosine top-k — the exact baseline for ANN
  * (LLM-pipeline brief).
  *
  * The query side is expected to be small (a batch of probe vectors)
  * and is explicitly broadcast; the corpus side streams through a
  * single pass, so cost is |queries| x |corpus| FLOPs with no corpus
  * shuffle. Top-k per query uses a rank-window over the (small)
  * per-query candidate sets.
  */
object Knn {

  /** @param queries (qid, qvec array<double>) — small, broadcast
    * @param corpus  (id, vec array<double>)
    */
  def topK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    // norms are per-vector, so compute them before the pair join — the
    // |queries| x |corpus| stage then costs one dot product per pair
    val c = corpus.select(col("id"), col("vec"),
      sqrt(Cosine.dot(col("vec"), col("vec"))).as("cn"))
    val q = queries.select(col("qid"), col("qvec"),
      sqrt(Cosine.dot(col("qvec"), col("qvec"))).as("qn"))
    val scored = c.as("c")
      .join(broadcast(q.as("q")), col("q.qid") =!= col("c.id"))
      .select(
        col("q.qid").as("q"),
        col("c.id").as("neighbor"),
        (Cosine.dot(col("q.qvec"), col("c.vec")) / (col("q.qn") * col("c.cn"))).as("sim"))
    val w = Window.partitionBy(col("q")).orderBy(col("sim").desc, col("neighbor"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("q"), col("neighbor"), round(col("sim"), 4).as("sim"), col("rank"))
  }
}
