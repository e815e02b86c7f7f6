package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-document TF-IDF keyword extraction — the data-card / labeling
  * primitive ("what is this document about") and the classical
  * feature weighting behind sparse retrieval. Smooth idf:
  * `idf = ln((N+1)/(df+1)) + 1` (never zero, defined for unseen
  * terms), score = tf·idf, top-k terms per document.
  *
  * Shape at scale: one (doc, term) partial-agg shuffle for tf, a
  * vocab-sized term aggregation for df (auto-broadcast back while the
  * vocabulary fits, shuffle join beyond), the corpus size as one
  * collected scalar, and a per-doc rank window (shuffle keyed by doc,
  * per-partition sort bounded by terms-per-doc). Ranking uses the
  * ROUNDED score with term tie-break, so rank order is reproducible
  * across engines — a sub-ulp idf difference cannot swap ranks.
  */
object TfIdf {

  /** `(doc_id, tok, score, tok_rank)` — top-`k` terms per document. */
  def keywords(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int): DataFrame = {
    val n = docs.count()
    val tf = docs
      .select(col(idCol).as("doc_id"), explode(split(col(textCol), " ")).as("tok"))
      .where(length(col("tok")) > 0)
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val scored = tf.join(df, "tok")
      .select(col("doc_id"), col("tok"),
        round(col("tf") * (log(lit((n + 1).toDouble) / (col("df") + 1)) + 1), 4).as("score"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("tok"))
    scored
      .withColumn("tok_rank", row_number().over(w).cast("long"))
      .where(col("tok_rank") <= k)
  }
}
