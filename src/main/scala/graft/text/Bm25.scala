package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 ranked search over a document corpus (Robertson–Spärck Jones
  * probabilistic relevance, the Okapi BM25 formulation) — ranked "grep
  * the corpus", and the scoring kernel of retrieval-based data
  * selection (importance-sample training documents by relevance to a
  * target query/domain).
  *
  * Scale shape: the query-dependent statistics are TINY and collected
  * once — corpus size and average document length in ONE aggregation
  * pass, per-term document frequencies in a second pass filtered to
  * the query's terms (|terms| rows). Scoring is then entirely
  * row-local: per-document term frequencies against literal idf
  * weights, one pass over the corpus with NO join and NO shuffle;
  * the top-k plans as `TakeOrderedAndProject` (bounded per-partition
  * heaps + k-row driver merge, no global sort). At 100 TB this is
  * two cheap stats passes and one scan.
  */
object Bm25 {

  /** Top-`k` documents by BM25 score for `terms`: `(doc_id, score)`,
    * zero-score documents dropped, ties broken by id. `k1` saturates
    * term frequency; `b` scales length normalization.
    */
  def search(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val toks = split(col(textCol), " ")
    val stats = docs.agg(
      count(lit(1)).as("n"), avg(size(toks)).as("avgdl")).head()
    val n = stats.getLong(0)
    require(n > 0, "bm25 needs a non-empty corpus (avgdl is undefined on zero documents)")
    val avgdl = stats.getDouble(1)
    val dfs = docs
      .select(explode(array_distinct(toks)).as("t"))
      .where(col("t").isin(terms: _*))
      .groupBy("t").agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val dl = size(toks).cast("double")
    val score = terms.map { t =>
      val df = dfs.getOrElse(t, 0L).toDouble
      // idf as an in-plan expression (log of a literal ratio), so the
      // oracle recomputes the identical formula from the same df
      val idf = log(lit(1.0) + (lit(n.toDouble) - df + 0.5) / (df + 0.5))
      val tf = size(filter(toks, x => x === lit(t))).cast("double")
      idf * tf * (lit(k1) + 1) / (tf + lit(k1) * (lit(1 - b) + lit(b) * dl / lit(avgdl)))
    }.reduce(_ + _)
    docs
      .select(col(idCol).as("doc_id"), round(score, 4).as("score"))
      .where(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }
}
