package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram language-model scoring — the perplexity-filter shape of a
  * pretraining pipeline (CCNet-style: score each document by how
  * (un)likely its tokens are under a corpus LM, filter or bucket on
  * the score). A real deployment scores against a pretrained KenLM;
  * the engine-side machinery — fit token frequencies over a corpus,
  * score every document against them, all distributed — is identical
  * for the unigram model used here, which keeps the math exactly
  * reproducible in SQL.
  *
  * Output per document: token count and mean negative log-likelihood
  * in nats (`nll = ln(total_tokens) − mean(ln(count(tok)))`;
  * perplexity = e^nll). Higher = less typical of the corpus.
  *
  * Scale shape: one aggregation builds the frequency table (vocab-
  * sized — orders of magnitude smaller than the corpus); the scoring
  * join keys on the token, where stop-token skew is AQE's standard
  * split case (and the frequency side auto-broadcasts while vocab
  * fits). The corpus-total token count is ONE scalar collected to the
  * driver and inlined as a literal — the same tiny-driver-side regime
  * as IVF centroid collection, and the only join-free way to attach a
  * global scalar (a constant-key join folds its condition away and
  * plans as the cartesian the registry-wide no-BNLJ assert bans).
  */
object UnigramLm {

  /** `(id, n_tokens, nll)` for every document, `nll` rounded to 4
    * decimals (sub-ulp summation-order differences between engines
    * stay far below the rounding grain). Runs one scalar-aggregate
    * job at construction time for the corpus token total.
    */
  def score(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("id"), explode(split(col(textCol), " ")).as("tok"))
    val freqs = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val total = freqs.agg(sum(col("cnt"))).head.getLong(0)
    toks
      .join(freqs, "tok")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"), avg(log(col("cnt"))).as("avg_ln_cnt"))
      .select(
        col("id"),
        col("n_tokens"),
        round(lit(math.log(total.toDouble)) - col("avg_ln_cnt"), 4).as("nll"))
  }
}
