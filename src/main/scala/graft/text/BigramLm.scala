package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bigram language-model scoring — one Markov order up from
  * [[UnigramLm]]: documents scored by the mean negative
  * log-likelihood of their token TRANSITIONS, which separates
  * "common words in impossible order" (word-salad spam that a unigram
  * filter loves) from natural prose. Same CCNet-perplexity-filter
  * machinery; the conditional is add-one smoothed so unseen
  * transitions stay finite and the math stays exactly SQL-reproducible:
  *
  *   p(w2 | w1) = (c(w1 w2) + 1) / (c(w1) + V)
  *
  * with c(·) corpus counts, V the unigram vocabulary size.
  *
  * Scale shape mirrors the unigram scorer: the bigram frequency table
  * is corpus-bigram-bounded (≪ corpus at any n), built in one
  * partial-agg pass over the SAME exploded pairs used for scoring;
  * both scoring joins key on token(s), stop-word skew is AQE's
  * standard split case and the frequency sides auto-broadcast while
  * they fit; V is ONE scalar collected to the driver and inlined as a
  * literal (constant-key joins are banned registry-wide).
  */
object BigramLm {

  /** `(id, n_bigrams, nll)` per document with ≥2 tokens; `nll` in
    * nats, rounded to 4 decimals (summation-order ulps stay far below
    * the grain).
    */
  def score(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = docs.select(col(idCol).as("id"), split(col(textCol), " ").as("toks"))
    val toks = t.select(col("id"), explode(col("toks")).as("tok"))
    val uni = toks.groupBy("tok").agg(count(lit(1)).as("cu"))
    val v = uni.count() // vocab size: one driver-side scalar
    val bg = t
      .select(col("id"), explode(expr(
        """zip_with(slice(toks, 1, size(toks) - 1),
          |         slice(toks, 2, size(toks) - 1),
          |         (a, b) -> named_struct('w1', a, 'w2', b))""".stripMargin)).as("z"))
      .select(col("id"), col("z.w1").as("w1"), col("z.w2").as("w2"))
    val cb = bg.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    bg
      .join(cb, Seq("w1", "w2"))
      .join(uni, col("w1") === col("tok"))
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        avg(log((col("cb") + lit(1.0d)) / (col("cu") + lit(v.toDouble)))).as("ll"))
      .select(col("id"), col("n_bigrams"), round(-col("ll"), 4).as("nll"))
  }
}
