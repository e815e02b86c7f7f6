package graft.data

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Hints.maybeBroadcast

import graft.dedup.Shingles
import graft.Store.Materializable

/** Eval-set decontamination (LLM-pipeline brief): flag training
  * documents that share any word n-gram with a benchmark / eval
  * corpus — the standard pretraining hygiene step that keeps test-set
  * passages out of the training mix (overlap inflates downstream eval
  * scores without improving the model).
  *
  * Spark-first shape: the eval side's distinct n-grams are tiny
  * relative to a TB-scale train side (an eval suite is KBs-to-MBs),
  * so the check is a BROADCAST equi join keyed on the gram — one pass
  * over the training shingles with no fact-side shuffle before the
  * per-document count. Shingling is the native one-pass
  * [[Shingles.hashedShingles]] shared with the dedup family; grams
  * travel as 8-byte hashes, never strings (a cross-gram collision
  * flips one count with probability ~|grams|²/2^64 — the same
  * accepted caveat as the rest of the family).
  */
object Decontaminate {

  /** Per-training-document count of DISTINCT n-grams shared with the
    * eval set; documents with zero overlap are absent (the common
    * case — emitting them would dominate output for no signal).
    * Returns `(idCol, n_overlap)`.
    */
  def overlap(
      train: DataFrame,
      evalDocs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5): DataFrame = {
    def grams(df: DataFrame) =
      df.select(col(idCol).as("id"), explode(Shingles.hashedShingles(col(textCol), n)).as("s"))
    val evalGrams = grams(evalDocs).select("s").distinct()
    grams(train)
      .join(maybeBroadcast(evalGrams), "s")
      // grams() emits DISTINCT shingles per doc, so count(*) counts
      // distinct shared grams
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_overlap"))
      .select(col("id").as(idCol), col("n_overlap"))
  }

  /** [[overlap]]'s scale path: same result (exact — the oracle is
    * shared), different memory shape. The eval grams are folded into a
    * [[Bloom]] bitmap (~1.25 bytes per gram vs 8 for the hashed gram
    * in a broadcast hash set), the training shingles are
    * prefiltered by the codegen'd bit test — a row-local map, no join —
    * and only the survivors (true positives + ~0.1% false positives)
    * reach the exact-verify join. When the benchmark suite outgrows
    * the broadcast limit, the verify join can shuffle: its fact side is
    * the surviving sliver, not the corpus.
    */
  def overlapBloom(
      train: DataFrame,
      evalDocs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5,
      bitsPerKey: Int = 10,
      k: Int = 5): DataFrame = {
    def grams(df: DataFrame) =
      df.select(col(idCol).as("id"), explode(Shingles.hashedShingles(col(textCol), n)).as("s"))
    // Tiny by contract; materialized so the bloom build's two driver
    // jobs and the verify join don't re-shingle the eval side 3×.
    val evalGrams = grams(evalDocs).select("s").distinct().materializeOnce()
    val bloom = Bloom.build(evalGrams, col("s"), bitsPerKey, k)
    grams(train)
      .where(bloom.mightContain(col("s")))
      .join(evalGrams, "s")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_overlap"))
      .select(col("id").as(idCol), col("n_overlap"))
  }
}
