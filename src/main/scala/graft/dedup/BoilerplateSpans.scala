package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ShingleHashes

/** Corpus boilerplate-span mining: the most-repeated n-token spans at
  * ARBITRARY alignment — headers, footers, license blocks, templated
  * junk — reported with their first occurrence and spread. This is
  * the diagnostic companion of [[ParagraphDedup]]: paragraph dedup
  * removes repeats on a fixed non-overlapping grid; this miner looks
  * at EVERY token offset (the Lee et al. exact-substring-dedup
  * granularity) and tells you what the corpus's worst boilerplate
  * actually is before you decide what to strip.
  *
  * Shape at scale: one positional-window pass per doc (the native
  * non-distinct [[ShingleHashes]] kernel — window count = token count,
  * so the explode is corpus-token-sized exactly like tokenization),
  * one partial-agg shuffle keyed on the 8-byte window hash, top-k via
  * `TakeOrderedAndProject`. Nothing quadratic anywhere: a span
  * repeated d times costs d aggregation rows, not d² pairs. Spans are
  * identified by `(first_doc, first_pos)` — engine-reproducible
  * (positions, not hashes, leave the plan; the usual xxhash64
  * collision caveat applies to the grouping itself).
  *
  * First occurrence = min over the packed key `doc_id·2²⁰ + pos`,
  * which requires `pos < 2²⁰` (documents above ~1M tokens would need
  * a wider packing — asserted in the spec corpus, documented here).
  */
object BoilerplateSpans {

  private val PosBits = 20
  private val PosCap = 1L << PosBits

  /** Top-`k` spans of `n` tokens occurring at least `minOccurrences`
    * times: `(first_doc, first_pos, occurrences, n_docs)`, ranked by
    * occurrences (ties by first occurrence).
    */
  def mine(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      k: Int,
      minOccurrences: Long = 2L): DataFrame = {
    val w = docs.select(
      col(idCol).cast("long").as("doc_id"),
      posexplode(ShingleHashes.positional(col(textCol), n)))
      .select(col("doc_id"), col("pos"), col("col").as("s"))
    w.groupBy("s")
      .agg(
        count(lit(1)).as("occurrences"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id") * PosCap + col("pos")).as("fk"))
      .where(col("occurrences") >= minOccurrences)
      .select(
        floor(col("fk") / PosCap).cast("long").as("first_doc"),
        pmod(col("fk"), lit(PosCap)).cast("long").as("first_pos"),
        col("occurrences"), col("n_docs"))
      .orderBy(col("occurrences").desc, col("first_doc"), col("first_pos"))
      .limit(k)
  }
}
