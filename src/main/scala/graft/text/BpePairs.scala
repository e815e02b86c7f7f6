package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BPE merge-candidate counting — the hot kernel of
  * byte-pair-encoding tokenizer training (Sennrich et al. 2016): the
  * corpus-wide frequency of every adjacent symbol pair, counted per
  * occurrence. Each training iteration picks the most frequent pair,
  * merges it, and recounts; this operator is that count, exposed as
  * the top-k merge candidates.
  *
  * The scale trick is classical and decisive: pair counting runs over
  * the DISTINCT-WORD table weighted by word frequency, never over the
  * corpus. Corpus volume is only touched by the word-count
  * aggregation (one partial-agg shuffle, map-side combined); the
  * pair explode and pair aggregation see vocabulary-sized input
  * (millions of rows at 100 TB, not trillions). The top-k plans as
  * `TakeOrderedAndProject` — bounded per-partition heaps, no global
  * sort shuffle.
  *
  * Initial symbols are characters (the classic formulation).
  * Single-character words have no pair and are filtered before the
  * explode. Ties rank lexicographically for determinism.
  */
object BpePairs {

  /** Top-`k` merge candidates over `textCol`, words split on spaces:
    * `(pair, cnt)` — `pair` the two-character adjacent symbol pair,
    * `cnt` its occurrence count (within-word positions × word
    * occurrences), ordered by descending count then pair.
    */
  def topMerges(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    val words = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .where(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("freq"))
    words
      .select(col("freq"),
        explode(transform(
          sequence(lit(1), length(col("w")) - 1),
          i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy("pair").agg(sum(col("freq")).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(k)
  }
}
