package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Store.Materializable

/** Full iterative BPE tokenizer training (Sennrich et al. 2016) —
  * [[BpePairs]] counts ONE round's merge candidates; this runs the
  * actual loop: R rounds of count → argmax → merge, emitting the
  * learned MERGE TABLE (the artifact a tokenizer ships; applying it
  * is B125's `dict_segment` territory).
  *
  * Scale shape (the classical trick, shared with [[BpePairs]]): the
  * corpus is touched ONCE by the word-frequency aggregation — every
  * training round then runs over the VOCABULARY-sized (state, freq)
  * relation, which is millions of rows at 100 TB, not trillions.
  * Tokenization state rides as a delimited string column; a round is
  * one vocabulary-sized partial-agg job, a 1-row argmax collect, and
  * a row-local string replace. The returned merge table is
  * driver-sized by construction (R rows — the graph_triangles
  * literal-relation precedent).
  *
  * Correctness of the merge step: every token is wrapped
  * INDIVIDUALLY — "cat" is `|c||a||t|` — so `replace("|a||b|",
  * "|ab|")` is exactly BPE's greedy left-to-right non-overlapping
  * merge. The single-delimiter encoding (`|a|b|a|`) gets consecutive
  * repeats wrong: merging (a,a) in "a a a a" must yield [aa, aa], but
  * the first match there consumes the shared middle delimiter and the
  * second pair no longer matches. Ties rank (count desc, pair asc).
  * Pretokenization: lowercase-alphabetic words of ≥2 chars (practical
  * trainers all pretokenize; this frees '|' as the delimiter and
  * makes inlining merged tokens into SQL literals safe).
  */
object BpeTrain {

  /** Learned merge table after `rounds` iterations:
    * (round, lhs, rhs, merged, cnt), ordered by round. Stops early if
    * a round finds no remaining pair.
    */
  def merges(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val vocab = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .where(col("w").rlike("^[a-z]{2,}$"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(regexp_replace(col("w"), "(.)", "|$1|").as("state"), col("freq"))
      .materializeOnce() // R rounds re-read it; never recount the corpus

    def pairCol(state: Column): Column = {
      val toks = split(trim(state, "|"), "\\|\\|")
      val n = size(toks)
      zip_with(
        slice(toks, lit(1), greatest(n - 1, lit(0))),
        slice(toks, lit(2), greatest(n - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b))
    }

    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var cur = vocab
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val best = cur
        .select(col("freq"), explode(pairCol(col("state"))).as("pair"))
        .groupBy("pair").agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("pair").asc)
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val Array(l, rr) = best(0).getString(0).split(" ", 2)
        learned += ((r, l, rr, l + rr, best(0).getLong(1)))
        // l/rr are alphabetic by the pretokenization contract — safe
        // to inline; the replace chain stays lazy over the one store
        cur = cur.withColumn("state",
          expr(s"replace(state, '|$l||$rr|', '|$l$rr|')"))
        r += 1
      }
    }
    learned.toSeq.toDF("round", "lhs", "rhs", "merged", "cnt")
      .orderBy("round")
  }
}
