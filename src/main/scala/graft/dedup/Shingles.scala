package graft.dedup

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Word n-gram shingling shared by the dedup family. Pure built-in
  * higher-order functions — evaluated per row with no shuffle, so the
  * shingle stage is a map over the scan at any scale.
  */
object Shingles {

  def tokens(text: Column): Column = split(text, " ")

  /** Distinct word n-gram shingles of `text`. Documents shorter than
    * `n` tokens yield an empty array.
    */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val idx = sequence(lit(0), size(toks) - n)
    val grams = transform(idx, i => concat_ws(" ", slice(toks, i + 1, lit(n))))
    array_distinct(when(size(toks) >= n, grams).otherwise(array().cast("array<string>")))
  }
}
