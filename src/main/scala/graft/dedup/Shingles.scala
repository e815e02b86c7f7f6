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

  /** Distinct xxhash64 values of the word n-gram shingles — the native
    * one-pass fast path ([[graft.functions.ShingleHashes]]),
    * bit-identical to `xxhash64` applied to each [[shingles]] element
    * (spec-tested corpus-wide). Use this whenever the downstream only
    * ever sees the hash (the whole dedup family); use [[shingles]]
    * when the gram string itself matters.
    */
  def hashedShingles(text: Column, n: Int): Column =
    graft.functions.ShingleHashes(text, n)

  /** NON-overlapping windows of `paraTokens` tokens, in document order
    * (the last window may be shorter) — the "paragraph" unit of
    * [[ParagraphDedup]] on single-line corpora. Unlike [[shingles]],
    * positions matter and duplicates within a document are preserved:
    * the caller decides which occurrences to keep.
    */
  def paragraphs(text: Column, paraTokens: Int): Column = {
    val toks = tokens(text)
    val nParas = ceil(size(toks).cast("double") / paraTokens).cast("int")
    transform(
      sequence(lit(0), nParas - 1),
      j => concat_ws(" ", slice(toks, j * paraTokens + 1, lit(paraTokens))))
  }
}
