package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (LLM-pipeline
  * brief): token counting, quality scoring, n-gram-heuristic language
  * ID, and rolling-hash document fingerprinting. Everything is
  * row-local built-in expressions — the whole family is a shuffle-free
  * map at any scale.
  */
object TextStats {

  /** Stopword list used by both the language heuristic and quality
    * ratios; mirrored verbatim in oracle SQL.
    */
  val EnStopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  /** BPE-ish token pattern: word pieces or runs of non-word-non-space. */
  val BpeTokenPattern = "\\w+|[^\\w\\s]+"

  def words(text: Column): Column = split(text, " ")

  def stopwordHits(text: Column): Column =
    size(filter(words(text), t => t.isin(EnStopwords: _*)))

  /** (n_ws_tokens, n_bpe_tokens, n_chars) per document. */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val text = col(textCol)
    docs.select(
      col(idCol),
      size(words(text)).as("n_ws_tokens"),
      size(regexp_extract_all(text, lit(BpeTokenPattern), lit(0))).as("n_bpe_tokens"),
      length(text).as("n_chars"))
  }

  /** Length / punctuation / stopword quality ratios. */
  def quality(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val text = col(textCol)
    val nWords = size(words(text))
    val nChars = length(text)
    docs.select(
      col(idCol),
      nChars.as("n_chars"),
      nWords.as("n_words"),
      round(length(regexp_replace(text, " ", "")) / nWords, 4).as("avg_word_len"),
      round(stopwordHits(text) / nWords, 4).as("stopword_ratio"),
      round(size(regexp_extract_all(text, lit("[^\\w\\s]"), lit(0))) / nChars, 4).as("punct_ratio"))
  }

  /** Row-local quality-gate PREDICATE over a text column — the filter
    * form of [[quality]] for ingest-time gating (compose into
    * `TailConfig.transform` or any `where`): minimum word count and
    * maximum punctuation density. Stays a shuffle-free map, so gating
    * at ingest costs one pass over each microbatch.
    */
  def qualityPredicate(text: Column, minWords: Int = 3, maxPunctRatio: Double = 0.2): Column =
    size(words(text)) >= minWords &&
      (size(regexp_extract_all(text, lit("[^\\w\\s]"), lit(0))) / length(text)) <= maxPunctRatio

  /** N-gram-heuristic language ID: stopword density against the English
    * list; below the floor → undetermined.
    */
  def langId(docs: DataFrame, idCol: String, textCol: String, minRatio: Double = 0.05): DataFrame = {
    val text = col(textCol)
    val ratio = round(stopwordHits(text) / size(words(text)), 4)
    docs.select(
      col(idCol),
      ratio.as("stop_ratio"),
      when(ratio >= minRatio, lit("en")).otherwise(lit("und")).as("lang_pred"))
  }

  /** Within-document repetition (a Gopher-style quality rule): the
    * fraction of word bigrams that are repeats of an earlier bigram,
    * `1 - distinct/total`. High values flag boilerplate/spam/looped
    * generations. Row-local like the rest of the family; documents
    * with fewer than two tokens score 0.
    *
    * The distinct-bigram count runs through the native
    * [[graft.functions.DistinctBigrams]] expression (one codegen'd
    * loop + hash set) rather than the interpreted shingle pipeline —
    * same count, ~3x less per-row cost on the corpus scan.
    */
  def repetition(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = words(col(textCol))
    val total = greatest(size(toks) - 1, lit(0))
    val distinct = graft.functions.DistinctBigrams(toks)
    docs.select(
      col(idCol),
      total.cast("long").as("n_bigrams"),
      distinct.cast("long").as("n_distinct_bigrams"),
      when(total > 0, round(lit(1.0) - distinct / total.cast("double"), 4))
        .otherwise(lit(0.0)).as("rep_ratio"))
  }

  private val FingerprintMod = 1000000007L // keeps acc*31 + tokenHash < 2^63 (no ANSI overflow)

  /** Per-token 60-bit hash: the top 15 hex digits of standard MD5.
    * MD5 (unlike xxhash64's Spark-specific seeding) is bit-identical
    * across engines, which makes the fingerprint exactly recomputable
    * by the DuckDB oracle: `CAST('0x' || substring(md5(t),1,15) AS
    * BIGINT)` yields this same value.
    */
  private def tokenHash(t: Column): Column =
    conv(substring(md5(t), 1, 15), 16, 10).cast("long")

  /** Rolling polynomial hash over the token stream:
    * `h = fold(tokens)(h * 31 + tokenHash(tok)) mod M`.
    * Order-sensitive (unlike a bag-of-words hash) so re-ordered
    * documents fingerprint differently. 60-bit token hashes keep the
    * fold inside signed-64 range: acc < 1e9, so acc*31 + h < 2^60 +
    * 3.1e10 < 2^63.
    */
  def fingerprint(text: Column): Column =
    aggregate(
      words(text),
      lit(0L),
      (acc, t) => pmod(acc * 31 + tokenHash(t), lit(FingerprintMod)))

  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), fingerprint(col(textCol)).as("fingerprint"))

  /** Unicode-script profile — the script-mix signal a multilingual
    * corpus pipeline routes on (CJK text through a CJK tokenizer,
    * mixed-script spam flagged, wrong-script docs dropped from a
    * monolingual mix). Counts per script class are row-local
    * `length(text) - length(regexp_replace(text, class, ''))` — one
    * codegen'd pass, zero shuffle at any scale. The char-class ranges
    * are plain codepoint ranges, so the DuckDB oracle recomputes every
    * count with RE2's `\x{...}` spelling of the same classes.
    *
    * `dominant` is the argmax over the four letter-script counts with
    * ties broken in fixed order (latin > cyrillic > greek > cjk), or
    * `none` when no letter of any counted script occurs.
    */
  def scriptProfile(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val text = col(textCol)
    def cnt(clazz: String): Column =
      (length(text) - length(regexp_replace(text, clazz, ""))).cast("long")
    val latin = cnt("[A-Za-z]")
    val digit = cnt("[0-9]")
    val space = cnt("\\s")
    val cyr = cnt("[Ѐ-ӿ]")
    val greek = cnt("[Ͱ-Ͽ]")
    val cjk = cnt("[一-鿿]")
    // argmax with fixed-order ties: the first script holding the max
    val maxCnt = greatest(latin, cyr, greek, cjk)
    val dom =
      when(maxCnt === 0, lit("none"))
        .when(latin === maxCnt, lit("latin"))
        .when(cyr === maxCnt, lit("cyrillic"))
        .when(greek === maxCnt, lit("greek"))
        .otherwise(lit("cjk"))
    docs.select(
      col(idCol),
      length(text).cast("long").as("n_chars"),
      latin.as("latin"), digit.as("digit"), space.as("space"),
      cyr.as("cyrillic"), greek.as("greek"), cjk.as("cjk"),
      (length(text).cast("long") - latin - digit - space - cyr - greek - cjk).as("other"),
      dom.as("dominant"))
  }
}
