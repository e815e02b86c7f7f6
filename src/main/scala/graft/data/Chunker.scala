package graft.data

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Overlapping context-window chunking (LLM-pipeline brief): split
  * each document into windows of `win` tokens starting every `stride`
  * tokens — the standard unit-preparation step for RAG indexing and
  * long-document pretraining, where `stride < win` gives consecutive
  * chunks a `win - stride` token overlap so no span of meaning is cut
  * without context on either side.
  *
  * Contract: window starts are 0, stride, 2·stride, … for every start
  * strictly below the token count, so every token belongs to at least
  * one chunk (the trailing windows may be shorter than `win`).
  * `chunk_id = start / stride` is dense and deterministic; the chunk
  * key `(doc_id, chunk_id)` is stable under reprocessing — the
  * idempotence requirement for incremental RAG index maintenance.
  *
  * Shape at scale: entirely row-local (tokenize → window starts →
  * per-window slices in one generated stage) — zero shuffles, linear
  * in corpus size, embarrassingly parallel. Output volume is
  * `win / stride`× the corpus; that amplification is the operator's
  * contract, not a plan artifact.
  */
object Chunker {

  /** `(doc_id, chunk_id, n_tokens, chunk)` rows per document. */
  def chunks(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      win: Int,
      stride: Int): DataFrame = {
    require(win >= 1 && stride >= 1 && stride <= win,
      s"need 1 <= stride <= win, got win=$win stride=$stride")
    val toks = split(col(textCol), " ")
    docs
      .select(col(idCol).as("doc_id"), toks.as("toks"))
      .select(col("doc_id"),
        explode(transform(
          sequence(lit(0), size(col("toks")) - 1, lit(stride)),
          s => struct(
            floor(s / stride).cast("long").as("chunk_id"),
            least(lit(win), size(col("toks")) - s).cast("long").as("n_tokens"),
            concat_ws(" ", slice(col("toks"), s + 1, lit(win))).as("chunk")))).as("c"))
      .select(col("doc_id"), col("c.chunk_id"), col("c.n_tokens"), col("c.chunk"))
  }
}
