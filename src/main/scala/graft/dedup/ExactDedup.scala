package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact deduplication by content hash (LLM-pipeline brief).
  *
  * Groups on `(xxhash64(text), length(text))` rather than the full text
  * so the shuffle moves ~12-byte keys instead of documents — at 100 TB
  * the shuffle volume is the cost driver. The length component pushes
  * the collision probability of the 64-bit hash far past the
  * multi-billion-document birthday bound (two distinct docs must match
  * both hash and exact length to merge). Keeper choice (`min(id)`) is
  * deterministic.
  */
object ExactDedup {

  /** One row per distinct content: the keeper id and how many
    * duplicates collapsed into it.
    */
  def dedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .groupBy(
        xxhash64(col(textCol)).as("content_hash"),
        length(col(textCol)).as("content_len"))
      .agg(min(col(idCol)).as("doc_id"), count(lit(1)).as("dup_count"))
      .select("doc_id", "dup_count")
}
