package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Chat-transcript format validation — the structural QA gate of an
  * instruction-tuning data pipeline: a usable conversation starts with
  * a user turn, strictly alternates user/assistant, and ends with an
  * assistant turn. Malformed transcripts (double user turns from
  * client retries, assistant-first fragments from truncated exports,
  * dangling user turns) are the most common defect class in scraped
  * dialog data, and they are structural — detectable without reading
  * any content.
  *
  * Shape at scale: one shuffle keyed on the conversation id; the
  * alternation check is a `lag` window PARTITIONED by conversation
  * (state bounded by the longest single conversation, never
  * corpus-sized), then a per-conversation partial aggregate. Every
  * output column derives from plain SQL expressions, so a DuckDB
  * oracle reproduces the full report.
  */
object ChatFormat {

  /** Per-conversation structural report: turn counts per role, the
    * start/end-role checks, the count of alternation violations
    * (adjacent same-role turns), and the overall `valid` verdict.
    *
    * @param df        one row per turn
    * @param convCols  conversation identity (e.g. user + day)
    * @param orderCols within-conversation turn order — must be a total
    *                  order (include a unique id as tie-break) or the
    *                  lag sequence is nondeterministic
    * @param role      'user' / 'assistant' per turn
    */
  def validate(df: DataFrame, convCols: Seq[String], orderCols: Seq[Column], role: Column): DataFrame = {
    val w = Window.partitionBy(convCols.map(col): _*).orderBy(orderCols: _*)
    val turns = df
      .withColumn("_role", role)
      .withColumn("_prev", lag(col("_role"), 1).over(w))
      .withColumn("_rn", row_number().over(w))
    turns
      .groupBy(convCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_turns"),
        sum(when(col("_role") === "user", 1L).otherwise(0L)).as("n_user"),
        sum(when(col("_role") === "assistant", 1L).otherwise(0L)).as("n_assistant"),
        (min_by(col("_role"), col("_rn")) === "user").as("starts_ok"),
        (max_by(col("_role"), col("_rn")) === "assistant").as("ends_ok"),
        sum(when(col("_prev") === col("_role"), 1L).otherwise(0L)).as("violations"))
      .withColumn("valid",
        col("starts_ok") && col("ends_ok") &&
          col("violations") === 0 && col("n_turns") >= 2)
  }
}
