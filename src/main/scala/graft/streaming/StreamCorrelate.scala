package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — correlating two live streams by key
  * within an event-time window (request↔response pairing, click↔
  * impression attribution, log-line↔alert correlation). The online
  * companion of the batch as-of / range joins (SURVEY §2 A19x/19y).
  *
  * Spark-first shape: Structured Streaming's stream-stream inner join
  * with BOTH sides watermarked and an event-time interval predicate —
  * exactly the two constraints that let the engine EVICT join state.
  * Each side buffers only rows younger than `watermark + interval`;
  * without them a stream-stream join must hold both streams' history
  * forever, which is why the engine rejects the unwatermarked form in
  * append mode. State size is bounded by arrival rate × horizon at any
  * stream length.
  *
  * The same code runs in batch (`EliminateEventTimeWatermark` drops the
  * watermark node), which is how the join semantics are oracle-checked:
  * the `correlate_req_resp` registry query is this exact operator over
  * the events table, compared value-for-value against DuckDB.
  */
object StreamCorrelate {

  /** Inner-join `left` and `right` on `keyCol` where the right event
    * time falls in `[leftTime, leftTime + within]`. `delay` is each
    * side's out-of-orderness bound (the watermark). Both inputs must
    * carry `keyCol`; the right side's copy is dropped from the output.
    */
  def interval(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTimeCol: String,
      rightTimeCol: String,
      delay: String,
      within: String): DataFrame =
    joined(left, right, keyCol, leftTimeCol, rightTimeCol, delay, within, "inner")

  /** LEFT-OUTER variant — TIMEOUT DETECTION: every left event emits,
    * matched rows as in [[interval]], unmatched rows with null right
    * columns. On a stream, an unmatched left row can only be declared
    * unmatched once no in-window right row can still arrive, so the
    * null-padded row emits when the watermark passes the end of its
    * join window — the emission delay IS the correctness condition
    * (the SLA-violation alert fires `within + delay` after the
    * request, never early). State bounds are the inner join's; the
    * same code runs in batch as a plain left-outer interval join,
    * where it is value-oracle-checked (`correlate_timeouts`).
    */
  def intervalOuter(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTimeCol: String,
      rightTimeCol: String,
      delay: String,
      within: String): DataFrame =
    joined(left, right, keyCol, leftTimeCol, rightTimeCol, delay, within, "left_outer")

  private def joined(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTimeCol: String,
      rightTimeCol: String,
      delay: String,
      within: String,
      joinType: String): DataFrame = {
    val l = left.withWatermark(leftTimeCol, delay)
    val r = right.withWatermark(rightTimeCol, delay)
      .withColumnRenamed(keyCol, "__corr_key")
    l.join(r,
      col(keyCol) === col("__corr_key") &&
        col(rightTimeCol) >= col(leftTimeCol) &&
        col(rightTimeCol) <= col(leftTimeCol) + expr(s"INTERVAL $within"),
      joinType)
      .drop("__corr_key")
  }
}
