package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming exact dedup — the ingest-side companion of the batch
  * dedup family (SURVEY §2.B): when the upstream is at-least-once
  * (replayed log shippers, retried producers), dedup by record key
  * within the watermark horizon makes the pipeline effectively-once
  * even before the idempotent sink.
  *
  * `dropDuplicatesWithinWatermark` keeps one state entry per key and
  * EVICTS it once the watermark passes — state is bounded by (keys
  * arriving within the horizon), not by stream history, which is what
  * makes this runnable forever at ingest scale. A plain
  * `dropDuplicates` on a stream would grow state without bound.
  */
object StreamingDedup {

  /** Drop rows whose `keyCols` were already seen within the watermark
    * horizon. `eventTimeCol` must be a timestamp column; `delay` is
    * the out-of-orderness bound (e.g. "10 minutes").
    */
  def withinWatermark(
      df: DataFrame,
      keyCols: Seq[String],
      eventTimeCol: String,
      delay: String): DataFrame =
    df.withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)
}
