package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation over the parsed log stream —
  * per-level counts in tumbling windows with a watermark bounding
  * state (the streaming complement of the batch `agg_level_daily`
  * query; late lines beyond the watermark are dropped instead of
  * growing state forever, which is what makes the aggregation safe to
  * run indefinitely at ingest scale).
  *
  * Works identically on a batch frame (window + groupBy, no watermark
  * semantics), which is how the oracle-checked batch path validates
  * the same expression.
  */
object WindowedCounts {

  def perLevel(
      parsed: DataFrame,
      windowLength: String = "1 minute",
      watermarkDelay: String = "5 minutes"): DataFrame = {
    val withEventTime = parsed.withColumn("event_time", col("created_at").cast("timestamp"))
    val w = if (withEventTime.isStreaming) withEventTime.withWatermark("event_time", watermarkDelay)
            else withEventTime
    w.groupBy(window(col("event_time"), windowLength), col("level"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        col("window.start").as("window_start"),
        col("level"), col("cnt"))
  }
}
