package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EWMA rate-anomaly detection over bucketed event counts — the
  * "alert when a log level spikes" capability of a log-analytics
  * engine: per key (level, event type, source…), an exponentially
  * weighted moving average and variance (West's recurrence) track the
  * expected rate; a bucket whose count exceeds
  * `expected + z·sigma` (both from the PREVIOUS state, so a spike
  * never masks itself) is flagged.
  *
  * Spark-first shape: one shuffle keyed on the series key
  * (`groupByKey` over the pre-aggregated bucket counts — NOT the raw
  * events; bucketing is a partial-agg `groupBy` upstream), then a
  * per-key ordered fold in `flatMapGroups`. The fold's memory is one
  * key's bucket series — bounded by buckets-per-retention (8,760
  * hourly buckets/year), orders of magnitude below any executor
  * budget regardless of corpus size; the raw-event volume only ever
  * passes through the partial-agg bucketing. The same recurrence runs
  * incrementally under `mapGroupsWithState` for a live stream (state =
  * (ewma, var) per key); the batch form here is the oracle-checkable
  * one.
  *
  * EWMA: `e_t = α·x_t + (1−α)·e_{t−1}`, seeded `e_0 = x_0`;
  * variance: `v_t = (1−α)·(v_{t−1} + α·(x_t − e_{t−1})²)`, seeded 0.
  * With α a small binary fraction (default 1/4) every operation is
  * plain IEEE arithmetic, so an oracle recomputing the identical
  * recurrence (DuckDB recursive CTE) reproduces the values bit for
  * bit.
  */
object RateAnomaly {

  /** Flag anomalous buckets in `counts` = `(keyCol, tsCol, cntCol)`
    * rows: emits `(key, bucket_ts, cnt, expected, sigma)` for buckets
    * with `cnt > expected + z·sigma` after `warmup` buckets of the
    * series have seeded the state. Bucket timestamps must be unique
    * per key (counts pre-aggregated).
    */
  def detect(
      counts: DataFrame,
      keyCol: String,
      tsCol: String,
      cntCol: String,
      alpha: Double = 0.25,
      z: Double = 3.0,
      warmup: Int = 5): DataFrame = {
    val spark = counts.sparkSession
    import spark.implicits._
    val flagged = counts
      .select(
        col(keyCol).cast("string"),
        unix_micros(col(tsCol).cast("timestamp")),
        col(cntCol).cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (key, it) =>
        val series = it.toArray.sortBy(_._2)
        var ewma = 0.0
        var v = 0.0
        var i = 0
        val out = Seq.newBuilder[(String, Long, Long, Double, Double)]
        series.foreach { case (_, ts, cnt) =>
          val x = cnt.toDouble
          if (i >= warmup && x > ewma + z * math.sqrt(v))
            out += ((key, ts, cnt, ewma, math.sqrt(v)))
          if (i == 0) ewma = x
          else {
            val d = x - ewma
            v = (1 - alpha) * (v + alpha * d * d)
            ewma = alpha * x + (1 - alpha) * ewma
          }
          i += 1
        }
        out.result()
      }
    flagged
      .toDF(keyCol, "bucket_us", "cnt", "expected_raw", "sigma_raw")
      .select(
        col(keyCol),
        timestamp_micros(col("bucket_us")).cast("timestamp_ntz").as("bucket_ts"),
        col("cnt"),
        round(col("expected_raw"), 4).as("expected"),
        round(col("sigma_raw"), 4).as("sigma"))
  }
}
