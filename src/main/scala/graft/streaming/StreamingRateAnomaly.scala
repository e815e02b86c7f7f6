package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming EWMA rate-anomaly detection — the live form of
  * [[graft.ops.RateAnomaly]]: per-key EWMA mean + West's EW variance
  * carried across microbatches in `flatMapGroupsWithState`, alerts
  * emitted the moment an anomalous bucket arrives (the dashboard
  * "level X is spiking" signal, vs the batch form's retrospective
  * report).
  *
  * Input is the stream of FINALIZED bucket counts (e.g. a watermarked
  * windowed count upstream, or a per-batch aggregation in
  * `foreachBatch`) — one row per (key, bucket); raw events never reach
  * this operator. State per key is three numbers + a high-water mark,
  * independent of bucket count: state size scales with |keys|.
  *
  * Ordering contract: the EWMA recurrence is order-sensitive, so
  * buckets are folded in event-time order within each batch, and a
  * bucket at or below the key's high-water mark (out-of-order arrival
  * across batches — upstream should have closed it already) is
  * DROPPED, not folded: a silent mis-ordered fold would corrupt the
  * state for every later bucket, while dropping loses one update.
  * The recurrence and alert rule are the batch operator's, so the two
  * forms agree on an in-order stream (spec-asserted).
  */
object StreamingRateAnomaly {

  final case class Bucket(key: String, tsMillis: Long, cnt: Long)
  final case class RateState(ewma: Double, v: Double, n: Long, maxTs: Long)
  final case class Alert(key: String, tsMillis: Long, cnt: Long, expected: Double, sigma: Double)

  /** Append-mode alert stream: one [[Alert]] per anomalous bucket
    * (`cnt > ewma + z·sigma` of the pre-bucket state, after `warmup`
    * buckets of the key's history).
    */
  def alerts(
      buckets: Dataset[Bucket],
      alpha: Double = 0.25,
      z: Double = 3.0,
      warmup: Int = 5): Dataset[Alert] = {
    implicit val stateEnc = Encoders.product[RateState]
    implicit val outEnc = Encoders.product[Alert]
    implicit val keyEnc = Encoders.STRING
    buckets
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[Bucket], state: GroupState[RateState]) =>
          var s = state.getOption.getOrElse(RateState(0.0, 0.0, 0L, Long.MinValue))
          val out = Seq.newBuilder[Alert]
          it.toSeq.sortBy(_.tsMillis).foreach { b =>
            if (b.tsMillis > s.maxTs) {
              val x = b.cnt.toDouble
              if (s.n >= warmup && x > s.ewma + z * math.sqrt(s.v))
                out += Alert(key, b.tsMillis, b.cnt, s.ewma, math.sqrt(s.v))
              s =
                if (s.n == 0L) RateState(x, 0.0, 1L, b.tsMillis)
                else {
                  val d = x - s.ewma
                  RateState(
                    alpha * x + (1 - alpha) * s.ewma,
                    (1 - alpha) * (s.v + alpha * d * d),
                    s.n + 1, b.tsMillis)
                }
            } // else: out-of-order bucket below the high-water mark — dropped
          }
          state.update(s)
          out.result().iterator
      }
  }

  val RequiredOutputMode: OutputMode = OutputMode.Append()
}
