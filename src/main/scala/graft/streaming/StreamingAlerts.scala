package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live alert-transition detection — the streaming form of the batch
  * `alert_transitions` query (SURVEY §2 A15b): per-key hourly
  * (errors, total) buckets become pages only when the alert STATE
  * flips (an 8-hour incident is one page and one resolve, not 8
  * pages — flap suppression is the streaming pager's core behavior).
  *
  * State per key is two numbers — the current alert state and the
  * event-time high-water mark — so state scales with |keys|, never
  * stream history. Buckets inside a batch fold in event-time order;
  * a bucket at or below the high-water mark is DROPPED (the
  * StreamingRateAnomaly discipline: a late regression must not
  * corrupt the carried state or re-page). The threshold compare is
  * integer (`den·errors > num·total`), identical to the batch form —
  * no float in the predicate, so batch and stream agree exactly on
  * every flip.
  */
object StreamingAlerts {

  final case class Bucket(key: String, tsMillis: Long, errors: Long, total: Long)
  final case class AlertState(state: Int, hwmMillis: Long)
  final case class Flip(key: String, tsMillis: Long, state: Int, prevState: Int)

  /** Append-mode flip stream; threshold = errors/total > num/den. */
  def transitions(buckets: Dataset[Bucket], num: Long = 15L, den: Long = 1000L): Dataset[Flip] = {
    implicit val stateEnc = Encoders.product[AlertState]
    implicit val outEnc = Encoders.product[Flip]
    implicit val keyEnc = Encoders.STRING
    buckets
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[Bucket], state: GroupState[AlertState]) =>
          val sorted = it.toSeq.sortBy(_.tsMillis)
          var st = state.getOption.getOrElse(AlertState(0, Long.MinValue))
          val flips = Seq.newBuilder[Flip]
          sorted.foreach { b =>
            if (b.tsMillis > st.hwmMillis) {
              val now = if (den * b.errors > num * b.total) 1 else 0
              if (now != st.state) flips += Flip(key, b.tsMillis, now, st.state)
              st = AlertState(now, b.tsMillis)
            } // at-or-below the high-water mark: late regression, dropped
          }
          state.update(st)
          flips.result().iterator
      }
  }

  val RequiredOutputMode: OutputMode = OutputMode.Append()
}
