package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Dead-source detection (heartbeat loss) — the "this tailer went
  * silent" alert. The reference's Manager restarts workers it finds
  * dead (Manager.php:96-118 process supervision); this operator is the
  * detection SIGNAL for the same condition expressed over the data
  * stream itself: every source carries last-seen state, and when the
  * EVENT-TIME watermark passes `last_seen + gap` with no newer beat,
  * the state times out and one silence alert is emitted.
  *
  * `GroupStateTimeout.EventTimeTimeout` is the load-bearing choice:
  * the alert fires from watermark advance — pure data flow — so the
  * operator is deterministic under replay and in tests (a
  * processing-time timeout would couple alerts to wall-clock
  * scheduling). The corollary, documented rather than hidden: a fully
  * idle TOPOLOGY emits nothing, because the watermark only advances
  * when some source still beats — silence of everything is the
  * upstream scheduler's liveness problem (the reference's Manager
  * loop), silence of one source among live ones is this operator's.
  *
  * State per source is one long (last-seen millis); a timed-out
  * source's state is removed, so a source that resumes beating starts
  * a fresh watch and can alert again on its next silence.
  *
  * Late-row edge (spec-pinned): a beat at or behind the current
  * watermark is dropped by the pre-state late filter and never reaches
  * the operator — including rows at the INITIAL watermark of 0, so
  * epoch-0 timestamps silently vanish. Real feeds sit far from the
  * epoch; tests must too.
  */
object StreamingHeartbeat {

  final case class Beat(source: String, tsMillis: Long)
  /** Internal row shape after the watermark column is attached (public:
    * Catalyst's generated deserializer must reach the constructor).
    */
  final case class WmBeat(source: String, tsMillis: Long, eventTime: java.sql.Timestamp)
  final case class HeartState(lastSeen: Long)
  final case class SilenceAlert(source: String, lastSeenMillis: Long)

  val RequiredOutputMode: OutputMode = OutputMode.Append()

  /** Append-mode alert stream: one [[SilenceAlert]] per source whose
    * beats stopped `gapMillis` of event time ago (by the watermark).
    */
  def alerts(beats: Dataset[Beat], gapMillis: Long): Dataset[SilenceAlert] = {
    implicit val wmEnc = Encoders.product[WmBeat]
    implicit val stateEnc = Encoders.product[HeartState]
    implicit val outEnc = Encoders.product[SilenceAlert]
    implicit val keyEnc = Encoders.STRING
    beats.toDF()
      .withColumn("eventTime", timestamp_millis(col("tsMillis")))
      .withWatermark("eventTime", "0 seconds")
      .as[WmBeat]
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (source: String, it: Iterator[WmBeat], state: GroupState[HeartState]) =>
          if (state.hasTimedOut) {
            val lastSeen = state.get.lastSeen
            state.remove()
            Iterator.single(SilenceAlert(source, lastSeen))
          } else {
            val lastSeen = (it.map(_.tsMillis) ++ state.getOption.map(_.lastSeen).iterator).max
            state.update(HeartState(lastSeen))
            state.setTimeoutTimestamp(lastSeen + gapMillis)
            Iterator.empty
          }
      }
  }
}
