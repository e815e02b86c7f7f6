package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming sessionization via `mapGroupsWithState` — the
  * stateful-processing shape for semantics the built-in windowed
  * aggregations can't express (a session has no fixed window: it ends
  * `gapSeconds` after its *last* event, wherever that falls).
  *
  * State per key is three longs, independent of event volume, so state
  * size scales with |keys|, not |events| — the property that makes
  * this safe on an unbounded stream. The batch equivalent (lag-window
  * gap-count) is the oracle-checked `sessionize` query; DedupSpec's
  * streaming sibling asserts the two agree.
  */
object StreamingSessionize {

  final case class KeyedEvent(key: String, tsMillis: Long)
  final case class SessionState(lastTs: Long, sessions: Long)
  final case class SessionCount(key: String, sessions: Long)

  /** Incremental per-key session counts (update-mode output: each batch
    * re-emits the keys it touched with their running totals).
    *
    * Events are processed in event-time order within a batch; an event
    * more than `gapSeconds` after the key's last seen event opens a new
    * session.
    */
  def sessionCounts(events: Dataset[KeyedEvent], gapSeconds: Long): Dataset[SessionCount] = {
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[SessionCount]
    implicit val keyEnc = Encoders.STRING
    events
      .groupByKey(_.key)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[KeyedEvent], state: GroupState[SessionState]) =>
          val sorted = it.toSeq.sortBy(_.tsMillis)
          var (last, sessions) = state.getOption
            .map(s => (s.lastTs, s.sessions))
            .getOrElse((Long.MinValue, 0L))
          sorted.foreach { e =>
            if (last == Long.MinValue || e.tsMillis - last > gapSeconds * 1000L) sessions += 1
            last = math.max(last, e.tsMillis)
          }
          state.update(SessionState(last, sessions))
          SessionCount(key, sessions)
      }
  }

  val RequiredOutputMode: OutputMode = OutputMode.Update()
}
