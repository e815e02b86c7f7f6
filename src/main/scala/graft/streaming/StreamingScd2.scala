package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live SCD2 interval maintenance over a change stream — the streaming
  * companion to the batch `scd2_history` query (SURVEY §2 A19q): a CDC
  * feed of (key, value, ts) updates becomes an append-only table of
  * CLOSED validity intervals, maintained incrementally instead of
  * re-deriving the whole history per batch.
  *
  * Semantics: a key's value change at time t closes the previous
  * interval as `[valid_from, t)` and opens a new one at t; an update
  * carrying the UNCHANGED value is a no-op (CDC feeds routinely re-send
  * rows — they must not fragment the history). Only CLOSED intervals
  * are emitted (append-friendly: a closed interval is immutable, so
  * the output composes with idempotent batch-keyed sinks); each key's
  * OPEN interval is exactly its state — one (value, valid_from) pair
  * per key, so state scales with |keys|, not |updates|, the property
  * that makes this safe on an unbounded stream. Late (out-of-order)
  * updates within a batch are applied in event-time order; an update
  * AT OR older than the key's open interval's start is dropped (the
  * batch oracle orders globally; the stream's contract is per-batch
  * ordering — the spec pins this). Dropping the same-instant case is
  * deliberate: accepting it would emit a zero-length interval `[t, t)`
  * (no instant at which the closed value was valid — noise downstream
  * consumers must special-case), and same-timestamp changes carry no
  * order a distributed CDC feed can honor anyway. Within one batch,
  * same-timestamp changes are folded in (ts, value) order, so the
  * SMALLEST value at a tied timestamp wins the open interval —
  * deterministic across replays, which the raw feed arrival order is
  * not (the spec pins both behaviors).
  */
object StreamingScd2 {

  final case class Change(key: String, value: String, tsMillis: Long)
  final case class OpenInterval(value: String, fromMillis: Long)
  final case class ClosedInterval(
      key: String, value: String, fromMillis: Long, toMillis: Long)

  /** Append-mode closed-interval stream; open intervals live in state. */
  def closedIntervals(changes: Dataset[Change]): Dataset[ClosedInterval] = {
    implicit val stateEnc = Encoders.product[OpenInterval]
    implicit val outEnc = Encoders.product[ClosedInterval]
    implicit val keyEnc = Encoders.STRING
    changes
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[Change], state: GroupState[OpenInterval]) =>
          val sorted = it.toSeq.sortBy(c => (c.tsMillis, c.value))
          val closed = Seq.newBuilder[ClosedInterval]
          var open = state.getOption
          sorted.foreach { c =>
            open match {
              case None =>
                open = Some(OpenInterval(c.value, c.tsMillis))
              // `<=`: same-instant changes are stale too — a zero-length
              // [t, t) interval would otherwise emit (see scaladoc)
              case Some(o) if c.tsMillis <= o.fromMillis => // stale update
              case Some(o) if c.value != o.value =>
                closed += ClosedInterval(key, o.value, o.fromMillis, c.tsMillis)
                open = Some(OpenInterval(c.value, c.tsMillis))
              case Some(_) => // unchanged value re-sent: no-op
            }
          }
          open.foreach(state.update)
          closed.result().iterator
      }
  }

  val RequiredOutputMode: OutputMode = OutputMode.Append()
}
