package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming funnel — the live form of [[graft.ops.Funnel]]: per-key
  * windowFunnel state carried across microbatches in
  * `flatMapGroupsWithState`, a conversion event emitted THE MOMENT a
  * key first reaches a new funnel level (the "user just converted"
  * signal, vs the batch form's retrospective per-key level).
  *
  * The batch operator is a left fold of the max-start DP over
  * time-sorted events; the stream runs the IDENTICAL fold with the
  * fold state (`reach` array of latest chain starts, O(steps) longs)
  * persisted per key — so on an in-order stream the final streamed
  * level equals the batch level on the same events (spec-asserted).
  *
  * Ordering contract (the [[StreamingRateAnomaly]] rule): events are
  * folded in (event-time, step) order within each batch; an event at
  * or below the key's high-water mark from PREVIOUS batches is
  * DROPPED, not folded — the DP is order-sensitive, and a silent
  * out-of-order fold would corrupt `reach` for every later event.
  * Ties inside one batch are fine (the sort puts the lower step
  * first, exactly like the batch operator).
  *
  * State per key: `steps` longs + one high-water mark — independent
  * of event volume; keys whose funnel is complete stay O(steps) too.
  */
object StreamingFunnel {

  final case class StepEvent(key: String, tsMicros: Long, step: Int)
  final case class FunnelState(reach: Seq[Long], maxTs: Long)
  final case class Conversion(key: String, tsMicros: Long, level: Int)

  /** Append-mode conversion stream: one [[Conversion]] per key per
    * level, emitted when the key FIRST reaches it.
    */
  def conversions(
      events: Dataset[StepEvent],
      steps: Int,
      windowMicros: Long): Dataset[Conversion] = {
    require(steps > 0, "funnel needs at least one step")
    implicit val stateEnc = Encoders.product[FunnelState]
    implicit val outEnc = Encoders.product[Conversion]
    implicit val keyEnc = Encoders.STRING
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[StepEvent], state: GroupState[FunnelState]) =>
          val s = state.getOption.getOrElse(
            FunnelState(Seq.fill(steps)(-1L), Long.MinValue))
          val reach = s.reach.toArray
          var level = reach.count(_ >= 0L)
          var maxTs = s.maxTs
          val prevMax = s.maxTs // high-water: only filters PRIOR batches
          val out = Seq.newBuilder[Conversion]
          it.toSeq
            .filter(_.tsMicros > prevMax)
            .sortBy(e => (e.tsMicros, e.step))
            .foreach { e =>
              if (e.step >= 0 && e.step < steps) {
                if (e.step == 0)
                  reach(0) = math.max(reach(0), e.tsMicros)
                else if (reach(e.step - 1) >= 0L &&
                  e.tsMicros - reach(e.step - 1) <= windowMicros)
                  reach(e.step) = math.max(reach(e.step), reach(e.step - 1))
                val lvl = reach.count(_ >= 0L)
                if (lvl > level) { out += Conversion(key, e.tsMicros, lvl); level = lvl }
                maxTs = math.max(maxTs, e.tsMicros)
              }
            }
          state.update(FunnelState(reach.toIndexedSeq, maxTs))
          out.result().iterator
      }
  }

  val RequiredOutputMode: OutputMode = OutputMode.Append()
}
