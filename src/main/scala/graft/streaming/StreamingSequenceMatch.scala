package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ordered-subsequence matching — the live form of the
  * batch `sequence_match` query (SURVEY §2 A17e): an alert THE MOMENT
  * a key's event stream completes an ordered chain ("view → click →
  * purchase just happened"), vs the batch form's retrospective
  * booleans.
  *
  * The batch operator matches an arbitrary regex against the key's
  * full encoded history — state the stream must not keep (it grows
  * with the key's event count). The stream therefore supports the
  * ORDERED-CHAIN subset `(?1).*(?2).*…` — exactly the common
  * ClickHouse `sequenceMatch` usage — where matching needs only an
  * NFA cursor: per pattern, the index of the next awaited code.
  * State per key = one int per pattern + the high-water mark,
  * independent of event volume. A completed pattern latches (fires
  * once, stays done); `reset` is a new key.
  *
  * Ordering contract (the [[StreamingFunnel]] rule): events fold in
  * (event-time, event-id) order within a batch; an event at or below
  * the key's high-water mark from PREVIOUS batches is dropped, not
  * folded — cursor advancement is order-sensitive. On an in-order
  * stream the completed set equals the batch operator's chain
  * verdicts on the same events (spec-asserted).
  */
object StreamingSequenceMatch {

  final case class CodedEvent(key: String, tsMicros: Long, eventId: Long, code: String)
  final case class SeqState(cursors: Seq[Int], maxTs: Long, maxId: Long)
  final case class ChainMatch(key: String, tsMicros: Long, pattern: String)

  /** Append-mode match stream: one [[ChainMatch]] per key per pattern,
    * emitted when the chain (a string of single-char codes, e.g.
    * "vcp") first completes.
    */
  def matches(
      events: Dataset[CodedEvent],
      patterns: Seq[String]): Dataset[ChainMatch] = {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty), "need non-empty chains")
    implicit val stateEnc = Encoders.product[SeqState]
    implicit val outEnc = Encoders.product[ChainMatch]
    implicit val keyEnc = Encoders.STRING
    val chains = patterns.toIndexedSeq
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[CodedEvent], state: GroupState[SeqState]) =>
          val s = state.getOption.getOrElse(
            SeqState(Seq.fill(chains.size)(0), Long.MinValue, Long.MinValue))
          val (next, out) = foldKey(key, s, chains, it)
          state.update(next)
          out.iterator
      }
  }

  /** One key's batch fold, extracted so the state-validation contract
    * is unit-testable without a checkpoint-restart harness: advance
    * each chain's NFA cursor over the fresh in-order events, emitting
    * a [[ChainMatch]] the moment a chain first completes.
    */
  private[graft] def foldKey(
      key: String,
      s: SeqState,
      chains: IndexedSeq[String],
      it: Iterator[CodedEvent]): (SeqState, Seq[ChainMatch]) = {
    // cursors are POSITIONAL against the configured patterns: a
    // checkpoint restored under a different pattern list would
    // misalign or over-index them — fail fast instead of corrupting
    // matches (changing the chain set requires a fresh checkpoint)
    require(s.cursors.size == chains.size,
      s"restored state for key '$key' has ${s.cursors.size} cursors but " +
        s"${chains.size} patterns were configured — the chain list changed " +
        "across a checkpoint restart; start from a fresh checkpoint")
    val cur = s.cursors.toArray
    var maxTs = s.maxTs
    var maxId = s.maxId
    val out = Seq.newBuilder[ChainMatch]
    it.toSeq
      .filter(e => e.tsMicros > s.maxTs ||
        (e.tsMicros == s.maxTs && e.eventId > s.maxId))
      .sortBy(e => (e.tsMicros, e.eventId))
      .foreach { e =>
        if (e.code.length == 1) {
          val c = e.code.charAt(0)
          var p = 0
          while (p < chains.size) {
            if (cur(p) < chains(p).length && chains(p).charAt(cur(p)) == c) {
              cur(p) += 1
              if (cur(p) == chains(p).length)
                out += ChainMatch(key, e.tsMicros, chains(p))
            }
            p += 1
          }
        }
        maxTs = e.tsMicros
        maxId = e.eventId
      }
    (SeqState(cur.toIndexedSeq, maxTs, maxId), out.result())
  }

  val RequiredOutputMode: OutputMode = OutputMode.Append()
}
