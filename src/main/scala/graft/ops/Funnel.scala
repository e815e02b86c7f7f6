package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Funnel analysis — the ClickHouse `windowFunnel()` analog (the
  * reference's target system ships it as a core log-analytics
  * aggregate; readme.md:108-125 implies exactly this query surface
  * over event logs).
  *
  * Semantics (matching ClickHouse's default, non-strict ordering):
  * for each key, the funnel level is the largest `k` such that there
  * exist events e1..ek with `type(ei) = steps(i-1)`,
  * `ts(e1) <= ts(e2) <= ... <= ts(ek)`, and
  * `ts(ek) - ts(e1) <= window` — i.e. every step completed within
  * `window` of the FIRST step of the chain, steps in order.
  *
  * Plan shape: one filter to the step types (row-local, pushed to the
  * scan), one `groupBy(key)` partial-agg shuffle collecting only
  * `(epoch_micros, step_idx)` pairs (12 bytes/event, and only events
  * of the funnel's types), then a row-local fold. The fold is the
  * classical windowFunnel dynamic program, O(events * steps) per key:
  *
  *   reach(j) = the LATEST chain-start time over all chains that
  *              reach step j using events processed so far.
  *
  * Scanning events in (ts, step) order: a step-0 event at time t sets
  * `reach(0) = max(reach(0), t)`; a step-s event at time t extends to
  * `reach(s) = max(reach(s), reach(s-1))` iff `reach(s-1)` is set and
  * `t - reach(s-1) <= window`. Keeping the MAX start per level is
  * exactly optimal: any chain reaching s-1 has start <= reach(s-1),
  * so the max start has the most window slack — if it cannot extend,
  * none can (equivalence with the exists-a-chain definition is
  * brute-force spec-tested). The final level is the count of set
  * levels (reach can have no gaps: level s is only ever set from
  * level s-1).
  *
  * The whole fold is Spark built-ins (`aggregate`/`transform` HOFs
  * over a `steps.size`-long state array) — no UDF, no driver loop.
  * Per-key state during the fold is O(steps); the collected event
  * array is bounded by the key's own activity in the step types (the
  * same bound ClickHouse's windowFunnel state carries). At 100 TB the
  * shuffle moves only keys' step events, partially aggregated — the
  * scan dominates.
  */
object Funnel {

  /** Per-key funnel level over `steps`, chain bounded by `windowMicros`.
    * Output: (`keyOut`, funnel_level) — one row per key that has at
    * least one event of any step type; keys whose events never start
    * the funnel (no step-0 event) report level 0.
    */
  def levels(
      events: DataFrame,
      key: Column,
      eventType: Column,
      ts: Column,
      steps: Seq[String],
      windowMicros: Long,
      keyOut: String = "k"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    val k = steps.size
    val stepIdx = steps.zipWithIndex.foldLeft(lit(null).cast("int")) {
      case (acc, (st, i)) => when(eventType === lit(st), lit(i)).otherwise(acc)
    }
    val w = windowMicros
    events
      .select(key.as(keyOut), stepIdx.as("s"), unix_micros(ts.cast("timestamp")).as("t"))
      .where(col("s").isNotNull)
      .groupBy(keyOut)
      .agg(array_sort(collect_list(struct(col("t"), col("s")))).as("evs"))
      .select(
        col(keyOut),
        expr(
          s"""size(filter(
             |  aggregate(
             |    evs,
             |    array_repeat(CAST(-1 AS BIGINT), $k),
             |    (st, e) -> transform(st, (v, i) ->
             |      CASE
             |        WHEN i = e.s AND e.s = 0 THEN greatest(v, e.t)
             |        WHEN i = e.s AND st[e.s - 1] >= 0L AND e.t - st[e.s - 1] <= ${w}L
             |          THEN greatest(v, st[e.s - 1])
             |        ELSE v
             |      END)),
             |  v -> v >= 0L))""".stripMargin).cast("int").as("funnel_level"))
  }

  /** Funnel conversion counts: users per achieved level (including the
    * standard cumulative view — level >= j — left to the caller via a
    * running sum if wanted).
    */
  def conversion(levels: DataFrame): DataFrame =
    levels.groupBy("funnel_level").agg(count(lit(1)).as("keys"))
}
