package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Size-gated broadcast hint.
  *
  * A forced `broadcast()` on a relation that grows with the corpus
  * (the full customer table, an edge-proportional adjacency) takes the
  * join-strategy decision away from AQE's runtime size check — at the
  * 100 TB brief that is a guaranteed executor-OOM shape even though it
  * is correct and fast at test scale. The gate consults Catalyst's own
  * size estimate for the subtree: under the session's
  * `autoBroadcastJoinThreshold` the hint is attached exactly as
  * before (test-scale plans keep their BroadcastHashJoin), over it the
  * relation is left unhinted so the planner/AQE choose from (runtime)
  * sizes — the same code degrades to a shuffle join when the relation
  * outgrows executors instead of OOMing on a stale assumption.
  *
  * Unconditional `broadcast()` remains correct ONLY for relations
  * whose size is scale-invariant by construction: the fixed dimension
  * tables (nation/region), driver-literal local relations, groupless
  * (≤1-row) aggregates, explicit limits, and per-probe rank-filtered
  * shortlists. SinkAndPlanSpec asserts every shipped plan honors this
  * split.
  *
  * Known conservative bias: without CBO column stats, the analyzed
  * plan's `Filter` nodes inherit their child's sizeInBytes, so a
  * heavily filtered dimension (q3's BUILDING customers) is judged by
  * its pre-filter size and may miss the hint when the unfiltered table
  * sits just over the threshold. That errs in the SAFE direction — the
  * join falls back to AQE, which re-plans a broadcast from the true
  * runtime size — so we deliberately keep the cheap analyzed-plan
  * probe rather than paying a duplicate optimizer pass per call.
  */
object Hints {

  /** The gate itself, exposed so callers can consult the same probe
    * the hint uses (e.g. asserting in specs why a plan did or did not
    * broadcast). NOTE: broadcast-feasibility is a JOIN-STRATEGY
    * predicate only — round 13 tried it as a plan-SHAPE gate for the
    * dedup verify and reverted it (distinct-first verification lost
    * 6× at 20k vectors even with the broadcast available; the true
    * crossover variable there is survivor density, which this probe
    * cannot see).
    */
  def fitsBroadcast(df: DataFrame): Boolean = {
    val threshold = df.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    // withCachedData = analyzed plan with cache substitution: size
    // estimates see materialized InMemoryRelations (accurate bytes)
    // WITHOUT running the optimizer on the subtree — the enclosing
    // query optimizes it once anyway, so the gate stays O(stats visit)
    // per call instead of a duplicate optimizer pass
    threshold > 0 &&
      df.queryExecution.withCachedData.stats.sizeInBytes <= BigInt(threshold)
  }

  def maybeBroadcast(df: DataFrame): DataFrame =
    if (fitsBroadcast(df)) broadcast(df) else df

  /** [[maybeBroadcast]] for relations whose Catalyst size estimate is
    * OPAQUE — a `zipWithIndex` LogicalRDD or a localCheckpoint, whose
    * stats are the unknown default (`spark.sql.defaultSizeInBytes`,
    * Long.MaxValue out of the box; measured empirically — a
    * localCheckpointed aggregate reports 2^63−1 even after
    * materialization, because LogicalRDD carries the ORIGIN plan's
    * stats, not the checkpointed bytes). For those the estimate gate
    * can never fire, but the relation may be genuinely tiny (one row
    * per over-cap group); this helper MEASURES instead of estimating:
    * one `count()` action times the schema's per-row width. Same
    * contract as [[maybeBroadcast]] — a disabled session threshold
    * (`autoBroadcastJoinThreshold <= 0`, the plan guard's probe)
    * suppresses the hint unconditionally, so no shipped plan ever
    * carries a FORCED broadcast on a scale-growing relation; at
    * runtime the hint fires exactly when the measured bytes fit.
    *
    * Callers MUST pass a materialized relation (`Store.materialize`):
    * the count action and the subsequent join would otherwise each
    * recompute the subtree, and an unmaterialized broadcast would
    * recompute it a third time on the driver.
    */
  def maybeBroadcastMeasured(df: DataFrame): DataFrame = {
    val conf = df.sparkSession.sessionState.conf
    val threshold = conf.autoBroadcastJoinThreshold
    if (threshold <= 0) df
    else {
      val est = df.queryExecution.withCachedData.stats.sizeInBytes
      if (est <= BigInt(threshold)) broadcast(df) // real (file-backed) stats: trust them
      else if (est < BigInt(conf.defaultSizeInBytes)) df // genuinely-big estimate: trust it too
      else {
        // opaque stats: measure. Row width from Catalyst's own
        // per-type defaultSize (what the estimator would have used).
        val rowBytes = math.max(16L, df.schema.map(_.dataType.defaultSize.toLong).sum)
        if (df.count() * rowBytes <= threshold) broadcast(df) else df
      }
    }
  }
}
