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

  def maybeBroadcast(df: DataFrame): DataFrame = {
    val threshold = df.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    // withCachedData = analyzed plan with cache substitution: size
    // estimates see materialized InMemoryRelations (accurate bytes)
    // WITHOUT running the optimizer on the subtree — the enclosing
    // query optimizes it once anyway, so the gate stays O(stats visit)
    // per call instead of a duplicate optimizer pass
    if (threshold > 0 &&
        df.queryExecution.withCachedData.stats.sizeInBytes <= BigInt(threshold))
      broadcast(df)
    else df
  }
}
