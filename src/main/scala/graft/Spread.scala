package graft

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-adaptive read parallelism (optimization guide §2.5, "input
  * skew: one huge unsplittable file ... repartition immediately after
  * the read").
  *
  * The driver's corpus tables are single parquet files with ONE row
  * group each, and a row group is the parquet read-parallelism unit —
  * no `maxPartitionBytes`/`openCostInBytes` setting can split it. Every
  * pipeline rooted at such a scan therefore executes its first stage in
  * ONE task: the round-16 stage decomposition measured dedup_cosine's
  * entire 36M-dot-product bucket join in a single 7.8 s task (the
  * broadcast-join probe side inherits the scan's 1-partition layout,
  * so no exchange ever re-parallelizes it) and the LSH signature-store
  * build in a single 2.5 s task, on a 32-core box.
  *
  * `toCores` hash-repartitions on a caller-supplied deterministic key
  * ONLY when the relation's physical plan would execute with fewer
  * partitions than the session's default parallelism — at production
  * scale (thousands of files / row groups) the probe sees a
  * well-partitioned scan and the repartition never plans, so this is
  * not a local-mode constant: it is a no-op exactly when the input
  * layout already feeds every core. Hash partitioning on a stable key
  * keeps the row→partition assignment deterministic under task retry
  * (the guide's SPARK-38388 caveat about `rand()`-derived keys).
  *
  * Callers must only use it where the downstream computation is
  * partitioning-invariant (row-local maps, equi-joins, set-semantics
  * pair generation followed by total-order gates) — NOT above
  * float aggregations whose reduction order the partition layout
  * changes (e.g. Lloyd's centroid means), where a repartition would
  * perturb low-order bits of the result.
  */
object Spread {

  /** Hash-repartition `df` to `defaultParallelism` on `keys` when its
    * plan would otherwise run with fewer than half the session's cores;
    * identity otherwise. The partition probe plans the relation but
    * runs no job (the callers sit directly on scans/projections with no
    * exchange below, so AQE has no stage to materialize).
    *
    * Probe guard (round-16 ADVICE): `toRdd` on a plan with an exchange
    * below would eagerly materialize shuffle stages under AQE at
    * DataFrame-CONSTRUCTION time and read a pre-AQE partition count.
    * The caller contract (scans + row-local projections only) was
    * previously comment-only; now the pre-AQE physical plan is checked
    * first, and a relation that already contains an exchange is
    * returned unchanged — an exchange repartitions to the session's
    * shuffle parallelism anyway, so the spread would be a no-op there,
    * and skipping the probe keeps plan construction job-free.
    */
  def toCores(df: DataFrame, keys: Column*): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val hasExchange = df.queryExecution.sparkPlan.exists {
      case _: org.apache.spark.sql.execution.exchange.Exchange => true
      case _ => false
    }
    if (hasExchange) return df
    val current = df.queryExecution.toRdd.getNumPartitions
    if (current * 2 >= target) df
    else if (keys.nonEmpty) df.repartition(target, keys: _*)
    else df.repartition(target)
  }
}
