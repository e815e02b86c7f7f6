package graft

import org.apache.spark.sql.DataFrame

/** Materialize-once intermediate stores (signature stores, bucketed
  * vector stores, iterative frontiers).
  *
  * Default: `localCheckpoint` — blocks live on executors, the
  * ContextCleaner reclaims them on GC, and nothing touches a
  * filesystem. The right call for the bench and for healthy clusters,
  * but local checkpoint blocks DIE WITH THEIR EXECUTOR: on a
  * 1000-executor run a single lost container forces a job restart
  * because the truncated lineage cannot recompute.
  *
  * Setting `spark.graft.store.path` (any Hadoop-accessible URI —
  * HDFS, S3A, a fast local SSD array) switches every store in the
  * engine to reliable materialization: the relation is written to
  * parquet under a unique subdirectory and read back, so lineage
  * bottoms out in replayable storage and executor loss costs a task
  * retry, not a job. The price is one distributed write per store —
  * pay it on long multi-tenant runs, skip it locally. Results are
  * identical either way (spec-asserted); store directories are
  * left under the path for the caller's retention policy to sweep
  * (they are plain parquet, dated by mtime).
  */
object Store {

  val PathConf = "spark.graft.store.path"

  private val counter = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Cut the plan here, computing the subtree at most once.
    *
    * @param eager materialize now (default) or on first downstream
    *              action (`false` — only meaningful for the default
    *              localCheckpoint route; the reliable route always
    *              writes immediately, which is semantically identical
    *              and at worst early by one action).
    */
  def materialize(df: DataFrame, eager: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(PathConf) match {
      case Some(root) if root.nonEmpty =>
        val dir = s"$root/store-${java.lang.System.identityHashCode(df)}-${counter.incrementAndGet()}"
        df.write.parquet(dir)
        spark.read.parquet(dir)
      case _ => df.localCheckpoint(eager)
    }
  }

  /** Postfix syntax so call sites read like the `localCheckpoint` they
    * replace: `relation.materializeOnce()`.
    */
  implicit class Materializable(private val df: DataFrame) extends AnyVal {
    def materializeOnce(eager: Boolean = true): DataFrame = materialize(df, eager)
  }
}
