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
  * plain parquet dated by mtime, and [[Store.sweep]] is the retention
  * pass that reclaims them (age-gated, scoped to this naming scheme).
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
        // applicationId is unique per driver, the counter per store in
        // it — two drivers sharing one root can never collide (write
        // would otherwise abort on SaveMode.ErrorIfExists)
        val dir = s"$root/store-${spark.sparkContext.applicationId}-${counter.incrementAndGet()}"
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

  /** The retention policy for path-backed stores: delete `store-*`
    * directories under `root` whose modification time is older than
    * `olderThanMillis`. Runs through the Hadoop FileSystem (HDFS/S3A
    * work like local paths) and only ever touches directories this
    * object's naming scheme created — a maintenance job can point it
    * at a shared path without risking neighbors. Returns the deleted
    * paths.
    *
    * Stores are consumed within the job that wrote them, so any
    * grace period longer than your longest job is safe; a daily sweep
    * with a 24 h horizon is the typical deployment.
    */
  def sweep(
      spark: org.apache.spark.sql.SparkSession,
      root: String,
      olderThanMillis: Long,
      now: Long = java.lang.System.currentTimeMillis()): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Seq.empty
    else
      fs.listStatus(p).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("store-") &&
          now - st.getModificationTime > olderThanMillis)
        .flatMap { st =>
          if (fs.delete(st.getPath, true)) Some(st.getPath.toString) else None
        }
  }
}
