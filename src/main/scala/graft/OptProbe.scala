package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (guide §1): for each named
  * registry query, dump `explain("formatted")` to
  * `plans/<tag>/<query>_<suffix>.txt` and time the noop-sink write
  * (the same timed action as [[Bench]]) over a few runs, printing
  * per-query medians. Usage:
  *
  *   runMain graft.OptProbe <sfDir> <suffix> <query>[,<query>...] [tag]
  *
  * `suffix` is `before` / `after` (the plan-file naming the
  * optimization deliverable requires); plans land under
  * `plans/<tag>/` (4th arg, default `r17` — round-16 ADVICE: the tag
  * was hardcoded). This is a measurement tool only — it runs the same
  * registry functions Bench does, with the same session shape.
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val tag = if (args.length > 3) args(3) else "r17"
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROBE_RUNS", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables(spark, sfDir, "lineitem").count()
    spark.range(1000).selectExpr("sum(id)").collect()

    val outDir = Paths.get(s"plans/$tag")
    Files.createDirectories(outDir)
    // Write-side plan capture (round-17, VERDICT item 2): store-backed
    // queries run WRITE commands during DataFrame construction
    // (sink_roundtrip's MergeTreeSink.write), and their executed plans —
    // where the dynamic-partition writer would inject its re-sort —
    // never appear in the returned frame's explain. A listener captures
    // every command execution that fires while fn() builds, dumped as
    // <query>_<suffix>_write<i>.txt.
    val cmdPlans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit =
        if (funcName == "save" || funcName == "command")
          { cmdPlans.add(qe.explainString(org.apache.spark.sql.execution.FormattedMode)); () }
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    })
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      cmdPlans.clear()
      val built = fn(spark, sfDir)
      // the execution listener fires asynchronously — wait for the
      // queue to go quiet (bounded; plan capture is dev tooling)
      var stable = 0
      var last = cmdPlans.size
      var waits = 0
      while (stable < 3 && waits < 60) {
        Thread.sleep(50)
        waits += 1
        if (cmdPlans.size == last) stable += 1 else { stable = 0; last = cmdPlans.size }
      }
      var wi = 0
      cmdPlans.forEach { p =>
        Files.write(outDir.resolve(s"${name}_${suffix}_write$wi.txt"), p.getBytes("UTF-8"))
        wi += 1
      }
      val plan = built.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(outDir.resolve(s"${name}_$suffix.txt"), plan.getBytes("UTF-8"))
      val times = (1 to runs).map { i =>
        spark.sparkContext.setJobDescription(s"$name run$i")
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        s
      }
      if (times.isEmpty) println(s"PROBE $name plan-only")
      else {
        val med = times.sorted.apply(times.length / 2)
        println(f"PROBE $name%-28s median=$med%7.3f s  runs=${times.map(t => f"$t%.3f").mkString(",")}")
      }
    }
    spark.stop()
  }
}
