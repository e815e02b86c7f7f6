package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (guide §1): for each named
  * registry query, dump `explain("formatted")` to
  * `plans/<tag>/<query>_<suffix>.txt` and time the noop-sink write
  * (the same timed action as [[Bench]]) over a few runs, printing
  * per-query medians. Usage:
  *
  *   runMain graft.OptProbe <sfDir> <suffix> <query>[,<query>...]
  *
  * `suffix` is `before` / `after` (the plan-file naming the
  * optimization deliverable requires); plans land under `plans/r16/`.
  * This is a measurement tool only — it runs the same registry
  * functions Bench does, with the same session shape.
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
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

    val outDir = Paths.get("plans/r16")
    Files.createDirectories(outDir)
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val plan = fn(spark, sfDir).queryExecution.explainString(
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
