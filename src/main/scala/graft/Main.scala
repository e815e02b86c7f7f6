package graft

import java.time.{Clock, LocalDate}

import org.apache.spark.sql.SparkSession

import graft.logs.ConfigLoader
import graft.streaming.TailManager

/** The operator launcher — graft's analog of the reference's two-line
  * deployment (readme.md:33-47: write `manager.php` holding the config
  * array, run `php manager.php`). Here the config is the JSON file
  * [[graft.logs.ConfigLoader]] documents, and the deployment is:
  *
  * {{{
  * spark-submit --class graft.Main graft.jar /etc/graft/engine.json
  * }}}
  *
  * What it runs, forever, until the JVM is told to die:
  *
  *  1. `ConfigLoader.load` — parse the config (read through the Hadoop
  *     FileSystem, so it deploys from HDFS/S3 alongside the data);
  *  2. `ConfigLoader.manager` — one [[TailManager]] over every
  *     configured tail (each tail a StreamingQuery in this session);
  *  3. `registerShutdownHook` — SIGTERM/SIGINT drain + final flush
  *     (the reference's ToolsTraits.php:48-54 handlers);
  *  4. the supervision loop — `superviseOnce` starts everything on the
  *     first pass, then every poll: restart dead queries, roll
  *     `{date}`-templated sources onto the new day's path
  *     (Manager.php:57-117). `awaitAnyTermination` is the sleep, so a
  *     dying query wakes the supervisor early — but passes are paced
  *     at a MINIMUM of the poll interval, so a query that dies the
  *     instant it starts cannot spin the loop into a restart storm
  *     (the reference Manager's fixed sleep gives the same bound).
  *     A pass that itself throws (rollover onto a path that does not
  *     exist yet, a transient FS error) logs and retries next pass —
  *     the supervisor never dies with a worker.
  *
  * The session comes from `SparkSession.builder.getOrCreate`, so
  * cluster deployments keep every `--conf`/`--master` they were
  * submitted with; bare local runs (no master set) fall back to
  * `local[*]`.
  */
object Main {

  /** Poll cadence between supervision passes when the config does not
    * carry `supervise_poll_secs` (the reference Manager sleeps 10 s,
    * Manager.php:57).
    */
  val DefaultPollSecs = 10L

  def main(args: Array[String]): Unit = {
    if (args.length != 1) {
      System.err.println("usage: graft.Main <config.json> (see graft.logs.ConfigLoader for the schema)")
      sys.exit(2)
    }
    // spark-submit supplies spark.master; a bare `java -cp ... graft.Main`
    // run gets the documented local[*] fallback instead of an
    // "A master URL must be set" crash
    val builder = SparkSession.builder().appName("graft")
    val spark =
      (if (sys.props.contains("spark.master")) builder else builder.master("local[*]"))
        .getOrCreate()
    val (manager, _, conf) = boot(spark, args(0))
    supervise(spark, manager, conf.pollSecs.getOrElse(DefaultPollSecs), () => true)
  }

  /** Load the config, wire the manager, register the drain-on-kill
    * hook. Separated from [[main]] so StreamingSpec can boot the full
    * engine from a config file without owning the process.
    */
  def boot(spark: SparkSession, configPath: String)
      : (TailManager, TailManager.ShutdownHook, ConfigLoader.EngineConfig) = {
    val conf = ConfigLoader.load(spark, configPath)
    val manager = ConfigLoader.manager(spark, conf)
    (manager, manager.registerShutdownHook(), conf)
  }

  /** The supervision loop. `keepRunning` is the exit valve — `main`
    * passes a constant `true` (only a JVM signal ends a deployment,
    * through the shutdown hook's drain), tests pass a latch.
    */
  def supervise(
      spark: SparkSession,
      manager: TailManager,
      pollSecs: Long,
      keepRunning: () => Boolean,
      clock: Clock = Clock.systemUTC()): Unit = {
    spark.streams.resetTerminated() // don't inherit pre-loop terminations
    var lastPassNanos = 0L
    while (keepRunning()) {
      // pace every pass at >= pollSecs no matter why the previous one
      // woke: an instantly-dying query otherwise turns the
      // wake-on-termination feature into a hot restart loop
      val sinceMs = (java.lang.System.nanoTime() - lastPassNanos) / 1000000L
      // Treat thread interruption as an orderly shutdown signal: exit
      // the loop (restoring the flag for the caller) instead of letting
      // InterruptedException kill the supervisor outside the
      // 'will retry' logging paths.
      try {
        if (lastPassNanos != 0L && sinceMs < pollSecs * 1000L)
          Thread.sleep(pollSecs * 1000L - sinceMs)
      } catch {
        case _: InterruptedException =>
          Thread.currentThread().interrupt()
          return
      }
      lastPassNanos = java.lang.System.nanoTime()
      // a failed pass must not kill the supervisor — the whole point
      // of the loop is that the restart is the remedy (Manager.php:
      // 63-66 restarts dead workers, it does not die with them)
      try manager.superviseOnce(LocalDate.now(clock))
      catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[graft] supervision pass failed (will retry): $e")
      }
      // sleep-with-ears: returns early iff some query terminated (the
      // next pass restarts it and logs restarted-dead). A query that
      // died WITH an exception rethrows it here — log and keep going.
      try {
        if (spark.streams.awaitAnyTermination(pollSecs * 1000L))
          spark.streams.resetTerminated()
      } catch {
        case e: org.apache.spark.sql.streaming.StreamingQueryException =>
          System.err.println(s"[graft] query died (will restart): ${e.getMessage}")
          spark.streams.resetTerminated()
        case _: InterruptedException => // same orderly-shutdown contract
          Thread.currentThread().interrupt()
          return
      }
    }
  }
}
