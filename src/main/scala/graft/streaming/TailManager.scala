package graft.streaming

import java.time.LocalDate

import scala.collection.mutable

import org.apache.spark.sql.streaming.StreamingQuery

/** Multi-source supervision — the Spark-native Manager (reference
  * Manager.php:57-117). Where the reference runs one OS process per
  * tail and polls with `posix_kill($pid, 0)`, here every source is a
  * `StreamingQuery` inside one SparkSession (Spark schedules them
  * concurrently); [[superviseOnce]] is the manager loop body:
  *
  *  - dead query → restart (Manager.php:63-66 worker-dead check);
  *  - `{date}`-templated sources whose day changed → graceful stop and
  *    restart on the new day's path (Manager.php:72-89 rollover, with
  *    the same start-from-0 semantics: the new path gets a fresh file
  *    listing while the checkpoint keeps already-read files);
  *  - not yet started → start.
  */
final class TailManager(pipelines: Seq[TailPipeline],
                        supervisionLog: Option[SupervisionLog] = None) {

  private val queries = mutable.Map.empty[String, StreamingQuery]
  private val startedDay = mutable.Map.empty[String, LocalDate]
  // restart-backoff bookkeeping (reference Manager.php:97-117: the
  // manager's sleeps + per-worker counters around processTail):
  // cumulative dead-restarts, the CONSECUTIVE streak (reset by any
  // pass that observes the query alive), and the earliest time a
  // crash-looping source may restart again
  private val restarts = mutable.Map.empty[String, Int]
  private val deadStreak = mutable.Map.empty[String, Int]
  private val notBefore = mutable.Map.empty[String, Long]
  // dead sources whose restart a backoff gate deferred: they left
  // `queries` when observed dead, so later passes need this to keep
  // treating the eventual restart as restarted-dead, not a fresh start
  private val pendingDead = mutable.Set.empty[String]

  def activeQueries: Map[String, StreamingQuery] = queries.toMap

  private val passSeq = new java.util.concurrent.atomic.AtomicLong(0)

  private def logEvents(rows: Seq[SupervisionLog.Event]): Unit =
    if (rows.nonEmpty) supervisionLog.foreach { log =>
      pipelines.headOption.foreach { p =>
        log.recordEvents(p.spark, rows,
          s"sup_${System.currentTimeMillis()}_${passSeq.incrementAndGet()}")
      }
    }

  /** One supervision pass; returns the names (re)started. Each action
    * is recorded to the supervision log (when wired) as ONE batch per
    * pass — started / restarted-dead / restarted-rollover, the exact
    * event set the reference Manager writes to its dated log files
    * (Manager.php:64,92 via ToolsTraits.php:29-37) — plus the
    * restart-backoff telemetry the reference keeps implicitly (its
    * 10 s sleep between passes IS its backoff): a source restarted
    * dead arms an exponential gate ([[TailManager.backoffMillis]] —
    * 10 s doubling to 5 min per consecutive crash), and until the
    * gate expires later passes leave it down rather than hot-looping
    * a crashing source; the armed delay and the cumulative restart
    * count ride every event row (`SupervisionLog.history`'s
    * `restarts` / `backoff_ms` columns). A pass that sees the query
    * healthy resets the streak, not the cumulative counter. Passes
    * that DEFER a gated source emit an INFO `deferred` row carrying
    * the remaining backoff (not in the returned names), so the log
    * never goes dark while a source is intentionally down.
    *
    * `nowMillis` is injectable for deterministic tests; production
    * callers use the default clock.
    */
  def superviseOnce(today: LocalDate,
                    nowMillis: Long = System.currentTimeMillis()): Seq[String] = {
    val actions = pipelines.flatMap { p =>
      val name = p.cfg.name
      val dead = queries.get(name).exists(!_.isActive)
      val rolled = graft.sources.DatePath.isDaily(p.inputPath) && startedDay.get(name).exists(_ != today)
      queries.get(name) match {
        case Some(q) if rolled && q.isActive => p.stopGracefully(q); queries.remove(name)
        case _ if dead => queries.remove(name); pendingDead += name
        case Some(q) if q.isActive => deadStreak.remove(name) // healthy pass: streak over
        case _ => ()
      }
      val wasDead = pendingDead.contains(name)
      if (queries.contains(name)) None
      else if (wasDead && nowMillis < notBefore.getOrElse(name, 0L)) {
        // crash-looping source inside its backoff window: stays down,
        // but NOT silently — each deferring pass records the REMAINING
        // backoff so history() distinguishes "intentionally gated
        // down" from "healthy and quiet" during an up-to-5-minute gap
        // between restarted-dead rows (round-15 ADVICE). INFO-level
        // (only `restarted*` events map to WARNING), bounded by the
        // pass cadence.
        Some(SupervisionLog.Event(
          java.time.LocalDateTime.now(java.time.ZoneOffset.UTC),
          name, "deferred", s"day=$today",
          restarts.getOrElse(name, 0), notBefore(name) - nowMillis))
      } else {
        queries(name) = p.start(today)
        startedDay(name) = today
        val (event, backoff) =
          if (wasDead) {
            pendingDead -= name
            val streak = deadStreak.getOrElse(name, 0) + 1
            deadStreak(name) = streak
            restarts(name) = restarts.getOrElse(name, 0) + 1
            val b = TailManager.backoffMillis(streak)
            notBefore(name) = nowMillis + b
            ("restarted-dead", b)
          } else if (rolled) ("restarted-rollover", 0L)
          else ("started", 0L)
        Some(SupervisionLog.Event(
          java.time.LocalDateTime.now(java.time.ZoneOffset.UTC),
          name, event, s"day=$today", restarts.getOrElse(name, 0), backoff))
      }
    }
    logEvents(actions)
    // deferred rows are telemetry, not (re)starts — callers key on the
    // returned names to detect restarts, so gated-down sources stay out
    actions.filter(_.event != "deferred").map(_.source)
  }

  /** Graceful shutdown of every source with final flush (reference
    * Manager.php stopProcess + ToolsTraits.php:48-54).
    */
  def shutdown(): Unit = {
    val stopped = pipelines.flatMap { p =>
      queries.get(p.cfg.name).filter(_.isActive).map { q =>
        p.stopGracefully(q)
        SupervisionLog.Event(
          java.time.LocalDateTime.now(java.time.ZoneOffset.UTC),
          p.cfg.name, "stopped", "graceful shutdown",
          restarts.getOrElse(p.cfg.name, 0), 0L)
      }
    }
    queries.clear()
    logEvents(stopped)
  }

  /** Wire [[shutdown]] to JVM termination — the analog of the
    * reference's SIGTERM/SIGINT handlers (ToolsTraits.php:48-54,
    * installed from Worker.php:84): a `kill` on the driver drains and
    * flushes every source instead of dropping the in-flight batch.
    *
    * Registered through Hadoop's ShutdownHookManager (which Spark
    * itself uses), NOT `scala.sys.addShutdownHook`: plain JVM hooks
    * run concurrently with Spark's teardown, so the drain could race
    * SparkContext.stop and lose the in-flight batch anyway. Hadoop
    * runs hooks in descending priority order and Spark's entire hook
    * set (context stop included) runs inside one Hadoop-registered
    * hook at priority `FileSystem.SHUTDOWN_HOOK_PRIORITY + 30` = 40,
    * so [[TailManager.ShutdownPriority]] = 60 guarantees the drain
    * completes before the context starts tearing down.
    *
    * Registered with an explicit per-hook timeout
    * ([[TailManager.ShutdownTimeout]]): the 2-arg overload applies
    * `hadoop.service.shutdown.timeout` (30 s default, 10 s on older
    * Hadoop), and a drain over a backed-up source — `stopGracefully`
    * calls `processAllAvailable` per query — can legitimately exceed
    * that, in which case the hook thread is interrupted mid-flush and
    * the in-flight batch is lost, the exact failure this hook exists
    * to prevent. 10 minutes bounds a wedged drain (the JVM must still
    * die eventually under orchestration kill policies) while covering
    * any realistic final flush.
    *
    * Returns the hook so callers can `remove()` it after an orderly
    * stop (StreamingSpec runs the hook body directly).
    */
  def registerShutdownHook(): TailManager.ShutdownHook = {
    val hook = new TailManager.ShutdownHook(() => shutdown())
    org.apache.hadoop.util.ShutdownHookManager.get()
      .addShutdownHook(hook, TailManager.ShutdownPriority,
        TailManager.ShutdownTimeout, java.util.concurrent.TimeUnit.SECONDS)
    hook
  }
}

object TailManager {

  /** Base and cap of the dead-restart backoff: 10 s (the reference
    * manager's fixed inter-pass sleep, Manager.php:35) doubling per
    * consecutive crash to 5 minutes — a crash-looping source ends up
    * probed at dashboard cadence instead of restart-spamming the
    * cluster, while one isolated death still restarts on the very
    * next pass (the gate is armed AFTER the restart).
    */
  val BaseBackoffMs: Long = 10000L
  val MaxBackoffMs: Long = 300000L

  /** Exponential backoff for the `streak`-th consecutive dead restart. */
  def backoffMillis(streak: Int): Long = {
    val shift = math.min(streak - 1, 30)
    math.min(BaseBackoffMs << shift, MaxBackoffMs)
  }

  /** Above Spark's single Hadoop-registered hook (priority 40) so the
    * drain strictly precedes context teardown on SIGTERM.
    */
  val ShutdownPriority = 60

  /** Explicit drain budget in seconds (see [[TailManager#registerShutdownHook]]):
    * generous enough for a full `processAllAvailable` over a backed-up
    * source, finite so a wedged query cannot block JVM death forever.
    */
  val ShutdownTimeout = 600L

  /** Handle for a registered drain hook: `run()` is what the JVM
    * executes on termination, `remove()` deregisters it after an
    * orderly stop.
    */
  final class ShutdownHook(body: () => Unit) extends Runnable {
    override def run(): Unit = body()
    def remove(): Boolean =
      org.apache.hadoop.util.ShutdownHookManager.get().removeShutdownHook(this)
  }
}
