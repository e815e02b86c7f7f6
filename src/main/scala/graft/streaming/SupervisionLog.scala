package graft.streaming

import java.time.LocalDateTime

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sinks.MergeTreeSink

/** Persisted, queryable supervision-event stream — the reference
  * Manager logs its own operational events (worker dead / started /
  * killed) to dated log files (ToolsTraits.php:29-37, the `log()`
  * every Manager.php:64,92 supervision branch calls); an operator
  * debugging "why did ingest stop at 3am" greps those files. Here the
  * manager's history is first-class data instead: events are rows in
  * the SAME canonical log schema the data path produces
  * (`created_at, logger, level, message, context, extra, repo, name,
  * host` — MonologParser.parse), stored through a [[MergeTreeSink]],
  * so supervision history is date-partitioned, zone-mapped,
  * TTL-retained, and queryable with every log-analytics operator in
  * the registry (filter by level, counts by day, gap detection, ...).
  *
  * Write granularity mirrors how supervision happens: one idempotent
  * sink batch per supervision PASS (a pass emits a handful of rows —
  * driver-sized by construction: the manager supervises a bounded
  * source list). `logger` is fixed to `"manager"` so supervision rows
  * are separable when a deployment points this at the same root as a
  * data sink; in the default wiring it gets its own root.
  */
final class SupervisionLog(val sink: MergeTreeSink,
                           repo: String = "graft",
                           host: String = "driver") {

  private val seq = new java.util.concurrent.atomic.AtomicLong(0)

  /** One supervision event: `at` event time (LocalDateTime — encodes
    * straight to TIMESTAMP_NTZ, no JVM-default-zone coupling), `source`
    * the tail name, `event` a short machine tag (started /
    * restarted-dead / restarted-rollover / stopped), `detail` free
    * text.
    */
  def record(spark: SparkSession,
             rows: Seq[(LocalDateTime, String, String, String)]): Unit =
    if (rows.nonEmpty) {
      recordWithKey(spark, rows,
        s"sup_${System.currentTimeMillis()}_${seq.incrementAndGet()}")
    }

  /** Same as [[record]] with a caller-chosen batch key — callers that
    * replay a deterministic pass (tests, backfills) pass a stable key
    * and get [[MergeTreeSink.writeBatch]]'s idempotent overwrite.
    */
  def recordWithKey(spark: SparkSession,
                    rows: Seq[(LocalDateTime, String, String, String)],
                    batchKey: String): Unit =
    recordEvents(spark,
      rows.map { case (at, n, e, d) => SupervisionLog.Event(at, n, e, d) }, batchKey)

  /** Full-telemetry write — the [[SupervisionLog.Event]] shape carries
    * the restart counter and applied backoff (reference
    * Manager.php:97-117: the manager's sleeps and per-worker restart
    * bookkeeping around `processTail`), which land as `restarts` /
    * `backoff_ms` fields in the context JSON so the canonical 9-column
    * log schema stays intact; [[history]] surfaces them as typed
    * columns.
    */
  def recordEvents(spark: SparkSession,
                   rows: Seq[SupervisionLog.Event],
                   batchKey: String): Unit = {
    import spark.implicits._
    val df = rows.toDF()
      .select(
        col("at").as("created_at"),
        lit("manager").as("logger"),
        // a restart means a worker died or rolled over underneath us —
        // that is the row an alerting query keys on
        when(col("event").startsWith("restarted"), lit("WARNING"))
          .otherwise(lit("INFO")).as("level"),
        concat(lit("worker "), col("event")).as("message"),
        to_json(struct(col("source"), col("detail"),
          col("restarts"), col("backoffMs").as("backoff_ms"))).as("context"),
        lit("[]").as("extra"),
        lit(repo).as("repo"),
        col("source").as("name"),
        lit(host).as("host"))
    sink.writeBatch(df, batchKey)
  }

  /** The full supervision history (canonical log schema + event_date
    * partition column) — feed it to any registry operator.
    */
  def read(spark: SparkSession): DataFrame = sink.read(spark)

  /** [[read]] with the restart-backoff telemetry surfaced as typed
    * columns: `restarts` (cumulative dead-restarts of the source at
    * the time of the event) and `backoff_ms` (the delay the manager
    * armed before it would restart this source again — 0 for planned
    * starts/rollovers/stops). The alerting query for a crash-looping
    * source is `history.where($"restarts" >= N)` — exactly the
    * counter the reference operator had to grep dated log files for.
    */
  def history(spark: SparkSession): DataFrame =
    read(spark)
      .withColumn("restarts",
        coalesce(get_json_object(col("context"), "$.restarts").cast("int"), lit(0)))
      .withColumn("backoff_ms",
        coalesce(get_json_object(col("context"), "$.backoff_ms").cast("long"), lit(0L)))
}

object SupervisionLog {
  /** One supervision event with restart-backoff telemetry. */
  final case class Event(at: LocalDateTime, source: String, event: String,
                         detail: String, restarts: Int = 0, backoffMs: Long = 0L)
}
