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
                    batchKey: String): Unit = {
    import spark.implicits._
    val df = rows.toDF("created_at", "name", "event", "detail")
      .select(
        col("created_at").as("created_at"),
        lit("manager").as("logger"),
        // a restart means a worker died or rolled over underneath us —
        // that is the row an alerting query keys on
        when(col("event").startsWith("restarted"), lit("WARNING"))
          .otherwise(lit("INFO")).as("level"),
        concat(lit("worker "), col("event")).as("message"),
        to_json(struct(col("name").as("source"), col("detail"))).as("context"),
        lit("[]").as("extra"),
        lit(repo).as("repo"),
        col("name"),
        lit(host).as("host"))
    sink.writeBatch(df, batchKey)
  }

  /** The full supervision history (canonical log schema + event_date
    * partition column) — feed it to any registry operator.
    */
  def read(spark: SparkSession): DataFrame = sink.read(spark)
}
