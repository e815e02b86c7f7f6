package graft.streaming

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.logs.{MonologParser, TailConfig}
import graft.sinks.MergeTreeSink
import graft.sources.DatePath

/** One streaming ingest pipeline per log source — the Spark-native
  * re-expression of the reference's Worker (reference Worker.php:94-129):
  *
  *  - file tailing with partial-line safety (Worker.php:94-117) → the
  *    Structured Streaming `text` file source over an append-only
  *    directory (files appear atomically via rename; the source never
  *    reads a half-written line because files, not appends, are the
  *    ingest unit — the idiomatic Spark shape of "tail");
  *  - breakpoint resume via a line-offset cache file (Worker.php:162-177)
  *    → file-source offsets in the checkpoint WAL; restart resumes
  *    exactly where the last committed batch ended;
  *  - batch buffering with count + time flush triggers
  *    (Worker.php:119-129, max_sent_count / max_sent_wait) →
  *    `maxFilesPerTrigger` + `Trigger.ProcessingTime`;
  *  - regex parse + enrichment + callback (Worker.php:131-148) →
  *    [[MonologParser.parse]] inside `foreachBatch`;
  *  - invalid lines dead-lettered, not dropped (Worker.php:151-156).
  *
  * Delivery semantics: source offsets are exactly-once (checkpoint
  * WAL), the parquet append inside `foreachBatch` is at-least-once on
  * batch retry — same guarantee as the reference, whose offset cache
  * is written only after a successful insert (Worker.php:121-124), so
  * a crash between insert and cache write also re-sends. True
  * exactly-once needs a transactional/idempotent sink (e.g. batch-id
  * keyed overwrite or ClickHouse ReplacingMergeTree downstream).
  */
final case class TailPipeline(
    spark: SparkSession,
    cfg: TailConfig,
    inputPath: String, // may contain the {date} macro
    checkpointDir: String,
    sink: MergeTreeSink,
    deadLetterPath: Option[String] = None,
    maxFilesPerTrigger: Option[Int] = None,
    triggerInterval: String = "1 second") {

  def resolvedInput(asOf: LocalDate): String = DatePath.resolve(inputPath, asOf)

  /** File-source checkpoints are bound to their source path, so a
    * daily-rotated source gets a per-day checkpoint — the exact analog
    * of the reference restarting a rotated worker from index 0 on the
    * new file (Manager.php:77-80).
    */
  private def resolvedCheckpoint(asOf: LocalDate): String =
    if (DatePath.isDaily(inputPath)) s"$checkpointDir/day=$asOf" else checkpointDir

  /** Start the streaming query for the given day's input path. */
  def start(asOf: LocalDate): StreamingQuery = {
    val reader0 = spark.readStream
    val reader = maxFilesPerTrigger.fold(reader0)(n => reader0.option("maxFilesPerTrigger", n.toLong))
    val lines = reader.text(resolvedInput(asOf)).withColumnRenamed("value", "line")
    lines.writeStream
      .queryName(cfg.name)
      .option("checkpointLocation", resolvedCheckpoint(asOf))
      .trigger(Trigger.ProcessingTime(triggerInterval))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = batch.persist()
        try {
          sink.write(MonologParser.parse(b, cfg))
          deadLetterPath.foreach { dl =>
            MonologParser.deadLetter(b, cfg)
              .withColumn("name", org.apache.spark.sql.functions.lit(cfg.name))
              .write.mode("append").parquet(dl)
          }
        } finally { b.unpersist(); () }
      }
      .start()
  }

  /** Graceful shutdown with final flush (reference ToolsTraits.php:48-54
    * signal handling + Worker.php batchWrite-on-stop): drain everything
    * already visible, then stop.
    */
  def stopGracefully(query: StreamingQuery): Unit = {
    query.processAllAvailable()
    query.stop()
    query.awaitTermination()
  }
}
