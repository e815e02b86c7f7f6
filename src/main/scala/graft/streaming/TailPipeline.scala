package graft.streaming

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.logs.{MonologParser, TailConfig}
import graft.sinks.LogSink
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
  * WAL), and the sink write is **idempotent on batch replay** — each
  * micro-batch writes its own `ingest_batch=<id>` directory with
  * Overwrite ([[MergeTreeSink.writeBatch]]), so a crash mid-commit
  * followed by a retry of the same batch id rewrites the same files
  * instead of appending duplicates: exactly-once end to end, verified
  * by StreamingSpec's replay test. (The reference is at-least-once
  * here: its offset cache is written only after a successful insert,
  * Worker.php:121-124, so a crash between insert and cache write
  * re-sends.) Dead-letter output uses the same batch-id-keyed layout.
  */
final case class TailPipeline(
    spark: SparkSession,
    cfg: TailConfig,
    inputPath: String, // may contain the {date} macro
    checkpointDir: String,
    sink: LogSink,
    deadLetterPath: Option[String] = None,
    maxFilesPerTrigger: Option[Int] = None,
    triggerInterval: String = "1 second",
    tailFromEnd: Boolean = false,
    maintainEveryBatches: Option[Int] = None,
    maintainMaxFilesPerDate: Int = 8) {

  def resolvedInput(asOf: LocalDate): String = DatePath.resolve(inputPath, asOf)

  /** File-source checkpoints are bound to their source path, so a
    * daily-rotated source gets a per-day checkpoint — the exact analog
    * of the reference restarting a rotated worker from index 0 on the
    * new file (Manager.php:77-80).
    */
  private def resolvedCheckpoint(asOf: LocalDate): String =
    if (DatePath.isDaily(inputPath)) s"$checkpointDir/day=$asOf" else checkpointDir

  /** Tail-from-end semantics for brand-new sources (reference
    * Worker.php:171-177: a tail with no checkpoint starts at
    * `PHP_INT_MAX`, i.e. the end of the file — adding a source must
    * not re-ingest its 10 GB history). On the FIRST start against this
    * checkpoint (base dir absent), snapshot the paths already present
    * in the input dir to `<checkpointDir>/.graft_initial_files`; those
    * files are excluded from the stream on this and every restart.
    * Day-rollover starts find the base checkpoint present and change
    * nothing — the new day's file is read from offset 0, exactly as
    * the reference re-tails a rotated file from line 0.
    *
    * The excluded files are still listed (and their bytes read once,
    * then dropped by the filter) by the source — the declarative
    * analog of seeking to EOF; correctness-equivalent, with a one-time
    * scan cost on first start.
    */
  private def preexistingPaths(asOf: LocalDate): Seq[String] = {
    import org.apache.hadoop.fs.Path
    val conf = spark.sessionState.newHadoopConf()
    val base = new Path(checkpointDir)
    val fs = base.getFileSystem(conf)
    val snap = new Path(base, ".graft_initial_files")
    if (fs.exists(snap)) {
      val in = fs.open(snap)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().filter(_.nonEmpty).toList
      finally in.close()
    } else if (fs.exists(base)) Seq.empty // established checkpoint: nothing to exclude
    else {
      val dir = new Path(resolvedInput(asOf))
      val dfs = dir.getFileSystem(conf)
      // getRawPath (URI-ENCODED form, space → %20), not getPath: the
      // stream-side comparand is input_file_name(), which is a URI
      // string and keeps its percent-escapes after scheme stripping —
      // a decoded listing would never match an escaped file name and
      // its history would leak into the stream.
      val names =
        if (dfs.exists(dir))
          dfs.listStatus(dir).filter(_.isFile).map(_.getPath.toUri.getRawPath).toSeq
        else Seq.empty
      fs.mkdirs(base)
      val out = fs.create(snap, true)
      try out.write(names.mkString("\n").getBytes("UTF-8")) finally out.close()
      names
    }
  }

  /** Start the streaming query for the given day's input path. */
  def start(asOf: LocalDate): StreamingQuery = {
    val reader0 = spark.readStream
    val reader = maxFilesPerTrigger.fold(reader0)(n => reader0.option("maxFilesPerTrigger", n.toLong))
    val lines0 = reader.text(resolvedInput(asOf)).withColumnRenamed("value", "line")
    val lines = if (!tailFromEnd) lines0 else {
      val excluded = preexistingPaths(asOf)
      if (excluded.isEmpty) lines0
      else {
        import org.apache.spark.sql.functions.{input_file_name, regexp_replace, not}
        // input_file_name is a URI (file:///..., hdfs://host/...);
        // strip scheme+authority to compare against the listing paths.
        // Both sides stay in the URI-encoded representation (the
        // listing snapshots getRawPath), so escaped characters in file
        // names match instead of silently leaking history.
        val filePath = regexp_replace(input_file_name(), "^[a-z][a-z0-9+.-]*://[^/]*", "")
        lines0.where(not(filePath.isin(excluded: _*)))
      }
    }
    lines.writeStream
      .queryName(cfg.name)
      .option("checkpointLocation", resolvedCheckpoint(asOf))
      .trigger(Trigger.ProcessingTime(triggerInterval))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val b = batch.persist()
        try {
          writeMicroBatch(b, batchId, asOf)
        } finally { b.unpersist(); () }
      }
      .start()
  }

  /** The foreachBatch body, exposed for StreamingSpec's replay test:
    * calling it twice with the same batch id must leave the sink
    * byte-identical (idempotence = the exactly-once half the
    * checkpoint WAL can't provide on its own).
    *
    * The batch key namespaces the output directory by source name (so
    * sources sharing a sink root can't collide) and, for daily-rotated
    * sources, by the day — their per-day checkpoints restart batch ids
    * at 0 on rollover, and day 2's batch 0 must not overwrite day 1's.
    */
  def writeMicroBatch(batch: DataFrame, batchId: Long, asOf: LocalDate): Unit = {
    val batchKey =
      if (DatePath.isDaily(inputPath)) s"${cfg.name}_${asOf}_$batchId"
      else s"${cfg.name}_$batchId"
    sink.writeBatch(MonologParser.parse(batch, cfg), batchKey)
    deadLetterPath.foreach { dl =>
      MonologParser.deadLetter(batch, cfg)
        .withColumn("name", org.apache.spark.sql.functions.lit(cfg.name))
        .write.mode("overwrite").parquet(s"$dl/ingest_batch=$batchKey")
    }
    // continuous background merging (the ClickHouse MergeTree behavior
    // the batch-dir layout otherwise defers to an external scheduler):
    // every Nth batch runs one maintenance policy pass INSIDE the
    // foreachBatch hook, so it cannot race the next batch's write —
    // micro-batch latency absorbs the compaction instead of a separate
    // job coordinating against live writers. Maintenance is itself
    // crash-safe (aside-swap), so a retry of this batch just re-runs a
    // cheaper pass (already-compacted dates are under threshold).
    //
    // The CURRENT batch is excluded from compaction: this hook runs
    // after the batch's write but BEFORE its checkpoint commit, so the
    // batch is still replayable — compacting its dir now and replaying
    // it later would leave its rows in both `ingest_batch=compacted`
    // and the rewritten `ingest_batch=<key>` (the sink's in-flight-
    // horizon contract, MergeTreeSink.compact). foreachBatch serializes
    // batches, so every EARLIER batch is already committed and safe to
    // fold. The skipped dir simply compacts on a later pass.
    for (every <- maintainEveryBatches) {
      sink match {
        case mt: graft.sinks.MergeTreeSink if every > 0 && batchId > 0 && batchId % every == 0 =>
          mt.maintain(spark, asOf, maintainMaxFilesPerDate,
            excludeBatchKeys = Set(batchKey)); ()
        case _ => ()
      }
    }
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
