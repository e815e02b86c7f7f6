package graft.sinks

import java.time.LocalDate

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned columnar sink mirroring the reference's ClickHouse
  * target table (reference readme.md:108-124):
  *
  * {{{
  *   engine = MergeTree()
  *     PARTITION BY toDate(created_at)
  *     ORDER BY (created_at, repo, host)
  *     TTL created_at + INTERVAL 10 DAY
  * }}}
  *
  * The zero-egress container has no ClickHouse server/driver, so the
  * storage layer is parquet; the table semantics — date partitioning,
  * within-partition sort order, TTL retention — are preserved:
  *
  *  - `PARTITION BY toDate(created_at)` → `partitionBy("event_date")`;
  *    date-range predicates prune partitions at the scan (the #1 scale
  *    lever for time-series logs — a 1-day query over 100 TB touches
  *    1/retention of the data).
  *  - `ORDER BY (created_at, repo, host)` → `sortWithinPartitions`,
  *    giving parquet min/max row-group statistics the same skip power
  *    as the MergeTree primary index.
  *  - `TTL 10 DAY` → [[applyTtl]] drops whole expired partitions —
  *    O(partitions) metadata work, never a row-level delete.
  *
  * Two directory layouts, one per write mode:
  *
  *  - batch writes ([[write]]): `path/event_date=D/...` — plain
  *    append/overwrite.
  *  - streaming ingest ([[writeBatch]]): `path/ingest_batch=B/
  *    event_date=D/...` — each micro-batch owns its `ingest_batch`
  *    directory and is written with Overwrite, so a replayed batch
  *    (foreachBatch retry after a crash mid-commit) rewrites exactly
  *    its own files: **idempotent, hence exactly-once end to end**
  *    (file-source offsets in the checkpoint WAL are already
  *    exactly-once). `event_date` stays a partition column either way,
  *    so pruning is identical. A sink root is one layout or the other,
  *    never mixed (Spark partition discovery requires uniform depth).
  *
  * All maintenance paths ([[compact]], [[applyTtl]]) go through the
  * Hadoop `FileSystem` API resolved from the sink path, so they run
  * unchanged against HDFS/S3/local — no `java.io.File` anywhere.
  */
final case class MergeTreeSink(path: String, ttlDays: Int = 10) extends LogSink {

  /** Reserved ingest_batch key that [[compact]] rewrites streaming-
    * layout data into. Collision-safe because every streaming batch key
    * carries a `<source>_<batchId>` suffix ([[writeBatch]] contract, set
    * by TailPipeline.writeMicroBatch), so the bare key "compacted" can
    * never equal a live batch's key.
    */
  val CompactedBatchId: String = "compacted"

  private def fs(spark: SparkSession): FileSystem =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  private def withDate(batch: DataFrame): DataFrame =
    batch.withColumn("event_date", to_date(col("created_at")))

  /** One output file per date per write by default; `filesPerDay > 1`
    * hash-buckets within the day for high-volume dates (SURVEY §5) —
    * the repartition keys on (date, bucket) so a hot date fans out
    * over up to `filesPerDay` tasks instead of serializing through
    * one (hash collisions may merge some buckets; the bound is the
    * point, not an exact file count).
    */
  private def partitionForWrite(df: DataFrame, filesPerDay: Int): DataFrame =
    // Explicit partition count (round 17): the keyed no-count
    // `repartition(col("event_date"))` plans REPARTITION_BY_COL, which
    // AQE freely coalesces — the round-17 write-plan capture
    // (plans/r17/sink_roundtrip_before_write0.txt, AQEShuffleRead
    // "coalesced" over a 16 MiB stage) showed the ENTIRE sort+write
    // running in one task while the upstream parse ran on 32.
    // REPARTITION_BY_NUM pins the session's shuffle parallelism, so
    // each date still lands whole in one task (one file per day, the
    // dynamic-partition writer splits files per partition value) but
    // distinct dates write in parallel. Scale-adaptive: the count is
    // the session's shuffle parallelism, not a local constant.
    if (filesPerDay <= 1)
      df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions, col("event_date"))
    else {
      // explicit partition count: an AQE-coalesced keyed repartition
      // would merge the buckets right back into one task
      val n = math.max(df.sparkSession.sessionState.conf.numShufflePartitions, filesPerDay)
      df.repartition(n, col("event_date"),
        pmod(xxhash64(col("created_at"), col("message")), lit(filesPerDay)))
    }

  /** Write a parsed-log batch (schema per MonologParser.parse). */
  def write(batch: DataFrame, mode: SaveMode = SaveMode.Append, filesPerDay: Int = 1): Unit =
    partitionForWrite(withDate(batch), filesPerDay)
      // event_date leads the local sort so the dynamic-partition
      // writer's required ordering (partition cols first) is already
      // satisfied and it skips its OWN re-sort — one less sort pass
      // per write, and in-file created_at order no longer depends on
      // that re-sort being stable (it is not, measured in round 16
      // once multi-task parses fed this path)
      .sortWithinPartitions("event_date", "created_at", "repo", "host")
      .write
      .partitionBy("event_date")
      .mode(mode)
      .parquet(path)

  /** Idempotent micro-batch write for streaming ingest: the batch owns
    * `path/ingest_batch=<key>` and Overwrite makes a retried batch a
    * no-op-equivalent rewrite — zero duplicates on foreachBatch replay
    * (tested in StreamingSpec).
    *
    * `batchKey` must be stable across retries of the same batch and
    * unique across everything else writing to this root: TailPipeline
    * uses `<source>_<batchId>` (plus the day for daily-rotated sources,
    * whose per-day checkpoints restart batch ids at 0 — two different
    * days' batch 0 must not share a directory).
    */
  override def writeBatch(batch: DataFrame, batchKey: String): Unit =
    writeBatch(batch, batchKey, filesPerDay = 1)

  def writeBatch(batch: DataFrame, batchKey: String, filesPerDay: Int): Unit =
    writeBatch(batch, batchKey, filesPerDay, commitStampMicros = None)

  def writeBatch(batch: DataFrame, batchKey: String, filesPerDay: Int,
                 commitStampMicros: Option[Long]): Unit = {
    partitionForWrite(withDate(batch), filesPerDay)
      .sortWithinPartitions("event_date", "created_at", "repo", "host") // see write(): skip the writer re-sort
      .write
      .partitionBy("event_date")
      .mode(SaveMode.Overwrite)
      .parquet(s"$path/ingest_batch=$batchKey")
    // write-time zone-map maintenance: the manifest slice for this
    // batch is (over)written with the SAME idempotent key as the data,
    // so a replayed batch rewrites its stats instead of duplicating
    // them. Stats come from the just-written parquet FOOTERS — a
    // driver-side metadata read per file (micro-batches write O(1)
    // files), NOT a data re-read: the round-8 read-back version ran a
    // full batch-sized Spark job per micro-batch, which doubled the
    // write path's I/O and cost ~40% of steady-state ingest
    // throughput. Files whose footers lack usable created_at stats
    // fall back to the read-back pass — unknown goes the
    // slow-but-sound way, same rule as pruning. An EMPTY micro-batch
    // (e.g. tail-from-end's first trigger) writes no parquet files, so
    // there is nothing to manifest — and nothing to read a schema
    // from.
    val spark = batch.sparkSession
    val files = Option(fs(spark).globStatus(
      new Path(path, s"ingest_batch=$batchKey/event_date=*/*.parquet")))
      .getOrElse(Array.empty).toSeq
    if (files.isEmpty) {
      // An empty micro-batch's Overwrite still creates
      // ingest_batch=<key>/ (with _SUCCESS and no data). Left behind,
      // that residue reads as a data dir with no commit marker — which
      // readAsOf must treat as a crashed commit — so remove it, along
      // with any marker/manifest slice from a prior NON-empty landing
      // of the same key (a replay-to-empty means the batch now
      // contributes nothing to any snapshot). Marker FIRST: a crash
      // between the deletes then leaves an unmarked (possibly
      // data-bearing) dir — the already-handled crashed-commit path —
      // instead of a marker pointing at deleted data, which readAsOf
      // reports as the misleading "time travel horizon passed" until
      // the batch happens to replay.
      val f = fs(spark)
      f.delete(new Path(path, s"${MergeTreeSink.CommitsDir}/$batchKey"), false)
      f.delete(new Path(path, s"ingest_batch=$batchKey"), true)
      f.delete(new Path(s"$manifestRoot/batch=$batchKey"), true)
      ()
    } else {
      footerManifestRows(spark, files) match {
        case Some(rows) =>
          spark.createDataFrame(
              new java.util.ArrayList(java.util.Arrays.asList(rows: _*)),
              MergeTreeSink.ManifestSliceSchema)
            .write.partitionBy("event_date").mode(SaveMode.Overwrite)
            .parquet(s"$manifestRoot/batch=$batchKey")
        case None => writeManifestSlice(
          spark.read.parquet(s"$path/ingest_batch=$batchKey"),
          s"batch=$batchKey")
      }
      // Commit marker LAST — data and manifest land, then the batch
      // becomes visible to time travel. A replayed batch overwrites
      // its marker with a NEW stamp (re-commit semantics, like a
      // rewritten Delta commit): snapshots between the two stamps no
      // longer contain it. Empty batches write no files and no
      // marker — they add nothing to any snapshot.
      // temp-then-rename: a crash mid-write leaves only a dot-prefixed
      // temp (skipped by readAsOf's listing) or no marker at all — an
      // uncommitted batch, never a truncated stamp that would poison
      // every later snapshot read
      val stamp = commitStampMicros.getOrElse(System.currentTimeMillis() * 1000L)
      val f = fs(spark)
      val marker = new Path(path, s"${MergeTreeSink.CommitsDir}/$batchKey")
      val tmp = new Path(path, s"${MergeTreeSink.CommitsDir}/.tmp_$batchKey")
      val out = f.create(tmp, true)
      try out.write(stamp.toString.getBytes("UTF-8")) finally out.close()
      f.delete(marker, false) // re-commit replaces the old stamp
      require(f.rename(tmp, marker), s"could not publish commit marker $marker")
    }
  }

  /** Time-travel read (the Delta/Iceberg `AS OF` analog) over the
    * streaming layout: the table as of `asOfMicros` = the union of
    * every ingest batch whose commit marker is stamped at or before
    * it. The marker is written AFTER the batch's data+manifest (the
    * commit point), so a snapshot never sees a half-landed batch.
    *
    * This is what pins a training run to a reproducible corpus
    * snapshot ("train on the data as of Tuesday 06:00") while ingest
    * keeps appending. Horizon contract: COMPACTION folds batch dirs
    * into [[MergeTreeSink.CompactedBatchId]] and erases the
    * per-batch boundaries time travel needs — once a compacted dir
    * exists this method throws (run snapshot-pinned work before
    * maintenance, or on a separate un-compacted root; `read()` always
    * serves the current table). TTL'd dates age out of old snapshots
    * too — retention applies to history, exactly as a vacuumed Delta
    * table's old versions stop being readable.
    */
  def readAsOf(spark: SparkSession, asOfMicros: Long): DataFrame = {
    val selected = asOfBatchKeys(spark, asOfMicros)
    if (selected.isEmpty) read(spark).where(lit(false))
    else spark.read.option("basePath", path)
      .parquet(selected.sorted.map(k => s"$path/ingest_batch=$k"): _*)
  }

  /** Snapshot-pinned, manifest-pruned `created_at` range read —
    * [[readAsOf]]'s batch selection composed with [[prunedRead]]'s
    * zone skipping. The manifest is sliced per ingest batch by
    * construction (`_manifest/batch=<key>`), so a snapshot's stats are
    * exactly the slices of its selected batches: files whose zones
    * provably miss the range are never opened, files the manifest does
    * not cover are read unpruned (unknown stays sound), and the exact
    * predicate is re-applied either way — zones only save I/O.
    */
  def readAsOfPruned(spark: SparkSession, asOfMicros: Long,
                     fromTs: String, toTs: String): DataFrame = {
    val lo = lit(fromTs).cast("timestamp")
    val hi = lit(toTs).cast("timestamp")
    val selected = asOfBatchKeys(spark, asOfMicros)
    if (selected.isEmpty) return read(spark).where(lit(false))
    val f = fs(spark)
    val (sliced, unknownBatches) =
      selected.partition(k => f.exists(new Path(s"$manifestRoot/batch=$k")))
    if (sliced.isEmpty)
      return spark.read.option("basePath", path)
        .parquet(selected.sorted.map(k => s"$path/ingest_batch=$k"): _*)
        .where(col("created_at") >= lo && col("created_at") <= hi)
    // The driver never holds the full file inventory: manifest slices
    // are PER BATCH and complete by construction (both writer paths —
    // footer decode and data read-back — stat every file the batch
    // landed before the commit marker), so "files the manifest does
    // not cover" is exactly "batches with no slice", a per-batch FS
    // check that reads whole directories unpruned. The zone filter
    // runs as a Spark job over the manifest parquet and only the
    // KEEP-list is collected — bounded by the range's selectivity, and
    // it is the very list the parquet read needs; the old
    // all-known-files set + inputFiles set-difference was a
    // millions-of-files driver-memory term at 100 TB.
    val keep = spark.read.option("basePath", manifestRoot)
      .parquet(sliced.sorted.map(k => s"$manifestRoot/batch=$k"): _*)
      .where(!(col("max_created_at") < lo || col("min_created_at") > hi))
      .select("file").distinct()
      .collect().map(r => new Path(r.getString(0)).toString)
    val paths = (keep ++ unknownBatches.sorted.map(k => s"$path/ingest_batch=$k")).distinct
    if (paths.isEmpty) read(spark).where(lit(false))
    else spark.read.option("basePath", path).parquet(paths.toIndexedSeq: _*)
      .where(col("created_at") >= lo && col("created_at") <= hi)
  }

  /** The commit-marker batch selection behind [[readAsOf]] /
    * [[readAsOfPruned]]: every ingest batch whose marker stamp is at or
    * before `asOfMicros`, with the uncommitted-data guards documented
    * on [[readAsOf]].
    */
  private def asOfBatchKeys(spark: SparkSession, asOfMicros: Long): Seq[String] = {
    val f = fs(spark)
    require(!f.exists(new Path(path, s"ingest_batch=$CompactedBatchId")),
      s"time travel horizon passed: $path has compacted batches " +
        "(per-batch boundaries are gone; read() serves the current table)")
    val commits = new Path(path, MergeTreeSink.CommitsDir)
    val markerKeys =
      if (!f.exists(commits)) Seq.empty
      else f.listStatus(commits).toSeq
        .filterNot(_.getPath.getName.startsWith(".")) // in-flight temps
        .map(_.getPath.getName)
    // Marker-less data dirs would be silently invisible to EVERY
    // snapshot (rows that read() serves but no `AS OF` ever contains) —
    // fail loudly instead: such a dir is either a pre-marker legacy
    // write or a crash between data and marker, and the caller must
    // re-commit or compact it, not get a quietly-short snapshot.
    // Two carve-outs keep this check from biting healthy tables:
    //  - dirs with NO data files (an empty micro-batch's _SUCCESS-only
    //    residue, or a crash before any file landed) hold no rows any
    //    snapshot could miss — skipped, not fatal;
    //  - a RECENTLY-written unmarked dir is the normal data-then-marker
    //    commit window of a live writer — excluded from this snapshot
    //    (exactly what a concurrent reader should see mid-commit), and
    //    only treated as a crashed commit once it ages past the grace
    //    window without its marker.
    val dataKeys = Option(f.globStatus(new Path(path, "ingest_batch=*")))
      .map(_.toSeq).getOrElse(Seq.empty)
      .map(_.getPath.getName.stripPrefix("ingest_batch="))
      .filterNot(_ == CompactedBatchId)
    val unmarked = dataKeys.filterNot(markerKeys.contains).filter { k =>
      Option(f.globStatus(new Path(path, s"ingest_batch=$k/event_date=*")))
        .exists(_.nonEmpty)
    }
    // Age from the NEWEST data file's mtime, not the directory's:
    // object stores (S3A) synthesize directory mtimes as absent/zero,
    // which would age every mid-commit batch straight past the grace
    // window and trip the loud error on healthy concurrent writes.
    // File mtimes are real object stamps everywhere; the dir mtime
    // rides along as a lower bound for stores where files report 0.
    val now = System.currentTimeMillis()
    val stale = unmarked.filter { k =>
      val dir = new Path(path, s"ingest_batch=$k")
      val fileMtimes = Option(f.globStatus(new Path(dir, "event_date=*/*")))
        .map(_.toSeq).getOrElse(Seq.empty)
        .filterNot(_.getPath.getName.startsWith("."))
        .map(_.getModificationTime)
      val newest = (fileMtimes :+ f.getFileStatus(dir).getModificationTime).max
      now - newest > MergeTreeSink.InFlightGraceMs
    }
    require(stale.isEmpty,
      s"uncommitted ingest batches under $path: ${stale.mkString(", ")} " +
        "(data landed without a commit marker — re-commit or compact before time travel)")
    val selected = markerKeys.flatMap { k =>
      val in = f.open(new Path(commits, k))
      val txt = try new String(in.readAllBytes(), "UTF-8").trim finally in.close()
      val stamp =
        try txt.toLong
        catch {
          case e: NumberFormatException => throw new IllegalStateException(
            s"corrupt commit marker $commits/$k: '$txt' is not a micros stamp", e)
        }
      if (stamp <= asOfMicros) Some(k) else None
    }
    val missing = selected.filterNot(k => f.exists(new Path(path, s"ingest_batch=$k")))
    require(missing.isEmpty,
      s"time travel horizon passed: committed batches ${missing.mkString(", ")} " +
        s"no longer exist under $path (folded or expired)")
    selected
  }

  /** Per-file (path, rows, min/max created_at, event_date) decoded from
    * parquet footer metadata; None when any footer lacks decodable
    * `created_at` statistics (non-NTZ-micros physical type, INT96
    * legacy, stats absent) — the caller then takes the data-read path.
    * Only the sink's canonical schema (created_at TIMESTAMP_NTZ as
    * INT64 micros, the MonologParser output) is decoded here; that is
    * every streaming writer this sink has.
    */
  private def footerManifestRows(spark: SparkSession,
                                 files: Seq[org.apache.hadoop.fs.FileStatus])
      : Option[Seq[org.apache.spark.sql.Row]] = {
    import scala.jdk.CollectionConverters._
    import org.apache.parquet.schema.LogicalTypeAnnotation
    val conf = spark.sessionState.newHadoopConf()
    val decoded = files.map { st =>
      try {
        val rf = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf))
        try {
          val blocks = rf.getFooter.getBlocks.asScala.toSeq
          val nRows = blocks.map(_.getRowCount).sum
          val chunks = blocks.flatMap(_.getColumns.asScala.find(_.getPath.toDotString == "created_at"))
          val ntzMicros = chunks.nonEmpty && chunks.forall { c =>
            c.getPrimitiveType.getLogicalTypeAnnotation match {
              case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
                !ts.isAdjustedToUTC && ts.getUnit == LogicalTypeAnnotation.TimeUnit.MICROS
              case _ => false
            }
          }
          val stats = chunks.map(_.getStatistics)
          if (!ntzMicros || stats.exists(s => s == null || s.isEmpty || !s.hasNonNullValue)) None
          else {
            def ldt(us: Long) = java.time.LocalDateTime.ofEpochSecond(
              Math.floorDiv(us, 1000000L), (Math.floorMod(us, 1000000L) * 1000L).toInt,
              java.time.ZoneOffset.UTC)
            val lo = stats.map(_.genericGetMin.asInstanceOf[java.lang.Long].longValue).min
            val hi = stats.map(_.genericGetMax.asInstanceOf[java.lang.Long].longValue).max
            val date = java.sql.Date.valueOf(
              st.getPath.getParent.getName.stripPrefix("event_date="))
            Some(org.apache.spark.sql.Row(
              st.getPath.toString, nRows, ldt(lo), ldt(hi), date))
          }
        } finally rf.close()
      } catch { case scala.util.control.NonFatal(_) => None }
    }
    if (decoded.forall(_.isDefined)) Some(decoded.flatten) else None
  }

  // --------------------------------------------------------------- //
  // Zone-map manifest (SURVEY §2 A13a: built AT WRITE TIME, not per   //
  // query). Lives under `_manifest/` inside the sink root — the `_`   //
  // prefix hides it from Spark's data-file listing (the _delta_log    //
  // convention). Granularity mirrors how data moves: one slice per    //
  // (batch, date), so writeBatch idempotency, compact's date swap,    //
  // and TTL's date drop each map to whole-directory manifest ops.     //
  // --------------------------------------------------------------- //

  private def manifestRoot = s"$path/_manifest"

  private def writeManifestSlice(slice: DataFrame, key: String): Unit =
    graft.sources.ZoneMap.build(slice, Seq("created_at", "event_date"))
      .withColumn("event_date", col("min_event_date"))
      .drop("min_event_date", "max_event_date")
      .write.partitionBy("event_date").mode(SaveMode.Overwrite)
      .parquet(s"$manifestRoot/$key")

  private def dropManifestDate(f: FileSystem, date: String,
                               excludeBatchKeys: Set[String] = Set.empty): Unit = {
    Option(f.globStatus(new Path(manifestRoot, s"batch=*/event_date=$date")))
      .getOrElse(Array.empty)
      .filterNot(st =>
        excludeBatchKeys.contains(st.getPath.getParent.getName.stripPrefix("batch=")))
      .foreach { st =>
        f.delete(st.getPath, true)
        val parent = st.getPath.getParent
        if (Option(f.listStatus(parent)).forall(_.isEmpty)) f.delete(parent, false)
      }
  }

  /** All live manifest rows: (file, rows, min/max created_at,
    * event_date, batch).
    */
  def manifest(spark: SparkSession): DataFrame =
    spark.read.parquet(manifestRoot)

  /** Full manifest rebuild for data written OUTSIDE the batch-keyed
    * path (plain `write`) — one stats pass over the sink, crash-safe
    * swap (stale manifest stays live until the rebuilt one renames
    * in).
    */
  def rebuildManifest(spark: SparkSession): Unit = {
    val f = fs(spark)
    val tmp = new Path(path, ".manifest_rebuild")
    f.delete(tmp, true)
    graft.sources.ZoneMap.build(read(spark), Seq("created_at", "event_date"))
      .withColumn("event_date", col("min_event_date"))
      .drop("min_event_date", "max_event_date")
      .write.partitionBy("event_date").mode(SaveMode.Overwrite)
      .parquet(new Path(tmp, "batch=rebuilt").toString)
    val live = new Path(manifestRoot)
    val aside = new Path(path, ".manifest_aside")
    f.delete(aside, true)
    if (f.exists(live) && !f.rename(live, aside))
      throw new java.io.IOException(s"manifest rebuild aside-rename failed for $live")
    if (!f.rename(tmp, live)) {
      if (f.exists(aside)) f.rename(aside, live)
      throw new java.io.IOException(s"manifest rebuild swap failed for $live")
    }
    f.delete(aside, true)
  }

  /** Manifest-pruned read of a `created_at` range: files whose zones
    * provably miss the range are never opened. Files the manifest does
    * NOT cover (e.g. plain-`write` data before a rebuild) are always
    * read — unknown stays sound, it just doesn't prune. The exact
    * predicate is re-applied, so zones only save I/O.
    */
  def prunedRead(spark: SparkSession, fromTs: String, toTs: String): DataFrame = {
    val lo = lit(fromTs).cast("timestamp")
    val hi = lit(toTs).cast("timestamp")
    if (!fs(spark).exists(new Path(manifestRoot)))
      return read(spark).where(col("created_at") >= lo && col("created_at") <= hi)
    def canon(s: String): String = new Path(s).toString
    val m = manifest(spark).cache()
    val known = m.select("file").distinct()
      .collect().map(r => canon(r.getString(0))).toSet
    val keep = m.where(!(col("max_created_at") < lo || col("min_created_at") > hi))
      .select("file").distinct()
      .collect().map(r => canon(r.getString(0)))
    m.unpersist()
    val unknown = read(spark).inputFiles.map(canon).filterNot(known)
    val files = (keep ++ unknown).distinct
    if (files.isEmpty) read(spark).where(lit(false))
    else spark.read.option("basePath", path).parquet(files.toIndexedSeq: _*)
      .where(col("created_at") >= lo && col("created_at") <= hi)
  }

  def read(spark: SparkSession): DataFrame = spark.read.parquet(path)

  /** Date-range read; the `event_date` predicate is a partition filter
    * (verified in SinkAndPlanSpec), so only in-range partitions are
    * scanned — in both layouts, since `event_date` is a discovered
    * partition column in both.
    */
  def readRange(spark: SparkSession, from: String, to: String): DataFrame =
    read(spark).where(col("event_date").between(from, to))

  /** All directories holding `date`'s rows, across both layouts. */
  private def datePartDirs(f: FileSystem, date: String): Seq[Path] = {
    val root = new Path(path)
    val direct = new Path(root, s"event_date=$date")
    val nested = Option(f.globStatus(new Path(root, s"ingest_batch=*/event_date=$date")))
      .getOrElse(Array.empty).toSeq.map(_.getPath)
    (if (f.exists(direct)) Seq(direct) else Nil) ++ nested
  }

  /** Rewrite one date's data into `targetFiles` files — the maintenance
    * job for streaming ingest, which writes a directory per micro-batch
    * and would otherwise accumulate thousands of small files per day
    * (ClickHouse's background merges do this implicitly for MergeTree
    * parts). In the streaming layout the date's slices across all
    * `ingest_batch` dirs collapse into
    * `ingest_batch=[[CompactedBatchId]]/event_date=D`.
    *
    * Crash safety (swap ordering): write the compacted copy to a hidden
    * temp dir, rename the live dirs ASIDE, rename the temp into place,
    * then delete the aside dirs. A crash mid-swap can leave the
    * partition briefly aside-named but never deleted-without-
    * replacement — recovery is renaming the aside dirs back.
    *
    * In-flight horizon: a still-retryable streaming batch rewriting its
    * `ingest_batch` dir after its rows were compacted away would
    * duplicate them (the batch's rows would live in BOTH
    * `ingest_batch=compacted` and the replayed `ingest_batch=<key>`).
    * `excludeBatchKeys` names the batch keys that must NOT be folded
    * in — callers on a live streaming sink pass every batch not yet
    * past its checkpoint commit (TailPipeline's in-stream hook passes
    * the batch currently being processed; foreachBatch serializes
    * batches, so that is the only in-flight one). Excluded dirs are
    * left untouched, manifest slices included, and simply compact on a
    * later pass.
    */
  def compact(spark: SparkSession, date: String, targetFiles: Int = 1,
              excludeBatchKeys: Set[String] = Set.empty): Unit = {
    val f = fs(spark)
    val live = datePartDirs(f, date).filterNot { dir =>
      val parent = dir.getParent.getName
      parent.startsWith("ingest_batch=") &&
        excludeBatchKeys.contains(parent.stripPrefix("ingest_batch="))
    }
    if (live.isEmpty) return
    val root = new Path(path)
    val streamingLayout = live.exists(_.getParent.getName.startsWith("ingest_batch="))
    val dest =
      if (streamingLayout) new Path(root, s"ingest_batch=$CompactedBatchId/event_date=$date")
      else new Path(root, s"event_date=$date")
    val tmp = new Path(root, s".compact_event_date=$date")
    f.delete(tmp, true)
    spark.read.parquet(live.map(_.toString): _*)
      .repartition(targetFiles)
      .sortWithinPartitions("created_at", "repo", "host")
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val aside = live.zipWithIndex.map { case (dir, i) =>
      val a = new Path(dir.getParent, s".aside_${i}_${dir.getName}")
      if (!f.rename(dir, a))
        throw new java.io.IOException(s"compaction aside-rename failed for $dir")
      a
    }
    f.mkdirs(dest.getParent)
    if (!f.rename(tmp, dest)) {
      // restore the originals; the partition is intact, compaction just failed
      aside.zip(live).foreach { case (a, orig) => f.rename(a, orig) }
      throw new java.io.IOException(s"compaction swap failed for $dest")
    }
    aside.foreach(f.delete(_, true))
    // manifest follows the data: the date's per-batch slices die with
    // their directories (excluded batches keep theirs — their data
    // dirs survived); the compacted files get one fresh slice
    dropManifestDate(f, date, excludeBatchKeys)
    writeManifestSlice(
      spark.read.parquet(dest.toString).withColumn("event_date", to_date(lit(date))),
      s"batch=${CompactedBatchId}_$date")
  }

  /** One background-maintenance pass — the policy loop ClickHouse's
    * background merges + TTL run continuously, here as an explicit
    * call an operator schedules (cron / foreachBatch hook / end of
    * backfill): every live date whose file count exceeds
    * `maxFilesPerDate` is compacted (crash-safe swap, manifest
    * follows), then expired dates drop via [[applyTtl]]. Dates at or
    * under the threshold are untouched — maintenance cost is
    * proportional to the data that actually fragmented, and a date
    * compacts at most once per pass regardless of how many batch dirs
    * feed it. Returns (compacted dates, dropped partition dirs).
    *
    * Against a LIVE streaming sink, `excludeBatchKeys` must carry every
    * batch key not yet past its checkpoint commit (see [[compact]]'s
    * in-flight-horizon contract) — compacting an in-flight batch's dir
    * and then replaying that batch duplicates its rows. The in-stream
    * hook (TailPipeline `maintainEveryBatches`) passes the current
    * batch key automatically; an EXTERNALLY scheduled pass (cron) must
    * either not run concurrently with live writers at all or pass the
    * live sources' current batch keys — compact's aside-rename can
    * otherwise also race a writer about to Overwrite the same dir.
    * Excluded files don't count toward the fragmentation threshold.
    */
  def maintain(spark: SparkSession, asOf: LocalDate,
               maxFilesPerDate: Int = 8,
               targetFiles: Int = 1,
               excludeBatchKeys: Set[String] = Set.empty): (Seq[String], Seq[String]) = {
    val f = fs(spark)
    val root = new Path(path)
    val parts =
      (Option(f.globStatus(new Path(root, "event_date=*/*.parquet"))).getOrElse(Array.empty).toSeq ++
        Option(f.globStatus(new Path(root, "ingest_batch=*/event_date=*/*.parquet"))).getOrElse(Array.empty).toSeq)
        .filterNot { st =>
          val batchDir = st.getPath.getParent.getParent.getName
          batchDir.startsWith("ingest_batch=") &&
            excludeBatchKeys.contains(batchDir.stripPrefix("ingest_batch="))
        }
    val byDate = parts.groupBy(_.getPath.getParent.getName.stripPrefix("event_date="))
    val cutoff = asOf.minusDays(ttlDays.toLong)
    val toCompact = byDate.collect {
      case (date, files)
        if files.size > maxFilesPerDate &&
          // an expired date is about to drop whole — compacting it first
          // would be wasted I/O
          scala.util.Try(LocalDate.parse(date)).toOption.forall(!_.isBefore(cutoff)) => date
    }.toSeq.sorted
    toCompact.foreach(compact(spark, _, targetFiles, excludeBatchKeys))
    (toCompact, applyTtl(spark, asOf))
  }

  /** Drop partitions whose date is older than `ttlDays` before `asOf`
    * (the MergeTree TTL clause), in either layout. Returns the dropped
    * partition directory names relative to the sink root.
    */
  def applyTtl(spark: SparkSession, asOf: LocalDate): Seq[String] = {
    val f = fs(spark)
    val cutoff = asOf.minusDays(ttlDays.toLong)
    val root = new Path(path)
    val candidates =
      Option(f.globStatus(new Path(root, "event_date=*"))).getOrElse(Array.empty).toSeq ++
        Option(f.globStatus(new Path(root, "ingest_batch=*/event_date=*"))).getOrElse(Array.empty).toSeq
    val expired = candidates
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter { p =>
        val date = p.getName.stripPrefix("event_date=")
        scala.util.Try(LocalDate.parse(date)).toOption.exists(_.isBefore(cutoff))
      }
    expired.foreach { p =>
      f.delete(p, true)
      // prune the parent ingest_batch dir once its last date is gone
      val parent = p.getParent
      if (parent.getName.startsWith("ingest_batch=") &&
        Option(f.listStatus(parent)).forall(_.isEmpty)) f.delete(parent, false)
      // expired dates take their manifest slices with them
      dropManifestDate(f, p.getName.stripPrefix("event_date="))
    }
    expired.map { p =>
      val parent = p.getParent.getName
      if (parent.startsWith("ingest_batch=")) s"$parent/${p.getName}" else p.getName
    }
  }
}

object MergeTreeSink {
  /** Schema of a footer-decoded manifest slice — identical to what the
    * data-read path (ZoneMap.build over the batch) produces, so slices
    * from either path union cleanly under `_manifest/`.
    */
  /** Directory of time-travel commit markers: one file per ingest
    * batch, content = commit stamp in epoch micros ([[MergeTreeSink.readAsOf]]).
    */
  private[sinks] val CommitsDir = "_commits"

  /** How long an unmarked data dir may sit before [[MergeTreeSink.readAsOf]]
    * treats it as a crashed commit instead of an in-flight one. Sized to
    * dominate any realistic data-to-marker gap (a micro-batch's footer
    * scan + one marker rename) by orders of magnitude while still
    * surfacing genuinely orphaned data the same day it lands. Assumes
    * reader clock ≈ store clock: age compares the reader's
    * currentTimeMillis against store-reported file mtimes, so reader
    * clock AHEAD of the store shrinks the effective window (more false
    * "crashed" trips) and BEHIND extends it (a genuinely crashed
    * commit stays silently omitted from snapshots longer). Keep the
    * window ≫ plausible skew.
    */
  private[graft] val InFlightGraceMs: Long = 5L * 60L * 1000L

  private[sinks] val ManifestSliceSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("file", org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("rows", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("min_created_at", org.apache.spark.sql.types.TimestampNTZType, nullable = true),
      org.apache.spark.sql.types.StructField("max_created_at", org.apache.spark.sql.types.TimestampNTZType, nullable = true),
      org.apache.spark.sql.types.StructField("event_date", org.apache.spark.sql.types.DateType, nullable = false)))
}
