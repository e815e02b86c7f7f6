package graft

import java.nio.file.Files
import java.time.LocalDate

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.logs.{LogLines, MonologParser, TailConfig}
import graft.mm.Multimodal
import graft.sinks.MergeTreeSink
import graft.sources.DatePath

class SinkAndPlanSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val cfg = TailConfig(name = "access", repo = "api2")

  private def parsedEvents = MonologParser.parse(
    LogLines.fromEvents(Tables(spark, TestSpark.SfDirSmall, "events")), cfg)

  test("sink writes date partitions, prunes reads, applies TTL") {
    val root = Files.createTempDirectory("mt_sink").toFile
    val sink = MergeTreeSink(root.getAbsolutePath, ttlDays = 10)
    sink.write(parsedEvents, SaveMode.Overwrite)

    val parts = root.listFiles().filter(_.getName.startsWith("event_date=")).map(_.getName).sorted
    assert(parts.length > 1, s"expected multiple date partitions, got ${parts.toSeq}")

    val pruned = sink.readRange(spark, "2024-01-02", "2024-01-03")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"no partition filters in:\n$plan")
    // pruned scan reads only the two in-range partitions
    val readDates = pruned.select("event_date").distinct().as[java.sql.Date].collect().map(_.toString).sorted
    assert(readDates.forall(d => d >= "2024-01-02" && d <= "2024-01-03"))

    val oldest = parts.head.stripPrefix("event_date=")
    val dropped = sink.applyTtl(spark, LocalDate.parse(oldest).plusDays(11))
    assert(dropped.contains(s"event_date=$oldest"))
    assert(!root.listFiles().map(_.getName).contains(s"event_date=$oldest"))
  }

  test("streaming layout: idempotent batch writes, compaction across batch dirs, TTL") {
    val root = Files.createTempDirectory("mt_stream").toFile
    val sink = MergeTreeSink(root.getAbsolutePath, ttlDays = 10)
    val rows = parsedEvents.limit(200).cache()
    sink.writeBatch(rows, "access_0")
    sink.writeBatch(rows, "access_1")
    val twoBatches = sink.read(spark).count()
    assert(twoBatches == 400)
    // replayed batch key overwrites its own directory: no duplicates
    sink.writeBatch(rows, "access_1")
    assert(sink.read(spark).count() == twoBatches, "batch replay must be idempotent")

    // pruning works identically in the nested layout
    val pruned = sink.readRange(spark, "2024-01-01", "2024-01-02")
    assert(pruned.queryExecution.executedPlan.toString.contains("PartitionFilters"))

    // compaction collapses one date's slices across batch dirs
    val date = sink.read(spark).selectExpr("CAST(event_date AS STRING)")
      .as[String].head()
    val before = sink.read(spark).where(col("event_date") === date)
      .drop("ingest_batch").orderBy("created_at", "message").collect()
    sink.compact(spark, date)
    val compactDir = new java.io.File(root, s"ingest_batch=${sink.CompactedBatchId}/event_date=$date")
    assert(compactDir.isDirectory, s"no compacted dir at $compactDir")
    val after = sink.read(spark).where(col("event_date") === date)
      .drop("ingest_batch").orderBy("created_at", "message").collect()
    assert(after.sameElements(before), "compaction changed the date's rows")

    // TTL drops expired date dirs inside batch dirs too: asOf 11 days
    // past the max date expires every partition
    val maxDate = sink.read(spark).selectExpr("CAST(max(event_date) AS STRING)").as[String].head()
    val droppedAll = sink.applyTtl(spark, LocalDate.parse(maxDate).plusDays(11))
    assert(droppedAll.nonEmpty && droppedAll.forall(_.contains("event_date=")))
    val leftover = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory)
      .flatMap(d => Option(d.listFiles()).getOrElse(Array.empty))
      .filter(_.getName.startsWith("event_date="))
    assert(leftover.isEmpty, s"expired partitions survived TTL: ${leftover.toSeq}")
    rows.unpersist()
    ()
  }

  test("time travel: readAsOf pins snapshots, re-commit moves a batch, compaction closes the horizon") {
    val root = Files.createTempDirectory("mt_asof").toFile
    val sink = MergeTreeSink(root.getAbsolutePath, ttlDays = 10)
    val b1 = parsedEvents.limit(50).cache()
    val b2 = parsedEvents.limit(120).exceptAll(b1).cache()
    val b3 = parsedEvents.limit(200).exceptAll(b1.unionAll(b2)).cache()
    sink.writeBatch(b1, "src_0", 1, Some(100L))
    sink.writeBatch(b2, "src_1", 1, Some(200L))
    sink.writeBatch(b3, "src_2", 1, Some(300L))
    // a snapshot is the union of batches committed at or before it
    assert(sink.readAsOf(spark, 50L).count() == 0)
    assert(sink.readAsOf(spark, 150L).count() == 50)
    assert(sink.readAsOf(spark, 250L).count() == 120)
    assert(sink.readAsOf(spark, 300L).count() == 200) // inclusive
    // a REPLAYED batch re-commits at its new stamp: the 250 snapshot
    // no longer contains it, the 400 one does — and no duplicates
    sink.writeBatch(b2, "src_1", 1, Some(400L))
    assert(sink.readAsOf(spark, 250L).count() == 50)
    assert(sink.readAsOf(spark, 400L).count() == 200)
    // snapshots carry the same schema as the live read
    assert(sink.readAsOf(spark, 150L).columns.sorted.sameElements(
      sink.read(spark).columns.sorted))
    // compaction erases per-batch boundaries: the horizon closes with
    // an explicit error while read() keeps serving the current table
    val date = sink.read(spark).selectExpr("CAST(event_date AS STRING)").as[String].head()
    sink.compact(spark, date)
    val e = intercept[IllegalArgumentException](sink.readAsOf(spark, 400L))
    assert(e.getMessage.contains("horizon"), e.getMessage)
    assert(sink.read(spark).count() == 200)
    b1.unpersist(); b2.unpersist(); b3.unpersist()
    ()
  }

  test("composed layouts: snapshot-pinned read prunes by manifest and joins exchange-free bucketed") {
    // Time travel (A13d), zone maps (A13a), and bucketing (A13c) each
    // hold alone; this case composes all three: a pinned snapshot read
    // that prunes files via the per-batch manifest slices, then joins
    // exchange-free through BucketedStore.
    val root = Files.createTempDirectory("mt_compose").toFile
    val sink = MergeTreeSink(root.getAbsolutePath, ttlDays = 10)
    val ev = parsedEvents.cache()
    // time-split batches so the snapshot's manifest has disjoint
    // created_at zones to skip
    val dates = ev.selectExpr("CAST(to_date(created_at) AS STRING) d")
      .distinct().orderBy("d").as[String].collect()
    assert(dates.length >= 2, s"fixture needs several dates: ${dates.toSeq}")
    val early = ev.where(to_date(col("created_at")) === dates.head).cache()
    val late = ev.where(to_date(col("created_at")) > dates.head).cache()
    sink.writeBatch(early, "src_a", 2, Some(100L))
    sink.writeBatch(late, "src_b", 2, Some(200L))
    sink.writeBatch(late.limit(20), "src_c", 1, Some(300L)) // beyond the pin
    val lo = s"${dates.head} 00:00:00"
    val hi = s"${dates.head} 23:59:59"
    val snap = sink.readAsOf(spark, 250L)
    val expected = snap.where(col("created_at")
      .between(lit(lo).cast("timestamp"), lit(hi).cast("timestamp"))).count()
    assert(expected == early.count(), "pin sanity: in-range snapshot rows = the early batch")
    val pruned = sink.readAsOfPruned(spark, 250L, lo, hi)
    // pinned: the src_c batch (committed past the pin) never appears
    assert(pruned.count() == expected)
    // pruned: only src_a's files are opened — src_b's zones provably
    // miss the range, src_c is outside the snapshot
    val opened = pruned.inputFiles
    assert(opened.nonEmpty && opened.length < snap.inputFiles.length,
      s"manifest pruning opened ${opened.length} of ${snap.inputFiles.length} files")
    assert(opened.forall(_.contains("ingest_batch=src_a")),
      s"pruned listing leaked past the pinned in-range batch: ${opened.toSeq}")
    // bucketed co-location on the pinned+pruned rows: both sides
    // through BucketedStore on the join key → merge join, zero Exchange
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val facts = graft.ops.BucketedStore.materializeOnce(
        pruned.select("logger", "message", "created_at"),
        "graft_bkt_asof_facts", "logger", 4)
      val dims = graft.ops.BucketedStore.materializeOnce(
        snap.groupBy("logger").agg(count(lit(1)).as("logger_total")),
        "graft_bkt_asof_dims", "logger", 4)
      val j = facts.join(dims, "logger")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected a merge join:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed snapshot join must not shuffle:\n$plan")
      assert(j.count() == expected, "co-located join changed the row count")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    ev.unpersist(); early.unpersist(); late.unpersist()
    ()
  }

  test("pruned snapshot reads collect only the keep-list; slice-less batches read whole-dir") {
    // Round-15 driver-memory bound: readAsOfPruned used to collect the
    // manifest's FULL file inventory to set-difference against the
    // snapshot's inputFiles — a millions-of-files driver term at scale.
    // Now the zone filter runs Spark-side and only the keep-list is
    // collected, while manifest coverage is decided PER BATCH (slices
    // are complete for their batch by construction), so a batch whose
    // slice is missing is read as a whole directory, never enumerated.
    val root = Files.createTempDirectory("mt_manyslices").toFile
    val sink = MergeTreeSink(root.getAbsolutePath, ttlDays = 10)
    val ev = parsedEvents.cache()
    val dates = ev.selectExpr("CAST(to_date(created_at) AS STRING) d")
      .distinct().orderBy("d").as[String].collect()
    val early = ev.where(to_date(col("created_at")) === dates.head).cache()
    val late = ev.where(to_date(col("created_at")) > dates.head).cache()
    // many sliced batches: two in-range (a deterministic hash split —
    // limit() without an order would overlap), four provably out of range
    val half = crc32(col("message")) % 2
    assert(early.where(half === 0).count() > 0 && early.where(half === 1).count() > 0)
    sink.writeBatch(early.where(half === 0), "in_0", 2, Some(100L))
    sink.writeBatch(early.where(half === 1), "in_1", 2, Some(110L))
    (0 until 4).foreach(i => sink.writeBatch(late.limit(30), s"out_$i", 2, Some(120L + i)))
    // one batch loses its manifest slice (legacy write / stats fallback
    // never ran): unknown coverage, must be read UNPRUNED via its dir
    sink.writeBatch(late.limit(10), "noslice", 2, Some(200L))
    val sliceDir = new java.io.File(root, "_manifest/batch=noslice")
    assert(sliceDir.isDirectory, "fixture: the slice must exist before we remove it")
    def rmTree(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmTree)); f.delete(); ()
    }
    rmTree(sliceDir)
    val lo = s"${dates.head} 00:00:00"
    val hi = s"${dates.head} 23:59:59"
    val pruned = sink.readAsOfPruned(spark, 250L, lo, hi)
    // rows: exactly the two in-range batches (the slice-less batch's
    // rows are out of range — opened, then filtered by the predicate)
    assert(pruned.count() == early.count(), s"got ${pruned.count()}")
    val opened = pruned.inputFiles
    assert(opened.exists(_.contains("ingest_batch=noslice")),
      "a slice-less batch must be opened (unknown coverage stays sound)")
    assert(!opened.exists(_.contains("ingest_batch=out_")),
      s"sliced out-of-range batches must be zone-skipped: ${opened.toSeq}")
    assert(opened.count(_.contains("ingest_batch=in_")) > 0)
    ev.unpersist(); early.unpersist(); late.unpersist()
    ()
  }

  test("compaction collapses a partition's files without changing its rows") {
    val root = Files.createTempDirectory("mt_compact").toFile
    val sink = MergeTreeSink(root.getAbsolutePath)
    // two appends → at least two files per touched partition
    sink.write(parsedEvents)
    sink.write(parsedEvents)
    val part = root.listFiles().filter(_.getName.startsWith("event_date=")).head
    val date = part.getName.stripPrefix("event_date=")
    val before = spark.read.parquet(part.getAbsolutePath)
      .orderBy("created_at", "message").collect()
    assert(part.listFiles().count(_.getName.endsWith(".parquet")) >= 2)
    sink.compact(spark, date)
    assert(part.listFiles().count(_.getName.endsWith(".parquet")) == 1)
    val after = spark.read.parquet(part.getAbsolutePath)
      .orderBy("created_at", "message").collect()
    assert(after.sameElements(before))
  }

  test("maintenance pass compacts only fragmented live dates, then applies TTL") {
    val root = Files.createTempDirectory("mt_maintain").toFile
    val sink = MergeTreeSink(root.getAbsolutePath, ttlDays = 10)
    // fragment every date with three appends
    sink.write(parsedEvents); sink.write(parsedEvents); sink.write(parsedEvents)
    val parts = root.listFiles().filter(_.getName.startsWith("event_date=")).sortBy(_.getName)
    assert(parts.forall(_.listFiles().count(_.getName.endsWith(".parquet")) >= 3))
    val dates = parts.map(_.getName.stripPrefix("event_date="))
    val asOf = LocalDate.parse(dates.min).plusDays(11) // expires exactly the oldest date
    val expected = spark.read.parquet(root.getAbsolutePath)
      .where(col("event_date") > lit(dates.min).cast("date"))
      .orderBy("created_at", "message").collect()
    val (compacted, dropped) = sink.maintain(spark, asOf, maxFilesPerDate = 2)
    // the expired date was not compacted (wasted I/O), just dropped
    assert(!compacted.contains(dates.min) && dropped == Seq(s"event_date=${dates.min}"))
    assert(compacted == dates.filter(_ != dates.min).toSeq.sorted)
    val after = root.listFiles().filter(_.getName.startsWith("event_date="))
    assert(after.forall(_.listFiles().count(_.getName.endsWith(".parquet")) == 1))
    assert(spark.read.parquet(root.getAbsolutePath)
      .orderBy("created_at", "message").collect().sameElements(expected))
    // an already-tidy sink is a no-op pass
    val (c2, d2) = sink.maintain(spark, asOf, maxFilesPerDate = 2)
    assert(c2.isEmpty && d2.isEmpty)
  }

  test("maintenance excludes in-flight batch keys: replay after compaction cannot duplicate") {
    val root = Files.createTempDirectory("mt_inflight").toFile
    // TTL far out: this test isolates compaction, no date may expire
    val sink = MergeTreeSink(root.getAbsolutePath, ttlDays = 3650)
    val rows = parsedEvents.limit(200).cache()
    sink.writeBatch(rows, "access_0")
    sink.writeBatch(rows, "access_1")
    sink.writeBatch(rows, "access_2") // the in-flight batch: written, not yet committed
    val total = sink.read(spark).count()
    val asOf = sink.read(spark)
      .selectExpr("CAST(max(event_date) AS STRING)").as[String].head()

    // the pass folds committed batches but must leave access_2's dir alone
    val (compacted, _) = sink.maintain(spark, LocalDate.parse(asOf),
      maxFilesPerDate = 1, excludeBatchKeys = Set("access_2"))
    assert(compacted.nonEmpty, "nothing compacted — threshold not exceeded?")
    assert(new java.io.File(root, "ingest_batch=access_2").isDirectory,
      "in-flight batch dir was compacted away")
    assert(sink.read(spark).count() == total, "maintenance changed row count")

    // crash-replay of the in-flight batch: Overwrite of its own dir is
    // still a no-op — its rows were never folded into `compacted`
    sink.writeBatch(rows, "access_2")
    assert(sink.read(spark).count() == total,
      "replay after maintenance duplicated the in-flight batch's rows")

    // the excluded batch's manifest slice survived alongside its data
    assert(new java.io.File(root, "_manifest/batch=access_2").isDirectory,
      "excluded batch lost its manifest slice")

    // a later pass (batch now committed, no exclusion) folds it in
    val (c2, _) = sink.maintain(spark, LocalDate.parse(asOf), maxFilesPerDate = 1)
    val leftoverDates = Option(new java.io.File(root, "ingest_batch=access_2").listFiles())
      .getOrElse(Array.empty).filter(_.getName.startsWith("event_date="))
    assert(c2.nonEmpty && leftoverDates.isEmpty,
      s"unexcluded pass left ${leftoverDates.toSeq} uncompacted")
    assert(sink.read(spark).count() == total)
    rows.unpersist()
    ()
  }

  test("within-partition sort gives parquet row-group stats the MergeTree ORDER BY role") {
    val root = Files.createTempDirectory("mt_sorted").toFile
    MergeTreeSink(root.getAbsolutePath).write(parsedEvents, SaveMode.Overwrite)
    val part = root.listFiles().filter(_.getName.startsWith("event_date=")).head
    // The ORDER BY role is per PART (file): each part's row groups must
    // carry tight created_at min/max stats, which needs every FILE
    // sorted internally — exactly MergeTree's contract, where a
    // partition holds many parts, each sorted. (A multi-task parse —
    // the round-16 adaptive spread — writes several parts per date;
    // cross-file order was never the property zone-map pruning uses.)
    val files = part.listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty, "no parquet parts written")
    files.foreach { f =>
      val rows = spark.read.parquet(f.getAbsolutePath)
        .select("created_at").as[java.time.LocalDateTime].collect()
      assert(rows.zip(rows.tail).forall { case (a, b) => !a.isAfter(b) },
        s"rows not sorted by created_at within part ${f.getName}")
    }
  }

  test("date macro resolves and expands over ranges") {
    assert(DatePath.isDaily("/logs/access-{date}.log"))
    assert(!DatePath.isDaily("/logs/access.log"))
    assert(DatePath.resolve("/logs/access-{date}.log", LocalDate.of(2022, 2, 22)) ==
      "/logs/access-2022-02-22.log")
    assert(DatePath.range("/l/{date}", LocalDate.of(2024, 1, 1), LocalDate.of(2024, 1, 3)) ==
      Seq("/l/2024-01-01", "/l/2024-01-02", "/l/2024-01-03"))
  }

  test("backfill reads rotated day files with per-day attribution, skipping missing days") {
    val root = Files.createTempDirectory("backfill").toFile
    val template = s"${root.getAbsolutePath}/access-{date}.log"
    java.nio.file.Files.write(java.nio.file.Paths.get(DatePath.resolve(template, LocalDate.of(2024, 1, 1))),
      "l1\nl2".getBytes)
    // 2024-01-02 intentionally missing
    java.nio.file.Files.write(java.nio.file.Paths.get(DatePath.resolve(template, LocalDate.of(2024, 1, 3))),
      "l3".getBytes)
    val out = graft.sources.LogBackfill
      .read(spark, template, LocalDate.of(2024, 1, 1), LocalDate.of(2024, 1, 3))
      .groupBy("log_date").count().orderBy("log_date")
      .as[(java.sql.Date, Long)].collect().toSeq
    assert(out == Seq((java.sql.Date.valueOf("2024-01-01"), 2L), (java.sql.Date.valueOf("2024-01-03"), 1L)))
  }

  test("multimodal binary plumbing: payload bytes + metadata + stub decode") {
    val docs = Seq((1L, "hi there")).toDF("doc_id", "text")
    val bin = Multimodal.asBinary(docs, "doc_id", "text")
    val meta = bin.select("meta.n_bytes", "meta.magic").head()
    assert(meta.getAs[Int]("n_bytes") == 8)
    assert(meta.getAs[String]("magic") == "68692074") // "hi t"
    val decoded = Multimodal.stubDecode(bin, "doc_id").head()
    val feats = decoded.getAs[scala.collection.Seq[Float]]("features")
    assert(feats.length == 8)
    assert(math.abs(feats.head - 'h'.toInt / 255f) < 1e-6)
  }

  test("PNG/JPEG header decode round-trips synthesized dims, walking variable JPEG segments") {
    val docs = Seq(2L, 3L, 10L, 777L).toDF("doc_id")
    val media = Multimodal.synthesizeMedia(docs, "doc_id")
    val out = Multimodal.decodeHeaders(media, "doc_id").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    // even ids → PNG: w=(id%1024)+1, h=(id*7%1024)+1, IHDR data at byte 16
    // odd ids → JPEG: SOF0 sits past an id-varying COM segment, at 24+(id%8)+1
    assert(out == Seq(
      (2L, "png", 3L, 15L, 16L),
      (3L, "jpeg", 19L, 25L, 28L),
      (10L, "png", 11L, 71L, 16L),
      (777L, "jpeg", 293L, 347L, 26L)))
    // unparseable payloads: wrong signature and truncated marker walks → None
    assert(graft.mm.Multimodal.parseHeader("not a png".getBytes).isEmpty)
    assert(graft.mm.Multimodal.parseHeader(Array(0xFF, 0xD8, 0x00, 0x01).map(_.toByte)).isEmpty)
  }

  test("WAV header decode walks RIFF chunks and round-trips little-endian fields") {
    val docs = Seq(0L, 1L, 2L, 7L).toDF("doc_id")
    val media = Multimodal.synthesizeWav(docs, "doc_id")
    val out = Multimodal.decodeWavHeaders(media, "doc_id").orderBy("doc_id")
      .select("doc_id", "channels", "sample_rate", "bits", "fmt_off")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    // channels = id%2+1, rate = 8000+(id%8)*4000, bits = 16,
    // fmt_off = 20 + JUNK pad of (id%4)*2+2 bytes
    assert(out == Seq(
      (0L, 1L, 8000L, 16L, 22L),
      (1L, 2L, 12000L, 16L, 24L),
      (2L, 1L, 16000L, 16L, 26L),
      (7L, 2L, 36000L, 16L, 28L)))
    assert(Multimodal.parseWavHeader("RIFFnope".getBytes).isEmpty)
    assert(Multimodal.parseWavHeader(Array[Byte]()).isEmpty)
  }

  test("MP4 header decode walks nested boxes to mvhd and round-trips big-endian fields") {
    val docs = Seq(0L, 1L, 5L).toDF("doc_id")
    val media = Multimodal.synthesizeMp4(docs, "doc_id")
    val out = Multimodal.decodeMp4Headers(media, "doc_id").orderBy("doc_id")
      .select("doc_id", "timescale", "duration", "mvhd_off")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // timescale = 1000+(id%10)*100, duration = id*997 % 100000,
    // mvhd_off = 16 (ftyp) + 8+pad (free, pad=(id%6)+1) + 8 (moov hdr)
    assert(out == Seq(
      (0L, 1000L, 0L, 33L),
      (1L, 1100L, 997L, 34L),
      (5L, 1500L, 4985L, 38L)))
    assert(Multimodal.parseMp4Header("not an mp4 file!".getBytes).isEmpty)
    // a box declaring size < 8 cannot advance the walk: must bail, not loop
    val bad = Multimodal.synthesizeMp4(Seq(0L).toDF("doc_id"), "doc_id")
      .select("payload").head().getAs[Array[Byte]](0).clone()
    bad(19) = 2 // free box size -> 2
    assert(Multimodal.parseMp4Header(bad).isEmpty)
  }

  test("MP4 frame sampling walks the full stbl container chain on hand-built bytes") {
    def be(v: Int, n: Int): Array[Byte] =
      (n - 1 to 0 by -1).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray
    def box(cc: String, content: Array[Byte]): Array[Byte] =
      be(8 + content.length, 4) ++ cc.getBytes("US-ASCII") ++ content
    // stsz buried at the REAL depth (moov/trak/mdia/minf/stbl) — the
    // synthesizer flattens it, so this proves the recursive walk
    val stsz = box("stsz", be(0, 4) ++ be(0, 4) ++ be(3, 4) ++ be(2, 4) ++ be(3, 4) ++ be(4, 4))
    val moov = box("moov", box("trak", box("mdia", box("minf", box("stbl", stsz)))))
    val frames = Array[Byte](10, 20, 30, 31, 32, 40, 41, 42, 43)
    val mdat = box("mdat", frames)
    val bytes = box("ftyp", "isom".getBytes("US-ASCII") ++ be(0, 4)) ++ moov ++ mdat
    val mdatData = bytes.length - frames.length
    val got = Multimodal.parseMp4Frames(bytes)
    assert(got.contains(Seq(
      (0L, mdatData.toLong, 2L, 30L),
      (1L, mdatData + 2L, 3L, 93L),
      (2L, mdatData + 5L, 4L, 166L))), s"got $got")
    // stride-2 sampling through the DataFrame op keeps frames 0 and 2
    val media = Seq((7L, bytes)).toDF("doc_id", "payload")
    val sampled = Multimodal.sampleFrames(media, "doc_id", every = 2)
      .orderBy("frame_idx")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(sampled == Seq(
      (7L, 0L, mdatData.toLong, 2L, 30L, 10L),
      (7L, 2L, mdatData + 5L, 4L, 166L, 40L)), s"got $sampled")
    // truncated mdat: declared sizes overrun the payload -> None
    assert(Multimodal.parseMp4Frames(bytes.dropRight(2)).isEmpty)
  }

  test("audio chunking splits on sample boundaries and rejects frame-misaligned data") {
    def le(v: Int, n: Int): Array[Byte] = (0 until n).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray
    def chunk(cc: String, content: Array[Byte]): Array[Byte] =
      cc.getBytes("US-ASCII") ++ le(content.length, 4) ++ content
    // stereo 16-bit: block align 4; 6 frames = 24 PCM bytes (1..24)
    val fmt = chunk("fmt ", le(1, 2) ++ le(2, 2) ++ le(8000, 4) ++ le(32000, 4) ++ le(4, 2) ++ le(16, 2))
    val pcm = (1 to 24).map(_.toByte).toArray
    val data = chunk("data", pcm)
    val bytes = "RIFF".getBytes ++ le(4 + fmt.length + data.length, 4) ++ "WAVE".getBytes ++ fmt ++ data
    val dataStart = 12 + fmt.length + 8
    val got = Multimodal.chunkAudio(Seq((3L, bytes)).toDF("doc_id", "payload"), "doc_id", 4)
      .orderBy("chunk_idx")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // chunk 0: frames 0-3 = bytes 1..16 (sum 136); tail: frames 4-5 =
    // bytes 17..24 (sum 164) — 2 samples, never a half-frame
    assert(got == Seq(
      (3L, 0L, dataStart.toLong, 4L, 136L),
      (3L, 1L, dataStart + 16L, 2L, 164L)), s"got $got")
    // data length not divisible by block align: the row drops
    val badData = chunk("data", pcm.dropRight(1))
    val bad = "RIFF".getBytes ++ le(4 + fmt.length + badData.length, 4) ++ "WAVE".getBytes ++ fmt ++ badData
    assert(Multimodal.chunkAudio(Seq((3L, bad)).toDF("doc_id", "payload"), "doc_id", 4).count() == 0)

    // block align comes from the PARSED bit depth, not an assumed 16:
    // 8-bit mono (ba=1) chunks per byte — 6 samples -> 4 + 2
    val fmt8 = chunk("fmt ", le(1, 2) ++ le(1, 2) ++ le(8000, 4) ++ le(8000, 4) ++ le(1, 2) ++ le(8, 2))
    val pcm8 = (1 to 6).map(_.toByte).toArray
    val data8 = chunk("data", pcm8)
    val b8 = "RIFF".getBytes ++ le(4 + fmt8.length + data8.length, 4) ++ "WAVE".getBytes ++ fmt8 ++ data8
    val start8 = 12 + fmt8.length + 8
    val got8 = Multimodal.chunkAudio(Seq((4L, b8)).toDF("doc_id", "payload"), "doc_id", 4)
      .orderBy("chunk_idx").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got8 == Seq(
      (4L, 0L, start8.toLong, 4L, 10L),
      (4L, 1L, start8 + 4L, 2L, 11L)), s"got $got8")

    // adversarial chunk sizes must TERMINATE the RIFF walk, not spin or
    // reverse it: a u32 size that wraps Int negative (0xFFFFFFFF) and a
    // size far past the payload both drop the row in bounded time
    def withJunkSize(sz: Array[Byte]): Array[Byte] = {
      val junk = "junk".getBytes("US-ASCII") ++ sz ++ le(0, 4)
      "RIFF".getBytes ++ le(4 + junk.length + fmt.length + data.length, 4) ++
        "WAVE".getBytes ++ junk ++ fmt ++ data
    }
    val wrapped = withJunkSize(Array(0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte))
    val overlong = withJunkSize(le(1 << 30, 4))
    assert(Multimodal.chunkAudio(Seq((5L, wrapped)).toDF("doc_id", "payload"), "doc_id", 4).count() == 0)
    assert(Multimodal.chunkAudio(Seq((5L, overlong)).toDF("doc_id", "payload"), "doc_id", 4).count() == 0)
    assert(Multimodal.parseWavHeader(wrapped).isEmpty)
  }

  test("zero-size stsz frames sample without dereferencing past the payload") {
    def be(v: Int, n: Int): Array[Byte] =
      (n - 1 to 0 by -1).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray
    def box(cc: String, content: Array[Byte]): Array[Byte] =
      be(8 + content.length, 4) ++ cc.getBytes("US-ASCII") ++ content
    // frames of size 2, 0, 3 and a TRAILING zero-size frame: its offset
    // equals the payload end — first_byte must not index there
    val stsz = box("stsz", be(0, 4) ++ be(0, 4) ++ be(4, 4) ++
      be(2, 4) ++ be(0, 4) ++ be(3, 4) ++ be(0, 4))
    val moov = box("moov", box("trak", box("mdia", box("minf", box("stbl", stsz)))))
    val frames = Array[Byte](10, 20, 30, 31, 32)
    val bytes = box("ftyp", "isom".getBytes("US-ASCII") ++ be(0, 4)) ++ moov ++ box("mdat", frames)
    val base = (bytes.length - frames.length).toLong
    val got = Multimodal.sampleFrames(Seq((9L, bytes)).toDF("doc_id", "payload"), "doc_id", 1)
      .orderBy("frame_idx").as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (9L, 0L, base, 2L, 30L, 10L),
      (9L, 1L, base + 2L, 0L, 0L, 0L),   // mid-stream zero frame: no byte, fb 0
      (9L, 2L, base + 2L, 3L, 93L, 30L),
      (9L, 3L, base + 5L, 0L, 0L, 0L)), s"got $got") // trailing zero frame at payload end
  }

  test("readAsOf fails loudly on marker-less data dirs and corrupt markers") {
    val root = Files.createTempDirectory("mt_unmarked").toFile
    val sink = MergeTreeSink(root.getAbsolutePath, ttlDays = 10)
    sink.writeBatch(parsedEvents.limit(30), "src_0", 1, Some(100L))
    assert(sink.readAsOf(spark, 100L).count() == 30)
    // simulate a crash between data and marker (or a pre-marker legacy
    // write): data dir present, no commit marker. While the dir is
    // fresh this is indistinguishable from a live writer's data-then-
    // marker commit window, so the snapshot just excludes it...
    val commits = new java.io.File(root, "_commits")
    val marker = commits.listFiles().filter(_.getName.startsWith("src_0")).head
    val stampTxt = new String(java.nio.file.Files.readAllBytes(marker.toPath), "UTF-8")
    assert(marker.delete())
    assert(sink.readAsOf(spark, 100L).count() == 0)
    // ...but once it ages past the in-flight grace window with no
    // marker, every snapshot would silently omit those rows forever —
    // the read must refuse instead
    val batchDir = root.listFiles().filter(_.getName.startsWith("ingest_batch=")).head
    val aged = System.currentTimeMillis() - 2 * graft.sinks.MergeTreeSink.InFlightGraceMs
    // dir mtime aged but data FILES fresh — the object-store analog
    // (S3A reports absent/zero directory mtimes): age comes from the
    // newest data file, so this still reads as a live writer's
    // mid-commit window, excluded from the snapshot but not fatal
    assert(batchDir.setLastModified(aged))
    assert(sink.readAsOf(spark, 100L).count() == 0)
    // the data files aging past the window is what marks a crashed commit
    Files.walk(batchDir.toPath).iterator().forEachRemaining(p => { p.toFile.setLastModified(aged); () })
    val e = intercept[IllegalArgumentException](sink.readAsOf(spark, 100L))
    assert(e.getMessage.contains("without a commit marker"), e.getMessage)
    // a corrupt marker is a descriptive error, not a bare NumberFormatException
    // (NIO writes bypass Hadoop's checksum sidecar — drop the stale .crc)
    def dropCrc(): Unit = { new java.io.File(commits, s".${marker.getName}.crc").delete(); () }
    java.nio.file.Files.write(marker.toPath, "not-a-stamp".getBytes("UTF-8"))
    dropCrc()
    val c = intercept[IllegalStateException](sink.readAsOf(spark, 100L))
    assert(c.getMessage.contains("corrupt commit marker"), c.getMessage)
    // restoring the marker restores the snapshot
    java.nio.file.Files.write(marker.toPath, stampTxt.getBytes("UTF-8"))
    dropCrc()
    assert(sink.readAsOf(spark, 100L).count() == 30)
  }

  test("empty micro-batches leave no residue and never poison time travel") {
    val root = Files.createTempDirectory("mt_emptybatch").toFile
    val sink = MergeTreeSink(root.getAbsolutePath, ttlDays = 10)
    sink.writeBatch(parsedEvents.limit(30), "src_0", 1, Some(100L))
    // an empty micro-batch (tail-from-end's first trigger): Overwrite
    // creates ingest_batch=<key>/ with only _SUCCESS; the sink must
    // clean it up so readAsOf never sees a data-less "uncommitted" dir
    sink.writeBatch(parsedEvents.limit(0), "src_1", 1, Some(200L))
    assert(!root.listFiles().exists(_.getName == "ingest_batch=src_1"))
    assert(sink.readAsOf(spark, 250L).count() == 30)
    // replay-to-empty: a batch that previously landed rows and replays
    // as empty now contributes nothing — its data, marker, and manifest
    // slice are all withdrawn, and snapshots keep working
    sink.writeBatch(parsedEvents.limit(10), "src_2", 1, Some(300L))
    assert(sink.readAsOf(spark, 350L).count() == 40)
    sink.writeBatch(parsedEvents.limit(0), "src_2", 1, Some(400L))
    assert(!root.listFiles().exists(_.getName == "ingest_batch=src_2"))
    assert(!new java.io.File(root, "_commits/src_2").exists())
    assert(sink.readAsOf(spark, 450L).count() == 30)
    assert(sink.read(spark).count() == 30)
  }

  test("freq_topk: Misra-Gries guarantees hold, exact in the small regime, SQL-callable") {
    GraftExtensions.register(spark)
    // skewed fixture: a=1000, b=300, c=100, plus 200 singletons; force
    // partial summaries + merges with an explicit repartition
    val items = Seq.fill(1000)("a") ++ Seq.fill(300)("b") ++ Seq.fill(100)("c") ++
      (0 until 200).map(i => s"x$i")
    val df = items.toDF("item").repartition(8)
    val n = items.size
    val trueCounts = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cap = 8
    val got = df.agg(graft.functions.FreqTopK.topK(col("item"), 8, cap).as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item"), col("e.est")).as[(String, Long)].collect().toMap
    val bound = n.toDouble / (cap + 1)
    got.foreach { case (item, est) =>
      val exact = trueCounts(item)
      assert(est <= exact, s"$item overestimated: $est > $exact")
      assert(exact - est <= bound, s"$item error ${exact - est} exceeds n/(cap+1)=$bound")
    }
    // completeness: every item with true count > n/(cap+1) must appear
    trueCounts.filter(_._2 > bound).keys.foreach { hh =>
      assert(got.contains(hh), s"true heavy hitter $hh missing from $got")
    }
    // small regime (capacity >= cardinality): exact counts, exact top-k
    val smallExact = Seq("a", "a", "a", "b", "b", "c").toDF("item").repartition(3)
      .agg(graft.functions.FreqTopK.topK(col("item"), 2, 8).as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item"), col("e.est")).as[(String, Long)].collect().toSeq
    assert(smallExact == Seq(("a", 3L), ("b", 2L)), s"got $smallExact")
    // SQL registration path
    items.toDF("item").createOrReplaceTempView("ft_items")
    val viaSql = spark.sql("SELECT freq_topk(item, 1, 8) AS tk FROM ft_items")
      .select(explode(col("tk")).as("e")).select(col("e.item")).as[String].head()
    assert(viaSql == "a")
    // analysis-time failures: wrong child type; non-literal k
    import org.apache.spark.sql.AnalysisException
    intercept[AnalysisException](spark.sql("SELECT freq_topk(1, 2, 3)").collect())
    val nonLit = intercept[Exception](
      spark.sql("SELECT freq_topk(item, length(item), 8) FROM ft_items").collect())
    val chain = Iterator.iterate[Throwable](nonLit)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(chain.contains("integer literal"), s"unexpected: $chain")
    ()
  }

  test("filesPerDay > 1 hash-buckets a hot date across multiple files, rows unchanged") {
    val root = Files.createTempDirectory("mt_fpd").toFile
    val sink = MergeTreeSink(root.getAbsolutePath)
    val rows = parsedEvents.cache()
    sink.write(rows, SaveMode.Overwrite, filesPerDay = 8)
    // bucketing is hash-based, so assert fan-out happened somewhere
    // rather than an exact per-date file count
    val maxFiles = root.listFiles().filter(_.getName.startsWith("event_date="))
      .map(_.listFiles().count(_.getName.endsWith(".parquet"))).max
    assert(maxFiles > 1, "hot-date bucketing should produce multiple files for some date")
    assert(sink.read(spark).count() == rows.count())
    rows.unpersist()
    ()
  }

  test("ArrayDot matches HOF null semantics: length mismatch and null elements give null") {
    GraftExtensions.register(spark)
    def one(expr: String): Any =
      spark.sql(s"SELECT $expr AS v").collect().head.get(0)
    // equal lengths: plain dot
    assert(one("array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))") == 11.0)
    // unequal lengths: HOF null-pads -> null; ArrayDot must agree
    assert(one("array_dot(array(1.0d, 2.0d), array(3.0d))") == null)
    assert(one("aggregate(zip_with(array(1.0d, 2.0d), array(3.0d), (x, y) -> x * y), 0d, (a, v) -> a + v)") == null)
    // null element: HOF fold is poisoned -> null; ArrayDot must agree
    assert(one("array_dot(array(1.0d, CAST(NULL AS DOUBLE)), array(3.0d, 4.0d))") == null)
    assert(one("aggregate(zip_with(array(1.0d, CAST(NULL AS DOUBLE)), array(3.0d, 4.0d), (x, y) -> x * y), 0d, (a, v) -> a + v)") == null)
  }

  test("ArrayDot is bit-equal to the HOF fold on randomized vectors (codegen path)") {
    // the optimizer REWRITES user HOF dot products into ArrayDot
    // (DotProductRewrite), so the two must agree bit for bit — not
    // approximately — on arbitrary float content including zeros,
    // subnormals-ish magnitudes, and negatives; driven through a
    // DataFrame so the generated code path runs, not the interpreted eval
    import spark.implicits._
    val rnd = new scala.util.Random(421)
    def vec(n: Int): Seq[Double] =
      Seq.fill(n)(rnd.nextInt(5) match {
        case 0 => 0.0
        case 1 => -math.pow(10, rnd.nextInt(20) - 10) * rnd.nextDouble()
        case _ => math.pow(10, rnd.nextInt(20) - 10) * rnd.nextDouble()
      })
    val rows = (1 to 200).map { i => val n = 1 + rnd.nextInt(96); (i, vec(n), vec(n)) }
    val bad = rows.toDF("id", "a", "b")
      .select(col("id"),
        graft.functions.ArrayDot(col("a"), col("b")).as("fast"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
          lit(0.0), (acc, v) => acc + v).as("slow"))
      .where(col("fast") =!= col("slow")) // bit-inequality: both are one L-to-R fold
      .collect()
    assert(bad.isEmpty, s"ArrayDot diverged from the HOF fold: ${bad.toSeq.take(3)}")
  }

  test("nfc_normalize agrees with the JDK normalizer on randomized decomposed unicode") {
    // the expression's isNormalized fast path must not skip strings
    // that NEED normalization; randomized mixes of precomposed chars,
    // combining marks, Hangul jamo, astral-plane chars, and ASCII
    // drive both the fast and slow paths through codegen
    GraftExtensions.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(31415)
    val pieces = Vector(
      "é", "é", "Å", "Å", "ọ̈", "x",
      "각", "각", "🌈", " ", "ß", "1")
    val texts = (1 to 300).map(_ =>
      Seq.fill(rnd.nextInt(12))(pieces(rnd.nextInt(pieces.size))).mkString)
    val got = texts.toDF("t")
      .select(col("t"), graft.functions.NfcNormalize(col("t")).as("n"))
      .as[(String, String)].collect()
    got.foreach { case (t, n) =>
      val want = java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFC)
      assert(n == want, s"nfc diverged on ${t.map(c => f"\\u$c%04x").mkString}")
    }
    assert(spark.sql("SELECT nfc_normalize(CAST(NULL AS STRING)) v").head.get(0) == null)
    assert(spark.sql("SELECT nfc_normalize('') v").head.getString(0) == "")
  }

  test("custom expressions fail at analysis time on bad inputs, not at runtime") {
    GraftExtensions.register(spark)
    import org.apache.spark.sql.AnalysisException
    def fails(sql: String, fragment: String): Unit = {
      val e = intercept[AnalysisException](spark.sql(s"SELECT $sql").collect())
      assert(e.getMessage.toLowerCase.contains(fragment.toLowerCase),
        s"expected '$fragment' in: ${e.getMessage}")
    }
    // array_dot is strict array<double> — no implicit coercion, so a
    // numeric array that builtins would cast is an analysis error here
    // (previously it produced garbage via getDouble)
    fails("array_dot(array(1, 2), array(3, 4))", "array<double>")
    fails("array_dot(array('a'), array('b'))", "array<double>")
    // regexp_groups: non-string inputs
    fails("regexp_groups(1, 'x')", "string")
    // regexp_groups: pattern must be a literal (it compiles once per
    // operator, not per row)
    val nonFoldable = intercept[AnalysisException] {
      spark.sql("SELECT regexp_groups(t.c, t.c) FROM VALUES ('a') AS t(c)").collect()
    }
    assert(nonFoldable.getMessage.toLowerCase.contains("foldable"))
    // regexp_groups: a foldable NULL pattern fails analysis cleanly
    // instead of NPE-ing inside codegen when patternStr is forced
    fails("regexp_groups('a', CAST(NULL AS STRING))", "non-null pattern")
    // distinct_bigrams: element type must be string
    fails("distinct_bigrams(array(1, 2))", "array<string>")
    // wrong arity is rejected at function resolution (builder throws
    // IllegalArgumentException; the analyzer may surface it wrapped)
    val arity = intercept[Exception](spark.sql("SELECT array_dot(array(1.0d))").collect())
    val chain = Iterator.iterate[Throwable](arity)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(chain.contains("array_dot expects 2 argument(s)"),
      s"unexpected arity error: $chain")
    ()
  }

  test("custom expressions are SQL-callable after registration") {
    GraftExtensions.register(spark)
    val dot = spark.sql("SELECT array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .as[Double].head()
    assert(dot == 11.0)
    val groups = spark.sql(
      """SELECT regexp_groups('[2024-01-01 00:00:00] app.INFO: hi {} []',
        |  '\\[(.*)\\] (\\w+)\\.(\\w+): (.*[^ ]+) ([^ ]+) ([^ ]+)') AS g""".stripMargin)
      .selectExpr("g[2]").as[String].head()
    assert(groups == "INFO")
  }

  test("DistinctBigrams matches the interpreted shingle count corpus-wide and on edge cases") {
    GraftExtensions.register(spark)
    // corpus-wide equivalence drives the CODEGEN path; SQL literals
    // below fold through the interpreted eval path
    val docs = Tables(spark, TestSpark.SfDirSmall, "documents")
    val mismatch = docs.select(
        graft.functions.DistinctBigrams(split(col("text"), " ")).as("fast"),
        size(graft.dedup.Shingles.shingles(col("text"), 2)).as("slow"))
      .where(col("fast") =!= col("slow")).count()
    assert(mismatch == 0, "codegen'd count diverged from the shingle pipeline")
    def one(expr: String): Any = spark.sql(s"SELECT $expr AS v").collect().head.get(0)
    assert(one("distinct_bigrams(array('a','b','a','b'))") == 2) // {"a b", "b a"}
    assert(one("distinct_bigrams(array('x'))") == 0)
    assert(one("distinct_bigrams(CAST(NULL AS array<string>))") == null)
    // null elements follow concat_ws skip semantics, like the shingles
    assert(one("distinct_bigrams(array('a', CAST(NULL AS STRING), 'a'))") == 1)
  }

  test("DistinctBigrams matches the shingle pipeline on randomized dup/null-heavy token arrays") {
    GraftExtensions.register(spark)
    // adversarial token streams: tiny vocabulary (maximal bigram
    // collisions), interleaved nulls (concat_ws skip semantics), empty
    // tokens, and runs — checked against the interpreted shingle count
    val rnd = new scala.util.Random(17)
    val vocab = Seq("a", "b", "ab", "", "aa")
    val cases = Seq.fill(150) {
      (0 until rnd.nextInt(12)).map(_ =>
        if (rnd.nextInt(5) == 0) null else vocab(rnd.nextInt(vocab.size))): Seq[String]
    }
    val mismatch = cases.toDF("toks")
      .select(
        graft.functions.DistinctBigrams(col("toks")).as("fast"),
        size(graft.dedup.Shingles.shingles(concat_ws(" ", col("toks")), 2)).as("slow"),
        col("toks"))
      .where(coalesce(col("fast"), lit(-1)) =!= coalesce(col("slow"), lit(-1)))
      .collect()
    assert(mismatch.isEmpty, s"randomized divergence: ${mismatch.take(3).toSeq}")
  }

  test("freq_topk: Misra-Gries guarantees hold across RANDOM partition splits of the same multiset") {
    GraftExtensions.register(spark)
    // merge correctness under adversarial splits: the same skewed
    // multiset, shuffled and split into random partition counts, must
    // always satisfy the summary guarantees (no overestimate, error
    // ≤ n/(cap+1), every true heavy hitter present) — estimates may
    // legitimately differ per split, the GUARANTEES may not
    val rnd = new scala.util.Random(41)
    val items = Seq.fill(800)("hot") ++ Seq.fill(250)("warm") ++
      (0 until 300).map(i => s"cold${i % 60}") // 60 mid items, 5 each
    val trueCounts = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val n = items.size
    val cap = 8
    val bound = n.toDouble / (cap + 1)
    (1 to 6).foreach { round =>
      val parts = 1 + rnd.nextInt(31)
      val shuffled = rnd.shuffle(items)
      val got = shuffled.toDF("item").repartition(parts)
        .agg(graft.functions.FreqTopK.topK(col("item"), 8, cap).as("tk"))
        .select(explode(col("tk")).as("e"))
        .select(col("e.item"), col("e.est")).as[(String, Long)].collect().toMap
      got.foreach { case (item, est) =>
        assert(est <= trueCounts(item), s"round $round parts=$parts: $item overestimated")
        assert(trueCounts(item) - est <= bound,
          s"round $round parts=$parts: $item error beyond n/(cap+1)")
      }
      trueCounts.filter(_._2 > bound).keys.foreach { hh =>
        assert(got.contains(hh), s"round $round parts=$parts: heavy hitter $hh missing")
      }
    }
  }

  test("custom TopKPerKey operator matches the window route; plan shows two-phase exec") {
    import org.apache.spark.sql.expressions.Window
    val li = Tables(spark, TestSpark.SfDir, "lineitem")
      .select("l_returnflag", "l_linestatus", "l_orderkey", "l_extendedprice")
    val custom = graft.plans.TopK.perKey(
      li, Seq("l_returnflag", "l_linestatus"), "l_extendedprice", 3)
    val plan = custom.queryExecution.executedPlan.toString
    // physical nodes render without the Exec suffix
    assert("TopKPerKey ".r.findAllIn(plan).size == 2, s"expected partial+global phases:\n$plan")
    assert(plan.contains("Exchange hashpartitioning"), s"no key exchange between phases:\n$plan")

    val w = Window.partitionBy("l_returnflag", "l_linestatus").orderBy(col("l_extendedprice").desc)
    val viaWindow = li.withColumn("rn", row_number().over(w)).where(col("rn") <= 3).drop("rn")
    // compare as sorted multisets of (key, score) — row order is
    // unspecified and k-th-place ties may pick different orderkeys
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select("l_returnflag", "l_linestatus", "l_extendedprice")
      .collect().map(_.toString).sorted.toSeq
    val a = canon(custom)
    val b = canon(viaWindow)
    assert(a == b, s"custom=${a.take(3)} window=${b.take(3)}")
  }

  test("TopKPerKey partial-phase key cap degrades to pass-through without changing results") {
    val li = Tables(spark, TestSpark.SfDirSmall, "lineitem")
      .select("l_returnflag", "l_linestatus", "l_extendedprice")
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select("l_returnflag", "l_linestatus", "l_extendedprice")
      .collect().map(_.toString).sorted.toSeq
    val uncapped = canon(graft.plans.TopK.perKey(
      li, Seq("l_returnflag", "l_linestatus"), "l_extendedprice", 3))
    // cap of 1 tracked key per task: nearly every row passes through
    // the partial phase uncombined — the global phase must still
    // produce the identical top-k
    val capped = canon(graft.plans.TopK.perKey(
      li, Seq("l_returnflag", "l_linestatus"), "l_extendedprice", 3, maxPartialKeys = 1))
    assert(capped == uncapped)
  }

  test("TopKPerKey global phase streams key-sorted groups: O(k) merge at high cardinality") {
    import org.apache.spark.sql.expressions.Window
    // key cardinality (~thousands of orderkeys) far past the partial
    // cap of 10: nearly everything reaches the global phase uncombined,
    // which must still merge with a single reused k-heap over SORTED
    // input — the plan proves the Sort is planted, the window route
    // proves the answer
    val li = Tables(spark, TestSpark.SfDirSmall, "lineitem").select("l_orderkey", "l_extendedprice")
    val custom = graft.plans.TopK.perKey(li, Seq("l_orderkey"), "l_extendedprice", 2,
      maxPartialKeys = 10)
    val plan = custom.queryExecution.executedPlan.toString
    assert(plan.contains("Sort "), s"global phase must demand key-sorted (spillable) input:\n$plan")
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select("l_orderkey", "l_extendedprice").collect().map(_.toString).sorted.toSeq
    val w = Window.partitionBy("l_orderkey").orderBy(col("l_extendedprice").desc)
    val viaWindow = li.withColumn("rn", row_number().over(w)).where(col("rn") <= 2).drop("rn")
    assert(canon(custom) == canon(viaWindow))
  }

  test("bucketed range join matches the naive interval join, as an equi join") {
    val ev = Tables(spark, TestSpark.SfDir, "events").select("event_id", "value")
    val iv = Seq((0.0, 7.5, "lo"), (7.5, 30.0, "mid"), (30.0, 1000.0, "hi"))
      .toDF("lo", "hi", "label")
    val naive = ev.join(iv, col("value") >= col("lo") && col("value") < col("hi"))
      .select("event_id", "label").collect().map(_.toString).sorted.toSeq
    val bucketed = graft.ops.RangeJoin.bucketed(ev, iv, "value", "lo", "hi", bucketSize = 10.0)
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to nested loop:\n$plan")
    val got = bucketed.select("event_id", "label").collect().map(_.toString).sorted.toSeq
    assert(got == naive)
  }

  test("as-of join picks the latest preceding right row per key, null when none") {
    val left = Seq((1L, "u1", 100L), (2L, "u1", 250L), (3L, "u2", 50L))
      .toDF("id", "k", "t")
    val right = Seq(("u1", 90L, "a"), ("u1", 200L, "b"), ("u1", 300L, "c"), ("u3", 10L, "x"))
      .toDF("k", "t", "v")
    val out = graft.ops.AsOfJoin
      .lastBefore(left, right, "k", "k", "t", "t", carry = Seq("v"))
      .orderBy("id").select("id", "v").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "a"), (2L, "b"), (3L, null)))
    // boundary: a right row exactly AT the left time matches (<=)
    val eq = graft.ops.AsOfJoin
      .lastBefore(Seq((9L, "u1", 200L)).toDF("id", "k", "t"), right, "k", "k", "t", "t", Seq("v"))
      .select("v").as[String].head()
    assert(eq == "b")
  }

  test("salted join matches the plain join result (skew mitigation)") {
    val li = Tables(spark, TestSpark.SfDirSmall, "lineitem").select("l_orderkey", "l_quantity")
    val o = Tables(spark, TestSpark.SfDirSmall, "orders").select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val plain = li.join(o, Seq("l_orderkey"))
      .groupBy("l_orderkey").count().orderBy("l_orderkey").collect()
    val salted = graft.ops.SaltedJoin.join(li, o, "l_orderkey", nSalts = 8)
      .groupBy("l_orderkey").count().orderBy("l_orderkey").collect()
    assert(plain.sameElements(salted))
  }

  test("BucketedStore layout: one file per bucket, idempotent, exchange-free join, oracle-equal") {
    val dir = TestSpark.SfDirSmall
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_").toLowerCase
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // the registry query itself is the write path (materializeOnce
      // both sides) — run it first so the layout exists
      val out = SparkEntry.queries("bucketed_join")(spark, dir).collect()
      assert(out.nonEmpty)
      val a = spark.table(s"graft_bkt_lineitem_$tag")
      val b = spark.table(s"graft_bkt_orders_$tag")
      // one file per bucket (the pre-write repartition at work): more
      // files would both storm an object-store listing at scale and
      // void the scan's outputOrdering, resurrecting the Sort
      assert(a.inputFiles.length == 8, s"lineitem layout has ${a.inputFiles.length} files, want 8")
      assert(b.inputFiles.length == 8, s"orders layout has ${b.inputFiles.length} files, want 8")
      // the join subtree: no Exchange on either side — the scans'
      // HashPartitioning satisfies the merge join's distribution
      // outright. Any Sort that remains must be partition-local
      // (global=false): Spark only propagates bucket sort order behind
      // spark.sql.legacy.bucketedTableScan.outputOrdering, so the
      // default plan re-sorts within partitions — linear, no shuffle.
      val j = a.join(b, a("l_orderkey") === b("o_orderkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected a merge join:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(!plan.split("\n").exists(l => l.contains("Sort [") && l.contains(" true,")),
        s"no GLOBAL sort may appear over a bucketed scan:\n$plan")
      // idempotence: a second materializeOnce reuses the files already
      // written (no rewrite — same file set)
      val again = graft.ops.BucketedStore.materializeOnce(
        Tables(spark, dir, "lineitem").select("l_orderkey", "l_quantity", "l_extendedprice"),
        name = s"graft_bkt_lineitem_$tag", key = "l_orderkey", buckets = 8)
      assert(again.inputFiles.sorted.toSeq == a.inputFiles.sorted.toSeq,
        "second materializeOnce must reuse the layout, not rewrite it")
      // the layout changes the plan, not the answer: same aggregate
      // from the raw (unbucketed) tables
      val naive = Tables(spark, dir, "lineitem")
        .join(Tables(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_items"),
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_price"))
        .orderBy(col("o_orderpriority")).collect()
      assert(out.toSeq == naive.toSeq, "bucketed result must equal the plain-join result")
      // guard rails: unsafe names and non-positive bucket counts throw
      intercept[IllegalArgumentException] {
        graft.ops.BucketedStore.materializeOnce(a, "bad name; drop", "l_orderkey", 8)
      }
      intercept[IllegalArgumentException] {
        graft.ops.BucketedStore.materializeOnce(a, "ok_name", "l_orderkey", 0)
      }
      ()
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("snapshot_diff over bucketed snapshots: FULL OUTER join plans zero Exchange, result unchanged") {
    // SURVEY §5's claim that snapshot diff is "co-locatable when
    // snapshots are bucketed", made a plan assertion: write both
    // snapshot versions through BucketedStore on the diff key and the
    // FULL OUTER join — the diff's one shuffle — disappears entirely.
    // At 100 TB this converts every nightly diff from two corpus
    // shuffles into two bucketed scans.
    val dir = TestSpark.SfDirSmall
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_").toLowerCase
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val ord = Tables(spark, dir, "orders").select("o_orderkey", "o_totalprice")
      val oldSnap = ord.where(pmod(col("o_orderkey"), lit(97)) =!= 0)
      val newSnap = ord.where(pmod(col("o_orderkey"), lit(89)) =!= 0)
        .withColumn("o_totalprice",
          when(pmod(col("o_orderkey"), lit(7)) === 0, round(col("o_totalprice") * 1.1, 2))
            .otherwise(col("o_totalprice")))
      val a = graft.ops.BucketedStore.materializeOnce(
        oldSnap, s"graft_bkt_snap_old_$tag", "o_orderkey", 8)
      val b = graft.ops.BucketedStore.materializeOnce(
        newSnap, s"graft_bkt_snap_new_$tag", "o_orderkey", 8)
      def classify(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame) =
        l.as("a").join(r.as("b"), col("a.o_orderkey") === col("b.o_orderkey"), "full_outer")
          .select(
            when(col("a.o_orderkey").isNull, lit("added"))
              .when(col("b.o_orderkey").isNull, lit("removed"))
              .when(col("a.o_totalprice") =!= col("b.o_totalprice"), lit("changed"))
              .otherwise(lit("unchanged")).as("change_type"),
            coalesce(col("a.o_orderkey"), col("b.o_orderkey")).as("key"))
          .groupBy("change_type")
          .agg(count(lit(1)).as("n"), min(col("key")).as("first_key"), max(col("key")).as("last_key"))
          .orderBy("change_type")
      val diff = classify(a, b)
      // the JOIN subtree is exchange-free (scans' HashPartitioning
      // satisfies the full-outer merge join's distribution); assert on
      // the bare join — the 4-row aggregate/sort above it in the full
      // query legitimately shuffles its stats-sized input
      val bare = a.as("a").join(b.as("b"),
        col("a.o_orderkey") === col("b.o_orderkey"), "full_outer")
      val plan = bare.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected a merge join:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed snapshot diff must not shuffle the snapshots:\n$plan")
      // co-location changes the plan, not the answer: equal to the
      // registry query (raw scans, shuffled join) on the same slices
      val viaRegistry = SparkEntry.queries("snapshot_diff")(spark, dir)
        .collect().map(_.toString).toSeq
      assert(diff.collect().map(_.toString).toSeq == viaRegistry,
        "bucketed diff result must equal the registry snapshot_diff")
      ()
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("optimizer rule rewrites HOF dot products to the codegen'd ArrayDot") {
    GraftExtensions.register(spark)
    // parquet-backed input so ConvertToLocalRelation can't fold the
    // whole expression away before the plan is inspectable
    val df = Tables(spark, TestSpark.SfDir, "embeddings")
      .selectExpr("CAST(embedding AS array<double>) AS a")
      .selectExpr("aggregate(zip_with(a, a, (x, y) -> x * y), 0d, (acc, v) -> acc + v) AS d")
    assert(df.queryExecution.optimizedPlan.toString.toLowerCase.contains("arraydot"),
      s"rewrite did not fire:\n${df.queryExecution.optimizedPlan}")
    val viaHof = df.orderBy("d").as[Double].head()
    val viaDot = Tables(spark, TestSpark.SfDir, "embeddings")
      .selectExpr("CAST(embedding AS array<double>) AS a")
      .select(graft.functions.ArrayDot(col("a"), col("a")).as("d"))
      .orderBy("d").as[Double].head()
    assert(viaHof == viaDot)
  }

  test("ClickHouse JDBC dedup tokens are replay-stable, block-unique, and SET-safe") {
    import graft.sinks.ClickHouseJdbcSink
    // pure function of (batchKey, partition, chunk): replays regenerate it
    assert(ClickHouseJdbcSink.deduplicationToken("access_7", 3, 2L) ==
      ClickHouseJdbcSink.deduplicationToken("access_7", 3, 2L))
    assert(ClickHouseJdbcSink.deduplicationToken("access_7", 3, 2L) == "graft_access_7_p3_c2")
    // unique across blocks: any coordinate change changes the token
    val base = ClickHouseJdbcSink.deduplicationToken("access_7", 3, 2L)
    assert(ClickHouseJdbcSink.deduplicationToken("access_8", 3, 2L) != base)
    assert(ClickHouseJdbcSink.deduplicationToken("access_7", 4, 2L) != base)
    assert(ClickHouseJdbcSink.deduplicationToken("access_7", 3, 3L) != base)
    // daily-rotated batch keys (with the day infix) are accepted
    assert(ClickHouseJdbcSink.deduplicationToken("access_2024-01-01_0", 0, 0L)
      .matches("[A-Za-z0-9_-]+"))
    // a key that could escape its URL-parameter transport is rejected outright
    intercept[IllegalArgumentException] {
      ClickHouseJdbcSink.deduplicationToken("x'; DROP TABLE logs", 0, 0L)
    }
    ()
  }

  test("ClickHouse settings ride the connection URL, not session SET statements") {
    import graft.sinks.ClickHouseJdbcSink
    // settings attach as query parameters so they apply per-request on
    // every interface (HTTP included) — no server session required
    val plain = ClickHouseJdbcSink.urlWithSettings(
      "jdbc:clickhouse://ch:8123/logs",
      Seq("max_insert_block_size" -> "100000",
          "insert_deduplication_token" -> "graft_access_7_p3_c2"))
    assert(plain == "jdbc:clickhouse://ch:8123/logs" +
      "?max_insert_block_size=100000&insert_deduplication_token=graft_access_7_p3_c2")
    // a URL that already carries parameters gets '&', not a second '?'
    val appended = ClickHouseJdbcSink.urlWithSettings(
      "jdbc:clickhouse://ch:8123/logs?compress=0", Seq("a_b" -> "1"))
    assert(appended == "jdbc:clickhouse://ch:8123/logs?compress=0&a_b=1")
    // no settings → URL unchanged
    assert(ClickHouseJdbcSink.urlWithSettings("jdbc:clickhouse://ch", Nil) ==
      "jdbc:clickhouse://ch")
    // values that would escape the URL are rejected, not smuggled
    intercept[IllegalArgumentException] {
      ClickHouseJdbcSink.urlWithSettings("jdbc:clickhouse://ch",
        Seq("insert_deduplication_token" -> "x&readonly=0"))
    }
    ()
  }

  test("ClickHouse JDBC insert uses an explicit column list matching the batch schema") {
    val schema = parsedEvents.schema
    val sql = graft.sinks.ClickHouseJdbcSink.insertSql("logs.monolog", schema)
    assert(sql.startsWith("INSERT INTO logs.monolog (`created_at`"))
    assert(sql.count(_ == '?') == schema.fields.length)
    assert(schema.fields.forall(f => sql.contains(s"`${f.name}`")))
  }

  test("ClickHouse JDBC routing is content-deterministic across evaluations") {
    // the exactly-once construction rests on a replay producing the
    // identical (partition, position) for every row: evaluate the
    // routing twice (separate jobs, like an attempt and its retry) and
    // compare the full layout
    val batch = parsedEvents.limit(500)
    def layout() = graft.sinks.ClickHouseJdbcSink.routeDeterministic(batch, 4)
      .select(org.apache.spark.sql.functions.spark_partition_id().as("pid"), col("message"))
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    val a = layout()
    val b = layout()
    assert(a == b, "replayed routing diverged — chunk tokens would mislabel blocks")
    assert(a.map(_._1).distinct.size > 1, "expected fan-out across writer partitions")
  }

  test("no shipped query plans an all-pairs join (blanket BNLJ/cartesian guard)") {
    // The brief bans O(n²) pair plans at 100 TB; this guards every
    // registry entry, present and future, not just the dedup family.
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, TestSpark.SfDirSmall).queryExecution.executedPlan.toString
      if (plan.contains("BroadcastNestedLoopJoin") || plan.contains("CartesianProduct"))
        Some(name)
      else None
    }
    assert(offenders.isEmpty, s"all-pairs join shipped in: $offenders")
  }

  test("results are invariant to shuffle partition count (AQE re-plans at scale)") {
    // At 100 TB, AQE coalesces/splits partitions at runtime — any
    // result that silently depends on the partition count (zipWithIndex
    // misuse, per-partition RNG, non-commutative merge) is a cluster
    // bug that local[4]-only testing never sees. Representative set:
    // the order-assigning ops (shuffle/packing), an iterative op
    // (clusters), a sketch (minhash), and a collected-stats op (bm25).
    val names = Seq("corpus_shuffle", "pack_chunks", "dedup_clusters", "dedup_minhash", "bm25_search")
    def run(name: String): Seq[String] =
      SparkEntry.queries(name)(spark, TestSpark.SfDirSmall)
        .collect().map(_.toString).sorted.toSeq
    val at4 = names.map(n => n -> run(n)).toMap
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      names.foreach { n =>
        assert(run(n) == at4(n), s"$n changed results when shuffle partitions changed 4 -> 7")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("plan-regression guard: headline queries keep their shuffle-exchange budgets") {
    // Every shuffle is a full-data network pass at 100 TB; a plan that
    // silently acquires one (lost broadcast, dropped partial agg, an
    // extra repartition) should fail the build, not wait for the
    // bench. Budgets are the measured counts of the plans as designed
    // — raise one only with a reason, never to make the light green.
    val budgets = Seq(
      "parse_monolog" -> 2,   // adaptive under-parallel-input spread (Spread.toCores,
                              // round 16 — fires only when the scan has fewer
                              // partitions than cores, so it is absent at scale)
                              // + the final ORDER BY range exchange
      "q1_agg" -> 2,          // partial→final agg + sort
      "q3_join" -> 1,         // dims broadcast; one order/lineitem-side shuffle
      "q5_join" -> 2,         // dims broadcast; fact-side agg shuffles
      "dedup_minhash" -> 2,   // ids-only band bucket join + output sort (sig agg runs at the checkpoint, not in-plan)
      "topk_custom" -> 2,     // inter-phase key exchange + final agg/sort
      "text_repetition" -> 1, // row-local map; ORDER BY only
      "dedup_exact" -> 2,
      "sample_hash" -> 1,
      "sample_weighted" -> 0,   // TakeOrderedAndProject leaves a single partition; even the gate sort needs no exchange
      "dedup_paragraphs" -> 3,  // content-keyed window + reassembly agg + gate sort
      "dedup_incremental" -> 2, // bipartite band join + output sort (both sig stores checkpointed)
      "text_unigram_nll" -> 3,  // freq agg + per-doc agg + gate sort (freq side broadcasts; the total is a collected literal)
      "decontaminate_bloom" -> 2, // bloom prefilter is a row-local Filter; verify join broadcasts; per-doc agg + gate sort
      "vocab_topk" -> 3,          // freq agg + single-partition window over the top-k + gate sort
      "length_buckets" -> 2,      // bucket agg + gate sort
      "bm25_search" -> 0,         // stats are collected literals; scoring scan + TakeOrderedAndProject, no exchange at all
      "bpe_merges" -> 2,          // word-freq agg + pair agg (top-k is TakeOrdered)
      "chunk_overlap" -> 1,       // row-local slicing; gate ORDER BY only
      "dedup_ngram_jaccard" -> 4) // prefix self-join + candidate distinct + verify joins + gate sort (set store checkpointed)
    val over = budgets.flatMap { case (name, budget) =>
      val plan = SparkEntry.queries(name)(spark, TestSpark.SfDirSmall)
        .queryExecution.executedPlan.toString
      // count shuffle exchanges only — broadcasts are the cheap kind
      // we WANT plans to keep
      val got = """(?<!Broadcast)Exchange """.r.findAllIn(plan).size
      if (got > budget) Some(s"$name: $got shuffles, budget $budget") else None
    }
    assert(over.isEmpty, s"plans acquired extra shuffles: $over")
  }

  test("verify guard deletes empty precision-oracle dumps so the compare fails, keeps non-empty ones") {
    val out = Files.createTempDirectory("verify_guard").toFile
    // dedup_minhash's oracle reads graft_result over the non-empty
    // documents table: an empty dump is the vacuous-green regression
    // the guard exists for (ADVICE r4) and must be flagged + deleted
    Seq.empty[(Long, Long)].toDF("a", "b").write.parquet(s"$out/dedup_minhash")
    // a non-empty precision dump must survive untouched
    Seq((1L, 2L)).toDF("a", "b").write.parquet(s"$out/ann_lsh")
    val failed = Verify.failEmptyPrecisionDumps(spark, TestSpark.SfDirSmall, out.getAbsolutePath)
    assert(failed == Seq("dedup_minhash"), s"guard flagged: $failed")
    assert(!new java.io.File(out, "dedup_minhash").exists(), "empty dump not deleted")
    assert(new java.io.File(out, "ann_lsh").exists(), "non-empty dump must survive")
  }

  test("decontaminate broadcasts the eval-gram side (no fact-side shuffle before the count)") {
    val plan = SparkEntry.queries("decontaminate")(spark, TestSpark.SfDirSmall)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"eval grams not broadcast:\n$plan")
  }

  test("bloom decontamination prefilters with a row-local Filter, not an extra join") {
    val plan = SparkEntry.queries("decontaminate_bloom")(spark, TestSpark.SfDirSmall)
      .queryExecution.executedPlan.toString
    // exactly one join in the whole plan: the exact verify of survivors
    val joins = "Join".r.findAllIn(plan).size
    assert(joins == 1, s"expected the single verify join, got $joins:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"verify join should broadcast here:\n$plan")
    // the bit-probe prefilter runs as a plain Filter over the shingles
    assert(plan.contains("Filter"), s"bloom prefilter missing:\n$plan")
  }

  test("ReplacingSink: latest-wins upsert, idempotent replay, compaction preserves FINAL") {
    val root = Files.createTempDirectory("rs_sink").toFile.getAbsolutePath
    val sink = graft.sinks.ReplacingSink(root, keyCols = Seq("k"), versionCols = Seq("ver", "id"))
    // wave 0: k=a v1, k=b v1; wave 1 (out of order): k=a v3 then k=a v2
    sink.append(Seq(("a", 1L, 10L, "a-v1"), ("b", 1L, 11L, "b-v1")).toDF("k", "ver", "id", "payload"), "w0")
    sink.append(Seq(("a", 3L, 12L, "a-v3"), ("a", 2L, 13L, "a-v2")).toDF("k", "ver", "id", "payload"), "w1")
    def finalRows = sink.readFinal(spark).orderBy("k")
      .as[(String, Long, Long, String)].collect().toSeq
    val expect = Seq(("a", 3L, 12L, "a-v3"), ("b", 1L, 11L, "b-v1"))
    assert(finalRows == expect)
    assert(sink.readRaw(spark).count() == 4, "raw read must keep every version")
    // FINAL plan: partial max_by collapses versions map-side BEFORE the
    // key shuffle (the scalable merge-on-read shape; a window would
    // move every version across the wire first)
    val plan = sink.readFinal(spark).queryExecution.executedPlan.toString
    assert(plan.contains("partial_max_by"), s"no map-side partial collapse in FINAL read:\n$plan")
    assert(!plan.contains("Window"), s"FINAL must not plan a window:\n$plan")
    // replay of wave 1 (same batch key) is a no-op-equivalent rewrite
    sink.append(Seq(("a", 3L, 12L, "a-v3"), ("a", 2L, 13L, "a-v2")).toDF("k", "ver", "id", "payload"), "w1")
    assert(sink.readRaw(spark).count() == 4, "batch replay must not duplicate versions")
    assert(finalRows == expect)
    // background merge: raw collapses to FINAL, FINAL unchanged, and
    // upserts keep working afterwards
    sink.compact(spark)
    assert(sink.readRaw(spark).orderBy("k").as[(String, Long, Long, String)].collect().toSeq == expect)
    assert(finalRows == expect)
    sink.append(Seq(("b", 9L, 14L, "b-v9")).toDF("k", "ver", "id", "payload"), "w2")
    assert(finalRows == Seq(("a", 3L, 12L, "a-v3"), ("b", 9L, 14L, "b-v9")))
  }

  test("no shipped plan forces a broadcast hint on a scale-growing relation") {
    // The 100x brief: a FORCED broadcast() on a relation that grows
    // with the corpus (the full customer table, an edge-proportional
    // adjacency) bypasses AQE's runtime size check and is a guaranteed
    // executor OOM at scale. Hints.maybeBroadcast size-gates such
    // hints; this guard proves no ungated one ships. With the auto
    // threshold disabled the gate passes everything through, so every
    // ResolvedHint left in an analyzed plan is a FORCED broadcast —
    // allowed only on relations bounded BY CONSTRUCTION: the
    // scale-invariant dimension tables (nation/region), driver-literal
    // locals, groupless (≤1-row) aggregates, explicit limits, and
    // rank-filtered per-probe shortlists (bounded by the probe-batch
    // contract of the ANN family).
    import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeSet, Rank, RowNumber, WindowExpression}
    import org.apache.spark.sql.catalyst.plans.logical._

    def boundedLeaf(p: LogicalPlan): Boolean = p match {
      case _: LocalRelation => true
      case _: OneRowRelation => true
      case _: Range => true
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.nonEmpty && fs.location.rootPaths.forall { rp =>
              val s = rp.toString
              s.endsWith("nation.parquet") || s.endsWith("region.parquet")
            }
          case _ => false
        }
      case _ => false
    }
    // attributes produced by a row_number()/rank() directly below (a
    // filter on one is a structural per-partition top-k)
    def rankAttrs(p: LogicalPlan): AttributeSet = p match {
      case w: Window => AttributeSet(w.windowExpressions.collect {
        case a @ Alias(WindowExpression(_: RowNumber | _: Rank, _), _) => a.toAttribute
      })
      case u: UnaryNode => rankAttrs(u.child)
      case _ => AttributeSet.empty
    }
    def bounded(p: LogicalPlan): Boolean = p match {
      case a: Aggregate if a.groupingExpressions.isEmpty => true
      case _: GlobalLimit => true
      case f: Filter if f.condition.references.intersect(rankAttrs(f.child)).nonEmpty => true
      case leaf: LeafNode => boundedLeaf(leaf)
      case j: Join => bounded(j.left) && bounded(j.right)
      case u: UnaryNode => bounded(u.child)
      case other => other.children.nonEmpty && other.children.forall(bounded)
    }

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val offenders = try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
        val analyzed = fn(spark, TestSpark.SfDirSmall).queryExecution.analyzed
        analyzed.collect {
          case h: ResolvedHint if h.hints.strategy.contains(BROADCAST) && !bounded(h.child) =>
            s"$name: forced broadcast on:\n  ${h.child.nodeName} <- " +
              h.child.collectLeaves().map(_.nodeName).mkString(", ")
        }
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert(offenders.isEmpty,
      s"forced broadcast hints on scale-growing relations:\n${offenders.mkString("\n")}")
  }

  test("Hints.maybeBroadcast hints under the threshold, passes through over it") {
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val small = spark.range(10).toDF("id")
    assert(Hints.maybeBroadcast(small).queryExecution.analyzed.isInstanceOf[ResolvedHint],
      "small relation should carry the broadcast hint")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      assert(!Hints.maybeBroadcast(small).queryExecution.analyzed.isInstanceOf[ResolvedHint],
        "disabled threshold must suppress the hint (AQE decides)")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
      val big = Tables(spark, TestSpark.SfDirSmall, "customer")
      assert(!Hints.maybeBroadcast(big).queryExecution.analyzed.isInstanceOf[ResolvedHint],
        "over-threshold relation must not be hinted")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("Store.materialize: reliable path-backed store matches localCheckpoint results") {
    val root = Files.createTempDirectory("graft_store").toFile.getAbsolutePath
    val df = Tables(spark, TestSpark.SfDirSmall, "documents").select("doc_id", "source")
    val default = Store.materialize(df).orderBy("doc_id").collect()
    try {
      spark.conf.set(Store.PathConf, root)
      val reliable = Store.materialize(df)
      assert(reliable.orderBy("doc_id").collect().sameElements(default),
        "path-backed store changed the relation")
      val dirs = new java.io.File(root).listFiles()
      assert(dirs != null && dirs.exists(_.getName.startsWith("store-")),
        s"no store directory written under $root")
      // the store cuts lineage at a file scan, not a localCheckpoint
      assert(reliable.queryExecution.optimizedPlan.collectLeaves()
        .forall(l => !l.toString.contains("LogicalRDD")),
        "reliable store should bottom out in a parquet scan")
      // an iterative consumer (dedup_clusters rounds run through the
      // same helper) produces identical output either way
      val clustersDefault = {
        spark.conf.unset(Store.PathConf)
        SparkEntry.queries("dedup_clusters")(spark, TestSpark.SfDirSmall).collect()
      }
      spark.conf.set(Store.PathConf, root)
      val clustersReliable =
        SparkEntry.queries("dedup_clusters")(spark, TestSpark.SfDirSmall).collect()
      assert(clustersReliable.sameElements(clustersDefault),
        "dedup_clusters diverged under the path-backed store")
      // retention: sweep reclaims only aged store-dirs, never neighbors
      val rootF = new java.io.File(root)
      val neighbor = new java.io.File(rootF, "not_a_store"); neighbor.mkdir()
      val before = rootF.listFiles().count(_.getName.startsWith("store-"))
      assert(before > 0)
      assert(Store.sweep(spark, root, olderThanMillis = Long.MaxValue).isEmpty,
        "nothing is old enough under an infinite horizon")
      val swept = Store.sweep(spark, root, olderThanMillis = -1L)
      assert(swept.size == before, s"swept ${swept.size} of $before store dirs")
      assert(rootF.listFiles().map(_.getName).toSeq == Seq("not_a_store"),
        "sweep must leave non-store directories untouched")
    } finally spark.conf.unset(Store.PathConf)
  }

  test("bench drift core: same-sf ratios, wrong-sf None, malformed throws (never silently wrong)") {
    // 25 shared queries: 24 at exactly 1.2x, one at 4x → median 1.2,
    // one over the 3x line
    val names = (1 to 25).map(i => f"q$i%02d")
    val prevQs = names.map(n => s""""$n":1.0""").mkString(",")
    val prevTxt = s"""{"metric":"total","value":25.0,"queries":{$prevQs},"errors":{},"sf":"/data/sf0.1"}"""
    val timings = names.map(n => n -> (if (n == "q25") 4.0 else 1.2)).toMap
    assert(Bench.driftVsPrev(prevTxt, "/data/sf0.1", timings) == Some((1.2, 1)))
    // a different sf is not comparable — absent, not a bogus ratio
    assert(Bench.driftVsPrev(prevTxt, "/data/sf0.01", timings).isEmpty)
    // under 20 shared queries: not meaningful
    assert(Bench.driftVsPrev(prevTxt, "/data/sf0.1", timings.view.take(10).toMap).isEmpty)
    // zero-time prior rows never divide
    val withZero = prevTxt.replace(""""q01":1.0""", """"q01":0.0""")
    assert(Bench.driftVsPrev(withZero, "/data/sf0.1", timings).isDefined)
    // malformed artifact THROWS (caller logs it) instead of degrading
    // into a silent None that hides a broken drift feature
    intercept[Exception] {
      Bench.driftVsPrev("""{"not":"an artifact","sf":"/data/sf0.1"}""", "/data/sf0.1", timings)
    }
    // an sfDir needing JSON escaping still matches its own recording:
    // the comparator must use the same escaped form the writer emits
    val oddSf = """/data/sf"0.1\x"""
    val oddTxt = s"""{"metric":"total","value":25.0,"queries":{$prevQs},"errors":{},"sf":${Bench.jstr(oddSf)}}"""
    assert(Bench.driftVsPrev(oddTxt, oddSf, timings) == Some((1.2, 1)),
      "escaped sf dir must not silently disable drift")
    ()
  }

  test("q5 plan broadcasts dimension joins; q1 pushes the date filter to the scan") {
    val q5 = SparkEntry.queries("q5_join")(spark, TestSpark.SfDirSmall)
    val p5 = q5.queryExecution.executedPlan.toString
    assert(p5.contains("BroadcastHashJoin"), s"no broadcast join:\n$p5")
    val q1 = SparkEntry.queries("q1_agg")(spark, TestSpark.SfDirSmall)
    val p1 = q1.queryExecution.executedPlan.toString
    assert(p1.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"date filter not pushed to parquet scan:\n$p1")
  }
}
