package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Funnel
import graft.sources.ZoneMap

/** Funnel / retention / CMS / zone-map — the round-9 analytics rows. */
class AnalyticsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // ------------------------------------------------------------ funnel

  private val Steps = Seq("a", "b", "c")

  private def funnelOf(rows: Seq[(Long, String, Long)], window: Long) = {
    val df = rows.toDF("k", "et", "micros")
      .select(col("k"), col("et"), timestamp_micros(col("micros")).as("ts"))
    Funnel.levels(df, col("k"), col("et"), col("ts"), Steps, window)
      .as[(Long, Int)].collect().toMap
  }

  /** Exists-a-chain reference semantics, brute force: largest k with
    * t1 <= ... <= tk, step types in order, tk - t1 <= window.
    */
  private def bruteLevel(evs: Seq[(String, Long)], window: Long): Int = {
    val byStep = Steps.map(st => evs.collect { case (`st`, t) => t })
    val l3 = for {
      t1 <- byStep(0); t2 <- byStep(1); t3 <- byStep(2)
      if t1 <= t2 && t2 <= t3 && t3 - t1 <= window
    } yield ()
    val l2 = for {
      t1 <- byStep(0); t2 <- byStep(1)
      if t1 <= t2 && t2 - t1 <= window
    } yield ()
    if (l3.nonEmpty) 3 else if (l2.nonEmpty) 2 else if (byStep(0).nonEmpty) 1 else 0
  }

  test("funnel: a later restart with more window slack is found (max-start DP)") {
    // chain through the SECOND 'a' (60,70,100) fits W=50; the first doesn't
    val evs = Seq((1L, "a", 0L), (1L, "b", 10L), (1L, "a", 60L), (1L, "b", 70L), (1L, "c", 100L))
    assert(funnelOf(evs, 50L) == Map(1L -> 3))
    // W=30: (60,70,100) spans 40 — only level 2 (via 60,70)
    assert(funnelOf(evs, 30L) == Map(1L -> 2))
  }

  test("funnel: ties, missing first step, and out-of-window chains") {
    val evs = Seq(
      (1L, "a", 5L), (1L, "b", 5L), (1L, "c", 5L), // all-tied chain => 3
      (2L, "b", 0L), (2L, "c", 1L),                // never starts => 0
      (3L, "a", 0L), (3L, "c", 1L),                // no step 2 => 1
      (4L, "c", 0L), (4L, "b", 1L), (4L, "a", 2L)) // reverse order => 1
    assert(funnelOf(evs, 100L) == Map(1L -> 3, 2L -> 0, 3L -> 1, 4L -> 1))
  }

  test("funnel: DP equals brute-force exists-a-chain on random corpora") {
    val rnd = new scala.util.Random(9)
    val rows = for {
      k <- 0L until 40L
      _ <- 0 until (1 + rnd.nextInt(12))
    } yield (k, Steps(rnd.nextInt(3)), rnd.nextInt(200).toLong)
    for (w <- Seq(10L, 40L, 150L)) {
      val got = funnelOf(rows, w)
      val want = rows.groupBy(_._1).map { case (k, evs) =>
        k -> bruteLevel(evs.map(e => (e._2, e._3)), w)
      }
      assert(got == want, s"window=$w")
    }
  }

  test("funnel: rejects empty and duplicate step lists") {
    val df = Seq((1L, "a", new Timestamp(0L))).toDF("k", "et", "ts")
    intercept[IllegalArgumentException] {
      Funnel.levels(df, col("k"), col("et"), col("ts"), Seq.empty, 1L)
    }
    intercept[IllegalArgumentException] {
      Funnel.levels(df, col("k"), col("et"), col("ts"), Seq("a", "a"), 1L)
    }
  }

  // --------------------------------------------------------- retention

  test("retention day-offset math: only listed offsets, distinct users per cell") {
    val micros = (d: Int, u: Long) => (u, if (u == 9L) "view" else "signup", d * 86400000000L)
    // user 1 signs up day 0, active days 0,1,7; user 2 signs up day 1,
    // active day 1 only; user 9 never signs up (excluded)
    val rows = Seq(
      micros(0, 1L), (1L, "view", 1 * 86400000000L), (1L, "click", 7 * 86400000000L),
      micros(1, 2L), micros(3, 9L))
    val ev = rows.toDF("user_id", "event_type", "m")
      .select(col("user_id"), col("event_type"), timestamp_micros(col("m")).as("ts"))
    val cohort = ev.where(col("event_type") === "signup")
      .groupBy("user_id").agg(min(to_date(col("ts"))).as("cohort_day"))
    val active = ev.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val out = cohort.join(active, "user_id")
      .withColumn("day_offset", datediff(col("day"), col("cohort_day")).cast("long"))
      .where(col("day_offset").isin(0L, 1L, 3L, 7L))
      .groupBy("cohort_day", "day_offset").agg(countDistinct(col("user_id")).as("users"))
      .as[(java.sql.Date, Long, Long)].collect()
      .map { case (d, o, u) => (d.toString, o, u) }.toSet
    assert(out == Set(
      ("1970-01-01", 0L, 1L), ("1970-01-01", 1L, 1L), ("1970-01-01", 7L, 1L),
      ("1970-01-02", 0L, 1L)))
  }

  // --------------------------------------------------------------- cms

  test("count-min sketch: overestimate-only, within eps*N, mergeable across partitions") {
    val n = 4000
    val df = spark.range(n).repartition(4)
      .select((col("id") % 37).as("key")) // skewed-ish small key space
    val bytes = df.agg(count_min_sketch(col("key"), lit(0.01d), lit(0.99d), lit(7)).as("s"))
      .head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(bytes))
    val exact = df.groupBy("key").count().as[(Long, Long)].collect().toMap
    for (k <- 0L until 37L) {
      val est = cms.estimateCount(java.lang.Long.valueOf(k))
      assert(est >= exact(k), s"CMS underestimated key $k")
      assert(est - exact(k) <= (0.01 * n).ceil.toLong, s"CMS overshot eps*N on key $k")
    }
    // a never-inserted key is bounded by pure collision mass
    assert(cms.estimateCount(java.lang.Long.valueOf(999L)) <= (0.01 * n).ceil.toLong)
  }

  // ---------------------------------------------------- multi_contains

  test("multi_contains: equals per-pattern contains on random text, incl. overlaps") {
    import graft.functions.AhoCorasick
    val pats = Seq("ab", "b", "bc", "abc", "ca", "zz")
    val rnd = new scala.util.Random(11)
    val texts = Seq("abc", "", "zzz", "cabcab", "bbbb") ++
      Seq.fill(300)((0 until rnd.nextInt(12)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
    val got = texts.toDF("t")
      .select(col("t"), AhoCorasick.multiContains(col("t"), typedlit(pats)).as("hits"))
      .as[(String, Seq[String])].collect()
    got.foreach { case (t, hits) =>
      val want = pats.filter(t.contains(_)).sorted
      assert(hits == want, s"text '$t'")
    }
  }

  test("multi_contains: adversarial alphabets — random pattern sets over overlap-heavy texts") {
    // the fixed-pattern test above covers one overlap family; this
    // sweep draws RANDOM pattern sets over unary/binary alphabets —
    // the regime where Aho-Corasick failure links chain maximally
    // (every pattern is a prefix/suffix of others, self-overlapping
    // runs like "aaa" match at every offset) — and checks each text's
    // hit set against per-pattern contains
    import graft.functions.AhoCorasick
    val rnd = new scala.util.Random(31)
    (1 to 10).foreach { round =>
      val alpha = 1 + rnd.nextInt(2) // unary or binary alphabet
      def rs(n: Int): String = (0 until n).map(_ => ('a' + rnd.nextInt(alpha)).toChar).mkString
      val pats = (1 to 2 + rnd.nextInt(7)).map(_ => rs(1 + rnd.nextInt(6))).distinct
      val texts = Seq.fill(40)(rs(rnd.nextInt(50)))
      val got = texts.toDF("t")
        .select(col("t"), AhoCorasick.multiContains(col("t"), typedlit(pats)).as("hits"))
        .as[(String, Seq[String])].collect()
      got.foreach { case (t, hits) =>
        val want = pats.filter(t.contains(_)).sorted
        assert(hits == want, s"round $round alpha=$alpha pats=$pats text='$t'")
      }
    }
  }

  test("multi_contains: SQL-callable, null text, analysis failures") {
    GraftExtensions.register(spark)
    val hits = spark.sql("SELECT multi_contains('xabcy', array('abc', 'q')) AS h")
      .as[Seq[String]].head()
    assert(hits == Seq("abc"))
    val nullText = spark.sql("SELECT multi_contains(CAST(NULL AS STRING), array('a')) AS h")
      .selectExpr("h IS NULL").as[Boolean].head()
    assert(nullText)
    def fails(sql: String, fragment: String): Unit = {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(s"SELECT $sql").collect()
      }
      assert(e.getMessage.toLowerCase.contains(fragment.toLowerCase), e.getMessage)
    }
    fails("multi_contains('x', CAST(array() AS ARRAY<STRING>))", "at least one pattern")
    fails("multi_contains('x', array('a', NULL))", "non-null and non-empty")
    fails("multi_contains('x', array('a', ''))", "non-null and non-empty")
    fails("multi_contains(1, array('a'))", "string")
    val nonFoldable = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT multi_contains(c, array(c)) FROM VALUES ('a') AS t(c)").collect()
    }
    assert(nonFoldable.getMessage.toLowerCase.contains("foldable"))
  }

  // ----------------------------------------------------------- zonemap

  test("zone map: prunes non-overlapping files, result identical to the full scan") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_zm").toString
    val ev = Tables(spark, TestSpark.SfDir, "events")
    ev.repartitionByRange(16, col("ts")).sortWithinPartitions("ts")
      .write.mode("overwrite").parquet(tmp)
    val back = spark.read.parquet(tmp)
    val manifest = ZoneMap.build(back, Seq("ts")).cache()
    assert(manifest.count() == 16)

    val lo = lit("2024-01-10 00:00:00").cast("timestamp")
    val hi = lit("2024-01-12 00:00:00").cast("timestamp")
    val files = ZoneMap.overlappingFiles(manifest, "ts", lo, hi)
    // 2 days of a 30-day range split into 16 slices: most files skipped
    assert(files.nonEmpty && files.size <= 4, s"expected <=4 files, got ${files.size}")

    val pruned = ZoneMap.prunedRead(spark, manifest, "ts", lo, hi)
    // the scan itself only touches the surviving files
    assert(pruned.inputFiles.toSet == files.toSet)
    val full = back.where(col("ts") >= lo && col("ts") <= hi)
    assert(pruned.count() == full.count() && pruned.count() > 0)
    assert(pruned.exceptAll(full).isEmpty && full.exceptAll(pruned).isEmpty)
    manifest.unpersist()
  }

  // ------------------------------------------------------------ morton

  test("morton: interleave16 matches a local per-bit recompute") {
    val rnd = new scala.util.Random(3)
    val pts = Seq.fill(200)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), graft.sources.Morton.interleave16(col("x"), col("y")))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      val want = (0 until 16).map { i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }.reduce(_ | _)
      assert(z == want, s"($x, $y)")
    }
  }

  test("z-order layout prunes BOTH dimensions; a linear layout prunes only its sort key") {
    val ev = Tables(spark, TestSpark.SfDir, "events")
      .withColumn("day_idx",
        datediff(to_date(col("ts")), to_date(lit("2024-01-01"))).cast("long"))
      .select("event_id", "user_id", "day_idx")
    def layout(sortCol: org.apache.spark.sql.Column): (org.apache.spark.sql.DataFrame, String) = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_zo").toString
      ev.withColumn("z", graft.sources.Morton.interleave16(col("user_id"), col("day_idx")))
        .repartitionByRange(16, sortCol).sortWithinPartitions(sortCol)
        .write.mode("overwrite").parquet(tmp)
      val manifest = ZoneMap.build(spark.read.parquet(tmp), Seq("user_id", "day_idx"))
      (manifest.cache(), tmp)
    }
    val (zManifest, zTmp) = layout(col("z"))
    val (linManifest, _) = layout(col("day_idx"))
    val userRange = ("user_id", lit(10L), lit(40L))
    val dayRange = ("day_idx", lit(5L), lit(9L))

    // the linear-by-day layout answers day ranges well and user ranges
    // not at all (every file spans all users)
    val linDay = ZoneMap.overlappingFilesAll(linManifest, Seq(dayRange)).size
    val linUser = ZoneMap.overlappingFilesAll(linManifest, Seq(userRange)).size
    assert(linDay <= 4, s"linear layout should prune day ranges hard, got $linDay/16")
    assert(linUser == 16, s"linear layout cannot prune user ranges, got $linUser/16")

    // the z layout prunes on EITHER dimension
    val zDay = ZoneMap.overlappingFilesAll(zManifest, Seq(dayRange)).size
    val zUser = ZoneMap.overlappingFilesAll(zManifest, Seq(userRange)).size
    val zBoth = ZoneMap.overlappingFilesAll(zManifest, Seq(userRange, dayRange)).size
    assert(zUser < 16, s"z layout should prune user ranges, got $zUser/16")
    assert(zDay < 16, s"z layout should prune day ranges, got $zDay/16")
    assert(zBoth <= math.min(zUser, zDay))

    // pruning is sound: pruned read + exact predicate == full filter
    val files = ZoneMap.overlappingFilesAll(zManifest, Seq(userRange, dayRange))
    val pruned = spark.read.parquet(files: _*)
      .where(col("user_id").between(10L, 40L) && col("day_idx").between(5L, 9L))
    val full = spark.read.parquet(zTmp)
      .where(col("user_id").between(10L, 40L) && col("day_idx").between(5L, 9L))
    assert(pruned.count() == full.count() && full.count() > 0)
    zManifest.unpersist(); linManifest.unpersist()
  }

  test("sink manifest: written per batch, follows compact and TTL, prunes file reads") {
    import org.apache.spark.sql.SaveMode
    import graft.sinks.MergeTreeSink
    val root = java.nio.file.Files.createTempDirectory("mt_manifest").toString
    val sink = MergeTreeSink(root, ttlDays = 10)
    val parsed = graft.logs.MonologParser.parse(
      graft.logs.LogLines.fromEvents(Tables(spark, TestSpark.SfDirSmall, "events")),
      graft.logs.TailConfig(name = "access", repo = "api2"))
    val day1 = parsed.where(to_date(col("created_at")) === "2024-01-01").cache()
    val day2 = parsed.where(to_date(col("created_at")) === "2024-01-02").cache()

    sink.writeBatch(day1, "b0")
    sink.writeBatch(day2, "b1")
    sink.writeBatch(day2.limit(50), "b2")
    // replay is idempotent for the manifest too
    sink.writeBatch(day2.limit(50), "b2")
    val m0 = sink.manifest(spark)
    assert(m0.select("file").distinct().count() == m0.count(), "duplicate manifest rows")
    val dataFiles = sink.read(spark).inputFiles.length
    assert(m0.count() == dataFiles, s"manifest must cover every data file")

    // pruning: a day-2-only range must not open day-1 files
    val pruned = sink.prunedRead(spark, "2024-01-02 00:00:00", "2024-01-02 23:59:59")
    assert(pruned.inputFiles.length < dataFiles, "manifest pruning skipped nothing")
    val expect = sink.read(spark)
      .where(col("created_at").between("2024-01-02 00:00:00", "2024-01-02 23:59:59")).count()
    assert(pruned.count() == expect && expect > 0)

    // compact collapses day-2's two batch slices into one manifest slice
    sink.compact(spark, "2024-01-02")
    val m1 = sink.manifest(spark)
    assert(m1.count() == sink.read(spark).inputFiles.length)
    val day2Batches = m1.where(col("event_date") === "2024-01-02")
      .select("batch").distinct().as[String].collect().toSeq
    assert(day2Batches == Seq(s"${sink.CompactedBatchId}_2024-01-02"), s"got $day2Batches")
    assert(sink.prunedRead(spark, "2024-01-02 00:00:00", "2024-01-02 23:59:59").count() == expect)

    // TTL drops the date's manifest slice with its data
    sink.applyTtl(spark, java.time.LocalDate.parse("2024-01-12"))
    assert(sink.manifest(spark).where(col("event_date") === "2024-01-01").count() == 0)
    day1.unpersist(); day2.unpersist()
  }

  test("sink manifest: footer-decoded slice is value-identical to the data-read stats pass") {
    import graft.sinks.MergeTreeSink
    import graft.sources.ZoneMap
    // the streaming write path decodes manifest stats from parquet
    // footers (metadata-only); a decode drift vs the data-read path
    // (timestamp unit, row counts, file naming) would silently corrupt
    // pruning — pin bit-equality of every slice column here
    val root = java.nio.file.Files.createTempDirectory("mt_footer").toString
    val sink = MergeTreeSink(root)
    val parsed = graft.logs.MonologParser.parse(
      graft.logs.LogLines.fromEvents(Tables(spark, TestSpark.SfDirSmall, "events")),
      graft.logs.TailConfig(name = "access", repo = "api2")).cache()
    sink.writeBatch(parsed, "fb0", filesPerDay = 3)
    def canon(s: String) = new org.apache.hadoop.fs.Path(s).toString
    val fromFooters = sink.manifest(spark)
      .select("file", "rows", "min_created_at", "max_created_at", "event_date")
      .collect()
      .map(r => (canon(r.getString(0)), r.getLong(1), r.get(2), r.get(3), r.get(4).toString))
      .toSet
    val fromData = ZoneMap
      .build(spark.read.parquet(s"$root/ingest_batch=fb0"), Seq("created_at", "event_date"))
      .select(col("file"), col("rows"),
        col("min_created_at"), col("max_created_at"),
        col("min_event_date").as("event_date"))
      .collect()
      .map(r => (canon(r.getString(0)), r.getLong(1), r.get(2), r.get(3), r.get(4).toString))
      .toSet
    assert(fromFooters.nonEmpty && fromFooters.size >= 2, "expected multiple files to compare")
    assert(fromFooters == fromData,
      s"footer-decoded manifest diverges from the data-read stats:\n footers=$fromFooters\n data=$fromData")
    parsed.unpersist()
  }

  test("sink manifest: unmanifested files are still read (unknown stays sound)") {
    import graft.sinks.MergeTreeSink
    val root = java.nio.file.Files.createTempDirectory("mt_manifest2").toString
    val sink = MergeTreeSink(root)
    val parsed = graft.logs.MonologParser.parse(
      graft.logs.LogLines.fromEvents(Tables(spark, TestSpark.SfDirSmall, "events")),
      graft.logs.TailConfig(name = "access", repo = "api2")).limit(300).cache()
    sink.writeBatch(parsed, "b0")
    sink.writeBatch(parsed, "b1")
    // simulate data from a writer that never maintained stats: drop
    // one batch's manifest slice out from under the pruner
    val fsys = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fsys.delete(new org.apache.hadoop.fs.Path(s"$root/_manifest/batch=b1"), true)
    val lo = "2024-01-01 00:00:00"; val hi = "2024-12-31 23:59:59"
    val full = sink.read(spark).where(col("created_at").between(lo, hi)).count()
    assert(sink.prunedRead(spark, lo, hi).count() == full,
      "pruned read must include files the manifest has never seen")
    // a rebuild restores full coverage
    sink.rebuildManifest(spark)
    assert(sink.manifest(spark).count() == sink.read(spark).inputFiles.length)
    assert(sink.prunedRead(spark, lo, hi).count() == full)
    parsed.unpersist()
  }

  test("zone map: pruning every file is an explicit error, not an empty result") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_zm2").toString
    spark.range(10).select(col("id")).write.mode("overwrite").parquet(tmp)
    val manifest = ZoneMap.build(spark.read.parquet(tmp), Seq("id"))
    intercept[IllegalArgumentException] {
      ZoneMap.prunedRead(spark, manifest, "id", lit(100L), lit(200L))
    }
  }

  // --------------------------------------------------- chat validation

  test("chat format: valid alternation passes, each structural defect is caught") {
    // turns: (conv, seq, role)
    val rows = Seq(
      // valid 4-turn conversation
      (1L, 1, "user"), (1L, 2, "assistant"), (1L, 3, "user"), (1L, 4, "assistant"),
      // double user turn (retry) -> violation
      (2L, 1, "user"), (2L, 2, "user"), (2L, 3, "assistant"),
      // assistant-first fragment
      (3L, 1, "assistant"), (3L, 2, "user"), (3L, 3, "assistant"),
      // dangling user turn at the end
      (4L, 1, "user"), (4L, 2, "assistant"), (4L, 3, "user"),
      // single-turn conversation: starts ok but too short + no reply
      (5L, 1, "user"))
    val df = rows.toDF("conv", "seq", "role")
    val out = graft.text.ChatFormat.validate(df, Seq("conv"), Seq(col("seq")), col("role"))
      .collect().map(r => r.getAs[Long]("conv") -> r).toMap

    def bools(c: Long) = {
      val r = out(c)
      (r.getAs[Boolean]("starts_ok"), r.getAs[Boolean]("ends_ok"),
        r.getAs[Long]("violations"), r.getAs[Boolean]("valid"))
    }
    assert(bools(1L) == ((true, true, 0L, true)))
    assert(bools(2L) == ((true, true, 1L, false)))
    assert(bools(3L) == ((false, true, 0L, false)))
    assert(bools(4L) == ((true, false, 0L, false)))
    assert(bools(5L) == ((true, false, 0L, false)))
    assert(out(1L).getAs[Long]("n_turns") == 4)
    assert(out(1L).getAs[Long]("n_user") == 2 && out(1L).getAs[Long]("n_assistant") == 2)
  }

  // ------------------------------------------------------ script profile

  test("script profile: planted scripts counted exactly, dominance ties break in order") {
    val docs = Seq(
      (1L, "hello world 42"),            // latin + digits + spaces
      (2L, "привет мир"),                // cyrillic
      (3L, "αβγ δε"),                    // greek
      (4L, "你好世界"),                   // cjk
      (5L, "abcабв"),                    // latin==cyrillic tie -> latin
      (6L, "!!! ???"),                   // punctuation only -> none
      (7L, "")                           // empty
    ).toDF("doc_id", "text")
    val out = graft.text.TextStats.scriptProfile(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

    assert(out(1L).getAs[Long]("latin") == 10)
    assert(out(1L).getAs[Long]("digit") == 2)
    assert(out(1L).getAs[Long]("space") == 2)
    assert(out(1L).getAs[String]("dominant") == "latin")
    assert(out(2L).getAs[Long]("cyrillic") == 9)
    assert(out(2L).getAs[String]("dominant") == "cyrillic")
    assert(out(3L).getAs[Long]("greek") == 5)
    assert(out(3L).getAs[String]("dominant") == "greek")
    assert(out(4L).getAs[Long]("cjk") == 4)
    assert(out(4L).getAs[String]("dominant") == "cjk")
    assert(out(5L).getAs[String]("dominant") == "latin", "tie breaks latin-first")
    assert(out(6L).getAs[String]("dominant") == "none")
    assert(out(6L).getAs[Long]("other") == 6)
    assert(out(7L).getAs[Long]("n_chars") == 0)
    assert(out(7L).getAs[String]("dominant") == "none")
    // counts partition the text: other picks up exactly the rest
    out.values.foreach { r =>
      val sum = Seq("latin", "digit", "space", "cyrillic", "greek", "cjk", "other")
        .map(r.getAs[Long]).sum
      assert(sum == r.getAs[Long]("n_chars"))
    }
  }

  // --------------------------------------------------- web domains (B113/114)

  test("web domains: host/domain extraction strips ports, blocklist is suffix-exact") {
    import graft.text.WebDomains
    val docs = Seq(
      (1L, "https://www.spam.com/x?q=1"),        // subdomain of blocked spam.com
      (2L, "http://spam.com:8080/y"),            // exact domain + port to strip
      (3L, "https://www.notspam.com/z"),         // substring trap: must NOT block
      (4L, "https://cdn.news.example.org/a/b"),  // deep subdomain, unblocked
      (5L, "https://evil.net/c"),                // exact-host blocklist entry
      (6L, "https://sub.evil.net/d"),            // suffix of the evil.net entry
      (7L, "https://www.espam.com/e")            // suffix trap: espam.com != .spam.com
    ).toDF("doc_id", "url")
    val parts = WebDomains.withUrlParts(docs).select("doc_id", "host", "domain")
      .as[(Long, String, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(parts(1L) == (("www.spam.com", "spam.com")))
    assert(parts(2L) == (("spam.com", "spam.com")), "port leaked into the host")
    assert(parts(4L) == (("cdn.news.example.org", "example.org")),
      "registered domain must be the last two labels")

    val blocked = WebDomains.blocked(docs, Seq("spam.com", "evil.net"))
      .select("doc_id", "blocked_by").as[(Long, String)].collect().toMap
    assert(blocked == Map(1L -> "spam.com", 2L -> "spam.com",
      5L -> "evil.net", 6L -> "evil.net"),
      s"substring/suffix false positive or miss: $blocked")

    // first-entry attribution is deterministic in list order
    val multi = WebDomains.blocked(docs, Seq("www.spam.com", "spam.com"))
      .select("doc_id", "blocked_by").as[(Long, String)].collect().toMap
    assert(multi(1L) == "www.spam.com" && multi(2L) == "spam.com")
  }

  test("url canonicalization: tracking params, default ports, fragments, slashes") {
    import graft.text.WebDomains.canonicalize
    val cases = Map(
      // default port stripped, trailing slash trimmed
      "https://www.x.com:443/a/b/" -> "https://www.x.com/a/b",
      // fragment gone, leading tracking param stripped, separator repaired, :80 stripped
      "http://x.com:80/a?utm_source=f&id=3#frag" -> "http://x.com/a?id=3",
      // NON-default port survives (:80 must not match inside :8080)
      "http://x.com:8080/a?id=3&utm_medium=m" -> "http://x.com:8080/a?id=3",
      // param list collapsing to nothing leaves no dangling '?'
      "https://x.com/p?ref=tw" -> "https://x.com/p",
      // href= must survive the ref= rule (the [?&] anchor)
      "https://x.com/p?href=keep" -> "https://x.com/p?href=keep",
      // multiple tracking params around a real one
      "https://x.com/p?id=1&ref=x&utm_a=1" -> "https://x.com/p?id=1",
      // bare root slash trims
      "http://x.com/" -> "http://x.com")
    val out = cases.keys.toSeq.toDF("url")
      .select(col("url"), canonicalize(col("url")).as("c"))
      .as[(String, String)].collect().toMap
    cases.foreach { case (in, want) =>
      assert(out(in) == want, s"canonicalize($in) = ${out(in)}, want $want")
    }
  }

  test("url canonicalization is idempotent over randomized component URLs") {
    import graft.text.WebDomains.canonicalize
    // a canonical form that canonicalizes further would make dedup keys
    // depend on how many times the pipeline ran — idempotence is the
    // operator's contract, swept over randomized component combinations
    val rnd = new scala.util.Random(7)
    val urls = (1 to 300).map { _ =>
      val scheme = if (rnd.nextBoolean()) "http://" else "https://"
      val sub = Seq("", "www.", "a.b.")(rnd.nextInt(3))
      val host = s"${sub}h${rnd.nextInt(40)}.com"
      val port = Seq("", ":80", ":443", ":8080")(rnd.nextInt(4))
      val path = Seq("", "/x", "/x/y", "/x/")(rnd.nextInt(4))
      val params = (0 until rnd.nextInt(4))
        .map(_ => Seq("id=1", "utm_a=2", "ref=z", "q=3")(rnd.nextInt(4)))
      val query = if (params.isEmpty) "" else "?" + params.mkString("&")
      val frag = Seq("", "#f")(rnd.nextInt(2))
      scheme + host + port + path + query + frag
    }
    val bad = urls.toDF("url")
      .select(col("url"), canonicalize(col("url")).as("c1"))
      .select(col("url"), col("c1"), canonicalize(col("c1")).as("c2"))
      .where(col("c1") =!= col("c2"))
      .collect()
    assert(bad.isEmpty, s"non-idempotent canonicalization: ${bad.take(5).toSeq}")
  }

  test("dict_segment: greedy longest-match, UNK runs, SQL registration, analysis failures") {
    import graft.functions.SegTrie.dictSegment
    val vocab = array(Seq("le", "a", "n", "scan", "table", "row").map(lit(_)): _*)
    def seg(texts: String*): Map[String, (Long, Long)] =
      texts.toDF("t")
        .select(col("t"), dictSegment(col("t"), vocab).as("s"))
        .select(col("t"), col("s.n_pieces"), col("s.n_unk"))
        .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val out = seg(
      "scantable",  // scan + table -> 2 pieces
      "lean",       // GREEDY le + a + n = 3, not the 2-piece optimum (the WordPiece contract)
      "xyz",        // nothing matches -> 3 UNK singles
      "scan row",   // words segment independently across spaces
      "arowz",      // a + row + UNK(z)
      "",           // empty text -> nothing
      "  "          // only separators -> nothing
    )
    assert(out("scantable") == ((2L, 0L)))
    assert(out("lean") == ((3L, 0L)), "greedy must NOT find the optimal 2-piece split")
    assert(out("xyz") == ((3L, 3L)))
    assert(out("scan row") == ((2L, 0L)))
    assert(out("arowz") == ((3L, 1L)))
    assert(out("") == ((0L, 0L)))
    assert(out("  ") == ((0L, 0L)))

    // SQL registration through GraftExtensions
    GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT dict_segment('scantable', array('scan','table')).n_pieces AS p").as[Long].head()
    assert(viaSql == 2L)

    // non-foldable vocab and empty vocab fail at analysis, not at runtime
    intercept[Exception] {
      Seq(("ab", Seq("a"))).toDF("t", "v")
        .select(dictSegment(col("t"), col("v"))).collect()
    }
    intercept[Exception] {
      Seq("ab").toDF("t")
        .select(dictSegment(col("t"), array())).collect()
    }
    ()
  }

  test("integer PageRank matches the hand-computed trajectory; duplicate edges/self-loops drop") {
    import graft.ops.PageRank
    // a -> b, b -> a, c -> a (c never receives): after iteration 1 with
    // uniform 1e6 start, contributions are 1e6 each (outdeg 1), so
    // inc(a) = 2e6, inc(b) = 1e6, inc(c) = 0:
    //   a: 150000 + 85*2000000/100 = 1850000
    //   b: 150000 + 85*1000000/100 = 1000000
    //   c: 150000
    // iteration 2: inc(a) = b + c = 1000000 + 150000, inc(b) = a = 1850000
    //   a: 150000 + 85*1150000 DIV 100 = 150000 + 977500  = 1127500
    //   b: 150000 + 85*1850000 DIV 100 = 150000 + 1572500 = 1722500
    //   c: 150000
    val edges = Seq(("a", "b"), ("a", "b"), ("b", "a"), ("c", "a"), ("a", "a"))
      .toDF("src", "dst") // duplicate a->b and self-loop a->a must not double-count
    val r1 = PageRank.ranks(edges, 1).as[(String, Long)].collect().toMap
    assert(r1 == Map("a" -> 1850000L, "b" -> 1000000L, "c" -> 150000L), s"iter 1: $r1")
    val r2 = PageRank.ranks(edges, 2).as[(String, Long)].collect().toMap
    assert(r2 == Map("a" -> 1127500L, "b" -> 1722500L, "c" -> 150000L), s"iter 2: $r2")
    // determinism under repartitioning (integer arithmetic has no
    // accumulation-order sensitivity to hide)
    val r2b = PageRank.ranks(edges.repartition(7), 2).as[(String, Long)].collect().toMap
    assert(r2b == r2)

    // dangling-mass correction: a -> b only, b has no out-edges. Its
    // mass folds back uniformly each round (share = Σ dangling rank
    // DIV n) instead of leaking:
    //   iter 1: share = 1000000/2; inc(b) = 1000000
    //     a: 150000 + 85*(0 + 500000) DIV 100       = 575000
    //     b: 150000 + 85*(1000000 + 500000) DIV 100 = 1425000
    //   iter 2: share = 1425000/2 = 712500; inc(b) = 575000
    //     a: 150000 + 85*712500 DIV 100             = 755625
    //     b: 150000 + 85*(575000+712500) DIV 100    = 1244375
    val dangle = Seq(("a", "b")).toDF("src", "dst")
    val d1 = PageRank.ranks(dangle, 1).as[(String, Long)].collect().toMap
    assert(d1 == Map("a" -> 575000L, "b" -> 1425000L), s"dangling iter 1: $d1")
    val d2 = PageRank.ranks(dangle, 2).as[(String, Long)].collect().toMap
    assert(d2 == Map("a" -> 755625L, "b" -> 1244375L), s"dangling iter 2: $d2")
    // total mass conserved (up to DIV truncation) — the pre-correction
    // recurrence leaked the dangling share every round
    assert(d2.values.sum == 2000000L)
  }

  // ------------------------------------------ round-10 edge semantics

  /** A scratch sf-dir holding only the tables a query reads. */
  private def scratchDir(write: String => Unit): String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_edge").toString
    write(tmp)
    tmp
  }

  test("graph_triangles degenerate graphs: wedge-free yields clustering 0, edge-free all zeros") {
    // 0/0 regression guards: a wedge-free graph (every degree 1) used
    // to put NaN into BigDecimal (NumberFormatException), an edge-free
    // one NPE'd on the NULL degree sums
    def run(rows: Seq[(Long, Long)]): (Long, Long, Long, Long, Double) = {
      val dir = scratchDir { d =>
        rows.toDF("l_orderkey", "l_partkey")
          .write.parquet(s"$d/lineitem.parquet")
      }
      SparkEntry.queries("graph_triangles")(spark, dir)
        .as[(Long, Long, Long, Long, Double)].head()
    }
    // one order, two parts: a single edge, two degree-1 nodes, no wedge
    assert(run(Seq((1L, 10L), (1L, 20L))) == ((2L, 1L, 0L, 0L, 0.0)))
    // single-part orders: no co-purchase pair at all
    assert(run(Seq((1L, 10L), (2L, 20L))) == ((0L, 0L, 0L, 0L, 0.0)))
  }

  test("q8 market share: supplier nation feeds the numerator, customer nation only the region gate") {
    // The dimension-role split is the shape under test — the two
    // nation roles must not cross: a sale by the measured nation's
    // supplier counts ONLY when the CUSTOMER sits in the measured
    // region, and a promo sale by another nation's supplier lands in
    // the denominator only. Out-of-window and non-promo lines vanish.
    import org.apache.spark.sql.functions.to_timestamp_ntz
    val dir = scratchDir { d =>
      Seq((1L, "ASIA"), (2L, "OTHER")).toDF("r_regionkey", "r_name")
        .write.parquet(s"$d/region.parquet")
      Seq((1L, "NATION_1", 1L), (2L, "NATION_2", 1L), (3L, "NATION_3", 2L))
        .toDF("n_nationkey", "n_name", "n_regionkey")
        .write.parquet(s"$d/nation.parquet")
      Seq((1L, 1L), (2L, 3L)).toDF("c_custkey", "c_nationkey") // c2 outside ASIA
        .write.parquet(s"$d/customer.parquet")
      Seq((1L, 1L), (2L, 2L)).toDF("s_suppkey", "s_nationkey")
        .write.parquet(s"$d/supplier.parquet")
      Seq((1L, "PROMO"), (2L, "STANDARD")).toDF("p_partkey", "p_type")
        .write.parquet(s"$d/part.parquet")
      Seq((1L, 1L, "1995-06-01"), (2L, 2L, "1995-06-01"), (3L, 1L, "1997-06-01"))
        .toDF("o_orderkey", "o_custkey", "d")
        .select(col("o_orderkey"), col("o_custkey"),
          to_timestamp_ntz(col("d"), lit("yyyy-MM-dd")).as("o_orderdate"))
        .write.parquet(s"$d/orders.parquet")
      Seq(
        (1L, 1L, 1L, 100.0, 0.0), // counted: NATION_1 numerator + denominator
        (1L, 1L, 2L, 50.0, 0.0),  // counted: denominator only (supplier NATION_2)
        (1L, 2L, 1L, 999.0, 0.0), // dropped: not a promo part
        (2L, 1L, 1L, 77.0, 0.0),  // dropped: customer outside ASIA
        (3L, 1L, 1L, 88.0, 0.0))  // dropped: order outside the window
        .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
        .write.parquet(s"$d/lineitem.parquet")
    }
    val got = SparkEntry.queries("q8_market_share")(spark, dir)
      .as[(Long, Double, Double, Double)].collect().toSeq
    assert(got == Seq((1995L, 100.0, 150.0, 66.6667)), s"got $got")
  }

  test("phrase_search matches only CONSECUTIVE in-order tokens") {
    val dir = scratchDir { d =>
      Seq(
        (1L, "slow hash batch x slow hash batch", "en", "s", 33L), // 2 hits
        (2L, "slow hash x batch", "en", "s", 17L),                 // gap: 0
        (3L, "batch hash slow", "en", "s", 15L),                   // order: 0
        (4L, "x slow hash batch", "en", "s", 17L))                 // 1 hit
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$d/documents.parquet")
    }
    val got = SparkEntry.queries("phrase_search")(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 4L -> 1L), s"got $got")
  }

  test("ip_enrich range-dictionary boundaries: start value belongs to ITS range") {
    // user ids chosen (Knuth-hash inverse) so ip lands exactly on
    // starts(1), one below it, and at 0 — the three boundary cells
    val dir = scratchDir { d =>
      Seq(
        (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 0L, "view", 1.0, "{}"),          // ip 0 -> region_1
        (2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 2628102583L, "view", 1.0, "{}"), // ip = starts(1) -> region_2
        (3L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 2384099942L, "view", 1.0, "{}")) // ip = starts(1)-1 -> region_1
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$d/events.parquet")
    }
    val got = SparkEntry.queries("ip_enrich")(spark, dir)
      .as[(String, Long)].collect().toMap
    assert(got == Map("region_1" -> 2L, "region_2" -> 1L), s"got $got")
  }

  test("changepoint_detect finds the constructed step day") {
    // 3 events/day on days 1-5, then 30/day on days 6-10: the split
    // statistic is maximized at k=5, so change_day = Jan 5
    val rows = for {
      day <- 1 to 10
      i <- 1 to (if (day <= 5) 3 else 30)
    } yield (day * 100L + i,
      java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00"), 1L, "step", 0.0, "{}")
    val dir = scratchDir { d =>
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$d/events.parquet")
    }
    val got = SparkEntry.queries("changepoint_detect")(spark, dir)
      .select("event_type", "change_day", "pre_mean", "post_mean")
      .as[(String, java.sql.Date, Double, Double)].collect()
    assert(got.length == 1)
    val (et, day, pre, post) = got.head
    assert(et == "step" && day.toString == "2024-01-05", s"got ${got.head}")
    assert(pre == 3.0 && post == 30.0, s"got ${got.head}")
  }

  test("graph_triangles: K4 + pendant edge + separate triangle, duplicates collapse") {
    // order 1 buys parts {1,2,3,4} (K4: 6 edges, 4 triangles, and part 4
    // also pairs with 5 via order 2), order 3 buys {5,6,7} (1 triangle).
    // Degrees: 1,2,3→3  4→4  5→3  6,7→2; wedges Σ C(d,2) = 12+6+3-1... = 20.
    val baskets = Seq(
      1L -> Seq(1L, 2L, 3L, 4L), 2L -> Seq(4L, 5L), 3L -> Seq(5L, 6L, 7L),
      4L -> Seq(1L, 2L)) // duplicate pair 1-2 from another order: must collapse
    val rows = baskets.flatMap { case (o, ps) => ps.map(p => (o, p)) } ++
      Seq((1L, 1L)) // duplicate (order, part) line: must collapse
    val dir = scratchDir { d =>
      rows.toDF("l_orderkey", "l_partkey")
        .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    }
    val got = SparkEntry.queries("graph_triangles")(spark, dir)
      .as[(Long, Long, Long, Long, Double)].collect().head
    // degrees: 1:3 2:3 3:3 4:4 5:3 6:2 7:2 → wedges = 3+3+3+6+3+1+1 = 20
    assert(got == ((7L, 10L, 20L, 5L, 0.75)), s"got $got")
  }

  test("linreg_multi recovers an exactly-planted plane per group") {
    // y_cents = 300 + 200*qty - 100*disc_cents, on a full-rank 5x3 grid;
    // group B gets a different plane to prove per-group isolation
    val rows = for {
      (flag, b0, b1, b2) <- Seq(("A", 300L, 200L, -100L), ("B", -50L, 10L, 7L))
      q <- 1 to 5; dc <- Seq(0, 5, 10)
    } yield {
      val yCents = b0 + b1 * q + b2 * dc
      (flag, q.toDouble, dc / 100.0, yCents / 100.0)
    }
    val dir = scratchDir { d =>
      rows.toDF("l_returnflag", "l_quantity", "l_discount", "l_extendedprice")
        .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    }
    val got = SparkEntry.queries("linreg_multi")(spark, dir)
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(got == Seq(("A", 15L, 300.0, 200.0, -100.0),
      ("B", 15L, -50.0, 10.0, 7.0)), s"got $got")
  }

  test("ts_autocorr: alternating daily counts give ACF(1) = -0.9, ACF(2) = 0.8") {
    // counts 1,3,1,3,... over 10 days: mean 2, Σ(y-ȳ)² = 10; lag-1
    // products are all -1 (9 pairs → -0.9), lag-2 all +1 (8 → 0.8)
    val rows = for {
      day <- 1 to 10
      i <- 1 to (if (day % 2 == 1) 1 else 3)
    } yield (day * 10L + i,
      java.sql.Timestamp.valueOf(f"2024-03-$day%02d 09:00:00"), 1L, "t", 0.0, "{}")
    val dir = scratchDir { d =>
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$d/events.parquet")
    }
    val got = SparkEntry.queries("ts_autocorr")(spark, dir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.take(2) == Seq((1L, 9L, -0.9), (2L, 8L, 0.8)), s"got $got")
    assert(got.map(_._1) == (1L to 7L) && got.map(_._2) == (9L to 3L by -1L))
  }

  test("q21: sole late supplier blamed; co-late, solo, and non-F orders are not") {
    val d0 = java.sql.Timestamp.valueOf("1995-01-01 00:00:00")
    def ship(days: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(1995, 1, 1, 0, 0).plusDays(days.toLong))
    val orders = Seq((10L, "F", d0), (20L, "F", d0), (30L, "F", d0),
      (40L, "O", d0), (50L, "F", d0))
    // (orderkey, suppkey, shipdate): late = >365 days after order date
    val lines = Seq(
      (10L, 1L, ship(400)), (10L, 2L, ship(10)),  // s1 sole-late → blamed
      (20L, 1L, ship(400)), (20L, 2L, ship(400)), // both late → neither
      (30L, 3L, ship(400)),                       // single-supplier → no
      (40L, 1L, ship(400)), (40L, 4L, ship(10)),  // status O → excluded
      (50L, 2L, ship(400)), (50L, 2L, ship(500)), (50L, 5L, ship(10))) // s2 ×2
    val supp = (1L to 5L).map(k => (k, s"S$k"))
    val dir = scratchDir { d =>
      orders.toDF("o_orderkey", "o_orderstatus", "o_orderdate")
        .write.mode("overwrite").parquet(s"$d/orders.parquet")
      lines.toDF("l_orderkey", "l_suppkey", "l_shipdate")
        .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
      supp.toDF("s_suppkey", "s_name")
        .write.mode("overwrite").parquet(s"$d/supplier.parquet")
    }
    val got = SparkEntry.queries("q21_sole_blame")(spark, dir)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("S2", 2L), ("S1", 1L)), s"got $got")
  }

  test("dict_segment equals a naive greedy matcher on randomized vocab/text") {
    import graft.functions.SegTrie.dictSegment
    // independent reference: straight-line longest-substring-first
    // greedy over the vocab as a Set — no trie, no shared code with
    // the expression under test. Both sides operate on UTF-16 code
    // units, so the surrogate-pair alphabet entry exercises the
    // boundary the trie walks one unit at a time.
    def naive(text: String, vocab: Set[String]): (Long, Long) = {
      var pieces = 0L
      var unk = 0L
      text.split(' ').foreach { word =>
        var i = 0
        while (i < word.length) {
          (word.length - i).to(1, -1)
            .find(len => vocab.contains(word.substring(i, i + len))) match {
            case Some(l) => pieces += 1; i += l
            case None => pieces += 1; unk += 1; i += 1
          }
        }
      }
      (pieces, unk)
    }
    val rnd = new scala.util.Random(31337)
    val alphabet = Vector("a", "b", "c", "λ", "日", "🎈")
    def randPiece(): String =
      Seq.fill(1 + rnd.nextInt(3))(alphabet(rnd.nextInt(alphabet.size))).mkString
    for (round <- 1 to 25) {
      val vocab = (1 to (2 + rnd.nextInt(8))).map(_ => randPiece()).distinct
      val texts = (1 to 40).map { _ =>
        Seq.fill(rnd.nextInt(6))(
          Seq.fill(rnd.nextInt(5))(alphabet(rnd.nextInt(alphabet.size))).mkString)
          .mkString(" " * (1 + rnd.nextInt(2))) // 1-2 separators: empty-word path
      }
      val vcol = array(vocab.map(lit(_)): _*)
      val got = texts.toDF("t")
        .select(col("t"), dictSegment(col("t"), vcol).as("s"))
        .select(col("t"), col("s.n_pieces"), col("s.n_unk"))
        .as[(String, Long, Long)].collect()
      val vset = vocab.toSet
      got.foreach { case (t, p, u) =>
        assert((p, u) == naive(t, vset),
          s"round $round vocab=${vocab.mkString(",")} diverged on <$t>: got ($p,$u), want ${naive(t, vset)}")
      }
    }
  }

  test("dedup_span_removal keeps the globally-first occurrence and cuts the rest") {
    // doc 1 owns every window first (lowest doc_id); doc 2 repeats
    // doc 1's first 8-token window then diverges — exactly positions
    // 0..7 cut; doc 3 is a verbatim copy of doc 1 — empties entirely;
    // doc 0 is under the window width — passes through untouched
    val dir = scratchDir { d =>
      Seq(
        (0L, "tiny doc", "en", "s", 8L),
        (1L, "a b c d e f g h i j", "en", "s", 19L),
        (2L, "a b c d e f g h z1 z2", "en", "s", 21L),
        (3L, "a b c d e f g h i j", "en", "s", 19L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$d/documents.parquet")
    }
    val got = SparkEntry.queries("dedup_span_removal")(spark, dir)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (0L, 2L, 0L, "tiny doc"),
      (1L, 10L, 0L, "a b c d e f g h i j"),
      (2L, 10L, 8L, "z1 z2"),
      (3L, 10L, 10L, "")), s"got $got")
  }

  test("l_diversity counts DISTINCT sensitive users per group, not rows") {
    // group (view, 01:xx): 3 rows but ONE user -> band '1' (the leak
    // k-anonymity misses: large group, zero diversity); (click, 02:xx):
    // 2 users -> '2-4'; (error, 03:xx): 5 users -> '5-19'
    def e(id: Long, u: Long, t: String, typ: String) =
      (id, java.sql.Timestamp.valueOf(t), u, typ, 1.0, "{}")
    val dir = scratchDir { d =>
      (Seq(
        e(1, 7, "2024-01-01 01:00:01", "view"),
        e(2, 7, "2024-01-01 01:10:02", "view"),
        e(3, 7, "2024-01-01 01:20:03", "view"),
        e(4, 1, "2024-01-01 02:00:01", "click"),
        e(5, 2, "2024-01-01 02:10:02", "click")) ++
        (1L to 5L).map(u => e(10 + u, u, s"2024-01-01 03:00:0$u", "error")))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$d/events.parquet")
    }
    val got = SparkEntry.queries("l_diversity")(spark, dir)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("1", 1L, 3L), ("2-4", 1L, 2L), ("5-19", 1L, 5L)), s"got $got")
  }

  test("dp_counts noise replays exactly from the salted key hash") {
    // hand-replay the inverse-CDF Laplace draw for each group key and
    // demand bit-equal agreement (pre-round), plus sane magnitude
    val dir = scratchDir { d =>
      Seq(
        (1L, "t t t", "en", "web", 5L), (2L, "u u", "en", "web", 3L),
        (3L, "v", "de", "web", 1L), (4L, "w", "en", "book", 1L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$d/documents.parquet")
    }
    def laplace(source: String, lang: String): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"dp-v1:$source|$lang".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val u = ((java.lang.Long.parseLong(hex, 16) % 1000000L).toDouble + 0.5) / 1000000.0 - 0.5
      -1.0 * math.signum(u) * math.log(1.0 - 2.0 * math.abs(u))
    }
    val want = Seq(
      ("book", "en", 1L), ("web", "de", 1L), ("web", "en", 2L))
      .map { case (s0, l0, n) =>
        (s0, l0, BigDecimal(n + laplace(s0, l0)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .sortBy(r => (r._1, r._2))
    val got = SparkEntry.queries("dp_counts")(spark, dir)
      .as[(String, String, Double)].collect().toSeq
    assert(got == want, s"got $got want $want")
    got.foreach { case (_, _, v) => assert(v > -14 && v < 16, s"noise out of band: $v") }
  }

  test("embedding_drift ranks the shifted dimension first and zeroes the matched one") {
    // dim 0: identical (i%5)-derived distribution in both parities ->
    // z exactly 0; dim 1: odd vectors encode at 2x the even scale ->
    // strongly negative z ranks first. Expected means replay the SAME
    // float -> micro-unit floor arithmetic in-JVM.
    val vecs = (1L to 20L).map { i =>
      val d0 = (i % 5).toFloat * 0.000001f
      val d1 = if (i % 2 == 0) 0.001f * i else 0.002f * i
      (i, Seq(d0, d1), 0)
    }
    val dir = scratchDir { d =>
      vecs.toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    }
    def q(v: Float): Long = math.floor(v.toDouble * 1000000).toLong
    def mean6(qs: Seq[Long]): Double =
      BigDecimal(qs.sum / qs.size.toDouble / 1000000)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val evens = vecs.filter(_._1 % 2 == 0).map(v => q(v._2(1)))
    val odds = vecs.filter(_._1 % 2 == 1).map(v => q(v._2(1)))
    def welchZ(a: Seq[Long], b: Seq[Long]): Double = {
      def mv(x: Seq[Long]): (Double, Double) = {
        val n = x.size; val s = x.sum.toDouble; val ss = x.map(v => v * v).sum.toDouble
        (s / n, (ss - s * s / n) / (n - 1))
      }
      val (ma, va) = mv(a); val (mb, vb) = mv(b)
      val z = (ma - mb) / math.sqrt(va / a.size + vb / b.size)
      BigDecimal(z).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = SparkEntry.queries("embedding_drift")(spark, dir)
      .as[(Long, Long, Long, Double, Double, Double)].collect().toSeq
    assert(got.size == 2, s"got $got")
    val (dim1, dim0) = (got(0), got(1))
    assert(dim1._1 == 1L && dim0._1 == 0L, s"shifted dim must rank first: $got")
    assert((dim1._2, dim1._3) == (10L, 10L))
    assert(dim1._4 == mean6(evens) && dim1._5 == mean6(odds), s"got $dim1")
    assert(dim1._6 == welchZ(evens, odds), s"got $dim1 want z=${welchZ(evens, odds)}")
    assert(dim1._6 < 0.0, "odd cohort encodes at 2x the scale: negative shift")
    assert(dim0._6 == 0.0, s"matched distributions must z=0: $dim0")
  }

  test("graph_degrees: hand-computed CCDF and MLE alpha; all-degree-1 graph yields NULL alpha") {
    // triangle {1,2,3} + pendant edge (3,4): degrees 2,2,3,1 ->
    // histogram {1:1, 2:2, 3:1}, CCDF 1.0/0.75/0.25,
    // alpha = 1 + 4/(2 ln2 + ln3) = 2.6097
    val dir = scratchDir { d =>
      Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L))
        .toDF("l_orderkey", "l_partkey").write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    }
    val got = SparkEntry.queries("graph_degrees")(spark, dir)
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq((1L, 1L, 1.0, 2.6097), (2L, 2L, 0.75, 2.6097), (3L, 1L, 0.25, 2.6097)),
      s"got $got")
    val dir1 = scratchDir { d =>
      Seq((1L, 1L), (1L, 2L)).toDF("l_orderkey", "l_partkey")
        .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    }
    val deg1 = SparkEntry.queries("graph_degrees")(spark, dir1)
      .select("degree", "n_nodes", "ccdf", "alpha").collect().toSeq
    assert(deg1.size == 1 && deg1.head.getLong(0) == 1L && deg1.head.getDouble(2) == 1.0
      && deg1.head.isNullAt(3), s"got $deg1")
    // edge-free graph (every order single-part): empty result, not an NPE
    val dir0 = scratchDir { d =>
      Seq((1L, 1L), (2L, 2L)).toDF("l_orderkey", "l_partkey")
        .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    }
    assert(SparkEntry.queries("graph_degrees")(spark, dir0).count() == 0)
  }

  test("sample_estimate replays the MD5 inclusion set exactly; estimator is 10x the sample") {
    val docs = (1L to 60L).map(i => (i, ("w " * ((i % 7).toInt + 1)).trim, "en", "web", 10L))
    val dir = scratchDir { d =>
      docs.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$d/documents.parquet")
    }
    def inSample(id: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"est-v1:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 1000L < 100L
    }
    val expSampled = docs.count(d => inSample(d._1)).toLong
    val expTokSampled = docs.filter(d => inSample(d._1)).map(_._1 % 7 + 1).sum
    val row = SparkEntry.queries("sample_estimate")(spark, dir)
      .as[(String, Long, Long, Long, Double, Boolean, Long, Long)].collect().toSeq
    assert(row.size == 1)
    val (_, nTrue, nS, nEst, ci, covered, tokTrue, tokEst) = row.head
    assert((nTrue, nS, nEst, tokEst) == (60L, expSampled, expSampled * 10, expTokSampled * 10),
      s"got ${row.head} want sampled=$expSampled")
    assert(tokTrue == docs.map(_._1 % 7 + 1).sum)
    assert(covered == (math.abs(nTrue - nEst).toDouble <= 19.6 * math.sqrt(nS * 0.9)), s"ci=$ci")
  }

  test("trend_robust: Theil-Sen median slope resists the outlier OLS would chase; MK ties zero the variance") {
    // "up": y = 1..5 -> slope 1, S = 10, z = 9/sqrt(300/18) = 2.2045
    // "flat": constant y -> one tie group of 5 zeroes the MK variance
    //         (the var18 > 0 guard) and the slope is 0
    // "noisy": y = 1,5,2,6,3 -> sorted pair slopes put BOTH middles at
    //          0.5 (median 0.5 despite slopes from -3 to 4), S = 4
    var id = 0L
    def mk(typ: String, ys: Seq[Int]) = ys.zipWithIndex.flatMap { case (y, d) =>
      (1 to y).map { i =>
        id += 1
        (id, java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 10:00:$i%02d"), 1L, typ, 1.0, "{}")
      }
    }
    val dir = scratchDir { d =>
      (mk("up", Seq(1, 2, 3, 4, 5)) ++ mk("flat", Seq(3, 3, 3, 3, 3)) ++
        mk("noisy", Seq(1, 5, 2, 6, 3)))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$d/events.parquet")
    }
    val got = SparkEntry.queries("trend_robust")(spark, dir)
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq(
      ("flat", 5L, 0L, 0.0, 0.0),
      ("noisy", 5L, 4L, 0.7348, 0.5),
      ("up", 5L, 10L, 2.2045, 1.0)), s"got $got")
  }

  test("bpe_train learns the hand-computed merge sequence and stops when pairs run out") {
    // corpus "aaab aaab ab": round 1 merges (a,a) cnt 4 — greedy-left,
    // so "a a a" merges ONCE; round 2 (a,b) cnt 3; round 3 (aa,ab)
    // cnt 2; round 4 finds no pair and the loop stops at 3 of 6 rows
    val dir = scratchDir { d =>
      Seq((1L, "aaab aaab ab", "en", "s", 12L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$d/documents.parquet")
    }
    val got = SparkEntry.queries("bpe_train")(spark, dir)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(got == Seq(
      (1, "a", "a", "aa", 4L),
      (2, "a", "b", "ab", 3L),
      (3, "aa", "ab", "aaab", 2L)), s"got $got")
  }

  test("ts_decompose splits a flat-plus-Monday series into exact trend/seasonal/zero-residual") {
    // 14 days, y=15 every Monday else 10: every full 7-day window
    // holds exactly one Monday so trend is flat 75/7; each dow group
    // has one member so residuals vanish identically
    def day(d: Int) = f"2024-01-${d}%02d 12:00:"
    var id = 0L
    val rows = (1 to 14).flatMap { d =>
      val k = if (d % 7 == 1) 15 else 10 // Jan 1, 8 are Mondays (dow 0)
      (1 to k).map { i =>
        id += 1
        (id, java.sql.Timestamp.valueOf(day(d) + f"${i}%02d"), 1L, "view", 1.0, "{}")
      }
    }
    val dir = scratchDir { d =>
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$d/events.parquet")
    }
    val got = SparkEntry.queries("ts_decompose")(spark, dir)
      .as[(java.sql.Date, Long, Double, Double, Double)].collect().toSeq
    assert(got.size == 8, s"got $got") // Jan 4..11 have full windows
    val monday = got.find(_._1.toString == "2024-01-08").get
    assert((monday._2, monday._3, monday._4, monday._5) == (15L, 10.7143, 4.2857, 0.0), s"got $monday")
    val thursday = got.find(_._1.toString == "2024-01-05").get
    assert((thursday._2, thursday._3, thursday._4, thursday._5) == (10L, 10.7143, -0.7143, 0.0), s"got $thursday")
    got.foreach { r => assert(r._5 == 0.0, s"one-member dow groups must have zero residual: $r") }
  }

  test("entity_resolve closes fuzzy-match chains across sources; unmatched records are absent") {
    // chain: cust "12" ~ supp "13" ~ cust "93" (each one edit apart,
    // the ends two apart) must land in ONE entity via transitive
    // closure; exact pair "77"x"77" forms its own entity with the
    // SUPPLIER canonical (lower disjoint id 5 < 6); cust "555" matches
    // nothing and must be absent
    val dir = scratchDir { d =>
      Seq((1L, "Customer#000000012"), (2L, "Customer#000000093"),
        (3L, "Customer#000000077"), (4L, "Customer#000000555"))
        .toDF("c_custkey", "c_name").write.mode("overwrite").parquet(s"$d/customer.parquet")
      Seq((1L, "Supplier#000000013"), (2L, "Supplier#000000077"))
        .toDF("s_suppkey", "s_name").write.mode("overwrite").parquet(s"$d/supplier.parquet")
    }
    val got = SparkEntry.queries("entity_resolve")(spark, dir)
      .as[(Long, String, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      (2L, "customer", 2L, true), (3L, "supplier", 2L, false),
      (4L, "customer", 2L, false), (5L, "supplier", 5L, true),
      (6L, "customer", 5L, false)), s"got $got")
  }

  test("slo_multiburn: long+short must BOTH fire for a page; slow leaks ticket") {
    // day 1: a clean hour of views, then one bucket of pure errors —
    // the 1h window crosses 14.4% AND the bucket itself does: page.
    // day 2: a 10% drip — never 14.4% in the current bucket (no page)
    // but both ticket windows (rows-based, trailing into day 1) exceed
    // 6%: every day-2 bucket tickets
    def e(id: Long, t: String, typ: String) =
      (id, java.sql.Timestamp.valueOf(t), 1L, typ, 1.0, "{}")
    var id = 0L
    def burst(t: String, typ: String, k: Int) =
      (1 to k).map { i => id += 1; e(id, t, typ) }
    val day1 = (0 until 12).flatMap { b =>
      burst(f"2024-01-01 09:${b * 5}%02d:01", "view", 10)
    } ++ burst("2024-01-01 10:00:01", "error", 20)
    val day2 = (0 until 6).flatMap { b =>
      burst(f"2024-01-02 09:${b * 5}%02d:01", "error", 1) ++
        burst(f"2024-01-02 09:${b * 5}%02d:02", "view", 9)
    }
    val dir = scratchDir { d =>
      (day1 ++ day2).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$d/events.parquet")
    }
    val got = SparkEntry.queries("slo_multiburn")(spark, dir)
      .as[(java.sql.Timestamp, String, Double, Double)].collect().toSeq
    val sev = got.map(r => r._1.toString -> r._2).toMap
    assert(sev("2024-01-01 10:00:00.0") == "page", s"got $got")
    (0 until 6).foreach { b =>
      assert(sev(f"2024-01-02 09:${b * 5}%02d:00.0") == "ticket", s"got $got")
    }
    assert(got.size == 7, s"got $got")
    val page = got.find(_._2 == "page").get
    assert(page._3 == 15.3846, s"burn_1h ${page._3}") // 20/130/0.01
  }

  test("downsample_lttb keeps both endpoints and the spike, emitting 40 of 45 points") {
    // hourly series: y=1 everywhere except a y=50 spike at hour 20 —
    // the spike dominates its bucket's triangle area and MUST survive
    def e(id: Long, t: java.sql.Timestamp) = (id, t, 1L, "view", 1.0, "{}")
    val t0 = java.sql.Timestamp.valueOf("2024-03-01 00:30:00").getTime
    var id = 0L
    val rows = (0 until 45).flatMap { h =>
      val k = if (h == 20) 50 else 1
      (1 to k).map { _ => id += 1; e(id, new java.sql.Timestamp(t0 + h * 3600_000L)) }
    }
    val dir = scratchDir { d =>
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$d/events.parquet")
    }
    val got = SparkEntry.queries("downsample_lttb")(spark, dir)
      .as[(java.sql.Timestamp, Long, Long)].collect().toSeq
    assert(got.size == 40, s"got ${got.size} rows")
    assert(got.head._3 == -1L && got.last._3 == 38L, "endpoints must be kept verbatim")
    assert(got.head._1.getTime == t0 - 1800_000L && got.last._1.getTime == t0 + 44 * 3600_000L - 1800_000L)
    assert(got.exists(_._2 == 50L), s"the spike must survive downsampling: $got")
    assert(got.map(_._1.getTime).sliding(2).forall(p => p(0) < p(1)), "x-ordered output")
  }

  test("sequence_match demands ORDER, ties break on event_id, gaps are free") {
    // user 1: v..c..p with an error between — order holds through the
    // gap; user 2: the same three events reversed in time — no match;
    // user 3: signup then purchase; user 4: SAME timestamp for p and s
    // — event_id must decide (p before s => no signup_buy)
    def e(id: Long, u: Long, t: String, typ: String) =
      (id, java.sql.Timestamp.valueOf(t), u, typ, 1.0, "{}")
    val dir = scratchDir { d =>
      Seq(
        e(10, 1, "2024-01-01 00:00:01", "view"),
        e(11, 1, "2024-01-01 00:00:02", "error"),
        e(12, 1, "2024-01-01 00:00:03", "click"),
        e(13, 1, "2024-01-01 00:00:04", "purchase"),
        e(20, 2, "2024-01-01 00:00:01", "purchase"),
        e(21, 2, "2024-01-01 00:00:02", "click"),
        e(22, 2, "2024-01-01 00:00:03", "view"),
        e(30, 3, "2024-01-01 00:00:01", "signup"),
        e(31, 3, "2024-01-01 00:00:02", "purchase"),
        e(40, 4, "2024-01-01 00:00:05", "purchase"),
        e(41, 4, "2024-01-01 00:00:05", "signup"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$d/events.parquet")
    }
    val got = SparkEntry.queries("sequence_match")(spark, dir)
      .as[(Long, Long, String, Boolean, Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, 4L, "vecp", true, false),
      (2L, 3L, "pcv", false, false),
      (3L, 2L, "sp", false, true),
      (4L, 2L, "ps", false, false)), s"got $got")
  }
}
