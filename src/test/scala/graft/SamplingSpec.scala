package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.data.Sampling

class SamplingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Tables(spark, TestSpark.SfDir, "documents")

  test("stratified sample fills each stratum's quota deterministically") {
    val ev = Tables(spark, TestSpark.SfDir, "events").select("event_id", "event_type")
    val out = Sampling.stratifiedSample(ev, "event_type", "event_id", quota = 20)
    val byStratum = out.groupBy("event_type").count()
      .as[(String, Long)].collect().toMap
    val full = ev.groupBy("event_type").count().as[(String, Long)].collect().toMap
    // every stratum present, capped at the quota (smaller strata keep all)
    assert(byStratum.keySet == full.keySet)
    byStratum.foreach { case (k, n) => assert(n == math.min(20L, full(k)), s"$k: $n") }
    // deterministic: same corpus, same picks
    val again = Sampling.stratifiedSample(ev, "event_type", "event_id", quota = 20)
      .select("event_id").as[Long].collect().toSet
    assert(again == out.select("event_id").as[Long].collect().toSet)
  }

  test("weighted sample matches a local A-RES recompute and plans as a bounded top-k") {
    val d = docs.select("doc_id", "n_chars")
    val out = Sampling.weightedSample(d, "doc_id", col("n_chars"), k = 50)
    // local brute-force of the identical score formula (same JVM math)
    val local = d.as[(Long, Long)].collect().toSeq
      .filter(_._2 > 0)
      .map { case (id, w) =>
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        val u = java.lang.Long.parseLong(md5.take(15), 16).toDouble / math.pow(2, 60)
        (id, math.pow(u, 1.0 / w))
      }
      .sortBy { case (id, s) => (-s, id) }
      .take(50).map(_._1).toSet
    assert(out.select("doc_id").as[Long].collect().toSet == local)
    // deterministic across evaluations
    assert(out.select("doc_id").as[Long].collect().toSet == local)
    // scale shape: global sort + limit must plan as TakeOrderedAndProject
    // (bounded per-partition heaps), never a full sort exchange
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected bounded top-k plan:\n$plan")
    // null / non-positive weights can never be sampled
    val weighted = Sampling.weightedSample(
      Seq((1L, 5L), (2L, 0L), (3L, -1L)).toDF("id", "w"), "id", col("w"), k = 10)
    assert(weighted.select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("decontamination flags exactly the docs sharing an n-gram with the eval set") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the dog"), // shares "the quick brown fox jumps"
      (2L, "completely different words here now ok")).toDF("doc_id", "text")
    val eval_ = Seq((100L, "the quick brown fox jumps far away")).toDF("doc_id", "text")
    val out = graft.data.Decontaminate.overlap(train, eval_, "doc_id", "text", n = 5)
      .as[(Long, Long)].collect().toSeq
    // doc 1 shares 5-grams "the quick brown fox jumps" only (the next
    // train 5-gram "quick brown fox jumps over" diverges); doc 2 clean
    assert(out == Seq((1L, 1L)), s"got $out")
  }

  test("mix sampling hits target shares at the largest feasible total, deterministically") {
    import graft.data.Mix
    val d = docs.withColumn("domain",
      concat(lit("d"), (expr("CAST(substring(source, 4) AS INT)") % 3).cast("string")))
    val shares = Seq("d0" -> 0.5, "d1" -> 0.3, "d2" -> 0.2)
    val out = Mix.sample(d, "doc_id", "domain", shares)
    val by = out.groupBy("domain").count().as[(String, Long)].collect().toMap
    val total = by.values.sum.toDouble
    shares.foreach { case (g, t) =>
      assert(math.abs(by(g) / total - t) < 0.08,
        s"$g share ${by(g) / total} far from target $t (counts $by)")
    }
    // no group oversampled past what exists
    val have = d.groupBy("domain").count().as[(String, Long)].collect().toMap
    by.foreach { case (g, n) => assert(n <= have(g)) }
    // deterministic across evaluations
    val again = Mix.sample(d, "doc_id", "domain", shares)
      .select("doc_id").as[Long].collect().toSet
    assert(again == out.select("doc_id").as[Long].collect().toSet)
    // groups missing from the share list are excluded entirely
    val only = Mix.sample(d, "doc_id", "domain", Seq("d1" -> 1.0))
      .select("domain").distinct().as[String].collect().toSeq
    assert(only == Seq("d1"))
    // shares must sum to 1
    intercept[IllegalArgumentException] {
      Mix.sample(d, "doc_id", "domain", Seq("d0" -> 0.5, "d1" -> 0.2))
    }
    ()
  }

  test("temperature sampling flattens group shares toward n^alpha, alpha=1 is a no-op") {
    import graft.data.Mix
    val d = docs // documents table: lang groups with uneven sizes
    val natural = d.groupBy("lang").count().as[(String, Long)].collect().toMap
    // alpha = 1: natural proportions are already feasible at the full
    // corpus — (essentially) every row kept; floor rounding at bucket
    // boundaries may shave a stray bucket
    val kept1 = Mix.temperatureSample(d, "doc_id", "lang", alpha = 1.0).count()
    assert(kept1 >= (d.count() * 99) / 100 && kept1 <= d.count(), s"alpha=1 kept $kept1")
    // alpha = 0.5: output shares track n^0.5 renormalized
    val out = Mix.temperatureSample(d, "doc_id", "lang", alpha = 0.5)
    val by = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    val z = natural.values.map(n => math.sqrt(n.toDouble)).sum
    val total = by.values.sum.toDouble
    natural.foreach { case (g, n) =>
      val want = math.sqrt(n.toDouble) / z
      assert(math.abs(by(g) / total - want) < 0.08,
        s"$g share ${by(g) / total} far from temperature target $want (counts $by)")
      assert(by(g) <= n, s"$g oversampled")
    }
    // flattening: the head group's share shrinks vs natural, the tail's grows
    val head = natural.maxBy(_._2)._1
    val tail_ = natural.minBy(_._2)._1
    val naturalTotal = natural.values.sum.toDouble
    assert(by(head) / total < natural(head) / naturalTotal + 1e-9)
    assert(by(tail_) / total > natural(tail_) / naturalTotal - 1e-9)
    // deterministic
    val again = Mix.temperatureSample(d, "doc_id", "lang", alpha = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(again == out.select("doc_id").as[Long].collect().toSet)
    // alpha outside (0, 1] rejected
    intercept[IllegalArgumentException](Mix.temperatureSample(d, "doc_id", "lang", 0.0))
    intercept[IllegalArgumentException](Mix.temperatureSample(d, "doc_id", "lang", 1.5))
    ()
  }

  test("epochs mix repeats rows to the fractional budget, deterministically, dropping unlisted") {
    import graft.data.Mix
    val d = docs
    val natural = d.groupBy("lang").count().as[(String, Long)].collect().toMap
    val epochs = Seq("en" -> 1.0, "de" -> 2.5, "zh" -> 3.0)
    val out = Mix.epochsSample(d, "doc_id", "lang", epochs)
    val by = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    // unlisted groups are excluded entirely
    assert(by.keySet == Set("en", "de", "zh"))
    // integer epochs are exact: every row exactly e times
    assert(by("en") == natural("en"))
    assert(by("zh") == 3 * natural("zh"))
    // fractional epochs land within bucket granularity of e·n
    val want = 2.5 * natural("de")
    assert(math.abs(by("de") - want) <= math.max(3.0, 0.15 * want),
      s"de copies ${by("de")} far from $want")
    // copy indices are dense 0..copies-1 per doc
    val perDoc = out.where(col("lang") === "de")
      .groupBy("doc_id").agg(count(lit(1)).as("n"), max("copy").as("mx"), min("copy").as("mn"))
      .as[(Long, Long, Long, Long)].collect()
    assert(perDoc.forall { case (_, n, mx, mn) => mn == 0 && mx == n - 1 && (n == 2 || n == 3) })
    // the extra-copy set is deterministic across runs
    val a = out.select("doc_id", "copy").as[(Long, Long)].collect().toSet
    val b = Mix.epochsSample(d, "doc_id", "lang", epochs)
      .select("doc_id", "copy").as[(Long, Long)].collect().toSet
    assert(a == b)
    intercept[IllegalArgumentException](Mix.epochsSample(d, "doc_id", "lang", Seq("en" -> 0.0)))
    ()
  }

  test("bloom filter has no false negatives and a sane false-positive rate") {
    val keys = (0 until 2000).map(i => s"key_$i")
    val bloom = graft.data.Bloom.build(keys.toDF("k"), col("k"))
    // no false negatives, ever
    val members = keys.toDF("k").where(bloom.mightContain(col("k"))).count()
    assert(members == 2000L, s"bloom dropped ${2000 - members} inserted keys")
    // false positives bounded: 10 bits/key, k=5 gives ~0.1%; allow 1%
    val fresh = (0 until 10000).map(i => s"other_$i")
    val fp = fresh.toDF("k").where(bloom.mightContain(col("k"))).count()
    assert(fp < 100, s"false-positive rate too high: $fp / 10000")
  }

  test("bloom-prefiltered decontamination equals the exact overlap") {
    val train = docs.where(col("doc_id") % 97 =!= 0)
    val eval_ = docs.where(col("doc_id") % 97 === 0)
    val exact = graft.data.Decontaminate.overlap(train, eval_, "doc_id", "text", n = 5)
      .as[(Long, Long)].collect().toMap
    val bloomed = graft.data.Decontaminate.overlapBloom(train, eval_, "doc_id", "text", n = 5)
      .as[(Long, Long)].collect().toMap
    assert(bloomed == exact, "bloom path must be exact after the verify join")
    assert(exact.nonEmpty, "fixture must actually overlap or the test is vacuous")
  }

  test("hash sample is deterministic, ~pct-sized, and append-stable") {
    val a = Sampling.sampleByHash(docs, "doc_id", 10).select("doc_id").as[Long].collect().toSet
    val b = Sampling.sampleByHash(docs, "doc_id", 10).select("doc_id").as[Long].collect().toSet
    assert(a == b, "same corpus must give the same sample")
    val n = docs.count().toDouble
    assert(a.size > n * 0.04 && a.size < n * 0.20, s"10% sample wildly off: ${a.size}/$n")
    // append-stability: membership decided per key, so a sample of a
    // subset is exactly the sample restricted to that subset
    val half = docs.where(col("doc_id") < 250)
    val sHalf = Sampling.sampleByHash(half, "doc_id", 10).select("doc_id").as[Long].collect().toSet
    assert(sHalf == a.filter(_ < 250), "adding documents must not change prior membership")
  }

  test("split assignment partitions every row, roughly by weight, stable per key") {
    val out = Sampling.assignSplits(docs, "doc_id", Seq("train" -> 80, "val" -> 10, "test" -> 10))
    val counts = out.groupBy("split").count().as[(String, Long)].collect().toMap
    val n = docs.count()
    assert(counts.values.sum == n, "every row gets exactly one split")
    assert(counts("train") > n * 0.6, s"train share off: $counts")
    assert(counts.keySet == Set("train", "val", "test"))
    // weights must sum to 100
    intercept[IllegalArgumentException] {
      Sampling.assignSplits(docs, "doc_id", Seq("a" -> 50, "b" -> 10))
    }
    ()
  }

  test("sequence packing lays token spans contiguously and chunks them correctly") {
    val docs = Tables(spark, TestSpark.SfDir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val packed = graft.data.Packing.packChunks(docs, "doc_id", "n_tokens", capacity = 100)
      .select("doc_id", "n_tokens", "start_offset", "first_chunk", "last_chunk")
      .as[(Long, Long, Long, Long, Long)].collect()
    // spans are contiguous in the packing order: sorted by offset, each
    // document starts exactly where the previous one ended
    val byOffset = packed.sortBy(_._3)
    byOffset.sliding(2).foreach {
      case Array((_, n, s, _, _), (_, _, s2, _, _)) => assert(s2 == s + n, "gap or overlap in token stream")
      case _ =>
    }
    // chunk indexes match the offsets
    byOffset.foreach { case (_, n, s, first, last) =>
      assert(first == s / 100)
      assert(last == (if (n > 0) (s + n - 1) / 100 else s / 100))
    }
    // total stream length = sum of token counts
    val total = packed.map(_._2).sum
    val lastDoc = byOffset.last
    assert(lastDoc._3 + lastDoc._2 == total)
    // reproducible
    val again = graft.data.Packing.packChunks(docs, "doc_id", "n_tokens", capacity = 100)
      .select("doc_id", "start_offset").as[(Long, Long)].collect().toMap
    assert(packed.map(t => t._1 -> t._3).toMap == again)
  }

  test("overlapping chunker covers every token, keeps stride overlap, reconstructs docs") {
    // hand case: 10 tokens, win=4, stride=2 → starts 0,2,4,6,8
    val doc = Seq((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")).toDF("doc_id", "text")
    val out = graft.data.Chunker.chunks(doc, "doc_id", "text", win = 4, stride = 2)
      .orderBy("chunk_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 0L, 4L, "t0 t1 t2 t3"), (1L, 1L, 4L, "t2 t3 t4 t5"),
      (1L, 2L, 4L, "t4 t5 t6 t7"), (1L, 3L, 4L, "t6 t7 t8 t9"),
      (1L, 4L, 2L, "t8 t9")))
    // corpus invariants: chunk ids dense from 0; n_tokens matches the
    // chunk text; stride-spaced chunks reconstruct the document exactly
    val docs = Tables(spark, TestSpark.SfDir, "documents")
    val chunks = graft.data.Chunker.chunks(docs, "doc_id", "text", win = 32, stride = 16)
      .as[(Long, Long, Long, String)].collect().groupBy(_._1)
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(chunks.keySet == texts.keySet)
    chunks.foreach { case (id, cs) =>
      val sorted = cs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == sorted.indices.map(_.toLong), s"doc $id: chunk ids not dense")
      sorted.foreach { case (_, _, n, c) => assert(c.split(" ", -1).length == n, s"doc $id: n_tokens mismatch") }
      // non-overlapped prefixes (first `stride` tokens of each chunk,
      // whole tail for the last) concatenate back to the document
      val rebuilt = sorted.map { case (_, cid, _, c) =>
        val t = c.split(" ", -1)
        if (cid == sorted.last._2) t else t.take(16)
      }.flatten.mkString(" ")
      assert(rebuilt == texts(id), s"doc $id: reconstruction mismatch")
    }
  }

  test("bpe merge-pair counts match a local recompute on testdata") {
    val docs = Tables(spark, TestSpark.SfDir, "documents")
    val got = graft.text.BpePairs.topMerges(docs, "text", k = 25)
      .as[(String, Long)].collect().toSeq
    // local ground truth: count every adjacent char pair occurrence
    val counts = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    docs.select("text").as[String].collect().foreach { t =>
      t.split(" ", -1).filter(_.length >= 2).foreach { w =>
        w.sliding(2).foreach(p => counts(p) += 1)
      }
    }
    val want = counts.toSeq.sortBy { case (p, c) => (-c, p) }.take(25)
    assert(got == want, s"got=${got.take(5)}... want=${want.take(5)}...")
  }

  test("balanced shards: full cover, tight size balance, serpentine order, reproducible") {
    val n = 8
    val out = Sampling.balancedShards(docs.select("doc_id", "n_chars"), "doc_id", col("n_chars"), n)
    val rows = out.select("doc_id", "n_chars", "shard")
      .as[(Long, Long, Long)].collect().toSeq
    // every document assigned exactly once, to a valid shard
    assert(rows.map(_._1).toSet.size == docs.count())
    assert(rows.forall(r => r._3 >= 0 && r._3 < n))
    // balance: serpentine LPT keeps shard char totals within one
    // max-document of each other (block of 2n deals one large + one
    // small per shard)
    val totals = rows.groupBy(_._3).view.mapValues(_.map(_._2).sum).values.toSeq
    val maxDoc = rows.map(_._2).max
    assert(totals.max - totals.min <= maxDoc,
      s"imbalance ${totals.max - totals.min} exceeds one max doc ($maxDoc)")
    // serpentine: the 2n largest docs cover every shard exactly twice
    val firstTwoBlocks = rows.sortBy(r => (-r._2, r._1)).take(2 * n).map(_._3)
    assert(firstTwoBlocks.groupBy(identity).values.forall(_.size == 2))
    // reproducible under a different input partitioning
    val again = Sampling.balancedShards(
      docs.select("doc_id", "n_chars").repartition(7), "doc_id", col("n_chars"), n)
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    assert(rows.map(r => r._1 -> r._3).toMap == again)
  }

  test("balanced shards bound imbalance on adversarial size distributions") {
    // power-law + constant + spike mixes — the distributions real
    // corpora throw at a shard writer; serpentine LPT must keep the
    // spread within one max item on each
    val rnd = new scala.util.Random(1234)
    val dists = Seq(
      ("powerlaw", (1 to 500).map(i => (i.toLong, math.pow(rnd.nextDouble(), -1.2).min(1e6).toLong + 1))),
      ("constant", (1 to 500).map(i => (i.toLong, 100L))),
      ("spike", (1 to 500).map(i => (i.toLong, if (i <= 3) 100000L else 10L))))
    for ((name, rows) <- dists; n <- Seq(4, 16)) {
      val out = Sampling.balancedShards(rows.toDF("id", "sz"), "id", col("sz"), n)
        .select("sz", "shard").as[(Long, Long)].collect().toSeq
      val totals = (0L until n).map(s => out.filter(_._2 == s).map(_._1).sum)
      val maxItem = rows.map(_._2).max
      assert(out.size == rows.size && out.forall(r => r._2 >= 0 && r._2 < n))
      assert(totals.max - totals.min <= maxItem,
        s"$name n=$n: spread ${totals.max - totals.min} > max item $maxItem")
    }
  }

  test("deterministic shuffle is a reproducible permutation, not id order") {
    val out = Sampling.deterministicShuffle(docs, "doc_id").select("pos", "doc_id")
      .as[(Long, Long)].collect().sortBy(_._1)
    val n = docs.count()
    assert(out.map(_._1).toSeq == (1L to n).toSeq, "pos must be a dense 1..n sequence")
    assert(out.map(_._2).toSet.size == n, "every doc appears exactly once")
    assert(out.map(_._2).toSeq != out.map(_._2).sorted.toSeq, "order must not be id order")
    val again = Sampling.deterministicShuffle(docs, "doc_id").select("pos", "doc_id")
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == again.toSeq, "shuffle must be reproducible")
  }

  test("curriculum order: ntile-sized phases, easy-to-hard, shuffled within, dense pos") {
    val out = Sampling.curriculumOrder(docs, "doc_id", col("n_chars"), 4)
      .select("doc_id", "phase", "pos")
      .as[(Long, Int, Long)].collect().sortBy(_._3)
    val n = docs.count().toInt
    assert(out.map(_._3).toSeq == (1L to n).toSeq, "pos must be dense 1..n")
    assert(out.map(_._1).toSet.size == n, "every doc exactly once")
    // pos order is phase-major: phases appear as 0..3 non-decreasing
    assert(out.map(_._2).toSeq == out.map(_._2).sorted.toSeq, "pos must sort by phase")
    // ntile sizing: first n%4 phases hold one extra row
    val sizes = out.groupBy(_._2).view.mapValues(_.length).toMap
    val base = n / 4
    (0 until 4).foreach { p =>
      val want = if (p < n % 4) base + 1 else base
      assert(sizes(p) == want, s"phase $p size ${sizes(p)} != $want")
    }
    // easy-to-hard: every doc in phase p is <= every doc in phase p+1
    // under the (n_chars, doc_id) order
    val lens = docs.select("doc_id", "n_chars").as[(Long, Long)].collect().toMap
    val keyOf = out.map(r => r._2 -> (lens(r._1), r._1))
    (0 until 3).foreach { p =>
      val maxP = keyOf.filter(_._1 == p).map(_._2).max
      val minN = keyOf.filter(_._1 == p + 1).map(_._2).min
      assert(implicitly[Ordering[(Long, Long)]].lteq(maxP, minN))
    }
    // within-phase order is the hash shuffle, not score or id order
    val phase0 = out.filter(_._2 == 0).sortBy(_._3).map(_._1)
    assert(phase0.toSeq != phase0.sorted.toSeq, "in-phase order must not be id order")
    // reproducible
    val again = Sampling.curriculumOrder(docs, "doc_id", col("n_chars"), 4)
      .select("doc_id", "phase", "pos").as[(Long, Int, Long)].collect().sortBy(_._3)
    assert(out.toSeq == again.toSeq)
    // n < phases degenerates to one row per phase (ntile semantics)
    val tiny = Sampling.curriculumOrder(docs.limit(3), "doc_id", col("n_chars"), 4)
      .select("phase").as[Int].collect().sorted.toSeq
    assert(tiny == Seq(0, 1, 2))
  }
}
