package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sim.{Cosine, Knn, LshAnn}
import graft.text.TextStats

class AnnTextSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def emb = Tables(spark, TestSpark.SfDir, "embeddings")
    .select(col("vec_id"), Cosine.asDouble(col("embedding")).as("v"))

  test("brute-force knn returns k self-excluded neighbors per query") {
    val queries = emb.where(col("vec_id") < 3).select(col("vec_id").as("qid"), col("v").as("qvec"))
    val corpus = emb.select(col("vec_id").as("id"), col("v").as("vec"))
    val out = Knn.topK(queries, corpus, 5).collect()
    assert(out.length == 15)
    assert(out.forall(r => r.getAs[Long]("q") != r.getAs[Long]("neighbor")))
    // per-query sims are non-increasing with rank
    out.groupBy(_.getAs[Long]("q")).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("sim"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("knn classify: majority vote, deterministic tie-breaks, label-disjoint probes") {
    // probe (1,0): top-3 by cosine are 10 (1.0), 11 (~.994), 14 (~.919)
    // → two votes label 1 vs one vote label 3
    val corpus = Seq(
      (10L, Seq(1.0, 0.0), 1), (11L, Seq(0.9, 0.1), 1),
      (12L, Seq(0.0, 1.0), 2), (13L, Seq(0.1, 0.9), 2),
      (14L, Seq(0.7, 0.3), 3)).toDF("id", "vec", "label")
    val probe = Seq((1L, Seq(1.0, 0.0))).toDF("qid", "qvec")
    val out = Knn.classify(probe, corpus, k = 3)
      .select("q", "pred", "votes").as[(Long, Int, Long)].collect().toSeq
    assert(out == Seq((1L, 1, 2L)))
    // exact vote tie AND best-sim tie → smallest label wins
    val sym = Seq((10L, Seq(1.0, 0.0), 5), (12L, Seq(0.0, 1.0), 3)).toDF("id", "vec", "label")
    val mid = Seq((1L, Seq(0.5, 0.5))).toDF("qid", "qvec")
    val tie = Knn.classify(mid, sym, k = 2)
      .select("pred", "votes").as[(Int, Long)].collect().toSeq
    assert(tie == Seq((3, 1L)))
    // real-table determinism: two evaluations agree exactly
    val e = emb.join(Tables(spark, TestSpark.SfDir, "embeddings").select("vec_id", "label"), "vec_id")
    val probes = e.where(col("vec_id") < 10).select(col("vec_id").as("qid"), col("v").as("qvec"))
    val corp = e.where(col("vec_id") >= 10)
      .select(col("vec_id").as("id"), col("v").as("vec"), col("label"))
    val a = Knn.classify(probes, corp, 7).collect().map(_.toString).sorted
    val b = Knn.classify(probes, corp, 7).collect().map(_.toString).sorted
    assert(a.sameElements(b))
    assert(a.length == 10)
  }

  test("LSH ANN reaches >=0.9 recall vs brute force on testdata") {
    val queries = emb.where(col("vec_id") < 10).select(col("vec_id").as("qid"), col("v").as("qvec"))
    val corpus = emb.select(col("vec_id").as("id"), col("v").as("vec"))
    val bf = Knn.topK(queries, corpus, 5).select("q", "neighbor").as[(Long, Long)].collect().toSet
    val approx = LshAnn.topK(queries, corpus, 5, numTables = 16, bitsPerTable = 4)
      .select("q", "neighbor").as[(Long, Long)].collect().toSet
    val recall = (bf & approx).size.toDouble / bf.size
    assert(recall >= 0.9, s"recall $recall")
  }

  test("IVF ANN: probe-limited search reaches reasonable recall, full probe is exact") {
    val queries = emb.where(col("vec_id") < 10).select(col("vec_id").as("qid"), col("v").as("qvec"))
    val corpus = emb.select(col("vec_id").as("id"), col("v").as("vec"))
    val bf = Knn.topK(queries, corpus, 5).select("q", "neighbor").as[(Long, Long)].collect().toSet
    val ivf = graft.sim.IvfAnn.topK(queries, corpus, 5, numCells = 16, nProbe = 8)
      .select("q", "neighbor").as[(Long, Long)].collect().toSet
    val recall = (bf & ivf).size.toDouble / bf.size
    assert(recall >= 0.5, s"ivf recall $recall")
    // probing every cell degenerates to exact search
    val full = graft.sim.IvfAnn.topK(queries, corpus, 5, numCells = 16, nProbe = 16)
      .select("q", "neighbor").as[(Long, Long)].collect().toSet
    assert(full == bf)
  }

  test("one trained IVF centroid set serves multiple query batches (train/probe split)") {
    val corpus = emb.select(col("vec_id").as("id"), col("v").as("vec"))
    val batch1 = emb.where(col("vec_id") < 5).select(col("vec_id").as("qid"), col("v").as("qvec"))
    val batch2 = emb.where(col("vec_id") >= 5 && col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qvec"))
    // train ONCE, probe twice — the production shape; each batch must
    // match what a per-batch retrain (same deterministic seed + iters)
    // would produce
    val centroids = graft.sim.IvfAnn.train(corpus, numCells = 16, iters = 3)
    def viaHandle(q: org.apache.spark.sql.DataFrame) =
      graft.sim.IvfAnn.topKWith(q, corpus, centroids, 5, nProbe = 8)
        .select("q", "neighbor").as[(Long, Long)].collect().toSet
    def viaRetrain(q: org.apache.spark.sql.DataFrame) =
      graft.sim.IvfAnn.topK(q, corpus, 5, numCells = 16, nProbe = 8)
        .select("q", "neighbor").as[(Long, Long)].collect().toSet
    assert(viaHandle(batch1) == viaRetrain(batch1))
    assert(viaHandle(batch2) == viaRetrain(batch2))
  }

  test("trained IVF centroids beat seed sampling on clustered embeddings") {
    // Synthetic clustered set — the regime where first-N seed sampling
    // fails (one cell swallows a whole cluster): 8 tight clusters whose
    // first-N seeds all come from cluster 0.
    val rnd = new scala.util.Random(7)
    val dim = 16
    val centers = Array.fill(8, dim)(rnd.nextGaussian())
    val points = (0 until 800).map { i =>
      val c = centers(i / 100) // ids 0..99 in cluster 0, etc.
      (i.toLong, c.toIndexedSeq.map(x => x + 0.05 * rnd.nextGaussian()))
    }
    val corpus = points.toDF("id", "vec")
    val queries = points.filter(_._1 % 100 < 2).map { case (i, v) => (i, v) }
      .toDF("qid", "qvec")
    val bf = Knn.topK(queries, corpus, 5).select("q", "neighbor").as[(Long, Long)].collect().toSet
    def recallOf(iters: Int): Double = {
      val got = graft.sim.IvfAnn.topK(queries, corpus, 5, numCells = 8, nProbe = 2, iters = iters)
        .select("q", "neighbor").as[(Long, Long)].collect().toSet
      (bf & got).size.toDouble / bf.size
    }
    val sampled = recallOf(0)
    val trained = recallOf(3)
    assert(trained >= sampled, s"training regressed recall: $trained < $sampled")
    assert(trained >= 0.9, s"trained recall $trained too low on well-separated clusters")
  }

  test("cosine similarity of a vector with itself is 1") {
    val one = emb.limit(1).select(round(Cosine.sim(col("v"), col("v")), 6).as("c")).as[Double].head()
    assert(one == 1.0)
  }

  test("unigram LM scoring matches hand-computed NLL, ranks rare-token docs higher") {
    // corpus: "a" x3, "b" x2, "c" x1 -> total 6
    val docs = Seq((1L, "a a a"), (2L, "b b"), (3L, "c")).toDF("doc_id", "text")
    val out = graft.text.UnigramLm.score(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    def nll(cnts: Seq[Int]): Double = {
      val v = math.log(6.0) - cnts.map(c => math.log(c.toDouble)).sum / cnts.size
      math.rint(v * 1e4) / 1e4
    }
    assert(out(1L) == ((3L, nll(Seq(3, 3, 3)))))  // -ln(3/6) = ln 2
    assert(out(2L) == ((2L, nll(Seq(2, 2)))))     // -ln(2/6) = ln 3
    assert(out(3L) == ((1L, nll(Seq(1)))))        // -ln(1/6) = ln 6
    // the all-rare doc is the least typical: strictly highest NLL
    assert(out(3L)._2 > out(2L)._2 && out(2L)._2 > out(1L)._2)
  }

  test("tf-idf keywords: rare terms outrank common ones, k bounds per doc") {
    // equal tf, different df: "rare" (df=1) must outrank "common" (df=3)
    val docs = Seq(
      (1L, "common rare zz"),
      (2L, "common other words"),
      (3L, "common more words")).toDF("doc_id", "text")
    val out = graft.text.TfIdf.keywords(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id", "tok_rank")
      .as[(Long, String, Double, Long)].collect().toSeq
    val doc1 = out.filter(_._1 == 1L)
    assert(doc1.head._2 == "rare", s"rare term must rank first in doc 1: $doc1")
    // rare and zz tie on score (both df=1, tf=1): token tiebreak is
    // lexicographic, so rare precedes zz; common (idf = ln(1)+1 = 1) is cut
    assert(doc1.map(_._2) == Seq("rare", "zz"))
    assert(out.groupBy(_._1).forall(_._2.size <= 2), "k must bound terms per doc")
    // hand value: rare in doc1 -> tf=1, idf = ln(4/2)+1
    val want = math.rint((math.log(4.0 / 2) + 1) * 1e4) / 1e4
    assert(doc1.head._3 == want)
  }

  test("byte entropy: hand values, null/empty semantics, matches a local recompute") {
    import graft.functions.ByteEntropy
    val docs = Seq(
      (1L, "aaaa"),           // single symbol -> 0
      (2L, "ab"),             // two equiprobable -> ln 2
      (3L, "abcd"),           // four equiprobable -> ln 4
      (4L, ""),               // empty -> 0
      (5L, null.asInstanceOf[String])).toDF("id", "text")
    val got = docs.select(col("id"), ByteEntropy(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(1L).contains(0.0) && got(4L).contains(0.0) && got(5L).isEmpty)
    assert(math.abs(got(2L).get - math.log(2)) < 1e-12)
    assert(math.abs(got(3L).get - math.log(4)) < 1e-12)
    // corpus equivalence vs a local byte-histogram recompute
    val real = Tables(spark, TestSpark.SfDirSmall, "documents")
    val spark_ = real.select(col("doc_id"), ByteEntropy(col("text")).as("h"))
      .as[(Long, Double)].collect().toMap
    real.select("doc_id", "text").as[(Long, String)].collect().foreach { case (id, t) =>
      val bytes = t.getBytes("UTF-8")
      val counts = bytes.groupBy(identity).toSeq.sortBy(_._1 & 0xff).map(_._2.length)
      val n = bytes.length.toDouble
      val want = counts.foldLeft(0.0)((acc, c) => acc - (c / n) * math.log(c / n))
      assert(spark_(id) == want, s"doc $id entropy mismatch")
    }
    // SQL surface + analysis-time failure
    GraftExtensions.register(spark)
    assert(spark.sql("SELECT byte_entropy('aaaa') h").head.getDouble(0) == 0.0)
    intercept[Exception](spark.sql("SELECT byte_entropy(array(1))").collect())
  }

  test("batched embedder: batch-size-invariant, hand-checked dims, feeds the ANN family") {
    val docs = Tables(spark, TestSpark.SfDirSmall, "documents")
    val n = docs.count()
    // batch size must not affect values — 7 never divides the
    // partition sizes, so trailing short batches are exercised
    def emb(bs: Int) = graft.mm.Embedder.embed(docs, "doc_id", "text", dim = 4, batchSize = bs)
      .as[(Long, Seq[Double])].collect().toMap
    val e7 = emb(7)
    assert(e7.size == n && e7 == emb(64))
    // hand recompute of one value via the documented MD5 construction
    val (id0, text0) = docs.select("doc_id", "text").as[(Long, String)].head()
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest((text0 + ":2").getBytes("UTF-8")).map(b => f"$b%02x").mkString.take(15)
    val want = (java.lang.Long.parseLong(hex, 16) % 2001L) / 1000.0 - 1.0
    assert(e7(id0)(2) == want)
    assert(e7.values.forall(_.forall(v => v >= -1.0 && v <= 1.0)))
    // the embedding column feeds the similarity family directly
    val corpus = graft.mm.Embedder.embed(docs, "doc_id", "text", dim = 4)
      .select(col("doc_id").as("id"), col("embedding").as("vec"))
    val qs = corpus.limit(2).select(col("id").as("qid"), col("vec").as("qvec"))
    assert(graft.sim.Knn.topK(qs, corpus, 3).count() == 6)
  }

  test("ewma rate anomaly flags a planted spike against hand-computed state") {
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    // steady rate 10, one 10x spike at hour 8, recovery after
    val counts = ((0 to 11).map(h => (("err", ts(h), if (h == 8) 100L else 10L)))).toDF("k", "bts", "cnt")
    val out = graft.ops.RateAnomaly.detect(counts, "k", "bts", "cnt", warmup = 5)
      .as[(String, java.sql.Timestamp, Long, Double, Double)].collect().toSeq
    // constant series -> ewma 10, var 0 until the spike; only hour 8 flags
    assert(out == Seq(("err", ts(8), 100L, 10.0, 0.0)), s"got $out")
    // a spike INSIDE the warmup must not alert
    val early = ((0 to 11).map(h => (("err", ts(h), if (h == 3) 100L else 10L)))).toDF("k", "bts", "cnt")
    assert(graft.ops.RateAnomaly.detect(early, "k", "bts", "cnt", warmup = 5).isEmpty,
      "warmup buckets must not alert")
    // after the spike, absorbed state must not re-flag the normal rate
    assert(out.size == 1, "recovery buckets must not alert")
  }

  test("bm25 matches a hand-computed score and ranks by saturated tf") {
    // corpus of 4 docs, query "x": df=2, N=4, dl=2 everywhere, avgdl=2
    // -> length norm term is exactly 1, score = idf * tf*2.2/(tf+1.2)
    val docs = Seq(
      (1L, "x x"),   // tf=2
      (2L, "x y"),   // tf=1
      (3L, "y z"),   // tf=0 -> dropped
      (4L, "z w")).toDF("doc_id", "text")
    val out = graft.text.Bm25.search(docs, "doc_id", "text", Seq("x"), k = 10)
      .as[(Long, Double)].collect().toSeq
    val idf = math.log(1.0 + (4 - 2 + 0.5) / (2 + 0.5))
    def sc(tf: Double) = math.rint(idf * tf * 2.2 / (tf + 1.2) * 1e4) / 1e4
    assert(out == Seq((1L, sc(2)), (2L, sc(1))))
    assert(sc(2) > sc(1), "tf saturates but stays monotone")
    // multi-term scores are sums of per-term scores
    val two = graft.text.Bm25.search(docs, "doc_id", "text", Seq("x", "y"), k = 10)
      .as[(Long, Double)].collect().toMap
    assert(two.keySet == Set(1L, 2L, 3L))
    assert(two(2L) > two(1L), "doc matching both terms outranks tf=2 single-term")
  }

  test("PII redaction tags emails, IPv4s, and long digit runs in order") {
    val docs = Seq((1L, "mail a.b+c@ex-1.org or 10.0.0.255 acct 12345678 end"),
      (2L, "clean text 123 here")).toDF("doc_id", "text")
    val out = graft.text.Redact(docs, "doc_id", "text").orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 1L, 1L, 1L, "mail [EMAIL] or [IP] acct [NUM] end"),
      (2L, 0L, 0L, 0L, "clean text 123 here")))
  }

  test("quality ratios on a known sentence") {
    val docs = Seq((1L, "the cat sat")).toDF("doc_id", "text")
    val r = TextStats.quality(docs, "doc_id", "text").head()
    assert(r.getAs[Int]("n_chars") == 11)
    assert(r.getAs[Int]("n_words") == 3)
    assert(r.getAs[Double]("stopword_ratio") == 0.3333)
    assert(r.getAs[Double]("avg_word_len") == 3.0)
    assert(r.getAs[Double]("punct_ratio") == 0.0)
  }

  test("fingerprint is order-sensitive (rolling, not bag-of-words)") {
    val docs = Seq((1L, "a b"), (2L, "b a")).toDF("doc_id", "text")
    val fps = TextStats.fingerprints(docs, "doc_id", "text").as[(Long, Long)].collect().toMap
    assert(fps(1L) != fps(2L))
  }

  test("repetition ratio flags repeated bigrams, zero for short or unique docs") {
    val docs = Seq(
      (1L, "spam spam spam spam"), // bigrams: 3x "spam spam" -> 1 distinct of 3
      (2L, "a b c d"),             // all bigrams unique -> 0
      (3L, "one")                  // < 2 tokens -> 0
    ).toDF("doc_id", "text")
    val out = TextStats.repetition(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 3L, 1L, 0.6667), (2L, 3L, 3L, 0.0), (3L, 0L, 0L, 0.0)))
  }

  test("bpe-ish token count splits punctuation runs from words") {
    val docs = Seq((1L, "hello, world!!")).toDF("doc_id", "text")
    val r = TextStats.tokenCounts(docs, "doc_id", "text").head()
    assert(r.getAs[Int]("n_ws_tokens") == 2)
    assert(r.getAs[Int]("n_bpe_tokens") == 4) // hello , world !!
  }

  test("lang-id flags stopword-dense text as en") {
    val docs = Seq((1L, "the cat is in the house"), (2L, "zzz qqq www")).toDF("doc_id", "text")
    val out = TextStats.langId(docs, "doc_id", "text")
      .orderBy("doc_id").select("lang_pred").as[String].collect().toSeq
    assert(out == Seq("en", "und"))
  }

  test("int8-quantized ANN: high recall vs brute force, true-cosine sims, tight quantized dot") {
    val queries = emb.where(col("vec_id") < 10).select(col("vec_id").as("qid"), col("v").as("qvec"))
    val corpus = emb.select(col("vec_id").as("id"), col("v").as("vec"))
    val bf = Knn.topK(queries, corpus, 5).collect()
      .map(r => (r.getAs[Long]("q"), r.getAs[Long]("neighbor")) -> r.getAs[Double]("sim")).toMap
    val qz = graft.sim.Quantized.topK(queries, corpus, 5, shortlist = 20).collect()
      .map(r => (r.getAs[Long]("q"), r.getAs[Long]("neighbor")) -> r.getAs[Double]("sim")).toMap
    val recall = (bf.keySet & qz.keySet).size.toDouble / bf.size
    // int8 max-abs quantization loses < 0.4% per dot term; with a 4x
    // shortlist margin the exact re-rank recovers essentially all of
    // the brute-force top-5
    assert(recall >= 0.9, s"quantized recall $recall")
    // emitted sims are TRUE cosine: identical to brute force on shared pairs
    (bf.keySet & qz.keySet).foreach { p => assert(bf(p) == qz(p), s"sim mismatch at $p") }
  }

  test("PQ ANN: ADC shortlist reaches recall, degenerate config reproduces exact search") {
    val queries = emb.where(col("vec_id") < 10).select(col("vec_id").as("qid"), col("v").as("qvec"))
    val corpus = emb.select(col("vec_id").as("id"), col("v").as("vec"))
    val bf = Knn.topK(queries, corpus, 5).collect()
      .map(r => (r.getAs[Long]("q"), r.getAs[Long]("neighbor")) -> r.getAs[Double]("sim")).toMap
    val pq = graft.sim.PqAnn.topK(queries, corpus, 5, m = 4, kCodes = 16, shortlist = 50).collect()
      .map(r => (r.getAs[Long]("q"), r.getAs[Long]("neighbor")) -> r.getAs[Double]("sim")).toMap
    val recall = (bf.keySet & pq.keySet).size.toDouble / bf.size
    // near-uniform synthetic vectors are PQ's worst case (codes carry
    // little cluster signal); the 10x shortlist margin still recovers
    // most of the exact top-5, and real clustered embeddings do better
    assert(recall >= 0.6, s"pq recall $recall")
    // emitted sims are TRUE cosine (phase 2): equal on shared pairs
    (bf.keySet & pq.keySet).foreach { p => assert(bf(p) == pq(p), s"sim mismatch at $p") }

    // degenerate config = exact search: one code per vector (kCodes=n,
    // iters=0 seeds every vector as its own centroid -> ADC dot is the
    // EXACT dot product), full shortlist -> identical to brute force
    val tiny = corpus.where(col("id") < 40)
    val tinyQ = queries.where(col("qid") < 3)
    val exact = graft.sim.PqAnn.topK(tinyQ, tiny, 5, m = 4, kCodes = 40, shortlist = 40, iters = 0)
      .select("q", "neighbor", "sim", "rank").collect().map(_.toString).sorted
    val bfTiny = Knn.topK(tinyQ, tiny, 5)
      .select("q", "neighbor", "sim", "rank").collect().map(_.toString).sorted
    assert(exact.sameElements(bfTiny))
  }

  test("IVF-PQ: probe-all equals plain PQ, probe-limited keeps recall") {
    val queries = emb.where(col("vec_id") < 10).select(col("vec_id").as("qid"), col("v").as("qvec"))
    val corpus = emb.select(col("vec_id").as("id"), col("v").as("vec"))
    val cents = graft.sim.IvfAnn.train(corpus, 16, iters = 2)
    val cb = graft.sim.PqAnn.train(corpus, m = 4, kCodes = 16, iters = 2)
    // probing every cell restricts nothing: identical to plain PQ with
    // the same codebooks and shortlist
    val full = graft.sim.PqAnn.topKIvfPqWith(queries, corpus, cents, cb, 5,
      nProbe = 16, shortlist = 50).collect().map(_.toString).sorted
    val plain = graft.sim.PqAnn.topKWith(queries, corpus, cb, 5, shortlist = 50)
      .collect().map(_.toString).sorted
    assert(full.sameElements(plain), "probe-all IVF-PQ must equal plain PQ")
    // probe-limited search still recovers most of the exact top-5
    val bf = Knn.topK(queries, corpus, 5).select("q", "neighbor")
      .as[(Long, Long)].collect().toSet
    val ivfpq = graft.sim.PqAnn.topKIvfPqWith(queries, corpus, cents, cb, 5,
      nProbe = 8, shortlist = 50).select("q", "neighbor")
      .as[(Long, Long)].collect().toSet
    val recall = (bf & ivfpq).size.toDouble / bf.size
    assert(recall >= 0.5, s"ivf-pq recall $recall")
  }

  test("incremental index append equals the one-shot build under a frozen model") {
    val queries = emb.where(col("vec_id") < 10).select(col("vec_id").as("qid"), col("v").as("qvec"))
    val corpus = emb.select(col("vec_id").as("id"), col("v").as("vec"))
    val wave1 = corpus.where(pmod(col("id"), lit(2)) === 0)
    val wave2 = corpus.where(pmod(col("id"), lit(2)) === 1)
    // model frozen from wave 1 (the incremental deployment shape)
    val cents = graft.sim.IvfAnn.train(wave1, 16, iters = 2)
    val cb = graft.sim.PqAnn.train(wave1, m = 4, kCodes = 16, iters = 2)
    // encoding is row-local and pure, so per-wave rows union to the
    // one-shot index exactly
    val appended = graft.sim.PqAnn.indexRows(wave1, cents, cb)
      .union(graft.sim.PqAnn.indexRows(wave2, cents, cb))
    val oneShot = graft.sim.PqAnn.indexRows(corpus, cents, cb)
    assert(appended.collect().map(_.toString).sorted
      .sameElements(oneShot.collect().map(_.toString).sorted),
      "appended index rows differ from the one-shot build")
    // probing the appended store gives the identical result — through a
    // parquet round trip, the store's actual medium
    val dir = java.nio.file.Files.createTempDirectory("ann_store")
    graft.sim.PqAnn.indexRows(wave1, cents, cb).write.parquet(s"$dir/batch=w1")
    graft.sim.PqAnn.indexRows(wave2, cents, cb).write.parquet(s"$dir/batch=w2")
    val viaStore = graft.sim.PqAnn.topKIvfPqIndexed(queries,
      spark.read.parquet(s"$dir/batch=*"), corpus, cents, cb, 5,
      nProbe = 8, shortlist = 50).collect().map(_.toString).sorted
    val direct = graft.sim.PqAnn.topKIvfPqWith(queries, corpus, cents, cb, 5,
      nProbe = 8, shortlist = 50).collect().map(_.toString).sorted
    assert(viaStore.sameElements(direct),
      "probe through the appended parquet store differs from the direct probe")
  }

  test("PQ codes: m entries, in-range, deterministic, encode0/encode agree") {
    val corpus = emb.select(col("vec_id").as("id"), col("v").as("vec"))
    val cb = graft.sim.PqAnn.train(corpus, m = 4, kCodes = 16, iters = 2)
    assert(cb.books.length == 4 && cb.books.forall(_.length == 16))
    assert(cb.subDim == 16)
    val codes = corpus.select(col("id"), graft.sim.PqAnn.encode(col("vec"), cb).as("c"))
      .orderBy("id").collect().map(r => r.getAs[Long]("id") -> r.getSeq[Int](1))
    assert(codes.forall(_._2.length == 4))
    assert(codes.forall(_._2.forall(c => c >= 0 && c < 16)))
    // training is deterministic: a second train from the same corpus
    // produces bit-identical codebooks
    val cb2 = graft.sim.PqAnn.train(corpus, m = 4, kCodes = 16, iters = 2)
    val flat = cb.books.map(_.map(_.toSeq).toSeq).toSeq
    val flat2 = cb2.books.map(_.map(_.toSeq).toSeq).toSeq
    assert(flat == flat2)
  }

  test("PQ training and codes are invariant to input partitioning") {
    val corpus = emb.select(col("vec_id").as("id"), col("v").as("vec"))
    val cb1 = graft.sim.PqAnn.train(corpus.repartition(2), m = 4, kCodes = 8, iters = 2)
    val cb32 = graft.sim.PqAnn.train(corpus.repartition(32), m = 4, kCodes = 8, iters = 2)
    // Lloyd's means are float sums whose combine order follows the
    // partitioning — centroids agree to ulp noise, not bit-identically
    val flat1: Seq[Double] = cb1.books.toSeq.flatMap(_.toSeq.flatMap(_.toSeq))
    val flat32: Seq[Double] = cb32.books.toSeq.flatMap(_.toSeq.flatMap(_.toSeq))
    flat1.zip(flat32).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9, s"centroid drift $a vs $b")
    }
    val c1 = corpus.repartition(3)
      .select(col("id"), graft.sim.PqAnn.encode(col("vec"), cb1).as("c"))
      .collect().map(r => r.getAs[Long]("id") -> r.getSeq[Int](1)).toMap
    val c2 = corpus.repartition(17)
      .select(col("id"), graft.sim.PqAnn.encode(col("vec"), cb1).as("c"))
      .collect().map(r => r.getAs[Long]("id") -> r.getSeq[Int](1)).toMap
    assert(c1 == c2, "codes must not depend on partitioning")
  }

  test("readability inputs: vowel-run syllables and sentence runs on a hand case") {
    // mirrors the text_readability registry query's regex counting
    val df = Seq((1L, "Hello world. It is sunny!")).toDF("doc_id", "text")
    val words = df.select(size(split(col("text"), " "))).head().getInt(0)
    val syl = df.select(size(regexp_extract_all(lower(col("text")), lit("[aeiouy]+"), lit(0))))
      .head().getInt(0)
    val sent = df.select(size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0))))
      .head().getInt(0)
    assert(words == 5 && syl == 7 && sent == 2)
    val flesch = 206.835 - 1.015 * (words.toDouble / sent) - 84.6 * (syl.toDouble / words)
    assert(math.abs(flesch - 85.8575) < 1e-9)
  }

  test("quantize: int8 range, scale round-trips the max component") {
    val d = Seq((1L, Seq(0.5, -1.0, 0.25, 0.0))).toDF("id", "vec")
    val r = d.select(graft.sim.Quantized.quantize(col("vec")).as("qv"))
      .select(col("qv.scale"), col("qv.q")).head()
    val scale = r.getFloat(0)
    val q = r.getSeq[Byte](1)
    assert(q.forall(b => b >= -127 && b <= 127))
    assert(q(1) == -127) // max-abs component pins the range
    assert(math.abs(scale * 127.0 - 1.0) < 1e-6)
    assert(math.abs(scale * q(0) - 0.5) < scale) // within one quantum
  }

  test("deflate size: repetition compresses, bounds hold, matches a direct Deflater run") {
    import graft.functions.DeflateSize
    val docs = Seq(
      (1L, "spam " * 200),                       // highly repetitive
      (2L, (1 to 200).map(i => s"w$i").mkString(" ")), // low repetition
      (3L, ""),
      (4L, null.asInstanceOf[String])).toDF("id", "text")
    val got = docs.select(col("id"), DeflateSize(col("text")).as("z"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    assert(got(4L).isEmpty)
    assert(got(3L).exists(_ > 0)) // empty stream still has a wrapper
    assert(got(1L).get < got(2L).get, s"repetition did not compress: $got")
    // exact agreement with a direct java.util.zip run on corpus text
    val real = Tables(spark, TestSpark.SfDirSmall, "documents").limit(50)
    val spark_ = real.select(col("doc_id"), DeflateSize(col("text")).as("z"))
      .as[(Long, Int)].collect().toMap
    real.select("doc_id", "text").as[(Long, String)].collect().foreach { case (id, t) =>
      val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
      d.setInput(t.getBytes("UTF-8")); d.finish()
      val buf = new Array[Byte](8192)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      d.end()
      assert(spark_(id) == total, s"doc $id deflate size mismatch")
    }
    // SQL surface + analysis-time failure
    GraftExtensions.register(spark)
    assert(spark.sql("SELECT deflate_size('') z").head.getInt(0) > 0)
    intercept[Exception](spark.sql("SELECT deflate_size(array(1))").collect())
  }

  test("MMR re-rank: relevance first, diversity displaces a redundant near-dup, guards hold") {
    import graft.ops.MmrRerank
    // hand-built geometry: A aligned with the query (rel 1.0), B an
    // exact duplicate of A (rel 0.98), C diverse and relevant (rel
    // 0.7, cos(C,A)=0.6), D orthogonal junk (rel 0.0). Plain top-3 =
    // (A, B, C); at λ=0.5 MMR selects A, then C (score 0.05 beats B's
    // −0.01 — redundancy wiped out B's relevance edge — and D's 0.0),
    // then B (−0.01) over D (−0.4, close to the now-selected C).
    val vecs = Seq(
      (100L, Seq(1.0, 0.0)),
      (101L, Seq(1.0, 0.0)),
      (102L, Seq(0.6, 0.8)),
      (103L, Seq(0.0, 1.0))).toDF("id", "vec")
    val shortlist = Seq(
      (1L, 100L, 1.0), (1L, 101L, 0.98), (1L, 102L, 0.7), (1L, 103L, 0.0))
      .toDF("q", "id", "rel")
    val out = MmrRerank.rerank(shortlist, vecs, k = 3, lambda = 0.5)
      .orderBy("rank").select("id", "rank").as[(Long, Int)].collect().toSeq
    assert(out == Seq((100L, 1), (102L, 2), (101L, 3)),
      s"MMR selection diverged from the hand-computed order: $out")
    // λ=1 degenerates to plain top-k by relevance
    val plain = MmrRerank.rerank(shortlist, vecs, k = 3, lambda = 1.0)
      .orderBy("rank").select("id").as[Long].collect().toSeq
    assert(plain == Seq(100L, 101L, 102L), s"λ=1 must be pure top-k: $plain")
    // two queries select independently (breadth-parallel rounds)
    val two = shortlist.unionByName(
      Seq((2L, 102L, 0.9), (2L, 103L, 0.8), (2L, 100L, 0.1)).toDF("q", "id", "rel"))
    val perQ = MmrRerank.rerank(two, vecs, k = 2, lambda = 0.5)
      .select("q", "rank", "id").as[(Long, Int, Long)].collect().toSet
    assert(perQ.count(_._1 == 2L) == 2 && perQ((2L, 1, 102L)),
      s"per-query independence broken: $perQ")
    intercept[IllegalArgumentException](MmrRerank.rerank(shortlist, vecs, 0, 0.5))
    intercept[IllegalArgumentException](MmrRerank.rerank(shortlist, vecs, 2, 1.5))
    // a shortlist id with no embedding row fails loudly (in-plan
    // raise_error) instead of silently shrinking the candidate pool
    val orphaned = shortlist.unionByName(Seq((1L, 999L, 0.5)).toDF("q", "id", "rel"))
    val err = intercept[Exception](
      MmrRerank.rerank(orphaned, vecs, k = 3, lambda = 0.5).collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(err).exists(_.contains("999 has no row in vectors")), msgs(err).mkString(" | "))
  }

  test("byte entropy + deflate size match direct recomputes on randomized adversarial strings") {
    // the corpus tests above run natural text; this sweep drives the
    // shapes that break byte-level kernels — latin-1 control bytes,
    // multi-byte UTF-8 (CJK/combining/surrogate halves → replacement
    // chars, deterministic on both sides), unary runs (max repetition),
    // and near-incompressible alphanumeric noise
    import graft.functions.{ByteEntropy, DeflateSize}
    val rnd = new scala.util.Random(23)
    def randText(): String = rnd.nextInt(4) match {
      case 0 => (0 until rnd.nextInt(300)).map(_ => rnd.nextInt(256).toChar).mkString
      case 1 => (0 until rnd.nextInt(120)).map(_ =>
        "世́😀é".charAt(rnd.nextInt(5))).mkString
      case 2 => "a" * rnd.nextInt(500)
      case _ => (0 until rnd.nextInt(200)).map(_ => ('0' + rnd.nextInt(75)).toChar).mkString
    }
    val texts = Seq.fill(200)(randText()).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val got = texts.toDF("id", "text")
      .select(col("id"), ByteEntropy(col("text")).as("h"), DeflateSize(col("text")).as("z"))
      .as[(Long, Double, Int)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    texts.foreach { case (id, t) =>
      val bytes = t.getBytes("UTF-8")
      val n = bytes.length.toDouble
      // fold in ascending byte order — ByteEntropy's own accumulation
      // order, so the comparison is bit-exact (an unordered fold
      // differs in the last ulp)
      val wantH =
        if (n == 0) 0.0
        else bytes.groupBy(identity).toSeq.sortBy(_._1 & 0xff).map(_._2.length)
          .foldLeft(0.0)((acc, c) => acc - (c / n) * math.log(c / n))
      assert(got(id)._1 == wantH, s"entropy mismatch on case $id (${t.take(30)}...)")
      val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
      d.setInput(bytes); d.finish()
      val buf = new Array[Byte](8192)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      d.end()
      assert(got(id)._2 == total, s"deflate mismatch on case $id")
    }
  }

  test("local sampled k-means training: deterministic, distributed-loop semantics preserved") {
    import graft.sim.{IvfAnn, PqAnn}
    val e = Tables(spark, TestSpark.SfDir, "embeddings")
      .select(col("vec_id").as("id"), graft.sim.Cosine.asDouble(col("embedding")).as("vec"))
    // bit-exact reproducibility across calls (content-hash sample +
    // id-ordered iteration — no partition-order dependence)
    val a = IvfAnn.train(e, 16)
    val b = IvfAnn.train(e, 16)
    assert(a.cells.map(_._1).toSeq == b.cells.map(_._1).toSeq)
    a.cells.zip(b.cells).foreach { case ((_, va), (_, vb)) =>
      assert(va.toSeq == vb.toSeq, "centroids must be bit-identical across train calls")
    }
    val ca = PqAnn.train(e, m = 4, kCodes = 16)
    val cb = PqAnn.train(e, m = 4, kCodes = 16)
    (0 until 4).foreach { s =>
      assert(ca.books(s).map(_.toSeq).toSeq == cb.books(s).map(_.toSeq).toSeq)
    }
    // the distributed loop's empty-cell rule survives in the local
    // path: duplicate seeds tie every point to the lowest cid, the
    // starved cell keeps its seed centroid verbatim
    val tiny = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(1.0, 0.0)), (3L, Seq(0.9, 0.1))
    ).toDF("id", "vec")
    val cs = IvfAnn.train(tiny, 2)
    assert(cs.cells.length == 2)
    assert(cs.cells(1)._2.toSeq == Seq(1.0, 0.0),
      "empty cell must keep its previous centroid")
    assert(cs.cells(0)._2.toSeq != Seq(1.0, 0.0), "populated cell re-centers")
  }
}
