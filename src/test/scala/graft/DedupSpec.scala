package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.{DupClusters, ExactDedup, MinHashLSH, NgramJaccard, ParagraphDedup, SimHash}

class DedupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("duplicate clusters: transitive chains collapse to the min id, singletons stay out") {
    // 1-2-3 is a CHAIN (1~3 never claimed): all three must land in
    // cluster 1 — pairwise keep-one would mislabel this; 7~8 separate;
    // 9 appears in no pair and must be absent
    val pairs = Seq((2L, 1L), (2L, 3L), (7L, 8L)).toDF("a", "b")
    val out = DupClusters.resolve(pairs, "a", "b")
      .orderBy("id").as[(Long, Long, Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (7L, 7L, true), (8L, 7L, false)))
  }

  test("duplicate clusters: a long path needs diameter rounds and still converges") {
    // path graph 0-1-2-...-12: min label must walk the full diameter
    val pairs = (0L until 12L).map(i => (i, i + 1)).toDF("a", "b")
    val out = DupClusters.resolve(pairs, "a", "b")
      .as[(Long, Long, Boolean)].collect()
    assert(out.forall(_._2 == 0L), s"all nodes reach cluster 0: ${out.toSeq}")
    assert(out.count(_._3) == 1)
  }

  test("paragraph dedup keeps first occurrences, stitches survivors in order") {
    def win(prefix: String): String = (1 to 10).map(i => s"$prefix$i").mkString(" ")
    val (a, b, c, d, e) = (win("a"), win("b"), win("c"), win("d"), win("e"))
    val docs = Seq(
      (1L, s"$a $b"),       // first occurrence of both windows: intact
      (2L, s"$a $c"),       // a seen in doc 1 -> only c survives
      (3L, a),              // entirely duplicated -> collapses to empty
      (4L, "x1 x2 x3"),     // short unique partial window: intact
      (5L, s"$d $d"),       // within-doc repeat: second copy dropped
      (6L, s"$e $a $b")     // middle+tail dropped, e kept, order preserved
    ).toDF("doc_id", "text")
    val out = ParagraphDedup.dedup(docs, "doc_id", "text")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((2L, 2L, s"$a $b")))
    assert(out(2L) == ((2L, 1L, c)))
    assert(out(3L) == ((1L, 0L, "")))       // doc survives as a row, text empties
    assert(out(4L) == ((1L, 1L, "x1 x2 x3")))
    assert(out(5L) == ((2L, 1L, d)))
    assert(out(6L) == ((3L, 1L, e)))
    // corpus-wide invariant on real data: no document row is lost, and
    // every surviving window count is bounded by the original count
    val real = Tables(spark, TestSpark.SfDirSmall, "documents")
    val full = ParagraphDedup.dedup(real, "doc_id", "text")
    assert(full.count() == real.count())
    assert(full.where(org.apache.spark.sql.functions.col("n_kept") >
      org.apache.spark.sql.functions.col("n_paras")).isEmpty)
    // kept windows across the corpus are globally unique
    val totalKept = full.agg(org.apache.spark.sql.functions.sum("n_kept")).as[Long].head()
    val distinctParas = real.select(
      org.apache.spark.sql.functions.explode(
        graft.dedup.Shingles.paragraphs(org.apache.spark.sql.functions.col("text"), 10)).as("p"))
      .distinct().count()
    assert(totalKept == distinctParas,
      s"kept $totalKept windows but corpus has $distinctParas distinct windows")
  }

  test("incremental dedup screens the batch against the corpus, never corpus-vs-corpus") {
    import graft.dedup.IncrementalDedup
    val mk = (ws: Seq[String]) => ws.mkString(" ")
    val base = (1 to 30).map(i => s"w$i")
    val corpus = Seq(
      (1L, mk(base)),                       // will be near-duplicated by batch doc 100
      (2L, mk(base.map(_.toUpperCase))),    // distinct content
      (3L, mk(base))                        // corpus-internal dup of 1: must NOT be emitted
    ).toDF("doc_id", "text")
    val batch = Seq(
      (100L, mk(base.updated(0, "CHANGED"))),       // near-dup of corpus 1 and 3
      (101L, mk((1 to 30).map(i => s"z$i")))        // unique: no match
    ).toDF("doc_id", "text")
    val out = IncrementalDedup.newVsCorpus(corpus, batch, "doc_id", "text", n = 3)
      .as[(Long, Long, Double)].collect()
    // the near-dup batch doc matches its corpus twins and nothing else
    assert(out.map(r => (r._1, r._2)).toSet == Set((100L, 1L), (100L, 3L)), out.toSeq.toString)
    assert(out.forall(_._3 >= 0.6))
    // ids come exclusively from the batch side (bipartite, not corpus²)
    assert(out.forall(_._1 >= 100L))
  }

  test("incremental dedup runs against a persistent parquet signature store across rounds") {
    import graft.dedup.{IncrementalDedup, MinHashLSH}
    val store = java.nio.file.Files.createTempDirectory("sig_store").resolve("sigs").toString
    val mk = (ws: Seq[String]) => ws.mkString(" ")
    val base = (1 to 30).map(i => s"w$i")
    val corpus = Seq((1L, mk(base))).toDF("doc_id", "text")
    // round 0: materialize the corpus signatures once
    MinHashLSH.signatures(corpus, "doc_id", "text", n = 3, numHashes = 64)
      .write.parquet(store)
    // round 1: batch screened against the store, no corpus text in sight
    val b1 = Seq(
      (100L, mk(base.updated(0, "CHANGED"))),     // near-dup of corpus 1
      (101L, mk((1 to 30).map(i => s"z$i")))      // unique, accepted
    ).toDF("doc_id", "text")
    val sigs1 = spark.read.parquet(store)
    val hits1 = IncrementalDedup.newVsSignatures(sigs1, b1, "doc_id", "text", n = 3)
      .select("id", "dup_of").as[(Long, Long)].collect().toSet
    assert(hits1 == Set((100L, 1L)), s"round-1 hits: $hits1")
    // accepted (non-dup) batch docs append their signatures
    val accepted1 = b1.where(
      !org.apache.spark.sql.functions.col("doc_id").isin(hits1.map(_._1).toSeq: _*))
    MinHashLSH.signatures(accepted1, "doc_id", "text", n = 3, numHashes = 64)
      .write.mode("append").parquet(store)
    // round 2: a near-dup of round-1's accepted doc is caught via the store
    val b2 = Seq((200L, mk((1 to 30).map(i => s"z$i").updated(0, "CHANGED")))).toDF("doc_id", "text")
    val hits2 = IncrementalDedup.newVsSignatures(
      spark.read.parquet(store), b2, "doc_id", "text", n = 3)
      .select("id", "dup_of").as[(Long, Long)].collect().toSet
    assert(hits2 == Set((200L, 101L)), s"round-2 hits: $hits2")
  }

  test("exact dedup collapses identical texts, keeps min id") {
    val docs = Seq((1L, "x y"), (2L, "x y"), (3L, "z w")).toDF("doc_id", "text")
    val out = ExactDedup.dedup(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L), (3L, 1L)))
  }

  test("ngram jaccard computes exact overlap on known docs") {
    // bigrams: {a b, b c, c d} vs {a b, b c, c e} → 2/4 = 0.5
    val docs = Seq((1L, "a b c d"), (2L, "a b c e")).toDF("doc_id", "text")
    val out = NgramJaccard.pairs(docs, "doc_id", "text", n = 2, minJaccard = 0.4)
      .as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 2L, 0.5)))
  }

  test("containment pairs: directed subsumption found where jaccard misses it") {
    // doc 2 = doc 1 plus a long tail: containment(1→2) = 1.0 but
    // jaccard is far below any dedup threshold — the case the operator
    // exists for. doc 3 shares nothing.
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d e f g h i j k l m n o p q r s t u v w x y z"),
      (3L, "aa bb cc dd ee ff")).toDF("doc_id", "text")
    val out = NgramJaccard.containmentPairs(docs, "doc_id", "text", n = 3, minContainment = 0.8)
      .as[(Long, Long, Double)].collect().toSeq.sorted
    assert(out.contains((1L, 2L, 1.0)), s"1⊂2 missed: $out")
    assert(!out.exists(p => p._1 == 2L && p._2 == 1L), "2 is not contained in 1")
    assert(!out.exists(p => p._1 == 3L || p._2 == 3L), "3 shares no 3-gram with 1 or 2")
    // the same pair is invisible to jaccard at the same threshold
    val j = NgramJaccard.pairs(docs, "doc_id", "text", n = 3, minJaccard = 0.8)
      .as[(Long, Long, Double)].collect()
    assert(!j.exists(p => p._1 == 1L && p._2 == 2L))
    // near-identical docs surface in BOTH directions
    val twins = Seq((1L, "a b c d e f"), (2L, "a b c d e f"))
      .toDF("doc_id", "text")
    val both = NgramJaccard.containmentPairs(twins, "doc_id", "text", n = 3, minContainment = 0.8)
      .as[(Long, Long, Double)].collect().toSeq.sorted
    assert(both == Seq((1L, 2L, 1.0), (2L, 1L, 1.0)))
    // stop-shingle cap drops pairs whose only shared shingles are hot
    val hot = (1L to 10L).map(i => (i, "x y z common")) :+ (99L, "x y z common")
    val capped = NgramJaccard.containmentPairs(
      hot.toDF("doc_id", "text"), "doc_id", "text", n = 3, minContainment = 0.8, maxDf = Some(4))
    assert(capped.count() == 0L, "hot-shingle pairs must be pruned by the cap")
  }

  test("prefix-filtered containment is value-identical to the naive capped join") {
    val real = Tables(spark, TestSpark.SfDir, "documents").select("doc_id", "text")
    for (t <- Seq(0.6, 0.8); cap <- Seq(Some(64), None)) {
      val prefix = NgramJaccard.containmentPairsPrefix(real, "doc_id", "text", n = 3,
        minContainment = t, maxDf = cap)
        .as[(Long, Long, Double)].collect().toSeq.sorted
      val capped = NgramJaccard.containmentPairs(real, "doc_id", "text", n = 3,
        minContainment = t, maxDf = cap)
        .as[(Long, Long, Double)].collect().toSeq.sorted
      assert(prefix == capped, s"t=$t cap=$cap: ${prefix.size} vs ${capped.size} pairs")
      assert(prefix.nonEmpty, s"t=$t cap=$cap: planted near-dups must surface")
    }
  }

  test("native shingle hashing is bit-identical to the builtin shingle+xxhash64 chain") {
    import org.apache.spark.sql.functions._
    import graft.dedup.Shingles
    val edge = Seq(
      "", " ", "  ", "a", "a b", "a  b", " a b ", "a b c d e",
      "übergröße straße λ κ", "x " * 50 + "y").toDF("text")
    val real = Tables(spark, TestSpark.SfDir, "documents").select("text")
    for (df <- Seq(edge, real); n <- Seq(1, 2, 3, 5)) {
      val builtin = sort_array(transform(Shingles.shingles(col("text"), n), s => xxhash64(s)))
      val native = sort_array(Shingles.hashedShingles(col("text"), n))
      val bad = df.where(not(builtin <=> native)).count()
      assert(bad == 0L, s"n=$n: $bad rows diverge between native and builtin shingle hashes")
    }
    // null text → null result, like the builtin chain
    val nulls = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "text")
    assert(nulls.select(Shingles.hashedShingles(col("text"), 2)).head.isNullAt(0))
    // SQL surface + analysis-time failures
    GraftExtensions.register(spark)
    assert(spark.sql("SELECT size(shingle_hashes('a b c', 2)) s").head.getInt(0) == 2)
    intercept[Exception](spark.sql("SELECT shingle_hashes(array(1), 2)").collect())
    intercept[Exception](spark.sql("SELECT shingle_hashes('a b', 0)").collect())
  }

  test("native shingle hashing equals the builtin chain on randomized unicode corpora") {
    import org.apache.spark.sql.functions._
    import graft.dedup.Shingles
    // property-style sweep: adversarial token alphabets (empty tokens,
    // multi-byte unicode, long runs) × random docs, seeded for
    // reproducibility
    val alphabet = Vector("", "a", "bb", "λ", "日本語", "x" * 300, "émo🎈ji", "0")
    val rnd = new scala.util.Random(4242)
    val docs = (1 to 400).map { i =>
      val n = rnd.nextInt(12)
      (i.toLong, Seq.fill(n)(alphabet(rnd.nextInt(alphabet.size))).mkString(" "))
    }.toDF("id", "text")
    for (n <- Seq(1, 2, 4)) {
      val builtin = sort_array(transform(Shingles.shingles(col("text"), n), s => xxhash64(s)))
      val native = sort_array(Shingles.hashedShingles(col("text"), n))
      val bad = docs.where(not(builtin <=> native))
      assert(bad.isEmpty, s"n=$n diverged on: ${bad.select("text").take(3).mkString("; ")}")
    }
  }

  test("containment prefix bound holds on randomized dense-vocab corpora") {
    // the prefix/positional bounds are the subtle part — sweep random
    // corpora over a TINY vocabulary (maximal shingle sharing, the
    // adversarial case for pruning proofs) at two thresholds and
    // require exact agreement with the straight-line capped join
    val vocab = Vector("a", "b", "c", "d", "e")
    val rnd = new scala.util.Random(777)
    val docs = (1 to 120).map { i =>
      val n = 4 + rnd.nextInt(12)
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    for (t <- Seq(0.5, 0.85); cap <- Seq(Some(6), None)) {
      val prefix = NgramJaccard.containmentPairsPrefix(docs, "doc_id", "text", n = 2,
        minContainment = t, maxDf = cap)
        .as[(Long, Long, Double)].collect().toSeq.sorted
      val capped = NgramJaccard.containmentPairs(docs, "doc_id", "text", n = 2,
        minContainment = t, maxDf = cap)
        .as[(Long, Long, Double)].collect().toSeq.sorted
      assert(prefix == capped,
        s"t=$t cap=$cap: prefix ${prefix.size} vs capped ${capped.size} pairs")
    }
  }

  test("prefix-filtered exhaustive jaccard is value-identical to the naive join") {
    // the AllPairs prefix filter is an exact optimization: same pairs,
    // same jaccard values, on real testdata and at a threshold low
    // enough that length/prefix bounds actually bind
    val docs = Tables(spark, TestSpark.SfDir, "documents")
    for (t <- Seq(0.6, 0.35)) {
      val naive = NgramJaccard.pairs(docs, "doc_id", "text", n = 3, minJaccard = t, maxDf = None)
        .as[(Long, Long, Double)].collect().toSet
      val fast = NgramJaccard.pairsExhaustive(docs, "doc_id", "text", n = 3, minJaccard = t)
        .as[(Long, Long, Double)].collect().toSet
      assert(naive.nonEmpty, "testdata should contain planted near-dups")
      assert(fast == naive,
        s"t=$t: prefix-filtered diverged (missing=${(naive -- fast).take(5)}, extra=${(fast -- naive).take(5)})")
    }
  }

  test("minhash+LSH finds the same near-dup pairs as exact jaccard on testdata") {
    val docs = Tables(spark, TestSpark.SfDir, "documents")
    val exact = NgramJaccard.pairs(docs, "doc_id", "text", n = 2, minJaccard = 0.6)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val mh = MinHashLSH.pairs(docs, "doc_id", "text", n = 2, minEstJaccard = 0.6)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "testdata should contain planted near-dups")
    val recall = (exact & mh).size.toDouble / exact.size
    assert(recall >= 0.9, s"minhash recall $recall too low (exact=${exact.size}, mh=${mh.size})")
  }

  test("simhash: identical docs collide at hamming 0, disjoint docs do not pair") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six")).toDF("doc_id", "text")
    val out = SimHash.pairs(docs, "doc_id", "text", maxHamming = 3, bands = 4)
      .select("a", "b", "hamming").as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L, 0L)))
  }

  test("LSH-bucketed cosine dedup recovers the exact pair set without an all-pairs join") {
    import org.apache.spark.sql.functions.col
    val e = Tables(spark, TestSpark.SfDir, "embeddings")
      .select(col("vec_id").as("id"), graft.sim.Cosine.asDouble(col("embedding")).as("vec"))
    val exact = e.as("x").join(e.as("y"), col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        graft.sim.Cosine.sim(col("x.vec"), col("y.vec")).as("c"))
      .where(col("c") >= 0.4).select("a", "b").as[(Long, Long)].collect().toSet
    val lsh = graft.dedup.CosineDedup.pairs(e, minCosine = 0.4)
    val plan = lsh.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"all-pairs join in plan:\n$plan")
    val got = lsh.select("a", "b").as[(Long, Long)].collect().toSet
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.8, s"cosine LSH recall $recall (exact=${exact.size}, lsh=${got.size})")
    assert(got.subsetOf(exact), "exact verification stage must not emit false positives")
  }

  test("inline bucket-join verification equals the distinct-first reference shape") {
    // the round-13 scale fix moved exact verification INLINE into the
    // bucket/cell self-join (the distinct-first shape reshuffled a
    // candidates × vector-bytes intermediate that filled a disk at
    // 30×). The equality claim that rests on — the threshold filter
    // commutes with the pair dedup, and the cosine is
    // table-independent — is pinned here by rebuilding the OLD shape
    // explicitly (distinct ids first, vectors joined back on, verify
    // once per distinct pair) and comparing full (a, b, cosine) rows.
    import org.apache.spark.sql.functions.{col, round => sround, sqrt => ssqrt}
    val e = Tables(spark, TestSpark.SfDir, "embeddings")
      .select(col("vec_id").as("id"), graft.sim.Cosine.asDouble(col("embedding")).as("vec"))
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select("a", "b", "cosine").collect().map(_.toString).sorted.toSeq
    val inline = rows(graft.dedup.CosineDedup.pairs(e, minCosine = 0.4))
    // distinct-first reference: same buckets, same threshold, verify
    // after the pair dedup instead of before
    val bits = graft.dedup.CosineDedup.adaptiveBits(e.count())
    val store = graft.sim.LshAnn.withBuckets(e, "vec", 16, bits, 64)
      .withColumn("nrm", ssqrt(graft.sim.Cosine.dot(col("vec"), col("vec"))))
    val long = store.select(col("id"),
      org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.array((0 until 16).map(t =>
          org.apache.spark.sql.functions.struct(
            org.apache.spark.sql.functions.lit(t).as("t"),
            col(s"bucket_$t").as("bk"))): _*)).as("tb"))
      .select(col("id"), col("tb.t").as("t"), col("tb.bk").as("bk"))
    val cand = long.as("a")
      .join(long.as("b"),
        col("a.t") === col("b.t") && col("a.bk") === col("b.bk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a"), col("b.id").as("b")).dropDuplicates("a", "b")
    val vecs = store.select(col("id"), col("vec"), col("nrm"))
    val reference = rows(cand
      .join(vecs.as("x"), col("a") === col("x.id"))
      .join(vecs.as("y"), col("b") === col("y.id"))
      .select(col("a"), col("b"),
        sround(graft.sim.Cosine.dot(col("x.vec"), col("y.vec")) / (col("x.nrm") * col("y.nrm")), 4)
          .as("cosine"))
      .where(col("cosine") >= 0.4))
    assert(inline.nonEmpty, "shape-equality test must not be vacuous")
    assert(inline == reference, "inline verification diverged from the distinct-first reference")
  }

  test("semantic dedup: cluster-bounded candidates recover near-dup pairs, no false positives") {
    import org.apache.spark.sql.functions.col
    val e = Tables(spark, TestSpark.SfDir, "embeddings")
      .select(col("vec_id").as("id"), graft.sim.Cosine.asDouble(col("embedding")).as("vec"))
    val exact = e.as("x").join(e.as("y"), col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        graft.sim.Cosine.sim(col("x.vec"), col("y.vec")).as("c"))
      .where(col("c") >= 0.4).select("a", "b").as[(Long, Long)].collect().toSet
    val sem = graft.dedup.SemDedup.pairs(e, minCosine = 0.4, numCells = 16)
    val plan = sem.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"all-pairs join in plan:\n$plan")
    val got = sem.select("a", "b").as[(Long, Long)].collect().toSet
    assert(got.subsetOf(exact), "exact verification stage must not emit false positives")
    val recall = (exact & got).size.toDouble / exact.size
    // these synthetic pairs sit at cosine 0.40-0.51 (boundary-prone, the
    // hard case for cell-bounded candidates); the default 2-probe soft
    // assignment measures 0.80 here — deterministic, bound with margin
    assert(recall >= 0.7, s"semantic-dedup recall $recall (exact=${exact.size}, sem=${got.size}) " +
      "— soft assignment should recover boundary pairs")
    // hard assignment trades recall for candidate volume, monotonically
    val hard = graft.dedup.SemDedup.pairs(e, minCosine = 0.4, numCells = 16, probes = 1)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(hard.subsetOf(got), "probes=1 candidates are a subset of probes=2")
    // the adaptive default derives cells from corpus size (500 docs /
    // 512-per-cell target -> the 4-cell floor) and stays green
    val auto = graft.dedup.SemDedup.pairs(e, minCosine = 0.4)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(auto.subsetOf(exact) && auto.nonEmpty, "adaptive default emits verified pairs")
    // trained centroids are reusable across batches (the production shape)
    val cs = graft.sim.IvfAnn.train(e, numCells = 16)
    val again = graft.dedup.SemDedup.pairsWith(e, cs, minCosine = 0.4)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(graft.dedup.SemDedup.pairsWith(e, cs, minCosine = 0.4)
      .select("a", "b").as[(Long, Long)].collect().toSet == again, "deterministic per trained set")
  }

  test("hierarchical cell assignment: exact at full super-probe, high agreement at default") {
    import org.apache.spark.sql.functions.col
    import graft.sim.IvfAnn
    val e = Tables(spark, TestSpark.SfDir, "embeddings")
      .select(col("vec_id").as("id"), graft.sim.Cosine.asDouble(col("embedding")).as("vec"))
    val cs = IvfAnn.train(e, numCells = 16)
    val literal = IvfAnn.assign(e, cs, 1)
      .as[(Long, Int)].collect().toMap
    // probing EVERY super-cell removes the coarse-quantization miss:
    // the hierarchical argmax sees all centroids → identical assignment
    val full = IvfAnn.assignHierarchical(e, cs, 1, superCells = 4, superProbes = 4)
      .as[(Long, Int)].collect().toMap
    assert(full == literal, "full super-probe must equal the literal assignment exactly")
    // default 2-of-4 super-probes: only boundary vectors can differ
    val default2 = IvfAnn.assignHierarchical(e, cs, 1, superCells = 4, superProbes = 2)
      .as[(Long, Int)].collect().toMap
    assert(default2.keySet == literal.keySet, "no vector may be dropped by the join")
    val agree = literal.count { case (id, c) => default2(id) == c }.toDouble / literal.size
    assert(agree >= 0.9, s"hierarchical default agreement $agree vs literal")
    // soft assignment (probes=2) through the hierarchical path keeps
    // one row per (vector, cell) and no dropped ids
    val soft = IvfAnn.assignHierarchical(e, cs, 2, superCells = 4, superProbes = 2)
      .as[(Long, Int)].collect()
    assert(soft.map(_._1).distinct.length == literal.size)
    assert(soft.groupBy(_._1).values.forall(g => g.length == 2 && g.map(_._2).distinct.length == 2))
    // SemDedup through the hierarchical assigner: still zero false
    // positives (exact verify), recall tracks the literal path
    val exact = e.as("x").join(e.as("y"), col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        graft.sim.Cosine.sim(col("x.vec"), col("y.vec")).as("c"))
      .where(col("c") >= 0.4).select("a", "b").as[(Long, Long)].collect().toSet
    val hier = graft.dedup.SemDedup.pairsWith(e, cs, minCosine = 0.4, probes = 2,
        assigner = IvfAnn.assignHierarchical(_, _, _, superCells = 4, superProbes = 2))
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(hier.subsetOf(exact), "exact verification stage must not emit false positives")
    assert((exact & hier).size.toDouble / exact.size >= 0.6,
      "hierarchical-assignment recall collapsed vs the literal path")
  }

  test("pair cap: blob corpus collapses identically capped or not, cap-off equals unlimited") {
    import org.apache.spark.sql.functions.col
    // adversarial fixture uniform testdata cannot exhibit (round-14
    // clustered-corpus measurement, SCALE.md): a TIGHT near-duplicate
    // blob — 300 noisy copies of one direction — whose members share
    // every hyperplane sign (one giant LSH bucket per table) and tie
    // into few k-means cells, plus 700 isotropic vectors. Uncapped,
    // the blob makes Σ|group|² quadratic in blob mass; the cap must
    // bound the work WITHOUT changing what dedup does: the blob still
    // collapses to one canonical survivor.
    val rnd = new scala.util.Random(7)
    val dim = 16
    def unit(v: Array[Double]): Seq[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n).toSeq
    }
    val center = Array.fill(dim)(rnd.nextGaussian())
    val blob = (0 until 300).map(i =>
      (i.toLong, unit(center.map(_ + 0.03 * rnd.nextGaussian()))))
    val noise = (300 until 1000).map(i =>
      (i.toLong, unit(Array.fill(dim)(rnd.nextGaussian()))))
    val e = (blob ++ noise).toDF("id", "vec")
    val exact = e.as("x").join(e.as("y"), col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        graft.sim.Cosine.sim(col("x.vec"), col("y.vec")).as("c"))
      .where(col("c") >= 0.8).select("a", "b").as[(Long, Long)].collect().toSet
    assert(exact.size > 40000, s"blob fixture must dominate the truth set: ${exact.size}")
    // survivors of the blob after canonicalization — the dedup outcome
    def blobSurvivors(pairs: org.apache.spark.sql.DataFrame): Long =
      graft.dedup.DupClusters.resolve(pairs, "a", "b")
        .where(col("id") < 300 && col("keep")).count()
    // LSH family: the 300-blob exceeds maxBucket=64 in every table →
    // geometry-ordered chain. No false positives, same single survivor.
    val lshCap = graft.dedup.CosineDedup.pairs(e, minCosine = 0.8, dim = dim, maxBucket = 64)
    val lshCapPairs = lshCap.select("a", "b").as[(Long, Long)].collect().toSet
    assert(lshCapPairs.subsetOf(exact), "capped LSH emitted a false positive")
    assert(blobSurvivors(lshCap) == 1L, "capped LSH must collapse the blob to one survivor")
    val lshFull = graft.dedup.CosineDedup.pairs(e, minCosine = 0.8, dim = dim)
    assert(blobSurvivors(lshFull) == 1L)
    // cell family: blob cells exceed maxCell=64 → over-cap members
    // route into the LSH family (recursion terminates in the chain)
    val semCap = graft.dedup.SemDedup.pairs(e, minCosine = 0.8, numCells = 8,
      maxCell = 64, dim = dim)
    val semCapPairs = semCap.select("a", "b").as[(Long, Long)].collect().toSet
    assert(semCapPairs.subsetOf(exact), "capped SemDedup emitted a false positive")
    assert(blobSurvivors(semCap) == 1L, "capped SemDedup must collapse the blob to one survivor")
    assert(blobSurvivors(graft.dedup.SemDedup.pairs(e, minCosine = 0.8, numCells = 8)) == 1L)
    // a cap no group reaches is the identity: full (a, b, cosine) rows
    // equal the uncapped operator's exactly
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select("a", "b", "cosine").collect().map(_.toString).sorted.toSeq
    assert(rows(graft.dedup.CosineDedup.pairs(e, minCosine = 0.8, dim = dim, maxBucket = 100000))
      == rows(lshFull), "an unreached cap must not change the emitted pairs")
    // EXACTLY identical vectors — the case no Voronoi assignment can
    // ever split (every copy ties to one cell no matter how many
    // centroids train), i.e. the cap's reason to exist: 200 copies +
    // noise, capped semantic dedup still collapses the copy set to one
    // survivor through the LSH route
    val copies = (0 until 200).map(i => (i.toLong, unit(center)))
    val e2 = (copies ++ noise).toDF("id", "vec")
    val identCap = graft.dedup.SemDedup.pairs(e2, minCosine = 0.8, numCells = 8,
      maxCell = 32, dim = dim)
    val identSv = graft.dedup.DupClusters.resolve(identCap, "a", "b")
      .where(col("id") < 200 && col("keep")).count()
    assert(identSv == 1L,
      s"capped SemDedup must collapse an identical-vector blob to one survivor, got $identSv")
  }

  test("pair cap: over-cap chain is the power-of-two stride set + hub, O(log m) stride-only diameter") {
    import org.apache.spark.sql.functions.col
    // Round-15 diameter contract (the round-14 ADVICE finding): the
    // old fixed 1..64 stride table bounded the stride-only pair graph
    // at Θ(m/64) diameter, so a >~1,600-member group whose rank-1 hub
    // edges straddle the cosine threshold outran DupClusters.resolve's
    // default round ceiling. The fix derives strides from each
    // member's own rank (every power of two below it), which this
    // test pins STRUCTURALLY: an all-identical corpus makes every
    // bucket group the same id-ordered blob in every table (one sort
    // key, ties by id → rank = id + 1), so the emitted pair set must
    // be EXACTLY { |a−b| = 2^k } ∪ { (0, b) hub edges } — and the
    // stride-only subgraph (hub edges removed) must reach rank 1 from
    // every member within ceil(log2 m) hops, i.e. the resolver stays
    // round-bounded even when every hub edge fails the threshold.
    val m = 3000
    val dim = 16
    val vec = {
      val rnd = new scala.util.Random(11)
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n).toSeq
    }
    val e = (0 until m).map(i => (i.toLong, vec)).toDF("id", "vec")
    val pairs = graft.dedup.CosineDedup.pairs(e, minCosine = 0.9, dim = dim, maxBucket = 64)
      .select("a", "b").as[(Long, Long)].collect().toSet
    def isPow2(x: Long): Boolean = x > 0 && (x & (x - 1)) == 0
    val expected = (for {
      b <- 1 until m
      a <- 0 until b
      if a == 0 || isPow2((b - a).toLong)
    } yield (a.toLong, b.toLong)).toSet
    assert(pairs == expected,
      s"chain edge set mismatch: ${(pairs -- expected).take(5)} extra, ${(expected -- pairs).take(5)} missing")
    // stride-only BFS from the hub node (rank 1 = id 0): every edge
    // used has a power-of-two id difference (hub-only edges removed)
    val strideAdj = pairs.toSeq.filter(p => isPow2(p._2 - p._1))
      .flatMap(p => Seq(p, p.swap)).groupMap(_._1)(_._2)
    var frontier = Set(0L)
    val dist = scala.collection.mutable.Map(0L -> 0)
    var d = 0
    while (frontier.nonEmpty) {
      d += 1
      frontier = frontier.flatMap(strideAdj.getOrElse(_, Nil)).filter(!dist.contains(_))
      frontier.foreach(dist(_) = d)
    }
    val logM = math.ceil(math.log(m.toDouble) / math.log(2.0)).toInt
    assert(dist.size == m, s"stride-only subgraph must stay connected: reached ${dist.size} of $m")
    assert(dist.values.max <= logM,
      s"stride-only eccentricity of rank 1 must be <= ceil(log2 m) = $logM, got ${dist.values.max}")
  }

  test("streamed per-table resolve equals the monolithic resolve label-for-label") {
    import org.apache.spark.sql.functions.col
    // The 100×-parity protocol (Scale.parityLshStreamed): fold each
    // LSH table's pairs into the running connectivity instead of
    // holding the 16-table union live. Connectivity distributes over
    // edge-set union, so labels must equal the monolithic resolve's —
    // pinned here on a mixed corpus (two planted clusters + noise)
    // where pairs straddle tables and chunk order matters if the fold
    // is wrong.
    val dim = 16
    val rnd = new scala.util.Random(7)
    def unit(v: Array[Double]): Seq[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n).toSeq
    }
    val c1 = Array.fill(dim)(rnd.nextGaussian())
    val c2 = Array.fill(dim)(rnd.nextGaussian())
    val rows =
      (0 until 150).map(i => (i.toLong, unit(c1.map(_ + rnd.nextGaussian() * 0.05)))) ++
      (150 until 260).map(i => (i.toLong, unit(c2.map(_ + rnd.nextGaussian() * 0.05)))) ++
      (260 until 400).map(i => (i.toLong, unit(Array.fill(dim)(rnd.nextGaussian()))))
    val e = rows.toDF("id", "vec")
    val numTables = 16
    val bits = graft.dedup.CosineDedup.adaptiveBits(400L)
    val store = graft.dedup.CosineDedup.bucketStore(e, numTables, bits, dim)
    // monolithic: the shipped operator's deduped pair set, one resolve
    val mono = graft.dedup.DupClusters.resolve(
      graft.dedup.CosineDedup.pairs(e, minCosine = 0.8, numTables = numTables,
        bitsPerTable = bits, dim = dim), "a", "b")
      .select("id", "cluster_id").as[(Long, Long)].collect().toSet
    assert(mono.nonEmpty, "fixture must produce clusters")
    // union of per-table stages equals the operator's pre-dedup pairs
    // (same store, same verify) — then the chunked fold must land on
    // identical labels
    val chunks = (0 until numTables).map(t => () =>
      graft.dedup.CosineDedup.tablePairs(store, t, 0.8).select("a", "b"))
    val (labels, maxRounds) =
      graft.dedup.DupClusters.resolveChunked(chunks, "a", "b", maxIters = 50)
    val streamed = labels.select("id", "cluster_id").as[(Long, Long)].collect().toSet
    assert(streamed == mono,
      s"streamed labels diverge: ${(streamed -- mono).take(5)} extra, ${(mono -- streamed).take(5)} missing")
    assert(maxRounds >= 1)
    // keep flags agree with the label arithmetic the parity row uses:
    // removal = labeled ids − distinct labels = non-keep count
    val kept = labels.where(col("keep")).count()
    assert(kept == streamed.map(_._2).toSet.size.toLong,
      s"keep count $kept != distinct labels ${streamed.map(_._2).toSet.size}")
  }

  test("pair cap: chain edge set survives the reliable path store across multiple files") {
    import org.apache.spark.sql.functions.col
    // The round-15 ADVICE finding: zipWithIndex ranks are PARTITION
    // order, and the parquet store route repacks read splits by size
    // descending — a sort taken BELOW the store boundary arrives
    // scrambled, per-group ranks gap, and the rn − 2^k equi-join
    // degenerates to a hub-star. One local file preserves order and
    // hides it, so this fixture forces MANY store files (the input is
    // spread across partitions before the store write) and pins the
    // exact edge set the single-file/default-route test above pins.
    val m = 1200
    val dim = 16
    val vec = {
      val rnd = new scala.util.Random(11)
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n).toSeq
    }
    val e = (0 until m).map(i => (i.toLong, vec)).toDF("id", "vec").repartition(16)
    val root = java.nio.file.Files.createTempDirectory("graft_paircap_store")
      .toFile.getAbsolutePath
    val pairs = try {
      spark.conf.set(graft.Store.PathConf, root)
      graft.dedup.CosineDedup.pairs(e, minCosine = 0.9, dim = dim, maxBucket = 64)
        .select("a", "b").as[(Long, Long)].collect().toSet
    } finally spark.conf.unset(graft.Store.PathConf)
    // the store really did split: at least one store dir has >1 part file
    val multiFile = new java.io.File(root).listFiles().exists(d =>
      d.isDirectory && d.listFiles().count(_.getName.endsWith(".parquet")) > 1)
    assert(multiFile, "fixture must produce a multi-file store or it proves nothing")
    def isPow2(x: Long): Boolean = x > 0 && (x & (x - 1)) == 0
    val expected = (for {
      b <- 1 until m
      a <- 0 until b
      if a == 0 || isPow2((b - a).toLong)
    } yield (a.toLong, b.toLong)).toSet
    assert(pairs == expected,
      s"path-store chain edge set mismatch: ${(pairs -- expected).take(5)} extra, " +
        s"${(expected -- pairs).take(5)} missing")
  }

  test("boilerplate spans: positional windows, first occurrence, spread, ranking") {
    import org.apache.spark.sql.functions._
    // positional (non-distinct) kernel contract: index i = window at token i
    val reps = Seq(("a b a b a")).toDF("text")
      .select(graft.functions.ShingleHashes.positional(col("text"), 2).as("w"))
      .head.getSeq[Long](0)
    assert(reps.size == 4 && reps(0) == reps(2) && reps(1) == reps(3) && reps(0) != reps(1))
    // miner hand case: "p q" repeats across three docs at mixed offsets
    val docs = Seq((1L, "p q r"), (2L, "p q s"), (3L, "z p q")).toDF("doc_id", "text")
    val out = graft.dedup.BoilerplateSpans.mine(docs, "doc_id", "text", n = 2, k = 5)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 0L, 3L, 3L)), s"got $out")
    // corpus sanity at n=10: planted near-dups repeat long spans; the
    // report is non-empty, bounded by k, and within-bounds positions
    val real = Tables(spark, TestSpark.SfDir, "documents")
    val mined = graft.dedup.BoilerplateSpans.mine(real, "doc_id", "text", n = 10, k = 20)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(mined.nonEmpty && mined.size <= 20)
    assert(mined.forall { case (_, pos, occ, nd) => pos >= 0 && occ >= 2 && nd >= 1 && nd <= occ })
    // ranked by occurrences descending
    assert(mined.map(_._3) == mined.map(_._3).sortBy(-_))
  }

  test("intersect_count is observationally size(array_intersect) on randomized long arrays") {
    import org.apache.spark.sql.functions.{array_intersect, col, size => asize}
    import graft.functions.IntersectCount
    // duplicates, disjoint, identical, empty, and null-element cases —
    // the expression must match the builtin's distinct-element and
    // null-element semantics exactly (it replaces it on the triangle
    // and Jaccard/containment verify hot paths, count-only)
    val rnd = new scala.util.Random(7)
    val cases = Seq(
      (Seq(1L, 2L, 2L, 3L), Seq(2L, 2L, 4L, 3L)), // dups on both sides → {2,3}
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(5L, 5L, 5L), Seq(5L)),
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L))) ++
      (1 to 40).map { _ =>
        (Seq.fill(rnd.nextInt(12))(rnd.nextInt(8).toLong),
          Seq.fill(rnd.nextInt(12))(rnd.nextInt(8).toLong))
      }
    val df = cases.toDF("a", "b")
      .select(col("a"), col("b"),
        IntersectCount(col("a"), col("b")).as("fast"),
        asize(array_intersect(col("a"), col("b"))).as("builtin"))
    val bad = df.where(col("fast") =!= col("builtin")).collect()
    assert(bad.isEmpty, s"intersect_count diverged from array_intersect size: ${bad.toSeq}")
    // null elements: present on both sides counts once, like the builtin
    val withNulls = Seq(
      (Seq[java.lang.Long](1L, null, 2L), Seq[java.lang.Long](null, 3L, 1L)),
      (Seq[java.lang.Long](1L, null), Seq[java.lang.Long](1L, 2L)))
      .toDF("a", "b")
      .select(
        IntersectCount(col("a"), col("b")).as("fast"),
        asize(array_intersect(col("a"), col("b"))).as("builtin"))
      .collect()
    assert(withNulls.forall(r => r.getInt(0) == r.getInt(1)),
      s"null-element semantics diverged: ${withNulls.toSeq}")
    // SQL registration through GraftExtensions
    GraftExtensions.register(spark)
    val viaSql = spark.sql("SELECT intersect_count(array(1L,2L,2L), array(2L,3L))").head().getInt(0)
    assert(viaSql == 1)
    // null ARRAY → null, matching the builtin
    val nullArr = Seq((Seq(1L, 2L), null: Seq[Long])).toDF("a", "b")
      .select(IntersectCount(col("a"), col("b"))).head()
    assert(nullArr.isNullAt(0))

    // sorted mode (the triangle census's zero-allocation path) agrees
    // with the general path on randomized SORT_ARRAY'd inputs —
    // including dup-heavy, empty, and null-element arrays (nulls first)
    import org.apache.spark.sql.functions.sort_array
    val sortedCases = (1 to 60).map { _ =>
      (Seq.fill(rnd.nextInt(15))(rnd.nextInt(10).toLong),
        Seq.fill(rnd.nextInt(15))(rnd.nextInt(10).toLong))
    } ++ Seq((Seq.empty[Long], Seq.empty[Long]), (Seq(7L), Seq(7L, 7L)))
    val sbad = sortedCases.toDF("a0", "b0")
      .select(sort_array(col("a0")).as("a"), sort_array(col("b0")).as("b"))
      .select(
        IntersectCount.sorted(col("a"), col("b")).as("sorted"),
        IntersectCount(col("a"), col("b")).as("general"))
      .where(col("sorted") =!= col("general")).collect()
    assert(sbad.isEmpty, s"sorted-mode intersect_count diverged: ${sbad.toSeq}")
    val snull = Seq(
      (Seq[java.lang.Long](null, 1L, 2L), Seq[java.lang.Long](null, 1L, 3L)),
      (Seq[java.lang.Long](null, 1L), Seq[java.lang.Long](1L, 2L)))
      .toDF("a", "b")
      .select(IntersectCount.sorted(col("a"), col("b")).as("sorted"),
        IntersectCount(col("a"), col("b")).as("general"))
      .collect()
    assert(snull.forall(r => r.getInt(0) == r.getInt(1)),
      s"sorted-mode null semantics diverged: ${snull.toSeq}")
  }

  test("candidate generation is never all-pairs (no cartesian/nested-loop join)") {
    val docs = Tables(spark, TestSpark.SfDir, "documents")
    for (df <- Seq(
        NgramJaccard.pairs(docs, "doc_id", "text"),
        MinHashLSH.pairs(docs, "doc_id", "text"),
        SimHash.pairs(docs, "doc_id", "text"))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"all-pairs join in plan:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"all-pairs join in plan:\n$plan")
    }
  }

  test("cosine LSH adaptive hash width: 4 bits through oracle scale, one more per doubling, clamped") {
    import graft.dedup.CosineDedup.adaptiveBits
    // bit-identical to the old fixed default at every oracle/spec
    // scale (n <= 8192), so existing recall measurements stand
    for (n <- Seq(1L, 100L, 500L, 2000L, 8192L)) assert(adaptiveBits(n) == 4, s"n=$n")
    // beyond: occupancy-preserving growth — one hyperplane per doubling
    assert(adaptiveBits(8193L) == 5)
    assert(adaptiveBits(16384L) == 5)
    assert(adaptiveBits(20000L) == 6)
    assert(adaptiveBits(512L * (1L << 20)) == 20)
    assert(adaptiveBits(Long.MaxValue) == 20, "ceiling binds")
    // expected occupancy under the rule never exceeds 2x the target
    for (n <- Seq(10000L, 100000L, 10000000L))
      assert(n.toDouble / (1L << adaptiveBits(n)) <= 2 * graft.dedup.CosineDedup.TargetBucketSize,
        s"occupancy at n=$n")
  }
}
