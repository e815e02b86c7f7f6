package graft.sim

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-quantization ANN (LLM-pipeline brief) — the memory-bound
  * scale path beyond int8: split each `dim`-vector into `m` subspaces,
  * train a `kCodes`-entry codebook per subspace (Lloyd's, L2 on the
  * subvectors), store each corpus vector as `m` small codes. At
  * m=4 x kCodes=16 a 64-dim float32 vector compresses 256 bytes -> 4
  * codes (64x), which is what lets a 1000-executor cluster keep a
  * 100 TB corpus's index hot in memory.
  *
  * Query-time scoring is the classical ADC (asymmetric distance
  * computation): per query, a tiny lookup table `lut[s][j] =
  * dot(q_sub_s, centroid_sj)` is computed DRIVER-side (m x kCodes
  * doubles) and inlined with the probe batch, so scoring a corpus row
  * is `m` array lookups + adds — no floating-point vector math touches
  * the compressed corpus at all. Codebooks never leave the driver
  * except as literals: the m x kCodes x subDim training state is
  * KB-scale at any corpus size (the broadcast-tiny-side regime, same
  * as [[IvfAnn]] centroids).
  *
  * Like [[Quantized]], the compressed representation only CHOOSES the
  * `shortlist` candidates; the final top-k re-ranks the shortlist
  * against the full-precision vectors, so the emitted `sim` is TRUE
  * cosine and the DuckDB precision oracle re-derives it exactly.
  *
  * Scale shape: training is `iters` passes, each one partial-agg
  * shuffle keyed on (sub, code, pos) — collected means are
  * m x kCodes x subDim doubles; encoding + scoring is one row-local
  * corpus pass (Generate over the inlined probe batch, no join);
  * re-rank joins the broadcast-sized shortlist back by id.
  */
object PqAnn {

  /** Trained per-subspace codebooks: `books(s)(j)` is the j-th
    * centroid of subspace s. [[train]] once, probe many times with
    * [[topKWith]] — the production shape ([[topK]] retrains per call).
    */
  final case class Codebooks(m: Int, subDim: Int, books: Array[Array[Array[Double]]])

  /** The m subvectors of `vec` as array<array<double>>. */
  private def subVectors(vec: Column, m: Int, subDim: Int): Column =
    transform(sequence(lit(0), lit(m - 1)), s => slice(vec, s * subDim + 1, lit(subDim)))

  /** Literal array<array<array<double>>>: books(s)(j) = centroid. */
  private def inlineBooks(cb: Codebooks): Column =
    array(cb.books.map(book =>
      array(book.map(c => array(c.map(lit(_)): _*)): _*)): _*)

  /** Row-local PQ codes for `vec`: array<int> of length m, code s =
    * argmin_j ||sub_s - book(s)(j)||^2, ties to the lowest code (via
    * the negated index in the min-of-structs). `||c||^2 - 2<x,c>`
    * suffices for the argmin (`||x||^2` is constant per subvector).
    */
  def encode(vec: Column, cb: Codebooks): Column = {
    val subs = subVectors(vec, cb.m, cb.subDim)
    zip_with(subs, inlineBooks(cb), (sub, book) => {
      // argmin via array_position of the min distance — first match,
      // so ties break to the lowest code deterministically
      val dists = transform(book, c =>
        Cosine.dot(c, c) - lit(2.0) * Cosine.dot(sub, c))
      (array_position(dists, array_min(dists)) - 1).cast("int")
    })
  }

  /** `iters` Lloyd's iterations per subspace from a deterministic seed
    * (subvectors of the `kCodes` lowest-id corpus vectors). All m
    * subspaces train in the SAME pass: one (sub, code, pos)-keyed
    * partial-agg shuffle per iteration, means collected driver-side
    * (m x kCodes x subDim doubles — KB-scale).
    */
  def train(corpus: DataFrame, m: Int, kCodes: Int, iters: Int = 3): Codebooks = {
    val dim = corpus.select(size(col("vec"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim must be divisible by m=$m")
    val subDim = dim / m

    // Codebook-sized models (kCodes is 16-256 in practice) train
    // driver-locally on one bounded deterministic sample shared by all
    // m subspaces — 2 Spark jobs instead of one shuffle job per
    // iteration (LocalTrain; measurement in SCALE.md). Per-subspace
    // semantics mirror the distributed loop: first-k seed, L2
    // assignment with ties to the lowest code, empty code keeps its
    // centroid.
    if (kCodes <= LocalTrain.MaxLocalCells) {
      val pts = LocalTrain.collectSample(corpus, LocalTrain.sampleCap(kCodes))
      require(pts.length >= kCodes, s"corpus smaller than kCodes=$kCodes")
      val books = Array.tabulate(m) { s =>
        val sub = pts.map(_.slice(s * subDim, (s + 1) * subDim))
        LocalTrain.lloydL2(sub, sub.take(kCodes), iters)
      }
      return Codebooks(m, subDim, books)
    }

    val seed = corpus.orderBy("id").limit(kCodes).select("vec").collect()
      .map(_.getSeq[Double](0).toArray)
    require(seed.length == kCodes, s"corpus smaller than kCodes=$kCodes")
    var cb = Codebooks(m, subDim,
      Array.tabulate(m)(s => seed.map(_.slice(s * subDim, (s + 1) * subDim))))

    var it = 0
    while (it < iters) {
      val means = corpus
        .select(posexplode(subVectors(col("vec"), m, subDim)).as(Seq("sub", "subvec")))
        .select(col("sub"), col("subvec"),
          element_at(encode0(col("subvec"), cb), col("sub") + 1).as("code"))
        .select(col("sub"), col("code"), posexplode(col("subvec")))
        .groupBy(col("sub"), col("code"), col("pos"))
        .agg(avg(col("col")).as("mean"))
        .collect()
      val bySubCode = means.groupBy(r => (r.getAs[Int]("sub"), r.getAs[Int]("code")))
      cb = Codebooks(m, subDim, Array.tabulate(m) { s =>
        Array.tabulate(kCodes) { j =>
          bySubCode.get((s, j)) match {
            case Some(rows) =>
              val v = new Array[Double](subDim)
              rows.foreach(r => v(r.getAs[Int]("pos")) = r.getAs[Double]("mean"))
              v
            case None => cb.books(s)(j) // empty cell keeps its centroid
          }
        }
      })
      it += 1
    }
    cb
  }

  /** [[encode]] variant used during training: codes for ONE subvector
    * against every subspace's book (the caller picks its own via
    * element_at) — keeps the training pass a single Generate-free map.
    */
  private def encode0(subvec: Column, cb: Codebooks): Column =
    transform(inlineBooks(cb), book => {
      val dists = transform(book, c =>
        Cosine.dot(c, c) - lit(2.0) * Cosine.dot(subvec, c))
      (array_position(dists, array_min(dists)) - 1).cast("int")
    })

  /** Self-contained train-encode-probe (per-call training — the bench
    * shape; production trains once via [[train]] / [[topKWith]]).
    */
  def topK(
      queries: DataFrame, // (qid, qvec array<double>)
      corpus: DataFrame,  // (id, vec array<double>)
      k: Int,
      m: Int = 4,
      kCodes: Int = 16,
      shortlist: Int = 50,
      iters: Int = 3): DataFrame =
    topKWith(queries, corpus, train(corpus, m, kCodes, iters), k, shortlist)

  /** Probe pre-trained codebooks: ADC-score the compressed corpus,
    * shortlist per query, exact-rerank by true cosine.
    */
  def topKWith(
      queries: DataFrame,
      corpus: DataFrame,
      cb: Codebooks,
      k: Int,
      shortlist: Int): DataFrame = {
    require(shortlist >= k, "shortlist must be >= k")
    val qRows: Array[Row] = queries.select("qid", "qvec").collect()
    require(qRows.nonEmpty, "empty probe batch")

    // phase 1: one pass over the COMPRESSED corpus (at scale, the only
    // thing kept hot); ADC score = sum of m lut lookups per row.
    // NOT spread (round 16): measured net loss on probe-sized work.
    val coded = corpus.select(col("id"), encode(col("vec"), cb).as("codes"))
    val scored = coded
      .select(col("id"), col("codes"), explode(inlineLuts(qRows, cb)).as("p"))
      .where(col("p.qid") =!= col("id"))
      .select(col("p.qid").as("q"), col("id").as("neighbor"),
        adcScore(col("codes"), col("p.lut")).as("adc"))
    rerankExact(corpus, shortlistOf(scored, shortlist), qRows, k)
  }

  /** IVF-PQ — the canonical warehouse-scale ANN composition (the
    * FAISS `IVFx,PQy` index family): IVF cells restrict WHICH corpus
    * rows are scored (nProbe/numCells of the corpus per query), PQ
    * codes make scoring them nearly free (m lookups each). At 100 TB
    * the deployment keeps only `(id, cell, codes)` hot — with m=4
    * that is ~16 bytes/vector against 256 for float32 — and both
    * literal-trained models stay KB-scale on the driver.
    *
    * Codes here quantize the RAW vectors (cell-residual codebooks —
    * FAISS's default refinement, one extra subtraction per encode —
    * would cut ADC error further at the cost of per-cell query LUTs;
    * the exact re-rank phase already absorbs the difference at these
    * shortlist sizes). Probing every cell reproduces plain PQ search
    * exactly (spec-tested), mirroring IvfAnn's probe-all = exact.
    */
  def topKIvfPq(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      numCells: Int = 16,
      nProbe: Int = 4,
      m: Int = 4,
      kCodes: Int = 16,
      shortlist: Int = 50,
      iters: Int = 3): DataFrame =
    topKIvfPqWith(queries, corpus,
      IvfAnn.train(corpus, numCells, iters), train(corpus, m, kCodes, iters),
      k, nProbe, shortlist)

  /** Compressed `(id, cell, codes)` index rows for `corpus` under a
    * FROZEN model — one row-local pass, no shuffle. This is the APPEND
    * unit of incremental index maintenance: a steady-state pipeline
    * writes each arriving batch's rows to the index store and probes
    * the store ([[topKIvfPqIndexed]]) — the union of per-batch rows IS
    * the index, because encoding is a pure row-local function of
    * (vec, model): no rebuild, no corpus rescan (the IncrementalDedup
    * signature-store / IncrementalStats merge discipline, completed
    * for ANN). Model drift is the documented retraining trigger, same
    * as any frozen-quantizer deployment.
    */
  def indexRows(corpus: DataFrame, centroids: IvfAnn.Centroids, cb: Codebooks): DataFrame =
    corpus.select(
      col("id"),
      IvfAnn.cellOf(col("vec"), centroids).as("cell"),
      encode(col("vec"), cb).as("codes"))

  /** Probe pre-trained IVF centroids + PQ codebooks (index built
    * inline from `corpus` — the self-contained shape).
    */
  def topKIvfPqWith(
      queries: DataFrame,
      corpus: DataFrame,
      centroids: IvfAnn.Centroids,
      cb: Codebooks,
      k: Int,
      nProbe: Int,
      shortlist: Int): DataFrame =
    topKIvfPqIndexed(queries, indexRows(corpus, centroids, cb), corpus,
      centroids, cb, k, nProbe, shortlist)

  /** Probe a PREBUILT `(id, cell, codes)` index (e.g. an incrementally
    * appended parquet store) — `corpus` supplies full-precision
    * vectors only for the exact re-rank of the shortlist.
    */
  def topKIvfPqIndexed(
      queries: DataFrame,
      index: DataFrame,
      corpus: DataFrame,
      centroids: IvfAnn.Centroids,
      cb: Codebooks,
      k: Int,
      nProbe: Int,
      shortlist: Int): DataFrame = {
    require(shortlist >= k, "shortlist must be >= k")
    val qRows: Array[Row] = queries.select("qid", "qvec").collect()
    require(qRows.nonEmpty, "empty probe batch")

    val coded = index.select(col("id"), col("cell"), col("codes"))

    // per-query probe cells, DRIVER-side (numCells dot products per
    // query against the tiny centroid set); one inlined (qid, lut,
    // cell) row per probe — the join on `cell` broadcasts the literal
    // probe side, so candidates are exactly the probed cells' rows
    val probes = array(qRows.flatMap { r =>
      val qv = r.getSeq[Double](1).toArray
      val lut = lutLiteral(qv, cb)
      val cells = centroids.cells.map { case (cid, cvec) =>
        var d = 0.0; var n = 0.0; var i = 0
        while (i < cvec.length) { d += qv(i) * cvec(i); n += cvec(i) * cvec(i); i += 1 }
        (d / math.max(math.sqrt(n), 1e-30), cid)
      }.sortBy { case (s, cid) => (-s, cid) }.take(nProbe).map(_._2)
      cells.map(cid => struct(lit(r.get(0)).as("qid"), lut.as("lut"), lit(cid).as("cell")))
    }: _*)

    val scored = coded
      .join(explodeToDf(corpus.sparkSession, probes), Seq("cell"))
      .where(col("qid") =!= col("id"))
      .select(col("qid").as("q"), col("id").as("neighbor"),
        adcScore(col("codes"), col("lut")).as("adc"))
    rerankExact(corpus, shortlistOf(scored, shortlist), qRows, k)
  }

  /** One-row DataFrame of the exploded literal probe structs — gives
    * the optimizer a relation to broadcast for the cell equi-join.
    */
  private def explodeToDf(spark: org.apache.spark.sql.SparkSession, probes: Column): DataFrame =
    spark.range(1).select(explode(probes).as("p"))
      .select(col("p.qid").as("qid"), col("p.lut").as("lut"), col("p.cell").as("cell"))

  /** Literal ADC lookup table for one query: lut(s)(j) = dot(q_sub_s,
    * book(s)(j)), computed driver-side (m x kCodes doubles).
    */
  private def lutLiteral(qv: Array[Double], cb: Codebooks): Column = {
    require(qv.length == cb.m * cb.subDim, "query dim mismatch")
    val lut = Array.tabulate(cb.m) { s =>
      val qs = qv.slice(s * cb.subDim, (s + 1) * cb.subDim)
      cb.books(s).map { c =>
        var d = 0.0; var i = 0
        while (i < qs.length) { d += qs(i) * c(i); i += 1 }
        d
      }
    }
    array(lut.map(sub => array(sub.map(lit(_)): _*)): _*)
  }

  /** Literal array of (qid, lut) structs for the whole probe batch. */
  private def inlineLuts(qRows: Array[Row], cb: Codebooks): Column =
    array(qRows.map { r =>
      struct(
        lit(r.get(0)).as("qid"),
        lutLiteral(r.getSeq[Double](1).toArray, cb).as("lut"))
    }: _*)

  /** ADC score: sum of one lut lookup per subspace code. */
  private def adcScore(codes: Column, lut: Column): Column =
    aggregate(
      zip_with(codes, lut, (c, l) => element_at(l, c + 1)),
      lit(0.0), (acc, x) => acc + x)

  /** Top-`shortlist` candidates per query by ADC score. */
  private def shortlistOf(scored: DataFrame, shortlist: Int): DataFrame = {
    val w = Window.partitionBy(col("q")).orderBy(col("adc").desc, col("neighbor"))
    scored
      .withColumn("crank", row_number().over(w))
      .where(col("crank") <= shortlist)
      .select(col("q"), col("neighbor"))
  }

  /** Exact re-rank of the broadcast-sized shortlist against full
    * precision — emitted sim is TRUE cosine (oracle re-derives).
    */
  private def rerankExact(
      corpus: DataFrame, cands: DataFrame, qRows: Array[Row], k: Int): DataFrame = {
    val qvecCol = qRows.foldRight(lit(null).cast("array<double>")) { case (r, e) =>
      when(col("q") === lit(r.get(0)),
        array(r.getSeq[Double](1).map(lit(_)): _*)).otherwise(e)
    }
    val exact = corpus
      .join(broadcast(cands), col("id") === col("neighbor"))
      .withColumn("qvec", qvecCol)
      .select(col("q"), col("neighbor"), Cosine.sim(col("qvec"), col("vec")).as("sim"))
    val w2 = Window.partitionBy(col("q")).orderBy(col("sim").desc, col("neighbor"))
    exact
      .withColumn("rank", row_number().over(w2))
      .where(col("rank") <= k)
      .select(col("q"), col("neighbor"), round(col("sim"), 4).as("sim"), col("rank"))
  }
}
