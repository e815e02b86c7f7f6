package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-style ANN (LLM-pipeline brief): partition the corpus into
  * `numCells` Voronoi cells around k-means-trained centroids, probe
  * only the `nProbe` nearest cells per query, exact-rerank the
  * candidates.
  *
  * Centroids are trained with Lloyd's iterations expressed as
  * DataFrame ops: assign each vector to its nearest centroid (a
  * row-local argmax over a literal centroid array — a Generate-free
  * map, no join operator), then re-center each cell as the
  * element-wise mean (posexplode → per-(cell, dim) average — one
  * |corpus|-keyed shuffle per iteration). Centroids are collected to
  * the driver between iterations: numCells x dim doubles, which is
  * exactly the "broadcast the tiny side" regime even at thousands of
  * cells.
  *
  * Scale shape: assignment is |corpus| x numCells codegen'd dot
  * products in one pass; queries touch nProbe/numCells of the corpus
  * via an equi join on the cell id. Probing every cell degenerates to
  * exact search (tested in AnnTextSpec).
  */
object IvfAnn {

  /** Trained centroid handle: [[train]] once, probe many times with
    * [[topKWith]] — the production shape. The self-contained [[topK]]
    * retrains per call, which is correct but pays the Lloyd's passes
    * every time; anything serving more than one query batch should
    * hold one of these instead.
    */
  final case class Centroids(cells: Array[(Int, Array[Double])])

  /** Literal array of (cid, cvec, cn) structs. */
  private def inlineCentroids(cs: Centroids): Column =
    array(cs.cells.map { case (cid, v) =>
      var n = 0.0
      v.foreach(x => n += x * x)
      struct(lit(cid).as("cid"),
        array(v.map(lit(_)): _*).as("cvec"),
        lit(math.sqrt(n)).as("cn"))
    }: _*)

  /** Row-local nearest-cell id for `vec` against the literal centroid
    * set: argmax of cosine over the centroid array via max-of-structs
    * (ties to the lowest cid through the negated id — deterministic).
    * The vector's own norm divides every score equally, so it is
    * dropped from the argmax — one dot product per centroid.
    */
  private def nearestCell(vec: Column, cs: Centroids): Column = {
    // aliases inside a transform() lambda are resolved away, so the
    // struct fields keep Spark's positional names: col1 = score,
    // col2 = negated cid
    val scored = transform(inlineCentroids(cs), c =>
      struct(
        Cosine.dot(vec, c.getField("cvec")) / c.getField("cn"),
        -c.getField("cid")))
    -array_max(scored).getField("col2")
  }

  /** Row-local nearest-cell column for composing the cell id into a
    * wider projection (IVF-PQ's `(id, cell, codes)` index build).
    */
  def cellOf(vec: Column, cs: Centroids): Column = nearestCell(vec, cs)

  /** Row-local Voronoi cell assignment against a trained centroid set:
    * `(id, cell)` rows for every corpus vector — a row-local map over
    * the scan (the centroids ride along as a literal array), no join,
    * no shuffle. `probes = 1` is hard assignment (one row per vector,
    * Generate-free); `probes > 1` is SOFT assignment — one row per
    * (vector, top-p cell), the multi-probe trick that recovers
    * cell-boundary neighbors at the cost of p× assignment rows.
    * Shared by IVF probing and [[graft.dedup.SemDedup]]'s
    * cluster-bounded candidate generation.
    */
  def assign(corpus: DataFrame, cs: Centroids, probes: Int = 1): DataFrame =
    if (cs.cells.length > LiteralAssignMaxCells)
      assignHierarchical(corpus, cs, probes)
    else if (probes <= 1) corpus.select(col("id"), nearestCell(col("vec"), cs).as("cell"))
    else {
      // sort (score, -cid) ascending, take the top `probes` from the
      // tail — ties break to the lowest cid, like nearestCell
      val scored = transform(inlineCentroids(cs), c =>
        struct(
          Cosine.dot(col("vec"), c.getField("cvec")) / c.getField("cn"),
          -c.getField("cid")))
      corpus.select(
        col("id"),
        explode(transform(
          slice(reverse(array_sort(scored)), 1, probes),
          x => -x.getField("col2"))).as("cell"))
    }

  /** Boundary of the literal-centroid assignment regime: beyond this
    * the inlined numCells×dim literal array stresses codegen (constant
    * pool / 64KB method limits) and [[assign]] auto-routes to the
    * hierarchical path.
    */
  val LiteralAssignMaxCells = 4096

  /** Two-level (coarse-quantized) cell assignment — the scale path
    * past the literal-centroid regime, the same shape FAISS's IMI /
    * coarse-quantizer composition uses for 10⁵⁺ cells:
    *
    *  1. the CENTROID SET is itself k-means-clustered into
    *     `superCells` super-cells — driver-side Lloyd's over
    *     numCells×dim doubles (KB–MB at any realistic cell count; no
    *     Spark job);
    *  2. each corpus vector literal-assigns to its `superProbes`
    *     nearest super-centroids (≤ a few hundred literals — always
    *     inside the literal regime by construction);
    *  3. an EQUI broadcast join on the super-cell id attaches that
    *     super-cell's member-centroid array (never a nested-loop
    *     join), and the row-local argmax runs over members only —
    *     ~numCells/superCells dot products per probe instead of
    *     numCells.
    *
    * `superProbes` bounds the approximation: a vector whose true
    * nearest centroid lives in a non-probed super-cell gets its best
    * PROBED centroid instead (the classic coarse-quantization miss;
    * `superProbes = superCells` is exact — spec-tested). Cost shape:
    * hard super-assignment (`superProbes = 1`) stays a zero-shuffle
    * row-local map like the literal path; `superProbes > 1` adds ONE
    * ids-sized exchange (per-probe local top-`probes` structs are
    * merged per id) — candidates still ride ids-only shuffles.
    * Empty super-cells are dropped after the driver-side clustering,
    * so every probed super-cell has members and the inner join loses
    * no vectors.
    *
    * Corpus contract (also [[assign]]'s and [[train]]'s): columns
    * `(id, vec)` with `id` UNIQUE — the multi-probe merge groups by it
    * and training averages per cell through it, so a duplicated id
    * would silently merge two different vectors' probe lists /
    * double-count a vector in a cell mean. `carryVec = true` threads
    * `vec` through to the output (training's per-cell means then fold
    * straight off the assignment — no second corpus scan, no id-keyed
    * join back).
    */
  def assignHierarchical(
      corpus: DataFrame,
      cs: Centroids,
      probes: Int = 1,
      superCells: Int = 64,
      superProbes: Int = 2,
      carryVec: Boolean = false): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val (superCs, membership) = clusterCentroids(cs, superCells)
    val memberDf = membership.toSeq
      .map { case (scid, members) =>
        (scid, members.map { case (cid, v) =>
          var n = 0.0; v.foreach(x => n += x * x)
          (cid, v.toSeq, math.sqrt(n))
        }.toSeq)
      }
      .toDF("scell", "members")
      .select(col("scell"), col("members").cast(
        "array<struct<cid:int,cvec:array<double>,cn:double>>").as("members"))

    val sp = math.min(superProbes, superCs.cells.length)
    val probed =
      if (sp <= 1)
        corpus.select(col("id"), col("vec"), nearestCell(col("vec"), superCs).as("scell"))
      else {
        val scored = transform(inlineCentroids(superCs), c =>
          struct(
            Cosine.dot(col("vec"), c.getField("cvec")) / c.getField("cn"),
            -c.getField("cid")))
        corpus.select(col("id"), col("vec"),
          explode(transform(
            slice(reverse(array_sort(scored)), 1, sp),
            x => -x.getField("col2"))).as("scell"))
      }

    // row-local top-`probes` member cells within the probed super-cell:
    // (score, -cid) structs sorted descending, like the literal path
    val carried = if (carryVec) Seq(col("vec")) else Nil
    val localTop = probed.join(broadcast(memberDf), "scell")
      .select(col("id") +: carried :+
        slice(reverse(array_sort(transform(col("members"), c =>
          struct(
            Cosine.dot(col("vec"), c.getField("cvec")) / c.getField("cn"),
            -c.getField("cid"))))), 1, probes).as("top"): _*)

    if (sp <= 1)
      localTop.select(col("id") +: carried :+
        explode(transform(col("top"), x => -x.getField("col2"))).as("cell"): _*)
    else
      localTop.groupBy("id")
        .agg(flatten(collect_list(col("top"))).as("tops"),
          // id is unique (contract above), so first() is THE vector
          (if (carryVec) Seq(first(col("vec")).as("vec")) else Nil): _*)
        .select(col("id") +: carried :+
          explode(transform(
            slice(reverse(array_sort(col("tops"))), 1, probes),
            x => -x.getField("col2"))).as("cell"): _*)
  }

  /** Driver-side Lloyd's over the centroid SET (numCells points — tiny
    * by construction): returns the surviving super-centroids (empty
    * super-cells dropped, ids re-packed) and the member centroids per
    * super-cell. Deterministic: seeds are the `k` lowest-cid
    * centroids, ties in assignment break to the lowest super-cid.
    */
  private def clusterCentroids(cs: Centroids, k: Int, iters: Int = 3)
      : (Centroids, Map[Int, Array[(Int, Array[Double])]]) = {
    val pts = cs.cells.sortBy(_._1)
    val kk = math.min(k, pts.length)
    var sup: Array[Array[Double]] = pts.take(kk).map(_._2.clone())
    def nrm(v: Array[Double]): Double = { var n = 0.0; v.foreach(x => n += x * x); math.sqrt(n) }
    def best(v: Array[Double]): Int = {
      var bi = 0; var bs = Double.NegativeInfinity
      var i = 0
      while (i < sup.length) {
        val s = sup(i)
        var d = 0.0; var j = 0
        while (j < v.length) { d += v(j) * s(j); j += 1 }
        val den = nrm(s)
        val score = if (den == 0.0) 0.0 else d / den
        if (score > bs) { bs = score; bi = i }
        i += 1
      }
      bi
    }
    var asg: Array[Int] = pts.map(p => best(p._2))
    var it = 0
    while (it < iters) {
      val sums = Array.fill(kk)(new Array[Double](pts.head._2.length))
      val cnts = new Array[Int](kk)
      pts.indices.foreach { i =>
        val a = asg(i); cnts(a) += 1
        var j = 0
        while (j < pts(i)._2.length) { sums(a)(j) += pts(i)._2(j); j += 1 }
      }
      sup = sup.indices.map { a =>
        if (cnts(a) == 0) sup(a)
        else { val m = sums(a); var j = 0; while (j < m.length) { m(j) /= cnts(a); j += 1 }; m }
      }.toArray
      asg = pts.map(p => best(p._2))
      it += 1
    }
    val byCell = pts.indices.groupBy(asg(_))
    val live = byCell.keys.toSeq.sorted // drop empty super-cells
    val remap = live.zipWithIndex.toMap
    val superCs = Centroids(live.map(a => (remap(a), sup(a))).toArray)
    val members = byCell.map { case (a, idxs) => (remap(a), idxs.map(pts(_)).toArray) }
    (superCs, members)
  }

  /** `iters` Lloyd's iterations from a deterministic seed (the
    * numCells lowest-id vectors). iters = 0 reproduces pure seed
    * sampling — kept for the trained-vs-sampled recall comparison in
    * AnnTextSpec.
    *
    * Corpus contract: `(id, vec)` with `id` unique — the seed orders
    * by it and the hierarchical assignment merges probe lists through
    * it (see [[assignHierarchical]]); a duplicated id double-counts
    * its vector in the per-cell means.
    *
    * Past [[LiteralAssignMaxCells]] each iteration's assignment runs
    * through the hierarchical path with `carryVec = true` — the cell
    * means fold straight off the assignment output, no join back onto
    * the corpus (training inherits assignment's regime switch at one
    * corpus scan per iteration either way). The per-iteration driver
    * collect is the MODEL itself (numCells×dim means — e.g.
    * 262144×64 ≈ 134 MB of doubles), the same "centroids are driver
    * data" regime the literal path already assumes.
    */
  def train(corpus: DataFrame, numCells: Int, iters: Int = 3): Centroids = {
    // Small models train DRIVER-LOCALLY on a bounded deterministic
    // sample (LocalTrain — 2 Spark jobs at any corpus size instead of
    // one shuffle job per iteration; rationale + measurement in
    // SCALE.md). Same init rule (first-k by id within the collected
    // set), same cosine argmax with ties to the lowest cid, same
    // empty-cell-keeps-centroid semantics as the distributed loop.
    if (numCells <= LocalTrain.MaxLocalCells) {
      val pts = LocalTrain.collectSample(corpus, LocalTrain.sampleCap(numCells))
      val init = pts.take(numCells)
      return Centroids(LocalTrain.lloydCosine(pts, init, iters)
        .zipWithIndex.map { case (v, i) => (i, v) })
    }
    var centroids: Centroids = Centroids(
      corpus.orderBy("id").limit(numCells).select("vec").collect()
        .zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](0).toArray) })
    var it = 0
    while (it < iters) {
      val assigned =
        if (centroids.cells.length > LiteralAssignMaxCells)
          assignHierarchical(corpus, centroids, 1, carryVec = true)
            .select(col("cell"), posexplode(col("vec")))
        else corpus
          .select(nearestCell(col("vec"), centroids).as("cell"), posexplode(col("vec")))
      val means = assigned
        .groupBy(col("cell"), col("pos"))
        .agg(avg(col("col")).as("m"))
        .collect()
      val byCell = means.groupBy(_.getAs[Int]("cell"))
      centroids = Centroids(centroids.cells.map { case (cid, old) =>
        byCell.get(cid) match {
          case Some(rows) =>
            val v = new Array[Double](old.length)
            rows.foreach(r => v(r.getAs[Int]("pos")) = r.getAs[Double]("m"))
            (cid, v)
          case None => (cid, old) // empty cell keeps its centroid
        }
      })
      it += 1
    }
    centroids
  }

  /** Self-contained train-and-probe (trains centroids per call — fine
    * for one-shot queries; batch consumers should [[train]] once and
    * call [[topKWith]]).
    */
  def topK(
      queries: DataFrame, // (qid, qvec)
      corpus: DataFrame,  // (id, vec)
      k: Int,
      numCells: Int = 16,
      nProbe: Int = 4,
      iters: Int = 3): DataFrame =
    topKWith(queries, corpus, train(corpus, numCells, iters), k, nProbe)

  /** Probe a pre-trained centroid set: top-k cosine neighbors per
    * query, touching only the `nProbe` nearest cells.
    */
  def topKWith(
      queries: DataFrame, // (qid, qvec)
      corpus: DataFrame,  // (id, vec)
      centroids: Centroids,
      k: Int,
      nProbe: Int = 4): DataFrame = {
    // NOT spread (round 16): probe batches are small by contract and
    // the extra exchange measured a net loss on the ANN rows.
    val cells = corpus.select(col("id"), col("vec"), nearestCell(col("vec"), centroids).as("cell"))

    // per-query top-nProbe cells: explode the literal centroid array
    // (Generate, not a join) and rank-window the scores
    val probeScores = queries
      .select(col("qid"), col("qvec"), explode(inlineCentroids(centroids)).as("c"))
      .select(col("qid"), col("qvec"), col("c.cid").as("cid"),
        (Cosine.dot(col("qvec"), col("c.cvec")) /
          (sqrt(Cosine.dot(col("qvec"), col("qvec"))) * col("c.cn"))).as("csim"))
    val pw = Window.partitionBy("qid").orderBy(col("csim").desc, col("cid"))
    val probes = probeScores.withColumn("rn", row_number().over(pw))
      .where(col("rn") <= nProbe).select(col("qid"), col("qvec"), col("cid").as("cell"))

    val cands = probes.join(cells, Seq("cell")).where(col("qid") =!= col("id"))
      .select(col("qid").as("q"), col("id").as("neighbor"),
        Cosine.sim(col("qvec"), col("vec")).as("sim"))
    val w = Window.partitionBy("q").orderBy(col("sim").desc, col("neighbor"))
    cands.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("q"), col("neighbor"), round(col("sim"), 4).as("sim"), col("rank"))
  }
}
