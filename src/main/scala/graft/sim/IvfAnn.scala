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
    if (probes <= 1) corpus.select(col("id"), nearestCell(col("vec"), cs).as("cell"))
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

  /** `iters` Lloyd's iterations from a deterministic seed (the
    * numCells lowest-id vectors). iters = 0 reproduces pure seed
    * sampling — kept for the trained-vs-sampled recall comparison in
    * AnnTextSpec.
    */
  def train(corpus: DataFrame, numCells: Int, iters: Int = 3): Centroids = {
    var centroids: Centroids = Centroids(
      corpus.orderBy("id").limit(numCells).select("vec").collect()
        .zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](0).toArray) })
    var it = 0
    while (it < iters) {
      val means = corpus
        .select(nearestCell(col("vec"), centroids).as("cell"), posexplode(col("vec")))
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
