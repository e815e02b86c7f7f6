package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Driver-local Lloyd's over a bounded deterministic sample — the
  * k-means TRAINING fast path for small models.
  *
  * The round-12 scale measurement (SCALE.md) showed training, not
  * probing, dominating the IVF/PQ walls: every distributed Lloyd's
  * iteration is a corpus-wide explode plus a (cell, dim)-keyed shuffle
  * job, so a train-heavy query pays 3-15 jobs before the first probe —
  * and with cells growing ∝ corpus (the adaptive rule) that term was
  * the family's one super-linear component. Centroid ESTIMATION never
  * needed the corpus: k-means on a bounded uniform sample recovers the
  * same cell structure (standard practice — FAISS trains on an
  * O(256·k) sample by default), so this path collects a deterministic
  * ≤ [[MaxSample]]-vector sample ONCE (≤ 33 MB of doubles) and
  * iterates on the driver: two Spark jobs total at ANY corpus size,
  * zero shuffles.
  *
  * Scope: engaged by [[IvfAnn.train]] / [[PqAnn.train]] when the model
  * is at most [[MaxLocalCells]] centroids (driver flops stay well
  * under a second there). Bigger models keep the distributed loop —
  * which past `LiteralAssignMaxCells` already switches to the
  * hierarchical regime. Everything is deterministic: the sample is a
  * content-hash filter (never partition-order `sample()`), points
  * iterate in id order, ties break to the lowest centroid index
  * (mirroring the distributed argmax's negated-cid tiebreak), and an
  * empty cell keeps its previous centroid (the distributed rule).
  */
private[sim] object LocalTrain {

  /** Largest model trained locally. At 512 cells × 64 dims × 32k
    * sample × 3 iters the driver does ~3e9 multiply-adds — sub-second;
    * past this the distributed loop's scan-per-iteration is the better
    * trade again.
    */
  val MaxLocalCells = 512

  val MinSample = 16384
  val MaxSample = 65536

  /** FAISS-style sample budget: ≥64 points per centroid, floored and
    * capped so tiny models still see a representative sample and huge
    * corpora stay collectable.
    */
  def sampleCap(k: Int): Int =
    math.min(MaxSample, math.max(64 * k, MinSample))

  /** Deterministic id-ordered sample of ≤ ~cap vectors: full corpus
    * when it fits, else a content-hash filter (reproducible across
    * runs and layouts, unlike `DataFrame.sample`).
    */
  def collectSample(corpus: DataFrame, cap: Int): Array[Array[Double]] = {
    val n = corpus.count()
    val base =
      if (n <= cap) corpus
      else {
        val keep = math.max(1L, math.round(cap.toDouble / n * 1000000L))
        corpus.where(pmod(xxhash64(col("id")), lit(1000000L)) < lit(keep))
      }
    base.orderBy("id").select("vec").collect().map(_.getSeq[Double](0).toArray)
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Lloyd's iterations with a pluggable assignment score (argmax,
    * ties to the lowest index). `init` seeds the centroids and fixes
    * k; empty cells keep their previous centroid.
    */
  private def lloyd(
      points: Array[Array[Double]],
      init: Array[Array[Double]],
      iters: Int,
      score: (Array[Double], Array[Double]) => Double): Array[Array[Double]] = {
    var cs = init.map(_.clone())
    val k = cs.length
    if (points.isEmpty || k == 0) return cs
    val dim = points(0).length
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      points.foreach { p =>
        var best = 0; var bestScore = score(p, cs(0)); var c = 1
        while (c < k) {
          val s = score(p, cs(c))
          if (s > bestScore) { best = c; bestScore = s }
          c += 1
        }
        var d = 0
        while (d < dim) { sums(best)(d) += p(d); d += 1 }
        counts(best) += 1
      }
      cs = Array.tabulate(k) { c =>
        if (counts(c) == 0) cs(c)
        else {
          val v = new Array[Double](dim)
          var d = 0
          while (d < dim) { v(d) = sums(c)(d) / counts(c); d += 1 }
          v
        }
      }
      it += 1
    }
    cs
  }

  /** Cosine-assignment Lloyd's ([[IvfAnn]]'s metric: argmax of
    * dot(x, c)/‖c‖ — the point's own norm divides out of the argmax).
    */
  def lloydCosine(points: Array[Array[Double]], init: Array[Array[Double]], iters: Int): Array[Array[Double]] =
    lloyd(points, init, iters, (x, c) => {
      val n = math.sqrt(dot(c, c))
      if (n == 0.0) Double.NegativeInfinity else dot(x, c) / n
    })

  /** L2-assignment Lloyd's ([[PqAnn]]'s metric: argmin of
    * ‖x−c‖² ⇔ argmax of 2·x·c − c·c).
    */
  def lloydL2(points: Array[Array[Double]], init: Array[Array[Double]], iters: Int): Array[Array[Double]] =
    lloyd(points, init, iters, (x, c) => 2.0 * dot(x, c) - dot(c, c))
}
