package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sim.{Cosine, IvfAnn}
import graft.Store.Materializable

/** Semantic deduplication over an embedding column — the SemDeDup
  * shape (Abbas et al. 2023, arXiv:2303.09540, public preprint):
  * k-means-cluster the embedding space, then look for near-duplicate
  * pairs ONLY within each cluster. Semantic duplicates are, by
  * definition, close in embedding space, so they land in the same
  * Voronoi cell; pairing within cells bounds candidate volume by
  * Σ|cell|² instead of |corpus|² — with numCells scaled ∝ corpus size
  * (the paper runs 50k clusters on 5B embeddings), expected cell
  * sizes stay constant and the candidate join stays linear-ish at
  * 100 TB. Cluster-boundary pairs are the recall cost (a true pair
  * split across cells is missed) — measured in DedupSpec against the
  * exact pair set; the LSH family ([[CosineDedup]]) is the
  * complementary tradeoff (multi-table redundancy buys recall,
  * costs table-count× candidate work).
  *
  * Discipline shared with the rest of the family:
  *  - candidate generation moves only `(id, cell)` — vectors join
  *    back onto the deduplicated candidate list for the exact check;
  *  - every emitted pair carries its TRUE cosine (exact verification
  *    on candidates), so downstream keep-one logic
  *    ([[DupClusters.resolve]] composes directly) never acts on an
  *    estimated similarity;
  *  - centroids train once ([[IvfAnn.train]], Lloyd's in DataFrame
  *    ops) and can be reused across batches via [[pairsWith]].
  */
object SemDedup {

  /** Target vectors per cell for the adaptive default: cells scale
    * with the corpus so within-cell pair work stays ~n·TargetCellSize
    * instead of n²/numCells.
    */
  val TargetCellSize = 512

  /** Self-contained train-and-pair (trains `numCells` centroids per
    * call; batch consumers should [[IvfAnn.train]] once and call
    * [[pairsWith]]).
    *
    * `numCells <= 0` (the default) derives the cell count from the
    * corpus size — ⌈n / TargetCellSize⌉ clamped to [4, 262144] — so
    * the obvious API keeps candidate volume ~linear as the corpus
    * grows instead of silently inheriting a fixed-k n²/k blowup; the
    * one extra count job is the price of the safe default. Past
    * `IvfAnn.LiteralAssignMaxCells` (4096), [[IvfAnn.assign]]
    * auto-routes to the hierarchical coarse-quantized path
    * ([[IvfAnn.assignHierarchical]]) — the former 4096 clamp was the
    * literal-codegen boundary, now a regime switch instead of a cap
    * (the adaptive default covers ~134M embeddings at the paper's
    * 512/cell before the 262144 guard binds; explicit `numCells` goes
    * higher).
    */
  def pairs(
      embeddings: DataFrame, // (id, vec array<double>)
      minCosine: Double,
      numCells: Int = 0,
      iters: Int = 3,
      probes: Int = 2,
      maxCell: Int = 0,
      dim: Int = 64): DataFrame = {
    val cells = if (numCells > 0) numCells else adaptiveCells(embeddings.count())
    pairsWith(embeddings, IvfAnn.train(embeddings, cells, iters), minCosine, probes,
      maxCell = maxCell, dim = dim)
  }

  /** The adaptive cell count for an `n`-vector corpus:
    * ⌈n / TargetCellSize⌉ clamped to [4, 262144]. Exposed so callers
    * that train centroids themselves (the hierarchical-assignment
    * path) derive the SAME linear-candidate configuration as [[pairs]].
    */
  def adaptiveCells(n: Long): Int =
    math.min(262144L, math.max(4L, (n + TargetCellSize - 1) / TargetCellSize)).toInt

  /** Near-duplicate pairs `(a, b, cosine)` sharing at least one of
    * their top-`probes` trained cells, with exact cosine ≥ `minCosine`.
    *
    * `probes = 1` is the paper-faithful hard assignment — right when
    * the threshold is high (0.9+) and duplicates are near-identical.
    * The default `probes = 2` soft-assigns each vector to its two
    * nearest cells, recovering pairs that straddle a Voronoi boundary
    * (at moderate thresholds most misses are boundary misses) for 2×
    * assignment rows and ~4× within-cell pair work — still
    * Σ|cell|²-bounded, never corpus².
    */
  def pairsWith(
      embeddings: DataFrame,
      centroids: IvfAnn.Centroids,
      minCosine: Double,
      probes: Int = 2,
      assigner: (DataFrame, IvfAnn.Centroids, Int) => DataFrame = IvfAnn.assign(_, _, _),
      maxCell: Int = 0,
      dim: Int = 64): DataFrame = {
    // Exact verification runs INLINE in the cell-keyed self-join —
    // the CosineDedup discipline, forced by the round-13 30× scale
    // measurement: the previous distinct-first shape (ids-only
    // candidates → dropDuplicates → join vectors back on) reshuffled
    // a Σ|cell|²-sized intermediate carrying a 512-byte vector per
    // row between the two verify joins (~32 GB exchange at 60k
    // vectors; wall ×7.6 for ×3 data despite exactly-linear candidate
    // volume). Here the vectors+norms ride both sides of the ONE cell
    // shuffle (probes × corpus bytes, linear), every within-cell pair
    // verifies as the join streams into the filter, and only narrow
    // (a, b, cosine) survivors reach the pair dedup. A boundary pair
    // sharing both probed cells re-verifies twice — identical cosine,
    // the filter commutes with the dedup, results identical (a
    // broadcast-gated hybrid was tried and REVERTED: distinct-first
    // lost 6× at 20k vectors even with the broadcast available,
    // because deduplicating millions of candidates costs more than
    // the inline overlap re-verification when survivors are rare —
    // see CosineDedup.pairs).
    //
    // The assignment relation materializes ONCE (graft.Store): it
    // re-derives numCells dot products per row and would otherwise run
    // on both self-join sides.
    // spread under-partitioned inputs BELOW the (already-trained)
    // centroids: assignment dots are row-local and the cell join is
    // set-semantics, so results are partitioning-invariant — unlike
    // train()'s float means, which the spread must never sit above
    // (round-16 single-row-group finding, see graft.Spread)
    val emb = graft.Spread.toCores(embeddings, col("id"))
    val cells = assigner(emb, centroids, probes)
      .join(emb.select(
        col("id"), col("vec"), sqrt(Cosine.dot(col("vec"), col("vec"))).as("nrm")), "id")
      .materializeOnce()
    if (maxCell <= 0) {
      // threshold in the join condition AFTER the id gate (round 17):
      // the pushed-down `.where` used to lead the residual condition,
      // so the dot product ran before `a.id < b.id` — see
      // CosineDedup.pairs for the conjunct-order rationale.
      val cos = round(Cosine.dot(col("a.vec"), col("b.vec")) / (col("a.nrm") * col("b.nrm")), 4)
      cells.as("a")
        .join(cells.as("b"),
          col("a.cell") === col("b.cell") && col("a.id") < col("b.id") && cos >= minCosine)
        .select(col("a.id").as("a"), col("b.id").as("b"), cos.as("cosine"))
        .dropDuplicates("a", "b")
    }
    else
      // Over-cap cells arise when Voronoi splitting fails: identical-
      // vector blobs tie to one cell no matter how many centroids
      // train, and k-means leaves TIGHT clusters in few cells. Their
      // members route into the LSH family ([[CosineDedup]], 16 tables
      // — each table samples an INDEPENDENT salted chain, and the
      // round-15 textual measurement moved removal from −12.9% to
      // −2.0% of uncapped as route diversity doubled 8→16 —
      // adaptive bits, recursion-terminating chain cap): fine
      // multi-table buckets resolve the straddling-cluster regime
      // (internal cosine distribution crossing the threshold) that a
      // bounded-degree chain was measured to under-remove by ~11% on
      // the 10× clustered corpus; volume stays cap-bounded both ways.
      // See [[PairCap]] for the measurement trail.
      PairCap.cappedPairs(cells.select("id", "vec", "nrm", "cell"), Seq("cell"),
        maxCell, minCosine,
        overCap = Some(sub => CosineDedup.pairs(
          sub.select("id", "vec"), minCosine, numTables = 16, dim = dim,
          maxBucket = maxCell)))
  }
}
