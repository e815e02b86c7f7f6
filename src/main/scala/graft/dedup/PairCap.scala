package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sim.Cosine

/** Per-group candidate cap for the embedding-dedup families — the
  * hot-cell insurance the round-14 clustered-corpus measurement
  * motivated (SCALE.md "clustered" section).
  *
  * The cell/bucket families bound candidate volume by Σ|group|², which
  * is linear only while groups stay near their occupancy target. A
  * corpus with a TIGHT near-duplicate blob breaks that: all blob
  * members share every hyperplane sign (LSH — the measured 10×
  * clustered point put 4,563 of 20,000 vectors in ONE bucket per
  * table, collapsing the pruning factor from ~10³× to 1.4×), and
  * exactly-identical vectors can never be split by ANY Voronoi
  * assignment (k-means splits a merely-tight blob fine, but identical
  * embeddings of exact-dup documents all tie to one cell). Either way
  * one group goes quadratic in blob mass — C(10M, 2) pairs for a 1%
  * exact-dup blob at 1B vectors.
  *
  * The cap switches every over-`cap` group from all-pairs (C(m, 2)) to
  * a GEOMETRY-ORDERED STRIDE CHAIN: members sort by an 8-bit
  * sign-projection key (deterministic pseudo-random hyperplanes,
  * dimension-agnostic — see [[signKey]]) and each pairs with its
  * [[ChainStrides]] predecessors plus the group's rank-1 hub — w·m
  * pairs per group instead of C(m, 2), linear again (Σ_small C(m,2) ≤
  * groups·C(cap,2) plus Σ_big w·m ≤ w·n per table), at O(log m) pair-
  * graph diameter so downstream label propagation stays round-bounded
  * (see [[ChainStrides]]). The ordering matters: two simpler
  * schemes were measured first on the 10× clustered corpus and
  * under-removed ~15% (min-id STAR: a single representative's cosine
  * to tail members straddles the threshold; id-ordered chain: ids are
  * geometry-blind, and a far-tail member fails against ALL of its
  * random partners at once — failures are node-driven, not
  * edge-driven). Sign-key ordering gives the chain the self-selection
  * LSH buckets get for free: a member deviating from the blob center
  * flips the same near-zero projection bits as other members deviating
  * the SAME way, so chain partners are angularly close and far-tail
  * members pair with their own kind. What the cap gives up is
  * blob-internal pair COMPLETENESS, which is quadratic in blob size
  * and feeds nothing downstream, plus genuine pairs inside an over-cap
  * group farther than w chain steps apart in key order — rare by
  * construction, since the adaptive occupancy rules hold EXPECTED
  * group size at ~512, so a group many times over target is structural
  * near-duplication, not hash luck. Measured on the adversarial
  * mixture corpus: capped removal counts match uncapped (SCALE.md
  * "clustered" section), at bounded volume.
  */
private[dedup] object PairCap {

  /** Key-order rank offsets each over-cap member pairs with: its
    * predecessor plus exponentially-strided earlier ranks, AND the
    * group's rank-1 member (a star hub). Eight edges per member,
    * chosen for graph DIAMETER, not just connectivity: a contiguous
    * window was built first and measured — it connects the blob, but
    * as an O(m/w)-diameter path, and [[DupClusters.resolve]]'s
    * min-label propagation pays a round PER HOP (200 identical vectors
    * at w=8 = 25 rounds = the resolver's default ceiling; a 10M-copy
    * blob would be unresolvable). Strides make the passing subgraph
    * O(log m) diameter even with every star edge failed; the star
    * edge makes it ~2 hops for a tight blob where rep-member cosine
    * holds.
    */
  val ChainStrides: Seq[Int] = Seq(1, 2, 4, 8, 16, 32, 64)

  /** Row-local pseudo-random projection of `vec` — hyperplane `k`'s
    * component at index `i` is `sin((i+1)·c_k + d_k)`, so the
    * projection needs no dimension parameter and no materialized
    * plane array (the [[LshAnn]] trick, re-derived dimension-agnostic
    * for a module that sees vectors of unknown width).
    */
  private def projection(vec: Column, k: Int): Column =
    aggregate(
      transform(vec, (x, i) =>
        x * sin((i + lit(1)).cast("double") * lit(12.9898 * (k + 1)) + lit(k * 78.233))),
      lit(0.0), (acc, x) => acc + x)

  /** 8-bit sign pattern of [[projection]]s 0..7 — the chain's sort
    * key. Within a tight blob the center term dominates every
    * projection, so most members share the key; members deviating the
    * same way flip the same near-zero bits and sort adjacently.
    */
  private def signKey(vec: Column): Column =
    (0 until 8).map(k =>
      when(projection(vec, k) >= 0, lit(1 << k)).otherwise(lit(0)))
      .reduce(_ + _)

  /** Pairs `(a, b, cosine)` within each `keys` group of `long`
    * (columns: `id`, `vec`, `nrm`, plus `keys`): all-pairs for groups
    * ≤ `cap`; groups over it go to `overCap` when given (the distinct
    * `(id, vec, nrm)` members of every over-cap group, returning
    * thresholded `(a, b, cosine)` pairs — [[SemDedup]] routes them
    * into the LSH family, whose finer multi-table buckets resolve the
    * straddling-cluster regime a bounded-degree chain cannot), else to
    * the geometry-ordered window chain. Exact cosine ≥ `minCosine` is
    * verified inline either way, pair-deduped across groups.
    */
  def cappedPairs(long: DataFrame, keys: Seq[String], cap: Int, minCosine: Double,
      overCap: Option[DataFrame => DataFrame] = None): DataFrame = {
    val kc = keys.map(col)
    // group sizes ride an ids-only aggregation on the SAME keys as the
    // pair join — one extra exchange of (keys, cnt), never vectors
    val sizes = long.groupBy(kc: _*).agg(count(lit(1)).as("cnt"))
    val tagged = long.join(sizes, keys)
    val keyEq = (a: String, b: String) =>
      keys.map(k => col(s"$a.$k") === col(s"$b.$k")).reduce(_ && _)
    val small = tagged.where(col("cnt") <= cap)
    val smallPairs = small.as("a")
      .join(small.as("b"), keyEq("a", "b") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a"), col("b.id").as("b"),
        round(Cosine.dot(col("a.vec"), col("b.vec")) / (col("a.nrm") * col("b.nrm")), 4).as("cosine"))
    val big = tagged.where(col("cnt") > cap)
    val bigPairs = overCap match {
      case Some(handler) => handler(big.select("id", "vec", "nrm").dropDuplicates("id"))
      case None =>
        // rank members by (sign key, id) within the group (one sort of
        // the over-cap subset only), then join the stride/star edge
        // set. least/greatest restore the a < b ordering invariant of
        // the all-pairs branch (key order is not id order).
        val ranked = big.withColumn("rn", row_number().over(
          Window.partitionBy(kc: _*).orderBy(signKey(col("vec")), col("id"))))
        val strideSet = array(ChainStrides.map(lit(_)): _*)
        ranked.as("a")
          .join(ranked.as("b"), keyEq("a", "b") && col("b.rn") > col("a.rn") &&
            (array_contains(strideSet, col("b.rn") - col("a.rn")) || col("a.rn") === 1))
          .select(least(col("a.id"), col("b.id")).as("a"),
            greatest(col("a.id"), col("b.id")).as("b"),
            round(Cosine.dot(col("a.vec"), col("b.vec")) / (col("a.nrm") * col("b.nrm")), 4).as("cosine"))
    }
    smallPairs.unionByName(bigPairs.select("a", "b", "cosine"))
      .where(col("cosine") >= minCosine)
      .dropDuplicates("a", "b")
  }
}
