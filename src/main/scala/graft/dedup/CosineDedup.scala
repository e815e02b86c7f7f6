package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sim.{Cosine, LshAnn}
import graft.Store.Materializable

/** Embedding-cosine near-duplicate pairs at scale (LLM-pipeline brief):
  * random-hyperplane LSH buckets generate candidate pairs, exact cosine
  * verifies them. The all-pairs product never materializes — candidate
  * volume scales with bucket collisions (tunable via bits/tables), and
  * the exact check runs only on candidates.
  *
  * Approximate by construction: a true pair hashed apart in every
  * table is missed; recall rises with `numTables` (measured in
  * DedupSpec against the exact pair set).
  */
object CosineDedup {

  /** Target expected bucket occupancy for the adaptive hash width —
    * the [[SemDedup.TargetCellSize]] discipline applied to LSH: with
    * `bitsPerTable` FIXED, expected occupancy is n/2^bits and
    * per-table collisions grow ~n²/2^bits — the round-12 sf1 scale
    * measurement clocked the fixed-4-bit configuration at ×22-74 wall
    * for ×10 corpus (SCALE.md). Growing bits with log₂(n/target)
    * holds occupancy ~constant, so collisions stay ~n·target/2 per
    * table.
    */
  val TargetBucketSize = 512

  /** ceil(log₂(n / [[TargetBucketSize]])) clamped to [4, 20] — 4 bits
    * (today's fixed default) up to n = 8192, so oracle/spec-scale
    * behavior is bit-identical; beyond that one more hyperplane per
    * doubling. The 20-bit ceiling (≈1M buckets/table) is far past any
    * single-table need.
    */
  def adaptiveBits(n: Long): Int =
    math.min(20, math.max(4,
      math.ceil(math.log(math.max(1.0, n.toDouble / TargetBucketSize)) / math.log(2.0)).toInt))

  /** `bitsPerTable <= 0` (the default) derives the hash width from the
    * corpus size via [[adaptiveBits]] — one count job, the same
    * safe-by-default trade as [[SemDedup.pairs]]'s adaptive cell
    * count. Recall falls as bits rise (a true pair must agree on every
    * hyperplane of some table); `numTables` remains the recall lever,
    * and explicit `bitsPerTable` pins the width for tuned deployments.
    */
  def pairs(
      embeddings: DataFrame, // (id, vec array<double>)
      minCosine: Double,
      numTables: Int = 16,
      bitsPerTable: Int = 0,
      dim: Int = 64,
      maxBucket: Int = 0): DataFrame = {
    val bits = if (bitsPerTable > 0) bitsPerTable else adaptiveBits(embeddings.count())
    // Exact verification runs INLINE in the bucket-keyed self-join:
    // vectors+norms ride both join sides (each shipped once per table
    // through the ONE existing shuffle — numTables × corpus bytes,
    // linear), every colliding pair's cosine is computed as the join
    // output STREAMS into the threshold filter, and only the
    // (a, b, cosine) survivors — three narrow columns — reach the
    // pair dedup.
    //
    // Why one shape, not a size-gated pair: the round-13 30× scale
    // measurement killed the previous distinct-first shape (ids-only
    // candidates → dropDuplicates → join the vectors back on) — the
    // second verify join reshuffles a candidates-sized intermediate
    // CARRYING a 512-byte vector per row, an O(candidates ×
    // vector-bytes) exchange (~100 GB at 60k vectors / 16 tables)
    // that filled the measurement box's disk. A broadcast-gated
    // hybrid was tried and measured: even WITH the vector side
    // broadcastable, distinct-first lost 5.8× at 20k vectors
    // (87 s vs 15 s) because on low-threshold/structureless corpora
    // survivors are vanishingly rare — deduplicating tens of millions
    // of candidate ids costs more than re-verifying the multi-table
    // collision overlap inline (+12% flops at the measured overlap).
    // The crossover predictor would be survivor density, unknowable
    // before execution — so the scale-monotone shape ships
    // unconditionally. Results are identical either way: the cosine
    // is table-independent, the filter commutes with the dedup
    // (DedupSpec pins both-shape equality against exact ground truth).
    //
    // The (id, vec, nrm, buckets) relation is materialized ONCE
    // (graft.Store — localCheckpoint by default, reliable parquet when
    // spark.graft.store.path is set — the "signature store"
    // discipline): both bucket-join sides would otherwise re-scan the
    // corpus and re-derive numTables×bits hyperplane dot products.
    val store = bucketStore(embeddings, numTables, bits, dim)
    val long = store.select(
      col("id"), col("vec"), col("nrm"),
      explode(array((0 until numTables).map(t =>
        struct(lit(t).as("t"), col(s"bucket_$t").as("bk"))): _*)).as("tb"))
      .select(col("id"), col("vec"), col("nrm"), col("tb.t").as("t"), col("tb.bk").as("bk"))
    if (maxBucket <= 0) {
      // Threshold INSIDE the join condition, AFTER the id gate (round
      // 17, guide §4/§1.2): a `.where(cosine >= t)` above the join is
      // pushed down and PREPENDED to the residual condition, so the
      // round-16 plan evaluated the 64-dim dot product before the
      // `a.id < b.id` test — every bucket pair paid the cosine TWICE
      // over (self-pairs and both orientations). Conjunct order is
      // preserved through equi-key extraction, so writing the cheap
      // gate first halves the ArrayDot work (plan-verified: plans/r17).
      val cos = round(Cosine.dot(col("a.vec"), col("b.vec")) / (col("a.nrm") * col("b.nrm")), 4)
      long.as("a")
        .join(long.as("b"),
          col("a.t") === col("b.t") && col("a.bk") === col("b.bk") &&
            col("a.id") < col("b.id") && cos >= minCosine)
        .select(col("a.id").as("a"), col("b.id").as("b"), cos.as("cosine"))
        .dropDuplicates("a", "b")
    } else
      PairCap.cappedPairs(long, Seq("t", "bk"), maxBucket, minCosine)
  }

  /** The materialized `(id, vec, nrm, bucket_0..bucket_{T-1})`
    * signature store [[pairs]] builds internally — exposed for the
    * streamed parity protocol ([[graft.Scale]]), which needs the SAME
    * hyperplane assignment across per-table pair stages.
    */
  def bucketStore(embeddings: DataFrame, numTables: Int, bits: Int, dim: Int = 64): DataFrame =
    // Spread BEFORE the projections (round-16 measurement: a
    // single-row-group corpus file feeds the store build AND — through
    // the store's preserved partitioning — the broadcast-probe side of
    // the bucket join, so hyperplane dots and every candidate cosine
    // ran in ONE task). Hash on id is deterministic and the downstream
    // is partitioning-invariant: buckets/cosines are row-local,
    // candidates are set-semantics, the gate ORDER BY is total.
    LshAnn.withBuckets(graft.Spread.toCores(embeddings, col("id")), "vec", numTables, bits, dim)
      .withColumn("nrm", sqrt(Cosine.dot(col("vec"), col("vec"))))
      .materializeOnce()

  /** ONE table's uncapped qualifying pairs off a [[bucketStore]] —
    * verify semantics identical to [[pairs]] (inline exact cosine,
    * rounded to 4 decimals, ≥ `minCosine`). Within a single table
    * every id sits in exactly one bucket, so a pair appears at most
    * once and no dedup is needed; the union over all tables equals
    * [[pairs]]'s pre-dedup pair multiset, and its CONNECTIVITY equals
    * the deduped set's — which is what the streamed 100×-parity
    * protocol folds one table at a time
    * ([[DupClusters.resolveChunked]]) instead of holding the
    * 16-table pair volume live at once.
    */
  def tablePairs(store: DataFrame, t: Int, minCosine: Double): DataFrame = {
    val side = store.select(col("id"), col("vec"), col("nrm"), col(s"bucket_$t").as("bk"))
    // threshold in the join condition after the id gate — see pairs()
    val cos = round(Cosine.dot(col("a.vec"), col("b.vec")) / (col("a.nrm") * col("b.nrm")), 4)
    side.as("a")
      .join(side.as("b"), col("a.bk") === col("b.bk") &&
        col("a.id") < col("b.id") && cos >= minCosine)
      .select(col("a.id").as("a"), col("b.id").as("b"), cos.as("cosine"))
  }
}
