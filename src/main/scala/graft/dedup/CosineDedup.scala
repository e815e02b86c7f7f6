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
      dim: Int = 64): DataFrame = {
    val bits = if (bitsPerTable > 0) bitsPerTable else adaptiveBits(embeddings.count())
    // Candidate generation moves only (id, table, bucket) — never the
    // vectors. Shuffling 64-dim payloads through the bucket join and
    // the pair-dedup costs ~60x the bytes and measured ~10x slower;
    // vectors (with precomputed norms) are joined back onto the
    // deduplicated pair list for the exact check — auto-broadcast when
    // the embedding table is small, shuffle hash join on the id keys at
    // corpus scale (no forced hint, so neither regime OOMs).
    //
    // The (id, vec, nrm, buckets) relation is materialized ONCE
    // (graft.Store — localCheckpoint by default, reliable parquet when
    // spark.graft.store.path is set — the "signature store" discipline): its
    // four plan occurrences (both bucket-join sides + both exact-verify
    // probes) would otherwise each re-scan the corpus and re-derive
    // numTables×bits hyperplane dot products / the norms from parquet.
    val store = LshAnn.withBuckets(embeddings, "vec", numTables, bits, dim)
      .withColumn("nrm", sqrt(Cosine.dot(col("vec"), col("vec"))))
      .materializeOnce()
    val long = store.select(
      col("id"),
      explode(array((0 until numTables).map(t =>
        struct(lit(t).as("t"), col(s"bucket_$t").as("bk"))): _*)).as("tb"))
      .select(col("id"), col("tb.t").as("t"), col("tb.bk").as("bk"))
    val cand = long.as("a")
      .join(long.as("b"),
        col("a.t") === col("b.t") && col("a.bk") === col("b.bk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a"), col("b.id").as("b"))
      .dropDuplicates("a", "b")
    val vecs = store.select(col("id"), col("vec"), col("nrm"))
    cand
      .join(vecs.as("x"), col("a") === col("x.id"))
      .join(vecs.as("y"), col("b") === col("y.id"))
      .select(col("a"), col("b"),
        round(Cosine.dot(col("x.vec"), col("y.vec")) / (col("x.nrm") * col("y.nrm")), 4).as("cosine"))
      .where(col("cosine") >= minCosine)
  }
}
