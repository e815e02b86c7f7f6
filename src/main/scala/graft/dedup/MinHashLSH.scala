package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Store.Materializable

/** MinHash + LSH banding near-duplicate detection (LLM-pipeline brief).
  *
  * Pipeline: shingle → per-document minhash signature (`numHashes`
  * universal hashes over `xxhash64` of each shingle) → split the
  * signature into `bands` bands → explode one row per band → bucket-join
  * on (band index, band slice) → candidate pairs → estimate Jaccard as
  * the fraction of agreeing signature positions.
  *
  * Scale: the only shuffles are the per-document signature aggregation
  * and the band bucket join; candidate generation is proportional to
  * bucket collisions, never |docs|². Signature computation is a single
  * `aggregate` higher-order fold per row (no explode of shingles).
  */
object MinHashLSH {

  private val Prime = 2147483647L // 2^31 - 1, Mersenne

  /** Deterministic universal-hash coefficients (fixed seed — results
    * must be reproducible run to run).
    */
  private def coeffs(numHashes: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(numHashes)((1 + rnd.nextInt(Int.MaxValue - 1).toLong, rnd.nextInt(Int.MaxValue).toLong))
  }

  /** docs → (id, sig array<bigint>[numHashes]).
    *
    * Shape: explode shingles → one codegen'd hash-aggregate with
    * `numHashes` `min` buffers, then repack into an array. A per-row
    * `aggregate(...)` higher-order fold per slot evaluates interpreted
    * and measured ~40x slower; the explode adds one shuffle keyed on
    * the doc id, with map-side partial mins keeping it |docs|-sized.
    */
  def signatures(docs: DataFrame, idCol: String, textCol: String, n: Int = 2, numHashes: Int = 64): DataFrame = {
    // spread under-partitioned inputs before the shingle explode (the
    // single-row-group corpus file otherwise pins shingling+hashing to
    // one task); per-slot min is order-insensitive
    val exploded = graft.Spread.toCores(docs, col(idCol)).select(
      col(idCol).as("id"),
      explode_outer(Shingles.hashedShingles(col(textCol), n)).as("s"))
    // shingles arrive pre-hashed (native one-pass ShingleHashes);
    // explode_outer turns a shingle-less doc into one null row, which
    // the old chain hashed as xxhash64(null) = the seed (42) — coalesce
    // keeps those signatures bit-identical
    val h = pmod(coalesce(col("s"), lit(42L)), lit(Prime))
    val slots = coeffs(numHashes).zipWithIndex.map { case ((a, b), i) =>
      min(pmod(lit(a) * h + lit(b), lit(Prime))).as(s"_s$i")
    }
    exploded
      .groupBy(col("id"))
      .agg(slots.head, slots.tail: _*)
      .select(col("id"), array((0 until numHashes).map(i => col(s"_s$i")): _*).as("sig"))
  }

  /** Candidate pairs from band-bucket collisions with estimated Jaccard
    * (fraction of agreeing minhash slots) at or above `minEstJaccard`.
    *
    * Ids-only candidate discipline (same as [[CosineDedup]]): the band
    * explode and bucket self-join move `(id, band, bucket)` — 24 bytes
    * — never the `numHashes`-slot signature array (~0.5 KB, ×bands
    * copies, through both join sides: ~40x the shuffle volume at any
    * scale). Signatures are materialized ONCE ([[graft.Store]] —
    * localCheckpoint by default, an FS-backed parquet store when
    * `spark.graft.store.path` is set; |docs|-sized — the "signature
    * store" of a production incremental pipeline) and
    * joined back onto the deduplicated pair list for the slot-agreement
    * estimate — without the materialization the signature AGGREGATION
    * subtree would re-execute for each of its three plan occurrences.
    */
  def candidatePairs(
      sigs: DataFrame,
      bands: Int = 16,
      minEstJaccard: Double = 0.6,
      numHashes: Int = 64): DataFrame = {
    require(numHashes % bands == 0,
      s"numHashes ($numHashes) must be divisible by bands ($bands) for even band slicing")
    val r = numHashes / bands
    val sigStore = sigs.materializeOnce()
    val bandRows = sigStore.select(
      col("id"), col("sig"),
      explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("bucket", xxhash64(col("band"), slice(col("sig"), col("band") * r + 1, lit(r))))
      .select("id", "band", "bucket")
    val cands = bandRows.as("a")
      .join(bandRows.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.band") === col("b.band") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a"), col("b.id").as("b"))
      .dropDuplicates("a", "b")
    cands
      .join(sigStore.select(col("id"), col("sig").as("sa")), col("a") === col("id")).drop("id")
      .join(sigStore.select(col("id"), col("sig").as("sb")), col("b") === col("id")).drop("id")
      .select(
        col("a"), col("b"),
        round(
          size(filter(zip_with(col("sa"), col("sb"), (x, y) => when(x === y, 1).otherwise(0)), v => v === 1))
            / lit(numHashes.toDouble), 4).as("est_jaccard"))
      .where(col("est_jaccard") >= minEstJaccard)
  }

  /** Full pipeline: near-dup pairs on word n-gram shingles. */
  def pairs(docs: DataFrame, idCol: String, textCol: String, n: Int = 2,
            bands: Int = 16, minEstJaccard: Double = 0.6, numHashes: Int = 64): DataFrame =
    candidatePairs(signatures(docs, idCol, textCol, n, numHashes), bands, minEstJaccard, numHashes)
}
