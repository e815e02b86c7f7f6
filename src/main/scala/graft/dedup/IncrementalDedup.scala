package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Store.Materializable

/** Incremental (batch-vs-corpus) near-duplicate detection: which NEW
  * documents near-duplicate something already in the corpus — the
  * production shape of dedup under continuous ingestion, where each
  * arriving batch is screened against everything accepted so far
  * rather than re-running corpus×corpus dedup from scratch.
  *
  * Same MinHash+LSH machinery as [[MinHashLSH]], but the band-bucket
  * join is BIPARTITE: corpus band rows on one side, batch band rows on
  * the other, so candidate volume scales with |batch| × collision
  * rate, never |corpus|² — the whole point of the incremental shape.
  * In steady state the corpus side's signatures are a precomputed
  * store (materialized via [[graft.Store]] — set `spark.graft.store.path`
  * for the FS-backed variant; a production job reads them from a table
  * and appends the batch's signatures after screening — signatures, not text, are the state that persists).
  *
  * Shuffle discipline matches the rest of the family: band rows carry
  * `(id, band, bucket)` only; signatures join back onto the deduped
  * candidate list for the slot-agreement estimate.
  */
object IncrementalDedup {

  /** `(id, dup_of, est_jaccard)` for every batch document whose
    * estimated Jaccard against some corpus document reaches
    * `minEstJaccard`: `id` is the batch doc, `dup_of` the corpus doc
    * it collides with (all matches emitted, not just the best — the
    * caller picks a keep policy). Batch and corpus ids must be
    * disjoint.
    */
  def newVsCorpus(
      corpus: DataFrame,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      bands: Int = 16,
      minEstJaccard: Double = 0.6,
      numHashes: Int = 64): DataFrame =
    newVsSignatures(
      MinHashLSH.signatures(corpus, idCol, textCol, n, numHashes).materializeOnce(),
      batch, idCol, textCol, n, bands, minEstJaccard, numHashes)

  /** [[newVsCorpus]] against a PRECOMPUTED signature store `(id, sig)`
    * — the steady-state production loop: read the store (any parquet
    * path works; the `(id, sig)` frame is the entire persistent
    * state), screen the arriving batch, then append the accepted
    * batch's signatures back to the store for the next round. Spec-
    * tested end to end over a parquet store in DedupSpec. Corpus text
    * is never re-shingled and never re-read.
    */
  def newVsSignatures(
      corpusSigs: DataFrame,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      bands: Int = 16,
      minEstJaccard: Double = 0.6,
      numHashes: Int = 64): DataFrame = {
    require(numHashes % bands == 0,
      s"numHashes ($numHashes) must be divisible by bands ($bands) for even band slicing")
    val r = numHashes / bands
    val batchSigs = MinHashLSH.signatures(batch, idCol, textCol, n, numHashes).materializeOnce()

    def bandRows(sigs: DataFrame): DataFrame = sigs
      .select(col("id"), col("sig"), explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("bucket", xxhash64(col("band"), slice(col("sig"), col("band") * r + 1, lit(r))))
      .select("id", "band", "bucket")

    val cands = bandRows(batchSigs).as("nw")
      .join(bandRows(corpusSigs).as("old"),
        col("nw.bucket") === col("old.bucket") && col("nw.band") === col("old.band"))
      .select(col("nw.id").as("id"), col("old.id").as("dup_of"))
      .dropDuplicates("id", "dup_of")

    cands
      .join(batchSigs.select(col("id"), col("sig").as("sa")), Seq("id"))
      .join(corpusSigs.select(col("id").as("dup_of"), col("sig").as("sb")), Seq("dup_of"))
      .select(
        col("id"), col("dup_of"),
        round(
          size(filter(zip_with(col("sa"), col("sb"), (x, y) => when(x === y, 1).otherwise(0)), v => v === 1))
            / lit(numHashes.toDouble), 4).as("est_jaccard"))
      .where(col("est_jaccard") >= minEstJaccard)
  }
}
