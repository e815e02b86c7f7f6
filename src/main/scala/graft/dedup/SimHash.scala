package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash near-duplicate detection (LLM-pipeline brief).
  *
  * 64-bit simhash per document: every token votes ±1 on each bit of its
  * `xxhash64`; the fingerprint takes the sign of each bit's vote sum.
  * Hamming distance between fingerprints is `bit_count(a ^ b)` — one
  * codegen'd instruction, no loops.
  *
  * Candidate pairing at scale: split the 64 bits into `bands` chunks and
  * bucket-join on exact chunk equality — any pair within hamming
  * distance < bands shares at least one exact chunk (pigeonhole), so
  * the bucket join finds all pairs with distance <= bands - 1 without
  * an all-pairs comparison.
  */
object SimHash {

  /** Literal [1L<<0, 1L<<1, ..., 1L<<63] (the Scala functions API has no
    * Column-valued shift amount, so bits are addressed by mask).
    */
  private val bitMasks: Column = array((0 until 64).map(i => lit(1L << i)): _*)

  /** Row-local fingerprint: fold tokens into 64 bit-votes, then pack the
    * vote signs into one long with bitwise OR (no additive overflow).
    * Interpreted higher-order fold — fine for ad-hoc use; the bulk path
    * is [[fingerprints]].
    */
  def fingerprint(text: Column): Column = {
    val toks = Shingles.tokens(text)
    val votes = aggregate(
      toks,
      array_repeat(lit(0), 64),
      (acc, t) =>
        zip_with(acc, bitMasks,
          (a, m) => a + when(xxhash64(t).bitwiseAND(m) =!= 0, 1).otherwise(-1)))
    aggregate(
      zip_with(votes, bitMasks, (v, m) => when(v > 0, m).otherwise(lit(0L))),
      lit(0L),
      (acc, bit) => acc.bitwiseOR(bit))
  }

  /** Bulk fingerprints via explode + one codegen'd hash-aggregate with
    * 64 sum buffers (same shape as MinHashLSH.signatures — the per-row
    * interpreted fold measured several times slower). Empty documents
    * get no row (explode of an empty token stream yields none after the
    * grouping); all real documents tokenize to at least one token.
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // spread under-partitioned inputs before the token explode (the
    // scan stage otherwise runs the whole tokenize+hash single-task on
    // single-row-group corpus files); the ±1 vote sums are integer and
    // order-insensitive, so results are partitioning-invariant
    val exploded = graft.Spread.toCores(docs, col(idCol)).select(
      col(idCol).as("id"),
      explode(Shingles.tokens(col(textCol))).as("t"))
    val h = xxhash64(col("t"))
    val votes = (0 until 64).map { i =>
      sum(when(h.bitwiseAND(lit(1L << i)) =!= 0, 1).otherwise(-1)).as(s"_v$i")
    }
    val packed = (0 until 64)
      .map(i => when(col(s"_v$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    exploded.groupBy(col("id")).agg(votes.head, votes.tail: _*)
      .select(col("id"), packed.as("simhash"))
  }

  /** Pairs within `maxHamming` via band-bucket join; guaranteed complete
    * when `maxHamming < bands`. Output carries both fingerprints
    * (`fa`, `fb`) next to the hamming distance so the claimed distance
    * is recomputable downstream — the DuckDB oracle re-derives
    * `bit_count(xor(fa, fb))` and re-applies the threshold.
    */
  def pairs(docs: DataFrame, idCol: String, textCol: String,
            maxHamming: Int = 3, bands: Int = 4): DataFrame = {
    require(maxHamming < bands, "completeness requires maxHamming < bands")
    val fps = fingerprints(docs, idCol, textCol)
    val width = 64 / bands
    val chunkMask = if (width == 64) -1L else (1L << width) - 1
    val bandRows = fps.select(col("id"), col("simhash"), explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("chunk",
        // simhash >>> (band*width) & mask, expressed per band since shift
        // amounts must be literals in the Scala API
        element_at(
          array((0 until bands).map(b => shiftrightunsigned(col("simhash"), b * width).bitwiseAND(lit(chunkMask))): _*),
          col("band") + 1))
    bandRows.as("a")
      .join(bandRows.as("b"),
        col("a.band") === col("b.band") && col("a.chunk") === col("b.chunk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a"), col("b.id").as("b"),
        col("a.simhash").as("fa"), col("b.simhash").as("fb"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long").as("hamming"))
      .dropDuplicates("a", "b")
      .where(col("hamming") <= maxHamming)
  }
}
