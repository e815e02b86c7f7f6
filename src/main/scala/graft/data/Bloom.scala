package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative Bloom filter: the bitmap is built with one aggregation
  * pass, collected to the driver as `Array[Long]` words, and the
  * membership test is pure codegen'd arithmetic over that array as a
  * literal — no UDF, no broadcast hash table, no custom expression.
  *
  * Why it exists (LLM-pipeline brief, decontamination at scale): the
  * exact gram-set broadcast grows with the benchmark suite (strings),
  * while the Bloom bitmap is ~`bitsPerKey` BITS per distinct key —
  * 1.25 bytes/key at the default vs tens of bytes for a gram string in
  * a hash set. A 100M-gram suite is ~160 MB of bitmap (ships once per
  * executor as task-literal bytes) where the exact set would blow the
  * broadcast limit. False positives are expected and fine: callers
  * exact-verify the survivors, whose volume is `true-positive rate +
  * ~0.1%` of the fact side, not the fact side itself.
  *
  * Hash positions are `xxhash64(i, key) mod m` for `i < k` —
  * Spark-internal values that never surface in results (the
  * cross-engine-hash rule applies only to emitted values; survivors
  * are exact-verified).
  */
object Bloom {

  /** `m` bits as `m/64` longs; word `p / 64`, bit `p % 64`. */
  final case class Bits(words: Array[Long], mBits: Long, k: Int) {

    /** Codegen'd membership test: AND over the `k` bit probes,
      * expressed as `forall` over the position array so the words
      * literal appears ONCE in the plan (k probes referencing a
      * separate copy each would multiply plan size by k at large m).
      * No false negatives; false positive rate ~0.6^(bits/key)
      * (≈0.1% at 10 bits, k=5).
      */
    def mightContain(key: Column): Column = {
      val wordsLit = typedlit(words.toSeq)
      forall(
        array((0 until k).map(i => pmod(xxhash64(lit(i), key), lit(mBits))): _*),
        p =>
          call_function("shiftright",
            element_at(wordsLit, floor(p / 64).cast("int") + 1),
            pmod(p, lit(64L)).cast("int"))
            .bitwiseAND(lit(1L)) === lit(1L))
    }
  }

  /** Build a filter over the DISTINCT values of `key` in `df`. Runs two
    * tiny jobs at build time (distinct count to size the bitmap, then a
    * distinct-positions collect) — by contract the keyed side is small
    * (an eval suite, a blocklist), which is exactly why its exact form
    * is worth replacing with bits.
    */
  def build(df: DataFrame, key: Column, bitsPerKey: Int = 10, k: Int = 5): Bits = {
    val keys = df.select(key.as("k")).distinct()
    val n = keys.count().max(1)
    // Round up to whole words; cap addressing at Int bit positions
    // times 64 words (far beyond any driver-collectable bitmap).
    val mBits = ((n * bitsPerKey + 63) / 64) * 64
    val words = new Array[Long]((mBits / 64).toInt)
    val posCols = (0 until k).map(i => pmod(xxhash64(lit(i), col("k")), lit(mBits)))
    keys
      .select(explode(array(posCols: _*)).as("p")).distinct()
      .collect()
      .foreach { r =>
        val p = r.getLong(0)
        words((p / 64).toInt) |= (1L << (p % 64))
      }
    Bits(words, mBits, k)
  }
}
