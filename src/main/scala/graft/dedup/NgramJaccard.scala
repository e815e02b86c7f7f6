package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact n-gram Jaccard near-duplicate pairs via an inverted-index join
  * (LLM-pipeline brief). Never all-pairs: candidate pairs are generated
  * only for documents sharing at least one shingle, by self-joining the
  * exploded (id, shingle) index on the shingle key — a shuffle
  * hash-join keyed on shingles, which scales with the number of shared
  * shingles, not |docs|².
  *
  * `maxDf` drops shingles appearing in more than that many documents
  * (stop-shingles) before pairing; this bounds bucket skew at scale at
  * the cost of missing pairs whose only shared shingles are ubiquitous.
  *
  * The DEFAULT is capped (`maxDf = Some(DefaultMaxDf)`): a stop-shingle
  * with document frequency d contributes d² candidate pairs, so the
  * uncapped form has a known blowup on hot shingles at corpus scale —
  * the obvious API must be the scale-safe one. Pass `maxDf = None`
  * explicitly to opt into exhaustive exact Jaccard (e.g. as an oracle
  * baseline on bounded data).
  */
object NgramJaccard {

  /** Default stop-shingle document-frequency cap. At sf0.1 this prunes
    * ~97% of candidate-pair work on the dense test vocabulary while
    * keeping every planted near-dup pair.
    */
  val DefaultMaxDf: Int = 64

  /** Exhaustive exact Jaccard — NO stop-shingle cap. Distinctly named
    * so opting out of the scale guard is visible at the call site: a
    * shingle with document frequency d contributes d² candidate pairs,
    * so this form has a known blowup on hot shingles and is intended
    * for bounded data (oracle baselines, ground-truth evaluation), not
    * production corpora. Note: before round 5, [[pairs]] defaulted to
    * this behavior (`maxDf = None`); callers who relied on that default
    * and need exhaustive results should migrate here.
    */
  def pairsExhaustive(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 2,
      minJaccard: Double = 0.6): DataFrame =
    pairs(docs, idCol, textCol, n, minJaccard, maxDf = None)

  def pairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 2,
      minJaccard: Double = 0.6,
      maxDf: Option[Int] = Some(DefaultMaxDf)): DataFrame = {
    // The shingle key is carried as its 64-bit hash, not the string:
    // every downstream shuffle (df count, the self-join, both join
    // probes) then moves and compares 8-byte longs instead of ~n-word
    // UTF8 strings — less shuffle volume and cheaper key compares in
    // exactly the stages that dominate this operator. Shingles are
    // distinct-per-doc BEFORE hashing, so per-doc sizes are exact; a
    // cross-doc xxhash64 collision could overcount one intersection,
    // with probability ~|distinct shingles|²/2^64 corpus-wide —
    // accepted and documented (the MD5-family cross-engine trick is
    // not needed because hashes never leave the plan).
    val sh = docs
      .select(col(idCol).as("id"), explode(Shingles.shingles(col(textCol), n)).as("s_str"))
      .select(col("id"), xxhash64(col("s_str")).as("s"))
    val index = maxDf match {
      case Some(cap) =>
        val rare = sh.groupBy("s").agg(count(lit(1)).as("df")).where(col("df") <= cap).select("s")
        sh.join(rare, "s")
      case None => sh
    }
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n"))
    val inter = index.as("a")
      .join(index.as("b"), col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("a"), col("b.id").as("b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("sa"), col("a") === col("sa.id"))
      .join(sizes.as("sb"), col("b") === col("sb.id"))
      .select(
        col("a"), col("b"),
        round(col("inter") / (col("sa.n") + col("sb.n") - col("inter")), 4).as("jaccard"))
      .where(col("jaccard") >= minJaccard)
  }
}
