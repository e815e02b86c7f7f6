package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end composition: the operators are not isolated demos — a
  * user runs the whole pretraining-corpus pipeline by chaining them.
  * This spec drives the canonical chain on real testdata and asserts
  * the cross-stage invariants that matter to the final training set:
  *
  *   quality gate → near-dup pairs → cluster canonicalization →
  *   keep-one-per-cluster → deterministic shuffle → sequence packing
  */
class PipelineSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("corpus pipeline: gate -> dedup -> keep-one -> shuffle -> pack, invariants hold") {
    val docs = Tables(spark, TestSpark.SfDir, "documents")
    val total = docs.count()

    // 1. row-local quality gate (the same predicate the streaming
    //    ingest path composes into TailConfig.transform)
    val kept = docs.where(graft.text.TextStats.qualityPredicate(col("text")))
    val nKept = kept.count()
    assert(nKept > 0 && nKept <= total)

    // 2. near-dup pairs on the gated corpus, canonicalized to clusters;
    //    drop every non-canonical member
    val pairs = graft.dedup.MinHashLSH.pairs(kept, "doc_id", "text")
    val clusters = graft.dedup.DupClusters.resolve(pairs, "a", "b")
    val drop = clusters.where(!col("keep")).select(col("id").as("doc_id"))
    val nDrop = drop.count()
    val canonical = kept.join(drop, Seq("doc_id"), "left_anti")
    assert(canonical.count() == nKept - nDrop, "keep-one must drop exactly the non-canonical members")
    // every cluster retains exactly its minimum id
    val keepers = clusters.where(col("keep")).select("id").as[Long].collect().toSet
    val canonicalIds = canonical.select("doc_id").as[Long].collect().toSet
    assert(keepers.subsetOf(canonicalIds), "cluster keepers must survive the anti-join")

    // 3. deterministic shuffle then packing: every surviving document
    //    lands in the token stream exactly once, contiguously
    val shuffled = graft.data.Sampling.deterministicShuffle(canonical, "doc_id")
    assert(shuffled.count() == canonical.count())
    val sized = canonical.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val packed = graft.data.Packing.packChunks(sized, "doc_id", "n_tokens", capacity = 256)
    val rows = packed.select("doc_id", "n_tokens", "start_offset")
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    assert(rows.length == canonical.count().toInt, "packing must keep every canonical doc")
    rows.sliding(2).foreach {
      case Array((_, n, s), (_, _, s2)) => assert(s2 == s + n, "token stream must be gapless")
      case _ =>
    }
    assert(rows.map(_._1).toSet == canonicalIds, "packed ids == canonical ids")

    // 4. the pipeline is reproducible end to end: rerunning yields the
    //    identical packed layout (the property that makes a 100 TB
    //    rebuild auditable)
    val again = graft.data.Packing.packChunks(sized, "doc_id", "n_tokens", capacity = 256)
      .select("doc_id", "start_offset").as[(Long, Long)].collect().toMap
    assert(rows.map(r => r._1 -> r._3).toMap == again)
  }
}
