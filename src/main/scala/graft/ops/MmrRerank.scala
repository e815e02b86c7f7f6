package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Store.Materializable
import graft.sim.Cosine

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
  * SIGIR'98) — the diversification stage a RAG retrieval pipeline runs
  * between ANN shortlist and prompt assembly: pure top-k by similarity
  * returns k near-copies of the same passage; MMR picks items one at a
  * time maximizing `λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s)`, so
  * each pick is relevant AND far from what is already in the context
  * window.
  *
  * Spark shape: the selection loop looks sequential, but its depth is
  * `k` (a constant, 3-10 in practice) while its breadth is every query
  * at once — so the rounds UNROLL into the plan as k window/join
  * stages, each processing all queries in parallel. All relations are
  * shortlist-bounded: candidate pairwise similarities are one
  * qid-keyed self-join (shortlist² rows PER QUERY, shortlist is a
  * constant ≤64 — never corpus²), per-round winners are queries-sized
  * and materialized once so round r+1 does not re-derive rounds 1..r.
  * No UDF, no driver-side loop over rows, no collect.
  *
  * Determinism: every argmax breaks ties by (score desc, id asc), so
  * reruns and the DuckDB oracle (the same rounds as chained CTEs)
  * agree exactly; scores are rounded only at the output boundary.
  *
  * @param shortlist (q, id, rel) — per-query candidates with their
  *                  relevance (e.g. cosine from [[graft.sim.Knn.topK]])
  * @param vectors   (id, vec array<double>) — embeddings for the
  *                  candidate ids (corpus table; only shortlist ids
  *                  survive the join). Every shortlist id MUST have a
  *                  row here: a missing one fails the job with a
  *                  descriptive error rather than silently shrinking
  *                  the candidate pool below k
  * @param k         items to select per query
  * @param lambda    relevance weight in [0, 1]; 1 = plain top-k,
  *                  0 = pure diversity
  */
object MmrRerank {

  def rerank(
      shortlist: DataFrame,
      vectors: DataFrame,
      k: Int,
      lambda: Double): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(lambda >= 0 && lambda <= 1, s"lambda must be in [0,1]: $lambda")
    // candidates with vec+norm attached — shortlist-sized; the join
    // prunes `vectors` to shortlist ids (broadcast when small, shuffle
    // hash at corpus scale — no forced hint). Left join + in-plan
    // raise_error: a shortlist id with no embedding row would silently
    // shrink the candidate pool (and possibly the result below k), so
    // it fails loudly instead — zero cost when the tables agree.
    val cand = shortlist.select(col("q"), col("id"), col("rel"))
      .join(vectors.select(col("id"),
        col("vec"), sqrt(Cosine.dot(col("vec"), col("vec"))).as("nrm")),
        Seq("id"), "left")
      .withColumn("nrm", when(col("vec").isNull,
          raise_error(concat(lit("MmrRerank: shortlist id "),
            col("id").cast("string"), lit(" has no row in vectors"))))
        .otherwise(col("nrm")))
      .materializeOnce()
    // pairwise candidate similarity within each query's shortlist:
    // the qid-keyed self-join is the op's ONLY quadratic relation and
    // it is quadratic in the constant shortlist size, not the corpus
    val pair = cand.select(col("q"), col("id").as("a"), col("vec").as("va"), col("nrm").as("na"))
      .join(cand.select(col("q"), col("id").as("b"), col("vec").as("vb"), col("nrm").as("nb")), "q")
      .where(col("a") =!= col("b"))
      .select(col("q"), col("a"), col("b"),
        (Cosine.dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("psim"))
      .materializeOnce()

    val byScore = (score: Column) => Window.partitionBy(col("q"))
      .orderBy(score.desc, col("id"))
    // round 1: pure relevance argmax per query
    var selected = cand
      .withColumn("_r", row_number().over(byScore(col("rel"))))
      .where(col("_r") === 1)
      .select(col("q"), col("id"), col("rel").as("score"), lit(1).as("rank"))
      .materializeOnce()
    var r = 2
    while (r <= k) {
      // remaining candidates score λ·rel − (1−λ)·max psim to the
      // selected set; every remaining candidate pairs with every
      // selected one (both sides come from the same shortlist), so the
      // inner join is total
      val maxToSel = pair
        .join(selected.select(col("q"), col("id").as("b")), Seq("q", "b"))
        .groupBy(col("q"), col("a").as("id"))
        .agg(max(col("psim")).as("max_psim"))
      val winners = cand
        .join(selected.select(col("q"), col("id")), Seq("q", "id"), "left_anti")
        .join(maxToSel, Seq("q", "id"))
        .withColumn("_score", lit(lambda) * col("rel") - lit(1 - lambda) * col("max_psim"))
        .withColumn("_r", row_number().over(byScore(col("_score"))))
        .where(col("_r") === 1)
        .select(col("q"), col("id"), col("_score").as("score"), lit(r).as("rank"))
      selected = selected.unionByName(winners).materializeOnce()
      r += 1
    }
    selected.select(col("q"), col("id"), round(col("score"), 4).as("score"), col("rank"))
  }
}
