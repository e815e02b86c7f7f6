package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Integer fixed-point PageRank over an edge list — the link-graph
  * quality signal web-corpus curation ranks domains by (Common Crawl
  * publishes host/domain-level ranks; C4-style pipelines filter on
  * them). No reference anchor (beyond log2ck); brief anchor: the
  * per-domain web family (SURVEY §2 B113/114).
  *
  * All arithmetic is BIGINT fixed-point (ranks in millionths, damping
  * 0.85 as `(85 * x) DIV 100`, contributions as `rank DIV outdeg`), so
  * every iteration is engine-exact — float PageRank sums in
  * partition-dependent order and cannot be value-oracled bit-for-bit;
  * integer truncation makes the whole trajectory deterministic on any
  * engine at the cost of ≤1 millionth per edge per step (nothing at
  * ranking granularity). Dangling nodes (no out-edges) leak their mass
  * — the standard simplification; ranks are a relative ordering, not a
  * distribution.
  *
  * Scale shape: edges/nodes/out-degrees materialize ONCE (eager
  * localCheckpoint — the signature-store discipline; they feed every
  * iteration), then each iteration is one edges-keyed join + one
  * node-keyed partial agg — shuffles carry (node, bigint) pairs only.
  * Iterations chain lazily (fine at the handful a ranking needs; a
  * hundred-iteration run would checkpoint per round, the DupClusters
  * pattern).
  */
object PageRank {

  val Scale = 1000000L // rank unit: millionths

  /** (node, rank) after `iters` damped iterations from a uniform
    * start. `edges` needs (src, dst) columns; self-loops and duplicate
    * edges are dropped.
    */
  def ranks(edges: DataFrame, iters: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(true)
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
      .localCheckpoint(true)

    var ranks = nodes.withColumn("rank", lit(Scale))
    var it = 0
    while (it < iters) {
      val inc = e
        .join(ranks, e("src") === ranks("node"))
        .join(outdeg, "src")
        .select(col("dst").as("node"), expr("rank DIV outdeg").as("c"))
        .groupBy("node")
        .agg(sum(col("c")).as("inc"))
      ranks = nodes.join(inc, Seq("node"), "left")
        .select(col("node"),
          (lit(Scale * 15 / 100) +
            expr(s"(85 * coalesce(inc, CAST(0 AS BIGINT))) DIV 100")).as("rank"))
      it += 1
    }
    ranks
  }
}
