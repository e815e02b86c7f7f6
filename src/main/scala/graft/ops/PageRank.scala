package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Store.Materializable

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
  * ranking granularity). Dangling nodes (no out-edges) do NOT leak
  * their mass: each iteration folds Σ rank(dangling) back uniformly —
  * every node receives `danglingMass DIV n` before damping, the
  * standard correction, in the same exact integer arithmetic (the
  * truncation discards < n millionths per round).
  *
  * Scale shape: edges/nodes/out-degrees materialize ONCE
  * ([[graft.Store]] — the signature-store discipline; they feed every
  * iteration), then each iteration is one edges-keyed join + one
  * node-keyed partial agg — shuffles carry (node, bigint) pairs only.
  * Each round's ranks are materialized through the same store (they
  * feed both the dangling-mass scalar and the contribution join, and
  * truncation keeps the plan linear instead of doubling per round —
  * the DupClusters pattern); the dangling mass itself is a 1-row
  * driver scalar per round, stats-sized by the repo's collect
  * discipline.
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
      .materializeOnce()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .materializeOnce()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
      .materializeOnce()
    val nNodes = nodes.count() // bounded scalar; also warms the stores

    var ranks = nodes.withColumn("rank", lit(Scale))
    var it = 0
    while (it < iters && nNodes > 0) {
      val r = ranks.materializeOnce() // consumed twice: dangling scalar + contribution join
      val dmRow = r.join(outdeg, r("node") === outdeg("src"), "left_anti")
        .agg(sum(col("rank"))).head()
      val share = (if (dmRow.isNullAt(0)) 0L else dmRow.getLong(0)) / nNodes
      val inc = e
        .join(r, e("src") === r("node"))
        .join(outdeg, "src")
        .select(col("dst").as("node"), expr("rank DIV outdeg").as("c"))
        .groupBy("node")
        .agg(sum(col("c")).as("inc"))
      ranks = nodes.join(inc, Seq("node"), "left")
        .select(col("node"),
          (lit(Scale * 15 / 100) +
            expr(s"(85 * (coalesce(inc, CAST(0 AS BIGINT)) + CAST($share AS BIGINT))) DIV 100")).as("rank"))
      it += 1
    }
    ranks
  }
}
