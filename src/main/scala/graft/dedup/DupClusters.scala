package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Store.Materializable

/** Duplicate-cluster resolution: connected components over a near-dup
  * PAIR set (from any dedup family member), labeling every clustered
  * document with the minimum doc id reachable through the pair graph —
  * the canonicalization step that turns pairwise "a ~ b" findings into
  * "keep one document per duplicate cluster". Without it, pairwise
  * dedup keeps one doc per PAIR, which over-deletes on transitive
  * chains (a~b, b~c deletes both b and c even if a!~c was never
  * claimed) or under-deletes depending on order.
  *
  * Spark-first shape: iterative min-label propagation as DataFrame
  * ops — labels start as each node's own id; each round every node
  * takes the min of its own and its neighbors' labels; stop when no
  * label changes. One shuffle join + partial-agg per round, rounds =
  * graph diameter. Near-dup graphs have tiny diameters (clusters are
  * cliques-of-cliques), so this beats the constant-factor-heavy
  * star-contraction algorithms in the common case; `maxIters` bounds
  * the adversarial one, and non-convergence throws rather than
  * returning silently-partial clusters.
  *
  * Scale notes: every shuffle moves (long, long) id pairs only —
  * the same ids-only discipline as the dedup candidate joins; text and
  * vectors never enter the loop. Per round the driver sees a single
  * emptiness check. Each round MUST truncate lineage (the round
  * references the previous labels twice, so the logical plan doubles
  * per iteration without truncation — a plan-size explosion long
  * before any data problem): rounds are materialized via
  * [[graft.Store]] (eager `localCheckpoint` by default, whose blocks
  * the ContextCleaner reclaims as superseded rounds become
  * unreachable; set `spark.graft.store.path` on a long-running
  * cluster job for reliable FS-backed materialization that survives
  * executor loss — the algorithm is unchanged).
  */
object DupClusters {

  /** Resolve clusters from undirected near-dup edges `(aCol, bCol)`.
    * Returns `(id, cluster_id, keep)` for every document appearing in
    * at least one pair: `cluster_id` = minimum reachable id, `keep` =
    * this id IS the cluster minimum (the canonical representative).
    */
  def resolve(pairs: DataFrame, aCol: String, bCol: String, maxIters: Int = 25): DataFrame =
    resolveCounted(pairs, aCol, bCol, maxIters)._1

  /** [[resolve]] plus the propagation-round count it converged in —
    * the scale telemetry for diameter claims (a capped pair graph
    * promises O(log m) resolver rounds; SCALE.md records the measured
    * count next to every blob run).
    */
  def resolveCounted(pairs: DataFrame, aCol: String, bCol: String,
                     maxIters: Int = 25): (DataFrame, Int) = {
    val fwd = pairs.select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
    // materialize the (typically expensive) upstream pair computation
    // ONCE — every propagation round joins against edges, and without
    // this the candidate-pair join would re-execute per round.
    // Pre-partitioned on the probe key (dst): LogicalRDD keeps the
    // checkpoint's output partitioning, so every round's edges⋈labels
    // join reuses it instead of re-exchanging the edge set per round.
    val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst"))).distinct()
      .repartition(col("dst"))
      .materializeOnce()

    // Round 0 fused into initialization: label(v) = min(v, neighbors(v))
    // straight off the edge set — one aggregation, no join.
    var labels = edges.groupBy(col("src"))
      .agg(least(min(col("dst")), col("src")).as("label"))
      .select(col("src").as("id"), col("label"))
      .materializeOnce()
    var converged = false
    var it = 1
    while (!converged && it < maxIters) {
      // TWO propagation rounds fused per action (round 17 — the
      // resolve consumers were action-bound: ~0.3-0.4 s of driver /
      // scheduling latency per round on diameter-bounded graphs, so
      // halving the action count beats the duplicated tiny mid-round
      // subtree, whose exchanges ReuseExchange dedupes anyway). The
      // lazy checkpoint + ONE aggregate materializes the blocks
      // (truncating lineage) and reads BOTH rounds' change counts in
      // the same pass, so round accounting stays exact: propagation is
      // monotone (labels only decrease) and deterministic, so a
      // zero-change round is a fixpoint and the two counts identify
      // which round converged. The only contract shift: a diameter
      // landing exactly on maxIters is now ACCEPTED where the unfused
      // loop threw (the pair always executes its second round) —
      // convergence is still verified, never assumed.
      val nm1 = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(edges("src").as("nid"))
        .agg(min(col("label")).as("nmin"))
      // mid is LAZILY checkpointed, not inlined: the second round's
      // plan references it twice (neighbor-min subtree + join left
      // side), and inlining the subtree fed the optimizer a
      // self-referential 4-join tree that sent InjectRuntimeFilter's
      // per-join lineage scans quadratic — measured as MINUTES of
      // driver planning per action in the chunked-resolve spec. As a
      // lazy localCheckpoint it is one cached-RDD leaf: both consumers
      // read the same blocks (computed once, inside the same single
      // action below), every per-action plan stays small, and lineage
      // truncation is unchanged.
      val mid = labels.join(nm1, labels("id") === nm1("nid"), "left")
        .select(
          labels("id"),
          least(labels("label"), coalesce(col("nmin"), labels("label"))).as("label"),
          labels("label").as("_prev"))
        .materializeOnce(eager = false)
      val nm2 = edges.join(mid, edges("dst") === mid("id"))
        .groupBy(edges("src").as("nid"))
        .agg(min(col("label")).as("nmin"))
      val updated = mid.join(nm2, mid("id") === nm2("nid"), "left")
        .select(
          mid("id"),
          least(mid("label"), coalesce(col("nmin"), mid("label"))).as("label"),
          mid("label").as("_mid"),
          mid("_prev"))
        .materializeOnce(eager = false)
      val ch = updated.agg(
        count(when(col("_mid") =!= col("_prev"), 1)).as("c1"),
        count(when(col("label") =!= col("_mid"), 1)).as("c2")).head()
      if (ch.getLong(0) == 0) { converged = true; it += 1 }
      else if (ch.getLong(1) == 0) { converged = true; it += 2 }
      else it += 2
      labels = updated.select("id", "label")
    }
    require(converged, s"label propagation did not converge within $maxIters rounds " +
      "(pathological pair-graph diameter — raise maxIters)")
    (labels.select(col("id"), col("label").as("cluster_id"), (col("id") === col("label")).as("keep")),
      it)
  }

  /** [[resolve]] over an edge set delivered in CHUNKS — the streamed
    * protocol for pair volumes that cannot be held live at once
    * (e.g. the 16-table LSH pair union at 100×, whose monolithic
    * probe hit a single-box memory ceiling): each chunk's edges fold
    * into the running min-label connectivity before the next chunk
    * generates, so peak live volume is ONE chunk plus one (id, label)
    * row per clustered id.
    *
    * Correct because connected components distribute over edge-set
    * union: collapsing the processed prefix to its star edges
    * (id → cluster min) preserves exactly its connectivity, so
    * resolving `chunk ∪ stars(prefix)` yields the components of
    * `chunk ∪ prefix` (spec-pinned equal to the monolithic
    * [[resolve]] label-for-label). Chunks are thunks, forced one at a
    * time — pass `() => pairs.materializeOnce()` shapes if the chunk
    * is also consumed for volume accounting.
    *
    * Returns the final `(id, cluster_id, keep)` labels plus the MAX
    * per-chunk propagation round count (each fold's diameter bound —
    * the star edges keep prior components at diameter ≤ 2, so rounds
    * stay bounded by the NEW chunk's structure, not the accumulated
    * graph's).
    */
  def resolveChunked(chunks: Seq[() => DataFrame], aCol: String, bCol: String,
                     maxIters: Int = 25): (DataFrame, Int) = {
    var labels: DataFrame = null
    var maxRounds = 0
    chunks.foreach { mk =>
      val chunk = mk().select(col(aCol).cast("long").as(aCol), col(bCol).cast("long").as(bCol))
      val edges =
        if (labels == null) chunk
        else chunk.unionByName(
          labels.where(col("id") =!= col("cluster_id"))
            .select(col("id").as(aCol), col("cluster_id").as(bCol)))
      val (res, rounds) = resolveCounted(edges, aCol, bCol, maxIters)
      labels = res
      maxRounds = math.max(maxRounds, rounds)
    }
    require(labels != null, "resolveChunked needs at least one chunk")
    (labels, maxRounds)
  }
}
