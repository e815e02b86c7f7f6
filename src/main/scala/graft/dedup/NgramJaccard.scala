package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Store.Materializable
import graft.functions.IntersectCount

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

  /** Exhaustive exact Jaccard — NO stop-shingle cap, accelerated by
    * PREFIX FILTERING (the AllPairs/PPJoin family, Bayardo et al.
    * WWW'07): identical output to the naive inverted-index join, far
    * fewer candidate pairs.
    *
    * Why it is exact: order all shingles by one global canonical order
    * (ascending document frequency, ties by hash — rarest first). For a
    * doc with `m` distinct shingles, its PREFIX is the first
    * `m - ceil(t*m) + 1` shingles in that order. Any pair with Jaccard
    * ≥ t has intersection i ≥ t*max(|A|,|B|), and the globally-smallest
    * shared shingle has rank ≤ (|A| - i) + 1 ≤ prefix(A) within A (and
    * symmetrically within B) — so every qualifying pair shares at least
    * one shingle lying in BOTH prefixes, and joining prefixes only
    * misses nothing. Hot stop-shingles sort LAST, so they drop out of
    * prefixes and their df² candidate blowup never happens; that is the
    * entire speedup, with zero recall cost.
    *
    * Shape at scale: one df count (partial agg), then ONE grouped pass
    * by doc building the df-sorted shingle-hash array per document —
    * materialized once (the "set store", same [[graft.Store]]
    * discipline as MinHash's signature store) and reused three times:
    * the prefix explode and both sides of the exact verification. The
    * prefix-only self-join moves (id, hash, size) rows; candidate
    * verification joins the per-doc hash arrays back onto the
    * (distinct) candidate pairs — payload arrays ride only candidate
    * joins, the same discipline as the cosine family. A length filter
    * (t·|A| ≤ |B| ≤ |A|/t) prunes candidates before the distinct.
    *
    * The threshold used for pruning is relaxed by half an ulp of the
    * 4-decimal rounding (t - 5e-5) so pairs that only reach t after
    * rounding are still found — the emitted filter is unchanged.
    */
  def pairsExhaustive(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 2,
      minJaccard: Double = 0.6): DataFrame = {
    val tEff = minJaccard - 0.00005 // absorb round(j, 4) at the emitted filter
    // spread under-partitioned inputs before the shingle explode (a
    // single-row-group corpus file otherwise pins shingling, df counts'
    // map side and the set-store build to one task); docSets sorts its
    // arrays, so collect order — hence partitioning — cannot change it
    val sh = graft.Spread.toCores(docs, col(idCol))
      .select(col(idCol).as("id"), explode(Shingles.hashedShingles(col(textCol), n)).as("s"))
    val dfCounts = sh.groupBy("s").agg(count(lit(1)).as("df"))
    // per-doc shingle hashes sorted by the global (df, hash) canonical
    // order — built once, reused by the prefix explode and both verify
    // probes (without the checkpoint this grouped pass would re-execute
    // for each of its three plan occurrences)
    val docSets = sh.join(dfCounts, "s")
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("df"), col("s")))).as("arr"))
      .select(
        col("id"),
        transform(col("arr"), x => x.getField("s")).as("set"),
        size(col("arr")).as("m"))
      .materializeOnce()
    val prefix = docSets.select(
      col("id"), col("m"),
      posexplode(slice(col("set"), lit(1),
        (col("m") - ceil(lit(tEff) * col("m")) + 1).cast("int"))))
      .select(col("id"), col("m"), col("pos").as("rk"), col("col").as("s"))
    // positional filter (PPJoin, Xiao et al. WWW'08): matched via a
    // shingle at 0-based prefix positions (ra, rb), the overlap can't
    // exceed min(|A|-ra, |B|-rb); a qualifying pair's FIRST shared
    // shingle always passes this bound (all shared shingles rank at or
    // after it on both sides), so per-row pruning before the distinct
    // loses no pair — it only stops late-prefix collisions from
    // generating candidate rows
    val minOverlap = lit(tEff / (1 + tEff)) * (col("a.m") + col("b.m"))
    val cand = prefix.as("a")
      .join(prefix.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id") &&
          col("a.m") >= lit(tEff) * col("b.m") && col("b.m") >= lit(tEff) * col("a.m") &&
          least(col("a.m") - col("a.rk"), col("b.m") - col("b.rk")) >= minOverlap)
      .select(col("a.id").as("a"), col("b.id").as("b"))
      .distinct()
    cand
      .join(docSets.select(col("id"), col("set").as("sa"), col("m").as("na")), col("a") === col("id")).drop("id")
      .join(docSets.select(col("id"), col("set").as("sb"), col("m").as("nb")), col("b") === col("id")).drop("id")
      .select(col("a"), col("b"),
        IntersectCount(col("sa"), col("sb")).as("inter"),
        col("na"), col("nb"))
      .select(
        col("a"), col("b"),
        round(col("inter") / (col("na") + col("nb") - col("inter")), 4).as("jaccard"))
      .where(col("jaccard") >= minJaccard)
  }

  /** Directed shingle-containment pairs: emits (a, b, containment)
    * where `containment = |A∩B| / |A| ≥ t` — "a is (near-)contained in
    * b". Jaccard misses subsumption (a short doc fully quoted inside a
    * long one scores low symmetric overlap), so containment is the
    * dedup signal for page-with-chrome vs body, quote inclusion, and
    * partial scrapes.
    *
    * PREFIX-FILTERED on the probe side (the containment member of the
    * AllPairs/PPJoin family): with shingles in the global rarest-first
    * canonical order, a qualifying direction a→b needs
    * i ≥ ⌈t·|A|⌉ shared shingles, so a's globally-smallest shared
    * shingle sits within its first mᶜ − ⌈t·|A|⌉ + 1 entries — only
    * that PREFIX of the probe doc joins the (full) index, and the
    * positional bound min(mᶜₐ−rₐ, mᶜᵦ−rᵦ) ≥ t·|A| prunes late-prefix
    * collisions row-wise (the first shared shingle always passes, so
    * recall cost is zero — equivalence vs [[containmentPairs]] is
    * spec-tested). Containment admits NO Jaccard-style length filter
    * (a tiny doc sits inside any huge one — size ratio prunes
    * nothing), so prefix + positional filtering is what bounds the
    * candidate volume: Σ dfₚᵣₑ(s)·df(s), never Σ df², with hot
    * shingles sorting OUT of prefixes entirely. `maxDf` additionally
    * caps the index (intersections then count capped shingles only —
    * mirrored in the oracle); |A| in the ratio is always the true
    * UNCAPPED size.
    *
    * Both directions fall out of the same probe-side explode (every
    * doc is probe once and target in the full index once); the doc-set
    * store is materialized once and reused by prefix, index, and both
    * verify probes, the [[pairsExhaustive]] discipline.
    */
  def containmentPairsPrefix(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      minContainment: Double = 0.8,
      maxDf: Option[Int] = Some(DefaultMaxDf)): DataFrame = {
    val tEff = minContainment - 0.00005 // absorb round(c, 4) at the emitted filter
    val sh = graft.Spread.toCores(docs, col(idCol)) // single-row-group inputs: parallelize the explode
      .select(col(idCol).as("id"), explode(Shingles.hashedShingles(col(textCol), n)).as("s"))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("nfull"))
    val capped = maxDf match {
      case Some(cap) =>
        val rare = sh.groupBy("s").agg(count(lit(1)).as("df")).where(col("df") <= cap).select("s")
        sh.join(rare, "s")
      case None => sh
    }
    val dfCounts = capped.groupBy("s").agg(count(lit(1)).as("df"))
    val docSets = capped.join(dfCounts, "s")
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("df"), col("s")))).as("arr"))
      .select(col("id"), transform(col("arr"), x => x.getField("s")).as("set"),
        size(col("arr")).as("mc"))
      .join(sizes, "id")
      .materializeOnce()
    // probe prefix: the first mc - ceil(t*nfull) + 1 canonical shingles
    // (empty when mc < t*nfull — such a doc can never reach the bound)
    val prefix = docSets.select(
      col("id"), col("mc"), col("nfull"),
      posexplode(slice(col("set"), lit(1),
        greatest(lit(0), (col("mc") - ceil(lit(tEff) * col("nfull")) + 1).cast("int")))))
      .select(col("id"), col("mc"), col("nfull"), col("pos").as("rk"), col("col").as("s"))
    val full = docSets.select(col("id").as("bid"), col("mc").as("bmc"), posexplode(col("set")))
      .select(col("bid"), col("bmc"), col("pos").as("brk"), col("col").as("s"))
    val cand = prefix.join(full,
        prefix("s") === full("s") && col("id") =!= col("bid") &&
          least(col("mc") - col("rk"), col("bmc") - col("brk")) >= lit(tEff) * col("nfull"))
      .select(col("id").as("a"), col("bid").as("b"))
      .distinct()
    cand
      .join(docSets.select(col("id"), col("set").as("sa"), col("nfull").as("na")), col("a") === col("id")).drop("id")
      .join(docSets.select(col("id"), col("set").as("sb")), col("b") === col("id")).drop("id")
      .select(col("a"), col("b"),
        round(IntersectCount(col("sa"), col("sb")) / col("na"), 4).as("containment"))
      .where(col("containment") >= minContainment)
  }

  /** Capped inverted-index containment join — the DEFAULT containment
    * operator: candidate volume is Σ df² over CAP-BOUNDED dfs, i.e. at
    * most `maxDf · Σ df` — linear in corpus shingles with the cap as
    * the constant — which on real (Zipfian) corpora is what makes the
    * join affordable; intersection counts see capped shingles only,
    * |A| in the ratio is always the true uncapped size, and both
    * directions derive from ONE undirected join (materialized once —
    * both union branches read the checkpoint, not the join subtree).
    * Containment admits NO Jaccard-style length filter (a tiny doc
    * sits inside any huge one), so the cap carries the whole scale
    * load here; [[containmentPairsPrefix]] is the zero-recall-cost
    * exhaustive alternative (equivalence spec-tested against this
    * one) for when the cap's documented recall cost is unacceptable.
    */
  def containmentPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      minContainment: Double = 0.8,
      maxDf: Option[Int] = Some(DefaultMaxDf)): DataFrame = {
    val sh = graft.Spread.toCores(docs, col(idCol)) // single-row-group inputs: parallelize the explode
      .select(col(idCol).as("id"), explode(Shingles.hashedShingles(col(textCol), n)).as("s"))
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
      .join(sizes.as("sa"), col("a") === col("sa.id"))
      .join(sizes.as("sb"), col("b") === col("sb.id"))
      .select(col("a"), col("b"), col("inter"), col("sa.n").as("na"), col("sb.n").as("nb"))
      .materializeOnce()
    inter.select(col("a"), col("b"), round(col("inter") / col("na"), 4).as("containment"))
      .unionByName(
        inter.select(col("b").as("a"), col("a").as("b"),
          round(col("inter") / col("nb"), 4).as("containment")))
      .where(col("containment") >= minContainment)
  }

  /** Capped (default) or naive-uncapped inverted-index Jaccard join.
    * `maxDf = None` is the NAIVE exhaustive join — it exists as the
    * straight-line reference implementation that [[pairsExhaustive]]'s
    * prefix-filtered plan is equivalence-tested against; production
    * exhaustive callers should use [[pairsExhaustive]].
    */
  def pairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 2,
      minJaccard: Double = 0.6,
      maxDf: Option[Int] = Some(DefaultMaxDf)): DataFrame = {
    // The shingle key is carried as its 64-bit hash, not the string
    // (computed in one native pass by ShingleHashes): every downstream
    // shuffle (df count, the self-join, both join probes) then moves
    // and compares 8-byte longs instead of ~n-word UTF8 strings — less
    // shuffle volume and cheaper key compares in exactly the stages
    // that dominate this operator. Shingles are distinct-per-doc
    // BEFORE hashing, so per-doc sizes are exact; a cross-doc xxhash64
    // collision could overcount one intersection, with probability
    // ~|distinct shingles|²/2^64 corpus-wide — accepted and documented
    // (the MD5-family cross-engine trick is not needed because hashes
    // never leave the plan).
    val sh = graft.Spread.toCores(docs, col(idCol)) // single-row-group inputs: parallelize the explode
      .select(col(idCol).as("id"), explode(Shingles.hashedShingles(col(textCol), n)).as("s"))
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
