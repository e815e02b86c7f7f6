package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dumps `explain("formatted")` for the headline queries into PLANS.md
  * — the per-operator plan audit (shuffle count, broadcast choices,
  * pushdown) that backs SURVEY.md §5's scale claims.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("PLANS.md")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val interesting = Seq(
      "parse_monolog" -> "map-only parse: scan -> project (one regex exec) -> filter; the only exchange is the final ORDER BY required by the correctness gate",
      "q1_agg" -> "pushed date filter at the scan, partial agg before the single exchange",
      "q5_join" -> "all dimension sides broadcast; one shuffle for the fact join + one for the agg",
      "dedup_minhash" -> "explode -> hash-aggregate signatures -> band explode -> bucket shuffle join; no cartesian",
      "dedup_cosine" -> "LSH candidates + exact verify (32 tables): id-only bucket join, no BroadcastNestedLoopJoin (the n2 ground truth lives only in DedupSpec)",
      "dedup_cosine_lsh" -> "id-only bucket join, pair dedup, vectors joined back (auto-broadcast at this size)",
      "dedup_ngram_jaccard_capped" -> "df-capped inverted index: stop-shingles pruned before the pair join bounds the df2 blowup",
      "ann_bruteforce" -> "probe batch inlined as a literal exploded array: Generate over the corpus scan, no join operator at all",
      "ann_lsh" -> "bucket probe join on ids, exact rerank over candidates only",
      "sessionize" -> "single shuffle on user_id reused by window and aggregate",
      "windowed_counts" -> "window() bucketing folded into the grouping key; partial agg before the exchange",
      "rollup_counts" -> "Expand over grouping sets feeding one partial-agg + exchange pair",
      "topk_custom" -> "custom two-phase TopKPerKey: partial heap cap before the exchange; the global merge demands key-sorted input (spillable Sort) and streams groups through one k-heap",
      "text_repetition" -> "row-local DistinctBigrams codegen loop (no HOF chain); the only exchange is the gate ORDER BY",
      "multimodal_headers" -> "header synthesis and byte-walk decode are each a row-local map; no exchange except the gate ORDER BY",
      "asof_last_order" -> "tagged union + carry-forward window: one shuffle on the key, no inequality join",
      "range_join_bands" -> "bucketized interval join planned as a broadcast equi hash join + exact filter",
      "sample_weighted" -> "weighted top-k planned as TakeOrderedAndProject: bounded k-row heap per partition + k-row driver merge, NO global sort exchange",
      "dedup_paragraphs" -> "one content-keyed exchange for first-occurrence windows (per-paragraph partial sorts, no pair join anywhere), one doc-keyed exchange for ordered reassembly",
      "text_unigram_nll" -> "token-keyed scoring join with the frequency side auto-broadcast; the corpus total is a collected literal, so no constant-key join anywhere",
      "decontaminate_bloom" -> "bloom bitmap literal probed by codegen'd bit arithmetic in a row-local Filter over the shingles; only survivors reach the (broadcast) exact-verify join",
      "vocab_topk" -> "token-frequency partial agg + TakeOrderedAndProject bounded heaps; rank/coverage window runs over the K survivors in one driver-sized partition",
      "approx_topk" -> "freq_topk TypedImperativeAggregate: capacity-bounded Misra-Gries partials ride the standard partial-agg machinery - no item-keyed shuffle, no cardinality-sized hash map",
      "correlate_req_resp" -> "batch form of the stream-stream interval join (watermark nodes eliminated): key equi-join + event-time range filter, no inequality-pair explosion",
      "correlate_timeouts" -> "left-outer interval join: unmatched requests survive as null-padded rows; same equi-join + range-filter shape as the inner form",
      "dedup_ngram_jaccard" -> "prefix-filtered exact Jaccard (AllPairs): df-sorted per-doc set store built once (checkpointed), prefix-only self-join on 8-byte hashes, exact array_intersect verify on the distinct candidates",
      "dedup_semantic" -> "k-means cell assignment is a row-local map over a literal centroid array; within-cell id-only candidate join; vectors join back for the exact-cosine verify",
      "bm25_search" -> "stats collected as literals (N, avgdl, per-term dfs); scoring is one row-local scan, no join; top-k is TakeOrderedAndProject",
      "bpe_merges" -> "word-frequency partial agg, pair explode over the DISTINCT-WORD table only, pair partial agg, TakeOrderedAndProject top-k",
      "chunk_overlap" -> "entirely row-local window slicing (Generate over the scan); the only exchange is the gate ORDER BY",
      "text_entropy" -> "native byte_entropy codegen expression: one generated histogram+log pass per row, no shuffle but the gate ORDER BY",
      "doc_keywords" -> "(doc,term) partial agg; vocab-sized df side broadcasts back; per-doc rank window bounded by terms-per-doc",
      "embed_texts" -> "mapPartitions batched-inference stage: one pass, zero shuffles before the gate ORDER BY",
      "rate_anomaly" -> "partial-agg hourly bucketing; the EWMA fold shuffles pre-bucketed counts by key, never raw events",
      "funnel_levels" -> "step-filtered scan -> ONE user-keyed partial-agg shuffle of 12-byte (ts, step) pairs -> row-local windowFunnel DP fold (built-in HOFs, O(steps) state)",
      "zorder_scan" -> "morton interleave is five shift/AND builtins per dim inside the write projection; the read side scans ONLY the zone-surviving files (file-list pruning happens before the plan exists)",
      "text_bigram_nll" -> "bigram explode feeds BOTH the frequency partial-agg and the scoring side; token-keyed joins auto-broadcast at vocab scale; V is a collected literal",
      "scd2_history" -> "both windows and the grouped agg share ONE user-keyed sort exchange (lag-change running sum -> island agg -> lead)",
      "retention_cohorts" -> "cohort min-agg and activity distinct share the user key; one shuffle join + one grouped count, all partial-agg shapes",
      "dedup_containment" -> "capped inverted-index containment: stop-shingle cap bounds candidates at maxDf * corpus-shingles; ONE undirected pair join materialized (checkpoint), both directions read it",
      "knn_classify" -> "literal-probe Generate over one corpus pass (no join operator); vote tail is a tiny aggregate joined back to labels with the small side broadcast",
      "shard_balance" -> "range-sort by size + RDD zipWithIndex for the global rank (never a single-partition window); serpentine shard arithmetic is row-local",
      "pivot_daily_events" -> "conditional when/sum aggregates: ONE partial-agg pass emits every pivot column, no values-discovery job",
      "quality_adaptive" -> "one exchange on the source key; per-source percent_rank window sorts shard-locally",
      "table_stats" -> "all five columns' nulls/HLL-ndv/min/max in ONE scan's partial agg; stack() unpivot runs on the 1-row result",
      "data_quality_audit" -> "range rules fold into one conditional-agg scan per table; referential rules are LEFT ANTI joins with the dim side broadcast",
      "snapshot_diff" -> "FULL OUTER key join (single shuffle, co-locatable when snapshots are bucketed) + grouped classification counts",
      "pmi_collocations" -> "ONE corpus scan: the pair-count exchange is materialized once and ReusedExchange feeds both unigram marginals (AQE stage reuse; kept identical by an explicit null pre-filter); N rides the vocab-sized marginal as a bounded window; top-k is TakeOrderedAndProject",
      "fuzzy_join_names" -> "PassJoin segment index: equi hash join on (segment, substring) keys, bounded levenshtein verify — no cartesian anywhere",
      "basket_pairs" -> "within-order pair self-join: both sides shuffle on the order key, candidate volume bounded by basket size; top-k is TakeOrderedAndProject",
      "winsorize_bounds" -> "groups-sized percentile bounds broadcast back onto the fact scan; tail counts are conditional partial aggs",
      "log_templates" -> "row-local digit masking over the parse pipeline's output; one partial-agg shuffle on (level, template)",
      "gapfill_series" -> "sequence() spine explode LEFT-joined with the sparse aggregate on the same (key, bucket) pair",
      "approx_overlap" -> "three HLL sketches (A, B, union) in ONE conditional-agg scan; inclusion-exclusion is driver-side arithmetic on the 1-row result",
      "hybrid_search" -> "both retrievals are k-bounded BEFORE the fusion join, so the outer join + rank windows run on k-sized inputs; corpus-scaled work is exactly the two underlying retrievals",
      "concurrency_peak" -> "distributed two-phase prefix sum: day-partitioned within-day running windows + a days-sized carry window — the global running sum never plans a single-partition window over events",
      "histogram_equidepth" -> "two passes: percentile boundaries collected as 7 doubles, then one row-local CASE counting scan — no join",
      "ab_experiment" -> "one user-keyed distinct-agg shuffle collapses events to (arm, converted); the z statistic is one conditional-agg row + row-local arithmetic",
      "source_keyness" -> "term-keyed conditional-sum partial agg; token totals are collected scalars; scoring row-local; top-k is TakeOrderedAndProject",
      "skew_profile" -> "per-key partial-agg counts; total/ndv reduced FROM the counts (no second scan); TakeOrderedAndProject top-k",
      "cluster_best" -> "label-propagation clusters joined to row-local quality scores; the winner falls out of one cluster-keyed rank window",
      "fd_profile" -> "each candidate FD is one lhs-keyed distinct-expansion partial agg reduced to two counts; candidates union into one result",
      "normalize_zscore" -> "groups-sized mu/sigma broadcast back onto the event scan; the rewrite itself is row-local",
      "embedding_qa" -> "row-local ArrayDot norm kernel (codegen'd single loop); one partial-agg label rollup",
      "source_overlap" -> "distinct (source, gram) inverted index with a df cap; ONE self-equi-join on the gram — pair work bounded per gram",
      "time_to_convert" -> "two user-keyed partial aggs co-partitioned on the join; percentile groups are week-cardinality",
      "stickiness_ratio" -> "trailing 7-day distinct via a fixed 7x explode — no range join, no BNLJ; the final DAU-WAU join is day-keyed and days-sized",
      "ann_pq" -> "ADC scoring is one pass over the coded corpus (codes + query LUTs are literals — no join); exact re-rank joins the broadcast shortlist back by id",
      "text_scripts" -> "row-local regexp-class counting; the only exchange is the gate ORDER BY",
      "curriculum_order" -> "two range-sort + zipWithIndex passes (phase rank, then final position) — never a single-partition ntile window",
      "chat_validate" -> "one conversation-keyed exchange shared by the lag window and the grouped report",
      "q18_big_orders" -> "HAVING survivors broadcast into a LEFT SEMI join; the only corpus-sized shuffle is the l_orderkey partial agg",
      "calibration_bins" -> "10 fixed bins in one conditional partial-agg pass; no join",
      "kappa_agreement" -> "single conditional-agg scan to a 1-row contingency; kappa is row-local arithmetic",
      "ann_ivfpq" -> "coded (id, cell, codes) index in one row-local pass; probe cells join as a broadcast literal relation; ADC lookups + broadcast shortlist re-rank — corpus touched only in the probed cells",
      "stats_incremental" -> "per-shard partial-agg summaries (KB HLL sketches) folded by a shard-count-sized merge agg; no second data scan",
      "rfm_scores" -> "one customer-keyed partial agg; quintile thresholds are collected scalars, scoring is row-local comparisons — no global ntile window",
      "text_readability" -> "three row-local regexp counts; the only exchange is the gate ORDER BY",
      "dedup_semantic_hier" -> "hierarchical assignment: literal super-cell argmax + EQUI broadcast join to member-centroid arrays (no nested-loop join); ids-sized merge exchange for multi-probe; the SemDedup tail is unchanged (id-only candidates, exact verify)",
      "mix_epochs" -> "row-local copy-count arithmetic + sequence explode: zero shuffles before the gate ORDER BY — upsampling never shuffles the corpus",
      "k_anonymity" -> "one quasi-identifier partial agg; the k-band histogram aggregates the GROUPS-sized relation",
      "text_dup_windows" -> "ONE positional shingle pass -> count-over-window on the 8-byte hash (no join, no second scan) -> per-doc rollup — d occurrences cost d rows, never d-squared pairs",
      "supervision_events" -> "driver-sized (source, day) collect feeds one idempotent sink batch; the read-back aggregates the canonical log schema on the name key",
      "zipf_fit" -> "term-count partial agg -> custom TopKPerKey bounded-heap selection (no vocabulary sort) -> rank window + ordered OLS folds over the 100 survivors per source",
      "dedup_impact" -> "first-occurrence window keyed on xxhash64(text) — the exchange moves 8-byte keys, never bodies; one source-keyed agg after",
      "domain_profile" -> "row-local parse_url + regexp host/domain extraction in the scan projection; ONE domain-keyed grouped pass (distinct-aggs ride the two-phase Expand on the same shuffle)",
      "domain_blocklist" -> "literal blocklist array scanned row-locally (filter + try_element_at) — no join; the only exchange is the gate ORDER BY",
      "domain_pagerank" -> "edges/nodes/outdeg checkpointed once; each of the 5 iterations is one edges-keyed join + one node-keyed partial agg of (node, BIGINT) pairs — integer fixed-point, no float accumulation anywhere",
      "text_max_dup_span" -> "ONE corpus scan emits both widths' positional windows (concat of two ShingleHashes arrays); occurrence counts via count-over-window on (w, hash) — no join, no second scan; islands are one doc-keyed sort window",
      "url_canonicalize" -> "seven chained regexp_replace ops in a single row-local projection — zero shuffles before the gate ORDER BY",
      "dedup_url" -> "canonicalization in the scan projection feeding one canonical-keyed partial agg (count + min + distinct-url via the two-phase expansion)",
      "sample_importance" -> "row-local quality threshold (BIGINT DIV) vs the salted MD5 uniform: a Filter in the scan stage, zero shuffles before the gate ORDER BY",
      "budget_cap" -> "one source-keyed sort window accumulating exact BIGINT token counts; membership is a row-local comparison on the running sum",
      "approx_wau" -> "daily HLL sketches (partial agg) fanned 7x by a row-local explode; days-sized semi join bounds the window ends; hll_union_agg merges KB-sized sketch state per window",
      "sample_negatives" -> "users x m probe rows (Generate, never users x items); dedup partial agg; LEFT ANTI join co-keyed on (user, item); per-user rank window bounded by m",
      "source_checksum" -> "row-local MD5-derived 60-bit hash; ONE partial-agg pass folds xor/min/max/count per source",
      "new_templates" -> "two template-cardinality partial-agg relations; LEFT ANTI join broadcasts the reference set",
      "q4_priority_exists" -> "filter pushed below the LEFT SEMI join; one fact-fact semi join + one priority partial agg",
      "q7_volume" -> "nation joined twice (self-join on the dimension) — both copies + customer + supplier broadcast; the symmetric pair predicate prunes before the one fact-fact shuffle (lineitem-orders)",
      "q13_order_dist" -> "LEFT outer join with the priority filter INSIDE the join (zero-order customers survive); count(col) non-null agg; the distribution regroup runs on the order-count-sized relation",
      "q15_top_supplier" -> "per-supplier revenue aggregated once; its own 1-row max broadcast back as the equality filter — no lineitem re-scan",
      "q17_small_qty" -> "brand partkeys broadcast-semi-join lineitem FIRST, so the de-correlated per-part average and its join-back run on the brand's share of the fact table only",
      "q22_idle_rich" -> "global positive-balance average is a collected scalar literal in the filter; the NOT EXISTS anti join builds only on urgent orders",
      "corr_matrix" -> "all six correlations in ONE partial-agg scan (corr = sums/counts); stack() unpivot runs on the 1-row result — no shuffle beyond the scalar agg",
      "markov_next" -> "per-user lead window (one user-keyed exchange) -> (src,dst) partial agg; the normalization window runs on the folded event-types-squared relation",
      "nb_classify" -> "trained model = literal maps (classes-by-bins-sized, driver-collected); classification is a row-local aggregate() fold per doc — zero joins, zero per-doc window; apply phase is one corpus scan",
      "phrase_search" -> "phrase postings materialized from ONE corpus scan (isin filter + localCheckpoint); per-term consecutive-position matching is equi self-joins on (doc, pos-offset) over the df-sized store",
      "item_similarity" -> "basket-keyed pair join bounded by basket size; item-frequency relation broadcast back twice; min-support filter before the TakeOrderedAndProject top-k heap",
      "attr_linear" -> "user-keyed equi join with the 7-day lookback as a range filter; per-purchase k window over the bounded pairs; one channel-keyed partial agg",
      "quantile_normalize" -> "global quantile grid is a collected 21-double literal; one source-keyed rank window; the interpolation is row-local element_at arithmetic",
      "bootstrap_ci" -> "50x replicate fan-out is a row-local Generate; replicate means are one 50-group partial agg; the CI folds the 50-row relation — no per-row shuffle beyond the one agg",
      "ip_enrich" -> "range dictionary = sorted literal array; the lookup is a row-local codegen'd size(filter(...)) fold — zero joins, one counts partial agg",
      "changepoint_detect" -> "daily partial agg, then ONE series-keyed sort window yields every split's prefix sums; argmax rank window over the days-sized relation",
      "retrieval_ndcg" -> "metric layer rides the exact Knn.topK retrieval: labels joined (queries side broadcast), DCG/IDCG/MRR are windows + one agg over the queries-by-10 relation",
      "survival_km" -> "one user-keyed conditional agg for lifetimes; at-risk and KM-product windows run on the days-sized lifetime grid (cardinality-bounded)",
      "q21_sole_blame" -> "ONE lineitem-orders shuffle on l_orderkey; both correlated quantifiers fold into the per-order aggregate whose join-back shares that partitioning (no per-row EXISTS re-execution); supplier broadcast; top-10 is TakeOrderedAndProject",
      "q16_supplier_cnt" -> "(partkey, suppkey) pre-distinct collapses the fact table BEFORE the broadcast ANTI (NOT IN) and attribute joins; the distinct-count regroup runs on pair cardinality",
      "q11_important_parts" -> "per-part partial agg computed once; the global total is a collected 1-long literal inside the scaled-integer HAVING filter — no self-join against the aggregate",
      "graph_triangles" -> "scalars are assembled driver-side (the returned relation is a 1-row literal); the audited work ran eagerly: per-order pair join + ONE edge distinct (persisted), nodes-sized degree/adjacency partial aggs (broadcast), and the compact-forward intersect — a row-local array_intersect over the edge relation, so the wedge expansion (~m^1.5 rows) never materializes",
      "ts_autocorr" -> "days-sized series self-EQUI-join on x + lag (the 7 lags explode on the probe side — no cross join); per-lag moments are one partial agg of exact BIGINTs; mean/variance are collected literals",
      "unpivot_melt" -> "pinned-list pivot = ONE conditional partial-agg pass (no values-discovery collect job); unpivot is a row-local Expand over the days-sized matrix",
      "linreg_multi" -> "nine exact-BIGINT sums in ONE partial-agg pass per group; Cramer's rule is a row-local projection over the groups-sized relation — zero joins, zero iterations, zero collects",
      "feature_hash" -> "row-local MD5 bucketing in the scan projection; one bucket-keyed partial agg (distinct-vocab rides the two-phase Expand on the same shuffle)",
      "cube_counts" -> "Expand over the 4 grouping sets feeding one partial-agg + exchange pair — no per-set re-scan",
      "q9_profit_rollup" -> "part-name filter semi-joins lineitem first (broadcast set); ONE fact-fact shuffle (lineitem-orders); supplier + nation broadcast",
      "q10_returned_top" -> "return-flag + date filters pushed into the scans before the one fact-fact shuffle; top-20 is TakeOrderedAndProject on the rounded revenue",
      "q14_promo_share" -> "promo and total revenue from the SAME conditional partial agg — one scan; the ratio is row-local",
      "q19_disjunct" -> "the OR-of-conjunctions rides the broadcast equi hash join as its residual — join key stays p_partkey, never a nested-loop")

    val sb = new StringBuilder
    sb.append("# PLANS — `explain(\"formatted\")` audit of headline queries\n\n")
    sb.append(s"Generated by `graft.Plans` at `$sfDir`. See SURVEY.md §5 for the design rationale.\n")
    interesting.foreach { case (name, note) =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb.append(s"\n## $name\n\n$note\n\n```\n$plan```\n")
    }
    Files.write(Paths.get(out), sb.toString.getBytes)
    println(s"wrote $out")
    spark.stop()
  }
}
