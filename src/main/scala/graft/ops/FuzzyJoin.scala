package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance similarity join (record linkage): all (left, right)
  * pairs with `levenshtein(left, right) <= k`, without the cross
  * product a raw `levenshtein(l, r) <= k` predicate plans (BNLJ —
  * O(|L| x |R|) string comparisons, dead at 100 TB).
  *
  * Candidate generation is the PassJoin partition-signature scheme
  * (Li/Deng/Feng, ICDE 2011 — published algorithm, public knowledge):
  * split every indexed string into `k+1` contiguous segments. By
  * pigeonhole, any string within edit distance `k` must contain at
  * least one segment **exactly**, as a substring whose start position
  * differs from the segment's by at most `k` (an edit shifts later
  * characters by at most one position each, and at most `k` edits
  * precede the match). So:
  *
  *  - index side: one row per (strLen, segIdx, segment) — `k+1` keys
  *    per string;
  *  - probe side: for each plausible indexed length `L` in
  *    `[len-k, len+k]` and each segment slot, every substring of the
  *    probe at start positions within `±k` of the slot — O(k^3) short
  *    keys per string (18 for k=1);
  *  - equi-join on (L, segIdx, substring) → candidate pairs →
  *    `array_distinct` dedup → exact `levenshtein` verify.
  *
  * Cost is linear in rows + matches: a shuffled (or broadcast) hash
  * join on short segment keys. The probe window is the simple `±k`
  * superset of PassJoin's multi-match-aware selection — slightly more
  * candidates, same zero-false-negative guarantee, and the verify
  * filter discards the excess.
  *
  * Skew note for 100 TB: segments drawn from low-entropy regions
  * (shared prefixes like `"Customer#"`) hash to hot keys. Normalize
  * constant affixes away before joining (as `fuzzy_join_names` does);
  * for dense-key corpora two measured insurances exist (SCALE.md):
  * `maxDf` DROPS hot index keys — linear candidate bound
  * (probeKeys·maxDf), recall cost when every pigeonhole witness of a
  * pair is hot — while `saltHot` (with `maxDf` as the hotness
  * threshold) KEEPS them, scattering each hot key's index rows across
  * salts and replicating probe rows — every match retained and no
  * straggler task, but the quadratic df·probes volume of a hot key is
  * only spread, not bounded. Drop is the default; salt is the
  * keep-every-match alternative.
  *
  * Reference anchor: the reference has no fuzzy matching — this is
  * part of the LLM-pipeline surface (entity resolution / near-dup
  * keys at the record level, SURVEY §2B).
  */
object FuzzyJoin {

  /** Even segment boundaries for a string of length `len` split into
    * `k+1` parts: the first `k+1-rem` segments get `base` chars, the
    * last `rem` get `base+1` (deterministic; mirrored by probe side).
    * Returns array of (start, segLen), 0-based starts.
    */
  private def segmentBounds(len: Column, k: Int): Column = {
    val parts = k + 1
    val base = len.cast("int") / lit(parts)
    val baseI = floor(base).cast("int")
    val rem = pmod(len.cast("int"), lit(parts))
    transform(sequence(lit(0), lit(k)), i => {
      val extraBefore = greatest(lit(0), i - (lit(parts) - rem))
      val start = i * baseI + extraBefore
      val segLen = baseI + when(i >= lit(parts) - rem, 1).otherwise(0)
      struct(start.as("start"), segLen.as("len"))
    })
  }

  /** The pre-distinct candidate join (probe keys ⋈ segment index) —
    * the volume the pigeonhole scheme admits before dedup + verify.
    * Shared by [[join]] and the scale measurement
    * (`graft.Scale.fuzzyJoin`), so the measured volume is the shipped
    * stage, not a model of it.
    */
  private def candidateJoin(
      left: DataFrame,
      leftIdCol: String,
      leftStrCol: String,
      right: DataFrame,
      rightIdCol: String,
      rightStrCol: String,
      k: Int,
      maxDf: Int = 0,
      saltHot: Int = 0): DataFrame = {
    require(k >= 1, "k must be >= 1")
    // saltHot without a hotness threshold would silently take the
    // plain uncapped join (neither branch below fires) — an explicit
    // error beats a no-op the caller believes is hot-key-safe
    require(saltHot <= 1 || maxDf > 0,
      s"saltHot=$saltHot requires maxDf > 0 (maxDf is the hotness threshold salting scatters)")

    // Both sides spread to the session's parallelism when their scans
    // arrive under-partitioned (single-row-group inputs): the segment
    // explode, candidate join and levenshtein verify all inherit the
    // scan layout — the round-16 decomposition measured entity_resolve's
    // whole verify join in ONE 3.6 s task. Hash on the id is
    // deterministic; candidates are set-semantics (dedup + total-order
    // gates downstream), so the output is partitioning-invariant.
    val leftS = graft.Spread.toCores(left, col(leftIdCol))
    val rightS = graft.Spread.toCores(right, col(rightIdCol))

    // Index side (right): (len, segIdx, segment) keys. Zero-length
    // segments (len < k+1) key on position only — the substring is ''.
    val idx0 = rightS
      .select(col(rightIdCol).as("_rid"), col(rightStrCol).as("_rstr"))
      .withColumn("_rlen", length(col("_rstr")))
      .withColumn("_seg", explode(segmentBounds(col("_rlen"), k)))
      .select(
        col("_rid"), col("_rstr"), col("_rlen"),
        col("_seg.start").as("_si"),
        expr("substring(_rstr, _seg.start + 1, _seg.len)").as("_sub"))
    // maxDf > 0: HOT segment keys (index-side df over the cap) drop out
    // of the index — the dense-key insurance the round-14 30×
    // measurement motivated (digit ids put segment-key df ∝ n/10^|seg|,
    // candidates ×8.3 for ×3 data). The bound: each surviving key
    // admits ≤ maxDf index rows per probe row, so candidates ≤
    // probeKeys · maxDf — linear in rows. Recall cost: a true pair is
    // missed only when EVERY one of its k+1 pigeonhole witnesses is
    // hot (any one cool segment still finds it); the df computation is
    // an ids-free aggregation on the join key itself.
    val idx =
      if (maxDf <= 0 || saltHot > 1) idx0
      else {
        val hot = idx0.groupBy(col("_rlen"), col("_si"), col("_sub"))
          .agg(count(lit(1)).as("_df")).where(col("_df") > maxDf)
          .select(col("_rlen").as("_hl"), col("_si").as("_hi"), col("_sub").as("_hs"))
        idx0.join(hot,
          idx0("_rlen") === hot("_hl") && idx0("_si") === hot("_hi") &&
            idx0("_sub") === hot("_hs"),
          "left_anti")
      }

    // Probe side (left): for each candidate indexed length L in
    // [len-k, len+k] (L >= 1), each segment slot of an L-length split,
    // and each start within ±k of the slot, the matching substring.
    val kk = lit(k)
    val probeKeys = {
      val qlen = length(col("_lstr"))
      val lens = sequence(greatest(lit(0), qlen - kk), qlen + kk)
      flatten(transform(lens, l => {
        val bounds = segmentBounds(l, k)
        flatten(transform(sequence(lit(0), lit(k)), i => {
          val b = element_at(bounds, i + 1)
          val segLen = b.getField("len")
          val lo = greatest(lit(0), b.getField("start") - kk)
          val hi = least(qlen - segLen, b.getField("start") + kk)
          when(lo <= hi,
            transform(sequence(lo, hi), p =>
              struct(l.as("l"), p.as("si"),
                expr("_lstr").substr(p + 1, segLen).as("sub"))))
            .otherwise(expr("CAST(array() AS array<struct<l:int,si:int,sub:string>>)"))
        }))
      }))
    }
    val probe = leftS
      .select(col(leftIdCol).as("_lid"), col(leftStrCol).as("_lstr"))
      .withColumn("_key", explode(array_distinct(probeKeys)))

    // Join candidates: probe `si` is the substring's own start, index
    // `_si` the segment's start; PassJoin's guarantee is substring
    // equality with the two starts within ±k. (len, substring) carry
    // the hash-join selectivity; the position band rides along as a
    // post-join conjunct on the same equi key.
    if (maxDf > 0 && saltHot > 1) {
      // SALT-don't-drop (round-15 measurement, SCALE.md): hot keys
      // keep their matches — index rows of a hot (len, substring)
      // scatter across `saltHot` sub-keys by id hash, probe rows
      // replicate to every sub-key, and the join adds salt equality.
      // This removes the one-reducer straggler a hot key otherwise
      // plans, but it does NOT restore the linear candidate bound:
      // each hot key still emits df·probes pairs, just spread across
      // saltHot tasks — salting fixes SKEW, dropping fixes VOLUME
      // (both measured on the digit-id corpus; drop stays the
      // default, this is the keep-every-match alternative for corpora
      // where the cap would otherwise bind). The hot marker is
      // (len, substring) — coarser than the drop path's
      // (len, position, substring), since the probe side's position
      // band would match several position-specific markers and
      // duplicate rows; salting a few extra near-hot keys is
      // harmless (pairs are preserved either way).
      val hot = idx0.groupBy(col("_rlen"), col("_si"), col("_sub"))
        .agg(count(lit(1)).as("_df")).where(col("_df") > maxDf)
        .select(col("_rlen").as("_hl"), col("_sub").as("_hs")).distinct()
      val hotB = graft.Hints.maybeBroadcast(hot)
      val idxS = idx0.join(hotB,
          idx0("_rlen") === hotB("_hl") && idx0("_sub") === hotB("_hs"), "left")
        .withColumn("_salt",
          when(col("_hl").isNotNull, pmod(hash(col("_rid")), lit(saltHot)))
            .otherwise(lit(0)))
        .drop("_hl", "_hs")
      val probeS = probe.join(hotB,
          probe("_key.l") === hotB("_hl") && probe("_key.sub") === hotB("_hs"), "left")
        .withColumn("_psalt",
          explode(when(col("_hl").isNotNull, sequence(lit(0), lit(saltHot - 1)))
            .otherwise(array(lit(0)))))
        .drop("_hl", "_hs")
      probeS
        .join(idxS,
          probeS("_key.l") === idxS("_rlen") && probeS("_key.sub") === idxS("_sub") &&
            probeS("_psalt") === idxS("_salt") &&
            abs(probeS("_key.si") - idxS("_si")) <= k)
        .select(col("_lid"), col("_lstr"), col("_rid"), col("_rstr"))
    } else {
      probe
        .join(idx,
          probe("_key.l") === idx("_rlen") && probe("_key.sub") === idx("_sub") &&
            abs(probe("_key.si") - idx("_si")) <= k)
        .select(col("_lid"), col("_lstr"), col("_rid"), col("_rstr"))
    }
  }

  /** All pairs (leftId, rightId, dist) with
    * `levenshtein(left(strCol), right(strCol)) <= k`. Output columns:
    * left id, right id, `dist`. Strings must be non-null; empty
    * strings match anything of length <= k (handled by a length-only
    * fallback key so zero-length segments never generate).
    */
  def join(
      left: DataFrame,
      leftIdCol: String,
      leftStrCol: String,
      right: DataFrame,
      rightIdCol: String,
      rightStrCol: String,
      k: Int,
      maxDf: Int = 0,
      saltHot: Int = 0): DataFrame = {
    // Verify BEFORE dedup: a pair can reach the join through at most
    // ~(k+1)·(2k+1) duplicate keys (measured 2% extra rows on the
    // digit-string worst case — SCALE.md), and the bounded
    // `levenshtein(_, _, k)` early-exits at k+1 edits (O(k·len) per
    // pair, not O(len²)), so re-verifying a duplicate costs microseconds
    // while a pre-verify `.distinct()` shuffles EVERY candidate with
    // both payload strings riding the exchange. Deduping the verified
    // matches instead shuffles only the output (56× fewer rows, 3
    // narrow columns, at the measured 10× point).
    candidateJoin(left, leftIdCol, leftStrCol, right, rightIdCol, rightStrCol, k, maxDf, saltHot)
      .withColumn("dist", levenshtein(col("_lstr"), col("_rstr"), k))
      .where(col("dist") >= 0 && col("dist") <= k)
      .select(
        col("_lid").as(leftIdCol),
        col("_rid").as(rightIdCol),
        col("dist"))
      .distinct()
  }

  /** Measured candidate volumes for the scale report: the raw join
    * output (what the shuffle ships) and the distinct pair count (what
    * the verify kernel scores).
    */
  final case class CandidateStats(joined: Double, distinctPairs: Double)

  def candidateStats(
      left: DataFrame,
      leftIdCol: String,
      leftStrCol: String,
      right: DataFrame,
      rightIdCol: String,
      rightStrCol: String,
      k: Int,
      maxDf: Int = 0,
      saltHot: Int = 0): CandidateStats = {
    val cand = candidateJoin(left, leftIdCol, leftStrCol,
      right, rightIdCol, rightStrCol, k, maxDf, saltHot)
    val r = cand.agg(
      count(lit(1)).as("j"),
      count_distinct(col("_lid"), col("_rid")).as("d")).head()
    CandidateStats(r.getLong(0).toDouble, r.getLong(1).toDouble)
  }
}
