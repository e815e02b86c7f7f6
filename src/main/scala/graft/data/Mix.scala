package graft.data

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Deterministic data-mix sampling — the mix planner's executor: given
  * target per-group shares (the "data mix" of a pretraining run),
  * down-sample each group by a hash-rate so the result hits the target
  * proportions at the LARGEST total the corpus can supply (the
  * scarcest group, at its share, caps the total; no group is ever
  * oversampled past what exists).
  *
  * Spark-first shape: one tiny grouped count collected to the driver
  * (rows = number of groups — sources number thousands at worst),
  * per-group keep-thresholds folded into a row-local predicate over
  * the same cross-engine MD5 bucket hash as [[Sampling]]. Zero
  * shuffles on the data path at any corpus size, and the selection is
  * reproducible across runs/engines and append-stable per group (a
  * document's membership never flips as OTHER documents arrive; group
  * rates move only when group counts are re-planned).
  */
object Mix {

  /** Keep a deterministic per-group sample realizing `shares` (which
    * must sum to 1; groups absent from `shares` are dropped — a mix
    * excludes what it does not list). Sampled sizes are hash-bucket
    * approximations of the exact quotas, which is the price of
    * append-stability (exact quotas need a rank — see
    * `Sampling.stratifiedSample` for that tradeoff).
    */
  def sample(
      df: DataFrame,
      keyCol: String,
      groupCol: String,
      shares: Seq[(String, Double)],
      buckets: Int = 1000): DataFrame = {
    require(math.abs(shares.map(_._2).sum - 1.0) < 1e-9, "target shares must sum to 1")
    require(shares.forall(_._2 > 0), "target shares must be positive")
    val counts = df.groupBy(col(groupCol)).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    shares.foreach { case (g, _) =>
      require(counts.contains(g), s"mix group '$g' absent from the corpus")
    }
    applyShares(df, keyCol, groupCol, shares, counts, buckets)
  }

  /** Temperature-scaled group sampling — the multilingual-rebalance op
    * (upsample the tail, downsample the head): target shares
    * `q_g ∝ n_g^alpha` for `alpha ∈ (0, 1]` (alpha = 1 keeps natural
    * proportions; alpha → 0 approaches uniform across groups). Shares
    * are DERIVED from the observed group counts — same tiny grouped
    * count, same hash-threshold data path as [[sample]], zero shuffles
    * on the data path. Since sampling can only remove rows, the
    * flattened mix is realized at the largest feasible total (the
    * most-upsampled group kept whole caps it).
    */
  def temperatureSample(
      df: DataFrame,
      keyCol: String,
      groupCol: String,
      alpha: Double,
      buckets: Int = 1000): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    val counts = df.groupBy(col(groupCol)).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.nonEmpty, "empty corpus")
    // sum in group-name order — a deterministic summation order the
    // oracle can reproduce (Map iteration order is not a contract)
    val byName = counts.toSeq.sortBy(_._1)
    val z = byName.map { case (_, n) => math.pow(n.toDouble, alpha) }.sum
    val shares = byName.map { case (g, n) =>
      g -> math.pow(n.toDouble, alpha) / z
    }
    applyShares(df, keyCol, groupCol, shares, counts, buckets)
  }

  /** Repetition-budget mix materialization — the UPSAMPLING
    * counterpart to [[sample]]/[[temperatureSample]] (which can only
    * remove rows): target EPOCHS per group (e.g. web 1.0, code 3.2 —
    * the "repeat the high-quality sources" knob every LLM pretraining
    * mix exposes), realized as floor(e) copies of every row plus one
    * extra copy for a deterministic hash-selected (e − floor(e))
    * fraction of keys. Expected copies per group are exactly e at
    * bucket granularity, and the extra-copy set is append-stable and
    * engine-reproducible (same MD5 bucket hash as [[Sampling]] — a
    * key's membership never flips as other rows arrive). Groups absent
    * from `epochs` are dropped (a mix excludes what it does not list).
    *
    * Row-local explode, zero shuffles at any corpus size; the emitted
    * `copy` index (0-based) keys downstream interleaving (feed
    * [[Sampling]]'s deterministic shuffle to spread copies apart —
    * adjacent duplicate copies are a training-order hazard, not a
    * mix-composition one).
    */
  def epochsSample(
      df: DataFrame,
      keyCol: String,
      groupCol: String,
      epochs: Seq[(String, Double)],
      buckets: Int = 1000): DataFrame = {
    require(epochs.forall(_._2 > 0), "epochs must be positive")
    val base: Column = epochs.foldRight(lit(0L): Column) { case ((g, e), acc) =>
      when(col(groupCol) === g, lit(math.floor(e).toLong)).otherwise(acc)
    }
    val fracThr: Column = epochs.foldRight(lit(0.0): Column) { case ((g, e), acc) =>
      when(col(groupCol) === g,
        lit(math.floor((e - math.floor(e)) * buckets))).otherwise(acc)
    }
    val copies = base +
      when(pmod(Sampling.keyHash(col(keyCol)), lit(buckets.toLong)) < fracThr, 1L)
        .otherwise(0L)
    // copies = 0 (unlisted group, or fractional-only epoch missing the
    // hash cut) must DROP the row: explode of the null branch does
    // exactly that, and the guard keeps sequence() away from the
    // descending-sequence surprise at (0, -1)
    df.withColumn("copy",
      explode(when(copies > 0, sequence(lit(0L), copies - 1))))
  }

  private def applyShares(
      df: DataFrame,
      keyCol: String,
      groupCol: String,
      shares: Seq[(String, Double)],
      counts: Map[String, Long],
      buckets: Int): DataFrame = {
    // largest feasible mix total: the scarcest group at its share caps it
    val total = shares.map { case (g, t) => math.floor(counts(g) / t) }.min
    val thresholds = shares.map { case (g, t) =>
      g -> math.floor(t * total / counts(g) * buckets)
    }
    val thrCol: Column = thresholds.foldRight(lit(-1.0): Column) { case ((g, thr), e) =>
      when(col(groupCol) === g, lit(thr)).otherwise(e)
    }
    df.where(pmod(Sampling.keyHash(col(keyCol)), lit(buckets.toLong)) < thrCol)
  }
}
