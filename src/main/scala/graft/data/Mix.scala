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
