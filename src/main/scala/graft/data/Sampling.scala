package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling / splitting / shuffling — the
  * bread-and-butter utilities of a training-data pipeline at 100 TB
  * (LLM-pipeline brief). All three are keyed on a content-independent
  * hash of a stable id, so they are:
  *
  *  - **reproducible**: the same corpus always yields the same sample,
  *    split, and order — across runs, partitionings, AND engines (the
  *    hash is MD5-derived, so the DuckDB oracle recomputes it exactly;
  *    `rand(seed)` is engine- and partitioning-dependent, which is why
  *    it is not used);
  *  - **stable under appends**: a document's sample membership / split
  *    never changes when other documents arrive (a property
  *    `df.sample` lacks);
  *  - **cheap**: sampling and splitting are row-local maps — zero
  *    shuffles at any scale; the global shuffle is one range-partition
  *    sort, the canonical distributed total order.
  */
object Sampling {

  /** 60-bit cross-engine key hash: top 15 hex digits of MD5 of the
    * key's string form (same recipe as TextStats' token hash). DuckDB:
    * `CAST('0x' || substring(md5(CAST(k AS VARCHAR)), 1, 15) AS BIGINT)`.
    */
  def keyHash(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")

  /** The key's bucket in [0, buckets). */
  def bucketOf(key: Column, buckets: Int = 100): Column =
    pmod(keyHash(key), lit(buckets.toLong))

  /** Keep rows whose key falls in the first `pct` of 100 hash buckets —
    * a deterministic ~pct% sample.
    */
  def sampleByHash(df: DataFrame, keyCol: String, pct: Int): DataFrame =
    df.where(bucketOf(col(keyCol)) < pct)

  /** Assign each row to a named split by cumulative percentage, e.g.
    * `Seq("train" -> 80, "val" -> 10, "test" -> 10)`. Weights must sum
    * to 100; assignment is per-key deterministic and append-stable.
    */
  def assignSplits(df: DataFrame, keyCol: String, splits: Seq[(String, Int)]): DataFrame = {
    require(splits.map(_._2).sum == 100, "split percentages must sum to 100")
    val b = bucketOf(col(keyCol))
    val cum = splits.scanLeft(0)(_ + _._2).tail
    val expr = splits.zip(cum).foldRight(lit(splits.last._1): Column) {
      case (((name, _), upper), rest) => when(b < upper, lit(name)).otherwise(rest)
    }
    df.withColumn("split", expr)
  }

  /** Deterministic per-stratum quota sampling: rank rows within each
    * stratum by (keyHash, key) and keep the first `quota` — the
    * stratified-sampling shape (per-domain / per-language / per-source
    * quotas) of a pretraining data mix. Reproducible across runs,
    * partitionings, and engines like the rest of the family; NOT
    * append-stable (inherent to fixed-SIZE quotas: a new row with a
    * smaller hash displaces the quota boundary — use the fixed-RATE
    * [[sampleByHash]] when append stability matters more than exact
    * counts).
    *
    * Scale: one shuffle on the stratum key; the rank is a window sort
    * per stratum. With FEW, HUGE strata the full per-stratum sort is
    * the [[graft.plans.TopK]] regime (k = quota, bounded heaps) — that
    * operator trades this helper's deterministic (hash, key) tie order
    * for bounded memory; this one keeps determinism, which the
    * cross-engine oracle requires.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String, quota: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(keyHash(col(keyCol)), col(keyCol))
    df.withColumn("strat_rank", row_number().over(w).cast("long"))
      .where(col("strat_rank") <= quota)
  }

  /** Deterministic weighted sampling without replacement (Efraimidis–
    * Spirakis A-RES): each row draws a deterministic uniform
    * `u = keyHash(key) / 2^60 ∈ [0, 1)` and scores `u^(1/w)`; the k
    * highest scores are the sample. Higher weight ⇒ score closer to 1 ⇒
    * more likely sampled, with exactly the weighted-without-replacement
    * distribution — the standard shape for quality- or length-weighted
    * corpus subsetting in a pretraining mix.
    *
    * Reproducible like the rest of the family (the uniform is
    * MD5-derived, never `rand()`), and scale-correct: `orderBy(score)
    * .limit(k)` plans as TakeOrderedAndProject — a bounded k-row heap
    * per partition plus a k-row driver merge, NO global sort shuffle.
    * Ties (same score) break by key for a deterministic result.
    *
    * Weights must be strictly positive; rows with null/non-positive
    * weight are excluded (a zero-weight row can never be sampled).
    */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: Column, k: Int): DataFrame = {
    val u = keyHash(col(keyCol)).cast("double") / lit(1152921504606846976.0) // 2^60
    val score = pow(u, lit(1.0) / weightCol.cast("double"))
    df.where(weightCol.isNotNull && weightCol > 0)
      .withColumn("sample_score", score)
      .orderBy(col("sample_score").desc, col(keyCol))
      .limit(k)
  }

  /** Deterministic global shuffle: a total order by (keyHash, key) —
    * i.e. a reproducible pseudo-random permutation of the corpus —
    * with a dense 1-based `pos`.
    *
    * Positions are computed distributed, never through a
    * single-partition window: a range-partitioned sort on the total
    * order, then RDD `zipWithIndex` (one tiny per-partition count job
    * + offset arithmetic — the canonical global-indexing recipe).
    * zipWithIndex is used deliberately instead of a two-pass DataFrame
    * count+offset join: range boundaries are re-SAMPLED per job, so
    * two separate DataFrame actions can see different partitionings,
    * while zipWithIndex's count and output jobs share one partitioner.
    * The positions equal the global sort rank wherever the boundaries
    * fall, so output is reproducible run to run.
    */
  /** Balanced shard assignment — the output-writing op of a training
    * pipeline: spread documents across `nShards` output shards so
    * per-shard byte/token totals are near-equal (a skewed shard
    * stalls the epoch's slowest reader). Serpentine LPT: rows sorted
    * by size DESCENDING get dealt in boustrophedon order
    * (0..n-1, n-1..0, …), so each block of 2n rows adds one large+one
    * small item per shard — the classic longest-processing-time
    * balance without any sequential state.
    *
    * The global rank is computed distributed exactly like
    * [[deterministicShuffle]]: a range-partitioned sort, then RDD
    * `zipWithIndex` (per-partition counts + offset arithmetic — never
    * a single-partition window). Deterministic: ties in size break by
    * key, so the assignment is reproducible across runs, partitionings,
    * and engines.
    */
  def balancedShards(df: DataFrame, keyCol: String, sizeCol: Column, nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val sorted = df
      .withColumn("_graft_sz", sizeCol.cast("long"))
      .orderBy(col("_graft_sz").desc, col(keyCol))
    val indexed = sorted.rdd.zipWithIndex().map { case (row, i) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ i)
    }
    val n = lit(nShards.toLong)
    df.sparkSession.createDataFrame(indexed,
      sorted.schema.add("_graft_rk", org.apache.spark.sql.types.LongType, nullable = false))
      .withColumn("shard",
        when(pmod(floor(col("_graft_rk") / n), lit(2L)) === 0, pmod(col("_graft_rk"), n))
          .otherwise(n - lit(1L) - pmod(col("_graft_rk"), n)))
      .drop("_graft_sz", "_graft_rk")
  }

  def deterministicShuffle(df: DataFrame, keyCol: String): DataFrame = {
    val sorted = df.orderBy(keyHash(col(keyCol)), col(keyCol))
    val indexed = sorted.rdd.zipWithIndex().map { case (row, i) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ (i + 1))
    }
    df.sparkSession.createDataFrame(indexed,
      sorted.schema.add("pos", org.apache.spark.sql.types.LongType, nullable = false))
  }

  /** Curriculum ordering — easy-to-hard phased training order with a
    * reproducible shuffle WITHIN each phase (ordering a corpus by raw
    * difficulty would correlate adjacent batches; curriculum training
    * wants phase-level progression with in-phase randomness).
    *
    * `phases` equal-sized buckets over the ascending `scoreCol` order
    * (ties by key), sized exactly like SQL `ntile`: the first
    * `N mod phases` buckets get one extra row — so the DuckDB oracle's
    * `ntile(p) OVER (ORDER BY score, key)` reproduces the assignment
    * bit for bit. Both the phase rank and the final position are
    * computed distributed (range-partitioned sort + `zipWithIndex`,
    * the [[deterministicShuffle]] recipe — never a single-partition
    * window, which is what a naive global `ntile` window would plan).
    * The in-phase order is the MD5 [[keyHash]], so the full output
    * sequence `(phase asc, hash, key)` is reproducible across runs,
    * partitionings, and engines.
    *
    * Cost: one count job + two sort-and-index passes — the price of a
    * dense global position, same as [[deterministicShuffle]].
    */
  def curriculumOrder(
      df: DataFrame, keyCol: String, scoreCol: Column, phases: Int): DataFrame = {
    require(phases > 0, "phases must be positive")
    val n = df.count()
    val sorted = df.withColumn("_graft_score", scoreCol).orderBy(col("_graft_score"), col(keyCol))
    val ranked = df.sparkSession.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (row, i) =>
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ i)
      },
      sorted.schema.add("_graft_rk", org.apache.spark.sql.types.LongType, nullable = false))
    // ntile sizing: base = N/p rows per bucket, first N%p buckets +1
    val base = n / phases
    val rem = n % phases
    val cut = (base + 1) * rem
    val phase = when(col("_graft_rk") < cut, floor(col("_graft_rk") / (base + 1)))
      .otherwise(lit(rem) + floor((col("_graft_rk") - cut) / math.max(base, 1L)))
    val phased = ranked
      .withColumn("phase", phase.cast("int"))
      .drop("_graft_score", "_graft_rk")
      .orderBy(col("phase"), keyHash(col(keyCol)), col(keyCol))
    df.sparkSession.createDataFrame(
      phased.rdd.zipWithIndex().map { case (row, i) =>
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ (i + 1))
      },
      phased.schema.add("pos", org.apache.spark.sql.types.LongType, nullable = false))
  }
}
