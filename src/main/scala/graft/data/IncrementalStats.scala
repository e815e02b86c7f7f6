package graft.data

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental table statistics via mergeable summaries — the
  * maintenance shape behind `table_stats` at 100 TB: a new ingest
  * batch should UPDATE corpus statistics by merging its own summary
  * row, never by rescanning the corpus. Counts, nulls, and min/max
  * merge trivially; the distinct count is the classically
  * non-mergeable one, so it rides a Datasketches HLL sketch
  * (`hll_sketch_agg`), whose union is exactly the merge operator the
  * rescan-free update needs.
  *
  * Scale shape: [[shardSummaries]] is one partial-agg pass over the
  * new data only (per-shard rows: KB-scale sketches + four scalars);
  * [[merge]] folds the summary TABLE — shard-count rows, never data
  * rows. A 1000-shard corpus updates its stats by scanning one shard
  * and merging 1001 summary rows.
  */
object IncrementalStats {

  /** One mergeable summary row per shard: counts, nulls, min/max, and
    * the HLL ndv sketch (lgK=12 → ~2% standard error, ~2 KB).
    */
  def shardSummaries(df: DataFrame, shardCol: String, valueCol: String): DataFrame =
    df.groupBy(col(shardCol).as("shard"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col(valueCol).isNull, 1L).otherwise(0L)).as("n_nulls"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"),
        hll_sketch_agg(col(valueCol), lit(12)).as("ndv_sketch"))

  /** Corpus-level stats from a summary table — union-merges the
    * sketches; touches no data rows.
    */
  def merge(summaries: DataFrame): DataFrame =
    summaries.agg(
      sum("n_rows").as("n_rows"),
      sum("n_nulls").as("n_nulls"),
      min("min_v").as("min_v"),
      max("max_v").as("max_v"),
      hll_sketch_estimate(hll_union_agg(col("ndv_sketch"), lit(true))).as("ndv_est"))
}
