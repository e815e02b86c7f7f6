package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Zone-map file skipping — per-file min/max manifests and pruned
  * reads (the MergeTree sparse-index / Delta-Lake file-stats analog;
  * the reference's target table relies on exactly this via its
  * `PARTITION BY toDate(created_at)` + primary-key sparse index,
  * readme.md:108-124).
  *
  * Parquet row-group statistics already prune WITHIN a file once the
  * footer is open, but at 100 TB the win is never OPENING the file:
  * a manifest of per-file min/max lets the driver drop files from the
  * listing before any task is scheduled — footer reads are one round
  * trip per file on an object store, so a 1M-file table pays 1M GETs
  * per query without one.
  *
  * The manifest is one aggregation over the table grouped by
  * `input_file_name()` — per-file rows, so manifest size is
  * files-count, not data-sized (a few rows per GB written). In
  * production it is built once at write time (or incrementally per
  * ingest batch — the same idempotent-batch unit MergeTreeSink
  * already tracks) and stored beside the data; queries read only the
  * manifest. Pruning collects the (tiny) surviving file list on the
  * driver — the same driver-side role Spark's own file index plays —
  * and re-applies the exact predicate, so a too-wide zone can only
  * cost I/O, never correctness.
  */
object ZoneMap {

  /** Per-file min/max manifest over `cols` — one scan, one partial-agg
    * shuffle keyed by file (rows out = file count).
    */
  def build(df: DataFrame, cols: Seq[String]): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(
        count(lit(1)).as("rows"),
        cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))): _*)

  /** Files whose `[min_c, max_c]` zone overlaps `[lo, hi]` (inclusive
    * bounds; a file is kept unless its zone PROVABLY excludes the
    * range, so nulls/unknowns are kept — pruning stays sound).
    */
  def overlappingFiles(manifest: DataFrame, c: String, lo: Column, hi: Column): Seq[String] =
    manifest
      .where(!(col(s"max_$c") < lo || col(s"min_$c") > hi))
      .select("file")
      .collect()
      .map(_.getString(0))
      .toSeq

  /** Files surviving EVERY range predicate — multi-dimensional
    * skipping (one manifest scan; with a z-ordered layout each
    * dimension prunes independently, see [[Morton]]).
    */
  def overlappingFilesAll(manifest: DataFrame, ranges: Seq[(String, Column, Column)]): Seq[String] =
    manifest
      .where(ranges.map { case (c, lo, hi) =>
        !(col(s"max_$c") < lo || col(s"min_$c") > hi)
      }.reduce(_ && _))
      .select("file")
      .collect()
      .map(_.getString(0))
      .toSeq

  /** Read only the files whose zones overlap `[lo, hi]` on `c`, with
    * the exact range predicate re-applied (zones are necessary, not
    * sufficient). Returns an empty frame with the manifest-free schema
    * when nothing survives.
    */
  def prunedRead(
      spark: SparkSession,
      manifest: DataFrame,
      c: String,
      lo: Column,
      hi: Column): DataFrame = {
    val files = overlappingFiles(manifest, c, lo, hi)
    require(files.nonEmpty, s"zone map pruned every file for $c — read the manifest range instead")
    spark.read.parquet(files: _*).where(col(c) >= lo && col(c) <= hi)
  }
}
