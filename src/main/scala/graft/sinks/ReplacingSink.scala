package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Keyed upsert store — the ReplacingMergeTree analog of the
  * reference's target-table family (readme.md:108-124 creates a plain
  * MergeTree; ReplacingMergeTree is the same engine family with
  * merge-time row replacement keyed on ORDER BY + a version column).
  *
  * Semantics mirrored here:
  *
  *  - **Writes are append-only row versions** ([[append]]): an upsert
  *    never rewrites existing data, it inserts a newer version of the
  *    key — the only write shape that scales on immutable columnar
  *    storage (and exactly how ReplacingMergeTree ingests).
  *  - **`FINAL` is merge-on-read** ([[readFinal]]): latest version per
  *    key, resolved at read time. Expressed as
  *    `groupBy(keys).agg(max_by(payload, orderStruct))` rather than a
  *    `row_number` window: `max_by` is a declarative aggregate, so the
  *    partial phase collapses superseded versions map-side before the
  *    one key shuffle — a window would move every version across the
  *    wire first. Version ties resolve deterministically through the
  *    caller-ordered `versionCols` lexicographic struct (ClickHouse
  *    keeps an arbitrary row on equal versions; determinism here is a
  *    strict improvement and what the value oracle needs).
  *  - **Background merges are [[compact]]**: rewrite the store to
  *    final rows only, with the same crash-safe swap ordering as
  *    [[MergeTreeSink.compact]] (write tmp → rename live aside →
  *    rename in → delete aside), all through the Hadoop FileSystem API
  *    so the identical code runs on HDFS/S3.
  *  - **Idempotent streaming upserts**: [[append]] writes under
  *    `upsert_batch=<key>` with Overwrite — a foreachBatch replay
  *    rewrites its own directory instead of appending duplicate
  *    versions, the same exactly-once construction as
  *    `MergeTreeSink.writeBatch` ingest dirs.
  *
  * `keyCols` is the replacement key (ReplacingMergeTree's ORDER BY);
  * `versionCols` order rows within a key, latest-wins, compared
  * lexicographically in the given column order — put the version
  * first and a unique tiebreaker (e.g. the row id) after it.
  */
final case class ReplacingSink(path: String, keyCols: Seq[String], versionCols: Seq[String]) {
  require(keyCols.nonEmpty && versionCols.nonEmpty, "keyCols and versionCols must be non-empty")

  private def fs(spark: SparkSession): FileSystem =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  /** Append one batch of row versions under an idempotent batch dir.
    * `batchKey` must be stable across retries of the same logical
    * batch and unique otherwise (the LogSink contract).
    */
  def append(batch: DataFrame, batchKey: String): Unit = {
    require(batchKey.matches("[A-Za-z0-9_.-]+") && batchKey != "compacted",
      s"unsafe batch key: $batchKey")
    batch.write.mode(SaveMode.Overwrite).parquet(s"$path/upsert_batch=$batchKey")
  }

  /** Every stored row version (ClickHouse's default non-FINAL read).
    * The discovered `upsert_batch` partition column is physical layout,
    * not data — dropped.
    */
  def readRaw(spark: SparkSession): DataFrame =
    spark.read.parquet(path).drop("upsert_batch")

  /** Latest version per key — the `FINAL` read. One key shuffle with
    * map-side partial collapse; output columns in original order.
    */
  def readFinal(spark: SparkSession): DataFrame = resolveFinal(readRaw(spark))

  /** FINAL over versions strictly below `maxExclusive` — the read a
    * read-modify-write incremental maintainer needs: batch N merges
    * against state as of batch N-1, so a replay of batch N never sees
    * its own partial output. Requires a single numeric first
    * versionCol.
    */
  def readFinalBefore(spark: SparkSession, maxExclusive: Long): DataFrame =
    resolveFinal(readRaw(spark).where(col(versionCols.head) < maxExclusive))

  /** Merge-on-read resolution: keep the row with the lexicographically
    * greatest `versionCols` struct per key.
    */
  def resolveFinal(rows: DataFrame): DataFrame = {
    val valueCols = rows.columns.filterNot(keyCols.contains).toSeq
    val ord = struct(versionCols.map(col): _*)
    rows
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(valueCols.map(col): _*), ord).as("graft_latest"))
      .select(rows.columns.map {
        case k if keyCols.contains(k) => col(k)
        case v => col(s"graft_latest.$v").as(v)
      }: _*)
  }

  /** Rewrite the store to final rows only — the background-merge
    * analog. After compaction [[readRaw]] == [[readFinal]] until the
    * next append. Crash-safe swap: the store is never deleted without
    * its replacement in place; a crash mid-swap leaves aside-named
    * dirs whose recovery is renaming them back.
    */
  def compact(spark: SparkSession): Unit = {
    val f = fs(spark)
    val root = new Path(path)
    val live = Option(f.globStatus(new Path(root, "upsert_batch=*")))
      .getOrElse(Array.empty).toSeq.map(_.getPath)
    if (live.nonEmpty) {
      val tmp = new Path(root, ".compact_tmp")
      if (f.exists(tmp)) f.delete(tmp, true)
      readFinal(spark).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
      val aside = live.map { p =>
        val a = new Path(p.getParent, s".aside_${p.getName}")
        require(f.rename(p, a), s"compact: rename aside failed for $p")
        a
      }
      require(f.rename(tmp, new Path(root, "upsert_batch=compacted")),
        "compact: swap-in failed; recover by renaming .aside_* dirs back")
      aside.foreach(a => f.delete(a, true))
    }
  }
}
