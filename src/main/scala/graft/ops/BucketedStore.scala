package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/** Bucketed co-located layout — the ClickHouse sharding-key /
  * Hive-Spark `CLUSTERED BY` analog, and the storage-side answer to
  * "this join shuffles every time we run it".
  *
  * A shuffle join on a 100 TB fact table moves the fact side over the
  * network on EVERY query. Paying one layout shuffle up front —
  * writing the table bucketed by its join key — makes every later
  * equi-join/aggregation on that key exchange-free: the scan itself
  * reports `HashPartitioning(key, buckets)`, so Catalyst plans a
  * sort-merge join with zero `Exchange` on either side. The layout is
  * additionally bucket-sorted; by default Spark still re-sorts within
  * partitions (scan ordering only propagates behind
  * `spark.sql.legacy.bucketedTableScan.outputOrdering`) — a linear,
  * shuffle-free pass — and sessions that set that flag read the files
  * as a pure streaming merge with zero `Sort` too.
  * That is the right trade exactly when the table is joined on the
  * same key repeatedly (fact⋈dim star schemas, incremental
  * snapshot_diff runs, nightly enrichments): amortize one shuffle
  * across N queries instead of paying N.
  *
  * One file per bucket is engineered, not hoped for: rows are
  * repartitioned by the bucket key with `numPartitions == buckets`
  * BEFORE the bucketed write. Spark's bucket assignment uses the same
  * Murmur3 hash `HashPartitioning` uses, so after the repartition each
  * write task holds exactly one bucket's rows and emits exactly one
  * file. Without it every task writes a file per bucket (tasks ×
  * buckets small files — an object-store listing storm at scale) and
  * the per-bucket sort degrades to per-file runs, voiding the
  * ordered-read option above.
  *
  * Registered through the session catalog (`saveAsTable`) because
  * bucket metadata lives in the catalog, not in parquet — a raw
  * `.parquet(path)` read of the same files would silently lose the
  * co-location. On a cluster the catalog is the metastore and the
  * layout persists across jobs; in-memory catalogs (tests, the bench)
  * rebuild it once per session.
  */
object BucketedStore {

  /** Materialize `df` once per session under `name`, bucketed and
    * bucket-sorted by `key`; later calls reuse the existing table.
    * Callers embed a dataset tag in `name` (two corpora must not share
    * a layout). `buckets` sizes parallelism for every downstream join
    * — pick it like `spark.sql.shuffle.partitions` for the table's
    * scale, and keep it IDENTICAL on both sides of a co-located join
    * (mismatched bucket counts reintroduce an exchange on one side).
    */
  def materializeOnce(df: DataFrame, name: String, key: String, buckets: Int): DataFrame =
    synchronized {
      require(name.matches("[A-Za-z0-9_]+"), s"unsafe table name: $name")
      require(buckets > 0, s"buckets must be positive: $buckets")
      val spark = df.sparkSession
      if (!spark.catalog.tableExists(name)) {
        // EXTERNAL table at an explicit location (the graft store root
        // when configured, the warehouse dir otherwise): an ephemeral
        // in-memory catalog forgets the table across sessions while
        // its directory persists, and a managed-table write onto that
        // stale location is a hard LOCATION_ALREADY_EXISTS error — the
        // external form makes the fresh session's write an overwrite
        // instead. With a persistent metastore the tableExists check
        // short-circuits and none of this runs.
        val root = spark.conf.getOption(graft.Store.PathConf).filter(_.nonEmpty)
          .getOrElse(spark.conf.get("spark.sql.warehouse.dir"))
        df.repartition(buckets, col(key))
          .write
          .mode(SaveMode.Overwrite)
          .option("path", s"${root.stripSuffix("/")}/$name")
          .bucketBy(buckets, key)
          .sortBy(key)
          .saveAsTable(name)
      }
      spark.table(name)
    }
}
