package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sinks.ReplacingSink

/** Incrementally-maintained keyed COUNT rollup — the ClickHouse
  * materialized-view analog (a MV over the reference's log table is
  * the idiomatic way its users build live level/logger dashboards:
  * ClickHouse folds each insert block into an Aggregating/SummingMergeTree
  * target; here each micro-batch folds into a [[ReplacingSink]]).
  *
  * Per batch: aggregate the batch (one micro-batch-sized shuffle),
  * read prior totals as of the PREVIOUS batch
  * ([[ReplacingSink.readFinalBefore]]), add, and append the touched
  * keys as new versions under the batch's idempotent `upsert_batch`
  * dir. Untouched keys keep their old versions — [[ReplacingSink.readFinal]]
  * still resolves them, so an update costs O(batch + touched keys),
  * never a store rewrite.
  *
  * Exactly-once on foreachBatch replay by construction: the merge
  * reads versions `< batchId` only (a replay never sees its own
  * partial output) and the append overwrites the same batch dir —
  * re-running a batch recomputes byte-identical totals into the same
  * place (spec-tested). The count monoid generalizes to any
  * commutative-monoid aggregate (sum/min/max/HLL partials) with the
  * same read-modify-write shape.
  *
  * Scale: the store holds one row per live (key, version-epoch), i.e.
  * group-key cardinality — dashboard-sized, orders below the stream.
  * [[compact]] (ReplacingSink's background-merge analog) bounds the
  * version history; run it on the same cadence as MergeTreeSink
  * compaction.
  */
final case class CountMatView(store: ReplacingSink) {
  require(store.versionCols == Seq("ver"),
    "CountMatView owns the version column: build the store with versionCols = Seq(\"ver\")")

  /** Fold one micro-batch into the rollup. Wire as
    * `.foreachBatch((df, id) => view.update(df, id))`.
    */
  def update(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val keys = store.keyCols
    val delta = batch.groupBy(keys.map(col): _*).agg(count(lit(1)).as("cnt"))
    // "empty store" = no batch dirs yet (the root may exist as a bare
    // directory); an empty-dir readRaw cannot infer a schema
    val glob = new Path(store.path, "upsert_batch=*")
    val nonEmpty = Option(glob.getFileSystem(spark.sessionState.newHadoopConf())
      .globStatus(glob)).exists(_.nonEmpty)
    val merged =
      if (!nonEmpty) delta
      else {
        val prior = store.readFinalBefore(spark, batchId)
          .select((keys.map(col) :+ col("cnt").as("prior_cnt")): _*)
        delta.join(prior, keys, "left")
          .select((keys.map(col) :+
            (col("cnt") + coalesce(col("prior_cnt"), lit(0L))).as("cnt")): _*)
      }
    store.append(merged.withColumn("ver", lit(batchId)), s"b$batchId")
  }
}
