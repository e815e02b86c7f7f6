package graft.sinks

import org.apache.spark.sql.DataFrame

/** Micro-batch sink contract for the streaming ingest path (the
  * reference's per-tail sink abstraction, Worker.php:71-80 — each
  * worker owns one ClickHouse connection; here each TailPipeline owns
  * one LogSink).
  *
  * `batchKey` is TailPipeline's replay-stable identity for the
  * micro-batch (`<source>_<batchId>`, plus the day for daily-rotated
  * sources): stable across retries of the same batch, unique across
  * everything else writing to the sink. Implementations MUST make
  * [[writeBatch]] idempotent in `batchKey` — re-running a batch after
  * a crash between the sink write and the checkpoint commit must not
  * duplicate rows. That idempotence is the sink half of the
  * exactly-once contract (the source half is the checkpoint WAL).
  */
trait LogSink {
  def writeBatch(batch: DataFrame, batchKey: String): Unit
}
