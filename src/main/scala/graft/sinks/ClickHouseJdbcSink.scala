package graft.sinks

import java.util.Properties

import org.apache.spark.sql.{DataFrame, Row, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Direct ClickHouse writer over JDBC — the literal "2ck" of the
  * reference (Worker.php:71-80 initClickhouse, Worker.php:121
  * `$this->db->insert`; `max_sent_count` maps to [[batchSize]]).
  *
  * Two delivery modes:
  *
  *  - [[write]] — plain batch append through Spark's JDBC datasource
  *    (parallel per partition). At-least-once: a retried task re-sends
  *    its rows. Use for one-shot backfills where a retry is rerun
  *    manually.
  *  - [[writeBatch]] — the [[LogSink]] streaming path, **idempotent on
  *    batch replay**. Every insert block carries a deterministic
  *    `insert_deduplication_token` derived from (batchKey, partition,
  *    chunk), so a replayed micro-batch re-sends byte-identical blocks
  *    under the same tokens and ClickHouse drops them server-side —
  *    the JDBC analog of MergeTreeSink's idempotent `ingest_batch=`
  *    directories. Determinism is engineered, not assumed:
  *      1. rows are repartitioned by a content hash with an explicit
  *         partition count (row → partition is a pure function of the
  *         row, never of input split order);
  *      2. each partition is sorted by every column (row → chunk index
  *         is then also content-deterministic);
  *      3. chunk `c` of partition `p` inserts under token
  *         `graft_<batchKey>_p<p>_c<c>` ([[ClickHouseJdbcSink.deduplicationToken]]).
  *    A replay therefore regenerates the exact (token → block) mapping;
  *    blocks whose token ClickHouse has seen are dropped, blocks the
  *    crash lost are inserted — exactly-once per block. The scheme
  *    additionally requires one chunk == one server block: the sink
  *    pins `max_insert_block_size` to the chunk size (chunks never
  *    exceed it, so each chunk parses into exactly one block and the
  *    server never splits a chunk into token-sharing sub-blocks, which
  *    would be silently dropped as duplicates). Both settings travel as
  *    connection-URL query parameters, not `SET` statements — over
  *    ClickHouse's HTTP interface a standalone SET only sticks when the
  *    driver maintains a server session, so per-request URL settings
  *    are the only transport that works on every interface
  *    ([[ClickHouseJdbcSink.urlWithSettings]]). Requires the
  *    server to keep a deduplication log for the target table:
  *    Replicated*MergeTree has one by default; plain MergeTree needs
  *    `non_replicated_deduplication_window > 0` (documented, not
  *    assumed — SURVEY §5).
  *
  * The zero-egress build container carries no ClickHouse server or
  * JDBC driver, so both write paths are compile-checked only and
  * exercised via [[MergeTreeSink]], the storage-semantics stand-in;
  * token derivation, block determinism, and the INSERT construction
  * are unit-tested without a server (SinkAndPlanSpec). On a real
  * cluster point `url` at `jdbc:clickhouse://host:8123/logs` with the
  * official driver on the classpath and the reference's table DDL
  * (readme.md:108-124) applied.
  */
final case class ClickHouseJdbcSink(
    url: String,
    table: String,
    user: String = "default",
    password: String = "",
    batchSize: Int = 100000,
    numWriters: Int = 8) extends LogSink {

  private def props: Properties = {
    val p = new Properties()
    p.setProperty("user", user)
    p.setProperty("password", password)
    p.setProperty("batchsize", batchSize.toString)
    // ClickHouse appends via INSERT only; isolation is a no-op there
    p.setProperty("isolationLevel", "NONE")
    p
  }

  /** Plain batch append (at-least-once). */
  def write(batch: DataFrame): Unit =
    batch.write.mode(SaveMode.Append).jdbc(url, table, props)

  /** Idempotent streaming micro-batch write — see class doc for the
    * exactly-once construction.
    */
  override def writeBatch(batch: DataFrame, batchKey: String): Unit = {
    val routed = ClickHouseJdbcSink.routeDeterministic(batch, numWriters)
    val sql = ClickHouseJdbcSink.insertSql(table, batch.schema)
    val (u, usr, pwd, chunkRows) = (url, user, password, batchSize)
    routed.foreachPartition { rows: Iterator[Row] =>
      if (rows.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        // The token scheme is sound ONLY if one chunk == one server-side
        // insert block. Two ways that breaks: (a) the server splits an
        // INSERT larger than max_insert_block_size into several blocks —
        // all sharing the chunk's token, so ClickHouse silently DROPS
        // every block after the first as a "duplicate" (data loss on the
        // happy path, not just on replay); (b) a JDBC driver that splits
        // one addBatch/executeBatch group into several INSERT statements.
        // (a) is closed by pinning max_insert_block_size to the chunk
        // size (chunks never exceed chunkRows, so each chunk parses into
        // exactly one block); (b) is a driver contract — the official
        // clickhouse-jdbc sends one batch as one INSERT; a
        // pooling/rewriting proxy (rewriteBatchedStatements semantics)
        // must not sit between this sink and the server.
        //
        // Both settings ride the connection URL, NOT `SET` statements:
        // over the HTTP interface a standalone SET only affects later
        // queries if the driver holds a server session, so SET-based
        // delivery silently degrades to at-least-once on session-less
        // drivers. URL query parameters attach to every request the
        // connection issues, on every interface. The token differs per
        // chunk, so each chunk opens its own connection — amortized
        // over `batchSize` (default 100k) rows, negligible.
        var chunk = 0L
        rows.grouped(chunkRows).foreach { block =>
          val chunkUrl = ClickHouseJdbcSink.urlWithSettings(u, Seq(
            "max_insert_block_size" -> chunkRows.toString,
            "insert_deduplication_token" ->
              ClickHouseJdbcSink.deduplicationToken(batchKey, pid, chunk)))
          val conn = java.sql.DriverManager.getConnection(chunkUrl, usr, pwd)
          try {
            val stmt = conn.prepareStatement(sql)
            try {
              block.foreach { row =>
                var i = 0
                while (i < row.length) { stmt.setObject(i + 1, row.get(i)); i += 1 }
                stmt.addBatch()
              }
              stmt.executeBatch()
            } finally stmt.close()
          } finally conn.close()
          chunk += 1L
        }
      }
    }
  }
}

object ClickHouseJdbcSink {

  /** Deterministic (row → partition → within-partition position)
    * layout: repartition by a content hash with an EXPLICIT partition
    * count (AQE must not coalesce — partition ids are part of the
    * dedup token), then sort each partition by every column. Two
    * evaluations of the same logical batch — the original attempt and
    * its replay — produce identical per-partition row sequences, which
    * is what makes chunk-level tokens exact.
    */
  def routeDeterministic(batch: DataFrame, numWriters: Int): DataFrame = {
    val cols = batch.columns.toSeq.map(col)
    batch
      .repartition(numWriters, pmod(xxhash64(cols: _*), lit(numWriters)))
      .sortWithinPartitions(cols: _*)
  }

  /** Append ClickHouse settings to a JDBC URL as query parameters —
    * the per-request transport that works on every interface (the
    * alternative, standalone `SET` statements, only sticks over HTTP
    * when the driver maintains a server session). Values are restricted
    * to URL-safe characters (settings names and [[deduplicationToken]]
    * output both are) so no encoder is needed.
    */
  def urlWithSettings(url: String, settings: Seq[(String, String)]): String = {
    settings.foreach { case (k, v) =>
      require(k.matches("[A-Za-z0-9_]+") && v.matches("[A-Za-z0-9_-]*"),
        s"non-URL-safe ClickHouse setting: $k=$v")
    }
    if (settings.isEmpty) url
    else {
      val sep = if (url.contains("?")) "&" else "?"
      url + sep + settings.map { case (k, v) => s"$k=$v" }.mkString("&")
    }
  }

  /** Deterministic per-insert-block deduplication token. Must be (a) a
    * pure function of its inputs — replays regenerate it bit-identically
    * — and (b) collision-free across blocks: batchKey is unique per
    * micro-batch (TailPipeline contract), and (partition, chunk)
    * uniquely address a block within the batch. Kept to `[A-Za-z0-9_-]`
    * so it embeds safely as a URL query parameter
    * ([[urlWithSettings]] requires it).
    */
  def deduplicationToken(batchKey: String, partitionId: Int, chunk: Long): String = {
    require(batchKey.matches("[A-Za-z0-9_-]+"), s"unsafe batch key: $batchKey")
    s"graft_${batchKey}_p${partitionId}_c$chunk"
  }

  /** `INSERT INTO t (c1, c2, ...) VALUES (?, ?, ...)` for the batch
    * schema — explicit column list so the write survives server-side
    * columns the batch doesn't carry (DEFAULT/MATERIALIZED).
    */
  def insertSql(table: String, schema: StructType): String = {
    val names = schema.fields.map(f => s"`${f.name}`").mkString(", ")
    val marks = schema.fields.map(_ => "?").mkString(", ")
    s"INSERT INTO $table ($names) VALUES ($marks)"
  }
}
