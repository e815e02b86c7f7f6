package graft.sinks

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Direct ClickHouse writer over JDBC — the literal "2ck" of the
  * reference (Worker.php:71-80 initClickhouse, Worker.php:121
  * `$this->db->insert`). Spark's JDBC datasource does the batched
  * inserts the reference hand-rolls (`max_sent_count` maps to
  * `batchsize`), parallel per partition.
  *
  * The zero-egress build container carries no ClickHouse server or
  * JDBC driver, so this class is compile-checked but exercised only via
  * [[MergeTreeSink]], the storage-semantics stand-in; on a real cluster
  * point `url` at `jdbc:clickhouse://host:8123/logs` with the official
  * driver on the classpath and the reference's table DDL
  * (readme.md:108-124) applied.
  */
final case class ClickHouseJdbcSink(
    url: String,
    table: String,
    user: String = "default",
    password: String = "",
    batchSize: Int = 100000) {

  private def props: Properties = {
    val p = new Properties()
    p.setProperty("user", user)
    p.setProperty("password", password)
    p.setProperty("batchsize", batchSize.toString)
    // ClickHouse appends via INSERT only; isolation is a no-op there
    p.setProperty("isolationLevel", "NONE")
    p
  }

  def write(batch: DataFrame): Unit =
    batch.write.mode(SaveMode.Append).jdbc(url, table, props)
}
