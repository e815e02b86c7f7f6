package graft

import java.sql.DriverManager
import java.util.Properties

import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.ClickHouseJdbcSink

/** Env-gated integration spec for the namesake write path (reference
  * Worker.php:71-80 initClickhouse, :119-126 batch insert). The
  * zero-egress build container has no ClickHouse server and no JDBC
  * driver, so without `GRAFT_CLICKHOUSE_URL` every test here CANCELS
  * (not passes — a canceled test is visibly "not exercised", a green
  * one would lie). The day a server is reachable:
  *
  * {{{
  * export GRAFT_CLICKHOUSE_URL=jdbc:clickhouse://ch1:8123/default
  * # optional: GRAFT_CLICKHOUSE_USER / GRAFT_CLICKHOUSE_PASSWORD
  * sbt "testOnly graft.ClickHouseIntegrationSpec"
  * }}}
  *
  * with the official ClickHouse JDBC driver on the test classpath.
  * The spec provisions its own throwaway MergeTree table (with a
  * non-replicated deduplication window, the documented requirement for
  * [[ClickHouseJdbcSink.writeBatch]]'s exactly-once tokens), exercises
  * both delivery modes plus a batch replay, reads everything back, and
  * drops the table.
  */
class ClickHouseIntegrationSpec extends AnyFunSuite {

  private val urlEnv = "GRAFT_CLICKHOUSE_URL"

  private def withServer(f: (String, String, String) => Unit): Unit =
    sys.env.get(urlEnv) match {
      case None =>
        cancel(s"$urlEnv not set — no reachable ClickHouse in this environment; " +
          "spec cancels cleanly (zero-egress container). Set the env var to run it.")
      case Some(url) =>
        f(url,
          sys.env.getOrElse("GRAFT_CLICKHOUSE_USER", "default"),
          sys.env.getOrElse("GRAFT_CLICKHOUSE_PASSWORD", ""))
    }

  private def connProps(user: String, password: String): Properties = {
    val p = new Properties()
    p.setProperty("user", user)
    p.setProperty("password", password)
    p
  }

  test("writeBatch delivers exactly-once per block: insert, replay, read back") {
    withServer { (url, user, password) =>
      val spark = TestSpark.spark
      import spark.implicits._
      val table = s"graft_it_${java.lang.System.nanoTime()}"
      val conn = DriverManager.getConnection(url, connProps(user, password))
      try {
        conn.createStatement().execute(
          s"""CREATE TABLE $table (id Int64, message String)
             |ENGINE = MergeTree ORDER BY id
             |SETTINGS non_replicated_deduplication_window = 100""".stripMargin)
        val sink = ClickHouseJdbcSink(url, table, user, password,
          batchSize = 128, numWriters = 4)
        val rows = (1 to 1000).map(i => (i.toLong, s"msg $i")).toDF("id", "message")
        sink.writeBatch(rows, "it_batch_0")
        // the crash-replay path: identical batch key → identical
        // (token → block) mapping → the server drops every block
        sink.writeBatch(rows, "it_batch_0")
        val back = spark.read.jdbc(url, table, connProps(user, password))
        assert(back.count() == 1000, "replayed micro-batch must not duplicate rows")
        assert(back.select("id").distinct().count() == 1000)
        // a DIFFERENT batch key is new data, not a replay
        sink.writeBatch(rows.where($"id" <= 10), "it_batch_1")
        assert(spark.read.jdbc(url, table, connProps(user, password)).count() == 1010)
      } finally {
        try conn.createStatement().execute(s"DROP TABLE IF EXISTS $table")
        finally conn.close()
      }
    }
  }

  test("plain batch write appends through the JDBC datasource") {
    withServer { (url, user, password) =>
      val spark = TestSpark.spark
      import spark.implicits._
      val table = s"graft_it_plain_${java.lang.System.nanoTime()}"
      val conn = DriverManager.getConnection(url, connProps(user, password))
      try {
        conn.createStatement().execute(
          s"CREATE TABLE $table (id Int64, message String) ENGINE = MergeTree ORDER BY id")
        val sink = ClickHouseJdbcSink(url, table, user, password)
        sink.write((1 to 100).map(i => (i.toLong, s"m$i")).toDF("id", "message"))
        assert(spark.read.jdbc(url, table, connProps(user, password)).count() == 100)
      } finally {
        try conn.createStatement().execute(s"DROP TABLE IF EXISTS $table")
        finally conn.close()
      }
    }
  }
}
