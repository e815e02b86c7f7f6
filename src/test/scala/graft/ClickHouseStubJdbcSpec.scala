package graft

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, Driver, DriverManager, DriverPropertyInfo, PreparedStatement, SQLException}
import java.util.Properties

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.ClickHouseJdbcSink

/** In-process model of the slice of ClickHouse the sink's exactly-once
  * construction relies on (Worker.php:71-80 initClickhouse semantics):
  * an insert-deduplication window keyed by `insert_deduplication_token`
  * (blocks under a seen token are silently dropped, the documented
  * Replicated*MergeTree behavior) plus one-shot per-token network
  * failures to drive the retry path. Everything is recorded so specs
  * can assert the exact (token → block) mapping the sink produced.
  */
object StubChServer {

  /** One executeBatch as the server saw it. */
  final case class Insert(
      token: String,
      maxBlockSize: Int,
      sql: String,
      rows: Vector[Vector[Any]],
      dropped: Boolean)

  private val lock = new Object
  private var log = Vector.empty[Insert]
  private val seen = mutable.Set.empty[String] // the dedup window
  private val failOnce = mutable.Set.empty[String] // armed failures
  private var stored = Vector.empty[Vector[Any]] // table contents

  def reset(): Unit = lock.synchronized {
    log = Vector.empty; seen.clear(); failOnce.clear(); stored = Vector.empty
  }

  /** Arm a simulated network failure: the FIRST executeBatch carrying
    * `token` throws (after any earlier chunks of the same task already
    * committed), later ones succeed — the mid-batch crash shape.
    */
  def armFailure(token: String): Unit = lock.synchronized { failOnce += token; () }

  def inserts: Vector[Insert] = lock.synchronized(log)
  def tableRows: Vector[Vector[Any]] = lock.synchronized(stored)

  private def queryParams(url: String): Map[String, String] =
    url.split('?') match {
      case Array(_, qs) =>
        qs.split('&').toSeq.map { kv =>
          val Array(k, v) = kv.split('=')
          k -> v
        }.toMap
      case _ => Map.empty
    }

  def executeBatch(url: String, sql: String, rows: Vector[Vector[Any]]): Unit =
    lock.synchronized {
      val params = queryParams(url)
      // The sink's contract: BOTH settings ride the connection URL (a
      // standalone SET does not stick on session-less HTTP drivers) —
      // the stub refuses inserts that arrive without them, so a
      // regression to SET-based delivery fails loudly here.
      val token = params.getOrElse("insert_deduplication_token",
        throw new SQLException("stub: insert arrived without insert_deduplication_token on the URL"))
      val maxBlock = params.getOrElse("max_insert_block_size",
        throw new SQLException("stub: insert arrived without max_insert_block_size on the URL")).toInt
      // A real server would SPLIT an oversized INSERT into several
      // blocks all sharing this token — every block after the first
      // silently dropped as a duplicate. That is the one failure mode
      // the sink must never trigger; the stub makes it a hard error.
      if (rows.size > maxBlock)
        throw new SQLException(
          s"stub: chunk of ${rows.size} rows exceeds max_insert_block_size=$maxBlock — " +
            "the server would split it into token-sharing sub-blocks (silent data loss)")
      if (failOnce.remove(token))
        throw new SQLException(s"stub: simulated network failure for $token")
      val dup = seen.contains(token)
      if (!dup) { seen += token; stored ++= rows }
      log :+= Insert(token, maxBlock, sql, rows, dropped = dup)
    }
}

/** A real `java.sql.Driver` registered with `DriverManager` under
  * `jdbc:graftstub:` URLs, so [[ClickHouseJdbcSink.writeBatch]]'s own
  * `DriverManager.getConnection` path runs unmodified inside executor
  * tasks. Connections/statements are reflective proxies implementing
  * exactly the calls the sink makes; anything else throws, keeping the
  * stub honest about what the sink depends on.
  */
final class StubChDriver extends Driver {
  override def connect(url: String, info: Properties): Connection =
    if (!acceptsURL(url)) null else StubChDriver.connection(url)
  override def acceptsURL(url: String): Boolean =
    url != null && url.startsWith(StubChDriver.UrlPrefix)
  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def getPropertyInfo(url: String, info: Properties): Array[DriverPropertyInfo] =
    Array.empty
  override def jdbcCompliant(): Boolean = false
  override def getParentLogger: java.util.logging.Logger =
    java.util.logging.Logger.getGlobal
}

object StubChDriver {
  val UrlPrefix = "jdbc:graftstub:"

  private lazy val registered: Unit = DriverManager.registerDriver(new StubChDriver)
  def ensureRegistered(): Unit = registered

  private def proxy[T](cls: Class[T])(
      handle: (AnyRef, String, Array[AnyRef]) => AnyRef): T =
    Proxy.newProxyInstance(cls.getClassLoader, Array[Class[_]](cls),
      new InvocationHandler {
        def invoke(p: AnyRef, m: Method, args: Array[AnyRef]): AnyRef =
          m.getName match {
            case "hashCode" => Integer.valueOf(java.lang.System.identityHashCode(p))
            case "equals" => java.lang.Boolean.valueOf(p eq args(0))
            case name => handle(p, name, if (args == null) Array.empty else args)
          }
      }).asInstanceOf[T]

  private[graft] def connection(url: String): Connection =
    proxy(classOf[Connection]) { (_, name, args) =>
      name match {
        case "prepareStatement" => statement(url, args(0).asInstanceOf[String])
        case "close" | "setAutoCommit" | "commit" | "rollback" | "clearWarnings" => null
        case "isClosed" => java.lang.Boolean.FALSE
        case "getAutoCommit" => java.lang.Boolean.TRUE
        case "isValid" => java.lang.Boolean.TRUE
        case "toString" => s"StubConnection($url)"
        case other => throw new SQLException(s"stub connection does not implement $other")
      }
    }

  private def statement(url: String, sql: String): PreparedStatement = {
    val current = mutable.Map.empty[Int, Any] // 1-based parameter index
    val batch = mutable.ArrayBuffer.empty[Vector[Any]]
    proxy(classOf[PreparedStatement]) { (_, name, args) =>
      name match {
        case "setObject" =>
          current(args(0).asInstanceOf[Integer].intValue) = args(1); null
        case "addBatch" =>
          val n = if (current.isEmpty) 0 else current.keys.max
          batch += (1 to n).map(i => current.getOrElse(i, null)).toVector
          current.clear(); null
        case "executeBatch" =>
          val rows = batch.toVector
          StubChServer.executeBatch(url, sql, rows)
          batch.clear()
          Array.fill(rows.size)(java.sql.Statement.SUCCESS_NO_INFO)
        case "close" | "clearBatch" | "clearParameters" => null
        case "toString" => s"StubStatement($sql)"
        case other => throw new SQLException(s"stub statement does not implement $other")
      }
    }
  }
}

/** The sink's exactly-once state machine exercised WITHOUT a server —
  * the always-running counterpart of the env-gated
  * [[ClickHouseIntegrationSpec]]: insert batching (`batchSize` = the
  * reference's `max_sent_count`), token-dedup replay, and the
  * retry-after-mid-batch-failure path, all through the sink's real
  * `DriverManager` code inside executor tasks.
  */
class ClickHouseStubJdbcSpec extends AnyFunSuite {

  private val spark = TestSpark.spark

  private def dataset(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, s"line $i payload")).toDF("id", "message")
  }

  private def sink = ClickHouseJdbcSink(
    url = s"${StubChDriver.UrlPrefix}//ch1:8123/logs",
    table = "logs.monolog",
    user = "ingest",
    password = "pw",
    batchSize = 30,
    numWriters = 4)

  private def storedIds: Seq[Long] =
    StubChServer.tableRows.map(_.head.asInstanceOf[Long]).sorted

  test("writeBatch chunks at batchSize under per-chunk tokens; replay drops every block server-side") {
    StubChDriver.ensureRegistered()
    StubChServer.reset()
    val n = 200
    sink.writeBatch(dataset(n), batchKey = "b0001")

    val first = StubChServer.inserts
    assert(first.nonEmpty && first.forall(!_.dropped), "first delivery must insert every block")
    assert(storedIds == (0L until n.toLong), "all rows stored exactly once")
    // batching: every chunk within max_sent_count, settings on the URL
    // (the stub throws on oversized or setting-less inserts, so getting
    // here already proves one-chunk-one-block held)
    assert(first.forall(i => i.rows.nonEmpty && i.rows.size <= 30))
    assert(first.forall(_.maxBlockSize == 30), "max_insert_block_size pinned to the chunk size")
    assert(first.forall(_.sql == "INSERT INTO logs.monolog (`id`, `message`) VALUES (?, ?)"))
    // token addressing: unique per block, the documented shape
    val tokens = first.map(_.token)
    assert(tokens.distinct.size == tokens.size, "tokens must be collision-free across blocks")
    assert(tokens.forall(_.matches("graft_b0001_p\\d+_c\\d+")))
    assert(tokens.exists(_.endsWith("_c1")),
      "a 50-row partition at batchSize=30 must produce a second chunk (batching exercised)")

    // micro-batch replay (the at-least-once upstream re-delivers):
    // byte-identical blocks under the same tokens, ALL dropped by the
    // server's dedup window — table contents unchanged
    sink.writeBatch(dataset(n), batchKey = "b0001")
    val replayed = StubChServer.inserts.drop(first.size)
    assert(replayed.size == first.size, "replay must regenerate exactly the original blocks")
    assert(replayed.forall(_.dropped), "every replayed block must be dropped as a duplicate")
    val firstByToken = first.map(i => i.token -> i.rows).toMap
    replayed.foreach { i =>
      assert(firstByToken(i.token) == i.rows,
        s"replayed block under ${i.token} must be bit-identical to the original")
    }
    assert(storedIds == (0L until n.toLong), "replay must not change table contents")
  }

  test("mid-batch failure then replay: lost blocks inserted, committed blocks deduped — exactly once overall") {
    StubChDriver.ensureRegistered()
    StubChServer.reset()
    val n = 200
    // Routing is a pure function of row content (routeDeterministic),
    // so a dry run under another batchKey reveals which (partition,
    // chunk) addresses this dataset produces — pick a second chunk to
    // fail, so its partition's FIRST chunk has already committed when
    // the connection "drops" (the worst-case mid-task crash point).
    sink.writeBatch(dataset(n), batchKey = "dryrun")
    val addresses = StubChServer.inserts.map(_.token.stripPrefix("graft_dryrun_"))
    val failAt = addresses.find(_.endsWith("_c1"))
      .getOrElse(fail("expected a multi-chunk partition at n=200, batchSize=30"))
    StubChServer.reset()

    StubChServer.armFailure(s"graft_b0002_$failAt")
    val boom = intercept[Exception] { sink.writeBatch(dataset(n), batchKey = "b0002") }
    assert(boom.getMessage != null, "failed delivery surfaces to the caller for replay")
    val attempt1 = StubChServer.inserts
    assert(attempt1.forall(!_.dropped), "nothing is a duplicate on the first attempt")
    assert(attempt1.size < addresses.size, "the armed failure must have lost at least one block")

    // the retry: upstream replays the SAME micro-batch (Worker.php's
    // reconnect-and-resend, lifted to batch granularity)
    sink.writeBatch(dataset(n), batchKey = "b0002")
    assert(storedIds == (0L until n.toLong),
      "after replay the table holds every row exactly once")
    val attempt2 = StubChServer.inserts.drop(attempt1.size)
    val committedBefore = attempt1.map(_.token).toSet
    attempt2.foreach { i =>
      assert(i.dropped == committedBefore.contains(i.token),
        s"${i.token}: replay must dedup committed blocks and insert lost ones")
    }
    // every address from the dry run ended up committed exactly once
    val committed = StubChServer.inserts.filter(!_.dropped).map(_.token).sorted
    assert(committed == addresses.map(a => s"graft_b0002_$a").sorted,
      "exactly one committed block per (partition, chunk) address")
  }

  test("streaming tail → parse → JDBC sink: mid-batch failure kills the query, checkpoint restart replays exactly once") {
    // The reference's ACTUAL loop (Worker.php:94-129: tail → parse →
    // ClickHouse insert → offset commit), run end to end against the
    // recording driver: a Structured Streaming file tail feeds
    // TailPipeline whose sink is the JDBC sink at the stub URL, the
    // stub drops the connection mid-batch (after the partition's first
    // chunk committed), the query DIES before its checkpoint commit,
    // and the restart replays the same micro-batch — committed blocks
    // dedup on their tokens, lost blocks insert. Exactly-once across
    // the failure, at streaming granularity rather than the batch-call
    // granularity of the tests above.
    import java.nio.file.{Files, StandardOpenOption}
    import java.time.LocalDate
    import graft.logs.{MonologParser, TailConfig}
    import graft.streaming.TailPipeline

    StubChDriver.ensureRegistered()
    StubChServer.reset()
    val in = Files.createTempDirectory("ch_stream_in")
    val ck = Files.createTempDirectory("ch_stream_ck")
    val cfg = TailConfig(name = "ch_stream", repo = "api2")
    val n = 200
    val lines = (0 until n).map(i => f"[2024-01-01 10:${i / 60}%02d:${i % 60}%02d] app.INFO: msg_$i {} []")
    val t = in.resolve(".a.log.tmp")
    Files.write(t, String.join("\n", lines: _*).getBytes, StandardOpenOption.CREATE)
    Files.move(t, in.resolve("a.log"))

    // chunk routing is a pure function of row content, so a dry run
    // under a throwaway batch key reveals the (partition, chunk)
    // addresses this batch produces; arm the failure on a SECOND chunk
    // so its partition's first chunk has already committed when the
    // connection drops (the worst-case mid-task crash point)
    val staticBatch = spark.read.text(in.toString).withColumnRenamed("value", "line")
    sink.writeBatch(MonologParser.parse(staticBatch, cfg), "dryrun")
    val addresses = StubChServer.inserts.map(_.token.stripPrefix("graft_dryrun_"))
    val failAt = addresses.find(_.endsWith("_c1"))
      .getOrElse(fail("expected a multi-chunk partition at n=200, batchSize=30"))
    StubChServer.reset()
    StubChServer.armFailure(s"graft_ch_stream_0_$failAt")

    val pipe = TailPipeline(spark, cfg, in.toString, ck.toString, sink)
    val day = LocalDate.of(2024, 1, 1)
    val q1 = pipe.start(day)
    val boom = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
    }
    q1.stop()
    assert(boom.getMessage.contains("simulated network failure"),
      s"the streaming failure must be the armed one, got: ${boom.getMessage}")
    val attempt1 = StubChServer.inserts
    assert(attempt1.forall(!_.dropped), "nothing is a duplicate on the first attempt")
    assert(attempt1.size < addresses.size, "the armed failure must have lost at least one block")

    // checkpoint restart: the file source's WAL never committed batch 0,
    // so the SAME micro-batch (same batch id → same tokens) replays
    val q2 = pipe.start(day)
    q2.processAllAvailable()
    pipe.stopGracefully(q2)
    val attempt2 = StubChServer.inserts.drop(attempt1.size)
    assert(attempt2.nonEmpty, "the restart must re-deliver the failed micro-batch")
    val committedBefore = attempt1.map(_.token).toSet
    attempt2.foreach { i =>
      assert(i.dropped == committedBefore.contains(i.token),
        s"${i.token}: replay must dedup committed blocks and insert lost ones")
    }
    // exactly-once table contents: every parsed line exactly once
    val stored = StubChServer.tableRows
    assert(stored.size == n, s"expected $n rows exactly once, got ${stored.size}")
    assert(stored.distinct.size == n, "no duplicate rows after the replay")
    // and exactly one committed block per address, none beyond the dry run's
    val committed = StubChServer.inserts.filter(!_.dropped).map(_.token).sorted
    assert(committed == addresses.map(a => s"graft_ch_stream_0_$a").sorted,
      "exactly one committed block per (partition, chunk) address across the failure")
  }
}
