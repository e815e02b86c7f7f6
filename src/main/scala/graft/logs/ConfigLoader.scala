package graft.logs

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.sinks.{ClickHouseJdbcSink, LogSink, MergeTreeSink}
import graft.streaming.{SupervisionLog, TailManager, TailPipeline}

/** Config-file-driven deployment — the reference is driven entirely by
  * a config array (reference test.config.php:1-50, consumed in
  * Worker.php:56-66): a `tails` list with per-source path / repo /
  * pattern (`false` = raw mode) / per-tail sink override, plus a
  * default sink. This loader reads the same shape as JSON so an
  * operator can deploy graft without writing Scala:
  *
  * {{{
  * {
  *   "sink": {"path": "/data/warehouse", "ttl_days": 10},
  *   "checkpoint_root": "/data/checkpoints",
  *   "tails": [
  *     {"name": "access", "repo": "api2", "host": "web1",
  *      "path": "/logs/access-{date}.log",
  *      "pattern": "\\[(.*)\\] (\\w+)\\.(\\w+): (.*) (.*) (.*)",
  *      "timestamp_format": "yyyy-MM-dd HH:mm:ss",
  *      "tail_from_end": true,
  *      "dead_letter": "/data/dl/access",
  *      "sink": {"path": "/data/access_wh", "ttl_days": 3}},
  *     {"name": "raw", "repo": "api2", "path": "/logs/raw.log",
  *      "pattern": false}
  *   ]
  * }
  * }}}
  *
  * `pattern` omitted → the default monolog regex; a string → custom
  * regex; JSON `false` → raw pass-through — byte-for-byte the
  * reference's `'pattern' => false` contract (Worker.php:179-182).
  * The per-line `callback` hook is code, not config, so it has no JSON
  * form — attach it programmatically via `TailConfig.transform`.
  *
  * A sink block is either the parquet warehouse above, or the
  * reference's namesake direct-to-ClickHouse connection — the JSON
  * form of the per-tail `clickhouse` param block (test.config.php
  * `clickhouse` key, consumed at Worker.php:184-187
  * `getClickhouseParam`):
  *
  * {{{
  * "sink": {"type": "clickhouse",
  *          "url": "jdbc:clickhouse://ch1:8123/logs",
  *          "table": "logs.monolog",
  *          "user": "default", "password": "",
  *          "batch_size": 100000}
  * }}}
  *
  * `type` omitted (or `"parquet"`/`"mergetree"`) selects the parquet
  * sink; `batch_size` is the reference's `max_sent_count`. Both sink
  * kinds sit behind [[graft.sinks.LogSink]], so a tail can override
  * the default with either.
  *
  * The file is read through the Hadoop FileSystem, so configs deploy
  * from HDFS/S3 alongside the data.
  */
object ConfigLoader {

  final case class TailEntry(
      cfg: TailConfig,
      inputPath: String,
      sink: LogSink,
      deadLetterPath: Option[String],
      tailFromEnd: Boolean)

  final case class EngineConfig(
      defaultSink: LogSink,
      checkpointRoot: String,
      tails: Seq[TailEntry],
      supervisionLog: Option[SupervisionLog] = None,
      pollSecs: Option[Long] = None)

  def load(spark: SparkSession, path: String): EngineConfig = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(p)
    val json =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    parse(json)
  }

  def parse(json: String): EngineConfig = {
    val root = new ObjectMapper().readTree(json)
    val sinkNode = require(root, "sink")
    val defaultSink = sinkOf(sinkNode)
    val checkpointRoot = require(root, "checkpoint_root").asText()
    val tails = require(root, "tails").elements().asScala.map { t =>
      val pattern = Option(t.get("pattern")) match {
        case None                        => PatternMode.Default
        case Some(n) if n.isBoolean && !n.asBoolean() => PatternMode.Raw
        case Some(n) if n.isTextual     => PatternMode.Custom(n.asText())
        case Some(n) => throw new IllegalArgumentException(s"bad pattern: $n")
      }
      val cfg = TailConfig(
        name = require(t, "name").asText(),
        repo = require(t, "repo").asText(),
        host = Option(t.get("host")).map(_.asText()).getOrElse(TailConfig.defaultHost),
        pattern = pattern,
        timestampFormat = Option(t.get("timestamp_format")).map(_.asText())
          .getOrElse(MonologParser.TimestampFormat))
      TailEntry(
        cfg = cfg,
        inputPath = require(t, "path").asText(),
        sink = Option(t.get("sink")).map(sinkOf).getOrElse(defaultSink),
        deadLetterPath = Option(t.get("dead_letter")).map(_.asText()),
        tailFromEnd = Option(t.get("tail_from_end")).exists(_.asBoolean()))
    }.toSeq
    // optional supervision-history table (the reference Manager's dated
    // operational log files, ToolsTraits.php:29-37, as a queryable
    // MergeTree table): {"supervision": {"path": ..., "ttl_days": ...}}
    val supervision = Option(root.get("supervision")).map { n =>
      new SupervisionLog(
        MergeTreeSink(
          require(n, "path").asText(),
          ttlDays = Option(n.get("ttl_days")).map(_.asInt()).getOrElse(10)),
        repo = Option(n.get("repo")).map(_.asText()).getOrElse("graft"),
        host = Option(n.get("host")).map(_.asText()).getOrElse(TailConfig.defaultHost))
    }
    // optional supervision cadence for graft.Main's loop (the reference
    // Manager's fixed 10 s sleep, Manager.php:57). Jackson's asLong()
    // silently yields 0 for non-numeric nodes, and 0/negative would
    // turn the loop into a busy spin (sleep skipped,
    // awaitAnyTermination(0) returns immediately) — reject both here,
    // consistent with the strict validation everywhere else in load.
    val pollSecs = Option(root.get("supervise_poll_secs")).map { n =>
      if (!n.isIntegralNumber || n.asLong() <= 0)
        throw new IllegalArgumentException(
          s"supervise_poll_secs must be a positive integer, got: $n")
      n.asLong()
    }
    EngineConfig(defaultSink, checkpointRoot, tails, supervision, pollSecs)
  }

  private def sinkOf(n: JsonNode): LogSink =
    Option(n.get("type")).map(_.asText()).getOrElse("parquet") match {
      case "parquet" | "mergetree" =>
        MergeTreeSink(
          require(n, "path").asText(),
          ttlDays = Option(n.get("ttl_days")).map(_.asInt()).getOrElse(10))
      case "clickhouse" =>
        ClickHouseJdbcSink(
          url = require(n, "url").asText(),
          table = require(n, "table").asText(),
          user = Option(n.get("user")).map(_.asText()).getOrElse("default"),
          password = Option(n.get("password")).map(_.asText()).getOrElse(""),
          batchSize = Option(n.get("batch_size")).map(_.asInt()).getOrElse(100000),
          numWriters = Option(n.get("num_writers")).map(_.asInt()).getOrElse(8))
      case other =>
        throw new IllegalArgumentException(s"unknown sink type '$other'")
    }

  private def require(n: JsonNode, field: String): JsonNode =
    Option(n.get(field)).getOrElse(
      throw new IllegalArgumentException(s"config missing required field '$field'"))

  /** Config → runnable pipelines under one manager (supervision
    * history wired when the config carries a `supervision` block).
    */
  def manager(spark: SparkSession, conf: EngineConfig): TailManager =
    new TailManager(conf.tails.map { t =>
      TailPipeline(
        spark, t.cfg, t.inputPath,
        checkpointDir = s"${conf.checkpointRoot}/${t.cfg.name}",
        sink = t.sink,
        deadLetterPath = t.deadLetterPath,
        tailFromEnd = t.tailFromEnd)
    }, conf.supervisionLog)
}
