package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.logs.{LogLines, MonologParser, PatternMode, TailConfig}

/** Driver contract — see SURVEY.md §2 for the inventory these queries
  * cover. Each query is defined together with its DuckDB oracle SQL so
  * the two stay in lockstep (identical column names/aliases and ORDER
  * BY on both sides; driver sorts columns by name before hashing).
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame = Tables(s, dir, name)

  /** Pattern used in both Spark and DuckDB oracle SQL (same regex dialect
    * subset: RE2 and java.util.regex agree on these constructs).
    */
  private val P = MonologParser.DefaultPattern

  private val access = TailConfig(name = "access", repo = "api2", host = "host1")

  private final case class Q(fn: (SparkSession, String) => DataFrame, sql: Option[String])

  // ---------------------------------------------------------------- //
  // A. log2ck surface (SURVEY §2.A)                                   //
  // ---------------------------------------------------------------- //

  private def parseMonolog(s: SparkSession, dir: String): DataFrame = {
    val lines = LogLines.fromEvents(t(s, dir, "events"))
    MonologParser.parse(lines, access).orderBy("created_at", "message", "context")
  }

  private val parseMonologSql =
    s"""WITH lines AS (${LogLines.linesSql()})
       |SELECT strptime(regexp_extract(line, '$P', 1), '%Y-%m-%d %H:%M:%S') AS created_at,
       |       regexp_extract(line, '$P', 2) AS logger,
       |       regexp_extract(line, '$P', 3) AS level,
       |       regexp_extract(line, '$P', 4) AS message,
       |       regexp_extract(line, '$P', 5) AS context,
       |       regexp_extract(line, '$P', 6) AS extra,
       |       'api2' AS repo, 'access' AS name, 'host1' AS host
       |FROM lines WHERE regexp_matches(line, '$P')
       |ORDER BY created_at, message, context""".stripMargin

  private def parseRaw(s: SparkSession, dir: String): DataFrame = {
    val lines = LogLines.fromEvents(t(s, dir, "events"))
    MonologParser.parse(lines, access.copy(pattern = PatternMode.Raw)).orderBy("raw")
  }

  private val parseRawSql =
    s"""WITH lines AS (${LogLines.linesSql()})
       |SELECT line AS raw, 'api2' AS repo, 'access' AS name, 'host1' AS host
       |FROM lines ORDER BY raw""".stripMargin

  private def parseCallback(s: SparkSession, dir: String): DataFrame = {
    val mask: DataFrame => DataFrame =
      df => df.withColumn("message", regexp_replace(col("message"), "\\d+", "N"))
    val lines = LogLines.fromEvents(t(s, dir, "events"))
    MonologParser.parse(lines, access.copy(transform = Some(mask)))
      .select("created_at", "level", "message", "context")
      .orderBy("created_at", "context", "level", "message")
  }

  private val parseCallbackSql =
    s"""WITH lines AS (${LogLines.linesSql()})
       |SELECT strptime(regexp_extract(line, '$P', 1), '%Y-%m-%d %H:%M:%S') AS created_at,
       |       regexp_extract(line, '$P', 3) AS level,
       |       regexp_replace(regexp_extract(line, '$P', 4), '\\d+', 'N', 'g') AS message,
       |       regexp_extract(line, '$P', 5) AS context
       |FROM lines WHERE regexp_matches(line, '$P')
       |ORDER BY created_at, context, level, message""".stripMargin

  private def deadLetter(s: SparkSession, dir: String): DataFrame = {
    val lines = LogLines.fromEvents(t(s, dir, "events"), corruptEvery = 97)
    MonologParser.deadLetter(lines, access).orderBy("raw")
  }

  private val deadLetterSql =
    s"""WITH lines AS (${LogLines.linesSql(corruptEvery = 97)})
       |SELECT line AS raw FROM lines WHERE NOT regexp_matches(line, '$P')
       |ORDER BY raw""".stripMargin

  private def jsonExtract(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k_val"),
        col("event_type"))
      .orderBy("event_id")

  private val jsonExtractSql =
    """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val, event_type
      |FROM events ORDER BY event_id""".stripMargin

  private def filterLevel(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .where(col("event_type") === "error" && col("value") > 30)
      .select("event_id", "user_id", "value")
      .orderBy("event_id")

  private val filterLevelSql =
    """SELECT event_id, user_id, value FROM events
      |WHERE event_type = 'error' AND value > 30 ORDER BY event_id""".stripMargin

  private def aggLevelDaily(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(to_date(col("ts")).as("day"), col("event_type").as("level"))
      .agg(count(lit(1)).as("cnt"), round(avg(col("value")), 2).as("avg_value"))
      .orderBy("day", "level")

  private val aggLevelDailySql =
    """SELECT CAST(ts AS DATE) AS day, event_type AS level,
      |       count(*) AS cnt, round(avg(value), 2) AS avg_value
      |FROM events GROUP BY 1, 2 ORDER BY day, level""".stripMargin

  private def topMessages(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("event_type"), col("user_id"))
      .limit(10)

  private val topMessagesSql =
    """SELECT event_type, user_id, count(*) AS cnt FROM events
      |GROUP BY 1, 2 ORDER BY cnt DESC, event_type, user_id LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- //
  // Relational core on the TPC-H-ish tables (SURVEY §2.A 18-19)       //
  // ---------------------------------------------------------------- //

  private def q1Agg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .where(col("l_shipdate") <= to_timestamp_ntz(lit("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  private val q1AggSql =
    """SELECT l_returnflag, l_linestatus,
      |       round(sum(l_quantity), 2) AS sum_qty,
      |       round(sum(l_extendedprice), 2) AS sum_base_price,
      |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
      |       round(avg(l_discount), 4) AS avg_disc,
      |       count(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Shuffle join on the fact side, broadcast on the dimension side —
    * `customer` at TPC-H ratios is dimension-sized, so it is explicitly
    * broadcast (SURVEY §5).
    */
  private def q3Join(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
    val o = t(s, dir, "orders").where(col("o_orderdate") < to_timestamp_ntz(lit("1998-01-01 00:00:00")))
    val l = t(s, dir, "lineitem")
    broadcast(c)
      .join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .select(col("o_orderkey"), col("revenue"), col("o_orderdate"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(20)
  }

  private val q3JoinSql =
    """SELECT o_orderkey,
      |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
      |       o_orderdate
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY o_orderkey, o_orderdate
      |ORDER BY revenue DESC, o_orderkey LIMIT 20""".stripMargin

  /** Five-way join; all dimension sides broadcast, fact-fact shuffle on
    * the join keys with AQE handling skew (SURVEY §5).
    */
  private def q5Join(s: SparkSession, dir: String): DataFrame = {
    val r = t(s, dir, "region").where(col("r_name") === "ASIA")
    val n = t(s, dir, "nation")
    val c = t(s, dir, "customer")
    val sup = t(s, dir, "supplier")
    val o = t(s, dir, "orders")
      .where(col("o_orderdate") >= to_timestamp_ntz(lit("1995-01-01 00:00:00")) &&
        col("o_orderdate") < to_timestamp_ntz(lit("1997-01-01 00:00:00")))
    val l = t(s, dir, "lineitem")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") && col("s_nationkey") === col("c_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  private val q5JoinSql =
    """SELECT n_name,
      |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  // ---------------------------------------------------------------- //
  // Registry                                                          //
  // ---------------------------------------------------------------- //

  private val registry: Map[String, Q] = Map(
    "parse_monolog" -> Q(parseMonolog, Some(parseMonologSql)),
    "parse_raw_mode" -> Q(parseRaw, Some(parseRawSql)),
    "parse_callback" -> Q(parseCallback, Some(parseCallbackSql)),
    "dead_letter" -> Q(deadLetter, Some(deadLetterSql)),
    "json_extract_props" -> Q(jsonExtract, Some(jsonExtractSql)),
    "filter_level" -> Q(filterLevel, Some(filterLevelSql)),
    "agg_level_daily" -> Q(aggLevelDaily, Some(aggLevelDailySql)),
    "top_messages" -> Q(topMessages, Some(topMessagesSql)),
    "q1_agg" -> Q(q1Agg, Some(q1AggSql)),
    "q3_join" -> Q(q3Join, Some(q3JoinSql)),
    "q5_join" -> Q(q5Join, Some(q5JoinSql)),
  )

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, q) => k -> q.fn }

  /** DuckDB-runnable oracle SQL for each SQL-expressible query. */
  def oracleSql: Map[String, String] =
    registry.collect { case (k, Q(_, Some(sql))) => k -> sql }
}
