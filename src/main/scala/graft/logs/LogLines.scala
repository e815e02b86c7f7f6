package graft.logs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic monolog-formatted line synthesis from the driver's
  * `events` table (TESTDATA.md). The testdata has no raw log file, so the
  * correctness gate round-trips: events → formatted monolog lines →
  * [[MonologParser]] → typed columns, with a DuckDB oracle building the
  * identical lines in SQL. Line shape matches the reference's expected
  * monolog input (reference readme.md "Usage specification",
  * Worker.php:25):
  *
  * `[2024-01-01 00:03:52] app.ERROR: user 46 event 1 {"k":89} []`
  */
object LogLines {

  /** The line expression; spaces are stripped from the JSON context so it
    * satisfies the single-token `(?P<context>[^ ]+)` group, as monolog's
    * default JSON formatter does.
    */
  def lineExpr(ts: Column, eventType: Column, userId: Column, eventId: Column, props: Column): Column =
    concat(
      lit("["), date_format(ts, "yyyy-MM-dd HH:mm:ss"), lit("] app."),
      upper(eventType), lit(": user "), userId, lit(" event "), eventId,
      lit(" "), regexp_replace(props, " ", ""), lit(" []"))

  /** events → one `line` column. `corruptEvery` > 0 replaces every n-th
    * event (by id) with a non-monolog line, to exercise the dead-letter
    * path (reference Worker.php:151-156).
    */
  def fromEvents(events: DataFrame, corruptEvery: Int = 0): DataFrame = {
    val base = lineExpr(col("ts"), col("event_type"), col("user_id"), col("event_id"), col("props"))
    val line =
      if (corruptEvery > 0)
        when(col("event_id") % corruptEvery === 0, concat(lit("CORRUPT "), col("event_id"))).otherwise(base)
      else base
    // Spread before the synthesis: the parse pipelines downstream
    // (regex extract, timestamp parse) are the engine's headline
    // per-row cost and inherit the scan's partitioning — on a
    // single-row-group corpus file that is ONE task for the whole
    // parse (round-16 stage decomposition), twice under the gate
    // sort's range sampling. Hash on event_id is deterministic; every
    // consumer is row-local or aggregating.
    graft.Spread.toCores(events, col("event_id")).select(line.as("line"))
  }

  /** events → monolog-JSON-formatter lines (one JSON object per line),
    * for the [[JsonLogParser]] path. The oracle for this path computes
    * the parsed columns directly from events, so the exact JSON byte
    * layout here is free to be whatever `to_json` emits.
    */
  def jsonFromEvents(events: DataFrame): DataFrame =
    graft.Spread.toCores(events, col("event_id")).select(to_json(struct(
      date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("created_at"),
      lit("app").as("logger"),
      upper(col("event_type")).as("level"),
      concat(lit("user "), col("user_id"), lit(" event "), col("event_id")).as("message"),
      regexp_replace(col("props"), " ", "").as("context"),
      lit("[]").as("extra"))).as("line"))

  /** The same line construction as ANSI SQL for the DuckDB oracle; must
    * stay in lockstep with [[lineExpr]].
    */
  def linesSql(corruptEvery: Int = 0): String = {
    val base = "'[' || strftime(ts, '%Y-%m-%d %H:%M:%S') || '] app.' || upper(event_type) || " +
      "': user ' || user_id || ' event ' || event_id || ' ' || replace(props, ' ', '') || ' []'"
    val expr =
      if (corruptEvery > 0) s"CASE WHEN event_id % $corruptEvery = 0 THEN 'CORRUPT ' || event_id ELSE $base END"
      else base
    s"SELECT $expr AS line FROM events"
  }
}
