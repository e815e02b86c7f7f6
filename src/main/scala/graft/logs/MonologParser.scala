package graft.logs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The core line→typed-columns transform of the engine (reference
  * Worker.php:25 DEFAULT_PATTERN, Worker.php:131-148 progressLine).
  *
  * Everything here is built-in codegen'd Catalyst expressions
  * (`regexp_extract`, `rlike`, `to_timestamp_ntz`) — no UDFs — so the
  * parse stage stays inside whole-stage codegen and is embarrassingly
  * parallel: at 100 TB it is a pure map over the scan with zero
  * shuffles.
  */
object MonologParser {

  /** Group-indexed equivalent of the reference's named-group monolog
    * pattern (Worker.php:25). Groups: 1 created_at, 2 logger, 3 level,
    * 4 message, 5 context, 6 extra.
    *
    * Recorded deviation: the reference separates logger and level with
    * an UNESCAPED `.` (any character), so it also parses lines like
    * `app INFO:`. Here the dot is escaped — a literal `logger.LEVEL`
    * separator per the monolog spec — so such malformed lines are
    * dead-lettered rather than silently mis-parsed. Intentional
    * strictness fix, also noted in SURVEY.md §2 row 4.
    */
  val DefaultPattern: String =
    "\\[(.*)\\] (\\w+)\\.(\\w+): (.*[^ ]+) ([^ ]+) ([^ ]+)"

  val TimestampFormat = "yyyy-MM-dd HH:mm:ss"

  private def regexOf(cfg: TailConfig): String = cfg.pattern match {
    case PatternMode.Custom(re) => re
    case _                      => DefaultPattern
  }

  /** Parse matching lines into the canonical log schema and enrich with
    * `repo`/`name`/`host` (Worker.php:146-148). Non-matching lines are
    * dropped here — route them with [[deadLetter]] (Worker.php:151-156).
    * In `Raw` mode the line passes through unparsed (`pattern=false`,
    * Worker.php:179-182).
    */
  def parse(lines: DataFrame, cfg: TailConfig, lineCol: String = "line"): DataFrame = {
    val l = col(lineCol)
    val base = cfg.pattern match {
      case PatternMode.Raw => lines.select(l.as("raw"))
      case _ =>
        val pat = regexOf(cfg)
        // Single-pass extraction: one regex execution per line instead
        // of rlike + 6 regexp_extract (7 executions) — this transform
        // runs on 100% of ingested rows.
        // OptimizerFence (round 17, guide §4.4): without it the
        // isNotNull filter is pushed below this projection AND below
        // the adaptive input spread, so the regex executed TWICE per
        // surviving row with one copy trapped in the 1-task pre-spread
        // scan stage (measured in plans/r16 parse_monolog; fixed plans
        // in plans/r17). The fence pins extraction + filter above the
        // spread: one execution per row, at full parallelism.
        val g = graft.functions.OptimizerFence(graft.functions.RegexpExtractGroups(l, pat))
        lines
          .select(g.as("_g"))
          .where(col("_g").isNotNull)
          .select(
            to_timestamp_ntz(element_at(col("_g"), 1), lit(cfg.timestampFormat)).as("created_at"),
            element_at(col("_g"), 2).as("logger"),
            element_at(col("_g"), 3).as("level"),
            element_at(col("_g"), 4).as("message"),
            element_at(col("_g"), 5).as("context"),
            element_at(col("_g"), 6).as("extra"))
    }
    val enriched = base
      .withColumn("repo", lit(cfg.repo))
      .withColumn("name", lit(cfg.name))
      .withColumn("host", lit(cfg.host))
    cfg.transform.fold(enriched)(f => f(enriched))
  }

  /** Lines the pattern does not match — the reference logs these instead
    * of silently dropping them (Worker.php:151-156). Raw mode has no
    * failures by construction.
    */
  def deadLetter(lines: DataFrame, cfg: TailConfig, lineCol: String = "line"): DataFrame =
    cfg.pattern match {
      case PatternMode.Raw => lines.limit(0).select(col(lineCol).as("raw"))
      case _               => lines.where(!col(lineCol).rlike(regexOf(cfg))).select(col(lineCol).as("raw"))
    }
}
