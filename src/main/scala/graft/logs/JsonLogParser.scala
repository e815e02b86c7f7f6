package graft.logs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON-lines log parsing — monolog's JSON formatter is the other common
  * wire format next to the default line formatter the regex path
  * handles (reference readme.md "Usage specification": one line per
  * record). `from_json` with an explicit schema is codegen'd and
  * row-local, so like the regex path this is a shuffle-free map.
  */
object JsonLogParser {

  /** Wire schema of a monolog-style JSON log line. */
  val Schema: StructType = StructType(Seq(
    StructField("created_at", StringType),
    StructField("logger", StringType),
    StructField("level", StringType),
    StructField("message", StringType),
    StructField("context", StringType),
    StructField("extra", StringType)))

  /** Parse JSON lines into the same canonical schema as
    * [[MonologParser.parse]]; unparseable lines (null struct after
    * `from_json`) go to [[deadLetter]].
    */
  def parse(lines: DataFrame, cfg: TailConfig, lineCol: String = "line"): DataFrame = {
    // OptimizerFence (round 17, guide §4.4): the two-conjunct null
    // filter used to be pushed below this projection and below the
    // adaptive input spread with from_json REWRITTEN INTO EACH
    // CONJUNCT — three full JSON parses per surviving row, two of them
    // in the 1-task pre-spread scan stage (plans/r16
    // parse_json_logs). The fence pins the parse + filter above the
    // spread: one parse per row, at full parallelism.
    val parsed = lines
      .select(graft.functions.OptimizerFence(from_json(col(lineCol), Schema)).as("_j"))
      .where(col("_j").isNotNull && col("_j.created_at").isNotNull)
      .select(
        to_timestamp_ntz(col("_j.created_at"), lit(cfg.timestampFormat)).as("created_at"),
        col("_j.logger").as("logger"),
        col("_j.level").as("level"),
        col("_j.message").as("message"),
        col("_j.context").as("context"),
        col("_j.extra").as("extra"))
      .withColumn("repo", lit(cfg.repo))
      .withColumn("name", lit(cfg.name))
      .withColumn("host", lit(cfg.host))
    cfg.transform.fold(parsed)(f => f(parsed))
  }

  def deadLetter(lines: DataFrame, cfg: TailConfig, lineCol: String = "line"): DataFrame =
    lines
      .select(col(lineCol).as("raw"), from_json(col(lineCol), Schema).as("_j"))
      .where(col("_j").isNull || col("_j.created_at").isNull)
      .select("raw")
}
