package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.logs.{MonologParser, PatternMode, TailConfig}

class MonologParserSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val cfg = TailConfig(name = "access", repo = "api2", host = "h1")

  private def lines = Seq(
    """[2024-01-01 10:00:00] app.ERROR: boom happened {"a":1} []""",
    """[2024-01-01 10:00:01] web.INFO: ok {} []""",
    "garbage line").toDF("line")

  test("parses monolog lines into typed columns with enrichment") {
    val out = MonologParser.parse(lines, cfg).orderBy("created_at").collect()
    assert(out.length == 2)
    val r = out.head
    assert(r.getAs[java.time.LocalDateTime]("created_at") ==
      java.time.LocalDateTime.of(2024, 1, 1, 10, 0, 0))
    assert(r.getAs[String]("logger") == "app")
    assert(r.getAs[String]("level") == "ERROR")
    assert(r.getAs[String]("message") == "boom happened")
    assert(r.getAs[String]("context") == """{"a":1}""")
    assert(r.getAs[String]("extra") == "[]")
    assert(r.getAs[String]("repo") == "api2")
    assert(r.getAs[String]("name") == "access")
    assert(r.getAs[String]("host") == "h1")
  }

  test("dead-letters non-matching lines instead of dropping them") {
    val dl = MonologParser.deadLetter(lines, cfg).as[String].collect()
    assert(dl.toSeq == Seq("garbage line"))
  }

  test("raw mode passes lines through unparsed (pattern=false)") {
    val out = MonologParser.parse(lines, cfg.copy(pattern = PatternMode.Raw))
    assert(out.columns.toSeq == Seq("raw", "repo", "name", "host"))
    assert(out.count() == 3)
  }

  test("callback transform hook is applied after parsing") {
    val mask: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      df => df.withColumn("message", upper(col("message")))
    val out = MonologParser.parse(lines, cfg.copy(transform = Some(mask)))
      .orderBy("created_at").select("message").as[String].collect()
    assert(out.toSeq == Seq("BOOM HAPPENED", "OK"))
  }

  test("custom pattern mode parses alternative formats") {
    val custom = "(\\S+) (\\w+)\\.(\\w+): (.*) (\\S+) (\\S+)"
    val df = Seq("""2024-01-01T00:00:00 svc.WARN: slow query {} []""").toDF("line")
    val out = MonologParser.parse(df, cfg.copy(
      pattern = PatternMode.Custom(custom), timestampFormat = "yyyy-MM-dd'T'HH:mm:ss"))
    assert(out.select("level").as[String].head() == "WARN")
  }

  test("json-lines parser inverts the json formatter and dead-letters garbage") {
    val jl = Seq(
      """{"created_at":"2024-01-01 10:00:00","logger":"app","level":"ERROR","message":"boom","context":"{}","extra":"[]"}""",
      "not json at all").toDF("line")
    val out = graft.logs.JsonLogParser.parse(jl, cfg)
    assert(out.count() == 1)
    val r = out.head()
    assert(r.getAs[String]("level") == "ERROR" && r.getAs[String]("message") == "boom")
    assert(r.getAs[String]("repo") == "api2")
    val dl = graft.logs.JsonLogParser.deadLetter(jl, cfg).as[String].collect()
    assert(dl.toSeq == Seq("not json at all"))
  }

  test("approx distinct stays within 5% of exact on testdata") {
    val ev = Tables(spark, TestSpark.SfDir, "events")
    val exact = ev.groupBy("event_type").agg(countDistinct("user_id").as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = ev.groupBy("event_type").agg(approx_count_distinct("user_id").as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e < 0.05, s"$k: approx $a vs exact $e")
    }
  }

  test("parse stage has no shuffle (map-only at any scale)") {
    val plan = MonologParser.parse(lines, cfg).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in parse plan:\n$plan")
  }
}
