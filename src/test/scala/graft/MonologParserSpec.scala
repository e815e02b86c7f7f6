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

  test("regexp_groups equals java.util.regex on randomized monolog-ish lines") {
    import java.util.regex.Pattern
    import graft.functions.RegexpExtractGroups
    // The engine's front door: lines assembled at random from
    // adversarial fragments — malformed separators, half-formed
    // timestamps, bracket noise, multi-byte unicode, long runs —
    // checked for exact agreement (including null groups and
    // no-match NULLs) with java.util.regex find semantics, the
    // independent reference the expression claims to match. Seeded
    // for reproducibility; the DataFrame path exercises codegen.
    val frags = Vector(
      "[2024-01-01 10:00:00]", "[2024-13-99 :0:]", "[", "]", "app.ERROR:",
      "app.ERROR", ".", ":", " ", "  ", "msg", "boom happened", "{\"a\":1}",
      "[]", "{}", "λόγος.ИНФО:", "日本語", "émo🎈ji", "x" * 120,
      "web.INFO: ok {} []", "\t")
    val patterns = Seq(
      MonologParser.DefaultPattern, // what every production line runs through
      "\\[(.*?)\\] (\\w+)(?:\\.(\\w+))?: (.*)", // optional group -> null entries
      "(\\p{L}+)\\.(\\p{Lu}+)", // unicode character classes
      "([^ ]+) ([^ ]+)$") // anchored tail
    val rnd = new scala.util.Random(2026)
    val fuzzed = (1 to 500).map { _ =>
      Seq.fill(rnd.nextInt(8))(frags(rnd.nextInt(frags.size))).mkString
    } ++ Seq("", " ")
    val df = fuzzed.toDF("line")
    for (p <- patterns) {
      val compiled = Pattern.compile(p)
      def expected(l: String): Option[Seq[String]] = {
        val m = compiled.matcher(l)
        if (m.find()) Some((1 to m.groupCount()).map(m.group)) else None
      }
      val got = df
        .select(col("line"), RegexpExtractGroups(col("line"), p).as("g"))
        .as[(String, Option[Seq[String]])].collect()
      got.foreach { case (l, g) =>
        assert(g == expected(l), s"pattern <$p> diverged on line <$l>: got $g, want ${expected(l)}")
      }
    }
  }
}
