package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-17 fused-kernel equivalence: the fused codegen expressions
  * (LshBuckets, SinProjections) must be BIT-equal to the unfused
  * formulations they replace — the declared queries' results ride on
  * these floats — and the OptimizerFence must actually stop the parse
  * extraction from being duplicated below its null filter.
  */
class FusionSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(1717)
  private def vec(n: Int): Seq[java.lang.Double] =
    Seq.fill(n)(rnd.nextInt(6) match {
      case 0 => java.lang.Double.valueOf(0.0)
      case 1 => java.lang.Double.valueOf(-math.pow(10, rnd.nextInt(12) - 6) * rnd.nextDouble())
      case _ => java.lang.Double.valueOf(math.pow(10, rnd.nextInt(12) - 6) * rnd.nextDouble())
    })

  test("LshBuckets struct is bit-equal to the per-bit when/ArrayDot formulation") {
    val tables = 5
    val bits = 7
    val dim = 16
    val hp = {
      val r = new scala.util.Random(42)
      Array.fill(tables, bits, dim)(r.nextGaussian())
    }
    // rows: normal vectors, a length-mismatched vector, a vector with a
    // null element, an all-NaN vector, and a NULL vector — the per-bit
    // formulation folds every degenerate case to bucket 0
    val rows: Seq[(Int, Seq[java.lang.Double])] =
      (1 to 60).map(i => i -> vec(dim)) ++ Seq(
        61 -> vec(dim - 3),
        62 -> (vec(dim - 1) :+ null.asInstanceOf[java.lang.Double]),
        63 -> Seq.fill(dim)(java.lang.Double.valueOf(Double.NaN)),
        64 -> null.asInstanceOf[Seq[java.lang.Double]])
    // repartition blocks ConvertToLocalRelation, so the CODEGEN path
    // runs (the kernel is shared with interpreted eval)
    val df = rows.toDF("id", "vec").repartition(3)
    val fused = df.withColumn("_lsh", graft.functions.LshBuckets(col("vec"), hp))
      .select(col("id") +: (0 until tables).map(t => col("_lsh").getField(s"b$t").as(s"f$t")): _*)
    val unfused = df.select(
      col("id") +: (0 until tables).map { t =>
        (0 until bits).map { b =>
          val plane = array(hp(t)(b).map(lit(_)): _*)
          when(graft.functions.ArrayDot(col("vec"), plane) >= 0, lit(1L << b)).otherwise(lit(0L))
        }.reduce((a, c) => a.bitwiseOR(c)).as(s"u$t")
      }: _*)
    val joined = fused.join(unfused, "id")
    val bad = joined.where(
      (0 until tables).map(t => col(s"f$t") =!= col(s"u$t")).reduce(_ || _)).collect()
    assert(bad.isEmpty, s"fused/unfused bucket mismatch: ${bad.take(3).mkString(";")}")
    // schema contract: extracted bucket columns stay non-nullable longs
    fused.schema.fields.drop(1).foreach { f =>
      assert(f.dataType == org.apache.spark.sql.types.LongType && !f.nullable,
        s"${f.name} must be non-nullable long, got $f")
    }
  }

  test("LshBuckets evaluates ONCE per row: CollapseProject must not inline it per bucket") {
    val df = (1 to 4).map(i => i -> vec(8)).toDF("id", "vec").repartition(2)
    val out = graft.sim.LshAnn.withBuckets(df, "vec", numTables = 4, bitsPerTable = 3, dim = 8)
    val plan = out.queryExecution.optimizedPlan.toString
    val n = "lshbuckets".r.findAllIn(plan.toLowerCase).size
    assert(n == 1, s"expected exactly one lshbuckets in the optimized plan, got $n:\n$plan")
  }

  test("SinProjections struct is bit-equal to the HOF projection columns") {
    import graft.dedup.PairCap
    val rows: Seq[(Int, Seq[java.lang.Double], Double)] =
      (1 to 60).map(i => (i, vec(1 + rnd.nextInt(40)), rnd.nextDouble() * 6.283)) ++ Seq(
        (61, Seq.empty[java.lang.Double], 1.5),
        (62, vec(7) :+ null.asInstanceOf[java.lang.Double], 2.5),
        (63, null.asInstanceOf[Seq[java.lang.Double]], 3.5))
    val df = rows.toDF("id", "vec", "_salt").repartition(3)
    val fused = df.withColumn("_pj", graft.functions.SinProjections(
        col("vec"), col("_salt"), PairCap.ProjMult, PairCap.ProjPhase))
      .select(col("id") +: (0 until PairCap.ProjK).map(k =>
        col("_pj").getField(s"p$k").as(s"f$k")): _*)
    val unfused = df.select(
      col("id") +: (0 until PairCap.ProjK).map(k =>
        PairCap.projection(col("vec"), k, col("_salt")).as(s"u$k")): _*)
    val joined = fused.join(unfused, "id")
    val bad = joined.where(
      (0 until PairCap.ProjK).map(k =>
        !(col(s"f$k") <=> col(s"u$k"))).reduce(_ || _)).collect()
    assert(bad.isEmpty, s"fused/unfused projection mismatch: ${bad.take(3).mkString(";")}")
  }

  test("OptimizerFence keeps the parse extraction single-evaluation above its filter") {
    val lines = (1 to 20).map { i =>
      s"[2024-01-0${i % 9 + 1} 10:00:0${i % 10}] app.INFO: user $i did thing ctx$i extra$i"
    }.toDF("line").repartition(2)
    val cfg = graft.logs.TailConfig(name = "t", repo = "r")
    val parsed = graft.logs.MonologParser.parse(lines, cfg)
    val plan = parsed.queryExecution.optimizedPlan.toString
    val n = "regexpextractgroups".r.findAllIn(plan.toLowerCase).size
    assert(n == 1, s"expected exactly one regexpextractgroups in the optimized plan, got $n:\n$plan")
    assert(parsed.count() == 20)
    // json path: from_json must appear once, not once per filter conjunct
    val jlines = (1 to 10).map { i =>
      s"""{"created_at":"2024-01-01 10:00:0${i % 10}","logger":"app","level":"INFO","message":"m$i","context":"c","extra":"e"}"""
    }.toDF("line").repartition(2)
    val jparsed = graft.logs.JsonLogParser.parse(jlines, cfg)
    val jplan = jparsed.queryExecution.optimizedPlan.toString
    val jn = "from_json".r.findAllIn(jplan.toLowerCase).size
    assert(jn == 1, s"expected exactly one from_json in the optimized plan, got $jn:\n$jplan")
    assert(jparsed.count() == 10)
  }
}
