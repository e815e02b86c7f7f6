package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Stats

/** Drift statistics (PSI / grid-KS) — behavioral invariants beyond the
  * oracle value check: null shift scores zero, real shift alarms, CDFs
  * are monotone and complete, bins partition the input.
  */
class StatsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def mkPsi(ref: Seq[Double], cur: Seq[Double]) =
    Stats.psi(
      (ref.map((_, true)) ++ cur.map((_, false))).toDF("v", "is_ref"))

  private def mkKs(l: Seq[Double], r: Seq[Double]) =
    Stats.ksGrid(
      (l.map((_, true)) ++ r.map((_, false))).toDF("v", "is_l"))

  private val base = (1 to 1000).map(_.toDouble)

  test("PSI is zero for an unshifted distribution and partitions the counts") {
    val rows = mkPsi(base, base).collect()
    assert(rows.forall(r => math.abs(r.getAs[Double]("psi_term")) < 1e-9))
    assert(rows.map(_.getAs[Long]("ref_n")).sum === 1000L)
    assert(rows.map(_.getAs[Long]("cur_n")).sum === 1000L)
    // decile edges on 1..1000 give ~100 per bin on both sides
    assert(rows.forall(r => math.abs(r.getAs[Long]("ref_n") - 100L) <= 1))
  }

  test("PSI alarms on a strong mean shift") {
    val total = mkPsi(base, base.map(_ + 500.0)).collect()
      .map(_.getAs[Double]("psi_term")).sum
    assert(total > 0.2, s"shifted PSI $total should exceed the 0.2 alarm bar")
  }

  test("grid-KS is zero for identical samples and ~1 for disjoint ones") {
    val same = mkKs(base, base).collect()
    assert(same.forall(_.getAs[Double]("ks_diff") < 1e-9))

    val far = mkKs(base, base.map(_ + 10000.0)).collect()
    assert(far.map(_.getAs[Double]("ks_diff")).max > 0.99)
  }

  test("grid-KS CDFs are monotone and reach 1.0") {
    val rows = mkKs(base, base.map(_ * 2.0)).collect()
    val cl = rows.map(_.getAs[Double]("cdf_l"))
    val cr = rows.map(_.getAs[Double]("cdf_r"))
    assert(cl.zip(cl.tail).forall { case (a, b) => a <= b + 1e-12 })
    assert(cr.zip(cr.tail).forall { case (a, b) => a <= b + 1e-12 })
    assert(math.abs(cl.last - 1.0) < 1e-9 && math.abs(cr.last - 1.0) < 1e-9)
    // grid-KS lower-bounds exact KS; for a 2x scale on uniform data the
    // exact statistic is 0.5 and the 101-point grid must get close
    assert(rows.map(_.getAs[Double]("ks_diff")).max > 0.45)
  }

  test("incremental stats: merged shard summaries equal a recompute, no data rescan") {
    import spark.implicits._
    import graft.data.IncrementalStats
    val base = (1L to 400L).map(i => (s"shard${i % 4}", i % 97)).toDF("src", "v")
    val delta = (1L to 100L).map(i => (s"shard9", i % 211)).toDF("src", "v")

    // summaries computed per shard, then the delta's summary row is
    // UNIONED in (the incremental path — base data never rescanned)
    val incremental = IncrementalStats.merge(
      IncrementalStats.shardSummaries(base, "src", "v")
        .union(IncrementalStats.shardSummaries(delta, "src", "v"))).head()
    // full recompute over base+delta
    val recomputed = IncrementalStats.merge(
      IncrementalStats.shardSummaries(base.union(delta), "src", "v")).head()

    assert(incremental.getAs[Long]("n_rows") == 500)
    assert(incremental.getAs[Long]("n_rows") == recomputed.getAs[Long]("n_rows"))
    assert(incremental.getAs[Long]("n_nulls") == recomputed.getAs[Long]("n_nulls"))
    assert(incremental.getAs[Long]("min_v") == recomputed.getAs[Long]("min_v"))
    assert(incremental.getAs[Long]("max_v") == recomputed.getAs[Long]("max_v"))
    // distinct values: exactly {0..96} ∪ {1..100} = 100-sized? no:
    // v%97 over 1..400 covers 0..96 (97 values); delta v%211 over
    // 1..100 covers 1..100; union = {0..100} = 101 distinct
    val exact = 101.0
    Seq(incremental, recomputed).foreach { r =>
      val est = r.getAs[Long]("ndv_est").toDouble
      assert(math.abs(est - exact) <= math.max(3.0, 0.05 * exact),
        s"ndv est $est vs exact $exact")
    }
  }

  test("Cohen's kappa: hand-computed contingency, perfect and chance-level agreement") {
    import spark.implicits._
    // 10 rows: yy=4, yn=2, ny=1, nn=3 -> po=0.7
    // pe = (6/10)(5/10) + (4/10)(5/10) = 0.5 -> kappa = 0.4
    val df = (Seq.fill(4)((true, true)) ++ Seq.fill(2)((true, false)) ++
      Seq.fill(1)((false, true)) ++ Seq.fill(3)((false, false))).toDF("x", "y")
    val r = Stats.cohenKappa(df, col("x"), col("y")).head()
    assert(r.getAs[Long]("n") == 10)
    assert(r.getAs[Double]("po") == 0.7)
    assert(r.getAs[Double]("pe") == 0.5)
    assert(r.getAs[Double]("kappa") == 0.4)
    // perfect agreement -> kappa = 1 regardless of marginals
    val same = Seq.fill(7)((true, true)).toDF("x", "y")
      .union(Seq.fill(3)((false, false)).toDF("x", "y"))
    assert(Stats.cohenKappa(same, col("x"), col("y")).head().getAs[Double]("kappa") == 1.0)
    // independent labelers with 50/50 marginals -> po == pe -> kappa = 0
    val indep = Seq((true, true), (true, false), (false, true), (false, false)).toDF("x", "y")
    assert(Stats.cohenKappa(indep, col("x"), col("y")).head().getAs[Double]("kappa") == 0.0)
  }
}
