package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-shift statistics for production data monitoring — the
  * "did this week's feed drift from the reference corpus?" check that
  * gates retraining pipelines (reference surface analog: the
  * ClickHouse-side histogram/quantile monitoring queries in
  * readme.md:108-125 of hisune/log2ck).
  *
  * Both statistics are built on the same scale shape: ONE light pass
  * to fix the grid (exact percentile bounds, or min/max probes — an
  * aggregate, so collecting it to the driver is statistics-sized and
  * legitimate at any data volume), then ONE partial-agg pass that bins
  * every row with a codegen'd `aggregate` fold over the ≤101-element
  * grid literal. No row-count-sized shuffle, no cross join, no
  * explode-by-grid blowup: the binned shuffle carries at most
  * `grid+1` groups regardless of input size, and the final
  * share/CDF arithmetic runs over that grid-sized result (the tiny
  * unpartitioned windows are over ≤102 aggregated rows, never data).
  *
  * Determinism across engines: grid values derive from aggregates via
  * the same IEEE operation sequence both here and in the DuckDB
  * oracle, bins compare with the same strict `grid < v` inequality,
  * shares divide exact BIGINT counts, and only final display columns
  * are rounded.
  */
object Stats {

  /** Population Stability Index per bin. Input must have a double
    * column `v` and a boolean `is_ref`; bin edges are the reference
    * side's exact `nBins`-quantiles (interpolated `percentile`, ≡
    * DuckDB `quantile_cont`, rounded to 4 so both engines bin on the
    * identical edge). Shares are ε-clamped (1e-6) before the log, the
    * standard PSI guard for an empty current-side bin.
    */
  def psi(data: DataFrame, nBins: Int = 10): DataFrame = {
    val d = data.select(col("v").cast("double").as("v"), col("is_ref"))
    val pcts = (1 until nBins).map(i => s"${i.toDouble / nBins}D").mkString(",")
    val bounds: Seq[Double] = d.where(col("is_ref"))
      .select(expr(s"transform(percentile(v, array($pcts)), x -> round(x, 4))").as("b"))
      .head().getSeq[Double](0)
    val bArr = array(bounds.map(lit): _*)

    val wAll = Window.partitionBy(lit(1))
    val eps = lit(1e-6)
    d.withColumn("bin",
        aggregate(bArr, lit(0), (acc, b) => acc + when(col("v") > b, 1).otherwise(0))
          .cast("long"))
      .groupBy("bin")
      .agg(
        sum(when(col("is_ref"), 1L).otherwise(0L)).as("ref_n"),
        sum(when(!col("is_ref"), 1L).otherwise(0L)).as("cur_n"))
      .withColumn("rs", col("ref_n").cast("double") / sum("ref_n").over(wAll))
      .withColumn("cs", col("cur_n").cast("double") / sum("cur_n").over(wAll))
      .withColumn("p", greatest(col("rs"), eps))
      .withColumn("q", greatest(col("cs"), eps))
      .select(col("bin"), col("ref_n"), col("cur_n"),
        round(col("rs"), 6).as("ref_share"),
        round(col("cs"), 6).as("cur_share"),
        round((col("p") - col("q")) * log(col("p") / col("q")), 6).as("psi_term"))
      .orderBy("bin")
  }

  /** Kolmogorov–Smirnov on a fixed probe grid. Input must have a
    * double `v` and a boolean `is_l` (left sample membership). Probes
    * are `nProbes` evenly spaced points over the POOLED [min, max];
    * `bin(v) = #{probe < v}`, so the cumulative count of bins ≤ i is
    * exactly `#{v ≤ probe_i}` and the running |CDF_l − CDF_r| only
    * changes at occupied bins — the emitted per-bin table therefore
    * carries the full grid-KS profile (its max IS the statistic).
    */
  def ksGrid(data: DataFrame, nProbes: Int = 101): DataFrame = {
    val d = data.select(col("v").cast("double").as("v"), col("is_l"))
    val Row(mn: Double, mx: Double) = d.agg(min("v"), max("v")).head()
    val step = (mx - mn) / (nProbes - 1).toDouble
    val probes = (0 until nProbes).map(j => mn + j.toDouble * step)
    val pArr = array(probes.map(lit): _*)

    val cum = Window.partitionBy(lit(1)).orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(lit(1))
    d.withColumn("bin",
        aggregate(pArr, lit(0), (acc, p) => acc + when(col("v") > p, 1).otherwise(0))
          .cast("long"))
      .groupBy("bin")
      .agg(
        sum(when(col("is_l"), 1L).otherwise(0L)).as("n_l"),
        sum(when(!col("is_l"), 1L).otherwise(0L)).as("n_r"))
      .withColumn("cl", sum("n_l").over(cum).cast("double") / sum("n_l").over(wAll).cast("double"))
      .withColumn("cr", sum("n_r").over(cum).cast("double") / sum("n_r").over(wAll).cast("double"))
      .select(col("bin"), col("n_l"), col("n_r"),
        round(col("cl"), 6).as("cdf_l"),
        round(col("cr"), 6).as("cdf_r"),
        round(abs(col("cl") - col("cr")), 6).as("ks_diff"))
      .orderBy("bin")
  }

  /** Cohen's kappa between two boolean labelers — chance-corrected
    * agreement, the standard sanity check before trusting
    * weak-supervision labels (raw agreement flatters labelers that
    * both say "yes" to everything). One conditional-agg scan collects
    * the 2x2 contingency cells; `kappa = (po − pe) / (1 − pe)` is
    * row-local arithmetic on the 1-row result. Emitted values are
    * rounded so the cross-engine oracle reproduces them exactly.
    */
  def cohenKappa(data: DataFrame, a: Column, b: Column): DataFrame = {
    val cells = data.select(a.as("a"), b.as("b"))
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum(when(col("a") && col("b"), 1.0).otherwise(0.0)).as("yy"),
        sum(when(col("a") && !col("b"), 1.0).otherwise(0.0)).as("yn"),
        sum(when(!col("a") && col("b"), 1.0).otherwise(0.0)).as("ny"),
        sum(when(!col("a") && !col("b"), 1.0).otherwise(0.0)).as("nn"))
    cells.select(
      col("n").cast("long").as("n"),
      ((col("yy") + col("nn")) / col("n")).as("po"),
      (((col("yy") + col("yn")) / col("n")) * ((col("yy") + col("ny")) / col("n")) +
        ((col("ny") + col("nn")) / col("n")) * ((col("yn") + col("nn")) / col("n"))).as("pe"))
      .select(col("n"), round(col("po"), 4).as("po"), round(col("pe"), 4).as("pe"),
        round((col("po") - col("pe")) / (lit(1.0) - col("pe")), 4).as("kappa"))
  }
}
