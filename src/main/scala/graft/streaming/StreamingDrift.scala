package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Live feed-drift alarm — the streaming form of the `drift_psi`
  * registry query: each micro-batch's value distribution is scored
  * against a FROZEN reference histogram and the PSI crosses a
  * threshold → alert. This is the production guard in front of a
  * training-data feed: a upstream schema slip, a collapsed source, or
  * a bot flood shifts the distribution long before row counts move.
  *
  * Scale shape: the reference (decile edges + shares) is frozen ONCE
  * from a bounded aggregate and shipped to executors as a literal
  * array — per batch the only work is the same codegen'd
  * `aggregate`-fold binning pass as the batch operator plus a
  * bins-sized collect (≤ nBins+1 rows, statistics-sized at any
  * stream rate). No state store: the reference is immutable by
  * design (drift is measured AGAINST it, so it must not adapt), and
  * each batch is scored independently — replaying a batch reproduces
  * its score bit-for-bit.
  *
  * The per-bin math (ε-clamped shares, `(p−q)·ln(p/q)` terms) is the
  * SAME definition as [[graft.ops.Stats.psi]]; stream/batch agreement
  * is spec-asserted, and the batch form carries the DuckDB value
  * oracle.
  */
object StreamingDrift {

  /** Frozen reference: `edges` are the ref corpus's quantile bin
    * edges (rounded like the batch operator), `shares` the per-bin
    * probability masses (length = edges + 1).
    */
  final case class Reference(edges: Seq[Double], shares: Seq[Double]) {
    require(shares.length == edges.length + 1, "shares must cover edges+1 bins")
  }

  /** One micro-batch's drift score. */
  final case class BatchDrift(batchId: Long, n: Long, psi: Double, alarm: Boolean)

  /** Freeze the reference from a bounded corpus: `nBins`-quantile
    * edges + per-bin shares. One aggregate pass for the edges, one
    * binning pass for the shares — both statistics-sized collects.
    */
  def reference(ref: DataFrame, valueCol: String, nBins: Int = 10): Reference = {
    val pcts = (1 until nBins).map(i => s"${i.toDouble / nBins}D").mkString(",")
    val edges: Seq[Double] = ref
      .select(expr(
        s"transform(percentile(CAST($valueCol AS DOUBLE), array($pcts)), x -> round(x, 4))")
        .as("b"))
      .head().getSeq[Double](0)
    val (n, counts) = binCounts(ref, valueCol, edges)
    require(n > 0, "empty reference corpus")
    Reference(edges, counts.map(_.toDouble / n))
  }

  /** Score one (micro-)batch against the frozen reference — the exact
    * [[graft.ops.Stats.psi]] per-bin definition, summed.
    */
  def score(batch: DataFrame, valueCol: String, ref: Reference): (Long, Double) = {
    val (n, counts) = binCounts(batch, valueCol, ref.edges)
    val psi = ref.shares.indices.map { i =>
      val p = math.max(ref.shares(i), 1e-6)
      val q = math.max(if (n == 0) 0.0 else counts(i).toDouble / n, 1e-6)
      (p - q) * math.log(p / q)
    }.sum
    (n, psi)
  }

  /** Attach the monitor to a streaming DataFrame carrying `valueCol`.
    * Each micro-batch emits one [[BatchDrift]] to `sink` (alarm when
    * `psi >= threshold`). `sink` runs on the driver with bins-sized
    * input — wire it to an alert bus or a metrics table.
    */
  def attach(
      stream: DataFrame,
      valueCol: String,
      ref: Reference,
      threshold: Double,
      checkpoint: String)(sink: BatchDrift => Unit): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (df: DataFrame, id: Long) =>
        val (n, psi) = score(df, valueCol, ref)
        sink(BatchDrift(id, n, psi, psi >= threshold))
      }
      .start()

  /** Dense per-bin counts via the shared codegen'd binning fold
    * (`bin(v) = #{edge < v}`, the batch operator's definition).
    */
  private def binCounts(df: DataFrame, valueCol: String, edges: Seq[Double]): (Long, Array[Long]) = {
    val bArr = array(edges.map(lit): _*)
    val rows = df.select(col(valueCol).cast("double").as("v"))
      .where(col("v").isNotNull)
      .withColumn("bin",
        aggregate(bArr, lit(0), (acc, b) => acc + when(col("v") > b, 1).otherwise(0)))
      .groupBy("bin").agg(count(lit(1)).as("n"))
      .collect()
    val counts = Array.fill(edges.length + 1)(0L)
    rows.foreach(r => counts(r.getInt(0)) = r.getLong(1))
    (counts.sum, counts)
  }
}
