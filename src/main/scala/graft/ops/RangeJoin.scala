package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range join: match each left row's point value to right rows whose
  * `[start, end)` interval contains it (the second operator the brief
  * names as absent from Spark's built-ins).
  *
  * A direct `l.value >= r.start && l.value < r.end` join has no equi
  * key, so Spark plans a nested loop — O(|left| x |intervals|).
  * [[bucketed]] discretizes: each left row gets one bucket id
  * (`floor(value / bucketSize)`), each interval explodes into the
  * bucket ids it overlaps, and the join is an equi hash join on the
  * bucket followed by the exact containment filter. Cost is
  * O(|left| + Σ interval-width/bucketSize + matches) — linear, shuffled
  * or broadcast like any equi join.
  *
  * Choose `bucketSize` near the median interval width: each interval
  * then explodes into ~2 buckets and each point probes one.
  */
object RangeJoin {

  /** @param left       point side, with a double column `valueCol`
    * @param intervals  (startCol, endCol) double bounds, end exclusive
    * @param bucketSize discretization width (> 0)
    */
  def bucketed(
      left: DataFrame,
      intervals: DataFrame,
      valueCol: String,
      startCol: String,
      endCol: String,
      bucketSize: Double): DataFrame = {
    require(bucketSize > 0, "bucketSize must be positive")
    val lb = left.withColumn("_bucket", floor(col(valueCol) / bucketSize))
    // an interval [s, e) overlaps buckets floor(s/w) .. floor(e/w); the
    // top bucket is superfluous when e sits exactly on a boundary, but
    // the exact containment filter below discards any false pairing
    val ib = intervals.withColumn(
      "_bucket",
      explode(sequence(
        floor(col(startCol) / bucketSize),
        floor(col(endCol) / bucketSize))))
    lb.join(ib, Seq("_bucket"))
      .where(col(valueCol) >= col(startCol) && col(valueCol) < col(endCol))
      .drop("_bucket")
  }
}
