package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the single latest right row with
  * `rightTime <= leftTime` within the same key (the operator the brief
  * names as missing from Spark's built-ins; DuckDB/kdb have it native).
  *
  * Implementation is the union + carry-forward window, not a range
  * join: tag both sides, union, and per key carry
  * `last(struct(carry cols), ignoreNulls)` over rows ordered by
  * (time, side-tag) up to the current row. One shuffle on the key,
  * one sort — the cost of a single window function, and no
  * inequality-join explosion: a naive `leftTime >= rightTime` join
  * materializes every (left, earlier-right) pair before picking the
  * max, which at 100 TB is a cross product per key.
  *
  * The carried columns travel as one struct, so they always come from
  * the same right row. Right rows should be unique per (key, time) —
  * pre-aggregate ties (e.g. `max_by`) for a deterministic result.
  */
object AsOfJoin {

  /** @return all left columns + the `carry` columns of the latest
    *         preceding right row (null when none precedes).
    */
  def lastBefore(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      carry: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val carryStructType = org.apache.spark.sql.types.StructType(
      carry.map(c => org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)))

    val taggedRight = right.select(
      col(rightKey).as("_key") +: col(rightTime).as("_time") +: lit(0).as("_side") +:
        struct(carry.map(col): _*).as("_carry") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"_l_$c")): _*)
    val taggedLeft = left.select(
      col(leftKey).as("_key") +: col(leftTime).as("_time") +: lit(1).as("_side") +:
        lit(null).cast(carryStructType).as("_carry") +:
        leftCols.map(c => col(c).as(s"_l_$c")): _*)

    // right rows sort before left rows at equal times (_side 0 < 1), so
    // a right row AT the left row's timestamp is visible to it (<= match)
    val w = Window.partitionBy("_key").orderBy(col("_time"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedRight.unionByName(taggedLeft)
      .withColumn("_match", last(col("_carry"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(leftCols.map(c => col(s"_l_$c").as(c)) ++ carry.map(c => col(s"_match.$c").as(c)): _*)
  }
}
