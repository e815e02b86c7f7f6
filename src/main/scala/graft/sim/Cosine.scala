package graft.sim

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cosine similarity over `array<double>` embedding columns, built from
  * `zip_with` + `aggregate` higher-order functions — row-local,
  * deterministic left-to-right fold (reproducible to the bit across
  * runs and engines that fold sequentially).
  */
object Cosine {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def sim(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cast a raw `array<float>` embedding to double for stable math. */
  def asDouble(c: Column): Column = c.cast("array<double>")
}
