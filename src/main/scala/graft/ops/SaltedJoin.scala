package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins (SURVEY §5): when a handful of hot
  * keys dominate a fact table, hash-partitioning by the join key sends
  * whole hot keys to single tasks. Salting splits each hot key into
  * `nSalts` sub-keys on the fact side and replicates the (small)
  * build side once per salt, so a hot key fans out over `nSalts`
  * tasks.
  *
  * The salt is derived by hashing the entire fact row — deterministic,
  * and uniform even when the join key itself is constant. Results are
  * identical to the unsalted join (verified in SinkAndPlanSpec); AQE's
  * skew-join handles moderate skew automatically, this is the explicit
  * tool for the pathological tail.
  */
object SaltedJoin {

  def join(fact: DataFrame, build: DataFrame, key: String, nSalts: Int): DataFrame = {
    val salted = fact.withColumn(
      "_salt", pmod(xxhash64(fact.columns.map(col): _*), lit(nSalts)).cast("int"))
    val replicated = build.withColumn(
      "_salt", explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
