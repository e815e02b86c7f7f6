package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loader for the driver-generated parquet tables (TESTDATA.md). */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** `events.ts` is INT64 TIMESTAMP(NANOS), which the vectorized parquet
    * reader rejects; read it as raw nanos and convert to a micros-precision
    * TIMESTAMP_NTZ (all downstream use is at second granularity).
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }
}
