package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loader for the driver-generated parquet tables (TESTDATA.md). */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** `events.ts` has shipped as both INT64 TIMESTAMP(NANOS) (which the
    * vectorized parquet reader rejects — read as raw nanos, convert) and
    * plain TIMESTAMP micros, depending on the generator version. Normalize
    * either encoding to a micros-precision TIMESTAMP_NTZ (all downstream
    * use is at second granularity).
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      val ts = raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz")
        case _ => col("ts").cast("timestamp_ntz")
      }
      raw.withColumn("ts", ts)
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }
}
