package graft.sources

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch backfill over daily-rotated log files (the batch complement of
  * the streaming day-rollover, reference Manager.php:72-89): expand the
  * `{date}` template over a date range and read every existing day's
  * file with per-day attribution.
  */
object LogBackfill {

  /** Union of the days in [from, to] whose resolved path exists, with a
    * `log_date` column recording the file's day. Missing days are
    * skipped, as the reference skips missing files
    * (Manager.php:90-93). Existence checks go through the Hadoop
    * FileSystem resolved from the path, so the backfill runs unchanged
    * over HDFS/S3/local.
    */
  def read(spark: SparkSession, template: String, from: LocalDate, to: LocalDate): DataFrame = {
    val days = Iterator.iterate(from)(_.plusDays(1)).takeWhile(!_.isAfter(to)).toSeq
    val hadoopConf = spark.sessionState.newHadoopConf()
    val existing = days.filter { d =>
      val p = new org.apache.hadoop.fs.Path(DatePath.resolve(template, d))
      p.getFileSystem(hadoopConf).exists(p)
    }
    require(existing.nonEmpty, s"no files for $template in [$from, $to]")
    existing
      .map { d =>
        spark.read.text(DatePath.resolve(template, d))
          .withColumnRenamed("value", "line")
          .withColumn("log_date", lit(d.toString).cast("date"))
      }
      .reduce(_ unionByName _)
  }
}
