package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for every suite (Test / fork := true runs
  * all suites in a single forked JVM).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    // default 4 keeps the suite light; GRAFT_TEST_CPUS=32 reproduces
    // the deployment contract for measurement tests (the multi-source
    // ceiling numbers in BENCH_NOTES.md were recorded at both)
    val cpus = sys.env.getOrElse("GRAFT_TEST_CPUS", "4")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  val SfDir = "/root/testdata/sf0.01"
  val SfDirSmall = "/root/testdata/sf0.001"
}
