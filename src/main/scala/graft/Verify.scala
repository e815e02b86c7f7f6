package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Precision-style oracles read `graft_result` — the query's OWN
    * dump — and only filter/recompute over its rows, so a regression
    * that emits ZERO rows would leave both sides empty and the hash
    * compare vacuously green. Guard: delete any empty precision dump
    * whose referenced base tables are non-empty, so the driver's
    * compare records an error instead of a silent pass. (A genuine
    * all-clean corpus would be empty-on-empty-candidates too, but
    * every shipped precision query plants positives in the generated
    * test data — calibrated like the sketch tolerance bands.)
    * Returns the failed query names.
    */
  def failEmptyPrecisionDumps(
      spark: SparkSession, sfDir: String, outDir: String,
      selected: String => Boolean = _ => true): Seq[String] = {
    val outAbs = new java.io.File(outDir).getAbsolutePath
    SparkEntry.oracleSql.toSeq.sortBy(_._1).filter(kv => selected(kv._1)).flatMap { case (name, sql) =>
      if (("\\bgraft_result\\b").r.findFirstIn(sql).isEmpty) None
      else {
        val dumped =
          try spark.read.parquet(s"$outAbs/$name").count()
          catch { case _: Throwable => -1L } // absent dump: already an error downstream
        val baseNonEmpty = Tables.all
          .filter(t => ("\\b" + t + "\\b").r.findFirstIn(sql).isDefined)
          .exists { t =>
            try spark.read.parquet(s"$sfDir/$t.parquet").head(1).nonEmpty
            catch { case _: Throwable => false }
          }
        if (dumped == 0 && baseNonEmpty) {
          System.err.println(
            s"[verify] $name: precision-oracle dump is empty on non-empty inputs — deleting it so the compare fails")
          val p = new org.apache.hadoop.fs.Path(s"$outAbs/$name")
          p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
          Some(name)
        } else None
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Local-iteration subset filter (mirrors SPARK_GRAFT_BENCH_ONLY);
    // unset = full registry, which is what the driver runs.
    val only: Option[Set[String]] = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def selected(name: String): Boolean = only.forall(_.contains(name))
    SparkEntry.queries.filter(kv => selected(kv._1)).foreach { case (name, fn) =>
      // coalesce(1) keeps the queries' deterministic ORDER BY intact in
      // the dump (range-ordered partitions concatenate in order; a
      // repartition would shuffle it away). Oracle-dump path only —
      // operators never do this.
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // same hygiene as Bench: a query that leaks a persist() must not
      // bleed memory pressure into the 150+ queries after it
      spark.catalog.clearCache()
    }
    failEmptyPrecisionDumps(spark, sfDir, outDir, selected)
    // Make each oracle self-contained: prepend CTEs binding every
    // referenced table name to its parquet file, so the SQL runs in any
    // DuckDB session regardless of which views the driver registered
    // (CTEs harmlessly shadow same-named views when they do exist).
    // `graft_result` binds to the query's OWN dumped output — the
    // precision-oracle pattern for approximate operators: DuckDB
    // recomputes the claimed metric on exactly the emitted rows and
    // re-applies the threshold, so any false claim drops rows and
    // fails the hash compare.
    val outAbs = new java.io.File(outDir).getAbsolutePath
    def withSources(name: String, sql: String): String = {
      val self =
        if (("\\bgraft_result\\b").r.findFirstIn(sql).isDefined)
          Seq(s"graft_result AS (SELECT * FROM read_parquet('$outAbs/$name/*.parquet'))")
        else Nil
      val used = Tables.all.filter(t => ("\\b" + t + "\\b").r.findFirstIn(sql).isDefined)
      val ctes = (self ++ used.map(t => s"$t AS (SELECT * FROM read_parquet('$sfDir/$t.parquet'))"))
        .mkString(", ")
      if (ctes.isEmpty) sql
      else {
        val trimmed = sql.trim
        // RECURSIVE must stay attached to WITH; prepending plain CTEs
        // under WITH RECURSIVE is valid (the keyword licenses, not
        // forces, recursion per CTE)
        if (trimmed.take(15).equalsIgnoreCase("WITH RECURSIVE "))
          s"WITH RECURSIVE $ctes, ${trimmed.drop(15)}"
        else if (trimmed.take(5).equalsIgnoreCase("WITH ")) s"WITH $ctes, ${trimmed.drop(5)}"
        else s"WITH $ctes $trimmed"
      }
    }

    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => selected(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(withSources(k, v))}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
