package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SessionTuning.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Fixture echo (round-8 lesson): surface the decoded event-time range
    // so a unit/fixture drift is visible in the verify log, not only as
    // downstream oracle mismatches.
    try {
      import org.apache.spark.sql.functions.{col, max, min}
      val r = Tables.events(spark, sfDir).agg(min(col("ts")), max(col("ts"))).head()
      System.err.println(
        s"[verify] fixture $sfDir events.ts ${r.get(0)} .. ${r.get(1)} " +
          s"(unit ${Tables.eventsTsUnit(spark, sfDir)})")
    } catch { case e: Throwable =>
      System.err.println(s"[verify] fixture echo failed: ${e.getMessage}")
    }
    val selected = SparkEntry.selectedQueries
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // same accumulated-state relief as Bench: ~190 queries in one JVM
      // pile up stream-sink tables and dead checkpoint blocks
      try {
        spark.catalog.listTables().collect().foreach { t =>
          if (t.name.startsWith("graft_stream_"))
            spark.catalog.dropTempView(t.name)
        }
      } catch { case _: Throwable => () }
      System.gc()
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
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
