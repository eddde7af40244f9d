package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dumps the formatted physical plan of every registered query to
  * `<outDir>/<name>.txt` — the artifact of the "explain until it's the
  * plan you'd want" loop. Run:
  *
  *   sbt "runMain graft.PlanDump /root/testdata/sf0.001 target/plans"
  *
  * Reviewed invariants (enforced in PlanSpec/QueriesSpec for the key
  * queries): dims broadcast, filters reach PushedFilters, ReadSchema is
  * pruned, no unpartitioned windows over fact tables, exchanges only on
  * aggregation/join keys.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val outDir = if (args.length > 1) args(1) else "target/plans"
    val spark = SessionTuning.tuned(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val sel = SparkEntry.selectedQueries
    sel.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.writeString(Paths.get(s"$outDir/$name.txt"), plan)
      } catch {
        case e: Throwable =>
          Files.writeString(
            Paths.get(s"$outDir/$name.txt"),
            s"PLAN FAILED: ${e.getMessage}")
      }
    }
    println(s"wrote ${sel.size} plans to $outDir")
    spark.stop()
  }
}
