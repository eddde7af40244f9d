package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerEvent, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart

/** Optimization-round profiler (guide §1): runs selected lanes once and
  * attributes time to Spark STAGES by call site (stage names embed the
  * action's call site, e.g. "collect at MergeSink.scala:1327"), so a
  * lifecycle lane's cost decomposes into per-code-line task time plus a
  * driver-gap residual (wall − job span).
  *
  * Usage: sbt "runMain graft.ProfileLane /root/testdata/sf0.1 q_ann_sql"
  */
object ProfileLane {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SessionTuning.tuned applies the SPARK_GRAFT_CONF experiment knob
    // as its last step — no second fold here (it would only drift from
    // the canonical application).
    val spark = SessionTuning.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // stage name -> (count, wall-ms of the stage, task-time-ms summed)
    val stages = new java.util.concurrent.ConcurrentHashMap[String, (Int, Long, Long)]()
    val jobSpans = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, String)]()
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for {
          s <- si.submissionTime; e <- si.completionTime
        } yield e - s).getOrElse(0L)
        val task = si.taskMetrics.executorRunTime
        stages.merge(si.name, (1, wall, task),
          (a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3))
      }
      val execDesc = new java.util.concurrent.ConcurrentHashMap[Long, String]()
      override def onOtherEvent(event: SparkListenerEvent): Unit = event match {
        case e: SparkListenerSQLExecutionStart =>
          execDesc.put(e.executionId,
            e.description.replaceAll("\\s+", " ").take(110))
        case _ => ()
      }
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val d = Option(js.properties.getProperty("spark.sql.execution.id"))
          .flatMap(id => Option(execDesc.get(id.toLong)))
          .orElse(Option(js.properties.getProperty("spark.job.description")))
          .orElse(Option(js.properties.getProperty("callSite.short")))
          .getOrElse("?").replaceAll("\\s+", " ").take(110)
        jobSpans.put(js.jobId, (System.currentTimeMillis(), -1L, d))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobSpans.computeIfPresent(je.jobId, (_, v) => (v._1, System.currentTimeMillis(), v._3))
    }
    spark.sparkContext.addSparkListener(listener)

    val all = SparkEntry.queries
    val sel = if (names.isEmpty) Seq("q_ann_sql") else names.toSeq
    sel.foreach { name =>
      val fn = all.getOrElse(name, sys.error(s"unknown query $name"))
      stages.clear(); jobSpans.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500L)
      import scala.jdk.CollectionConverters._
      val recs = stages.asScala.toSeq
        .map { case (n, (c, w, t)) => (n, c, w / 1e3, t / 1e3) }
        .sortBy(-_._3)
      val stageWall = recs.map(_._3).sum
      val jobs = jobSpans.values.asScala.filter(_._2 > 0).toSeq
      val jobWall = jobs.map(j => (j._2 - j._1) / 1e3).sum
      println(f"== $name wall=$wall%.2f s, ${jobs.size} jobs (sum ${jobWall}%.2f s), ${recs.map(_._2).sum} stages (wall sum $stageWall%.2f s), driver gap=${wall - jobWall}%.2f s")
      println("-- by job description:")
      jobs.groupBy(_._3).map { case (d, js) =>
        (d, js.size, js.map(j => (j._2 - j._1) / 1e3).sum)
      }.toSeq.sortBy(-_._3).take(25).foreach { case (d, c, w) =>
        println(f"   $w%7.3f s n=$c%-4d $d")
      }
      println("-- by stage call site:")
      recs.take(12).foreach { case (n, c, w, t) =>
        println(f"   $w%7.3f s (task $t%7.2f) n=$c%-4d $n")
      }
    }
    spark.stop()
  }
}
