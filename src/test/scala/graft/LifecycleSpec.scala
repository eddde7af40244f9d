package graft

import graft.streaming.{EpochHooks, JobHooks, Streams}
import graft.streaming.Streams.EventRow
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Commit/rollback hook matrix — the Spark dual of the reference's
  * lifecycle tests (/root/reference/test/opusdb/atomic/stm_test.clj:
  * 285-543): commit hooks fire on success, rollback hooks on failure.
  */
class LifecycleSpec extends SparkSpec {

  private def eventually(timeoutMs: Long)(cond: => Boolean): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (System.currentTimeMillis() < deadline) {
      if (cond) return true
      Thread.sleep(50)
    }
    cond
  }

  test("commit hooks fire after a successful job") {
    val hooks = new JobHooks(spark)
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    hooks.onCommit(() => fired.set(true))
    try {
      Tables.nation(spark, sf).count()
      assert(eventually(10000)(hooks.commits >= 1 && fired.get()))
      assert(hooks.rollbacks == 0)
    } finally hooks.close()
  }

  test("rollback hooks fire after a failed job") {
    val hooks = new JobHooks(spark)
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    hooks.onRollback(() => fired.set(true))
    try {
      val boom = udf((x: Long) => {
        if (x >= 0) throw new RuntimeException("abort")
        x
      })
      intercept[Exception] {
        // collect(), not count(): count would prune the throwing column
        Tables.nation(spark, sf)
          .select(boom(col("n_nationkey").cast("long")))
          .collect()
      }
      assert(eventually(10000)(hooks.rollbacks >= 1 && fired.get()))
    } finally hooks.close()
  }

  test("streaming epoch commits are observable per micro-batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val hooks = new EpochHooks(spark)
    try {
      val rows = Tables.events(spark, sf).as[EventRow].collect().toSeq
      val ms = MemoryStream[EventRow]
      val (half1, half2) = rows.splitAt(rows.length / 2)
      ms.addData(half1)
      val q = Streams
        .tumblingCounts(ms.toDF())
        .writeStream
        .format("memory")
        .queryName("t_epochs")
        .outputMode("complete")
        .start()
      try {
        q.processAllAvailable()
        ms.addData(half2)
        q.processAllAvailable()
      } finally q.stop()
      // two addData batches → at least two epoch commits, all rows seen
      assert(eventually(10000)(hooks.epochCommits >= 2))
      assert(eventually(10000)(hooks.inputRows >= rows.length))
    } finally hooks.close()
  }
}
