package graft.streaming

import org.apache.spark.scheduler.{
  JobSucceeded,
  SparkListener,
  SparkListenerJobEnd
}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

/** Transaction-lifecycle hooks — the Spark dual of the reference's
  * commit/rollback callback registry
  * (/root/reference/src/opusdb/atomic/lifecycle/events.clj:8-26 and
  * stm.clj:196-206): on-commit fires after a job (the unit of atomic
  * work) succeeds, on-rollback after it fails — including once per
  * retry, matching the reference's hooks-on-every-retry semantics
  * (stm_test.clj:424-447, Spark re-fires per failed job attempt).
  *
  * Batch: a SparkListener on job end. Streaming: a
  * StreamingQueryListener — each micro-batch progress event is an epoch
  * commit (the WAL-flush-then-data contract the reference enforced by
  * hand lives inside Spark's checkpoint commit protocol).
  */
class JobHooks(spark: SparkSession) {
  private val commitCount = new AtomicInteger(0)
  private val rollbackCount = new AtomicInteger(0)
  private val commitHooks = new ConcurrentLinkedQueue[() => Unit]()
  private val rollbackHooks = new ConcurrentLinkedQueue[() => Unit]()

  private val listener = new SparkListener {
    override def onJobEnd(end: SparkListenerJobEnd): Unit =
      end.jobResult match {
        case JobSucceeded =>
          commitCount.incrementAndGet()
          commitHooks.forEach(h => h())
        case _ =>
          rollbackCount.incrementAndGet()
          rollbackHooks.forEach(h => h())
      }
  }
  spark.sparkContext.addSparkListener(listener)

  def onCommit(f: () => Unit): Unit = commitHooks.add(f)
  def onRollback(f: () => Unit): Unit = rollbackHooks.add(f)
  def commits: Int = commitCount.get()
  def rollbacks: Int = rollbackCount.get()
  def close(): Unit = spark.sparkContext.removeSparkListener(listener)
}

/** Streaming epoch-commit hook: counts micro-batch progress events and
  * accumulated input rows — the observable form of per-epoch commit.
  */
class EpochHooks(spark: SparkSession) {
  private val epochs = new AtomicInteger(0)
  private val rows = new java.util.concurrent.atomic.AtomicLong(0L)

  private val listener = new StreamingQueryListener {
    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit = {
      epochs.incrementAndGet()
      rows.addAndGet(e.progress.numInputRows)
    }
    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  }
  spark.streams.addListener(listener)

  def epochCommits: Int = epochs.get()
  def inputRows: Long = rows.get()
  def close(): Unit = spark.streams.removeListener(listener)
}
