package graft.ops

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** Inline pipeline observability via `Dataset.observe` — the analytic
  * dual of the reference's commit-hook instrumentation
  * (/root/reference/src/opusdb/atomic/lifecycle/events.clj:8-26: named
  * callbacks fired at commit), re-expressed Spark-first: named metric
  * expressions attached to a plan node evaluate AS THE DATA FLOWS PAST
  * (accumulator-backed, zero extra pass, zero extra scan) and surface
  * through the QueryExecutionListener bus at completion — the same
  * mechanism Structured Streaming exposes per micro-batch via
  * `StreamingQueryProgress.observedMetrics`.
  *
  * At 100 TB this is the only affordable way to watch an invariant: a
  * separate validation query would re-scan the input; `observe` rides
  * the existing pass.
  */
object Observability {

  /** Attach conservation/null-audit metrics to a frame under `name`:
    * row count, decimal-exact value total (same arithmetic as
    * [[graft.functions.Exact.dsum]] — comparable against any
    * oracle-checked total), and null count of the audited column.
    */
  def withAudit(df: DataFrame, name: String, valueCol: String): DataFrame =
    df.observe(
      name,
      count(lit(1)).as("n_rows"),
      sum(col(valueCol).cast("decimal(18,4)")).cast("double").as("value_total"),
      sum(when(col(valueCol).isNull, 1L).otherwise(0L)).as("n_nulls"))

  /** Listener capturing observed metrics by observation name. Metrics
    * arrive on the async listener bus; [[await]] polls for a named
    * observation with a bounded wait (listener delivery is not
    * synchronous with the action that produced it).
    */
  final class MetricsCapture extends QueryExecutionListener {
    private val seen = new ConcurrentHashMap[String, Row]()

    override def onSuccess(
        funcName: String,
        qe: QueryExecution,
        durationNs: Long): Unit =
      qe.observedMetrics.foreach { case (k, v) => seen.put(k, v) }

    override def onFailure(
        funcName: String,
        qe: QueryExecution,
        exception: Exception): Unit = ()

    def await(name: String, timeoutMs: Long = 10000L): Option[Row] = {
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      while (!seen.containsKey(name) && System.nanoTime() < deadline)
        Thread.sleep(20L)
      Option(seen.get(name))
    }

    def all: Map[String, Row] = seen.asScala.toMap
  }

  /** Run `body` with a registered capture. The capture is passed INTO
    * the body so callers can [[MetricsCapture.await]] delivery while the
    * listener is still registered — awaiting after unregistration races
    * the async listener bus (a backed-up bus delivers late, and a
    * removed listener never receives the pending event).
    */
  def capturing[A](spark: SparkSession)(body: MetricsCapture => A): A = {
    val cap = new MetricsCapture
    spark.listenerManager.register(cap)
    try body(cap)
    finally spark.listenerManager.unregister(cap)
  }
}
