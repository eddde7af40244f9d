package graft

import graft.ops.Observability
import org.apache.spark.sql.functions._

/** `observe` metrics: invariants ride the existing scan (zero extra
  * pass) and must agree exactly with a directly-computed aggregate —
  * the commit-hook instrumentation idiom (events.clj:8-26) carried to
  * Spark's accumulator-backed observation mechanism.
  */
class ObservabilitySpec extends SparkSpec {

  test("observed audit metrics equal a direct aggregation, with no extra scan") {
    val e = Tables.events(spark, sf)
    val (rows, m) = Observability.capturing(spark) { cap =>
      val audited = Observability.withAudit(e, "events_audit", "value")
        .filter(col("event_type").isin("purchase", "signup"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
      val r = audited.collect()
      // await while the listener is still registered (async bus)
      (r, cap.await("events_audit", 30000L)
        .getOrElse(fail("observed metrics never arrived")))
    }
    val direct = e.agg(
      count(lit(1)).as("n_rows"),
      sum(col("value").cast("decimal(18,4)")).cast("double").as("value_total"),
      sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_nulls")
    ).collect()(0)
    // the observation sits ABOVE the scan but BELOW the filter, so it
    // audits every scanned row regardless of what the query keeps
    assert(m.getAs[Long]("n_rows") == direct.getAs[Long]("n_rows"))
    assert(java.lang.Double.doubleToLongBits(m.getAs[Double]("value_total")) ==
      java.lang.Double.doubleToLongBits(direct.getAs[Double]("value_total")))
    assert(m.getAs[Long]("n_nulls") == direct.getAs[Long]("n_nulls"))
    assert(rows.nonEmpty)
  }

  test("streaming observe: per-batch metrics surface in query progress") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    ms.addData(1L to 100L: _*)
    val q = Observability
      .withAudit(ms.toDF().withColumn("value", col("value").cast("double")), "stream_audit", "value")
      .writeStream
      .format("memory")
      .queryName("t_observe")
      .outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      val progs = q.recentProgress
      val metrics = progs.flatMap(p => Option(p.observedMetrics.get("stream_audit")))
      assert(metrics.nonEmpty, "no observed metrics in any batch progress")
      assert(metrics.map(_.getAs[Long]("n_rows")).sum == 100L)
    } finally q.stop()
  }
}
