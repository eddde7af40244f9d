package graft

import graft.streaming.Streams
import graft.streaming.Streams.EventRow
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Stream-stream joins, streaming dedup, and the foreachBatch
  * transactional sink — each checked against its batch twin.
  */
class StreamJoinSpec extends SparkSpec {

  private lazy val rows: Seq[EventRow] = {
    val s = spark
    import s.implicits._
    Tables.events(spark, sf).as[EventRow].collect().toSeq
  }

  test("stream-stream attribution join == batch band join pair count") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mp = MemoryStream[EventRow]
    val mv = MemoryStream[EventRow]
    mp.addData(rows.filter(_.event_type == "purchase"))
    mv.addData(rows.filter(_.event_type == "view"))
    val q = Streams
      .attributionJoin(mp.toDF(), mv.toDF())
      .writeStream
      .format("memory")
      .queryName("t_ssjoin")
      .outputMode("append")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.table("t_ssjoin").count()
    val e = Tables.events(spark, sf).withColumn("t_us", unix_micros(col("ts")))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("t_us").as("pt"))
    val v = e.filter(col("event_type") === "view")
      .select(col("user_id").as("vu"), col("t_us").as("vt"))
    val batch = p.join(
      v,
      col("pu") === col("vu") &&
        col("vt") >= col("pt") - lit(3600L * 1000000L) &&
        col("vt") <= col("pt")).count()
    assert(streamed == batch, s"streamed $streamed vs batch $batch")
  }

  test("streaming dedup drops re-delivered events across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[EventRow]
    val sample = rows.take(200)
    ms.addData(sample)
    val q = Streams
      .dedupStream(ms.toDF())
      .select(col("event_id"))
      .writeStream
      .format("memory")
      .queryName("t_dedup")
      .outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      ms.addData(sample) // full re-delivery (at-least-once source retry)
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("t_dedup").collect().map(_.getLong(0))
    assert(ids.length == sample.length, s"${ids.length} vs ${sample.length}")
    assert(ids.distinct.length == ids.length)
  }

  test("watermark-bounded dedup drops re-deliveries while keeping state finite") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[EventRow]
    val sample = rows.take(200)
    ms.addData(sample)
    val q = Streams
      .dedupStreamBounded(ms.toDF())
      .select(col("event_id"))
      .writeStream
      .format("memory")
      .queryName("t_dedup_wm")
      .outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      // re-delivery inside the watermark horizon: dropped either by the
      // still-live dedup state or (for events already behind the
      // watermark) by lateness — never emitted twice either way
      ms.addData(sample)
      q.processAllAvailable()
      // state must be bounded by the horizon, not by all ids ever seen
      // (scan recentProgress: lastProgress may be an empty no-data batch
      // that reports no state operators)
      val stateRows = q.recentProgress.toSeq
        .flatMap(_.stateOperators.toSeq)
        .map(_.numRowsTotal)
      assert(stateRows.nonEmpty, "no state operator progress observed")
      assert(stateRows.max <= sample.length.toLong)
    } finally q.stop()
    val ids = spark.table("t_dedup_wm").collect().map(_.getLong(0))
    assert(ids.length == sample.length, s"${ids.length} vs ${sample.length}")
    assert(ids.distinct.length == ids.length)
  }

  test("foreachBatch transactional sink writes each epoch exactly once") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val sink = Files.createTempDirectory("graft_feb").toString
    val ms = MemoryStream[EventRow]
    val (h1, h2) = rows.splitAt(rows.length / 2)
    ms.addData(h1)
    val q = ms.toDF()
      .select(col("event_id"), col("user_id"))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, epochId: Long) =>
        batch.write.mode("overwrite").parquet(s"$sink/epoch=$epochId")
      }
      .outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      ms.addData(h2)
      q.processAllAvailable()
    } finally q.stop()
    val written = spark.read.parquet(s"$sink/epoch=*").count()
    assert(written == rows.length)
  }
}
