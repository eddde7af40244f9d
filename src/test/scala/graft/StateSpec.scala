package graft

import graft.streaming.Streams
import graft.streaming.Streams.EventRow
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Production state-store and durability paths: RocksDB-backed streaming
  * state (the 100 TB state-size answer — state spills to disk instead of
  * living on the executor heap) and checkpoint WAL recovery (the
  * replay-exactly-once contract the reference's log manager provides,
  * /root/reference/src/opusdb/logging/log_mgr.clj:16-44).
  */
class StateSpec extends SparkSpec {

  private lazy val rows: Seq[EventRow] = {
    val s = spark
    import s.implicits._
    Tables.events(spark, sf).as[EventRow].collect().toSeq
  }

  test("RocksDB state store provider computes identical windowed state") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prev = spark.conf
      .getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[EventRow]
      ms.addData(rows)
      val q = Streams
        .tumblingCounts(ms.toDF())
        .writeStream
        .format("memory")
        .queryName("t_rocks")
        .outputMode("complete")
        .start()
      try q.processAllAvailable()
      finally q.stop()
      val got = spark
        .table("t_rocks")
        .agg(sum(col("n")), count(lit(1)))
        .first()
      assert(got.getLong(0) == rows.length)
      assert(got.getLong(1) > 0)
    } finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("checkpoint recovery: restarted query resumes at the WAL offset, no replay") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val sink = Files.createTempDirectory("graft_sink").toString
    val ms = MemoryStream[EventRow]
    val (half1, half2) = rows.splitAt(rows.length / 2)

    // parquet file sink: the exactly-once sink (its _spark_metadata
    // commit log is what makes reprocessed batches invisible)
    def start() = ms.toDF()
      .select(col("event_id"), col("user_id"), col("value"))
      .writeStream
      .format("parquet")
      .option("path", sink)
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()

    ms.addData(half1)
    val q1 = start()
    try q1.processAllAvailable()
    finally q1.stop()
    assert(spark.read.parquet(sink).count() == half1.length)

    // restart from the same checkpoint: the offset WAL says half1 is
    // committed, so only half2 may be processed
    ms.addData(half2)
    val q2 = start()
    try q2.processAllAvailable()
    finally q2.stop()
    val ids = spark.read
      .parquet(sink)
      .select(col("event_id"))
      .collect()
      .map(_.getLong(0))
    assert(ids.length == rows.length, s"expected ${rows.length}, got ${ids.length}")
    assert(ids.distinct.length == ids.length, "duplicate events after recovery")
  }
}
