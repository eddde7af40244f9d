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

  test("streaming MERGE sink: kill/restart upsert == batch merge, replayed epochs skipped") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val table = Files.createTempDirectory("graft_merge_tbl").toString
    val ckpt = Files.createTempDirectory("graft_merge_ckpt").toString
    val ms = MemoryStream[EventRow]
    val (h1, h2) = rows.splitAt(rows.length / 2)

    def run(data: Seq[EventRow]): Unit = {
      ms.addData(data)
      val q = graft.streaming.MergeSink
        .sink(
          ms.toDF().select(col("user_id"), col("event_id"), col("value")),
          table,
          ckpt,
          key = "user_id",
          seq = "event_id")
        .start()
      try q.processAllAvailable()
      finally q.stop() // the mid-stream kill: next run resumes from ckpt
    }

    def latestWinsOf(es: Seq[EventRow]): Set[(Long, Long, Double)] =
      es.groupBy(_.user_id)
        .map { case (u, g) =>
          val last = g.maxBy(_.event_id)
          (u, last.event_id, last.value)
        }
        .toSet

    run(h1)
    val v1 = graft.streaming.MergeSink.lastCommit(spark, table).get.version
    val afterH1 = graft.streaming.MergeSink
      .currentState(spark, table)
      .get
      .count()
    run(h2) // restart against the SAME checkpoint + table

    // TIME TRAVEL: the pre-restart snapshot must still read exactly as
    // the h1 latest-wins state (immutable versions + retained history)
    val travel = graft.streaming.MergeSink
      .stateAt(spark, table, v1)
      .get
      .collect()
      .map(r =>
        (
          r.getAs[Long]("user_id"),
          r.getAs[Long]("event_id"),
          r.getAs[Double]("value")))
      .toSet
    assert(travel == latestWinsOf(h1), "time-travel read diverged from the h1 state")

    // batch twin: latest-wins merge over the full event stream
    val want = rows
      .groupBy(_.user_id)
      .map { case (u, es) =>
        val last = es.maxBy(_.event_id)
        (u, last.event_id, last.value)
      }
      .toSet
    val got = graft.streaming.MergeSink
      .currentState(spark, table)
      .get
      .collect()
      .map(r =>
        (
          r.getAs[Long]("user_id"),
          r.getAs[Long]("event_id"),
          r.getAs[Double]("value")))
      .toSet
    assert(got == want, s"merge state diverged from batch twin (${got.size} vs ${want.size} keys)")
    assert(afterH1 <= got.size, "keys lost across restart")

    // idempotence: re-applying an already-committed epoch is a no-op
    val before = graft.streaming.MergeSink.lastCommit(spark, table).get
    val replay = rows
      .take(5)
      .map(r => (r.user_id, r.event_id, r.value))
      .toDF("user_id", "event_id", "value")
    graft.streaming.MergeSink
      .upsertBatch(replay, table, "user_id", "event_id", before.epoch)
    val after = graft.streaming.MergeSink.lastCommit(spark, table).get
    assert(after == before, s"replayed epoch advanced the table: $before -> $after")
  }
}
