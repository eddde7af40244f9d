package graft

import graft.streaming.Streams
import graft.streaming.Streams.EventRow
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming pipelines verified against their batch twins on identical
  * input — the snapshot-consistency idiom of the reference's own tests
  * (/root/reference/test/opusdb/atomic/stm_test.clj:156-173): two
  * execution paths over the same data must agree exactly.
  */
class StreamingSpec extends SparkSpec {

  private lazy val rows: Seq[EventRow] = {
    val s = spark
    import s.implicits._
    Tables.events(spark, sf).as[EventRow].collect().toSeq
  }

  test("streaming tumbling window == batch tumbling aggregation") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[EventRow]
    ms.addData(rows)
    val q = Streams
      .tumblingCounts(ms.toDF())
      .writeStream
      .format("memory")
      .queryName("t_tumble")
      .outputMode("complete")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val got = spark
      .table("t_tumble")
      .select(col("win_start"), col("event_type"), col("n"), col("value_total"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val want = Tables
      .events(spark, sf)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("v"))
      .select(col("window.start"), col("event_type"), col("n"), col("v"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got == want)
  }

  test("streaming session windows match batch sessionization rule") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[EventRow]
    ms.addData(rows)
    val q = Streams
      .sessionCounts(ms.toDF())
      .writeStream
      .format("memory")
      .queryName("t_sess")
      .outputMode("complete")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val got = spark
      .table("t_sess")
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("total_events"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val want = ops.Temporal
      .windowSession(spark, sf)
      .select(col("user_id"), col("n_sessions"), col("total_events"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == want)
  }

  test("mapGroupsWithState running balance == batch signed-delta fold") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[EventRow]
    ms.addData(rows)
    val q = Streams
      .runningBalances(spark, ms.toDS())
      .writeStream
      .format("memory")
      .queryName("t_bal")
      .outputMode("update")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    // single micro-batch → exactly one update per user = final state
    val got = spark
      .table("t_bal")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val want = Tables
      .events(spark, sf)
      .filter(col("event_type").isin("purchase", "signup"))
      .select(
        col("user_id"),
        when(
          col("event_type") === "purchase",
          -round(col("value") * 100).cast("long"))
          .otherwise(round(col("value") * 100).cast("long")).as("cents"))
      .groupBy(col("user_id"))
      .agg(sum(col("cents")).as("net"), count(lit(1)).as("n"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == want)
  }

  test("flatMapGroupsWithState sessions: closed + open == batch session count") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[EventRow]
    ms.addData(rows)
    val q = Streams
      .sessionFlow(spark, ms.toDS(), 1800L * 1000000L)
      .writeStream
      .format("memory")
      .queryName("t_flow")
      .outputMode("append")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    // per user: closed sessions emitted + exactly one still-open tail
    // session in state == batch sessionization's total count
    val closed = spark
      .table("t_flow")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_closed"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val batch = ops.Temporal
      .windowSession(spark, sf)
      .select(col("user_id"), col("n_sessions"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    batch.foreach { case (uid, nSessions) =>
      assert(
        closed.getOrElse(uid, 0L) == nSessions - 1,
        s"user $uid: ${closed.getOrElse(uid, 0L)} closed vs $nSessions batch")
    }
  }

  test("conditional transfers: streaming state == batch sequential fold") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val initial = 100000L // 1000.00 per account, as in the reference bank
    val ms = MemoryStream[EventRow]
    // feed in time order across two batches (WAL replay contract)
    val ordered = rows.sortBy(e => (e.ts.getTime, e.event_id))
    val (h1, h2) = ordered.splitAt(ordered.length / 2)
    ms.addData(h1)
    val q = Streams
      .conditionalBalances(spark, ms.toDS(), initial)
      .writeStream
      .format("memory")
      .queryName("t_cond")
      .outputMode("update")
      .start()
    try {
      q.processAllAvailable()
      ms.addData(h2)
      q.processAllAvailable()
    } finally q.stop()
    // update sink holds one row per (user, micro-batch); the final state
    // is the one with the largest accepted+rejected counter (monotone
    // across batches — no reliance on sink row order)
    val streaming = spark
      .table("t_cond")
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .groupBy(_._1)
      .map { case (uid, rs) =>
        uid -> rs.map(_._2).maxBy(s => s._2 + s._3)
      }
    val batch = ops.Transactional
      .conditionalFold(spark, sf, initial)
      .collect()
      .map(o => o.user_id -> (o.final_cents, o.accepted, o.rejected))
      .toMap
    assert(streaming == batch)
    // reference invariants (bank.clj:41-44): conservation over accepted
    // transfers and no negative balance
    batch.values.foreach { case (cents, _, rejected) =>
      assert(cents >= 0, "negative balance")
      assert(rejected >= 0)
    }
  }

  test("file-source readStream replays the events table completely") {
    val q = Streams
      .eventsStream(spark, sf)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
      .writeStream
      .format("memory")
      .queryName("t_replay")
      .outputMode("complete")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed =
      spark.table("t_replay").agg(sum(col("n"))).first().getLong(0)
    assert(streamed == Tables.events(spark, sf).count())
  }
}
