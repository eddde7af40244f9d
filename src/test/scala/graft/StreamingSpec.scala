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

  test("stream dedup evicts state once the watermark passes a key's window") {
    // q_stream_dedup's oracle gate checks the emitted KEY SET only; if a
    // Spark version change stopped the watermark metadata propagating
    // through the derived window column into dropDuplicates, state would
    // grow unboundedly and the gate would never notice. This pins the
    // eviction itself: batches six hours apart advance the watermark, so
    // the early keys' state rows MUST be removed (numRowsRemoved) and
    // the final state must hold fewer rows than total distinct keys.
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def row(id: Long, hour: Long, user: Long): EventRow =
      EventRow(
        id,
        java.sql.Timestamp.from(
          java.time.Instant.parse("2024-01-01T00:00:00Z")
            .plusSeconds(hour * 3600)),
        user,
        "view",
        1.0,
        "{}")
    val ms = MemoryStream[EventRow]
    val deduped = ms
      .toDF()
      .withWatermark("ts", "1 hour")
      .select(
        col("user_id"),
        col("event_type"),
        window(col("ts"), "1 hour").as("win"))
      .dropDuplicates("user_id", "event_type", "win")
    val q = deduped.writeStream
      .format("memory")
      .queryName("t_dedup_evict")
      .outputMode("append")
      .start()
    try {
      ms.addData(row(1, 0, 1), row(2, 0, 2))
      q.processAllAvailable()
      ms.addData(row(3, 6, 1), row(4, 6, 2))
      q.processAllAvailable()
      // third batch runs with watermark = hour 5: the hour-0 state rows
      // are now expired and must be physically removed
      ms.addData(row(5, 12, 1))
      q.processAllAvailable()
      val states = q.recentProgress.flatMap(_.stateOperators)
      val removed = states.map(_.numRowsRemoved).sum
      val lastTotal = states.lastOption.map(_.numRowsTotal).getOrElse(-1L)
      assert(removed >= 2, s"no state eviction observed (removed=$removed)")
      assert(
        lastTotal < 5,
        s"state holds all $lastTotal keys — watermark not evicting")
    } finally q.stop()
  }

  test("windowed-aggregate state is evicted by the watermark — and a stalled watermark is DETECTED") {
    // Round-8 lesson: a watermark that never advances past any window end
    // (there: a 1000× collapsed time axis) keeps every window in state and
    // emits nothing, and only the ORACLE noticed. This pins the tripwire at
    // the test level: the same pipeline run with a healthy 1-hour delay must
    // evict + emit; run with a deliberately-broken (stall-equivalent,
    // 10000-hour) delay it must hold all state and emit nothing — which is
    // exactly the signature the healthy-arm assertions would catch.
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def run(delay: String, name: String): (Long, Long, Long) = {
      def row(id: Long, hour: Long, user: Long): EventRow =
        EventRow(
          id,
          java.sql.Timestamp.from(
            java.time.Instant.parse("2024-01-01T00:00:00Z")
              .plusSeconds(hour * 3600)),
          user,
          "view",
          1.0,
          "{}")
      val ms = MemoryStream[EventRow]
      val agg = ms
        .toDF()
        .withWatermark("ts", delay)
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n"))
      val q = agg.writeStream
        .format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
      try {
        ms.addData(row(1, 0, 1), row(2, 0, 2))
        q.processAllAvailable()
        ms.addData(row(3, 6, 1))
        q.processAllAvailable()
        ms.addData(row(4, 12, 1))
        q.processAllAvailable()
        val states = q.recentProgress.flatMap(_.stateOperators)
        (states.map(_.numRowsRemoved).sum,
          states.lastOption.map(_.numRowsTotal).getOrElse(-1L),
          spark.table(name).count())
      } finally q.stop()
    }
    val (removed, lastTotal, emitted) = run("1 hour", "t_winagg_evict")
    assert(removed >= 1, s"healthy watermark evicted nothing (removed=$removed)")
    assert(lastTotal < 3, s"state holds all $lastTotal windows — not evicting")
    assert(emitted >= 1, s"healthy watermark emitted no closed windows")
    val (removedB, totalB, emittedB) = run("10000 hours", "t_winagg_stall")
    assert(
      removedB == 0 && emittedB == 0 && totalB == 3,
      s"stalled-watermark signature not detected (removed=$removedB, " +
        s"total=$totalB, emitted=$emittedB) — the tripwire would miss a stall")
  }

  test("gated left-outer stream-stream join == batch left join on the horizon") {
    // q_stream_join_outer's contract: within the emittable horizon
    // (p_ts <= max_ts - 2h) the completed sink equals a plain batch LEFT
    // join — including exactly ONE null row per never-matched purchase.
    val got = Streams
      .streamJoinOuterGated(spark, sf)
      .collect()
      .map(r =>
        r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Double])))
      .toMap
    val ev = Tables.events(spark, sf)
    val maxUs =
      ev.agg(max(unix_micros(col("ts")))).head().getLong(0)
    val p = ev
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("p_us"),
        col("event_id").as("p_id"))
      .filter(col("p_us") <= lit(maxUs - 2 * 3600L * 1000000L))
    val v = ev
      .filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), unix_micros(col("ts")).as("v_us"),
        col("value").as("v_val"))
    val want = p
      .join(
        v,
        col("user_id") === col("v_user") &&
          col("v_us") <= col("p_us") &&
          col("v_us") >= col("p_us") - 3600L * 1000000L,
        "left_outer")
      .groupBy(col("user_id"))
      .agg(
        countDistinct(col("p_id")).as("n_purchases"),
        count(col("v_val")).as("n_viewed_pairs"),
        countDistinct(when(col("v_val").isNull, col("p_id"))).as("n_unmatched"),
        sum(col("v_val").cast("decimal(18,4)")).cast("double").as("viewed_total"))
      .collect()
      .map(r =>
        r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Double])))
      .toMap
    assert(got == want)
    assert(want.values.exists(_._3 > 0), "no unmatched purchase — vacuous")
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

  test("transformWithState running balance == mapGroupsWithState == batch fold") {
    // Spark 4's arbitrary-state API must produce the identical exact-
    // cents fold; transformWithState requires the RocksDB provider
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(key)
    spark.conf.set(
      key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[EventRow]
      ms.addData(rows)
      val q = Streams
        .runningBalancesTws(spark, ms.toDS())
        .writeStream
        .format("memory")
        .queryName("t_bal_tws")
        .outputMode("update")
        .start()
      try q.processAllAvailable()
      finally q.stop()
      val got = spark
        .table("t_bal_tws")
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
    } finally prevProvider match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("event-time timers close idle sessions == batch island sessionization") {
    // transformWithState with per-key timers: intra-batch gaps close
    // inline, the open tail closes when the watermark passes its timer.
    // A far-future sentinel event (excluded user) jumps the watermark so
    // every real session must be emitted — by gap or by timer — and the
    // total must equal the batch gap-rule island count.
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(key)
    spark.conf.set(
      key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val gapUs = 1800L * 1000000L
      val ms = MemoryStream[EventRow]
      val q = Streams
        .timedSessions(spark, ms.toDS(), gapUs)
        .writeStream
        .format("memory")
        .queryName("t_sess_timer")
        .outputMode("append")
        .start()
      try {
        ms.addData(rows)
        q.processAllAvailable()
        val maxTs = rows.map(_.ts.getTime).max
        ms.addData(
          EventRow(-1L, new java.sql.Timestamp(maxTs + 10L * 86400000L), -1L, "view", 0.0, "{}"))
        q.processAllAvailable()
      } finally q.stop()
      val emitted = spark
        .table("t_sess_timer")
        .filter(col("user_id") >= 0)
      val gotPerUser = emitted
        .groupBy(col("user_id"))
        .count()
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .toMap
      val byUser = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("t_us"), col("event_id"))
      val want = Tables
        .events(spark, sf)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("t_us"))
        .withColumn("prev", lag(col("t_us"), 1).over(byUser))
        .withColumn(
          "new_sess",
          when(col("prev").isNull || col("t_us") - col("prev") > gapUs, 1L)
            .otherwise(0L))
        .groupBy(col("user_id"))
        .agg(sum(col("new_sess")).as("n_sessions"))
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .toMap
      assert(gotPerUser == want)
      val timerClosed =
        emitted.filter(col("closed_by") === "timer").count()
      assert(timerClosed >= want.size, s"only $timerClosed timer closures")
    } finally prevProvider match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
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
