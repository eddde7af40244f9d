package graft.ops

import graft.Tables
import graft.functions.Exact._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Event-stream analytics over the `events` table — the analytic dual of
  * the reference's WAL (/root/reference/src/opusdb/logging/log_mgr.clj):
  * `event_id` plays the LSN, replay is an orderBy, and the windowed
  * queries are the batch twins of the Structured Streaming pipelines in
  * graft.streaming (same frame semantics, oracle-checkable here).
  *
  * Timestamps: `ts` is microsecond-exact on both engines (Tables.events
  * converts the nanos parquet via integral division; DuckDB's epoch_us
  * truncates the same way), and every window key is emitted as an
  * integer epoch index — never a raw timestamp — so the hash compare is
  * immune to timestamp-precision dialect differences.
  *
  * Scale notes: window/sessionization queries shuffle once on user_id;
  * the global LSN gap-check is a single-pass aggregate plus a
  * lag-window over event_id — at cluster scale that global window is
  * range-partitioned by Spark on the orderBy key, not single-threaded.
  */
object Temporal {
  type Q = (SparkSession, String) => DataFrame

  private val HourUs = 3600L * 1000000L
  private val SlideUs = 900L * 1000000L // 15 min
  private val SessionGapUs = 1800L * 1000000L // 30 min

  // ---------------------------------------------------------------------
  // q_wal_gapcheck — LSN continuity audit: the reference's replay
  // guarantee (log_mgr.clj:16-33, ordered & complete) as a single-row
  // invariant: count == max-min+1 and no lag-gap != 1.
  // ---------------------------------------------------------------------
  val walGapcheck: Q = (s, d) => {
    // Two-level gap scan — NOT a global `Window.orderBy(event_id)`,
    // which moves every row to a single partition. Level 1: rows bucket
    // by `event_id div B`; the per-bucket window sorts only one bucket
    // per task. Level 2: a window over the per-bucket (min, max) summary
    // — |id-range| / B rows, 10^6× smaller than the log — catches
    // cross-bucket gaps (including wholly missing buckets). Identical
    // output to the naive single-window form, which remains the DuckDB
    // oracle's formulation.
    val B = 100000L
    val e = Tables.events(s, d).select(col("event_id"))
    val bucketed = e.withColumn("bkt", expr(s"event_id div $B"))
    val wIn = Window.partitionBy(col("bkt")).orderBy(col("event_id"))
    val within = bucketed
      .withColumn("g", col("event_id") - lag(col("event_id"), 1).over(wIn))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("event_id")).as("min_lsn"),
        max(col("event_id")).as("max_lsn"),
        sum(when(col("g") =!= 1, 1L).otherwise(0L)).as("within_gaps"),
        max(col("g")).as("within_max"))
    val wB = Window.orderBy(col("bkt")) // over the tiny bucket summary
    val boundary = bucketed
      .groupBy(col("bkt"))
      .agg(min(col("event_id")).as("lo"), max(col("event_id")).as("hi"))
      .withColumn("g", col("lo") - lag(col("hi"), 1).over(wB))
      .agg(
        sum(when(col("g") =!= 1, 1L).otherwise(0L)).as("boundary_gaps"),
        max(col("g")).as("boundary_max"))
    within
      .crossJoin(boundary)
      .select(
        col("n_events"),
        col("min_lsn"),
        col("max_lsn"),
        (col("within_gaps") + col("boundary_gaps")).as("n_gaps"),
        greatest(col("within_max"), col("boundary_max")).as("max_gap"))
  }

  val walGapcheckSql: String =
    """SELECT count(*) AS n_events, min(event_id) AS min_lsn,
      |max(event_id) AS max_lsn,
      |CAST(SUM(CASE WHEN g != 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps,
      |max(g) AS max_gap
      |FROM (SELECT event_id,
      |      event_id - lag(event_id, 1) OVER (ORDER BY event_id) AS g
      |      FROM events)""".stripMargin

  // ---------------------------------------------------------------------
  // q_wal_replay — ordered replay folded in micro-batches of 1000 LSNs
  // (the batch twin of streaming's per-epoch commit): per batch, event
  // count, value total, LSN bounds — exactly the shape a recovering
  // engine would replay.
  // ---------------------------------------------------------------------
  val walReplay: Q = (s, d) => {
    Tables
      .events(s, d)
      .groupBy(expr("(event_id - 1) div 1000").as("batch"))
      .agg(
        count(lit(1)).as("n"),
        dsum(col("value")).as("value_total"),
        min(col("event_id")).as("first_lsn"),
        max(col("event_id")).as("last_lsn")
      )
      .orderBy(col("batch"))
  }

  val walReplaySql: String =
    s"""SELECT (event_id - 1) // 1000 AS batch,
       |count(*) AS n, ${sqlDsum("value")} AS value_total,
       |min(event_id) AS first_lsn, max(event_id) AS last_lsn
       |FROM events GROUP BY batch ORDER BY batch""".stripMargin

  // ---------------------------------------------------------------------
  // q_window_tumbling — 1-hour tumbling windows: the batch equivalent of
  // streaming `window(ts, "1 hour")`, keyed by integer hour index.
  // ---------------------------------------------------------------------
  val windowTumbling: Q = (s, d) => {
    Tables
      .events(s, d)
      .groupBy(
        expr(s"unix_micros(ts) div $HourUs").as("hour_idx"),
        col("event_type")
      )
      .agg(
        count(lit(1)).as("n"),
        dsum(col("value")).as("value_total"),
        countDistinct(col("user_id")).as("d_users")
      )
      .orderBy(col("hour_idx"), col("event_type"))
  }

  val windowTumblingSql: String =
    s"""SELECT epoch_us(ts) // $HourUs AS hour_idx, event_type,
       |count(*) AS n, ${sqlDsum("value")} AS value_total,
       |count(DISTINCT user_id) AS d_users
       |FROM events GROUP BY 1, 2 ORDER BY hour_idx, event_type""".stripMargin

  // ---------------------------------------------------------------------
  // q_window_sliding — 1-hour windows sliding every 15 min: each event
  // lands in exactly 4 windows (explode over the 4 offsets), keyed by
  // the window-start index in 15-min units.
  // ---------------------------------------------------------------------
  val windowSliding: Q = (s, d) => {
    Tables
      .events(s, d)
      .withColumn("k", explode(sequence(lit(0), lit(3))))
      .groupBy(
        (expr(s"unix_micros(ts) div $SlideUs") - col("k")).as("win_start_q"),
        col("event_type")
      )
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("value_total"))
      .orderBy(col("win_start_q"), col("event_type"))
  }

  val windowSlidingSql: String =
    s"""SELECT (epoch_us(ts) // $SlideUs) - k AS win_start_q, event_type,
       |count(*) AS n, ${sqlDsum("value")} AS value_total
       |FROM events, unnest([0, 1, 2, 3]) AS t(k)
       |GROUP BY 1, 2 ORDER BY win_start_q, event_type""".stripMargin

  // ---------------------------------------------------------------------
  // q_window_session — sessionization: per user, a new session starts
  // when the gap to the previous event exceeds 30 min (the batch twin of
  // streaming session_window). Output per user: session count, longest
  // session (µs, integer-exact), busiest session event count.
  // ---------------------------------------------------------------------
  val windowSession: Q = (s, d) => {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val sessions = Tables
      .events(s, d)
      .withColumn("t_us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("t_us"), 1).over(byUser))
      .withColumn(
        "new_sess",
        when(
          col("prev_us").isNull || (col("t_us") - col("prev_us")) > SessionGapUs,
          1L
        ).otherwise(0L)
      )
      .withColumn(
        "sess_id",
        sum(col("new_sess"))
          .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      )
      .groupBy(col("user_id"), col("sess_id"))
      .agg(
        count(lit(1)).as("n_events"),
        (max(col("t_us")) - min(col("t_us"))).as("dur_us")
      )
    sessions
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_sessions"),
        max(col("dur_us")).as("max_session_us"),
        max(col("n_events")).as("max_session_events"),
        sum(col("n_events")).as("total_events")
      )
      .orderBy(col("user_id"))
  }

  val windowSessionSql: String =
    s"""SELECT user_id, count(*) AS n_sessions,
       |max(dur_us) AS max_session_us,
       |max(n_events) AS max_session_events,
       |CAST(SUM(n_events) AS BIGINT) AS total_events
       |FROM (
       |  SELECT user_id, sess_id, count(*) AS n_events,
       |         max(t_us) - min(t_us) AS dur_us
       |  FROM (
       |    SELECT user_id, t_us,
       |      SUM(new_sess) OVER (PARTITION BY user_id ORDER BY t_us, event_id
       |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
       |    FROM (
       |      SELECT user_id, event_id, epoch_us(ts) AS t_us,
       |        CASE WHEN lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) IS NULL
       |               OR epoch_us(ts) - lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) > $SessionGapUs
       |             THEN 1 ELSE 0 END AS new_sess
       |      FROM events))
       |  GROUP BY user_id, sess_id)
       |GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------------
  // q_events_json — semi-structured access: pull `k` out of the JSON
  // props column, aggregate per event_type. get_json_object stays inside
  // codegen; no UDF.
  // ---------------------------------------------------------------------
  val eventsJson: Q = (s, d) => {
    Tables
      .events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("k_total"),
        min(col("k")).as("k_min"),
        max(col("k")).as("k_max"),
        countDistinct(col("k")).as("d_k")
      )
      .orderBy(col("event_type"))
  }

  val eventsJsonSql: String =
    """SELECT event_type, count(*) AS n,
      |CAST(SUM(k) AS BIGINT) AS k_total, min(k) AS k_min, max(k) AS k_max,
      |count(DISTINCT k) AS d_k
      |FROM (SELECT event_type,
      |      CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |      FROM events)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_wal_gapcheck" -> walGapcheck,
    "q_wal_replay" -> walReplay,
    "q_window_tumbling" -> windowTumbling,
    "q_window_sliding" -> windowSliding,
    "q_window_session" -> windowSession,
    "q_events_json" -> eventsJson
  )

  val oracleSql: Map[String, String] = Map(
    "q_wal_gapcheck" -> walGapcheckSql,
    "q_wal_replay" -> walReplaySql,
    "q_window_tumbling" -> windowTumblingSql,
    "q_window_sliding" -> windowSlidingSql,
    "q_window_session" -> windowSessionSql,
    "q_events_json" -> eventsJsonSql
  )
}
