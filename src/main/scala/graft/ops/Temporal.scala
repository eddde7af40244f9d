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

  // ---------------------------------------------------------------------
  // q_variant_events — Spark 4 VARIANT ingestion: props is parsed ONCE
  // into the binary-encoded variant type, then every field access is a
  // cheap path lookup on the encoded value. At 100 TB this is the
  // semi-structured story: q_events_json re-parses the JSON string per
  // get_json_object call, while a variant column is decoded at ingest
  // and (in parquet) shreds into typed subcolumns — extraction cost no
  // longer scales with the number of fields read. The lanes pin typed
  // extraction (k as BIGINT), schema introspection (schema_of_variant
  // over the encoded value), and absent-path semantics
  // (try_variant_get → NULL, counted per group). Oracle: DuckDB's JSON
  // type plays the variant role; json_extract_string '$.k' + a missing
  // path yield the same values.
  // ---------------------------------------------------------------------
  val variantEvents: Q = (s, d) => {
    val v = Tables
      .events(s, d)
      .withColumn("v", parse_json(col("props")))
    v.select(
      col("event_type"),
      try_variant_get(col("v"), "$.k", "bigint").as("k"),
      try_variant_get(col("v"), "$.absent", "bigint").as("miss"),
      schema_of_variant(col("v")).as("vschema")
    ).groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("k_total"),
        min(col("k")).as("k_min"),
        max(col("k")).as("k_max"),
        count(col("miss")).as("n_absent_hits"),
        countDistinct(col("vschema")).as("d_schema")
      )
      .orderBy(col("event_type"))
  }

  val variantEventsSql: String =
    """SELECT event_type, count(*) AS n,
      |CAST(SUM(k) AS BIGINT) AS k_total, min(k) AS k_min, max(k) AS k_max,
      |CAST(count(miss) AS BIGINT) AS n_absent_hits,
      |count(DISTINCT vschema) AS d_schema
      |FROM (SELECT event_type,
      |      CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
      |      CAST(json_extract_string(props, '$.absent') AS BIGINT) AS miss,
      |      json_structure(props) AS vschema
      |      FROM events)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------
  // q_funnel — ordered conversion funnel: first view → first click
  // AFTER that view → first purchase AFTER that click, per user; one
  // summary row of stage counts (monotone by construction — the
  // hash compare pins the ordering semantics, not just the totals).
  // Three passes, each a per-user hash aggregate + a user-keyed join of
  // the per-user stage frame (at scale: same shuffle key every pass,
  // map-side partials; no windows over the raw stream).
  // ---------------------------------------------------------------------
  private val DayUs = 86400L * 1000000L

  val funnel: Q = (s, d) => {
    val e = Tables.events(s, d)
      .select(
        col("user_id"),
        col("event_type"),
        unix_micros(col("ts")).as("t"))
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("t")).as("tv"))
    val c = e.filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(col("t") >= col("tv"))
      .groupBy(col("user_id")).agg(min(col("t")).as("tc"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(col("t") >= col("tc"))
      .groupBy(col("user_id")).agg(min(col("t")).as("tp"))
    val users = e.select(col("user_id")).distinct()
    users
      .join(v, Seq("user_id"), "left")
      .join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .agg(
        count(lit(1)).as("n_users"),
        sum(when(col("tv").isNotNull, 1L).otherwise(0L)).as("n_view"),
        sum(when(col("tc").isNotNull, 1L).otherwise(0L)).as("n_click_after_view"),
        sum(when(col("tp").isNotNull, 1L).otherwise(0L)).as("n_purchase_after_click"))
  }

  val funnelSql: String =
    """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
      |v AS (SELECT user_id, min(t) AS tv FROM e WHERE event_type = 'view'
      |      GROUP BY user_id),
      |c AS (SELECT e.user_id, min(e.t) AS tc FROM e JOIN v ON e.user_id = v.user_id
      |      WHERE e.event_type = 'click' AND e.t >= v.tv GROUP BY e.user_id),
      |p AS (SELECT e.user_id, min(e.t) AS tp FROM e JOIN c ON e.user_id = c.user_id
      |      WHERE e.event_type = 'purchase' AND e.t >= c.tc GROUP BY e.user_id),
      |u AS (SELECT DISTINCT user_id FROM e)
      |SELECT count(*) AS n_users,
      |CAST(SUM(CASE WHEN v.tv IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
      |CAST(SUM(CASE WHEN c.tc IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_click_after_view,
      |CAST(SUM(CASE WHEN p.tp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase_after_click
      |FROM u LEFT JOIN v ON u.user_id = v.user_id
      |LEFT JOIN c ON u.user_id = c.user_id
      |LEFT JOIN p ON u.user_id = p.user_id""".stripMargin

  // ---------------------------------------------------------------------
  // q_retention — cohort retention matrix: users grouped by first-seen
  // day, retained_k = distinct users of the cohort active exactly k
  // days later (k = 0..3). Built from the DISTINCT (user, day) frame
  // (one dedup shuffle bounds everything downstream by users × days,
  // not events); conditional count(DISTINCT CASE ...) emits the four
  // retention columns in one aggregate.
  // ---------------------------------------------------------------------
  val retention: Q = (s, d) => {
    val ud = Tables.events(s, d)
      .select(
        col("user_id"),
        // integral div — a float quotient cast long can round across a
        // day boundary in the last ulp
        expr(s"unix_micros(ts) div $DayUs").as("day"))
      .distinct()
    val first = ud.groupBy(col("user_id")).agg(min(col("day")).as("cohort"))
    ud.join(first, Seq("user_id"))
      .withColumn("k", col("day") - col("cohort"))
      .filter(col("k") <= 3)
      .groupBy(col("cohort"))
      .agg(
        countDistinct(col("user_id")).as("cohort_size"),
        countDistinct(when(col("k") === 1, col("user_id"))).as("d1"),
        countDistinct(when(col("k") === 2, col("user_id"))).as("d2"),
        countDistinct(when(col("k") === 3, col("user_id"))).as("d3"))
      .orderBy(col("cohort"))
  }

  val retentionSql: String =
    s"""WITH ud AS (SELECT DISTINCT user_id, epoch_us(ts) // $DayUs AS day
       |            FROM events),
       |f AS (SELECT user_id, min(day) AS cohort FROM ud GROUP BY user_id)
       |SELECT f.cohort,
       |count(DISTINCT ud.user_id) AS cohort_size,
       |count(DISTINCT CASE WHEN ud.day - f.cohort = 1 THEN ud.user_id END) AS d1,
       |count(DISTINCT CASE WHEN ud.day - f.cohort = 2 THEN ud.user_id END) AS d2,
       |count(DISTINCT CASE WHEN ud.day - f.cohort = 3 THEN ud.user_id END) AS d3
       |FROM ud JOIN f ON ud.user_id = f.user_id
       |WHERE ud.day - f.cohort <= 3
       |GROUP BY f.cohort ORDER BY f.cohort""".stripMargin

  // ---------------------------------------------------------------------
  // q_cohort_ltv — the retention matrix's REVENUE dimension: per
  // signup-week cohort (first-seen week), cumulative purchase revenue
  // realized within 0, 1 and 2 weeks of cohort entry — the
  // lifetime-value curve growth teams steer by. Cohorting reuses the
  // min-over-user first-touch shape; revenue is decimal-exact and the
  // within-k-weeks columns are CUMULATIVE (w1 includes w0 — LTV curves
  // are monotone), so a single conditional-sum aggregate emits the
  // whole curve in one pass over purchases.
  // ---------------------------------------------------------------------
  private val WeekUs = 7L * 86400L * 1000000L

  val cohortLtv: Q = (s, d) => {
    val e = Tables
      .events(s, d)
      .withColumn("wk", expr(s"unix_micros(ts) div $WeekUs"))
    val first = e
      .groupBy(col("user_id"))
      .agg(min(col("wk")).as("cohort_wk"))
    val purchases = e
      .filter(col("event_type") === "purchase")
      .join(first, Seq("user_id"))
      .withColumn("k", col("wk") - col("cohort_wk"))
    val sizes = first
      .groupBy(col("cohort_wk"))
      .agg(countDistinct(col("user_id")).as("cohort_size"))
    purchases
      .groupBy(col("cohort_wk"))
      .agg(
        dsum(when(col("k") <= 0, col("value"))).as("rev_w0"),
        dsum(when(col("k") <= 1, col("value"))).as("rev_w1"),
        dsum(when(col("k") <= 2, col("value"))).as("rev_w2"),
        countDistinct(when(col("k") <= 2, col("user_id"))).as("buyers_w2"))
      .join(sizes, Seq("cohort_wk"))
      .select(
        col("cohort_wk"),
        col("cohort_size"),
        col("rev_w0"),
        col("rev_w1"),
        col("rev_w2"),
        col("buyers_w2"))
      .orderBy(col("cohort_wk"))
  }

  val cohortLtvSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_type, value, epoch_us(ts) // $WeekUs AS wk
       |  FROM events),
       |f AS (SELECT user_id, min(wk) AS cohort_wk FROM e GROUP BY user_id),
       |sizes AS (SELECT cohort_wk, count(DISTINCT user_id) AS cohort_size
       |          FROM f GROUP BY cohort_wk),
       |p AS (
       |  SELECT f.cohort_wk, e.user_id, e.value, e.wk - f.cohort_wk AS k
       |  FROM e JOIN f ON e.user_id = f.user_id
       |  WHERE e.event_type = 'purchase')
       |SELECT p.cohort_wk, s.cohort_size,
       |  ${sqlDsum("CASE WHEN k <= 0 THEN value END")} AS rev_w0,
       |  ${sqlDsum("CASE WHEN k <= 1 THEN value END")} AS rev_w1,
       |  ${sqlDsum("CASE WHEN k <= 2 THEN value END")} AS rev_w2,
       |  count(DISTINCT CASE WHEN k <= 2 THEN p.user_id END) AS buyers_w2
       |FROM p JOIN sizes s ON p.cohort_wk = s.cohort_wk
       |GROUP BY p.cohort_wk, s.cohort_size ORDER BY p.cohort_wk""".stripMargin

  // ---------------------------------------------------------------------
  // q_resample_fill — time-series RESAMPLE + forward fill: each user's
  // event stream resampled onto an hourly spine from their first to
  // their last active hour, gaps carrying the last observed value
  // forward (the standard gap-fill every metrics/feature pipeline runs
  // before training on regular time steps).
  //
  // Per (user, hour) the observation is the LAST event's value —
  // max_by over the unique event_id, deterministic on both engines
  // (DuckDB arg_max twin). The spine is generated per user with
  // sequence()+explode — no driver-side loop, no global calendar
  // crossJoin: spine size is Σ_user (active span), and the fill is one
  // user-partitioned window (shuffle on user_id, the same key the
  // observation aggregate already used). At 100 TB the spine explode
  // and the IGNORE-NULLS window both stay keyed and partition-local —
  // nothing global anywhere.
  //
  // The spine starts at each user's FIRST observed hour, so `carried`
  // is never null on the spine and n_users = n_active + n_filled per
  // hour — an identity the hash gate pins alongside the carried sums.
  // ---------------------------------------------------------------------
  val resampleFill: Q = (s, d) => {
    // the observation frame feeds BOTH the spine bounds and the join —
    // localCheckpoint so the scan+aggregate runs once, not per branch
    val obs = Tables
      .events(s, d)
      .groupBy(col("user_id"), expr(s"unix_micros(ts) div $HourUs").as("h"))
      .agg(max_by(col("value"), col("event_id")).as("obs"))
      .localCheckpoint()
    val spine = obs
      .groupBy(col("user_id"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(col("user_id"), explode(sequence(col("h0"), col("h1"))).as("h"))
    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(col("h").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine
      .join(obs, Seq("user_id", "h"), "left")
      .withColumn("carried", last(col("obs"), ignoreNulls = true).over(w))
      .groupBy(col("h"))
      .agg(
        count(lit(1)).as("n_users"),
        count(col("obs")).as("n_active"),
        count(when(col("obs").isNull, col("carried"))).as("n_filled"),
        dsum(col("carried")).as("carried_total"))
      .orderBy(col("h"))
  }

  val resampleFillSql: String =
    s"""WITH obs AS (
       |  SELECT user_id, epoch_us(ts) // $HourUs AS h,
       |    arg_max(value, event_id) AS obs
       |  FROM events GROUP BY 1, 2),
       |mm AS (
       |  SELECT user_id, min(h) AS h0, max(h) AS h1 FROM obs GROUP BY user_id),
       |spine AS (
       |  SELECT user_id, unnest(range(h0, h1 + 1)) AS h FROM mm),
       |filled AS (
       |  SELECT s.user_id, s.h, o.obs,
       |    last_value(o.obs IGNORE NULLS) OVER (
       |      PARTITION BY s.user_id ORDER BY s.h
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried
       |  FROM spine s LEFT JOIN obs o ON s.user_id = o.user_id AND s.h = o.h)
       |SELECT h, count(*) AS n_users, count(obs) AS n_active,
       |count(CASE WHEN obs IS NULL THEN carried END) AS n_filled,
       |${sqlDsum("carried")} AS carried_total
       |FROM filled GROUP BY h ORDER BY h""".stripMargin

  // ---------------------------------------------------------------------
  // q_transitions — first-order Markov transition counts over each
  // user's event sequence: how often does event type A directly precede
  // type B? The behavioral-analytics staple behind next-action
  // prediction and anomaly scoring. One user-keyed window (lead over
  // the unique (ts, event_id) order — both engines resolve the sequence
  // identically), then a plain count aggregate on the (from, to) pair —
  // shuffle on user_id, then on the 5×5 pair space. No self-join of the
  // raw stream at any scale.
  // ---------------------------------------------------------------------
  val transitions: Q = (s, d) => {
    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(col("t_us").asc, col("event_id").asc)
    Tables
      .events(s, d)
      .select(
        col("user_id"),
        unix_micros(col("ts")).as("t_us"),
        col("event_id"),
        col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("d_users"))
      .orderBy(col("from_type"), col("to_type"))
  }

  val transitionsSql: String =
    s"""WITH seq AS (
       |  SELECT user_id, event_type,
       |    lead(event_type, 1) OVER (
       |      PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS to_type
       |  FROM events)
       |SELECT event_type AS from_type, to_type, count(*) AS n,
       |count(DISTINCT user_id) AS d_users
       |FROM seq WHERE to_type IS NOT NULL
       |GROUP BY from_type, to_type ORDER BY from_type, to_type""".stripMargin

  // ---------------------------------------------------------------------
  // q_session_paths — top navigation paths: each session (the
  // q_window_session gap rule) rendered as its ordered event-initial
  // string ("vvcp" = view view click purchase), counted corpus-wide.
  // The product-analytics staple behind "how do users reach checkout".
  // Path assembly is partition-local: collect the session's
  // (t_us, event_id, initial) structs, sort_array gives the unique
  // time order, transform+join renders the string — no second window
  // pass. Session cardinality bounds state (the 100 TB shape: one
  // array per session, session length bounded by the gap rule). The
  // deterministic (n DESC, path) top-10 rides TakeOrderedAndProject.
  // ---------------------------------------------------------------------
  val sessionPaths: Q = (s, d) => {
    val byUser =
      Window.partitionBy(col("user_id")).orderBy(col("t_us"), col("event_id"))
    Tables
      .events(s, d)
      .select(
        col("user_id"),
        col("event_id"),
        unix_micros(col("ts")).as("t_us"),
        substring(col("event_type"), 1, 1).as("init"))
      .withColumn("prev_us", lag(col("t_us"), 1).over(byUser))
      .withColumn(
        "new_sess",
        when(
          col("prev_us").isNull || (col("t_us") - col("prev_us")) > SessionGapUs,
          1L).otherwise(0L))
      .withColumn(
        "sess_id",
        sum(col("new_sess"))
          .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(
        array_join(
          transform(
            sort_array(
              collect_list(struct(col("t_us"), col("event_id"), col("init")))),
            e => e.getField("init")),
          "").as("path"))
      .groupBy(col("path"))
      .agg(
        count(lit(1)).as("n_sessions"),
        countDistinct(col("user_id")).as("d_users"))
      .orderBy(col("n_sessions").desc, col("path").asc)
      .limit(10)
  }

  val sessionPathsSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS t_us,
       |    substr(event_type, 1, 1) AS init,
       |    lag(epoch_us(ts)) OVER (PARTITION BY user_id
       |      ORDER BY epoch_us(ts), event_id) AS prev_us
       |  FROM events),
       |f AS (
       |  SELECT *, CASE WHEN prev_us IS NULL OR t_us - prev_us > $SessionGapUs
       |    THEN 1 ELSE 0 END AS new_sess FROM e),
       |sess AS (
       |  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
       |    ORDER BY t_us, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
       |  FROM f),
       |p AS (
       |  SELECT user_id, sess_id,
       |    string_agg(init, '' ORDER BY t_us, event_id) AS path
       |  FROM sess GROUP BY user_id, sess_id)
       |SELECT path, count(*) AS n_sessions,
       |count(DISTINCT user_id) AS d_users
       |FROM p GROUP BY path
       |ORDER BY n_sessions DESC, path ASC LIMIT 10""".stripMargin

  // ---------------------------------------------------------------------
  // q_decay_features — exponential time-decay user features (the
  // recency-weighted activity score behind churn/engagement models):
  // over each user's last 20 events, score = Σ cents_i · 2^(−age_rank).
  // BIT-EXACT BY CONSTRUCTION, no quantization needed: cents < 2¹⁶,
  // weights are exact powers of two down to 2^(−19), so every term is an
  // exact multiple of 2^(−19) and every partial sum spans < 53 mantissa
  // bits — double addition is EXACT here in any order, which is what
  // makes an ostensibly-float feature oracle-gateable and
  // repartition-invariant. One window (row_number per user) + one hash
  // aggregate; the 20-row cap bounds per-user work at any history depth.
  // ---------------------------------------------------------------------
  private val DecayDepth = 20

  val decayFeatures: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables
      .events(s, d)
      .withColumn("rn", row_number().over(w) - 1)
      .filter(col("rn") < DecayDepth)
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_recent"),
        sum(col("cents") * pow(lit(0.5), col("rn"))).as("decayed"),
        max(when(col("rn") === 0, col("event_type"))).as("last_type"))
      .orderBy(col("user_id"))
  }

  val decayFeaturesSql: String =
    s"""WITH r AS (
       |  SELECT user_id, event_type,
       |    CAST(round(value * 100) AS BIGINT) AS cents,
       |    row_number() OVER (PARTITION BY user_id
       |      ORDER BY ts DESC, event_id DESC) - 1 AS rn
       |  FROM events)
       |SELECT user_id, count(*) AS n_recent,
       |SUM(cents * power(0.5, rn)) AS decayed,
       |max(CASE WHEN rn = 0 THEN event_type END) AS last_type
       |FROM r WHERE rn < $DecayDepth
       |GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------------
  // q_attribution — marketing-style revenue attribution: every purchase
  // is credited to the FIRST touch and the LAST touch (click/view)
  // preceding it in the same user's stream, the two canonical
  // single-touch models. Carried state is an IGNORE NULLS running
  // first/last over (user, time) — one shuffle on user_id, no
  // self-join, no per-purchase lookback scan (the naive formulation is
  // a range self-join that quadratically explodes on active users).
  // Purchases with no prior touch land in the 'none' channel. Revenue
  // sums are decimal-exact.
  // ---------------------------------------------------------------------
  val attribution: Q = (s, d) => {
    val touch = when(
      col("event_type").isin("click", "view"),
      col("event_type"))
    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables
      .events(s, d)
      .withColumn("first_touch", first(touch, ignoreNulls = true).over(w))
      .withColumn("last_touch", last(touch, ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .groupBy(
        coalesce(col("first_touch"), lit("none")).as("first_channel"),
        coalesce(col("last_touch"), lit("none")).as("last_channel"))
      .agg(
        count(lit(1)).as("n_purchases"),
        dsum(col("value")).as("revenue"))
      .orderBy(col("first_channel"), col("last_channel"))
  }

  val attributionSql: String =
    s"""SELECT
       |  COALESCE(first_touch, 'none') AS first_channel,
       |  COALESCE(last_touch, 'none') AS last_channel,
       |  count(*) AS n_purchases, ${sqlDsum("value")} AS revenue
       |FROM (
       |  SELECT event_type, value,
       |    first_value(CASE WHEN event_type IN ('click', 'view')
       |                THEN event_type END IGNORE NULLS) OVER (
       |      PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_touch,
       |    last_value(CASE WHEN event_type IN ('click', 'view')
       |               THEN event_type END IGNORE NULLS) OVER (
       |      PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_touch
       |  FROM events) t
       |WHERE event_type = 'purchase'
       |GROUP BY 1, 2 ORDER BY first_channel, last_channel""".stripMargin

  // ---------------------------------------------------------------------
  // q_concurrency — peak concurrent activity per day via the classic
  // interval sweep: each event opens a 1-hour activity interval
  // [ts, ts+1h); +1/−1 deltas at the endpoints, a running sum over the
  // global delta order, max per day. Half-open semantics: at an exact
  // boundary instant the −1 sorts before the +1 (ORDER BY t, delta), so
  // back-to-back intervals never double-count; the order is totalized
  // by event_id so both engines walk the identical sequence.
  //
  // Scale (the single-partition-window trap): the running sum is NOT a
  // global Window.orderBy — deltas carry their day, level 1 runs the
  // running sum PARTITIONED by day, level 2 folds per-day delta totals
  // (≤ one row per day — KB-scale) into a cumulative carry-in added
  // back per day. Identical values to the naive global window, which
  // remains the oracle's formulation.
  // ---------------------------------------------------------------------

  val concurrency: Q = (s, d) => {
    val e = Tables.events(s, d)
    val starts = e.select(
      col("ts").as("t"),
      lit(1L).as("delta"),
      col("event_id"))
    val ends = e.select(
      (col("ts") + expr("INTERVAL 1 HOUR")).as("t"),
      lit(-1L).as("delta"),
      col("event_id"))
    val deltas = starts
      .unionAll(ends)
      .withColumn("day_idx", expr(s"unix_micros(t) div $DayUs"))
    val wIn = Window
      .partitionBy(col("day_idx"))
      .orderBy(col("t"), col("delta"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val intra = deltas.withColumn("run_in", sum(col("delta")).over(wIn))
    // level 2: carry-in = sum of all deltas on earlier days (tiny frame)
    val wDays = Window
      .orderBy(col("day_idx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carry = deltas
      .groupBy(col("day_idx"))
      .agg(sum(col("delta")).as("day_total"))
      .withColumn(
        "carry_in",
        sum(col("day_total")).over(wDays) - col("day_total"))
      .select(col("day_idx"), col("carry_in"))
    intra
      .join(broadcast(carry), Seq("day_idx"))
      .groupBy(col("day_idx"))
      .agg(
        max(col("carry_in") + col("run_in")).as("peak_concurrent"),
        sum(when(col("delta") === 1L, 1L).otherwise(0L)).as("n_starts"))
      .orderBy(col("day_idx"))
  }

  val concurrencySql: String =
    s"""SELECT day_idx,
       |  max(run) AS peak_concurrent,
       |  CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_starts
       |FROM (
       |  SELECT CAST(epoch_us(t) // $DayUs AS BIGINT) AS day_idx, delta,
       |    CAST(SUM(delta) OVER (ORDER BY t, delta, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run
       |  FROM (
       |    SELECT ts AS t, CAST(1 AS BIGINT) AS delta, event_id FROM events
       |    UNION ALL
       |    SELECT ts + INTERVAL 1 HOUR, CAST(-1 AS BIGINT), event_id FROM events))
       |GROUP BY day_idx ORDER BY day_idx""".stripMargin

  // ---------------------------------------------------------------------
  // q_interval_join — KEYLESS interval-overlap join: every 'view'
  // activity interval [ts, ts+30m) against every 'error' impact window
  // [ts, ts+2h) that overlaps it (half-open: a.start < b.end AND
  // b.start < a.end), aggregated per day of the error. Unlike
  // q_range_join there is no equi key — the naive plan is a cartesian
  // BroadcastNestedLoopJoin that dies at scale.
  //
  // Scale pattern (the standard bucketed interval join): each interval
  // explodes to the HOURLY buckets it covers (≤2 for a 30-min view, 3
  // for a 2-h window — bounded fan-out), the join runs as an EQUI join
  // on the bucket, the exact overlap predicate filters within buckets,
  // and a DISTINCT collapses pairs that met in several shared buckets.
  // Shuffle is on the bucket key; pair generation is linear in
  // overlap-density, never |A|×|B|. The oracle keeps the naive theta
  // formulation (each true pair matches exactly once there).
  // ---------------------------------------------------------------------
  private val HalfHourUs = 1800L * 1000000L

  /** The bucketed interval-overlap core, reusable over any two interval
    * frames (a: a_id/a_s/a_e, b: b_id/b_s/b_e): hourly-bucket equi join
    * + exact half-open overlap + multi-bucket pair dedup. Exposed so the
    * skew property can drive the REAL implementation with adversarial
    * (hot-bucket) synthetic intervals, not a test-local copy.
    */
  private[graft] def intervalOverlapPairs(
      a: DataFrame,
      b: DataFrame): DataFrame = {
    val ab = a.withColumn(
      "bkt",
      explode(
        sequence(expr(s"a_s div $HourUs"), expr(s"(a_e - 1) div $HourUs"))))
    val bb = b.withColumn(
      "bkt",
      explode(
        sequence(expr(s"b_s div $HourUs"), expr(s"(b_e - 1) div $HourUs"))))
    ab.join(bb, Seq("bkt"))
      .filter(col("a_s") < col("b_e") && col("b_s") < col("a_e"))
      .select(col("a_id"), col("b_id"), col("b_s"))
      .distinct()
  }

  val intervalJoin: Q = (s, d) => {
    val e = Tables.events(s, d).withColumn("t_us", unix_micros(col("ts")))
    val views = e
      .filter(col("event_type") === "view")
      .select(
        col("event_id").as("a_id"),
        col("t_us").as("a_s"),
        (col("t_us") + HalfHourUs).as("a_e"))
    val errs = e
      .filter(col("event_type") === "error")
      .select(
        col("event_id").as("b_id"),
        col("t_us").as("b_s"),
        (col("t_us") + 2 * HourUs).as("b_e"))
    intervalOverlapPairs(views, errs)
      .groupBy(expr(s"b_s div $DayUs").as("day_idx"))
      .agg(
        count(lit(1)).as("n_pairs"),
        countDistinct(col("b_id")).as("n_errors_hit"),
        countDistinct(col("a_id")).as("n_views_hit"))
      .orderBy(col("day_idx"))
  }

  val intervalJoinSql: String =
    s"""SELECT e_s // $DayUs AS day_idx, count(*) AS n_pairs,
       |count(DISTINCT e_id) AS n_errors_hit,
       |count(DISTINCT v_id) AS n_views_hit
       |FROM (
       |  SELECT v.v_id, er.e_id, er.e_s
       |  FROM (SELECT event_id AS v_id, epoch_us(ts) AS v_s,
       |               epoch_us(ts) + $HalfHourUs AS v_e
       |        FROM events WHERE event_type = 'view') v
       |  JOIN (SELECT event_id AS e_id, epoch_us(ts) AS e_s,
       |               epoch_us(ts) + ${2 * HourUs} AS e_e
       |        FROM events WHERE event_type = 'error') er
       |    ON v.v_s < er.e_e AND er.e_s < v.v_e)
       |GROUP BY day_idx ORDER BY day_idx""".stripMargin

  // ---------------------------------------------------------------------
  // q_session_funnel — conversion WITHIN session boundaries: sessions
  // are 30-min-gap bounded per user (the q_window_session rule), a
  // session converts when a 'view' is strictly followed (by event time)
  // by a 'purchase' in the SAME session — the metric product funnels
  // actually report (cross-session conversions credit nothing). Per day
  // of session start: sessions, converted sessions, exact conversion
  // percent (integer counts, one exact-operand division). One shuffle
  // on user_id for sessionization, one on the day for the rollup.
  // ---------------------------------------------------------------------
  val sessionFunnel: Q = (s, d) => {
    val byUser = Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val e = Tables
      .events(s, d)
      .withColumn("t_us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("t_us"), 1).over(byUser))
      .withColumn(
        "is_new",
        (col("prev_us").isNull ||
          col("t_us") - col("prev_us") > SessionGapUs).cast("long"))
      .withColumn(
        "session_no",
        sum(col("is_new")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val sessions = e
      .groupBy(col("user_id"), col("session_no"))
      .agg(
        min(col("t_us")).as("s_start"),
        min(when(col("event_type") === "view", col("t_us"))).as("first_view"),
        max(when(col("event_type") === "purchase", col("t_us")))
          .as("last_purchase"))
    sessions
      .groupBy(expr(s"s_start div $DayUs").as("day_idx"))
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(
          when(col("first_view") < col("last_purchase"), 1L).otherwise(0L))
          .as("n_converted"))
      .withColumn(
        "conversion_pct",
        (col("n_converted") * 100L).cast("double") /
          col("n_sessions").cast("double"))
      .orderBy(col("day_idx"))
  }

  val sessionFunnelSql: String =
    s"""SELECT s_start // $DayUs AS day_idx,
       |  count(*) AS n_sessions,
       |  CAST(SUM(CASE WHEN first_view < last_purchase THEN 1 ELSE 0 END)
       |       AS BIGINT) AS n_converted,
       |  CAST(CAST(SUM(CASE WHEN first_view < last_purchase THEN 1 ELSE 0 END)
       |       AS BIGINT) * 100 AS DOUBLE) / CAST(count(*) AS DOUBLE)
       |    AS conversion_pct
       |FROM (
       |  SELECT user_id, session_no,
       |    min(t_us) AS s_start,
       |    min(CASE WHEN event_type = 'view' THEN t_us END) AS first_view,
       |    max(CASE WHEN event_type = 'purchase' THEN t_us END) AS last_purchase
       |  FROM (
       |    SELECT user_id, event_type, t_us,
       |      CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY t_us, event_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |        AS session_no
       |    FROM (
       |      SELECT user_id, event_type, event_id, epoch_us(ts) AS t_us,
       |        CASE WHEN lag(epoch_us(ts), 1) OVER (
       |               PARTITION BY user_id ORDER BY ts, event_id) IS NULL
       |             OR epoch_us(ts) - lag(epoch_us(ts), 1) OVER (
       |               PARTITION BY user_id ORDER BY ts, event_id)
       |               > $SessionGapUs
       |             THEN 1 ELSE 0 END AS is_new
       |      FROM events))
       |  GROUP BY user_id, session_no)
       |GROUP BY day_idx ORDER BY day_idx""".stripMargin

  // ---------------------------------------------------------------------
  // q_rolling_active — DAU and trailing-7-day WAU per day, the
  // stickiness metric (DAU/WAU) of every product dashboard. A rolling
  // COUNT(DISTINCT) admits no window frame, so the scalable shape is:
  // distinct (day, user) pairs ONCE, each expanded to the ≤7 target
  // days it keeps the user active for (bounded fan-out — the
  // q_window_sliding discipline), then one distinct-count per target
  // day, restricted to days that actually exist in the data. Exact
  // integers; the stickiness ratio is one exact-operand division.
  // ---------------------------------------------------------------------
  val rollingActive: Q = (s, d) => {
    val du = Tables
      .events(s, d)
      .select(
        expr(s"unix_micros(ts) div $DayUs").as("day"),
        col("user_id"))
      .distinct()
    val days = du.select(col("day")).distinct()
    val expanded = du
      .withColumn("target_day", explode(sequence(col("day"), col("day") + 6)))
      .join(days.withColumnRenamed("day", "target_day"), Seq("target_day"), "left_semi")
    val wau = expanded
      .groupBy(col("target_day").as("day_idx"))
      .agg(countDistinct(col("user_id")).as("wau"))
    val dau = du
      .groupBy(col("day").as("day_idx"))
      .agg(countDistinct(col("user_id")).as("dau"))
    dau
      .join(wau, Seq("day_idx"))
      .withColumn(
        "stickiness_pct",
        (col("dau") * 100L).cast("double") / col("wau").cast("double"))
      .orderBy(col("day_idx"))
  }

  val rollingActiveSql: String =
    s"""WITH du AS (
       |  SELECT DISTINCT epoch_us(ts) // $DayUs AS day, user_id FROM events),
       |days AS (SELECT DISTINCT day FROM du),
       |expanded AS (
       |  SELECT du.day + o.off AS target_day, du.user_id
       |  FROM du, (SELECT unnest(range(0, 7)) AS off) o
       |  WHERE du.day + o.off IN (SELECT day FROM days)),
       |wau AS (SELECT target_day AS day_idx, count(DISTINCT user_id) AS wau
       |        FROM expanded GROUP BY 1),
       |dau AS (SELECT day AS day_idx, count(DISTINCT user_id) AS dau
       |        FROM du GROUP BY 1)
       |SELECT d.day_idx, d.dau, w.wau,
       |  CAST(d.dau * 100 AS DOUBLE) / CAST(w.wau AS DOUBLE) AS stickiness_pct
       |FROM dau d JOIN wau w ON d.day_idx = w.day_idx
       |ORDER BY d.day_idx""".stripMargin

  // ---------------------------------------------------------------------
  // q_seasonality — the cyclic hour-of-day activity profile per event
  // type: the seasonality baseline every anomaly detector and capacity
  // planner subtracts before looking at residuals. Unlike the calendar
  // windows (tumbling/sliding), the group key is CYCLIC (hour mod 24),
  // folding 30 days onto one daily curve. Counts exact, value averages
  // decimal-exact; share-of-type is an exact-operand division.
  // ---------------------------------------------------------------------
  val seasonality: Q = (s, d) => {
    val e = Tables
      .events(s, d)
      .withColumn("hod", expr(s"(unix_micros(ts) div $HourUs) % 24"))
    val totals = e
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("type_total"))
    e.groupBy(col("event_type"), col("hod"))
      .agg(
        count(lit(1)).as("n"),
        davg(col("value")).as("avg_value"))
      .join(broadcast(totals), Seq("event_type"))
      .withColumn(
        "share_pct",
        (col("n") * 100L).cast("double") / col("type_total").cast("double"))
      .select(
        col("event_type"),
        col("hod"),
        col("n"),
        col("avg_value"),
        col("share_pct"))
      .orderBy(col("event_type"), col("hod"))
  }

  val seasonalitySql: String =
    s"""SELECT e.event_type, e.hod, e.n, e.avg_value,
       |  CAST(e.n * 100 AS DOUBLE) / CAST(t.type_total AS DOUBLE) AS share_pct
       |FROM (
       |  SELECT event_type, (epoch_us(ts) // $HourUs) % 24 AS hod,
       |    count(*) AS n, ${sqlDavg("value")} AS avg_value
       |  FROM events GROUP BY 1, 2) e
       |JOIN (SELECT event_type, count(*) AS type_total
       |      FROM events GROUP BY 1) t
       |  ON e.event_type = t.event_type
       |ORDER BY e.event_type, e.hod""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_seasonality" -> seasonality,
    "q_attribution" -> attribution,
    "q_concurrency" -> concurrency,
    "q_session_funnel" -> sessionFunnel,
    "q_rolling_active" -> rollingActive,
    "q_interval_join" -> intervalJoin,
    "q_funnel" -> funnel,
    "q_decay_features" -> decayFeatures,
    "q_retention" -> retention,
    "q_cohort_ltv" -> cohortLtv,
    "q_session_paths" -> sessionPaths,
    "q_transitions" -> transitions,
    "q_resample_fill" -> resampleFill,
    "q_wal_gapcheck" -> walGapcheck,
    "q_wal_replay" -> walReplay,
    "q_window_tumbling" -> windowTumbling,
    "q_window_sliding" -> windowSliding,
    "q_window_session" -> windowSession,
    "q_events_json" -> eventsJson,
    "q_variant_events" -> variantEvents
  )

  val oracleSql: Map[String, String] = Map(
    "q_seasonality" -> seasonalitySql,
    "q_attribution" -> attributionSql,
    "q_concurrency" -> concurrencySql,
    "q_session_funnel" -> sessionFunnelSql,
    "q_rolling_active" -> rollingActiveSql,
    "q_interval_join" -> intervalJoinSql,
    "q_funnel" -> funnelSql,
    "q_decay_features" -> decayFeaturesSql,
    "q_retention" -> retentionSql,
    "q_cohort_ltv" -> cohortLtvSql,
    "q_session_paths" -> sessionPathsSql,
    "q_transitions" -> transitionsSql,
    "q_resample_fill" -> resampleFillSql,
    "q_wal_gapcheck" -> walGapcheckSql,
    "q_wal_replay" -> walReplaySql,
    "q_window_tumbling" -> windowTumblingSql,
    "q_window_sliding" -> windowSlidingSql,
    "q_window_session" -> windowSessionSql,
    "q_events_json" -> eventsJsonSql,
    "q_variant_events" -> variantEventsSql
  )
}
