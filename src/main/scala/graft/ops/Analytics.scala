package graft.ops

import graft.Tables
import graft.functions.Exact._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Wider analytic operator surface: pivot, exact percentiles, range
  * (band) joins, as-of joins, date/array scalar families, grouping sets,
  * windowed argmax, and correlated subqueries.
  *
  * The reference has none of these (SURVEY.md §2.11 — no relational
  * operators at all); they are the north-star expansion built on Spark
  * built-ins. Every query keeps the cross-engine exactness discipline of
  * graft.functions.Exact: integer arithmetic or decimal-exact sums only,
  * so the DuckDB oracle hash-matches bit-for-bit.
  *
  * Scale notes (100 TB):
  *  - the as-of join is the union+merge form (one shuffle on the key,
  *    running `last` over the interleaved stream) — NOT a pairwise theta
  *    join, whose intermediate blows up as |left|×|events per key|;
  *  - the range join keys on the equi column (user) and applies the band
  *    predicate inside the per-key sort — candidate pairs are bounded by
  *    the band width, never the cross product;
  *  - pivot / grouping sets are single-shuffle hash aggregates with
  *    map-side partials; the percentile query is one shuffle + one
  *    window pass, no global sort of the fact table.
  */
object Analytics {
  type Q = (SparkSession, String) => DataFrame

  private val HourUs = 3600L * 1000000L

  // ---------------------------------------------------------------------
  // q_pivot — nation × market-segment balance matrix. Fixed pivot-value
  // list keeps the output schema static (and matches the oracle's
  // conditional-aggregation columns). Empty combinations stay NULL on
  // both engines.
  // ---------------------------------------------------------------------
  private val segments =
    Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")

  val pivotBalances: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .pivot("c_mktsegment", segments)
      .agg(dsum(col("c_acctbal")))
      .orderBy(col("n_name"))
  }

  val pivotBalancesSql: String = {
    val cells = segments
      .map(seg =>
        s"CAST(SUM(CASE WHEN c_mktsegment = '$seg' " +
          s"THEN CAST(c_acctbal AS DECIMAL(18,4)) END) AS DOUBLE) AS \"$seg\"")
      .mkString(",\n")
    s"""SELECT n_name,
       |$cells
       |FROM customer JOIN nation ON c_nationkey = n_nationkey
       |GROUP BY n_name ORDER BY n_name""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q_unpivot — the dual of q_pivot: melt a wide per-nation segment
  // matrix back to long (nation, segment, n_cust) rows via
  // Dataset.unpivot (Spark's native UNPIVOT — one Expand node, no
  // union-of-selects re-scan). At scale the wide frame is already an
  // aggregate (25 rows here, O(groups) generally), so the melt is free;
  // the point is API/semantics coverage: unpivot emits exactly
  // |ids|×|values| rows with the value-column NAME as data. Counts are
  // coalesced to 0 first so both engines see identical NULL semantics
  // (Spark's unpivot keeps nulls; DuckDB's UNPIVOT drops them — the
  // oracle uses an explicit UNION ALL, dialect-safe either way).
  // ---------------------------------------------------------------------
  val unpivotCounts: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val wide = c
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .pivot("c_mktsegment", segments)
      .agg(count(lit(1)))
    val filled = segments.foldLeft(wide)((df, seg) =>
      df.withColumn(seg, coalesce(col(s"`$seg`"), lit(0L))))
    filled
      .unpivot(
        Array(col("n_name")),
        segments.map(seg => col(s"`$seg`")).toArray,
        "segment",
        "n_cust")
      .orderBy(col("n_name"), col("segment"))
  }

  val unpivotCountsSql: String = {
    val arms = segments
      .map(seg =>
        s"SELECT n_name, '$seg' AS segment, " +
          s"count(CASE WHEN c_mktsegment = '$seg' THEN 1 END) AS n_cust " +
          "FROM customer JOIN nation ON c_nationkey = n_nationkey " +
          "GROUP BY n_name")
      .mkString("\nUNION ALL\n")
    s"""SELECT * FROM (
       |$arms
       |) ORDER BY n_name, segment""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q_median_exact — exact median + p25/p75 per order priority WITHOUT
  // engine-native percentile functions (whose interpolation arithmetic
  // differs between engines in the last ulp). Both engines pick the same
  // middle element(s) by rank and average them in exact decimal.
  // ---------------------------------------------------------------------
  val medianExact: Q = (s, d) => {
    // Scalable exact order statistics — NOT a window partitioned by the
    // 5-value priority column (that collapses to 5 tasks, each sorting
    // its whole group). Instead: (1) value-range histogram per group
    // (small), (2) locate which bucket holds each target rank via a
    // cumulative window over the HISTOGRAM, (3) rank rows only inside
    // the located buckets (per-(group,bucket) windows — each partition
    // holds one small value range), (4) in-bucket offset = global target
    // rank − rows in earlier buckets. Exact because bucketing by
    // floor(price/1000) is monotone in the (price, orderkey) sort order.
    val o = Tables.orders(s, d)
      .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
      .withColumn("b", floor(col("o_totalprice") / 1000).cast("long"))
    // every intermediate carries fresh column names so the self-derived
    // joins below are lineage-unambiguous
    val cnts = o.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("o_orderpriority").as("cpri"), col("cnt"))
    // both middle ranks (equal for odd counts)
    val targets = cnts.select(
      col("cpri").as("tpri"),
      explode(
        array_distinct(
          array(expr("(cnt + 1) div 2"), expr("(cnt + 2) div 2"))))
        .as("target"))
    val wHist = Window
      .partitionBy(col("hpri"))
      .orderBy(col("hb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = o.groupBy(col("o_orderpriority"), col("b"))
      .agg(count(lit(1)).as("bc"))
      .select(col("o_orderpriority").as("hpri"), col("b").as("hb"), col("bc"))
      .withColumn(
        "cum_before",
        coalesce(sum(col("bc")).over(wHist), lit(0L)))
    val located = targets
      .join(
        cum,
        col("tpri") === col("hpri") &&
          col("target") > col("cum_before") &&
          col("target") <= col("cum_before") + col("bc"))
      .select(
        col("tpri").as("pri"),
        col("hb").as("lb"),
        (col("target") - col("cum_before")).as("off"))
    val needed = located.select(col("pri").as("npri"), col("lb").as("nb")).distinct()
    val wInBucket = Window
      .partitionBy(col("o_orderpriority"), col("b"))
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    val ranked = o
      .join(
        broadcast(needed),
        col("o_orderpriority") === col("npri") && col("b") === col("nb"))
      .drop("npri", "nb")
      .withColumn("r", row_number().over(wInBucket).cast("long"))
    ranked
      .join(
        broadcast(located),
        col("o_orderpriority") === col("pri") &&
          col("b") === col("lb") && col("r") === col("off"))
      .groupBy(col("o_orderpriority"))
      .agg(davg(col("o_totalprice")).as("median_price"))
      .join(cnts, col("o_orderpriority") === col("cpri"))
      .select(
        col("o_orderpriority"),
        col("median_price"),
        col("cnt").as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  val medianExactSql: String =
    s"""SELECT o_orderpriority,
       |${sqlDavg("o_totalprice")} AS median_price,
       |max(cnt) AS n_orders
       |FROM (
       |  SELECT o_orderpriority, o_totalprice,
       |    row_number() OVER (PARTITION BY o_orderpriority
       |                       ORDER BY o_totalprice ASC, o_orderkey ASC) AS rnk,
       |    count(*) OVER (PARTITION BY o_orderpriority) AS cnt
       |  FROM orders) t
       |WHERE rnk = (cnt + 1) // 2 OR rnk = (cnt + 2) // 2
       |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------------
  // q_quantiles_exact — exact p10/p50/p90 per order priority, the
  // multi-rank generalization of q_median_exact's scalable order
  // statistic: value-range histogram per group → locate each target
  // rank's bucket via a cumulative window OVER THE HISTOGRAM → rank
  // rows only inside located buckets. Type-1 (lower) quantiles — the
  // ranked element itself, rank = ceil(p·n) — so the output is a
  // picked value, never interpolated (cross-engine exact by
  // construction). The oracle uses the naive global-window form.
  // ---------------------------------------------------------------------
  val quantilesExact: Q = (s, d) => {
    val o = Tables.orders(s, d)
      .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
      .withColumn("b", floor(col("o_totalprice") / 1000).cast("long"))
    val cnts = o.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("o_orderpriority").as("cpri"), col("cnt"))
    val targets = cnts
      .select(
        col("cpri").as("tpri"),
        explode(array(
          struct(lit("p10").as("tag"), expr("(cnt + 9) div 10").as("target")),
          struct(lit("p50").as("tag"), expr("(cnt + 1) div 2").as("target")),
          struct(lit("p90").as("tag"), expr("(9 * cnt + 9) div 10").as("target"))))
          .as("tg"))
      .select(col("tpri"), col("tg.tag").as("tag"), col("tg.target").as("target"))
    val wHist = Window
      .partitionBy(col("hpri"))
      .orderBy(col("hb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = o.groupBy(col("o_orderpriority"), col("b"))
      .agg(count(lit(1)).as("bc"))
      .select(col("o_orderpriority").as("hpri"), col("b").as("hb"), col("bc"))
      .withColumn("cum_before", coalesce(sum(col("bc")).over(wHist), lit(0L)))
    val located = targets
      .join(
        cum,
        col("tpri") === col("hpri") &&
          col("target") > col("cum_before") &&
          col("target") <= col("cum_before") + col("bc"))
      .select(
        col("tpri").as("pri"),
        col("tag"),
        col("hb").as("lb"),
        (col("target") - col("cum_before")).as("off"))
    val needed = located.select(col("pri").as("npri"), col("lb").as("nb")).distinct()
    val wInBucket = Window
      .partitionBy(col("o_orderpriority"), col("b"))
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    val ranked = o
      .join(
        broadcast(needed),
        col("o_orderpriority") === col("npri") && col("b") === col("nb"))
      .drop("npri", "nb")
      .withColumn("r", row_number().over(wInBucket).cast("long"))
    ranked
      .join(
        broadcast(located),
        col("o_orderpriority") === col("pri") &&
          col("b") === col("lb") && col("r") === col("off"))
      .groupBy(col("o_orderpriority"))
      .agg(
        max(when(col("tag") === "p10", col("o_totalprice"))).as("p10"),
        max(when(col("tag") === "p50", col("o_totalprice"))).as("p50"),
        max(when(col("tag") === "p90", col("o_totalprice"))).as("p90"))
      .join(cnts, col("o_orderpriority") === col("cpri"))
      .select(
        col("o_orderpriority"),
        col("p10"), col("p50"), col("p90"),
        col("cnt").as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  val quantilesExactSql: String =
    """SELECT o_orderpriority,
      |max(CASE WHEN rnk = (cnt + 9) // 10 THEN o_totalprice END) AS p10,
      |max(CASE WHEN rnk = (cnt + 1) // 2 THEN o_totalprice END) AS p50,
      |max(CASE WHEN rnk = (9 * cnt + 9) // 10 THEN o_totalprice END) AS p90,
      |max(cnt) AS n_orders
      |FROM (
      |  SELECT o_orderpriority, o_totalprice,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |                       ORDER BY o_totalprice ASC, o_orderkey ASC) AS rnk,
      |    count(*) OVER (PARTITION BY o_orderpriority) AS cnt
      |  FROM orders) t
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------------
  // q_heavy_hitters — exact heavy hitters: per event type, the top-3
  // users by event count with their traffic share — the skew
  // diagnostic that decides when ops/Skew's salting is needed. One hash
  // aggregate on (type, user); the per-type total comes from a window
  // over the AGGREGATED table (O(distinct users) rows, not the event
  // stream); WindowGroupLimit keeps the top-3 map-side.
  // ---------------------------------------------------------------------
  val heavyHitters: Q = (s, d) => {
    val wTot = Window.partitionBy(col("event_type"))
    val wRank = Window
      .partitionBy(col("event_type"))
      .orderBy(col("n").desc, col("user_id").asc)
    Tables.events(s, d)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .withColumn("total", sum(col("n")).over(wTot))
      .withColumn("rnk", row_number().over(wRank).cast("long"))
      .filter(col("rnk") <= 3)
      .select(
        col("event_type"),
        col("rnk"),
        col("user_id"),
        col("n"),
        (col("n") / col("total")).as("share"))
      .orderBy(col("event_type"), col("rnk"))
  }

  val heavyHittersSql: String =
    """SELECT event_type, CAST(rnk AS BIGINT) AS rnk, user_id, n,
      |n / total AS share
      |FROM (
      |  SELECT event_type, user_id, n,
      |    CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS total,
      |    row_number() OVER (PARTITION BY event_type
      |                       ORDER BY n DESC, user_id ASC) AS rnk
      |  FROM (SELECT event_type, user_id, count(*) AS n
      |        FROM events GROUP BY event_type, user_id) c) r
      |WHERE rnk <= 3 ORDER BY event_type, rnk""".stripMargin

  // ---------------------------------------------------------------------
  // q_topk_agg — the typed Aggregator (graft.functions.TopKAgg) under
  // the oracle gate: per event type, the top-5 events by value through
  // the BOUNDED-buffer aggregation-pushdown form of "ORDER BY value
  // LIMIT k per key" — each map-side partial holds at most k elements,
  // so the shuffle carries O(k·groups), not the candidate stream. The
  // oracle is the window formulation; identical output pins the
  // Aggregator's merge/reduce ordering contract (score DESC, id ASC).
  // ---------------------------------------------------------------------
  private val topkAggK = 5

  val topkAgg: Q = (s, d) => {
    import s.implicits._
    import graft.functions.{ScoredId, TopKAgg}
    Tables.events(s, d)
      .select(col("event_type"), col("value").as("score"), col("event_id").as("id"))
      .as[(String, Double, Long)]
      .groupByKey(_._1)
      .mapValues(r => ScoredId(r._2, r._3))
      .agg(TopKAgg(topkAggK).toColumn.name("ids"))
      .toDF("event_type", "ids")
      .select(col("event_type"), posexplode(col("ids")).as(Seq("rank0", "event_id")))
      .select(
        col("event_type"),
        (col("rank0") + 1).cast("long").as("rnk"),
        col("event_id"))
      .orderBy(col("event_type"), col("rnk"))
  }

  val topkAggSql: String =
    s"""SELECT event_type, CAST(rnk AS BIGINT) AS rnk, event_id
       |FROM (
       |  SELECT event_type, event_id,
       |    row_number() OVER (PARTITION BY event_type
       |                       ORDER BY value DESC, event_id ASC) AS rnk
       |  FROM events) t
       |WHERE rnk <= $topkAggK ORDER BY event_type, rnk""".stripMargin

  // ---------------------------------------------------------------------
  // q_range_join — band join: for each 'error' event, the 'click' events
  // of the SAME user within the following hour. Equi key (user_id) +
  // band predicate on the time axis; aggregated per user so output stays
  // bounded by the key count.
  // ---------------------------------------------------------------------
  val rangeJoin: Q = (s, d) => {
    val e = Tables.events(s, d).withColumn("t_us", unix_micros(col("ts")))
    val errs = e
      .filter(col("event_type") === "error")
      .select(
        col("user_id"),
        col("event_id").as("err_id"),
        col("t_us").as("err_t"))
    val clicks = e
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("t_us").as("click_t"))
    errs
      .join(
        clicks,
        errs("user_id") === clicks("user_id") &&
          col("click_t") >= col("err_t") &&
          col("click_t") < col("err_t") + HourUs)
      .groupBy(errs("user_id").as("user_id"))
      .agg(
        countDistinct(col("err_id")).as("n_errors_followed"),
        count(lit(1)).as("n_pairs"))
      .orderBy(col("user_id"))
  }

  val rangeJoinSql: String =
    s"""SELECT e.user_id AS user_id,
       |count(DISTINCT e.event_id) AS n_errors_followed,
       |count(*) AS n_pairs
       |FROM (SELECT user_id, event_id, epoch_us(ts) AS err_t
       |      FROM events WHERE event_type = 'error') e
       |JOIN (SELECT user_id, epoch_us(ts) AS click_t
       |      FROM events WHERE event_type = 'click') c
       |  ON e.user_id = c.user_id
       | AND c.click_t >= e.err_t AND c.click_t < e.err_t + $HourUs
       |GROUP BY e.user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------------
  // q_asof_join — for each 'purchase' event, the most recent prior
  // 'view' event of the same user (attribution as-of join). Implemented
  // as the UNION + running-last merge — one shuffle on user_id, linear
  // in the event count — not a pairwise theta join whose intermediate is
  // |purchases| × |views per user|. Ties at the same timestamp order
  // views before purchases ('p' > 'v' lexically), then by event_id:
  // a view at exactly the purchase time is visible to it.
  // ---------------------------------------------------------------------
  val asofJoin: Q = (s, d) => {
    val e = Tables.events(s, d).withColumn("t_us", unix_micros(col("ts")))
    val views = e
      .filter(col("event_type") === "view")
      .select(
        col("user_id"),
        col("t_us"),
        col("event_id").as("src_id"),
        lit("v").as("kind"),
        col("value").as("v_val"))
    val purchases = e
      .filter(col("event_type") === "purchase")
      .select(
        col("user_id"),
        col("t_us"),
        col("event_id").as("src_id"),
        lit("p").as("kind"),
        lit(null).cast("double").as("v_val"))
    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(col("t_us").asc, col("kind").asc, col("src_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    views
      .unionAll(purchases)
      .withColumn("asof_view_val", last(col("v_val"), ignoreNulls = true).over(w))
      .filter(col("kind") === "p")
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_purchases"),
        sum(when(col("asof_view_val").isNotNull, 1L).otherwise(0L))
          .as("n_attributed"),
        dsum(coalesce(col("asof_view_val"), lit(0.0))).as("attributed_total"))
      .orderBy(col("user_id"))
  }

  val asofJoinSql: String =
    s"""SELECT user_id, count(*) AS n_purchases,
       |CAST(SUM(CASE WHEN asof_view_val IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed,
       |${sqlDsum("COALESCE(asof_view_val, 0.0)")} AS attributed_total
       |FROM (
       |  SELECT user_id, kind,
       |    last_value(v_val IGNORE NULLS) OVER (
       |      PARTITION BY user_id ORDER BY t_us ASC, kind ASC, src_id ASC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_view_val
       |  FROM (
       |    SELECT user_id, epoch_us(ts) AS t_us, event_id AS src_id,
       |           'v' AS kind, value AS v_val
       |    FROM events WHERE event_type = 'view'
       |    UNION ALL
       |    SELECT user_id, epoch_us(ts) AS t_us, event_id AS src_id,
       |           'p' AS kind, CAST(NULL AS DOUBLE) AS v_val
       |    FROM events WHERE event_type = 'purchase') u) m
       |WHERE kind = 'p'
       |GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------------
  // q_asof_native — the SAME attribution semantics as q_asof_join, but
  // through the engine's native AS-OF JOIN operator (custom LogicalPlan +
  // SparkStrategy + merge-based SparkPlan, graft.plans.AsOfJoin): one
  // shuffle + sort per side, O(|L|+|R|) merge, O(1) state. The oracle is
  // DuckDB's own built-in ASOF LEFT JOIN — native operator vs native
  // operator, hash-compared exactly.
  // ---------------------------------------------------------------------
  val asofNative: Q = (s, d) => {
    val e = Tables.events(s, d).withColumn("t_us", unix_micros(col("ts")))
    val purchases = e
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("t_us"))
    val views = e
      .filter(col("event_type") === "view")
      .select(
        col("user_id").as("v_user"),
        col("t_us").as("v_t"),
        col("value").as("v_val"))
    graft.plans.AsOf
      .join(purchases, "user_id", "t_us", views, "v_user", "v_t")
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_purchases"),
        sum(when(col("v_val").isNotNull, 1L).otherwise(0L)).as("n_attributed"),
        dsum(coalesce(col("v_val"), lit(0.0))).as("attributed_total"))
      .orderBy(col("user_id"))
  }

  val asofNativeSql: String =
    s"""SELECT user_id, count(*) AS n_purchases,
       |CAST(SUM(CASE WHEN v_val IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed,
       |${sqlDsum("COALESCE(v_val, 0.0)")} AS attributed_total
       |FROM (
       |  SELECT p.user_id, v.v_val
       |  FROM (SELECT user_id, epoch_us(ts) AS t_us FROM events
       |        WHERE event_type = 'purchase') p
       |  ASOF LEFT JOIN (SELECT user_id AS v_user, epoch_us(ts) AS v_t, value AS v_val
       |                  FROM events WHERE event_type = 'view') v
       |    ON p.user_id = v.v_user AND v.v_t <= p.t_us) j
       |GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------------
  // q_asof_tolerance — the native as-of join with a TOLERANCE horizon
  // (pandas merge_asof semantics): a view older than 1 hour must NOT
  // attribute the purchase. Exec-side the merge keeps its O(1) state and
  // simply nulls the match when leftTime − rightTime exceeds the
  // horizon; the oracle is DuckDB's ASOF LEFT JOIN with the identical
  // post-condition (the latest-prior row is unique, so nulling it after
  // the fact is exactly the tolerance rule).
  // ---------------------------------------------------------------------
  val asofTolerance: Q = (s, d) => {
    val e = Tables.events(s, d).withColumn("t_us", unix_micros(col("ts")))
    val purchases = e
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("t_us"))
    val views = e
      .filter(col("event_type") === "view")
      .select(
        col("user_id").as("v_user"),
        col("t_us").as("v_t"),
        col("value").as("v_val"))
    graft.plans.AsOf
      .join(purchases, "user_id", "t_us", views, "v_user", "v_t", HourUs)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_purchases"),
        sum(when(col("v_val").isNotNull, 1L).otherwise(0L)).as("n_attributed"),
        dsum(coalesce(col("v_val"), lit(0.0))).as("attributed_total"))
      .orderBy(col("user_id"))
  }

  val asofToleranceSql: String =
    s"""SELECT user_id, count(*) AS n_purchases,
       |CAST(SUM(CASE WHEN v_val IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed,
       |${sqlDsum("COALESCE(v_val, 0.0)")} AS attributed_total
       |FROM (
       |  SELECT p.user_id,
       |    CASE WHEN p.t_us - v.v_t <= $HourUs THEN v.v_val ELSE NULL END AS v_val
       |  FROM (SELECT user_id, epoch_us(ts) AS t_us FROM events
       |        WHERE event_type = 'purchase') p
       |  ASOF LEFT JOIN (SELECT user_id AS v_user, epoch_us(ts) AS v_t, value AS v_val
       |                  FROM events WHERE event_type = 'view') v
       |    ON p.user_id = v.v_user AND v.v_t <= p.t_us) j
       |GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------------
  // q_asof_forward — FORWARD direction on the native exec (pandas
  // merge_asof direction='forward'): each purchase attributes to the
  // FIRST view at-or-after it, within a 1-hour horizon — next-touch
  // attribution, the time-mirror of q_asof_tolerance. The merge peeks
  // its candidate instead of consuming it (the next purchase of the
  // user may need the same view); still one shuffle per side,
  // O(|L|+|R|) per partition, O(1) state. Oracle: DuckDB ASOF LEFT
  // JOIN with the flipped inequality + the same post-null tolerance.
  // ---------------------------------------------------------------------
  val asofForward: Q = (s, d) => {
    val e = Tables.events(s, d).withColumn("t_us", unix_micros(col("ts")))
    val purchases = e
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("t_us"))
    val views = e
      .filter(col("event_type") === "view")
      .select(
        col("user_id").as("v_user"),
        col("t_us").as("v_t"),
        col("value").as("v_val"))
    graft.plans.AsOf
      .forwardJoin(purchases, "user_id", "t_us", views, "v_user", "v_t", HourUs)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_purchases"),
        sum(when(col("v_val").isNotNull, 1L).otherwise(0L)).as("n_attributed"),
        dsum(coalesce(col("v_val"), lit(0.0))).as("attributed_total"))
      .orderBy(col("user_id"))
  }

  val asofForwardSql: String =
    s"""SELECT user_id, count(*) AS n_purchases,
       |CAST(SUM(CASE WHEN v_val IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed,
       |${sqlDsum("COALESCE(v_val, 0.0)")} AS attributed_total
       |FROM (
       |  SELECT p.user_id,
       |    CASE WHEN v.v_t - p.t_us <= $HourUs THEN v.v_val ELSE NULL END AS v_val
       |  FROM (SELECT user_id, epoch_us(ts) AS t_us FROM events
       |        WHERE event_type = 'purchase') p
       |  ASOF LEFT JOIN (SELECT user_id AS v_user, epoch_us(ts) AS v_t, value AS v_val
       |                  FROM events WHERE event_type = 'view') v
       |    ON p.user_id = v.v_user AND v.v_t >= p.t_us) j
       |GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------------
  // q_asof_nearest — NEAREST direction on the native exec (pandas
  // merge_asof direction='nearest'), completing the direction family:
  // each purchase attributes to the view with the LEAST |Δt| within a
  // 1-hour horizon on either side; equal distances break BACKWARD
  // (pandas tie rule). The merge tracks the backward candidate (last
  // consumed, copied) AND peeks the forward one — still one shuffle +
  // sort per side, O(|L|+|R|), O(1) state. DuckDB has no nearest ASOF,
  // so the oracle composes its backward and forward ASOF joins keyed by
  // the unique purchase event_id and applies the identical pick rule.
  // ---------------------------------------------------------------------
  val asofNearest: Q = (s, d) => {
    val e = Tables.events(s, d).withColumn("t_us", unix_micros(col("ts")))
    val purchases = e
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("t_us"))
    val views = e
      .filter(col("event_type") === "view")
      .select(
        col("user_id").as("v_user"),
        col("t_us").as("v_t"),
        col("value").as("v_val"))
    graft.plans.AsOf
      .nearestJoin(purchases, "user_id", "t_us", views, "v_user", "v_t", HourUs)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_purchases"),
        sum(when(col("v_val").isNotNull, 1L).otherwise(0L)).as("n_attributed"),
        dsum(coalesce(col("v_val"), lit(0.0))).as("attributed_total"))
      .orderBy(col("user_id"))
  }

  val asofNearestSql: String =
    s"""WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS t_us FROM events
       |           WHERE event_type = 'purchase'),
       |v AS (SELECT user_id AS v_user, epoch_us(ts) AS v_t, value AS v_val
       |      FROM events WHERE event_type = 'view'),
       |b AS (SELECT p.event_id, p.user_id, p.t_us, v.v_t AS b_t, v.v_val AS b_val
       |      FROM p ASOF LEFT JOIN v
       |        ON p.user_id = v.v_user AND v.v_t <= p.t_us),
       |f AS (SELECT p.event_id, v.v_t AS f_t, v.v_val AS f_val
       |      FROM p ASOF LEFT JOIN v
       |        ON p.user_id = v.v_user AND v.v_t >= p.t_us),
       |j AS (
       |  SELECT b.user_id,
       |    CASE
       |      WHEN b.b_t IS NOT NULL AND b.t_us - b.b_t <= $HourUs
       |           AND (f.f_t IS NULL OR f.f_t - b.t_us > $HourUs
       |                OR b.t_us - b.b_t <= f.f_t - b.t_us)
       |        THEN b.b_val
       |      WHEN f.f_t IS NOT NULL AND f.f_t - b.t_us <= $HourUs
       |        THEN f.f_val
       |      ELSE NULL END AS v_val
       |  FROM b JOIN f ON b.event_id = f.event_id)
       |SELECT user_id, count(*) AS n_purchases,
       |CAST(SUM(CASE WHEN v_val IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed,
       |${sqlDsum("COALESCE(v_val, 0.0)")} AS attributed_total
       |FROM j GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------------
  // q_asof_inner — INNER as-of semantics on the native exec: purchases
  // with no in-horizon prior view are DROPPED, not null-padded, so the
  // output only carries users with at least one attributed purchase.
  // The exec skips unmatched rows in the merge (no post-filter plan
  // node); the oracle is DuckDB's inner ASOF JOIN with the same
  // tolerance post-condition as q_asof_tolerance.
  // ---------------------------------------------------------------------
  val asofInner: Q = (s, d) => {
    val e = Tables.events(s, d).withColumn("t_us", unix_micros(col("ts")))
    val purchases = e
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("t_us"))
    val views = e
      .filter(col("event_type") === "view")
      .select(
        col("user_id").as("v_user"),
        col("t_us").as("v_t"),
        col("value").as("v_val"))
    graft.plans.AsOf
      .innerJoin(purchases, "user_id", "t_us", views, "v_user", "v_t", HourUs)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_attributed"),
        dsum(col("v_val")).as("attributed_total"))
      .orderBy(col("user_id"))
  }

  val asofInnerSql: String =
    s"""SELECT user_id, count(*) AS n_attributed,
       |${sqlDsum("v_val")} AS attributed_total
       |FROM (
       |  SELECT p.user_id, v.v_val
       |  FROM (SELECT user_id, epoch_us(ts) AS t_us FROM events
       |        WHERE event_type = 'purchase') p
       |  ASOF JOIN (SELECT user_id AS v_user, epoch_us(ts) AS v_t, value AS v_val
       |             FROM events WHERE event_type = 'view') v
       |    ON p.user_id = v.v_user AND v.v_t <= p.t_us
       |  WHERE p.t_us - v.v_t <= $HourUs) j
       |GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------------
  // q_date_funcs — calendar scalar family over orders: year/quarter
  // buckets, month cardinality, day-of-week histogram (Spark dayofweek
  // is 1=Sunday, DuckDB's is 0=Sunday — normalized to DuckDB's), and an
  // integer datediff to month-end. All integer-exact.
  // ---------------------------------------------------------------------
  val dateFuncs: Q = (s, d) => {
    Tables.orders(s, d)
      .groupBy(
        year(col("o_orderdate")).cast("long").as("yr"),
        quarter(col("o_orderdate")).cast("long").as("qtr"))
      .agg(
        count(lit(1)).as("n_orders"),
        countDistinct(month(col("o_orderdate"))).as("d_months"),
        sum(when(dayofweek(col("o_orderdate")) - 1 === 0, 1L).otherwise(0L))
          .as("n_sunday"),
        sum(
          datediff(last_day(col("o_orderdate")), col("o_orderdate"))
            .cast("long")).as("days_to_eom"))
      .orderBy(col("yr"), col("qtr"))
  }

  val dateFuncsSql: String =
    """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
      |CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
      |count(*) AS n_orders,
      |count(DISTINCT month(o_orderdate)) AS d_months,
      |CAST(SUM(CASE WHEN dayofweek(o_orderdate) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_sunday,
      |CAST(SUM(date_diff('day', CAST(o_orderdate AS DATE), last_day(CAST(o_orderdate AS DATE)))) AS BIGINT) AS days_to_eom
      |FROM orders GROUP BY 1, 2 ORDER BY yr, qtr""".stripMargin

  // ---------------------------------------------------------------------
  // q_array_funcs — array scalar family over document tokens: distinct +
  // sort + slice + join. Token alphabet is [a-z0-9]+ so binary string
  // sort order agrees between engines.
  // ---------------------------------------------------------------------
  val arrayFuncs: Q = (s, d) => {
    val toks = graft.functions.Hashing.tokens(col("text"))
    Tables.documents(s, d)
      .select(
        col("lang"),
        array_join(slice(sort_array(array_distinct(toks)), 1, 3), "-")
          .as("sig"),
        size(array_distinct(toks)).cast("long").as("n_distinct"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("sig")).as("d_sigs"),
        min(col("sig")).as("min_sig"),
        sum(col("n_distinct")).as("sum_distinct"))
      .orderBy(col("lang"))
  }

  val arrayFuncsSql: String = {
    val toks = graft.functions.Hashing.sqlTokens("text")
    s"""SELECT lang, count(*) AS n_docs,
       |count(DISTINCT sig) AS d_sigs,
       |min(sig) AS min_sig,
       |CAST(SUM(n_distinct) AS BIGINT) AS sum_distinct
       |FROM (
       |  SELECT lang,
       |    array_to_string(list_sort(list_distinct($toks))[1:3], '-') AS sig,
       |    CAST(len(list_distinct($toks)) AS BIGINT) AS n_distinct
       |  FROM documents) t
       |GROUP BY lang ORDER BY lang""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q_grouping_sets — explicit GROUPING SETS ((priority, status),
  // (priority), ()) — the general form behind rollup/cube.
  // ---------------------------------------------------------------------
  val groupingSets: Q = (s, d) => {
    Tables.orders(s, d)
      .groupingSets(
        Seq(
          Seq(col("o_orderpriority"), col("o_orderstatus")),
          Seq(col("o_orderpriority")),
          Seq()),
        col("o_orderpriority"),
        col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n"),
        dsum(col("o_totalprice")).as("total"),
        grouping_id().as("gid"))
      .orderBy(col("gid"), col("o_orderpriority"), col("o_orderstatus"))
  }

  val groupingSetsSql: String =
    s"""SELECT o_orderpriority, o_orderstatus, count(*) AS n,
       |${sqlDsum("o_totalprice")} AS total,
       |GROUPING(o_orderpriority, o_orderstatus) AS gid
       |FROM orders
       |GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), ())
       |ORDER BY gid, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------------
  // q_argmax — deterministic per-group argmax/argmin via ranked windows
  // (ties broken by event_id, so both engines pick the same row — unlike
  // max_by/arg_max, whose tie choice is undefined). Emits, per event
  // type, the extreme-value events.
  // ---------------------------------------------------------------------
  val argmax: Q = (s, d) => {
    // Two-phase hash aggregate, NOT a window: partitioning a window by
    // event_type gives only |distinct types| tasks, each sorting its
    // whole group — at scale that is a handful of tasks sorting
    // terabytes. max/min over a struct compares fields lexicographically
    // (value, then the unique event_id as tie-break — the same order the
    // oracle's row_number uses), runs with map-side partials, and
    // carries user_id along without affecting comparisons.
    val e = Tables.events(s, d)
    val keyed = struct(col("value"), col("event_id"), col("user_id"))
    val agg = e
      .groupBy(col("event_type"))
      .agg(max(keyed).as("mx"), min(keyed).as("mn"))
    val maxRows = agg.select(
      col("event_type"),
      lit("max").as("ext"),
      col("mx.event_id").as("event_id"),
      col("mx.user_id").as("user_id"),
      col("mx.value").as("value"))
    val minRows = agg.select(
      col("event_type"),
      lit("min").as("ext"),
      col("mn.event_id").as("event_id"),
      col("mn.user_id").as("user_id"),
      col("mn.value").as("value"))
    maxRows.unionAll(minRows).orderBy(col("event_type"), col("ext"))
  }

  val argmaxSql: String =
    """SELECT event_type,
      |CASE WHEN rn_max = 1 THEN 'max' ELSE 'min' END AS ext,
      |event_id, user_id, value
      |FROM (
      |  SELECT event_type, event_id, user_id, value,
      |    row_number() OVER (PARTITION BY event_type
      |                       ORDER BY value DESC, event_id DESC) AS rn_max,
      |    row_number() OVER (PARTITION BY event_type
      |                       ORDER BY value ASC, event_id ASC) AS rn_min
      |  FROM events) t
      |WHERE rn_max = 1 OR rn_min = 1
      |ORDER BY event_type, ext""".stripMargin

  // ---------------------------------------------------------------------
  // q_scalar_subquery — correlated scalar subquery (customers above
  // their nation's exact mean balance), exercising Catalyst's subquery
  // decorrelation. Expressed in SQL over a temp view; the decimal-exact
  // mean keeps both engines bit-identical.
  // ---------------------------------------------------------------------
  val scalarSubquery: Q = (s, d) => {
    Tables.customer(s, d).createOrReplaceTempView("graft_customer")
    s.sql(
      """SELECT c_nationkey, count(*) AS n_above,
        |CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS above_total
        |FROM graft_customer c
        |WHERE c_acctbal > (
        |  SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
        |  FROM graft_customer c2 WHERE c2.c_nationkey = c.c_nationkey)
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)
  }

  val scalarSubquerySql: String =
    """SELECT c_nationkey, count(*) AS n_above,
      |CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS above_total
      |FROM customer c
      |WHERE c_acctbal > (
      |  SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
      |  FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  // ---------------------------------------------------------------------
  // q_range_frame — RANGE window frame (vs the ROWS frames used
  // elsewhere): per event, how many events of the same user fell in the
  // preceding hour (value-range frame over the microsecond time axis),
  // aggregated per user. The frame bound is a value offset, so peers
  // with equal timestamps are counted together — semantics ROWS frames
  // cannot express.
  // ---------------------------------------------------------------------
  val rangeFrame: Q = (s, d) => {
    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(col("t_us"))
      .rangeBetween(-HourUs, 0)
    Tables.events(s, d)
      .withColumn("t_us", unix_micros(col("ts")))
      .withColumn("n_last_hour", count(lit(1)).over(w))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        max(col("n_last_hour")).as("max_burst"),
        sum(col("n_last_hour")).as("burst_mass"))
      .orderBy(col("user_id"))
  }

  val rangeFrameSql: String =
    s"""SELECT user_id, count(*) AS n_events,
       |max(n_last_hour) AS max_burst,
       |CAST(SUM(n_last_hour) AS BIGINT) AS burst_mass
       |FROM (
       |  SELECT user_id,
       |    count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
       |                   RANGE BETWEEN $HourUs PRECEDING AND CURRENT ROW) AS n_last_hour
       |  FROM events) t
       |GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------------
  // q_window_funcs — the remaining ranking/navigation window family in
  // one pass: ntile, percent_rank, cume_dist, first/last/nth_value, all
  // over per-user partitions (high cardinality — scales) with a unique
  // (value, event_id) sort. Doubles are only compared or passed through,
  // never summed, so the hash compare stays exact.
  // ---------------------------------------------------------------------
  val windowFuncs: Q = (s, d) => {
    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(col("value").asc, col("event_id").asc)
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(s, d)
      .select(
        col("user_id"),
        col("value"),
        col("event_id"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"),
        first(col("value")).over(wFull).as("lo_val"),
        last(col("value")).over(wFull).as("hi_val"),
        nth_value(col("value"), 3).over(wFull).as("third_val"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("quartile")).as("d_quartiles"),
        sum(when(col("pr") <= 0.5, 1L).otherwise(0L)).as("n_below_median"),
        max(col("cd")).as("max_cd"),
        min(col("lo_val")).as("min_val"),
        max(col("hi_val")).as("max_val"),
        min(col("third_val")).as("third_smallest"))
      .orderBy(col("user_id"))
  }

  val windowFuncsSql: String =
    """SELECT user_id, count(*) AS n_events,
      |count(DISTINCT quartile) AS d_quartiles,
      |CAST(SUM(CASE WHEN pr <= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_below_median,
      |max(cd) AS max_cd,
      |min(lo_val) AS min_val,
      |max(hi_val) AS max_val,
      |min(third_val) AS third_smallest
      |FROM (
      |  SELECT user_id,
      |    CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      |    percent_rank() OVER w AS pr,
      |    cume_dist() OVER w AS cd,
      |    first_value(value) OVER wf AS lo_val,
      |    last_value(value) OVER wf AS hi_val,
      |    nth_value(value, 3) OVER wf AS third_val
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY value ASC, event_id ASC),
      |         wf AS (PARTITION BY user_id ORDER BY value ASC, event_id ASC
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |) t GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------------
  // q_null_semantics — NULL-handling grammar: nullif/coalesce/null-aware
  // counts, with every engine-divergent step made explicit (floor before
  // integer cast — Spark truncates double→int, DuckDB rounds; NULLS
  // FIRST pinned in the sort — Spark defaults nulls first, DuckDB last).
  // ---------------------------------------------------------------------
  val nullSemantics: Q = (s, d) => {
    Tables.customer(s, d)
      .withColumn(
        "x",
        nullif(pmod(floor(col("c_acctbal")).cast("long"), lit(10L)), lit(0L)))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("x")).as("n_nonnull"),
        sum(when(col("x").isNull, 1L).otherwise(0L)).as("n_null"),
        sum(coalesce(col("x"), lit(-1L))).as("coalesced_sum"),
        countDistinct(col("x")).as("d_x"))
      .orderBy(col("c_mktsegment"))
  }

  val nullSemanticsSql: String =
    """SELECT c_mktsegment, count(*) AS n_rows,
      |count(x) AS n_nonnull,
      |CAST(SUM(CASE WHEN x IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
      |CAST(SUM(COALESCE(x, -1)) AS BIGINT) AS coalesced_sum,
      |count(DISTINCT x) AS d_x
      |FROM (
      |  SELECT c_mktsegment,
      |    nullif(((CAST(floor(c_acctbal) AS BIGINT) % 10) + 10) % 10, 0) AS x
      |  FROM customer) t
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------------
  // q_winsorize — outlier-robust aggregation: per event type, clip
  // values at the exact type-1 p05/p95 (picked elements, never
  // interpolated) and report the winsorized vs raw mean. The thresholds
  // come from the same histogram-locate machinery as q_quantiles_exact
  // (value-range histogram → cumulative window OVER THE HISTOGRAM →
  // rank only inside the two located buckets — no global per-group
  // sort), then one more scan clamps and aggregates in exact decimal.
  // The oracle uses the naive global-window form.
  // ---------------------------------------------------------------------
  val winsorize: Q = (s, d) => {
    val e = Tables.events(s, d)
      .select(
        col("event_type").as("g"),
        col("value").as("v"),
        col("event_id").as("tie"))
      .withColumn("b", floor(col("v") / 10).cast("long"))
    val cnts = e.groupBy(col("g"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("g").as("cg"), col("cnt"))
    val targets = cnts
      .select(
        col("cg").as("tg"),
        explode(array(
          struct(lit("p05").as("tag"), expr("(cnt + 19) div 20").as("target")),
          struct(lit("p95").as("tag"), expr("(19 * cnt + 19) div 20").as("target"))))
          .as("t"))
      .select(col("tg"), col("t.tag").as("tag"), col("t.target").as("target"))
    val wHist = Window
      .partitionBy(col("hg"))
      .orderBy(col("hb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = e.groupBy(col("g"), col("b"))
      .agg(count(lit(1)).as("bc"))
      .select(col("g").as("hg"), col("b").as("hb"), col("bc"))
      .withColumn("cum_before", coalesce(sum(col("bc")).over(wHist), lit(0L)))
    val located = targets
      .join(
        cum,
        col("tg") === col("hg") &&
          col("target") > col("cum_before") &&
          col("target") <= col("cum_before") + col("bc"))
      .select(
        col("tg").as("pg"),
        col("tag"),
        col("hb").as("lb"),
        (col("target") - col("cum_before")).as("off"))
    val needed = located.select(col("pg").as("ng"), col("lb").as("nb")).distinct()
    val wIn = Window
      .partitionBy(col("g"), col("b"))
      .orderBy(col("v").asc, col("tie").asc)
    val ranked = e
      .join(broadcast(needed), col("g") === col("ng") && col("b") === col("nb"))
      .drop("ng", "nb")
      .withColumn("r", row_number().over(wIn).cast("long"))
    val thresholds = ranked
      .join(
        broadcast(located),
        col("g") === col("pg") && col("b") === col("lb") && col("r") === col("off"))
      .groupBy(col("g"))
      .agg(
        max(when(col("tag") === "p05", col("v"))).as("v05"),
        max(when(col("tag") === "p95", col("v"))).as("v95"))
    e.join(broadcast(thresholds), Seq("g"))
      .withColumn(
        "cl",
        when(col("v") < col("v05"), col("v05"))
          .when(col("v") > col("v95"), col("v95"))
          .otherwise(col("v")))
      .groupBy(col("g"))
      .agg(
        count(lit(1)).as("n"),
        max(col("v05")).as("p05"),
        max(col("v95")).as("p95"),
        davg(col("cl")).as("win_mean"),
        davg(col("v")).as("raw_mean"))
      .select(
        col("g").as("event_type"),
        col("n"), col("p05"), col("p95"), col("win_mean"), col("raw_mean"))
      .orderBy(col("event_type"))
  }

  val winsorizeSql: String =
    """WITH ranked AS (
      |  SELECT event_type, value,
      |    row_number() OVER (PARTITION BY event_type
      |                       ORDER BY value ASC, event_id ASC) AS rnk,
      |    count(*) OVER (PARTITION BY event_type) AS cnt
      |  FROM events),
      |th AS (
      |  SELECT event_type,
      |    max(CASE WHEN rnk = (cnt + 19) // 20 THEN value END) AS p05,
      |    max(CASE WHEN rnk = (19 * cnt + 19) // 20 THEN value END) AS p95
      |  FROM ranked GROUP BY event_type)
      |SELECT e.event_type, count(*) AS n, max(t.p05) AS p05, max(t.p95) AS p95,
      |CAST(CAST(SUM(CAST(CASE WHEN e.value < t.p05 THEN t.p05
      |                        WHEN e.value > t.p95 THEN t.p95
      |                        ELSE e.value END AS DECIMAL(18,4))) AS DOUBLE)
      |  / COUNT(*) AS DOUBLE) AS win_mean,
      |CAST(CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE)
      |  / COUNT(*) AS DOUBLE) AS raw_mean
      |FROM events e JOIN th t ON e.event_type = t.event_type
      |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin

  // ---------------------------------------------------------------------
  // q_corr_exact — Pearson correlation + regression slope of quantity
  // vs price per return flag, HASH-EXACT: engine-native corr() sums
  // doubles in scan order (never reproducible). Here both variables are
  // integers (quantity; price in cents), the five moment sums
  // accumulate in DECIMAL(38,0)/HUGEINT — order-independent and exact —
  // and the closed form touches floating point only at the very end:
  // each exact integer moment is cast to double ONCE (scale-0 →
  // single correctly-rounded conversion on both engines, unlike the
  // scale>0 decSum trap), then the same multiply/sqrt/divide sequence
  // runs on both sides. One hash aggregate with map-side partials.
  // ---------------------------------------------------------------------
  val corrExact: Q = (s, d) => {
    val D0 = org.apache.spark.sql.types.DecimalType(38, 0)
    val t = Tables.lineitem(s, d)
      .select(
        col("l_returnflag"),
        col("l_quantity").cast("long").as("qx"),
        round(col("l_extendedprice") * 100).cast("long").as("py"))
    val a = t.groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("qx").cast(D0)).as("sx"),
        sum(col("py").cast(D0)).as("sy"),
        sum((col("qx") * col("qx")).cast(D0)).as("sxx"),
        // py² ≤ 10^14 per row fits a long; the SUM must not — cast
        // to decimal before aggregating
        sum((col("py") * col("py")).cast(D0)).as("syy"),
        sum((col("qx") * col("py")).cast(D0)).as("sxy"))
    val nD = col("n").cast(D0)
    val num = nD * col("sxy") - col("sx") * col("sy")
    val varx = nD * col("sxx") - col("sx") * col("sx")
    val vary = nD * col("syy") - col("sy") * col("sy")
    a.select(
        col("l_returnflag"),
        col("n"),
        (num.cast("double") /
          sqrt(varx.cast("double") * vary.cast("double"))).as("corr_qty_price"),
        (num.cast("double") / varx.cast("double")).as("beta_cents_per_unit"))
      .orderBy(col("l_returnflag"))
  }

  val corrExactSql: String =
    """WITH t AS (
      |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qx,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS py
      |  FROM lineitem),
      |a AS (
      |  SELECT l_returnflag, count(*) AS n,
      |    SUM(qx)::HUGEINT AS sx, SUM(py)::HUGEINT AS sy,
      |    SUM(qx * qx)::HUGEINT AS sxx, SUM(py * py)::HUGEINT AS syy,
      |    SUM(qx * py)::HUGEINT AS sxy
      |  FROM t GROUP BY l_returnflag)
      |SELECT l_returnflag, n,
      |CAST(CAST(n * sxy - sx * sy AS DOUBLE)
      |  / sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE))
      |  AS DOUBLE) AS corr_qty_price,
      |CAST(CAST(n * sxy - sx * sy AS DOUBLE)
      |  / CAST(n * sxx - sx * sx AS DOUBLE) AS DOUBLE) AS beta_cents_per_unit
      |FROM a ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------------
  // q_copurchase — co-occurrence pair mining (market-basket affinity):
  // the top-20 part pairs most often bought in the same order. Shape:
  // collapse each order to its sorted distinct part SET (one shuffle of
  // lineitem, basket size bounded by the order schema at ~7), then
  // explode the within-basket pairs locally — items-choose-2 per order,
  // never a cross-corpus pair explosion and no second shuffle of the
  // row stream (the relational self-join alternative re-shuffles the
  // distinct pairs AND both join sides). The pair counts reduce on the
  // (p1, p2) key and the head rides TakeOrderedAndProject; full
  // (n DESC, p1, p2) ordering makes the top-20 cut deterministic on
  // both engines — the oracle keeps the declarative self-join form.
  // ---------------------------------------------------------------------
  val copurchase: Q = (s, d) => {
    val baskets = Tables
      .lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
    val pairs = transform(
      col("ps"),
      (x, i) =>
        transform(
          slice(col("ps"), i + lit(2), size(col("ps"))),
          y => struct(x.as("p1"), y.as("p2"))))
    baskets
      .select(explode(flatten(pairs)).as("pr"))
      .groupBy(col("pr.p1").as("p1"), col("pr.p2").as("p2"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_orders").desc, col("p1").asc, col("p2").asc)
      .limit(20)
  }

  val copurchaseSql: String =
    """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
      |SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS n_orders
      |FROM li a JOIN li b
      |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |GROUP BY p1, p2
      |ORDER BY n_orders DESC, p1, p2 LIMIT 20""".stripMargin

  // ---------------------------------------------------------------------
  // q_outliers — 3σ anomaly counts per event type with ZERO floating
  // point: the test (x−μ)² > 9σ² cross-multiplies to
  // (x·n − S)² > 9·(n·Sxx − S²) over integer cents moments (the
  // q_corr_exact discipline applied per row), so both engines count
  // the IDENTICAL outlier set — no last-ulp flip can move a row across
  // the threshold. Decimal(38,0)/HUGEINT headroom: |x·n − S| stays
  // ≤ ~10^13 per row at petabyte row counts, squared ≤ 10^26 ≪ 10^38.
  // Plan: one stats aggregate (5 rows — broadcast back over the
  // stream), one conditional re-aggregation; two scans, no window.
  // ---------------------------------------------------------------------
  val outliers: Q = (s, d) => {
    val D0 = org.apache.spark.sql.types.DecimalType(38, 0)
    val ev = Tables
      .events(s, d)
      .select(
        col("event_type"),
        round(col("value") * 100).cast("long").as("xc"))
    val st = ev
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("xc").cast(D0)).as("s"),
        sum((col("xc") * col("xc")).cast(D0)).as("sxx"))
    val dev = col("xc").cast(D0) * col("n").cast(D0) - col("s")
    val thr =
      lit(9).cast(D0) * (col("n").cast(D0) * col("sxx") - col("s") * col("s"))
    ev.join(st, Seq("event_type"))
      .select(
        col("event_type"),
        col("n"),
        (dev * dev > thr && dev > 0).as("hi"),
        (dev * dev > thr && dev < 0).as("lo"))
      .groupBy(col("event_type"))
      .agg(
        min(col("n")).as("n"),
        sum(when(col("hi"), 1L).otherwise(0L)).as("n_hi"),
        sum(when(col("lo"), 1L).otherwise(0L)).as("n_lo"))
      .orderBy(col("event_type"))
  }

  val outliersSql: String = {
    val dev = "(t.xc::HUGEINT * st.n - st.s)"
    s"""WITH t AS (
       |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS xc
       |  FROM events),
       |st AS (
       |  SELECT event_type, count(*) AS n, SUM(xc)::HUGEINT AS s,
       |    SUM(xc * xc)::HUGEINT AS sxx
       |  FROM t GROUP BY event_type)
       |SELECT t.event_type, min(st.n) AS n,
       |CAST(SUM(CASE WHEN $dev * $dev > 9 * (st.n * st.sxx - st.s * st.s)
       |  AND $dev > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
       |CAST(SUM(CASE WHEN $dev * $dev > 9 * (st.n * st.sxx - st.s * st.s)
       |  AND $dev < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_lo
       |FROM t JOIN st ON t.event_type = st.event_type
       |GROUP BY t.event_type ORDER BY t.event_type""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q_rank_normalize — ML feature scaling: percent-rank (quantile
  // normalization) and min-max normalization of event values per event
  // type. Ranks order by the unique (value, event_id) pair, so both
  // engines produce identical rank integers, and both normalizations
  // are a SINGLE double division of integer-derived operands — one
  // correctly-rounded op, bit-identical across engines (the repo's
  // "float only at the very end" discipline). Two windows over the
  // same event_type partitioning → one shuffle; the emitted slice is
  // user_id < 20 but ranks are computed over the full partition.
  // ---------------------------------------------------------------------
  val rankNormalize: Q = (s, d) => {
    val wOrd = Window
      .partitionBy(col("event_type"))
      .orderBy(col("cents"), col("event_id"))
    val wAll = Window.partitionBy(col("event_type"))
    Tables
      .events(s, d)
      .select(
        col("event_id"),
        col("user_id"),
        col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      .withColumn("pct_rank", percent_rank().over(wOrd))
      .withColumn("mn", min(col("cents")).over(wAll))
      .withColumn("mx", max(col("cents")).over(wAll))
      .withColumn(
        "minmax",
        when(col("mx") === col("mn"), 0.5).otherwise(
          (col("cents") - col("mn")).cast("double") /
            (col("mx") - col("mn")).cast("double")))
      .filter(col("user_id") < 20)
      .select(
        col("event_id"),
        col("event_type"),
        col("cents"),
        col("pct_rank"),
        col("minmax"))
      .orderBy(col("event_id"))
  }

  val rankNormalizeSql: String =
    """WITH t AS (
      |  SELECT event_id, user_id, event_type,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events),
      |r AS (
      |  SELECT event_id, user_id, event_type, cents,
      |    percent_rank() OVER (PARTITION BY event_type
      |      ORDER BY cents, event_id) AS pct_rank,
      |    min(cents) OVER (PARTITION BY event_type) AS mn,
      |    max(cents) OVER (PARTITION BY event_type) AS mx
      |  FROM t)
      |SELECT event_id, event_type, cents, pct_rank,
      |  CASE WHEN mx = mn THEN 0.5
      |       ELSE CAST(cents - mn AS DOUBLE) / CAST(mx - mn AS DOUBLE)
      |  END AS minmax
      |FROM r WHERE user_id < 20 ORDER BY event_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_copurchase" -> copurchase,
    "q_rank_normalize" -> rankNormalize,
    "q_outliers" -> outliers,
    "q_corr_exact" -> corrExact,
    "q_winsorize" -> winsorize,
    "q_range_frame" -> rangeFrame,
    "q_window_funcs" -> windowFuncs,
    "q_null_semantics" -> nullSemantics,
    "q_pivot" -> pivotBalances,
    "q_unpivot" -> unpivotCounts,
    "q_median_exact" -> medianExact,
    "q_range_join" -> rangeJoin,
    "q_asof_join" -> asofJoin,
    "q_asof_native" -> asofNative,
    "q_asof_tolerance" -> asofTolerance,
    "q_asof_inner" -> asofInner,
    "q_asof_forward" -> asofForward,
    "q_asof_nearest" -> asofNearest,
    "q_quantiles_exact" -> quantilesExact,
    "q_heavy_hitters" -> heavyHitters,
    "q_topk_agg" -> topkAgg,
    "q_date_funcs" -> dateFuncs,
    "q_array_funcs" -> arrayFuncs,
    "q_grouping_sets" -> groupingSets,
    "q_argmax" -> argmax,
    "q_scalar_subquery" -> scalarSubquery
  )

  val oracleSql: Map[String, String] = Map(
    "q_copurchase" -> copurchaseSql,
    "q_rank_normalize" -> rankNormalizeSql,
    "q_outliers" -> outliersSql,
    "q_corr_exact" -> corrExactSql,
    "q_winsorize" -> winsorizeSql,
    "q_range_frame" -> rangeFrameSql,
    "q_window_funcs" -> windowFuncsSql,
    "q_null_semantics" -> nullSemanticsSql,
    "q_pivot" -> pivotBalancesSql,
    "q_unpivot" -> unpivotCountsSql,
    "q_median_exact" -> medianExactSql,
    "q_range_join" -> rangeJoinSql,
    "q_asof_join" -> asofJoinSql,
    "q_asof_native" -> asofNativeSql,
    "q_asof_tolerance" -> asofToleranceSql,
    "q_asof_inner" -> asofInnerSql,
    "q_asof_forward" -> asofForwardSql,
    "q_asof_nearest" -> asofNearestSql,
    "q_quantiles_exact" -> quantilesExactSql,
    "q_heavy_hitters" -> heavyHittersSql,
    "q_topk_agg" -> topkAggSql,
    "q_date_funcs" -> dateFuncsSql,
    "q_array_funcs" -> arrayFuncsSql,
    "q_grouping_sets" -> groupingSetsSql,
    "q_argmax" -> argmaxSql,
    "q_scalar_subquery" -> scalarSubquerySql
  )
}
