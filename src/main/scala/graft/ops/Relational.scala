package graft.ops

import graft.Tables
import graft.functions.Exact._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operator surface: scan → filter → join → aggregate →
  * window → sort → set ops → grouping sets, all as named queries over the
  * TPC-H-ish star schema.
  *
  * The reference (opusdb) has no relational operators at all (SURVEY.md
  * §2.11); its query-shaped workloads are the benchmark folds in
  * /root/reference/src/opusdb/benchmark/{bank,throughput}.clj. Those shapes
  * (balance conservation, counter folds, read/write mixes) appear here as
  * analytic queries; the rest of the relational taxonomy is the
  * north-star surface built on Spark built-ins so Catalyst provides
  * pushdown, pruning, broadcast selection and whole-stage codegen for free.
  *
  * Scale notes (100 TB design stance):
  *  - dimension tables (region/nation/customer/supplier/part) are joined
  *    with explicit `broadcast()` hints — no shuffle of the fact table for
  *    dim joins at any scale;
  *  - every aggregate is a hash aggregate with map-side partial
  *    aggregation (Spark default for `groupBy().agg`);
  *  - sorts are only applied to already-aggregated (small) results, never
  *    to the raw fact table.
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------------
  // q_bank_conservation — flagship. The reference's signature invariant
  // (balance conservation, /root/reference/src/opusdb/benchmark/bank.clj:41-44)
  // as an analytic query: total account balance per region/nation.
  // scan → broadcast-join ×2 → hash agg → sort.
  // ---------------------------------------------------------------------
  val bankConservation: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_customers"),
        dsum(col("c_acctbal")).as("total_bal"),
        davg(col("c_acctbal")).as("avg_bal"))
      .orderBy(col("r_name"), col("n_name"))
  }

  val bankConservationSql: String =
    s"""SELECT r_name, n_name, count(*) AS n_customers,
       |${sqlDsum("c_acctbal")} AS total_bal,
       |${sqlDavg("c_acctbal")} AS avg_bal
       |FROM customer
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY r_name, n_name
       |ORDER BY r_name, n_name""".stripMargin

  // ---------------------------------------------------------------------
  // q_pricing_summary — TPC-H Q1 shape on lineitem: wide hash aggregation
  // with exact decimal money arithmetic. Filter is pushed to the parquet
  // scan (verified via explain: PushedFilters on l_shipdate).
  // ---------------------------------------------------------------------
  val pricingSummary: Q = (s, d) => {
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("2000-01-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        decSum(revenue(col("l_extendedprice"), col("l_discount")))
          .as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val pricingSummarySql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       |${sqlDsum("l_extendedprice")} AS sum_base_price,
       |${sqlDecSum(sqlRevenue("l_extendedprice", "l_discount"))} AS sum_disc_price,
       |${sqlDavg("l_quantity")} AS avg_qty,
       |${sqlDavg("l_discount")} AS avg_disc,
       |count(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '2000-01-01 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------------
  // q_top_customers — top-3 customers per market segment by total order
  // value: join + agg + ranked window + filter (top-k per group, the
  // scalable form of "ORDER BY LIMIT k per key"). customer scales with
  // SF, so the join carries NO broadcast hint: AQE broadcasts it while
  // it fits (PlanSpec asserts that at test SF) and falls back to a
  // shuffle join at 100 TB instead of OOM-ing the driver.
  // ---------------------------------------------------------------------
  val topCustomers: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val per = o.groupBy(col("o_custkey"))
      .agg(dsum(col("o_totalprice")).as("total_spent"),
           count(lit(1)).as("n_orders"))
    val joined = per.join(c, per("o_custkey") === c("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
              col("total_spent"), col("n_orders"))
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("total_spent").desc, col("c_custkey").asc)
    joined.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .orderBy(col("c_mktsegment"), col("rnk"))
  }

  val topCustomersSql: String =
    s"""SELECT c_custkey, c_name, c_mktsegment, total_spent, n_orders, rnk
       |FROM (
       |  SELECT c_custkey, c_name, c_mktsegment, total_spent, n_orders,
       |         row_number() OVER (PARTITION BY c_mktsegment
       |                            ORDER BY total_spent DESC, c_custkey ASC) AS rnk
       |  FROM (
       |    SELECT o_custkey, ${sqlDsum("o_totalprice")} AS total_spent,
       |           count(*) AS n_orders
       |    FROM orders GROUP BY o_custkey
       |  ) per
       |  JOIN customer ON o_custkey = c_custkey
       |) ranked
       |WHERE rnk <= 3
       |ORDER BY c_mktsegment, rnk""".stripMargin

  // ---------------------------------------------------------------------
  // q_join_broadcast — fact-to-dim join demonstrating the broadcast
  // strategy WITHOUT forcing it: part grows ~200k rows × SF, so a
  // broadcast() hint would be a multi-GB forced broadcast at 100 TB.
  // Unhinted, AQE picks broadcast while the dim fits under
  // autoBroadcastJoinThreshold (PlanSpec asserts that at test SF) and
  // degrades to a shuffle join — not an OOM — beyond it.
  // ---------------------------------------------------------------------
  val brandRevenue: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val p = Tables.part(s, d)
    li.join(p, li("l_partkey") === p("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        decSum(revenue(col("l_extendedprice"), col("l_discount"))).as("revenue"),
        sum(col("l_quantity").cast("long")).as("units"),
        countDistinct(col("l_orderkey")).as("n_orders"))
      .orderBy(col("p_brand"))
  }

  val brandRevenueSql: String =
    s"""SELECT p_brand,
       |${sqlDecSum(sqlRevenue("l_extendedprice", "l_discount"))} AS revenue,
       |CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS units,
       |count(DISTINCT l_orderkey) AS n_orders
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  // ---------------------------------------------------------------------
  // q_join_semi / q_join_anti — EXISTS / NOT EXISTS as left-semi/anti
  // joins (no row multiplication, key-only shuffle).
  // ---------------------------------------------------------------------
  val customersWithOrders: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).filter(col("o_totalprice") > 100.0)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_active"),
           dsum(col("c_acctbal")).as("active_bal"))
      .orderBy(col("c_nationkey"))
  }

  val customersWithOrdersSql: String =
    s"""SELECT c_nationkey, count(*) AS n_active,
       |${sqlDsum("c_acctbal")} AS active_bal
       |FROM customer
       |WHERE EXISTS (SELECT 1 FROM orders
       |              WHERE o_custkey = c_custkey AND o_totalprice > 100.0)
       |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  val customersWithoutOrders: Q = (s, d) => {
    val c = Tables.customer(s, d)
    // Threshold chosen so some (not all) customers lack a qualifying
    // order at every scale factor (o_totalprice ~ U(0, 500k)).
    val o = Tables.orders(s, d).filter(col("o_totalprice") > 450000.0)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  val customersWithoutOrdersSql: String =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                  AND o_totalprice > 450000.0)
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------------
  // q_join_outer — left outer join preserving customers with zero orders
  // (coalesced counts), the relational form of "read every ref including
  // untouched ones".
  // ---------------------------------------------------------------------
  val orderCountsOuter: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    val cnt = o.groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
    c.join(cnt, c("c_custkey") === cnt("o_custkey"), "left_outer")
      .select(col("c_custkey"),
              coalesce(col("cnt"), lit(0L)).as("n_orders"))
      .groupBy(col("n_orders"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("n_orders"))
  }

  val orderCountsOuterSql: String =
    """SELECT n_orders, count(*) AS n_customers FROM (
      |  SELECT c_custkey, COALESCE(cnt, 0) AS n_orders
      |  FROM customer LEFT JOIN (
      |    SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey
      |  ) oc ON c_custkey = o_custkey
      |) t GROUP BY n_orders ORDER BY n_orders""".stripMargin

  // ---------------------------------------------------------------------
  // q_setops — UNION / INTERSECT / EXCEPT over customer key sets drawn
  // from two predicates, tagged and counted.
  // ---------------------------------------------------------------------
  val setOps: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val rich = c.filter(col("c_acctbal") > 5000.0).select(col("c_custkey"))
    val building = c.filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val u = rich.union(building).distinct()
      .select(lit("union").as("op"), col("c_custkey"))
    val i = rich.intersect(building)
      .select(lit("intersect").as("op"), col("c_custkey"))
    val e = rich.except(building)
      .select(lit("except").as("op"), col("c_custkey"))
    u.union(i).union(e)
      .groupBy(col("op"))
      .agg(count(lit(1)).as("n"), sum(col("c_custkey")).as("key_sum"))
      .orderBy(col("op"))
  }

  val setOpsSql: String =
    """WITH rich AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0),
      |building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
      |tagged AS (
      |  SELECT 'union' AS op, c_custkey FROM (SELECT * FROM rich UNION SELECT * FROM building) u
      |  UNION ALL
      |  SELECT 'intersect' AS op, c_custkey FROM (SELECT * FROM rich INTERSECT SELECT * FROM building) i
      |  UNION ALL
      |  SELECT 'except' AS op, c_custkey FROM (SELECT * FROM rich EXCEPT SELECT * FROM building) e
      |)
      |SELECT op, count(*) AS n, CAST(SUM(c_custkey) AS BIGINT) AS key_sum
      |FROM tagged GROUP BY op ORDER BY op""".stripMargin

  // ---------------------------------------------------------------------
  // q_setops_all — MULTISET set operations (INTERSECT ALL / EXCEPT ALL /
  // UNION ALL) over customer-key BAGS drawn from two order-priority
  // slices (a key appears once per qualifying order). ALL semantics keep
  // min(m, n) copies for intersect and m − n copies for except — row
  // counts, not membership, which the aggregate pins cross-engine.
  // Spark plans these as a single hash aggregate computing per-key copy
  // counts + a generator replicating rows — one shuffle keyed by the
  // value tuple, no join; at 100 TB that is exactly the shape you want
  // (same key distribution as the distinct variant, no pairwise path).
  // ---------------------------------------------------------------------
  val setOpsAll: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val urgent =
      o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
    val high =
      o.filter(col("o_orderpriority") === "2-HIGH").select(col("o_custkey"))
    val u = urgent.union(high)
      .select(lit("union_all").as("op"), col("o_custkey"))
    val i = urgent.intersectAll(high)
      .select(lit("intersect_all").as("op"), col("o_custkey"))
    val e = urgent.exceptAll(high)
      .select(lit("except_all").as("op"), col("o_custkey"))
    u.union(i).union(e)
      .groupBy(col("op"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("o_custkey")).as("d_keys"),
        sum(col("o_custkey")).as("key_sum"))
      .orderBy(col("op"))
  }

  val setOpsAllSql: String =
    """WITH urgent AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
      |high AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'),
      |tagged AS (
      |  SELECT 'union_all' AS op, o_custkey FROM (SELECT * FROM urgent UNION ALL SELECT * FROM high) u
      |  UNION ALL
      |  SELECT 'intersect_all' AS op, o_custkey FROM (SELECT * FROM urgent INTERSECT ALL SELECT * FROM high) i
      |  UNION ALL
      |  SELECT 'except_all' AS op, o_custkey FROM (SELECT * FROM urgent EXCEPT ALL SELECT * FROM high) e
      |)
      |SELECT op, count(*) AS n, count(DISTINCT o_custkey) AS d_keys,
      |CAST(SUM(o_custkey) AS BIGINT) AS key_sum
      |FROM tagged GROUP BY op ORDER BY op""".stripMargin

  // ---------------------------------------------------------------------
  // q_rollup / q_cube — hierarchical aggregates. GROUPING() disambiguates
  // the NULL subtotal rows identically on both engines.
  // ---------------------------------------------------------------------
  val rollupBalances: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .rollup(col("n_name"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
           dsum(col("c_acctbal")).as("total_bal"),
           grouping_id().as("gid"))
      .orderBy(col("gid"), col("n_name"), col("c_mktsegment"))
  }

  val rollupBalancesSql: String =
    s"""SELECT n_name, c_mktsegment, count(*) AS n_customers,
       |${sqlDsum("c_acctbal")} AS total_bal,
       |GROUPING(n_name, c_mktsegment) AS gid
       |FROM customer JOIN nation ON c_nationkey = n_nationkey
       |GROUP BY ROLLUP (n_name, c_mktsegment)
       |ORDER BY gid, n_name NULLS FIRST, c_mktsegment NULLS FIRST""".stripMargin

  val cubeReturns: Q = (s, d) => {
    Tables.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
           sum(col("l_quantity").cast("long")).as("qty"),
           grouping_id().as("gid"))
      .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))
  }

  val cubeReturnsSql: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
      |GROUPING(l_returnflag, l_linestatus) AS gid
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------------
  // q_distinct_counts — exact COUNT(DISTINCT) (expand + two-phase agg).
  // ---------------------------------------------------------------------
  val distinctCounts: Q = (s, d) => {
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("d_orders"),
           countDistinct(col("l_partkey")).as("d_parts"),
           countDistinct(col("l_suppkey")).as("d_supps"))
      .orderBy(col("l_returnflag"))
  }

  val distinctCountsSql: String =
    """SELECT l_returnflag,
      |count(DISTINCT l_orderkey) AS d_orders,
      |count(DISTINCT l_partkey) AS d_parts,
      |count(DISTINCT l_suppkey) AS d_supps
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // (q_approx_distinct moved to ops/Sketches.scala: the engine-native
  // HLL could never be oracle-gated; the KMV reformulation there is.
  // approx_count_distinct itself keeps an accuracy bound in
  // SketchAccuracySpec.)

  // ---------------------------------------------------------------------
  // q_window_running — per-customer order timeline: running totals, lag
  // deltas, rank. One shuffle on o_custkey, then all windows share the
  // partitioning.
  // ---------------------------------------------------------------------
  val windowRunning: Q = (s, d) => {
    val o = Tables.orders(s, d).filter(col("o_custkey") < 100)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    o.select(
        col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"),
        row_number().over(w).cast("long").as("order_seq"),
        sum(col("o_totalprice").cast("decimal(18,4)"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_spend"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"))
      .orderBy(col("o_custkey"), col("order_seq"))
  }

  val windowRunningSql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
      |row_number() OVER w AS order_seq,
      |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
      |lag(o_totalprice, 1) OVER w AS prev_price,
      |lead(o_totalprice, 1) OVER w AS next_price
      |FROM orders WHERE o_custkey < 100
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
      |ORDER BY o_custkey, order_seq""".stripMargin

  // ---------------------------------------------------------------------
  // q_orders_by_month — date_trunc temporal aggregation.
  // ---------------------------------------------------------------------
  val ordersByMonth: Q = (s, d) => {
    Tables.orders(s, d)
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(count(lit(1)).as("n_orders"),
           dsum(col("o_totalprice")).as("total"),
           countDistinct(col("o_custkey")).as("d_customers"))
      .orderBy(col("month"))
  }

  val ordersByMonthSql: String =
    s"""SELECT date_trunc('month', o_orderdate) AS month,
       |count(*) AS n_orders,
       |${sqlDsum("o_totalprice")} AS total,
       |count(DISTINCT o_custkey) AS d_customers
       |FROM orders GROUP BY 1 ORDER BY month""".stripMargin

  // ---------------------------------------------------------------------
  // q_filter_pushdown — narrow projection + selective predicate; the scan
  // must show PushedFilters + 3-column ReadSchema (asserted in tests).
  // ---------------------------------------------------------------------
  val filterPushdown: Q = (s, d) => {
    Tables.lineitem(s, d)
      .filter(col("l_shipdate").between(
        lit("1997-01-01").cast("timestamp"),
        lit("1997-12-31").cast("timestamp")))
      .filter(col("l_discount").between(0.02, 0.05))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
           decSum(revenue(col("l_extendedprice"), col("l_discount")))
             .as("revenue"))
      .orderBy(col("l_returnflag"))
  }

  val filterPushdownSql: String =
    s"""SELECT l_returnflag, count(*) AS n,
       |${sqlDecSum(sqlRevenue("l_extendedprice", "l_discount"))} AS revenue
       |FROM lineitem
       |WHERE l_shipdate BETWEEN TIMESTAMP '1997-01-01 00:00:00'
       |                     AND TIMESTAMP '1997-12-31 00:00:00'
       |  AND l_discount BETWEEN 0.02 AND 0.05
       |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------------
  // q_case_having — CASE bucketing + HAVING over order priorities.
  // ---------------------------------------------------------------------
  val caseHaving: Q = (s, d) => {
    Tables.orders(s, d)
      .withColumn("bucket",
        when(col("o_totalprice") < 50000.0, "small")
          .when(col("o_totalprice") < 200000.0, "medium")
          .otherwise("large"))
      .groupBy(col("o_orderpriority"), col("bucket"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .filter(col("n") > 10)
      .orderBy(col("o_orderpriority"), col("bucket"))
  }

  val caseHavingSql: String =
    s"""SELECT o_orderpriority,
       |CASE WHEN o_totalprice < 50000.0 THEN 'small'
       |     WHEN o_totalprice < 200000.0 THEN 'medium'
       |     ELSE 'large' END AS bucket,
       |count(*) AS n, ${sqlDsum("o_totalprice")} AS total
       |FROM orders
       |GROUP BY 1, 2 HAVING count(*) > 10
       |ORDER BY o_orderpriority, bucket""".stripMargin

  // ---------------------------------------------------------------------
  // q_string_funcs — scalar string functions over part.
  // ---------------------------------------------------------------------
  val stringFuncs: Q = (s, d) => {
    Tables.part(s, d)
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        length(col("p_name")).as("name_len"),
        substring(col("p_type"), 1, 5).as("type_pfx"),
        concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
        when(col("p_name").like("%green%"), 1L).otherwise(0L).as("is_green"))
      .groupBy(col("brand_u"))
      .agg(count(lit(1)).as("n"),
           sum(col("name_len").cast("long")).as("name_chars"),
           sum(col("is_green")).as("n_green"),
           countDistinct(col("type_pfx")).as("d_type_pfx"))
      .orderBy(col("brand_u"))
  }

  val stringFuncsSql: String =
    """SELECT upper(p_brand) AS brand_u, count(*) AS n,
      |CAST(SUM(CAST(length(p_name) AS BIGINT)) AS BIGINT) AS name_chars,
      |CAST(SUM(CASE WHEN p_name LIKE '%green%' THEN 1 ELSE 0 END) AS BIGINT) AS n_green,
      |count(DISTINCT substring(p_type, 1, 5)) AS d_type_pfx
      |FROM part GROUP BY 1 ORDER BY brand_u""".stripMargin

  // ---------------------------------------------------------------------
  // q_multi_join — 5-way star join: region → nation → customer → orders →
  // lineitem; revenue per region per year. The two fact tables join on
  // orderkey (shuffle). Only the FIXED-cardinality dims (nation=25,
  // region=5) carry broadcast hints; customer is sf-proportional, so its
  // join is left to AQE — broadcast while it fits, shuffle join at 100 TB.
  // ---------------------------------------------------------------------
  val multiJoin: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), year(col("o_orderdate")).as("order_year"))
      .agg(decSum(revenue(col("l_extendedprice"), col("l_discount")))
             .as("revenue"),
           count(lit(1)).as("n_lines"))
      .orderBy(col("r_name"), col("order_year"))
  }

  val multiJoinSql: String =
    s"""SELECT r_name, CAST(year(o_orderdate) AS INT) AS order_year,
       |${sqlDecSum(sqlRevenue("l_extendedprice", "l_discount"))} AS revenue,
       |count(*) AS n_lines
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY 1, 2 ORDER BY r_name, order_year""".stripMargin

  // ---------------------------------------------------------------------
  // q_ship_priority — TPC-H Q3 shape: selective filters on BOTH join
  // sides (pushed to each scan), fact-fact join on orderkey, revenue
  // top-10. The "double filter then join" pattern is the workhorse of
  // interactive analytics at scale — both scans shrink before any
  // shuffle happens.
  // ---------------------------------------------------------------------
  val shipPriority: Q = (s, d) => {
    val cutoff = lit("1998-06-17").cast("timestamp")
    val o = Tables.orders(s, d).filter(col("o_orderdate") < cutoff)
    val li = Tables.lineitem(s, d).filter(col("l_shipdate") > cutoff)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(decSum(revenue(col("l_extendedprice"), col("l_discount")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  val shipPrioritySql: String =
    s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
       |${sqlDecSum(sqlRevenue("l_extendedprice", "l_discount"))} AS revenue
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |WHERE o_orderdate < TIMESTAMP '1998-06-17 00:00:00'
       |  AND l_shipdate > TIMESTAMP '1998-06-17 00:00:00'
       |GROUP BY l_orderkey, o_orderdate, o_orderpriority
       |ORDER BY revenue DESC, l_orderkey ASC
       |LIMIT 10""".stripMargin

  // ---------------------------------------------------------------------
  // q_sql_portable — the SQL ENTRY PATH under the oracle gate: the
  // engine registers its tables as views and executes ONE
  // dialect-portable ANSI string via spark.sql(...), and the oracle is
  // that IDENTICAL string run by DuckDB — not a hand-matched twin. The
  // portable subset this pins down: timestamp literals, decimal-cast
  // exact sums (the dsum discipline spelled out longhand), e0-exponent
  // double literals, count(DISTINCT), HUGEINT-safe casts, ORDER BY.
  // Catalyst plans the string exactly like the DataFrame form of
  // q_pricing_summary: one hash aggregate with map-side partials,
  // filter pushed to the scan.
  // ---------------------------------------------------------------------
  val sqlPortableText: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS n_items,
      |CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base,
      |CAST(SUM(CAST(l_extendedprice * (1.0e0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc,
      |count(DISTINCT l_suppkey) AS d_suppliers
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  val sqlPortable: Q = (s, d) => {
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    s.sql(sqlPortableText)
  }

  // ---------------------------------------------------------------------
  // q_recursive_cte — WITH RECURSIVE under the oracle gate (Spark 4's
  // recursive CTE surface): walk a derived key hierarchy (parent of
  // custkey k is k DIV 10 — a forest rooted at keys 1-9, acyclic by
  // construction so UNION ALL recursion cannot enumerate duplicate
  // paths; key 0 is excluded from the anchor because 0 DIV 10 = 0
  // makes it its own child, a self-loop the recursion would re-derive
  // forever) and aggregate per depth. DuckDB runs the same recursion
  // modulo its `//` integer-divide spelling. The iterative DataFrame
  // kernels (BFS/PR/CC in ops/Graph.scala) remain the 100 TB path —
  // each round there is one checkpointed shuffle with a driver-bounded
  // round count; the recursive CTE is the declarative entry for
  // hierarchy walks whose depth is data-bounded (here: log10(keys)).
  // ---------------------------------------------------------------------
  val recursiveCte: Q = (s, d) => {
    Tables.customer(s, d).createOrReplaceTempView("customer")
    s.sql("""
      |WITH RECURSIVE chain(k, depth) AS (
      |  SELECT c_custkey, CAST(0 AS BIGINT) FROM customer WHERE c_custkey BETWEEN 1 AND 9
      |  UNION ALL
      |  SELECT c.c_custkey, p.depth + 1
      |  FROM customer c JOIN chain p ON p.k = c.c_custkey DIV 10
      |)
      |SELECT depth, count(*) AS n_keys, CAST(sum(k) AS BIGINT) AS key_total
      |FROM chain GROUP BY depth ORDER BY depth""".stripMargin)
  }

  val recursiveCteSql: String =
    """WITH RECURSIVE chain(k, depth) AS (
      |  SELECT c_custkey, CAST(0 AS BIGINT) FROM customer WHERE c_custkey BETWEEN 1 AND 9
      |  UNION ALL
      |  SELECT c.c_custkey, p.depth + 1
      |  FROM customer c JOIN chain p ON p.k = c.c_custkey // 10
      |)
      |SELECT depth, count(*) AS n_keys, CAST(sum(k) AS BIGINT) AS key_total
      |FROM chain GROUP BY depth ORDER BY depth""".stripMargin

  // ---------------------------------------------------------------------
  // q_exists_corr — correlated EXISTS subquery (TPC-H Q4 shape): orders
  // in a quarter that have at least one high-quantity line item, counted
  // per priority. Written as SQL so Catalyst exercises its subquery
  // DECORRELATION path (RewritePredicateSubquery → left-semi join on
  // o_orderkey): the EXISTS never executes per-row — at any scale it is
  // one shuffled semi join, with both filters pushed to the scans. The
  // oracle runs the identical portable text.
  // ---------------------------------------------------------------------
  val existsCorrText: String =
    """SELECT o_orderpriority, count(*) AS n_orders
      |FROM orders o
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey
      |                AND l.l_quantity > 45.0e0)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  val existsCorr: Q = (s, d) => {
    Tables.orders(s, d).createOrReplaceTempView("orders")
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    s.sql(existsCorrText)
  }

  // ---------------------------------------------------------------------
  // q_cust_dist — TPC-H Q13 shape: orders-per-customer distribution via
  // a LEFT OUTER join with an EXTRA join-side predicate (the filter must
  // ride the join condition, not a WHERE — a WHERE would silently turn
  // the outer join inner and drop the 0-order bucket), then a two-level
  // aggregation: count per customer, then histogram over the counts.
  // Both aggregates are hash aggs with map-side partials; the second
  // operates on |customers| rows, the third on distinct counts only.
  // ---------------------------------------------------------------------
  val custDist: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
      .filter(col("o_orderpriority") =!= lit("1-URGENT"))
    val perCust = c
      .join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_orders"))
    perCust
      .groupBy(col("c_orders"))
      .agg(count(lit(1)).as("n_custs"))
      .orderBy(col("n_custs").desc, col("c_orders").desc)
  }

  val custDistSql: String =
    """SELECT c_orders, count(*) AS n_custs FROM (
      |  SELECT c.c_custkey, count(o.o_orderkey) AS c_orders
      |  FROM customer c LEFT JOIN orders o
      |    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      |  GROUP BY c.c_custkey) t
      |GROUP BY c_orders
      |ORDER BY n_custs DESC, c_orders DESC""".stripMargin

  // ---------------------------------------------------------------------
  // q_ignore_nulls — IGNORE NULLS window semantics: carry the most
  // recent purchase value forward across every event of a user
  // (gap-fill / last-observation-carried-forward). The observation
  // column is NULL on non-purchase rows; `last(_, ignoreNulls)` over a
  // running row frame fills it. Leading rows before a user's first
  // purchase stay NULL — pinned by the hash compare (null vs 0 would
  // mismatch). Ordering is (event time, event_id) — unique, so both
  // engines resolve frames identically.
  // ---------------------------------------------------------------------
  val ignoreNulls: Q = (s, d) => {
    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(col("t_us").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .filter(col("user_id") < 40)
      .select(
        col("user_id"),
        col("event_id"),
        unix_micros(col("ts")).as("t_us"),
        col("event_type"),
        when(col("event_type") === "purchase", col("value")).as("obs"))
      .withColumn("last_purchase", last(col("obs"), ignoreNulls = true).over(w))
      .drop("obs")
      .orderBy(col("user_id"), col("t_us"), col("event_id"))
  }

  val ignoreNullsSql: String =
    """SELECT user_id, event_id, epoch_us(ts) AS t_us, event_type,
      |  last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
      |    OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase
      |FROM events
      |WHERE user_id < 40
      |ORDER BY user_id, t_us, event_id""".stripMargin

  // ---------------------------------------------------------------------
  // q_lateral_topn — correlated LATERAL subquery with ORDER BY + LIMIT:
  // each customer's two most expensive orders, written as SQL so
  // Catalyst exercises its lateral-join decorrelation (the LIMIT inside
  // a correlated subquery is rewritten to a per-key window rank — the
  // same WindowGroupLimit-able shape the DataFrame top-n queries use,
  // so no per-customer subquery ever executes). Inner lateral join:
  // order-less customers drop out. The oracle runs the identical text.
  // ---------------------------------------------------------------------
  val lateralTopnText: String =
    """SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.o_totalprice
      |FROM customer c,
      |LATERAL (SELECT o.o_orderkey, o.o_totalprice
      |         FROM orders o
      |         WHERE o.o_custkey = c.c_custkey
      |         ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
      |         LIMIT 2) t
      |WHERE c.c_custkey < 100
      |ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin

  val lateralTopn: Q = (s, d) => {
    Tables.customer(s, d).createOrReplaceTempView("customer")
    Tables.orders(s, d).createOrReplaceTempView("orders")
    s.sql(lateralTopnText)
  }

  // ---------------------------------------------------------------------
  // q_salted_agg — the skew-mitigation path under the oracle gate: the
  // two-phase salted aggregation ([[Skew.saltedAgg]]) must be
  // VALUE-IDENTICAL to the plain one-phase groupBy it replaces — the
  // oracle is the plain SQL. Phase 1 spreads each (hot) key over 16
  // deterministic salt lanes, phase 2 merges ≤16 partial rows per key;
  // decimal partials keep the two-phase sum exact, so salting changes
  // the plan, never the values.
  // ---------------------------------------------------------------------
  val saltedAgg: Q = (s, d) => {
    Skew
      .saltedAgg(
        Tables.events(s, d),
        "event_type",
        col("value"),
        col("event_id"),
        salts = 16)
      .orderBy(col("event_type"))
  }

  val saltedAggSql: String =
    s"""SELECT event_type,
       |${sqlDsum("value")} AS value_sum,
       |count(*) AS n
       |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------
  // q_salted_join — the salted JOIN variant of ops/Skew under the
  // oracle gate (q_salted_agg covers the aggregation variant): lineitem
  // joined to orders on (orderkey, salt-in-[0,8)), the dim side
  // exploded 8 ways, so one hot order key spreads over 8 reducers.
  // Salting must never change values — the oracle is the PLAIN join.
  // Use when the dim side is too big to broadcast but far smaller than
  // the fact side; replication cost is salts × |dim|.
  // ---------------------------------------------------------------------
  val saltedJoin: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderpriority"))
    Skew
      .saltedJoin(li, o, "l_orderkey", "o_orderkey", col("l_linenumber"), 8)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_items"),
        decSum(revenue(col("l_extendedprice"), col("l_discount")))
          .as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  val saltedJoinSql: String =
    s"""SELECT o_orderpriority, count(*) AS n_items,
       |${sqlDecSum(sqlRevenue("l_extendedprice", "l_discount"))} AS revenue
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------------
  // q_cust_idle — TPC-H Q22 shape: LAPSED customers — balance above the
  // average positive balance, but no order since 2000-02-01 — per
  // market segment. One portable SQL text for both engines; Catalyst
  // turns the scalar subquery into an independent aggregate (one tiny
  // broadcast scalar) and the filtered correlated NOT EXISTS into a
  // left-ANTI join — no per-row subquery execution at any scale.
  // ---------------------------------------------------------------------
  val custIdleText: String =
    s"""WITH avg_bal AS (
       |  SELECT ${sqlDavg("c_acctbal")} AS ab FROM customer
       |  WHERE c_acctbal > 0.0e0)
       |SELECT c_mktsegment, count(*) AS n_cust,
       |${sqlDsum("c_acctbal")} AS total_bal
       |FROM customer c, avg_bal a
       |WHERE c.c_acctbal > a.ab
       |  AND NOT EXISTS (SELECT 1 FROM orders o
       |                  WHERE o.o_custkey = c.c_custkey
       |                    AND o.o_orderdate >= TIMESTAMP '2000-02-01 00:00:00')
       |GROUP BY c_mktsegment
       |ORDER BY c_mktsegment""".stripMargin

  val custIdle: Q = (s, d) => {
    Tables.customer(s, d).createOrReplaceTempView("customer")
    Tables.orders(s, d).createOrReplaceTempView("orders")
    s.sql(custIdleText)
  }

  // ---------------------------------------------------------------------
  // q_collect_sorted — ordered list aggregation: per market segment,
  // the top-5 customers by balance as ONE comma-joined string column
  // (collect_list has no intrinsic order, so the array is sorted
  // deterministically by (-balance, custkey) struct sort before the
  // slice — the engine-portable form of DuckDB's
  // `list(x ORDER BY ...)[1:5]`). Emitting the joined STRING keeps the
  // compare scalar (array cells hash differently across engines).
  // ---------------------------------------------------------------------
  val collectSorted: Q = (s, d) => {
    Tables.customer(s, d)
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_cust"),
        array_join(
          transform(
            slice(
              array_sort(collect_list(struct(
                (col("c_acctbal") * lit(-1.0)).as("nb"),
                col("c_custkey").as("k"),
                col("c_name").as("nm")))),
              1, 5),
            e => e.getField("nm")),
          ",").as("top5"))
      .orderBy(col("c_mktsegment"))
  }

  val collectSortedSql: String =
    """SELECT c_mktsegment, count(*) AS n_cust,
      |array_to_string(
      |  (list(c_name ORDER BY c_acctbal DESC, c_custkey ASC))[1:5],
      |  ',') AS top5
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------------
  // q_data_checks — Deequ-style data-quality constraint validation as
  // one operator: completeness, compound-key uniqueness, referential
  // integrity, numeric range, and accepted-values checks over lineitem,
  // emitted as a (check, n_checked, n_violations, pass) matrix. The
  // row-local checks share ONE scan (conditional sums); uniqueness is
  // a distinct count on the compound key; referential integrity is one
  // LEFT ANTI join against orders — each the minimal shuffle its
  // semantics needs. The testdata's (l_orderkey, l_linenumber) is
  // deliberately non-unique, so the uniqueness row reports REAL
  // violations — the gate proves the checks detect, not just pass.
  // ---------------------------------------------------------------------
  /** The 1-row stats frame behind q_data_checks, exposed for PlanSpec's
    * scan-count assertion.
    */
  def dataChecksStats(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    // ALL row-local checks in one aggregate over one scan; the
    // referential check is the only second lineitem pass (its anti-join
    // probe side), cross-joined in as a 1-row witness.
    val rowLocal = li.agg(
      count(lit(1)).as("n"),
      (count(lit(1)) - count(col("l_shipdate"))).as("null_ship"),
      sum(
        when(col("l_quantity").between(1, 50), 0L).otherwise(1L))
        .as("bad_qty"),
      sum(
        when(col("l_returnflag").isin("A", "N", "R"), 0L).otherwise(1L))
        .as("bad_flag"),
      countDistinct(col("l_orderkey"), col("l_linenumber")).as("d_key"))
    val orphan = li
      .join(
        Tables.orders(s, d).select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"),
        "left_anti")
      .agg(count(lit(1)).as("n_orphan"))
    rowLocal.crossJoin(orphan)
  }

  val dataChecks: Q = (s, d) => {
    // unpivot the single stats row into the five check rows — each
    // aggregate subtree executes ONCE (the previous union-of-branches
    // shape re-referenced the full lineitem aggregate per branch and
    // leaned on ReuseExchange to deduplicate it; at 100 TB that's 4
    // redundant fact scans if reuse doesn't fire)
    def c(name: String, viol: org.apache.spark.sql.Column) =
      struct(
        lit(name).as("check_name"),
        col("n").cast("long").as("n_checked"),
        viol.cast("long").as("n_violations"))
    dataChecksStats(s, d)
      .select(
        explode(
          array(
            c("accepted_returnflag", col("bad_flag")),
            c("completeness_shipdate", col("null_ship")),
            c("referential_orderkey", col("n_orphan")),
            c("range_quantity", col("bad_qty")),
            c("uniqueness_line_key", col("n") - col("d_key"))))
          .as("ck"))
      .select(
        col("ck.check_name").as("check_name"),
        col("ck.n_checked").as("n_checked"),
        col("ck.n_violations").as("n_violations"),
        when(col("ck.n_violations") === 0, 1L).otherwise(0L).as("pass"))
      .orderBy(col("check_name"))
  }

  val dataChecksSql: String =
    """WITH m AS (
      |  SELECT count(*) AS n,
      |    count(*) - count(l_shipdate) AS null_ship,
      |    CAST(SUM(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 0 ELSE 1 END)
      |      AS BIGINT) AS bad_qty,
      |    CAST(SUM(CASE WHEN l_returnflag IN ('A','N','R') THEN 0 ELSE 1 END)
      |      AS BIGINT) AS bad_flag,
      |    count(DISTINCT (l_orderkey, l_linenumber)) AS d_key
      |  FROM lineitem),
      |o AS (
      |  SELECT count(*) AS n_orphan FROM lineitem l
      |  WHERE NOT EXISTS (SELECT 1 FROM orders r
      |                    WHERE r.o_orderkey = l.l_orderkey))
      |SELECT check_name, n_checked, n_violations,
      |  CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS BIGINT) AS pass
      |FROM (
      |  SELECT 'accepted_returnflag' AS check_name, m.n AS n_checked,
      |    m.bad_flag AS n_violations FROM m
      |  UNION ALL
      |  SELECT 'completeness_shipdate', m.n, m.null_ship FROM m
      |  UNION ALL
      |  SELECT 'referential_orderkey', m.n, o.n_orphan FROM m, o
      |  UNION ALL
      |  SELECT 'range_quantity', m.n, m.bad_qty FROM m
      |  UNION ALL
      |  SELECT 'uniqueness_line_key', m.n, m.n - m.d_key FROM m)
      |ORDER BY check_name""".stripMargin

  // ---------------------------------------------------------------------
  // q_table_checksum — ORDER-INDEPENDENT content fingerprints, the
  // anti-entropy primitive: two replicas (or a table before/after a
  // migration, or engine vs oracle) compare one row per table instead of
  // the data. Per row a 32-bit content hash of the canonicalized
  // columns; per table the XOR and the SUM of those hashes plus the row
  // count. XOR is the 100 TB lane — associative, commutative, and
  // overflow-free at any row count (the SUM lane is exact here but
  // would need mod-2^64 semantics past ~10^9 rows; kept because
  // XOR-only fingerprints miss duplicated-row-pair corruptions, which
  // cancel).
  //
  // Canonicalization (the cross-engine contract): doubles go through
  // DECIMAL(18,4) before stringification (Spark "1.0E20"-style sci
  // notation vs DuckDB "1e+20" would diverge on raw double→string),
  // timestamps as epoch-micros integers, all joined with a '|'
  // separator. One scan per table, one partial-aggregated reduce — no
  // shuffle wider than a single row.
  // ---------------------------------------------------------------------
  val tableChecksum: Q = (s, d) => {
    import graft.functions.Hashing.h32
    def fpOf(df: DataFrame, name: String, cols: Seq[Column]): DataFrame =
      df.select(h32(11, concat_ws("|", cols: _*)).as("h"))
        .agg(
          count(lit(1)).as("n_rows"),
          expr("bit_xor(h)").as("xor_fp"),
          sum(col("h")).as("sum_fp"))
        .select(
          lit(name).as("table_name"),
          col("n_rows"),
          col("xor_fp"),
          col("sum_fp"))
    val dec = (c: String) => col(c).cast("decimal(18,4)").cast("string")
    val nation = fpOf(
      Tables.nation(s, d),
      "nation",
      Seq(col("n_nationkey"), col("n_name"), col("n_regionkey")))
    val customer = fpOf(
      Tables.customer(s, d),
      "customer",
      Seq(
        col("c_custkey"),
        col("c_name"),
        col("c_nationkey"),
        dec("c_acctbal"),
        col("c_mktsegment")))
    val supplier = fpOf(
      Tables.supplier(s, d),
      "supplier",
      Seq(col("s_suppkey"), col("s_name"), col("s_nationkey"), dec("s_acctbal")))
    val events = fpOf(
      Tables.events(s, d),
      "events",
      Seq(
        col("event_id"),
        unix_micros(col("ts")),
        col("user_id"),
        col("event_type"),
        dec("value"),
        col("props")))
    nation
      .unionAll(customer)
      .unionAll(supplier)
      .unionAll(events)
      .orderBy(col("table_name"))
  }

  val tableChecksumSql: String = {
    import graft.functions.Hashing.sqlH32
    def arm(name: String, table: String, cols: String*): String = {
      val joined = cols.mkString("concat_ws('|', ", ", ", ")")
      s"""SELECT '$name' AS table_name, count(*) AS n_rows,
         |  bit_xor(h) AS xor_fp, CAST(SUM(h) AS BIGINT) AS sum_fp
         |FROM (SELECT ${sqlH32(11, joined)} AS h FROM $table)""".stripMargin
    }
    val dec = (c: String) => s"CAST(CAST($c AS DECIMAL(18,4)) AS VARCHAR)"
    Seq(
      arm("nation", "nation", "n_nationkey", "n_name", "n_regionkey"),
      arm(
        "customer",
        "customer",
        "c_custkey",
        "c_name",
        "c_nationkey",
        dec("c_acctbal"),
        "c_mktsegment"),
      arm(
        "supplier",
        "supplier",
        "s_suppkey",
        "s_name",
        "s_nationkey",
        dec("s_acctbal")),
      arm(
        "events",
        "events",
        "event_id",
        "epoch_us(ts)",
        "user_id",
        "event_type",
        dec("value"),
        "props"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY table_name")
  }

  // ---------------------------------------------------------------------
  // q_bitmap_distinct — distinct counting via BITMAP aggregation (the
  // roaring-bitmap pattern every interactive-analytics store uses for
  // count-distinct rollups): user ids map to (bucket, bit position),
  // per-group-per-bucket bitmaps OR together, popcounts sum. Two
  // bounded aggregations; the bitmap state is 4 KB per (group, bucket)
  // regardless of row count, and — unlike countDistinct's Expand-based
  // exact path — bitmaps from different partitions/epochs MERGE, which
  // is what makes the pattern incremental at 100 TB. Values are
  // bit-identical to plain COUNT(DISTINCT), which is the oracle.
  // ---------------------------------------------------------------------
  val bitmapDistinct: Q = (s, d) => {
    Tables
      .events(s, d)
      .groupBy(
        col("event_type"),
        expr("bitmap_bucket_number(user_id)").as("bkt"))
      .agg(
        expr("bitmap_construct_agg(bitmap_bit_position(user_id))")
          .as("bm"),
        count(lit(1)).as("n"))
      .groupBy(col("event_type"))
      .agg(
        sum(expr("bitmap_count(bm)")).as("d_users"),
        sum(col("n")).as("n_events"))
      .orderBy(col("event_type"))
  }

  val bitmapDistinctSql: String =
    """SELECT event_type,
      |count(DISTINCT user_id) AS d_users, count(*) AS n_events
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------
  // q_profile — ONE-PASS COLUMN PROFILING (the ANALYZE/stats-collection
  // step of any ingest, and the input to join reordering and file
  // skipping): per column, row count, null count, exact distinct
  // count, and min/max — numerics (and timestamps, as epoch micros) in
  // numeric lanes, strings in binary-collation string lanes. ALL
  // columns ride ONE aggregate over ONE scan (the countDistincts share
  // the Expand), then the single stats row unpivots to long format —
  // the q_data_checks discipline applied to profiling. At 100 TB this
  // is the nightly stats job; exact ndv becomes the KMV sketch
  // (q_approx_distinct) at no change to the shape.
  // ---------------------------------------------------------------------
  val profile: Q = (s, d) => {
    val numCols = Seq("l_orderkey", "l_quantity", "l_extendedprice")
    val strCols = Seq("l_returnflag", "l_linestatus")
    val li = Tables
      .lineitem(s, d)
      .select(
        (numCols.map(col) ++ strCols.map(col)) :+
          // NTZ timestamp → epoch-days (timezone-free on both engines)
          datediff(col("l_shipdate").cast("date"), to_date(lit("1970-01-01")))
            .cast("long")
            .as("l_shipdate_day"): _*)
    val allNum = numCols :+ "l_shipdate_day"
    val statsRow = li.agg(
      count(lit(1)).as("n_rows"),
      (allNum.flatMap(c =>
        Seq(
          count(col(c)).as(s"nn_$c"),
          countDistinct(col(c)).as(s"nd_$c"),
          min(col(c)).cast("double").as(s"mn_$c"),
          max(col(c)).cast("double").as(s"mx_$c"))) ++
        strCols.flatMap(c =>
          Seq(
            count(col(c)).as(s"nn_$c"),
            countDistinct(col(c)).as(s"nd_$c"),
            min(col(c)).as(s"mn_$c"),
            max(col(c)).as(s"mx_$c")))): _*)
    def numStruct(c: String) =
      struct(
        lit(c).as("col_name"),
        (col("n_rows") - col(s"nn_$c")).as("n_null"),
        col(s"nd_$c").as("n_distinct"),
        col(s"mn_$c").as("min_num"),
        col(s"mx_$c").as("max_num"),
        lit(null).cast("string").as("min_str"),
        lit(null).cast("string").as("max_str"))
    def strStruct(c: String) =
      struct(
        lit(c).as("col_name"),
        (col("n_rows") - col(s"nn_$c")).as("n_null"),
        col(s"nd_$c").as("n_distinct"),
        lit(null).cast("double").as("min_num"),
        lit(null).cast("double").as("max_num"),
        col(s"mn_$c").as("min_str"),
        col(s"mx_$c").as("max_str"))
    statsRow
      .select(
        col("n_rows"),
        explode(array(allNum.map(numStruct) ++ strCols.map(strStruct): _*))
          .as("p"))
      .select(
        col("p.col_name").as("col_name"),
        col("n_rows"),
        col("p.n_null").as("n_null"),
        col("p.n_distinct").as("n_distinct"),
        col("p.min_num").as("min_num"),
        col("p.max_num").as("max_num"),
        col("p.min_str").as("min_str"),
        col("p.max_str").as("max_str"))
      .orderBy(col("col_name"))
  }

  val profileSql: String = {
    val numCols =
      Seq("l_orderkey", "l_quantity", "l_extendedprice", "l_shipdate_day")
    val strCols = Seq("l_returnflag", "l_linestatus")
    val branches =
      numCols.map(c =>
        s"""SELECT '$c' AS col_name, n_rows,
           |  n_rows - nn_$c AS n_null, nd_$c AS n_distinct,
           |  mn_$c AS min_num, mx_$c AS max_num,
           |  CAST(NULL AS VARCHAR) AS min_str,
           |  CAST(NULL AS VARCHAR) AS max_str FROM m""".stripMargin) ++
        strCols.map(c =>
          s"""SELECT '$c', n_rows, n_rows - nn_$c, nd_$c,
             |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
             |  mn_$c, mx_$c FROM m""".stripMargin)
    val aggs =
      numCols.flatMap(c =>
        Seq(
          s"count($c) AS nn_$c",
          s"count(DISTINCT $c) AS nd_$c",
          s"CAST(min($c) AS DOUBLE) AS mn_$c",
          s"CAST(max($c) AS DOUBLE) AS mx_$c")) ++
        strCols.flatMap(c =>
          Seq(
            s"count($c) AS nn_$c",
            s"count(DISTINCT $c) AS nd_$c",
            s"min($c) AS mn_$c",
            s"max($c) AS mx_$c"))
    s"""WITH li AS (
       |  SELECT l_orderkey, l_quantity, l_extendedprice,
       |    CAST(date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
       |      AS BIGINT) AS l_shipdate_day,
       |    l_returnflag, l_linestatus
       |  FROM lineitem),
       |m AS (SELECT count(*) AS n_rows, ${aggs.mkString(",\n  ")} FROM li)
       |SELECT * FROM (${branches.mkString("\nUNION ALL\n")})
       |ORDER BY col_name""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q_profile_sketch — the q_profile shape with the ndv lanes riding the
  // KMV sketch (plans/KMinDistinct.scala) instead of exact
  // countDistinct. Why it exists: every countDistinct in q_profile's
  // single aggregate multiplies the scanned rows through an Expand
  // (one replica per distinct lane — 6 lanes = 6× the aggregate input),
  // which is exactly what a nightly 100 TB stats job cannot afford. The
  // sketch lanes aggregate the SAME single scan with NO Expand: each
  // map partition is capped at k=64 hashes per column by the bounded
  // KMinDistinct buffer, so the exchange carries O(k·cols·partitions)
  // longs regardless of row count. PlanSpec asserts the no-Expand plan.
  //
  // Numeric columns hash an INTEGER-EXACT key (ids and epoch-days as
  // themselves, money as cents) rendered to string — double-to-string
  // formatting is engine-specific, integer rendering is not, so the
  // DuckDB twin recomputes bit-identical hashes and the estimate
  // (k-1)·2^32 div h_(k) gates exactly (the q_approx_distinct
  // discipline, column-profiled).
  // ---------------------------------------------------------------------
  private val pskK = 64
  private val pskSeed = 17
  private val pskSpace = 4294967296L // 2^32

  val profileSketch: Q = (s, d) => {
    import graft.functions.Hashing.h32
    import graft.plans.KMinDistinct
    val strCols = Seq("l_returnflag", "l_linestatus")
    val li = Tables
      .lineitem(s, d)
      .select(
        col("l_orderkey"),
        col("l_quantity"),
        col("l_extendedprice"),
        datediff(col("l_shipdate").cast("date"), to_date(lit("1970-01-01")))
          .cast("long")
          .as("l_shipdate_day"),
        col("l_returnflag"),
        col("l_linestatus"))
      // injective integer keys for the hash lanes
      .withColumn("k_l_orderkey", col("l_orderkey"))
      .withColumn("k_l_quantity", round(col("l_quantity") * 100).cast("long"))
      .withColumn(
        "k_l_extendedprice",
        round(col("l_extendedprice") * 100).cast("long"))
      .withColumn("k_l_shipdate_day", col("l_shipdate_day"))
    val allNum =
      Seq("l_orderkey", "l_quantity", "l_extendedprice", "l_shipdate_day")
    val statsRow = li.agg(
      count(lit(1)).as("n_rows"),
      (allNum.flatMap(c =>
        Seq(
          count(col(c)).as(s"nn_$c"),
          KMinDistinct
            .kmin(h32(pskSeed, col(s"k_$c").cast("string")), pskK)
            .as(s"hs_$c"),
          min(col(c)).cast("double").as(s"mn_$c"),
          max(col(c)).cast("double").as(s"mx_$c"))) ++
        strCols.flatMap(c =>
          Seq(
            count(col(c)).as(s"nn_$c"),
            KMinDistinct.kmin(h32(pskSeed, col(c)), pskK).as(s"hs_$c"),
            min(col(c)).as(s"mn_$c"),
            max(col(c)).as(s"mx_$c")))): _*)
    def est(c: String) =
      when(size(col(s"hs_$c")) < pskK, size(col(s"hs_$c")).cast("long"))
        .otherwise(expr(
          s"${(pskK - 1) * pskSpace}L div element_at(hs_$c, size(hs_$c))"))
    def numStruct(c: String) =
      struct(
        lit(c).as("col_name"),
        (col("n_rows") - col(s"nn_$c")).as("n_null"),
        est(c).as("n_distinct_est"),
        col(s"mn_$c").as("min_num"),
        col(s"mx_$c").as("max_num"),
        lit(null).cast("string").as("min_str"),
        lit(null).cast("string").as("max_str"))
    def strStruct(c: String) =
      struct(
        lit(c).as("col_name"),
        (col("n_rows") - col(s"nn_$c")).as("n_null"),
        est(c).as("n_distinct_est"),
        lit(null).cast("double").as("min_num"),
        lit(null).cast("double").as("max_num"),
        col(s"mn_$c").as("min_str"),
        col(s"mx_$c").as("max_str"))
    statsRow
      .select(
        col("n_rows"),
        explode(array(allNum.map(numStruct) ++ strCols.map(strStruct): _*))
          .as("p"))
      .select(
        col("p.col_name").as("col_name"),
        col("n_rows"),
        col("p.n_null").as("n_null"),
        col("p.n_distinct_est").as("n_distinct_est"),
        col("p.min_num").as("min_num"),
        col("p.max_num").as("max_num"),
        col("p.min_str").as("min_str"),
        col("p.max_str").as("max_str"))
      .orderBy(col("col_name"))
  }

  val profileSketchSql: String = {
    import graft.functions.Hashing.sqlH32
    val numCols =
      Seq("l_orderkey", "l_quantity", "l_extendedprice", "l_shipdate_day")
    val strCols = Seq("l_returnflag", "l_linestatus")
    def hashOf(c: String) =
      if (strCols.contains(c)) sqlH32(pskSeed, c)
      else sqlH32(pskSeed, s"k_$c::VARCHAR")
    val kmCtes = (numCols ++ strCols).map(c =>
      s"""s_$c AS (
         |  SELECT count(*) AS nh, max(h) AS kth FROM (
         |    SELECT DISTINCT ${hashOf(c)} AS h FROM li
         |    WHERE $c IS NOT NULL ORDER BY h LIMIT $pskK))""".stripMargin)
    def estOf(c: String) =
      s"""CAST(CASE WHEN s_$c.nh < $pskK THEN s_$c.nh
         |  ELSE ${(pskK - 1) * pskSpace} // s_$c.kth END AS BIGINT)""".stripMargin
    val branches =
      numCols.map(c =>
        s"""SELECT '$c' AS col_name, m.n_rows,
           |  m.n_rows - m.nn_$c AS n_null, ${estOf(c)} AS n_distinct_est,
           |  m.mn_$c AS min_num, m.mx_$c AS max_num,
           |  CAST(NULL AS VARCHAR) AS min_str,
           |  CAST(NULL AS VARCHAR) AS max_str FROM m, s_$c""".stripMargin) ++
        strCols.map(c =>
          s"""SELECT '$c', m.n_rows, m.n_rows - m.nn_$c, ${estOf(c)},
             |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
             |  m.mn_$c, m.mx_$c FROM m, s_$c""".stripMargin)
    val aggs =
      numCols.flatMap(c =>
        Seq(
          s"count($c) AS nn_$c",
          s"CAST(min($c) AS DOUBLE) AS mn_$c",
          s"CAST(max($c) AS DOUBLE) AS mx_$c")) ++
        strCols.flatMap(c =>
          Seq(
            s"count($c) AS nn_$c",
            s"min($c) AS mn_$c",
            s"max($c) AS mx_$c"))
    s"""WITH li AS (
       |  SELECT l_orderkey, l_quantity, l_extendedprice,
       |    CAST(date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
       |      AS BIGINT) AS l_shipdate_day,
       |    l_returnflag, l_linestatus,
       |    l_orderkey AS k_l_orderkey,
       |    CAST(round(l_quantity * 100) AS BIGINT) AS k_l_quantity,
       |    CAST(round(l_extendedprice * 100) AS BIGINT) AS k_l_extendedprice,
       |    CAST(date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
       |      AS BIGINT) AS k_l_shipdate_day
       |  FROM lineitem),
       |m AS (SELECT count(*) AS n_rows, ${aggs.mkString(",\n  ")} FROM li),
       |${kmCtes.mkString(",\n")}
       |SELECT * FROM (${branches.mkString("\nUNION ALL\n")})
       |ORDER BY col_name""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Registration
  // ---------------------------------------------------------------------
  val queries: Map[String, Q] = Map(
    "q_profile" -> profile,
    "q_profile_sketch" -> profileSketch,
    "q_data_checks" -> dataChecks,
    "q_table_checksum" -> tableChecksum,
    "q_bitmap_distinct" -> bitmapDistinct,
    "q_sql_portable" -> sqlPortable,
    "q_recursive_cte" -> recursiveCte,
    "q_ship_priority" -> shipPriority,
    "q_bank_conservation" -> bankConservation,
    "q_pricing_summary" -> pricingSummary,
    "q_top_customers" -> topCustomers,
    "q_join_broadcast" -> brandRevenue,
    "q_join_semi" -> customersWithOrders,
    "q_join_anti" -> customersWithoutOrders,
    "q_join_outer" -> orderCountsOuter,
    "q_setops" -> setOps,
    "q_setops_all" -> setOpsAll,
    "q_rollup" -> rollupBalances,
    "q_cube" -> cubeReturns,
    "q_distinct_counts" -> distinctCounts,
    "q_window_running" -> windowRunning,
    "q_orders_by_month" -> ordersByMonth,
    "q_filter_pushdown" -> filterPushdown,
    "q_case_having" -> caseHaving,
    "q_string_funcs" -> stringFuncs,
    "q_multi_join" -> multiJoin,
    "q_exists_corr" -> existsCorr,
    "q_cust_dist" -> custDist,
    "q_ignore_nulls" -> ignoreNulls,
    "q_salted_agg" -> saltedAgg,
    "q_lateral_topn" -> lateralTopn,
    "q_salted_join" -> saltedJoin,
    "q_cust_idle" -> custIdle,
    "q_collect_sorted" -> collectSorted,
  )

  val oracleSql: Map[String, String] = Map(
    "q_sql_portable" -> sqlPortableText,
    "q_recursive_cte" -> recursiveCteSql,
    "q_ship_priority" -> shipPrioritySql,
    "q_bank_conservation" -> bankConservationSql,
    "q_pricing_summary" -> pricingSummarySql,
    "q_top_customers" -> topCustomersSql,
    "q_join_broadcast" -> brandRevenueSql,
    "q_join_semi" -> customersWithOrdersSql,
    "q_join_anti" -> customersWithoutOrdersSql,
    "q_join_outer" -> orderCountsOuterSql,
    "q_setops" -> setOpsSql,
    "q_setops_all" -> setOpsAllSql,
    "q_rollup" -> rollupBalancesSql,
    "q_cube" -> cubeReturnsSql,
    "q_profile" -> profileSql,
    "q_profile_sketch" -> profileSketchSql,
    "q_data_checks" -> dataChecksSql,
    "q_table_checksum" -> tableChecksumSql,
    "q_bitmap_distinct" -> bitmapDistinctSql,
    "q_distinct_counts" -> distinctCountsSql,
    "q_window_running" -> windowRunningSql,
    "q_orders_by_month" -> ordersByMonthSql,
    "q_filter_pushdown" -> filterPushdownSql,
    "q_case_having" -> caseHavingSql,
    "q_string_funcs" -> stringFuncsSql,
    "q_multi_join" -> multiJoinSql,
    "q_exists_corr" -> existsCorrText,
    "q_cust_dist" -> custDistSql,
    "q_ignore_nulls" -> ignoreNullsSql,
    "q_salted_agg" -> saltedAggSql,
    "q_lateral_topn" -> lateralTopnText,
    "q_salted_join" -> saltedJoinSql,
    "q_cust_idle" -> custIdleText,
    "q_collect_sorted" -> collectSortedSql,
  )
}
