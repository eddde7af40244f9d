package graft.ops

import graft.Tables
import graft.functions.Exact._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Decision-support completion batch — the TPC-H report shapes not yet
  * covered by [[Warehouse]] (which ships Q8/Q11/Q15/Q18/Q21): Q2, Q5,
  * Q6, Q7, Q9, Q14, Q16, Q17, Q19, Q20 analogues. Together the two
  * modules give a user of the reference the full canonical warehouse
  * query set (SURVEY.md §2.11 — the reference itself has no relational
  * operators; these compose the engine's joins/aggregates/subqueries
  * into every classic report pattern).
  *
  * Schema adaptations (testdata has no partsupp / shipmode /
  * commitdate): supplier-part cost relationships are derived from
  * lineitem (min observed price per (part, supplier) plays
  * ps_supplycost's role in Q2/Q16/Q20), and Q9's supplycost term uses
  * qty × p_retailprice.
  *
  * Scale design (100 TB):
  *  - Dimension sides (region/nation/part-filtered/supplier) broadcast;
  *    the only data-sized shuffles are fact aggregations on group keys
  *    and the per-part/per-pair aggregate views the correlated
  *    subqueries decorrelate into (hash joins on the part key).
  *  - Boundary predicates never compare floating aggregates: quantity
  *    thresholds run on integer-cast longs (q_small_qty_rev's
  *    `qty*2*cnt < sum` is Q17's `qty < 0.5*avg` cleared of division),
  *    money thresholds in exact decimal, so membership at the HAVING /
  *    filter boundary is bit-identical cross-engine.
  *  - Q19's OR-of-ANDs predicate stays a single conjunctive join on
  *    p_partkey with the disjunction evaluated post-join — Catalyst
  *    extracts the common join key instead of a cross product, and
  *    pushes the per-side conjunct unions (brand IN, size range) down
  *    to both scans.
  */
object Reports {
  type Q = (SparkSession, String) => DataFrame

  private val D = "decimal(18,4)"

  // ---------------------------------------------------------------------
  // q_forecast_rev — TPC-H Q6 shape: revenue a discount change would
  // forecast. Pure scan-filter-aggregate, the pushdown yardstick among
  // the report queries. Discount-band membership is integer-exact
  // (round(d*100) ∈ [5,7]) so neither engine decides the boundary on a
  // double ulp; the revenue term price×discount is exact decimal.
  // ---------------------------------------------------------------------
  val forecastRev: Q = (s, d) => {
    Tables
      .lineitem(s, d)
      .filter(
        col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          round(col("l_discount") * 100).cast("long").between(5, 7) &&
          col("l_quantity") < 24)
      .agg(
        decSum(col("l_extendedprice").cast(D) * col("l_discount").cast(D))
          .as("forecast_rev"),
        count(lit(1)).as("n_lines"))
  }

  val forecastRevSql: String =
    """SELECT
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
      |                 CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4))
      |       AS DOUBLE) AS forecast_rev,
      |  count(*) AS n_lines
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
      |  AND l_quantity < 24""".stripMargin

  // ---------------------------------------------------------------------
  // q_natl_revenue — TPC-H Q5 shape: local-supplier revenue by nation
  // inside one region and one order year. The distinguishing clause is
  // c_nationkey = s_nationkey — a join predicate BETWEEN two already-
  // joined dimensions, not a new table. Nation/region broadcast; the
  // fact side shuffles once on the final group key.
  // ---------------------------------------------------------------------
  val natlRevenue: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val o = Tables
      .orders(s, d)
      .filter(
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val c = Tables.customer(s, d)
    val sup = Tables.supplier(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d).filter(col("r_name") === "EUROPE")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(sup),
        li("l_suppkey") === sup("s_suppkey") &&
          c("c_nationkey") === sup("s_nationkey"))
      .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(
        decSum(revenue(col("l_extendedprice"), col("l_discount")))
          .as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val natlRevenueSql: String =
    s"""SELECT n_name,
       |  ${sqlDecSum(sqlRevenue("l_extendedprice", "l_discount"))} AS revenue,
       |  count(*) AS n_lines
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'EUROPE'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
       |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  // ---------------------------------------------------------------------
  // q_volume_ship — TPC-H Q7 shape: shipping volume between two nations,
  // both directions, by ship year. Each fact row carries TWO nation
  // dimensions (supplier's and customer's); the pair filter keeps the
  // symmetric (1,2)/(2,1) lanes distinct in the output.
  // ---------------------------------------------------------------------
  val volumeShip: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val sup = Tables.supplier(s, d)
    val sn = Tables
      .nation(s, d)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val cn = Tables
      .nation(s, d)
      .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(sn), sup("s_nationkey") === col("sn_key"))
      .join(broadcast(cn), c("c_nationkey") === col("cn_key"))
      .filter(
        // Pair picked to be populated at EVERY SF of the current fixture
        // (FIXTURES.md): sf0.001 has suppliers only in 10 of 25 nations.
        (col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_8") ||
          (col("supp_nation") === "NATION_8" && col("cust_nation") === "NATION_3"))
      .filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .groupBy(
        col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(
        decSum(revenue(col("l_extendedprice"), col("l_discount")))
          .as("volume"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  val volumeShipSql: String =
    s"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       |  CAST(year(l_shipdate) AS INT) AS l_year,
       |  ${sqlDecSum(sqlRevenue("l_extendedprice", "l_discount"))} AS volume,
       |  count(*) AS n_lines
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation sn ON s_nationkey = sn.n_nationkey
       |JOIN nation cn ON c_nationkey = cn.n_nationkey
       |WHERE ((sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_8')
       |    OR (sn.n_name = 'NATION_8' AND cn.n_name = 'NATION_3'))
       |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
       |GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  // ---------------------------------------------------------------------
  // q_product_profit — TPC-H Q9 shape: profit by supplier nation and
  // order year over a part-name pattern. Q9's ps_supplycost×l_quantity
  // cost term becomes l_quantity×p_retailprice (the testdata's only
  // per-part cost basis); the amount stays one exact decimal expression
  // so the profit sums are bit-identical cross-engine. The LIKE
  // pattern prunes part BEFORE the join and rides into the lineitem
  // scan as a bloom/semi filter at scale.
  // ---------------------------------------------------------------------
  val productProfit: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val p = Tables.part(s, d).filter(col("p_name").like("%red%"))
    val o = Tables.orders(s, d)
    val sup = Tables.supplier(s, d)
    val n = Tables.nation(s, d)
    val amount =
      revenue(col("l_extendedprice"), col("l_discount")) -
        col("l_quantity").cast(D) * col("p_retailprice").cast(D)
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(decSum(amount).as("profit"), count(lit(1)).as("n_lines"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  val productProfitSql: String =
    s"""SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       |  ${sqlDecSum(
         sqlRevenue("l_extendedprice", "l_discount") +
           " - CAST(l_quantity AS DECIMAL(18,4)) * CAST(p_retailprice AS DECIMAL(18,4))")}
       |    AS profit,
       |  count(*) AS n_lines
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |WHERE p_name LIKE '%red%'
       |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin

  // ---------------------------------------------------------------------
  // q_promo_revenue — TPC-H Q14 shape: promotional revenue share for one
  // ship month. Both the promo lane and the total are exact decimal
  // sums; only the final percentage divides in double (the one
  // correctly-rounded conversion both engines share).
  // ---------------------------------------------------------------------
  val promoRevenue: Q = (s, d) => {
    Tables
      .lineitem(s, d)
      .join(
        broadcast(Tables.part(s, d)),
        col("l_partkey") === col("p_partkey"))
      .filter(
        col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
      .agg(
        decSum(when(col("p_type") === "PROMO",
          revenue(col("l_extendedprice"), col("l_discount")))
          .otherwise(lit(0).cast(D))).as("promo_rev"),
        decSum(revenue(col("l_extendedprice"), col("l_discount")))
          .as("total_rev"),
        count(lit(1)).as("n_lines"))
      .withColumn("promo_pct", lit(100.0) * col("promo_rev") / col("total_rev"))
      .select(col("promo_pct"), col("promo_rev"), col("total_rev"), col("n_lines"))
  }

  val promoRevenueSql: String = {
    val rev = sqlRevenue("l_extendedprice", "l_discount")
    s"""SELECT
       |  100.0 * ${sqlDecSum(
        s"CASE WHEN p_type = 'PROMO' THEN $rev ELSE CAST(0 AS DECIMAL(18,4)) END")}
       |    / ${sqlDecSum(rev)} AS promo_pct,
       |  ${sqlDecSum(
        s"CASE WHEN p_type = 'PROMO' THEN $rev ELSE CAST(0 AS DECIMAL(18,4)) END")} AS promo_rev,
       |  ${sqlDecSum(rev)} AS total_rev,
       |  count(*) AS n_lines
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
       |  AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q_min_cost_supp — TPC-H Q2 shape: for each qualifying part, the
  // supplier(s) offering the minimum observed price (min l_extendedprice
  // per (part, supplier) playing ps_supplycost). The correlated scalar
  // min decorrelates into a per-part aggregate view hash-joined back on
  // the part key — the pair frame and the part-min frame shuffle ONCE
  // each on p_partkey, never the raw fact. min/max over doubles is
  // order-independent, so no decimal lift is needed on the boundary.
  // ---------------------------------------------------------------------
  val minCostSupp: Q = (s, d) => {
    val p = Tables
      .part(s, d)
      .filter(col("p_size").between(10, 20) && col("p_type") === "LARGE")
    val pairs = Tables
      .lineitem(s, d)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_partkey"), col("p_name"), col("l_suppkey"))
      .agg(min(col("l_extendedprice")).as("best_price"))
    val partMin = pairs
      .groupBy(col("p_partkey").as("pm_key"))
      .agg(min(col("best_price")).as("part_min"))
    pairs
      .join(partMin,
        col("p_partkey") === col("pm_key") &&
          col("best_price") === col("part_min"))
      .join(
        broadcast(Tables.supplier(s, d)),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("p_partkey"), col("p_name"), col("s_suppkey"),
        col("s_name"), col("best_price"))
      .orderBy(col("best_price"), col("p_partkey"), col("s_suppkey"))
  }

  val minCostSuppSql: String =
    """WITH pairs AS (
      |  SELECT p_partkey, p_name, l_suppkey,
      |    min(l_extendedprice) AS best_price
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_size BETWEEN 10 AND 20 AND p_type = 'LARGE'
      |  GROUP BY 1, 2, 3)
      |SELECT p_partkey, p_name, s_suppkey, s_name, best_price
      |FROM pairs JOIN supplier ON l_suppkey = s_suppkey
      |WHERE best_price = (SELECT min(best_price) FROM pairs p2
      |                    WHERE p2.p_partkey = pairs.p_partkey)
      |ORDER BY best_price, p_partkey, s_suppkey""".stripMargin

  // ---------------------------------------------------------------------
  // q_small_qty_rev — TPC-H Q17 shape: revenue from small-quantity lines
  // of one brand, "small" defined per part by a correlated average.
  // Q17's `l_quantity < 0.5 * avg(l_quantity)` is cleared of division:
  // quantities are integral, so the boundary becomes
  // `2*qty*cnt < sum` — pure int64 arithmetic, no float average for the
  // engines to disagree on. The per-part aggregate view joins back on
  // the part key (the decorrelation Catalyst produces for the original
  // correlated form).
  // ---------------------------------------------------------------------
  val smallQtyRev: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val p = Tables.part(s, d).filter(col("p_brand") === "Brand#3")
    val perPart = li
      .groupBy(col("l_partkey").as("pp_key"))
      .agg(
        sum(col("l_quantity").cast("long")).as("qty_sum"),
        count(lit(1)).as("qty_cnt"))
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(perPart, col("l_partkey") === col("pp_key"))
      .filter(
        col("l_quantity").cast("long") * 2 * col("qty_cnt") < col("qty_sum"))
      .agg(
        decSum(col("l_extendedprice")).as("small_qty_rev"),
        count(lit(1)).as("n_lines"))
  }

  val smallQtyRevSql: String =
    s"""WITH per_part AS (
       |  SELECT l_partkey AS pp_key,
       |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum,
       |    count(*) AS qty_cnt
       |  FROM lineitem GROUP BY 1)
       |SELECT ${sqlDsum("l_extendedprice")} AS small_qty_rev,
       |  count(*) AS n_lines
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |JOIN per_part ON l_partkey = pp_key
       |WHERE p_brand = 'Brand#3'
       |  AND CAST(l_quantity AS BIGINT) * 2 * qty_cnt < qty_sum""".stripMargin

  // ---------------------------------------------------------------------
  // q_supplier_cnt — TPC-H Q16 shape: distinct qualifying suppliers per
  // (brand, type, size) bucket, with an excluded-supplier NOT IN
  // subquery (negative account balance playing Q16's complaint
  // comment). The supplier-part relation is the distinct (part, supp)
  // pairs observed in lineitem. s_suppkey is non-nullable, so the NOT
  // IN is a plain anti join — contrast q_not_in_null, which gates the
  // null-bearing lane.
  // ---------------------------------------------------------------------
  val supplierCnt: Q = (s, d) => {
    val excluded = Tables
      .supplier(s, d)
      .filter(col("s_acctbal") < 0)
      .select(col("s_suppkey").as("x_key"))
    val pairs = Tables
      .lineitem(s, d)
      .select(col("l_partkey"), col("l_suppkey"))
      .distinct()
      .join(broadcast(excluded), col("l_suppkey") === col("x_key"), "left_anti")
    val p = Tables
      .part(s, d)
      .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
    pairs
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
      .limit(40)
  }

  val supplierCntSql: String =
    """SELECT p_brand, p_type, p_size,
      |  count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
      |JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      |  AND l_suppkey NOT IN
      |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY 1, 2, 3
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size LIMIT 40""".stripMargin

  // ---------------------------------------------------------------------
  // q_disjunctive_join — TPC-H Q19 shape: an OR of three conjunct
  // bundles spanning BOTH join sides. The equi-key (l_partkey =
  // p_partkey) stays conjunctive, so Catalyst plans a normal hash join
  // and evaluates the disjunction as a post-join filter, pushing the
  // per-side conjunct unions (brand ∈ {...}, size ≤ 15, qty ≤ 30) down
  // to the scans — the classic test that an engine does NOT fall back
  // to a cartesian product on disjunctive join predicates. Quantity
  // boundaries run on integer casts.
  // ---------------------------------------------------------------------
  val disjunctiveJoin: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val p = Tables.part(s, d)
    val qty = col("l_quantity").cast("long")
    val bundle1 = col("p_brand") === "Brand#12" &&
      col("p_size").between(1, 5) && qty.between(1, 11)
    val bundle2 = col("p_brand") === "Brand#23" &&
      col("p_size").between(1, 10) && qty.between(10, 20)
    val bundle3 = col("p_brand") === "Brand#34" &&
      col("p_size").between(1, 15) && qty.between(20, 30)
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(bundle1 || bundle2 || bundle3)
      .agg(
        decSum(revenue(col("l_extendedprice"), col("l_discount")))
          .as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  val disjunctiveJoinSql: String =
    s"""SELECT
       |  ${sqlDecSum(sqlRevenue("l_extendedprice", "l_discount"))} AS revenue,
       |  count(*) AS n_lines
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       |       AND CAST(l_quantity AS BIGINT) BETWEEN 1 AND 11)
       |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       |       AND CAST(l_quantity AS BIGINT) BETWEEN 10 AND 20)
       |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       |       AND CAST(l_quantity AS BIGINT) BETWEEN 20 AND 30)""".stripMargin

  // ---------------------------------------------------------------------
  // q_excess_supp — TPC-H Q20 shape: suppliers who shipped, for some
  // part of the pattern, more than TWICE the average per-supplier
  // quantity of that part (Q20's "excess stock" threshold, made
  // adaptive: with ~26 suppliers per part no one holds Q20's literal
  // 50%, so the boundary is share > 2/n — `pair*n > 2*total`, pure
  // int64, no float average). A two-level aggregate-threshold semi
  // chain, then supplier detail via LEFT SEMI so each supplier
  // appears once however many parts qualify it.
  // ---------------------------------------------------------------------
  val excessSupp: Q = (s, d) => {
    val p = Tables.part(s, d).filter(col("p_name").like("%blue%"))
    val filtered = Tables
      .lineitem(s, d)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_suppkey"),
        col("l_quantity").cast("long").as("qty"))
    val pairQty = filtered
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("qty")).as("pair_qty"))
    val partQty = pairQty
      .groupBy(col("l_partkey").as("pt_key"))
      .agg(sum(col("pair_qty")).as("part_qty"), count(lit(1)).as("n_supp"))
    val qualifying = pairQty
      .join(partQty, col("l_partkey") === col("pt_key"))
      .filter(col("pair_qty") * col("n_supp") > col("part_qty") * 2)
      .select(col("l_suppkey")).distinct()
    Tables
      .supplier(s, d)
      .join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))
      .orderBy(col("s_suppkey"))
  }

  val excessSuppSql: String =
    """WITH pair_qty AS (
      |  SELECT l_partkey, l_suppkey,
      |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS pair_qty
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_name LIKE '%blue%'
      |  GROUP BY 1, 2),
      |part_qty AS (
      |  SELECT l_partkey AS pt_key,
      |    CAST(SUM(pair_qty) AS BIGINT) AS part_qty,
      |    count(*) AS n_supp
      |  FROM pair_qty GROUP BY 1)
      |SELECT s_suppkey, s_name, s_nationkey
      |FROM supplier
      |WHERE s_suppkey IN (
      |  SELECT l_suppkey FROM pair_qty JOIN part_qty ON l_partkey = pt_key
      |  WHERE pair_qty * n_supp > part_qty * 2)
      |ORDER BY s_suppkey""".stripMargin

  // ---------------------------------------------------------------------
  // q_order_priority — TPC-H Q4 shape: order-priority checking. The
  // canonical form counts orders in a quarter having at least one line
  // with commitdate < receiptdate; the testdata has neither column, so
  // the lateness witness is l_shipdate > o_orderdate + 90 days — same
  // semantics (an EXISTS against the fact table, decorrelated to a
  // LEFT SEMI join on the order key), same output shape (priority,
  // order_count). The semi join is the scale story: the lineitem probe
  // never fans out order rows, and the date predicate pushes to both
  // scans.
  // ---------------------------------------------------------------------
  val orderPriority: Q = (s, d) => {
    val o = Tables
      .orders(s, d)
      .filter(
        col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
    val li = Tables.lineitem(s, d)
    o.join(
      li,
      o("o_orderkey") === li("l_orderkey") &&
        li("l_shipdate") > o("o_orderdate") + expr("INTERVAL 90 DAYS"),
      "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  val orderPrioritySql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem
      |    WHERE l_orderkey = o_orderkey
      |      AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------------
  // q_ship_classes — TPC-H Q12 shape: shipping-class lateness report.
  // The canonical form buckets lineitems by l_shipmode and CASE-counts
  // urgent vs non-urgent orders among late lines; without shipmode, the
  // class is derived from the line's shipping delay (FAST < 30 days ≤
  // REGULAR < 75 ≤ SLOW) — the same one-join one-aggregate shape with
  // the same urgency CASE arithmetic, integer-exact.
  // ---------------------------------------------------------------------
  val shipClasses: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val li = Tables
      .lineitem(s, d)
      .filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
    val delay = datediff(
      li("l_shipdate").cast("date"),
      o("o_orderdate").cast("date"))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .withColumn(
        "ship_class",
        when(delay < 30, "FAST")
          .when(delay < 75, "REGULAR")
          .otherwise("SLOW"))
      .groupBy(col("ship_class"))
      .agg(
        sum(
          when(
            col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
            1L).otherwise(0L)).as("high_line_count"),
        sum(
          when(
            col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
            0L).otherwise(1L)).as("low_line_count"))
      .orderBy(col("ship_class"))
  }

  val shipClassesSql: String =
    """SELECT
      |  CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
      |                      CAST(l_shipdate AS DATE)) < 30 THEN 'FAST'
      |       WHEN date_diff('day', CAST(o_orderdate AS DATE),
      |                      CAST(l_shipdate AS DATE)) < 75 THEN 'REGULAR'
      |       ELSE 'SLOW' END AS ship_class,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |           THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY 1 ORDER BY ship_class""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_order_priority" -> orderPriority,
    "q_ship_classes" -> shipClasses,
    "q_forecast_rev" -> forecastRev,
    "q_natl_revenue" -> natlRevenue,
    "q_volume_ship" -> volumeShip,
    "q_product_profit" -> productProfit,
    "q_promo_revenue" -> promoRevenue,
    "q_min_cost_supp" -> minCostSupp,
    "q_small_qty_rev" -> smallQtyRev,
    "q_supplier_cnt" -> supplierCnt,
    "q_disjunctive_join" -> disjunctiveJoin,
    "q_excess_supp" -> excessSupp
  )

  val oracleSql: Map[String, String] = Map(
    "q_order_priority" -> orderPrioritySql,
    "q_ship_classes" -> shipClassesSql,
    "q_forecast_rev" -> forecastRevSql,
    "q_natl_revenue" -> natlRevenueSql,
    "q_volume_ship" -> volumeShipSql,
    "q_product_profit" -> productProfitSql,
    "q_promo_revenue" -> promoRevenueSql,
    "q_min_cost_supp" -> minCostSuppSql,
    "q_small_qty_rev" -> smallQtyRevSql,
    "q_supplier_cnt" -> supplierCntSql,
    "q_disjunctive_join" -> disjunctiveJoinSql,
    "q_excess_supp" -> excessSuppSql
  )
}
