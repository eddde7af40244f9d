package graft

import org.apache.spark.sql.functions._

/** Every registered query must run on sf0.001 and produce rows; queries
  * with an oracle must have stable column names (the driver hashes by
  * sorted column name). Plus targeted invariants mirroring the
  * reference's own test idiom (balance conservation, counter exactness —
  * /root/reference/test/opusdb/atomic/stm_test.clj).
  */
class QueriesSpec extends SparkSpec {

  test("every query runs and returns rows on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      val n = df.count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("bank conservation invariant: per-nation totals sum to global total") {
    val perNation = ops.Relational
      .bankConservation(spark, sf)
      .agg(sum(col("total_bal")))
      .first()
      .getDouble(0)
    val global = Tables
      .customer(spark, sf)
      .agg(sum(col("c_acctbal").cast("decimal(18,4)")).cast("double"))
      .first()
      .getDouble(0)
    assert(math.abs(perNation - global) < 1e-6)
  }

  test("counter exactness: event counts partition the table") {
    val total = Tables.events(spark, sf).count()
    val byType = ops.Transactional
      .counterIncrements(spark, sf)
      .agg(sum(col("n_increments")))
      .first()
      .getLong(0)
    assert(byType == total)
  }

  test("snapshot consistency: two plans agree on the same input") {
    val row = ops.Transactional.snapshotConsistency(spark, sf).first()
    assert(row.getAs[Boolean]("snapshot_stable"))
  }

  test("top-k per group: at most 3 per segment, ranks contiguous") {
    val df = ops.Relational.topCustomers(spark, sf)
    val bad = df
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), max(col("rnk")).as("mx"))
      .filter(col("n") > 3 || col("mx") =!= col("n"))
      .count()
    assert(bad == 0)
  }

  test("as-of read: one row per user, version <= read point") {
    val df = ops.Transactional.asofRead(spark, sf)
    assert(df.filter(col("asof_version") > 5000).count() == 0)
    val dupes =
      df.groupBy(col("user_id")).count().filter(col("count") > 1).count()
    assert(dupes == 0)
  }

  test("version history cap: n_retained <= 16") {
    val df = ops.Transactional.versionHistory(spark, sf)
    assert(df.filter(col("n_retained") > 16).count() == 0)
  }

  test("filter pushdown reaches the parquet scan") {
    val plan = ops.Relational
      .filterPushdown(spark, sf)
      .queryExecution
      .executedPlan
      .toString
    assert(plan.contains("PushedFilters"), "no PushedFilters in plan")
    assert(
      plan.contains("l_shipdate") && plan.contains("GreaterThanOrEqual"),
      s"shipdate range not pushed"
    )
  }
}
