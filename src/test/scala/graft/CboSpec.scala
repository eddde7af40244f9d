package graft

/** Cost-based planning from CATALOG STATISTICS: the join strategy must
  * derive from `ANALYZE TABLE ... COMPUTE STATISTICS` — no hint — and
  * must FLIP when the statistics say the tables are large. This is the
  * 100 TB contract in miniature: the same declarative query broadcasts
  * a dimension when stats prove it small and shuffles when they don't,
  * so plan quality survives data growth without query edits.
  */
class CboSpec extends SparkSpec {

  private def joinNodes(q: String): String =
    spark.sql(q).queryExecution.executedPlan.toString

  /** Drop the table AND its warehouse directory — a managed-table drop
    * after a crashed prior JVM leaves the location behind, and
    * CREATE TABLE then fails with LOCATION_ALREADY_EXISTS.
    */
  private def dropHard(table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new java.io.File(s"/tmp/graft-test-warehouse/$table")
    if (loc.exists()) {
      import scala.reflect.io.Directory
      new Directory(loc).deleteRecursively()
    }
  }

  test("join picks broadcast from ANALYZE stats and flips when stats grow") {
    import org.apache.spark.sql.functions._
    val oldThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // one FIXED threshold for both arms — only the measured statistics
    // change between them (the nightly-ANALYZE production scenario: a
    // dimension outgrows broadcast size and the same query re-plans)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "65536")
    try {
      dropHard("cbo_nation")
      dropHard("cbo_customer")
      Tables.nation(spark, sf).write.mode("overwrite").saveAsTable("cbo_nation")
      Tables.customer(spark, sf).write.mode("overwrite").saveAsTable("cbo_customer")
      spark.sql("ANALYZE TABLE cbo_nation COMPUTE STATISTICS FOR ALL COLUMNS")
      spark.sql("ANALYZE TABLE cbo_customer COMPUTE STATISTICS FOR ALL COLUMNS")
      val q =
        """SELECT c.c_custkey, n.n_name
          |FROM cbo_customer c JOIN cbo_nation n ON c.c_nationkey = n.n_nationkey""".stripMargin
      // arm 1: stats say both sides are tiny -> broadcast, no hint
      val statsPlan = joinNodes(q)
      assert(statsPlan.contains("BroadcastHashJoin"),
        s"stats-known small join did not broadcast:\n$statsPlan")
      // arm 2: BOTH sides grow past the threshold (growing only one
      // would just flip which side broadcasts), stats re-measured —
      // the identical query must re-plan to a shuffle join
      // replicated rows alone dictionary-compress to ~19 KiB on disk
      // (ANALYZE measures the FILE size) — salt with distinct hashes so
      // the grown tables are genuinely large in storage
      Tables.nation(spark, sf)
        .crossJoin(spark.range(2000).select(col("id").as("rep")))
        .withColumn("salt", xxhash64(col("rep"), col("n_nationkey")))
        .write.mode("overwrite").saveAsTable("cbo_nation")
      Tables.customer(spark, sf)
        .crossJoin(spark.range(500).select(col("id").as("rep")))
        .withColumn("salt", xxhash64(col("rep"), col("c_custkey")))
        .write.mode("overwrite").saveAsTable("cbo_customer")
      spark.sql("ANALYZE TABLE cbo_nation COMPUTE STATISTICS FOR ALL COLUMNS")
      spark.sql("ANALYZE TABLE cbo_customer COMPUTE STATISTICS FOR ALL COLUMNS")
      val bigPlan = joinNodes(q)
      assert(
        bigPlan.contains("SortMergeJoin") || bigPlan.contains("ShuffledHashJoin"),
        s"stats-known large join still broadcasts:\n$bigPlan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThreshold)
      dropHard("cbo_nation")
      dropHard("cbo_customer")
    }
  }

  test("ANALYZE column stats are visible to the planner") {
    dropHard("cbo_region")
    Tables.region(spark, sf).write.mode("overwrite").saveAsTable("cbo_region")
    spark.sql("ANALYZE TABLE cbo_region COMPUTE STATISTICS FOR ALL COLUMNS")
    val desc = spark
      .sql("DESCRIBE EXTENDED cbo_region r_regionkey")
      .collect()
      .map(r => r.getString(0) -> r.getString(1))
      .toMap
    assert(desc.get("distinct_count").exists(_.toLong > 0), desc.toString)
    assert(desc.get("num_nulls").contains("0"), desc.toString)
    dropHard("cbo_region")
  }
}
