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

  test("every query has an oracle — zero rows-only gaps") {
    // q_approx_distinct was the last sanctioned rows-only query until
    // its KMV reformulation (ops/Sketches.scala) put the estimate
    // itself under the exact gate. A query missing an oracle now is an
    // accidental gap in the correctness gate.
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"queries missing an oracle: $noOracle")
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

  test("as-of join: attribution never exceeds purchase count") {
    val df = ops.Analytics.asofJoin(spark, sf)
    assert(df.filter(col("n_attributed") > col("n_purchases")).count() == 0)
  }

  test("exact median lies within the group's value range") {
    val med = ops.Analytics.medianExact(spark, sf)
    val rng = Tables
      .orders(spark, sf)
      .groupBy(col("o_orderpriority"))
      .agg(min(col("o_totalprice")).as("lo"), max(col("o_totalprice")).as("hi"))
    val bad = med
      .join(rng, "o_orderpriority")
      .filter(col("median_price") < col("lo") || col("median_price") > col("hi"))
      .count()
    assert(bad == 0)
  }

  test("grouping sets: grand total row equals table count") {
    val gs = ops.Analytics.groupingSets(spark, sf)
    val grand = gs
      .filter(col("gid") === 3)
      .select(col("n"))
      .first()
      .getLong(0)
    assert(grand == Tables.orders(spark, sf).count())
  }

  test("range join pairs only within the hour band") {
    // invariant proxy: every (error, click) pair is same-user and the
    // aggregate never counts more errors than exist for that user
    val rj = ops.Analytics.rangeJoin(spark, sf)
    val errCounts = Tables
      .events(spark, sf)
      .filter(col("event_type") === "error")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_err"))
    val bad = rj
      .join(errCounts, "user_id")
      .filter(col("n_errors_followed") > col("n_err"))
      .count()
    assert(bad == 0)
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

  test("embedding dim guard fails loudly on a mis-dimensioned collection") {
    // the guard exists because lshBucket/FloatVecDot would otherwise
    // silently truncate to min(dim) and return wrong buckets/cosines
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_baddim").toString
    Seq((0L, Array(1.0f, 2.0f, 3.0f), "a"), (1L, Array(4.0f, 5.0f, 6.0f), "a"))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val ex = intercept[Exception] {
      ops.Embeddings.embedStats(spark, dir).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(
      messages(ex).exists(_.contains("embedding dim must be 64")),
      s"unexpected failure: $ex")
  }

  test("hash split is leakage-proof: identical texts always share a split") {
    // split is a pure function of md5(text), so byte-identical documents
    // can never straddle the train/val/test boundary — the sf0.001
    // corpus carries no byte-identical texts, so duplicates are INJECTED
    // (a full re-delivery of half the corpus) to make the property bite
    val bucket = graft.functions.Hashing.h32(7, col("text")) % 100
    val docs = Tables.documents(spark, sf)
    val withDups = docs.unionAll(docs.limit(250))
    val assigned = withDups
      .select(
        md5(col("text")).as("h"),
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
          .as("split"))
    val worst = assigned
      .groupBy(col("h"))
      .agg(countDistinct(col("split")).as("n_splits"), count(lit(1)).as("n"))
      .agg(max(col("n_splits")).as("worst"), max(col("n")).as("max_dup"))
      .collect()(0)
    assert(worst.getLong(0) == 1L, "a text appeared in more than one split")
    assert(worst.getLong(1) >= 2L, "corpus has no exact duplicates — vacuous test")
  }
}
