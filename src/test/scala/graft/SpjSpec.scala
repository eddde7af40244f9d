package graft

import org.apache.spark.sql.DataFrame

import graft.sources.GraftCatalog

/** Storage-partitioned joins beyond the single-BIGINT-key layout:
  * composite keys (hash layout declared with `bucket_by` — Spark''s SPJ
  * machinery only accepts single-reference transforms, so the joint
  * hash stays UnknownPartitioning) and partitioned tables (the Iceberg
  * multi-transform shape `[days(col), bucket(nb, col)]`). Each test pins the shuffle-free
  * plan AND a correct answer, plus the shuffled fallbacks (conf off /
  * mismatched layouts) that must never co-partition wrongly.
  */
class SpjSpec extends SparkSpec {

  private val n = new java.util.concurrent.atomic.AtomicInteger()

  private def freshCatalog(): String = {
    val cat = s"gspjt${n.incrementAndGet()}"
    val wh = java.nio.file.Files.createTempDirectory(s"graft_wh_$cat").toString
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE $cat.db")
    cat
  }

  private val spjConfs = Seq(
    "spark.sql.sources.v2.bucketing.enabled" -> "true",
    "spark.sql.v2.bucketing.pushPartValues.enabled" -> "true",
    // a bucket_by layout co-partitions on a SUBSET of the join keys
    // (bucket(k1) serves a join on k1 AND k2) — stock Spark gates that
    // behind this conf (default true = partition keys must cover all
    // cluster keys)
    "spark.sql.requireAllClusterKeysForCoPartition" -> "false",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.enabled" -> "false")

  private def withSpjConfs[A](body: => A): A = {
    val saved = spjConfs.map { case (k, _) => k -> spark.conf.getOption(k) }
    spjConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def shufflesOf(df: DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.size

  test("composite-key tables SPJ-join with zero shuffle") {
    val cat = freshCatalog()
    for ((t, m) <- Seq("ca" -> 1, "cb" -> 2)) {
      spark.sql(
        s"""CREATE TABLE $cat.db.$t (k1 BIGINT, k2 BIGINT, seq BIGINT, v DOUBLE)
           |USING `graft-merge` OPTIONS (key 'k1,k2', seq 'seq', bucket_by 'k1')""".stripMargin)
      spark.sql(
        s"""INSERT INTO $cat.db.$t
           |SELECT id % 40, id, 1L, id * $m.0 FROM range(400)""".stripMargin)
    }
    withSpjConfs {
      val j = spark.sql(
        s"""SELECT a.k1, a.k2, a.v, b.v AS w FROM $cat.db.ca a
           |JOIN $cat.db.cb b ON a.k1 = b.k1 AND a.k2 = b.k2""".stripMargin)
      assert(shufflesOf(j) == 0,
        s"composite-key SPJ did not engage:\n${j.queryExecution.executedPlan}")
      val got = j.collect()
      assert(got.length == 400)
      assert(got.forall(r => r.getDouble(3) == 2 * r.getDouble(2)))
      // join on a PARTIAL key cannot use the clustering (the bucket
      // hashes the whole tuple): falls back to a correct shuffled join
      val partial = spark.sql(
        s"""SELECT a.k1, count(*) AS c FROM $cat.db.ca a
           |JOIN $cat.db.cb b ON a.k2 = b.k2 GROUP BY a.k1""".stripMargin)
      assert(shufflesOf(partial) > 0,
        "partial-key join must not claim co-partitioning")
      assert(partial.collect().map(_.getLong(1)).sum == 400)
      // conf off: both sides shuffle
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      val off = spark.sql(
        s"""SELECT a.k1 FROM $cat.db.ca a
           |JOIN $cat.db.cb b ON a.k1 = b.k1 AND a.k2 = b.k2""".stripMargin)
      assert(shufflesOf(off) == 2)
    }
  }

  test("day-partitioned tables SPJ-join with zero shuffle") {
    val cat = freshCatalog()
    for ((t, m) <- Seq("fa" -> 1, "fb" -> 3)) {
      spark.sql(
        s"""CREATE TABLE $cat.db.$t (uid BIGINT, day DATE, seq BIGINT, v DOUBLE)
           |USING `graft-merge`
           |OPTIONS (key 'uid,day', seq 'seq', bucket_by 'uid')
           |PARTITIONED BY (days(day))""".stripMargin)
      spark.sql(
        s"""INSERT INTO $cat.db.$t
           |SELECT id % 50, date_add(DATE '2024-01-01', CAST(id % 7 AS INT)),
           |  1L, id * $m.0
           |FROM range(350)""".stripMargin)
    }
    withSpjConfs {
      val j = spark.sql(
        s"""SELECT a.uid, a.day, a.v, b.v AS w FROM $cat.db.fa a
           |JOIN $cat.db.fb b ON a.uid = b.uid AND a.day = b.day""".stripMargin)
      assert(shufflesOf(j) == 0,
        s"partitioned SPJ did not engage:\n${j.queryExecution.executedPlan}")
      val got = j.collect()
      assert(got.length == 350)
      assert(got.forall(r => r.getDouble(3) == 3 * r.getDouble(2)))
      // the clustering serves join + aggregate-on-key too
      val agg = spark.sql(
        s"""SELECT a.uid, a.day, sum(a.v + b.v) AS s FROM $cat.db.fa a
           |JOIN $cat.db.fb b ON a.uid = b.uid AND a.day = b.day
           |GROUP BY a.uid, a.day""".stripMargin)
      assert(shufflesOf(agg) == 0,
        s"partitioned SPJ join+agg re-shuffled:\n${agg.queryExecution.executedPlan}")
      assert(agg.count() == 350)
      // control: conf off -> both sides shuffle
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      val off = spark.sql(
        s"""SELECT a.uid FROM $cat.db.fa a
           |JOIN $cat.db.fb b ON a.uid = b.uid AND a.day = b.day""".stripMargin)
      assert(shufflesOf(off) == 2)
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      // control: a PARTITIONED side against an UNPARTITIONED side with
      // the same key — different physical groupings, must shuffle
      // (a wrong co-partitioned plan would silently drop matches)
      spark.sql(
        s"""CREATE TABLE $cat.db.fu (uid BIGINT, day DATE, seq BIGINT, u DOUBLE)
           |USING `graft-merge` OPTIONS (key 'uid,day', seq 'seq')""".stripMargin)
      spark.sql(
        s"""INSERT INTO $cat.db.fu
           |SELECT id % 50, date_add(DATE '2024-01-01', CAST(id % 7 AS INT)),
           |  1L, id * 5.0
           |FROM range(350)""".stripMargin)
      val mixed = spark.sql(
        s"""SELECT a.uid FROM $cat.db.fa a
           |JOIN $cat.db.fu u ON a.uid = u.uid AND a.day = u.day""".stripMargin)
      assert(shufflesOf(mixed) > 0,
        s"mismatched layouts must shuffle:\n${mixed.queryExecution.executedPlan}")
      assert(mixed.count() == 350)
    }
  }

  test("DATE identity partitioning reports days(col): SPJ zero-shuffle join") {
    val cat = freshCatalog()
    for ((t, m) <- Seq("ia" -> 1, "ib" -> 7)) {
      spark.sql(
        s"""CREATE TABLE $cat.db.$t (uid BIGINT, d DATE, seq BIGINT, v DOUBLE)
           |USING `graft-merge`
           |OPTIONS (key 'uid,d', seq 'seq', bucket_by 'uid')
           |PARTITIONED BY (d)""".stripMargin)
      spark.sql(
        s"""INSERT INTO $cat.db.$t
           |SELECT id, date_add(DATE '2024-03-01', CAST(id % 5 AS INT)),
           |  1L, id * $m.0
           |FROM range(250)""".stripMargin)
    }
    withSpjConfs {
      // identity over DATE groups by the int cast = epoch days, so the
      // scan reports days(d) — the same clustering a days() layout
      // reports, and the join runs shuffle-free
      val j = spark.sql(
        s"""SELECT a.uid, a.d, a.v, b.v AS w FROM $cat.db.ia a
           |JOIN $cat.db.ib b ON a.uid = b.uid AND a.d = b.d""".stripMargin)
      assert(shufflesOf(j) == 0,
        s"DATE identity SPJ did not engage:\n${j.queryExecution.executedPlan}")
      val got = j.collect()
      assert(got.length == 250)
      assert(got.forall(r => r.getDouble(3) == 7 * r.getDouble(2)))
    }
  }

  test("bucket_by lookups locate the hashed columns with and without a key list") {
    val MS = graft.streaming.MergeSink
    val s = spark
    import s.implicits._
    val df = (0L until 200L).map(i => (i % 10, i, 1L, i * 2.0))
      .toDF("k1", "k2", "seq", "v")
    // bucket_by a SUBSET of the composite key
    val dir = java.nio.file.Files.createTempDirectory("graft_spj_lkp").toString
    MS.setBucketBy(spark, dir, Seq("k2"))
    MS.upsertBatch(df, dir, "k1,k2", "seq", 0L, "w")
    val withKey =
      MS.lookupFilesTuples(spark, dir, Seq(Seq(3L, 13L)), key = "k1,k2")
    assert(withKey.nonEmpty)
    // no key list, arity == bucket_by arity: the values ARE the hashed
    // columns (the runtime-filter path's contract)
    assert(MS.lookupFilesTuples(spark, dir, Seq(Seq(13L))) == withKey)
    // the pruned bucket really holds the row
    val rows = MS.pointLookupTuples(spark, dir, "k1,k2", Seq(Seq(3L, 13L)))
      .get.collect()
    assert(rows.length == 1 && rows.head.getDouble(3) == 26.0)
    // no key list + arity matching neither contract: ambiguous — refuse
    intercept[IllegalArgumentException] {
      MS.lookupFilesTuples(spark, dir, Seq(Seq(3L, 13L)))
    }
    // composite bucket_by in NON-declared-key order: a key list resolves
    // positions; without one the tuple must arrive in bucket_by order —
    // and the ambiguous full-arity case (tuple size == bucket_by size ==
    // key size) resolves to the bucket_by-order reading
    val dir2 = java.nio.file.Files.createTempDirectory("graft_spj_lkp2").toString
    MS.setBucketBy(spark, dir2, Seq("k2", "k1"))
    MS.upsertBatch(df, dir2, "k1,k2", "seq", 0L, "w")
    val wk2 = MS.lookupFilesTuples(spark, dir2, Seq(Seq(3L, 13L)), key = "k1,k2")
    assert(wk2.nonEmpty)
    assert(MS.lookupFilesTuples(spark, dir2, Seq(Seq(13L, 3L))) == wk2)
    val rows2 = MS.pointLookupTuples(spark, dir2, "k1,k2", Seq(Seq(3L, 13L)))
      .get.collect()
    assert(rows2.length == 1 && rows2.head.getDouble(3) == 26.0)
  }

  test("hours-partitioned table round-trips and prunes") {
    val cat = freshCatalog()
    spark.sql(
      s"""CREATE TABLE $cat.db.hv (k BIGINT, ts TIMESTAMP, seq BIGINT, v DOUBLE)
         |USING `graft-merge` OPTIONS (key 'k,ts', seq 'seq')
         |PARTITIONED BY (hours(ts))""".stripMargin)
    spark.sql(
      s"""INSERT INTO $cat.db.hv
         |SELECT id, timestamp'2024-01-01 00:30:00' + make_interval(0,0,0,0,CAST(id % 6 AS INT),0,0),
         |  1L, id * 1.0 FROM range(120)""".stripMargin)
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.hv").head().getLong(0) == 120)
    // an hour-window predicate prunes to that hour's buckets, from the
    // manifest, before any file is touched
    graft.sources.GraftMergeScan.lastPrune.set(null)
    val one = spark.sql(
      s"""SELECT count(*) AS c FROM $cat.db.hv
         |WHERE ts >= timestamp'2024-01-01 02:00:00'
         |  AND ts < timestamp'2024-01-01 03:00:00'""".stripMargin)
      .head().getLong(0)
    assert(one == 20)
    val prune = graft.sources.GraftMergeScan.lastPrune.get()
    assert(prune != null && prune._1 < prune._2,
      s"hour window must prune partitions, planned $prune")
    // a STRING timestamp literal prunes too (the widened driver-side
    // parse): same window, pushed as strings
    graft.sources.GraftMergeScan.lastPrune.set(null)
    val viaStr = spark.sql(
      s"""SELECT count(*) AS c FROM $cat.db.hv
         |WHERE ts >= '2024-01-01 02:00:00' AND ts < '2024-01-01 03:00:00'""".stripMargin)
      .head().getLong(0)
    assert(viaStr == 20)
    val prune2 = graft.sources.GraftMergeScan.lastPrune.get()
    assert(prune2 == null || prune2._1 <= prune._1 || prune2._1 < prune2._2,
      s"string-literal hour window should prune, planned $prune2")
  }
}
