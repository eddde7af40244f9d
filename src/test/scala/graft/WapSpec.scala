package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.MergeSink

/** Write-audit-publish and named tags: staged commits are invisible
  * until one atomic file create, audit reads the complete future
  * state, abort is byte-identical rollback, stale stages lose their
  * lease loudly, and `VERSION AS OF '<tag>'` resolves through refs —
  * on the library surface and through SQL (session wapId + CALL
  * procedures).
  */
class WapSpec extends SparkSpec {

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  private def df(rows: Seq[(Long, Long)], rv: Long): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "v").withColumn("rv", lit(rv))
  }

  private def ids(d: DataFrame): Set[Long] =
    d.select("id").collect().map(_.getLong(0)).toSet

  test("stage is invisible; audit sees the future state; publish is atomic") {
    val t = tmp("wap_basic")
    MergeSink.upsertBatch(df(Seq((1L, 10L), (2L, 20L)), 1L),
      t, "id", "rv", 0L, "load")
    val staged = MergeSink.wapStage(
      df(Seq((3L, 30L), (2L, 25L)), 2L), t, "id", "rv", "batch2")
    assert(staged == 1L)
    // invisible everywhere a reader looks
    assert(MergeSink.commits(spark, t).map(_.version) == Seq(0L))
    assert(ids(MergeSink.currentState(spark, t).get) == Set(1L, 2L))
    // audit = head + staged rows (carried buckets included)
    val audit = MergeSink.wapAudit(spark, t, "batch2").get
    assert(ids(audit) == Set(1L, 2L, 3L))
    assert(audit.filter(col("id") === 2L).head().getLong(1) == 25L)
    // publish: one commit point, then ordinary history
    assert(MergeSink.wapPublish(spark, t, "batch2") == 1L)
    assert(MergeSink.commits(spark, t).map(_.version) == Seq(0L, 1L))
    assert(ids(MergeSink.currentState(spark, t).get) == Set(1L, 2L, 3L))
    // wap bookkeeping drained
    assert(MergeSink.wapAudit(spark, t, "batch2").isEmpty)
  }

  test("abort rolls the stage back byte-identically") {
    val t = tmp("wap_abort")
    MergeSink.upsertBatch(df(Seq((1L, 10L)), 1L), t, "id", "rv", 0L, "load")
    val before = MergeSink.currentFiles(spark, t)
    MergeSink.wapStage(df(Seq((9L, 90L)), 2L), t, "id", "rv", "bad")
    MergeSink.wapAbort(spark, t, "bad")
    assert(MergeSink.commits(spark, t).map(_.version) == Seq(0L))
    assert(MergeSink.currentFiles(spark, t) == before)
    // the reserved version is free again: a normal commit takes v1
    MergeSink.upsertBatch(df(Seq((2L, 20L)), 2L), t, "id", "rv", 1L, "load",
      reRegister = true)
    assert(MergeSink.commits(spark, t).map(_.version) == Seq(0L, 1L))
    assert(ids(MergeSink.currentState(spark, t).get) == Set(1L, 2L))
  }

  test("a staged wap reserves the next version against concurrent writers") {
    val t = tmp("wap_reserve")
    MergeSink.setHistoryKeep(spark, t, 8)
    MergeSink.upsertBatch(df(Seq((1L, 10L)), 1L), t, "id", "rv", 0L, "load")
    MergeSink.wapStage(df(Seq((2L, 20L)), 2L), t, "id", "rv", "hold")
    intercept[MergeSink.ConcurrentCommitException] {
      MergeSink.upsertBatch(df(Seq((3L, 30L)), 2L), t, "id", "rv", 1L, "other",
        reRegister = true)
    }
    MergeSink.wapPublish(spark, t, "hold")
    // released: the other writer lands at v2
    MergeSink.upsertBatch(df(Seq((3L, 30L)), 3L), t, "id", "rv", 1L, "other",
      reRegister = true)
    assert(MergeSink.commits(spark, t).map(_.version) == Seq(0L, 1L, 2L))
  }

  test("a stage that outlived its lease and was overtaken fails to publish") {
    val t = tmp("wap_stale")
    MergeSink.setHistoryKeep(spark, t, 8)
    MergeSink.upsertBatch(df(Seq((1L, 10L)), 1L), t, "id", "rv", 0L, "load")
    MergeSink.wapStage(df(Seq((2L, 20L)), 2L), t, "id", "rv", "stale")
    // age the claim past the TTL; another writer steals and commits v1
    val p = new org.apache.hadoop.fs.Path(t)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.setTimes(new org.apache.hadoop.fs.Path(p, "_claim_v1"),
      System.currentTimeMillis() - 16L * 60L * 1000L, -1L)
    MergeSink.upsertBatch(df(Seq((3L, 30L)), 2L), t, "id", "rv", 1L, "other",
      reRegister = true)
    assert(MergeSink.commits(spark, t).map(_.version) == Seq(0L, 1L))
    val e = intercept[MergeSink.ConcurrentCommitException] {
      MergeSink.wapPublish(spark, t, "stale")
    }
    assert(e.getMessage.contains("overtaken"))
    // nothing half-published; abort clears the leftovers
    assert(ids(MergeSink.currentState(spark, t).get) == Set(1L, 3L))
    MergeSink.wapAbort(spark, t, "stale")
    assert(ids(MergeSink.currentState(spark, t).get) == Set(1L, 3L))
  }

  test("tags: create/list/drop, validation, and versionAsOf resolution") {
    val t = tmp("wap_tags")
    MergeSink.setHistoryKeep(spark, t, 8)
    MergeSink.upsertBatch(df(Seq((1L, 10L)), 1L), t, "id", "rv", 0L, "load")
    MergeSink.upsertBatch(df(Seq((2L, 20L)), 2L), t, "id", "rv", 1L, "load")
    MergeSink.createTag(spark, t, "v1-audited", 0L)
    assert(MergeSink.tags(spark, t) == Map("v1-audited" -> 0L))
    // immutable until dropped
    intercept[IllegalArgumentException] {
      MergeSink.createTag(spark, t, "v1-audited", 1L)
    }
    // name and version validation
    intercept[IllegalArgumentException] {
      MergeSink.createTag(spark, t, "123", 0L) // looks like a version
    }
    intercept[IllegalArgumentException] {
      MergeSink.createTag(spark, t, "nope", 99L) // not committed
    }
    // VERSION AS OF '<tag>' through the connector read option
    val atTag = spark.read.format("graft-merge")
      .option("path", t).option("key", "id").option("seq", "rv")
      .option("versionAsOf", "v1-audited").load()
    assert(ids(atTag) == Set(1L))
    assert(MergeSink.dropTag(spark, t, "v1-audited"))
    val e = intercept[Exception] {
      spark.read.format("graft-merge")
        .option("path", t).option("key", "id").option("seq", "rv")
        .option("versionAsOf", "v1-audited").load().collect()
    }
    assert(e.getMessage.contains("neither a version number nor a tag"))
  }

  test("SQL surface: session wapId stages INSERTs; CALL publishes; tags travel") {
    val cat = "wapspec"
    val wh = tmp("wap_cat_wh")
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE $cat.w")
    spark.sql(
      s"""CREATE TABLE $cat.w.t (id BIGINT, v BIGINT, rv BIGINT)
         |USING `graft-merge` OPTIONS (key 'id', seq 'rv')""".stripMargin)
    spark.sql(s"INSERT INTO $cat.w.t VALUES (1, 10, 1), (2, 20, 1)")
    spark.conf.set("spark.graft.wapId", "nightly")
    try {
      spark.sql(s"INSERT INTO $cat.w.t VALUES (3, 30, 2)")
      // staged, not visible
      assert(spark.table(s"$cat.w.t").count() == 2L)
      // overwrite under wap rejected loudly
      val e = intercept[Exception] {
        spark.sql(s"INSERT OVERWRITE $cat.w.t VALUES (9, 90, 9)")
      }
      assert(e.getMessage.contains("wap"))
    } finally spark.conf.unset("spark.graft.wapId")
    assert(spark.sql(s"CALL $cat.sys.wap_publish('w.t', 'nightly')")
      .head().getInt(0) == 1)
    assert(spark.table(s"$cat.w.t").count() == 3L)
    // tag the published snapshot; time travel by name through SQL
    assert(spark.sql(s"CALL $cat.sys.create_tag('w.t', 'after-nightly', 1)")
      .head().getInt(0) == 1)
    // tags are discoverable through the .refs metadata table
    assert(spark.sql(s"SELECT name, version, retained FROM $cat.w.t.refs")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
      .toSeq == Seq(("after-nightly", 1L, true)))
    spark.sql(s"INSERT INTO $cat.w.t VALUES (4, 40, 3)")
    assert(spark.sql(
      s"SELECT count(*) FROM $cat.w.t VERSION AS OF 'after-nightly'")
      .head().getLong(0) == 3L)
    assert(spark.sql(s"CALL $cat.sys.drop_tag('w.t', 'after-nightly')")
      .head().getInt(0) == 1)
    // a staged-then-aborted wap leaves no trace
    spark.conf.set("spark.graft.wapId", "oops")
    try spark.sql(s"INSERT INTO $cat.w.t VALUES (5, 50, 4)")
    finally spark.conf.unset("spark.graft.wapId")
    assert(spark.table(s"$cat.w.t").count() == 4L)
    assert(spark.sql(s"CALL $cat.sys.wap_abort('w.t', 'oops')")
      .head().getInt(0) == 1)
    spark.sql(s"INSERT INTO $cat.w.t VALUES (6, 60, 5)")
    assert(spark.table(s"$cat.w.t").count() == 5L)
    assert(ids(spark.table(s"$cat.w.t")) == Set(1L, 2L, 3L, 4L, 6L))
  }

  test("multi-table WAP: stage two tables, audit both, publish atomically") {
    val a = tmp("wap_txn_a")
    val b = tmp("wap_txn_b")
    val txn = tmp("wap_txn_log")
    MergeSink.upsertBatch(df(Seq((1L, 10L)), 1L), a, "id", "rv", 0L, "load")
    MergeSink.upsertBatch(df(Seq((1L, -10L)), 1L), b, "id", "rv", 0L, "load")
    val staged = MergeSink.stageTransaction(spark, txn, Seq(
      MergeSink.TxnWrite(a, "id", "rv", df(Seq((2L, 20L)), 2L)),
      MergeSink.TxnWrite(b, "id", "rv", df(Seq((2L, -20L)), 2L))),
      "nightly2")
    assert(staged.toMap == Map(a -> 1L, b -> 1L))
    // nothing visible anywhere
    assert(MergeSink.commits(spark, a).map(_.version) == Seq(0L))
    assert(MergeSink.commits(spark, b).map(_.version) == Seq(0L))
    // audit each participant's complete future state
    assert(ids(MergeSink.wapAudit(spark, a, "nightly2").get) == Set(1L, 2L))
    assert(ids(MergeSink.wapAudit(spark, b, "nightly2").get) == Set(1L, 2L))
    // ONE publish makes both visible
    val pub = MergeSink.publishTransaction(spark, txn, Seq(a, b), "nightly2")
    assert(pub.toMap == Map(a -> 1L, b -> 1L))
    assert(MergeSink.commits(spark, a).map(_.version) == Seq(0L, 1L))
    assert(MergeSink.commits(spark, b).map(_.version) == Seq(0L, 1L))
    // conservation across the published pair
    val total = MergeSink.currentState(spark, a).get
      .unionByName(MergeSink.currentState(spark, b).get)
      .agg(sum("v")).head().getLong(0)
    assert(total == 0L)
  }

  test("multi-table WAP: abort rolls every participant back") {
    val a = tmp("wap_txa_a")
    val b = tmp("wap_txa_b")
    val txn = tmp("wap_txa_log")
    MergeSink.upsertBatch(df(Seq((1L, 10L)), 1L), a, "id", "rv", 0L, "load")
    MergeSink.stageTransaction(spark, txn, Seq(
      MergeSink.TxnWrite(a, "id", "rv", df(Seq((2L, 20L)), 2L)),
      MergeSink.TxnWrite(b, "id", "rv", df(Seq((2L, -20L)), 2L))),
      "bad2")
    MergeSink.abortTransaction(spark, txn, Seq(a, b), "bad2")
    assert(MergeSink.commits(spark, a).map(_.version) == Seq(0L))
    assert(MergeSink.commits(spark, b).isEmpty)
    // both tables writable again at the released versions
    MergeSink.upsertBatch(df(Seq((3L, 30L)), 3L), a, "id", "rv", 1L, "load",
      reRegister = true)
    assert(MergeSink.commits(spark, a).map(_.version) == Seq(0L, 1L))
  }

  test("an overtaken participant fails publishTransaction BEFORE the commit point") {
    val a = tmp("wap_txo_a")
    val b = tmp("wap_txo_b")
    val txn = tmp("wap_txo_log")
    MergeSink.setHistoryKeep(spark, a, 8)
    MergeSink.upsertBatch(df(Seq((1L, 10L)), 1L), a, "id", "rv", 0L, "load")
    MergeSink.upsertBatch(df(Seq((1L, -10L)), 1L), b, "id", "rv", 0L, "load")
    MergeSink.stageTransaction(spark, txn, Seq(
      MergeSink.TxnWrite(a, "id", "rv", df(Seq((2L, 20L)), 2L)),
      MergeSink.TxnWrite(b, "id", "rv", df(Seq((2L, -20L)), 2L))),
      "stale2")
    // age participant a's claim past the TTL; a concurrent writer
    // steals and commits v1 there
    val p = new org.apache.hadoop.fs.Path(a)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.setTimes(new org.apache.hadoop.fs.Path(p, "_claim_v1"),
      System.currentTimeMillis() - 16L * 60L * 1000L, -1L)
    MergeSink.upsertBatch(df(Seq((3L, 30L)), 2L), a, "id", "rv", 1L, "other",
      reRegister = true)
    assert(MergeSink.commits(spark, a).map(_.version) == Seq(0L, 1L))
    // publish must fail LOUDLY before creating the txn file — trusting
    // the stale pending would mint two conflicting markers for a's v1
    val e = intercept[MergeSink.ConcurrentCommitException] {
      MergeSink.publishTransaction(spark, txn, Seq(a, b), "stale2")
    }
    assert(e.getMessage.contains("overtaken"))
    // no commit point happened: b is untouched, a serves the winner
    assert(MergeSink.commits(spark, b).map(_.version) == Seq(0L))
    assert(ids(MergeSink.currentState(spark, a).get) == Set(1L, 3L))
    // abort clears the leftovers WITHOUT touching the winner's v1
    MergeSink.abortTransaction(spark, txn, Seq(a, b), "stale2")
    assert(ids(MergeSink.currentState(spark, a).get) == Set(1L, 3L))
    assert(ids(MergeSink.currentState(spark, b).get) == Set(1L))
  }

  test("a publish crashed after its commit point completes via vacuum") {
    val t = tmp("wap_crash")
    MergeSink.upsertBatch(df(Seq((1L, 10L)), 1L), t, "id", "rv", 0L, "load")
    MergeSink.wapStage(df(Seq((2L, 20L)), 2L), t, "id", "rv", "torn")
    // simulate the crash: the atomic commit point happened (wap file
    // exists) but promotion never ran
    val p = new org.apache.hadoop.fs.Path(t)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val wf = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(p, "_wap"), "torn")
    fs.mkdirs(wf.getParent)
    fs.create(wf, false).close()
    // the instant the file exists, the staged version IS committed —
    // readers resolve it with no promotion needed
    assert(MergeSink.commits(spark, t).map(_.version) == Seq(0L, 1L))
    assert(ids(MergeSink.currentState(spark, t).get) == Set(1L, 2L))
    // vacuum folds the pending into a direct marker and (once aged past
    // the lease) sweeps the orphaned wap file
    fs.setTimes(wf, System.currentTimeMillis() - 16L * 60L * 1000L, -1L)
    MergeSink.vacuum(spark, t)
    assert(MergeSink.commits(spark, t).map(_.version) == Seq(0L, 1L))
    assert(!fs.exists(wf), "orphaned wap file must be swept")
    assert(fs.listStatus(p).forall(
      !_.getPath.getName.startsWith("_pending_")),
      "pending must have been promoted")
    assert(ids(MergeSink.currentState(spark, t).get) == Set(1L, 2L))
  }
}
