package graft

import java.nio.file.Files
import java.sql.Date

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.GraftMergeScan
import graft.streaming.MergeSink

/** Time/date-partitioned merge tables: the two-level
  * p=<period>/b=<bucket> layout encoded as `partIdx * nb + hash % nb`.
  * Pins: layout identity (spec immutable after first commit, transform
  * column must be a key column), merge correctness across partitions,
  * partition pruning on pushed time predicates (manifest-level, before
  * any file), point-lookup pruning to ONE (partition, bucket) pair,
  * drop_partitions as a metadata-only commit with time travel across
  * it, and compaction preserving the partition dimension.
  */
class PartitionedTableSpec extends SparkSpec {

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  /** (day, id, v) rows with rv as seq; day is a DATE key column. */
  private def df(rows: Seq[(String, Long, Long)], rv: Long): DataFrame = {
    val s = spark
    import s.implicits._
    rows.map { case (d, id, v) => (Date.valueOf(d), id, v) }
      .toDF("day", "id", "v").withColumn("rv", lit(rv))
  }

  private def newTable(nb: Int = 4): String = {
    val t = tmp("part_tbl")
    MergeSink.setPartitionSpec(spark, t, "day", "day", nb)
    t
  }

  private def read(t: String): DataFrame =
    spark.read.format("graft-merge")
      .option("path", t).option("key", "day,id").option("seq", "rv").load()

  test("partitioned upsert: global bucket ids encode the day; merge stays per-key") {
    val t = newTable(nb = 4)
    MergeSink.upsertBatch(
      df(Seq(("2024-01-10", 1L, 10L), ("2024-01-10", 2L, 20L),
        ("2024-01-11", 1L, 30L)), 1L),
      t, "day,id", "rv", 0L, "load")
    // day index is intrinsic: 2024-01-10 = epochDay 19732
    val d10 = java.time.LocalDate.parse("2024-01-10").toEpochDay.toInt
    val d11 = d10 + 1
    val m = MergeSink.manifest(spark, t, 0L)
    assert(m.keySet.forall(b =>
      Math.floorDiv(b, 4) == d10 || Math.floorDiv(b, 4) == d11),
      s"bucket ids must encode the day index: ${m.keySet}")
    assert(m.keySet.map(Math.floorDiv(_, 4)).toSet == Set(d10, d11))
    // upsert the same (day, id) key: latest-wins, no duplicate
    MergeSink.upsertBatch(
      df(Seq(("2024-01-10", 1L, 99L)), 2L), t, "day,id", "rv", 1L, "load")
    val got = read(t).select("day", "id", "v").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("2024-01-10", 1L, 99L), ("2024-01-10", 2L, 20L),
      ("2024-01-11", 1L, 30L)))
  }

  test("point lookup derives the partitioned global bucket id (not the bare hash)") {
    val t = newTable(nb = 4)
    MergeSink.upsertBatch(
      df(Seq(("2024-01-10", 1L, 10L), ("2024-01-10", 2L, 20L),
        ("2024-01-11", 1L, 30L)), 1L),
      t, "day,id", "rv", 0L, "load")
    // the key tuple carries the partition value; the lookup must land
    // on bucket partIdx*nb + hash%nb — the bare hash would miss every
    // bucket and silently answer "absent" for a present key
    val hit = MergeSink.pointLookupTuples(
      spark, t, "day,id", Seq(Seq(Date.valueOf("2024-01-11"), 1L)))
    assert(hit.isDefined, "a present key must be found on a partitioned table")
    val rows = hit.get.select("day", "id", "v").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSet
    assert(rows == Set(("2024-01-11", 1L, 30L)))
    // and exactly ONE (partition, bucket) pair's files are read
    val files = MergeSink.lookupFilesTuples(
      spark, t, Seq(Seq(Date.valueOf("2024-01-11"), 1L)), "day,id")
    assert(files.size == 1, s"lookup must prune to one bucket: $files")
    // an absent key stays absent (impossible-bucket guard, not a crash)
    assert(MergeSink.pointLookupTuples(
      spark, t, "day,id", Seq(Seq(Date.valueOf("2030-06-01"), 1L))).isEmpty)
  }

  test("the partition spec is layout identity: immutable after commit, col must be a key") {
    val t = newTable()
    MergeSink.upsertBatch(df(Seq(("2024-01-10", 1L, 10L)), 1L),
      t, "day,id", "rv", 0L, "load")
    intercept[IllegalArgumentException] {
      MergeSink.setPartitionSpec(spark, t, "month", "day", 8)
    }
    // transform column outside the merge key rejects before staging
    val t2 = tmp("part_badkey")
    MergeSink.setPartitionSpec(spark, t2, "day", "day", 4)
    intercept[IllegalArgumentException] {
      MergeSink.upsertBatch(df(Seq(("2024-01-10", 1L, 10L)), 1L),
        t2, "id", "rv", 0L, "load")
    }
    // a NULL partition value fails the write loudly, commits nothing
    val t3 = tmp("part_null")
    MergeSink.setPartitionSpec(spark, t3, "day", "day", 4)
    val s = spark
    import s.implicits._
    val withNull = Seq((null: Date, 1L, 10L)).toDF("day", "id", "v")
      .withColumn("rv", lit(1L))
    intercept[Exception] {
      MergeSink.upsertBatch(withNull, t3, "day,id", "rv", 0L, "load")
    }
    assert(MergeSink.commits(spark, t3).isEmpty)
  }

  test("a pushed day-range predicate prunes whole partitions at the manifest") {
    val t = newTable(nb = 4)
    val rows = (0 until 20).flatMap { d =>
      val day = java.time.LocalDate.parse("2024-01-01").plusDays(d).toString
      (0 until 8).map(i => (day, d * 100L + i, i.toLong))
    }
    MergeSink.upsertBatch(df(rows, 1L), t, "day,id", "rv", 0L, "load")
    // range read: 3 of 20 days
    GraftMergeScan.lastPrune.set(null)
    val got = read(t)
      .filter(col("day") >= lit(Date.valueOf("2024-01-05")) &&
        col("day") <= lit(Date.valueOf("2024-01-07")))
      .agg(count(lit(1))).head().getLong(0)
    assert(got == 24L)
    val (planned, total, _) = GraftMergeScan.lastPrune.get()
    assert(total > planned && planned <= 3 * 4,
      s"3 of 20 days must plan <= 12 bucket files, planned $planned/$total")
    // point lookup on the full key prunes to ONE (partition, bucket)
    GraftMergeScan.lastPrune.set(null)
    val one = read(t)
      .filter(col("day") === lit(Date.valueOf("2024-01-03")) &&
        col("id") === 204L)
      .collect()
    assert(one.length == 1 && one.head.getAs[Long]("v") == 4L)
    val (p2, t2, _) = GraftMergeScan.lastPrune.get()
    assert(p2 == 1, s"full-key point read must plan exactly 1 file, got $p2/$t2")
  }

  test("drop_partitions is a metadata commit; the dropped snapshot time-travels") {
    val t = newTable(nb = 2)
    MergeSink.setHistoryKeep(spark, t, 8)
    val rows = (0 until 10).flatMap { d =>
      val day = java.time.LocalDate.parse("2024-01-01").plusDays(d).toString
      (0 until 4).map(i => (day, d * 100L + i, i.toLong))
    }
    MergeSink.upsertBatch(df(rows, 1L), t, "day,id", "rv", 0L, "load")
    val preCount = read(t).count()
    val preEntries = MergeSink.manifest(spark, t, 0L).size
    val dataDirsBefore = {
      val p = new org.apache.hadoop.fs.Path(t, "data")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .listStatus(p).length
    }
    // retire everything before 2024-01-05 (4 of 10 days)
    val dropped = MergeSink.dropPartitions(spark, t, "lt", "2024-01-05")
    assert(dropped == 4 * 2, s"4 days x 2 buckets, dropped $dropped")
    assert(MergeSink.commits(spark, t).map(_.version) == Seq(0L, 1L))
    assert(MergeSink.manifest(spark, t, 1L).size == preEntries - dropped)
    assert(read(t).count() == preCount - 4 * 4)
    assert(read(t).agg(min(col("day"))).head().getDate(0)
      .toString == "2024-01-05")
    // METADATA only: no data dir was touched by the drop commit
    val dataDirsAfter = {
      val p = new org.apache.hadoop.fs.Path(t, "data")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .listStatus(p).length
    }
    assert(dataDirsAfter == dataDirsBefore,
      "drop_partitions must not move or delete data")
    // the pre-drop snapshot still answers in full
    val v0 = spark.read.format("graft-merge")
      .option("path", t).option("key", "day,id").option("seq", "rv")
      .option("versionAsOf", "0").load()
    assert(v0.count() == preCount)
    // idempotent second drop: nothing matches, no commit minted
    assert(MergeSink.dropPartitions(spark, t, "lt", "2024-01-05") == 0)
    assert(MergeSink.commits(spark, t).map(_.version) == Seq(0L, 1L))
  }

  test("compaction preserves the partition dimension and its pruning") {
    val t = newTable(nb = 4)
    val rows = (0 until 6).flatMap { d =>
      val day = java.time.LocalDate.parse("2024-02-01").plusDays(d).toString
      (0 until 6).map(i => (day, d * 100L + i, i.toLong))
    }
    MergeSink.upsertBatch(df(rows, 1L), t, "day,id", "rv", 0L, "load")
    // rebucket 4 -> 2 per partition
    assert(MergeSink.compact(spark, t, "day,id", 2) > 0)
    val m = MergeSink.manifest(spark, t, 1L)
    val d0 = java.time.LocalDate.parse("2024-02-01").toEpochDay.toInt
    assert(m.keySet.map(Math.floorDiv(_, 2)).forall(pi =>
      pi >= d0 && pi < d0 + 6), s"compacted ids must stay partitioned: ${m.keySet}")
    // pruning still works against the compacted layout
    GraftMergeScan.lastPrune.set(null)
    assert(read(t)
      .filter(col("day") === lit(Date.valueOf("2024-02-03")))
      .count() == 6L)
    val (planned, total, _) = GraftMergeScan.lastPrune.get()
    assert(planned <= 2 && planned < total,
      s"one day of six must plan <= 2 of $total files, planned $planned")
    assert(read(t).count() == 36L)
  }

  test("partition-spec evolution: days -> hours, both generations prune, upserts migrate") {
    val s = spark
    import s.implicits._
    val t = tmp("part_evolve")
    MergeSink.setHistoryKeep(spark, t, 8)
    MergeSink.setPartitionSpec(spark, t, "day", "ts", 2)
    def rows(day: Int, v: Long): DataFrame =
      (0 until 24).map { i =>
        (java.sql.Timestamp.valueOf(f"2024-01-0$day%d $i%02d:15:00"),
          i.toLong, v)
      }.toDF("ts", "id", "v").withColumn("rv", lit(v))
    MergeSink.upsertBatch(rows(1, 1L), t, "ts,id", "rv", 0L, "w")
    MergeSink.upsertBatch(rows(2, 2L), t, "ts,id", "rv", 1L, "w")
    val headBefore = MergeSink.lastCommit(spark, t).get.version
    val off = MergeSink.evolvePartitionSpec(spark, t, "hour", 2)
    assert(off > 0)
    // the evolution pins itself as a schema-only commit
    assert(MergeSink.lastCommit(spark, t).get.version == headBefore + 1)
    // new data lands under hours(ts); old days stay in their layout
    MergeSink.upsertBatch(rows(3, 3L), t, "ts,id", "rv", 2L, "w")
    val m = MergeSink.manifest(
      spark, t, MergeSink.lastCommit(spark, t).get.version)
    assert(m.keySet.exists(_ < off) && m.keySet.exists(_ >= off),
      s"both generations must hold buckets (offset $off, ids ${m.keySet})")
    def readEv(): DataFrame = spark.read.format("graft-merge")
      .option("path", t).option("key", "ts,id").option("seq", "rv").load()
    assert(readEv().count() == 72)
    // the RETIRED generation prunes at day granularity
    GraftMergeScan.lastPrune.set(null)
    assert(readEv().filter(
      col("ts") < lit(java.sql.Timestamp.valueOf("2024-01-02 00:00:00")))
      .count() == 24)
    val p1 = GraftMergeScan.lastPrune.get()
    assert(p1._1 < p1._2, s"old-generation prune: ${p1._1}/${p1._2}")
    // the CURRENT generation prunes at hour granularity — finer than
    // any day bucket could
    GraftMergeScan.lastPrune.set(null)
    assert(readEv().filter(
      col("ts") >= lit(java.sql.Timestamp.valueOf("2024-01-03 12:00:00")))
      .count() == 12)
    val p2 = GraftMergeScan.lastPrune.get()
    assert(p2._1 < p2._2, s"new-generation prune: ${p2._1}/${p2._2}")
    // point lookups find keys in BOTH generations (one candidate
    // bucket per generation)
    val oldKey = Seq(java.sql.Timestamp.valueOf("2024-01-01 05:15:00"), 5L)
    val newKey = Seq(java.sql.Timestamp.valueOf("2024-01-03 07:15:00"), 7L)
    assert(MergeSink.pointLookupTuples(spark, t, "ts,id", Seq(oldKey))
      .get.count() == 1)
    assert(MergeSink.pointLookupTuples(spark, t, "ts,id", Seq(newKey))
      .get.count() == 1)
    // an upsert touching an old-generation key migrates its whole
    // bucket to the current layout: no duplicates, seq still wins
    MergeSink.upsertBatch(
      Seq((java.sql.Timestamp.valueOf("2024-01-01 05:15:00"), 5L, 99L))
        .toDF("ts", "id", "v").withColumn("rv", lit(9L)),
      t, "ts,id", "rv", 3L, "w")
    val st = readEv().collect()
    assert(st.length == 72, "migration must not duplicate or lose rows")
    assert(st.count(r => r.getLong(1) == 5L && r.getLong(2) == 99L) == 1)
    // time travel to the pre-evolution snapshot decodes the day layout
    val tt = spark.read.format("graft-merge")
      .option("path", t).option("key", "ts,id").option("seq", "rv")
      .option("versionAsOf", headBefore.toString).load()
    assert(tt.count() == 48)
    // full compaction migrates every remaining retired bucket — the
    // state a storage-partitioned join is allowed to co-locate on again
    MergeSink.compact(spark, t, "ts,id", 2)
    val mc = MergeSink.manifest(
      spark, t, MergeSink.lastCommit(spark, t).get.version)
    assert(mc.keySet.forall(_ >= off),
      s"compaction must migrate everything to the current generation " +
        s"(offset $off, ids ${mc.keySet})")
    assert(readEv().count() == 72)
    GraftMergeScan.lastPrune.set(null)
    assert(readEv().filter(
      col("ts") >= lit(java.sql.Timestamp.valueOf("2024-01-01 20:00:00")) &&
        col("ts") < lit(java.sql.Timestamp.valueOf("2024-01-02 00:00:00")))
      .count() == 4)
    val p3 = GraftMergeScan.lastPrune.get()
    assert(p3._1 < p3._2,
      s"post-compact hour pruning over migrated day-1 rows: ${p3._1}/${p3._2}")
  }

  test("SQL end to end: PARTITIONED BY (days(day)), pruned SELECT, CALL drop_partitions") {
    val cat = "pcat"
    val wh = tmp("pcat_wh")
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE $cat.p")
    spark.sql(
      s"""CREATE TABLE $cat.p.facts (day DATE, id BIGINT, v BIGINT, rv BIGINT)
         |USING `graft-merge`
         |PARTITIONED BY (days(day))
         |OPTIONS (key 'day,id', seq 'rv', buckets '2')""".stripMargin)
    spark.sql(s"CALL $cat.sys.set_history_keep('p.facts', 8)")
    spark.sql(
      s"""INSERT INTO $cat.p.facts
         |SELECT date_add(DATE '2024-03-01', CAST(x AS INT)), id, x * 10 + id, 1
         |FROM (SELECT explode(sequence(0, 9)) AS x)
         |LATERAL VIEW explode(sequence(0L, 3L)) AS id""".stripMargin)
    assert(spark.table(s"$cat.p.facts").count() == 40L)
    // the partition transform is visible on the table
    assert(spark.sql(s"SHOW TBLPROPERTIES $cat.p.facts")
      .collect().exists(r => r.getString(0) == "partition" &&
        r.getString(1) == "day(day)"))
    // pruned range SELECT
    GraftMergeScan.lastPrune.set(null)
    val two = spark.sql(
      s"""SELECT count(*) FROM $cat.p.facts
         |WHERE day BETWEEN DATE '2024-03-02' AND DATE '2024-03-03'
         |""".stripMargin).head().getLong(0)
    assert(two == 8L)
    val (planned, total, _) = GraftMergeScan.lastPrune.get()
    assert(planned <= 4 && planned < total,
      s"2 of 10 days must plan <= 4 of $total files, planned $planned")
    // retention as SQL: drop the first 5 days, metadata-only
    val dropped = spark.sql(
      s"CALL $cat.sys.drop_partitions('p.facts', 'lt', '2024-03-06')")
      .head().getInt(0)
    // <= 2 non-empty buckets per day (4 ids may hash into one)
    assert(dropped >= 5 && dropped <= 5 * 2,
      s"5 days x (1..2) buckets, got $dropped")
    assert(spark.table(s"$cat.p.facts").count() == 20L)
    // time travel across the drop
    assert(spark.sql(
      s"SELECT count(*) FROM $cat.p.facts VERSION AS OF 0")
      .head().getLong(0) == 40L)
    // REPLACE cannot change the layout
    val e = intercept[Exception] {
      spark.sql(
        s"""REPLACE TABLE $cat.p.facts
           |(day DATE, id BIGINT, v BIGINT, rv BIGINT)
           |USING `graft-merge`
           |PARTITIONED BY (months(day))
           |OPTIONS (key 'day,id', seq 'rv')""".stripMargin)
    }
    assert(e.getMessage.contains("physical identity") ||
      Option(e.getCause).exists(_.getMessage.contains("physical identity")))
  }
}
