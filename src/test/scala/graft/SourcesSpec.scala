package graft

import graft.functions.{ScoredId, TopKAgg}
import graft.sources.Formats
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** CSV/JSON source round-trips (explicit schemas, stable timestamp
  * format) and the typed bounded-buffer top-k Aggregator vs its
  * window-based twin.
  */
class SourcesSpec extends SparkSpec {

  private def roundTrip(
      name: String,
      write: (org.apache.spark.sql.DataFrame, String) => Unit,
      read: (org.apache.spark.sql.SparkSession, String,
        org.apache.spark.sql.types.StructType) => org.apache.spark.sql.DataFrame)
      : Unit = {
    val dir = Files.createTempDirectory(s"graft_$name").toString
    val orig = Tables.orders(spark, sf)
    write(orig, dir)
    val back = read(spark, dir, orig.schema)
    assert(back.schema == orig.schema)
    assert(back.count() == orig.count())
    // value-exact: anti-join in both directions is empty
    assert(back.exceptAll(orig).count() == 0)
    assert(orig.exceptAll(back).count() == 0)
  }

  test("CSV round-trip preserves schema, rows and values (incl. timestamps)") {
    roundTrip("csv", Formats.writeCsv, Formats.readCsv)
  }

  test("JSON round-trip preserves schema, rows and values (incl. timestamps)") {
    roundTrip("json", Formats.writeJson, Formats.readJson)
  }

  test("Avro round-trip preserves schema, rows and values (micros-long timestamps)") {
    // the Avro sink's documented discipline: timestamps export as
    // epoch-micros longs; everything else round-trips natively
    val dir = Files.createTempDirectory("graft_avro").toString
    val orig = Tables
      .orders(spark, sf)
      .select(
        col("o_orderkey"),
        col("o_custkey"),
        col("o_orderstatus"),
        col("o_totalprice"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("o_orderdate_us"))
    Formats.writeAvro(orig, dir)
    val back = Formats.readAvro(spark, dir, orig.schema)
    assert(back.schema == orig.schema)
    assert(back.count() == orig.count())
    assert(back.exceptAll(orig).count() == 0)
    assert(orig.exceptAll(back).count() == 0)
  }

  test("zstd parquet write really compresses with ZSTD (footer codec check) and round-trips") {
    val dir = Files.createTempDirectory("graft_zstd").toString
    val orig = Tables.orders(spark, sf)
    Formats.writeParquet(orig, dir, "zstd")
    // an unavailable codec silently falling back to snappy would still
    // pass a value compare — the footer is the honest witness
    assert(
      Formats.parquetCodecs(spark, dir) == Set("ZSTD"),
      s"column chunks not ZSTD: ${Formats.parquetCodecs(spark, dir)}")
    val back = spark.read.schema(orig.schema).parquet(dir)
    assert(back.count() == orig.count())
    assert(back.exceptAll(orig).count() == 0)
    assert(orig.exceptAll(back).count() == 0)
  }

  test("Avro sink rejects unsupported column types loudly, never silently coerces") {
    val e = intercept[IllegalArgumentException] {
      Formats.avroSchemaFor(Tables.orders(spark, sf).schema, "X")
    }
    assert(e.getMessage.contains("o_orderdate"))
  }

  test("ORC round-trip preserves schema, rows and values; filters push to the scan") {
    roundTrip("orc", Formats.writeOrc, Formats.readOrc)
    val dir = Files.createTempDirectory("graft_orc_pd").toString
    Formats.writeOrc(Tables.orders(spark, sf), dir)
    val filtered = Formats
      .readOrc(spark, dir, Tables.orders(spark, sf).schema)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderpriority), EqualTo(o_orderpriority,1-URGENT)]")
      || plan.contains("o_orderpriority"), s"no pushdown evidence:\n$plan")
    assert(filtered.count() > 0)
  }

  test("partitioned parquet write enables partition pruning at the scan") {
    val dir = Files.createTempDirectory("graft_part").toString
    Tables
      .events(spark, sf)
      .write
      .mode("overwrite")
      .partitionBy("event_type")
      .parquet(dir)
    val pruned = spark.read
      .parquet(dir)
      .filter(col("event_type") === "purchase")
    pruned.collect()
    val plan = pruned.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(
      plan.contains("PartitionFilters: [") &&
        plan.contains("event_type"),
      s"no partition filter at the scan:\n$plan")
    // value check: pruned read equals filtered full read
    val expect = Tables
      .events(spark, sf)
      .filter(col("event_type") === "purchase")
      .count()
    assert(pruned.count() == expect)
  }

  test("PERMISSIVE JSON reads quarantine corrupt records instead of failing the scan") {
    // At 100 TB a handful of malformed records must never kill the job:
    // PERMISSIVE mode (the default) nulls the bad row and captures the
    // raw text in the corrupt-record column for quarantine/audit.
    val dir = java.nio.file.Files.createTempDirectory("graft_corrupt").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/part.json"),
      """{"id": 1, "v": 10.0}
        |not json at all
        |{"id": 2, "v": "not-a-double"}
        |{"id": 3, "v": 30.0}
        |""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("_corrupt_record", org.apache.spark.sql.types.StringType)))
    val df = spark.read.schema(schema).json(dir).cache()
    try {
      assert(df.count() == 4)
      val good = df.filter(col("_corrupt_record").isNull)
      val bad = df.filter(col("_corrupt_record").isNotNull)
      assert(good.count() == 2) // ids 1 and 3
      assert(bad.count() == 2) // the raw garbage line + the type-mismatch line
      assert(good.agg(sum(col("v"))).collect()(0).getDouble(0) == 40.0)
    } finally df.unpersist()
  }

  test("range-partitioned sorted write yields disjoint per-file key ranges (layout for pruning)") {
    // The data-layout lever at 100 TB: repartitionByRange + sort gives
    // every output file a disjoint key range, so parquet footer min/max
    // stats let a point/range read skip all but one file (row-group
    // skipping inside files works the same way).
    val dir = java.nio.file.Files.createTempDirectory("graft_layout").toString
    Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("value"))
      .repartitionByRange(8, col("user_id"))
      .sortWithinPartitions(col("user_id"), col("event_id"))
      .write.mode("overwrite").parquet(dir)
    val ranges = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min(col("user_id")).as("lo"), max(col("user_id")).as("hi"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(ranges.length > 1, "expected multiple output files")
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"overlapping file key ranges: $ranges")
      case _ =>
    }
  }

  test("compaction shrinks a fragmented table without changing its content") {
    // the streaming-ingest hangover: a micro-batch sink leaves dozens of
    // KB files; compact() must cut the file count to the byte-sized
    // target and keep every row bit-identical
    val frag = java.nio.file.Files.createTempDirectory("graft_frag").toString
    val out = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val src = Tables
      .events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    src.repartition(32).write.mode("overwrite").parquet(frag)
    val (nIn, nOut) =
      ops.Layout.compact(spark, frag, out, targetBytes = 4L * 1024 * 1024)
    assert(nIn == 32, s"fragmented write produced $nIn files")
    assert(nOut < nIn / 4, s"compaction left $nOut files from $nIn")
    val a = spark.read.parquet(frag)
    val b = spark.read.parquet(out)
    assert(b.count() == a.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "compaction changed table content")

    // actual-files contract: the reported output count is what's on disk
    val onDisk = new java.io.File(out)
      .listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(nOut == onDisk, s"compact reported $nOut files, disk holds $onDisk")

    // a partitioned ROOT (subdirs, no top-level data files) must be
    // refused — compacting it would flatten the partition layout
    val partRoot = java.nio.file.Files.createTempDirectory("graft_part").toString
    src.limit(100).write.partitionBy("event_type").mode("overwrite").parquet(partRoot)
    val err = intercept[IllegalArgumentException] {
      ops.Layout.compact(spark, partRoot, out + "_p", targetBytes = 4L * 1024 * 1024)
    }
    assert(err.getMessage.contains("partition"))
  }

  test("TopKAgg == window-based top-k on brute-force similarity pairs") {
    val s = spark
    import s.implicits._
    // per event_type: top-3 event ids by value (deterministic tie-break)
    val scored = Tables
      .events(spark, sf)
      .select(col("event_type"), col("value"), col("event_id"))
      .as[(String, Double, Long)]
    val viaAgg = scored
      .groupByKey(_._1)
      .mapValues(t => ScoredId(t._2, t._3))
      .agg(TopKAgg(3).toColumn.name("ids"))
      .collect()
      .toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("event_id").asc)
    val viaWindow = Tables
      .events(spark, sf)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .orderBy(col("event_type"), col("rn"))
      .select(col("event_type"), col("event_id"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (k, rows) => k -> rows.map(_.getLong(1)).toSeq }
    assert(viaAgg == viaWindow)
  }

  test("corrupt parquet part file: loud failure by default, auditable skip on opt-in") {
    // a torn write / bad disk block in ONE of a table's thousands of
    // files must not silently poison the read. Default: the scan FAILS.
    // With spark.sql.files.ignoreCorruptFiles the intact files' rows
    // survive — an explicit, documented trade the operator opts into.
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_corrupt").toString
    val half1 = Tables.nation(spark, sf).filter(col("n_nationkey") < 13)
    val half2 = Tables.nation(spark, sf).filter(col("n_nationkey") >= 13)
    half1.coalesce(1).write.mode("overwrite").parquet(s"$dir/p1")
    half2.coalesce(1).write.mode("overwrite").parquet(s"$dir/p2")
    val table = java.nio.file.Paths.get(s"$dir/t")
    java.nio.file.Files.createDirectories(table)
    val p1 = new java.io.File(s"$dir/p1").listFiles
      .filter(_.getName.endsWith(".parquet")).head
    val p2 = new java.io.File(s"$dir/p2").listFiles
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(p1.toPath, table.resolve("part-good.parquet"))
    // truncate the second file mid-body: valid magic, torn footer
    val bytes = java.nio.file.Files.readAllBytes(p2.toPath)
    java.nio.file.Files.write(
      table.resolve("part-torn.parquet"),
      java.util.Arrays.copyOf(bytes, bytes.length / 2))
    val schema = half1.schema
    intercept[Exception] {
      spark.read.schema(schema).parquet(table.toString).count()
    }
    val survived = spark.read
      .schema(schema)
      .option("ignoreCorruptFiles", "true") // per-read opt-in
      .parquet(table.toString)
    assert(survived.count() == 13L, "intact file's rows must survive")
    assert(
      survived.agg(max(col("n_nationkey"))).head().getAs[Number](0).longValue == 12L,
      "rows from the torn file leaked into the result")
  }
}
