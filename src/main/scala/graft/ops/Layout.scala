package graft.ops

import graft.Tables
import graft.plans.ZOrder2
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Data-layout operators: multi-dimensional clustering for scan
  * pruning.
  *
  * At 100 TB the cheapest predicate is the one that never reads a
  * file: parquet footers carry per-file min/max stats, and a z-order
  * clustered write makes those stats selective in EVERY clustered
  * dimension at once — a plain sort helps only its leading column.
  * [[ZOrder2]] (plans/ZOrder.scala) is the clustering key expression;
  * this module is the layout pass a table-maintenance job runs before
  * writing (`df.repartitionByRange(z).sortWithinPartitions(z)
  * .write...`).
  *
  * Reference analogue: opusdb pages its heap into fixed blocks and
  * scans them sequentially (/root/reference/src/opusdb/storage/
  * page.clj:40, file_mgr.clj:58) — clustering is the analytic dual:
  * choose what lives together in a block so most blocks need not be
  * read.
  */
object Layout {
  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------------
  // q_zorder_layout — the z-order clustering demonstrated and gated:
  // orders bucketed on (order day × 26, total price / 8) — both
  // scaled to FILL [0, 2^16) (a dimension parked in the low bits never
  // reaches the interleave's high bits and gets no clustering) —
  // interleaved with the native zorder2 expression, grouped
  // into the 256 top-byte z-ranges a layout pass would write as files.
  // The gate hash-checks, per z-range, the row count and the min/max of
  // BOTH dimensions: exactly the footer stats a pruned scan would
  // consult, proving every "file" covers a narrow rectangle in day ×
  // price space (the DuckDB twin recomputes the identical interleave
  // arithmetically). A locality-breaking bug — wrong bit order, lost
  // mask — moves rows across z-ranges and fails the hash.
  // ---------------------------------------------------------------------
  val zorderLayout: Q = (s, d) => {
    // testdata ranges: o_orderdate in [1995-01-01, 2001-08-01] (2404
    // days; ×26 tops out at 62504) and o_totalprice < 500k (÷8 tops
    // out at 62499) — both scaled to fill [0, 2^16)
    val o = Tables.orders(s, d).select(
      (datediff(col("o_orderdate"), to_date(lit("1995-01-01")))
        .cast("long") * 26L).as("dayb"),
      floor(col("o_totalprice") / 8.0).cast("long").as("priceb"))
    o.withColumn("z", ZOrder2.zorder(col("dayb"), col("priceb")))
      .groupBy(expr("z div 16777216").as("zrange"))
      .agg(
        count(lit(1)).as("n"),
        min(col("dayb")).as("day_min"),
        max(col("dayb")).as("day_max"),
        min(col("priceb")).as("price_min"),
        max(col("priceb")).as("price_max"))
      .orderBy(col("zrange"))
  }

  val zorderLayoutSql: String = {
    val z = ZOrder2.sqlZOrder("dayb", "priceb")
    s"""WITH b AS (
       |  SELECT CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) * 26 AS dayb,
       |    CAST(floor(o_totalprice / 8.0) AS BIGINT) AS priceb
       |  FROM orders)
       |SELECT $z // 16777216 AS zrange, count(*) AS n,
       |min(dayb) AS day_min, max(dayb) AS day_max,
       |min(priceb) AS price_min, max(priceb) AS price_max
       |FROM b GROUP BY zrange ORDER BY zrange""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q_partition_prune — HIVE-style partitioned layout under the oracle
  // gate: events written `partitionBy(event_type)`, read back with a
  // partition predicate. Unlike row-group stats pruning (PushedFilters,
  // q_filter_pushdown), partition pruning removes whole DIRECTORIES at
  // planning time — at 100 TB the difference between listing 1/5 of
  // the files and reading footers for all of them. PlanSpec asserts
  // the predicate lands in the scan's PartitionFilters; the gate
  // proves the partition-encoded column (it leaves the data files and
  // comes back from directory names) survives value-exactly, hour
  // buckets and cents sums intact.
  // ---------------------------------------------------------------------
  private lazy val partitionedEventsDir: String =
    graft.sources.Formats.roundtripDir("part_events")

  /** Write (overwrite) the Hive-partitioned events copy; returns its
    * directory. Shared by the static (q_partition_prune) and dynamic
    * (q_dpp_join) pruning gates.
    */
  private def writePartitionedEvents(s: SparkSession, d: String): String = {
    val tmp = partitionedEventsDir
    Tables
      .events(s, d)
      .select(
        col("event_id"),
        col("user_id"),
        col("event_type"),
        col("value"),
        unix_micros(col("ts")).as("t_us"))
      .write
      .mode("overwrite")
      .partitionBy("event_type")
      .parquet(tmp)
    tmp
  }

  /** The partitioned copy + filtered read-back, exposed for PlanSpec. */
  def prunedScan(s: SparkSession, d: String): DataFrame = {
    val tmp = writePartitionedEvents(s, d)
    s.read
      .parquet(tmp)
      .filter(col("event_type").isin("purchase", "error"))
  }

  val partitionPrune: Q = (s, d) => {
    prunedScan(s, d)
      .groupBy(col("event_type"), expr(s"t_us div ${3600L * 1000000L}").as("hour_idx"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("d_users"),
        sum(round(col("value") * 100).cast("long")).as("cents_total"))
      .orderBy(col("event_type"), col("hour_idx"))
  }

  val partitionPruneSql: String =
    s"""SELECT event_type, epoch_us(ts) // ${3600L * 1000000L} AS hour_idx,
       |count(*) AS n, count(DISTINCT user_id) AS d_users,
       |CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents_total
       |FROM events WHERE event_type IN ('purchase', 'error')
       |GROUP BY event_type, hour_idx
       |ORDER BY event_type, hour_idx""".stripMargin

  /** Small-file COMPACTION — the OPTIMIZE maintenance job every
    * streaming ingest needs: micro-batch sinks and per-executor writes
    * fragment a table into thousands of KB-scale files, and at 100 TB
    * the scan cost becomes file-listing + footer reads, not data. One
    * pass: size the target file count from the actual input bytes,
    * round-robin repartition (uniform output sizes), rewrite. Returns
    * (input files, output files). Content equality and the file-count
    * drop are pinned in SourcesSpec; on a partitioned table run it
    * per-partition directory so pruning layout survives.
    */
  def compact(
      s: SparkSession,
      dir: String,
      out: String,
      targetBytes: Long): (Long, Long) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val entries = fs.listStatus(p)
    val dataFiles =
      entries.filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    // A Hive-partitioned root has subdirectories and no data files at
    // the top level. Compacting it here would size from totalBytes=0
    // AND flatten the partition layout — refuse instead of corrupting;
    // run compact() per partition directory.
    if (dataFiles.isEmpty && entries.exists(e =>
        e.isDirectory && !e.getPath.getName.startsWith("_")))
      throw new IllegalArgumentException(
        s"compact: $dir holds subdirectories but no top-level data files " +
          "(partitioned table root?) — compact each partition directory instead")
    val totalBytes = dataFiles.map(_.getLen).sum
    val nOut =
      math.max(1L, math.ceil(totalBytes.toDouble / targetBytes).toLong)
    s.read
      .parquet(dir)
      .repartition(nOut.toInt)
      .write
      .mode("overwrite")
      .parquet(out)
    // report files actually written, not the requested partition count
    // (empty partitions write no file; AQE could also change the count)
    val written = fs
      .listStatus(new org.apache.hadoop.fs.Path(out))
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .toLong
    (dataFiles.length.toLong, written)
  }

  // ---------------------------------------------------------------------
  // q_dpp_join — DYNAMIC partition pruning under the oracle gate: the
  // partitioned events fact joined to a filtered event-type dimension
  // on the PARTITION column. Unlike q_partition_prune's static
  // predicate, here the pruning values are only known at runtime (they
  // come out of the dim filter), so Catalyst injects a dynamicpruning
  // subquery into the fact scan's PartitionFilters — reusing the dim's
  // broadcast exchange — and the fact side lists only the matching
  // directories. At 100 TB this is THE star-join staple: a date-dim
  // filter pruning a date-partitioned fact without the user repeating
  // the predicate on the fact. PlanSpec asserts the dynamicpruning
  // expression lands in PartitionFilters; this gate pins the VALUES.
  //
  // The dim is written to parquet first — a file-backed scan, so the
  // optimizer sees a real dim table, not a constant-foldable local
  // relation (same discipline as the codegen gates, ROUND6_NOTES).
  // ---------------------------------------------------------------------
  private lazy val typeDimDir: String =
    graft.sources.Formats.roundtripDir("type_dim")

  private val typeDimRows: Seq[(String, String)] = Seq(
    "click" -> "engagement",
    "error" -> "ops",
    "purchase" -> "conversion",
    "signup" -> "conversion",
    "view" -> "engagement")

  /** Fact ⋈ filtered dim on the partition column, exposed for
    * PlanSpec's dynamicpruning assertion.
    */
  def dppJoin(s: SparkSession, d: String): DataFrame = {
    val factDir = writePartitionedEvents(s, d)
    val dimDir = typeDimDir
    import s.implicits._
    typeDimRows
      .toDF("event_type", "category")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(dimDir)
    val fact = s.read.parquet(factDir)
    val dim = s.read.parquet(dimDir).filter(col("category") === "conversion")
    fact.join(dim, "event_type")
  }

  val dppJoinQuery: Q = (s, d) => {
    dppJoin(s, d)
      .groupBy(col("category"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("d_users"),
        sum(round(col("value") * 100).cast("long")).as("cents_total"))
      .orderBy(col("category"), col("event_type"))
  }

  val dppJoinSql: String = {
    val dimValues = typeDimRows
      .map { case (t, c) => s"('$t', '$c')" }
      .mkString(", ")
    s"""WITH dim(event_type, category) AS (VALUES $dimValues)
       |SELECT dim.category, e.event_type, count(*) AS n,
       |count(DISTINCT e.user_id) AS d_users,
       |CAST(SUM(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT)
       |  AS cents_total
       |FROM events e JOIN dim ON e.event_type = dim.event_type
       |WHERE dim.category = 'conversion'
       |GROUP BY dim.category, e.event_type
       |ORDER BY dim.category, e.event_type""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "q_zorder_layout" -> zorderLayout,
    "q_partition_prune" -> partitionPrune,
    "q_dpp_join" -> dppJoinQuery)

  val oracleSql: Map[String, String] = Map(
    "q_zorder_layout" -> zorderLayoutSql,
    "q_partition_prune" -> partitionPruneSql,
    "q_dpp_join" -> dppJoinSql)
}
