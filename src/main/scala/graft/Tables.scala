package graft

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Loaders for the driver-generated parquet testdata (TESTDATA.md).
  *
  * Each table is one parquet file per scale-factor directory. All reads go
  * through [[Tables.load]] so every query in the engine benefits from
  * Catalyst's parquet pushdown (PushedFilters / ReadSchema pruning) — the
  * scan is declared lazily and the optimizer prunes columns per query.
  *
  * Reference analogue: opusdb's only durable read path is the positioned
  * block read in /root/reference/src/opusdb/io/file_mgr.clj:58-70; here the
  * scan/source is the vectorized parquet reader.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Raw-LONG fallback schema for `events` when `ts` is physically
    * TIMESTAMP(NANOS) parquet, which Spark's vectorized reader rejects under
    * schema inference. Typing `ts` as LONG yields the raw nanos directly —
    * scoped to this read only (no session-wide legacy conf, no
    * order-dependent state, race-free under concurrent query builds).
    * Queries should still avoid emitting raw `ts` values to the oracle
    * compare (DuckDB keeps ns precision); derive coarser columns
    * (date_trunc, epoch secs).
    */
  private[graft] val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def eventsRaw(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(eventsSchema).parquet(s"$dir/events.parquet")

  /** Physical timestamp unit of `events.ts`, read from the parquet FOOTER —
    * never assumed. A real lake mixes MICROS and NANOS files, and the fixture
    * itself has switched units between regenerations; assuming the unit turns
    * a physical-schema change into 30 silently-wrong query results. The
    * reference derives block size from the file manager's own config instead
    * of hardcoding it (/root/reference/src/opusdb/io/file_mgr.clj:48-50) —
    * the analogous discipline here is "ask the footer".
    *
    * One footer read per (path) per JVM: O(KB) metadata I/O, cached, and the
    * same pattern a 1000-executor job uses (driver-side footer probe, not a
    * per-task read).
    */
  private val tsUnitCache =
    new java.util.concurrent.ConcurrentHashMap[String, TimeUnit]()

  private[graft] def eventsTsUnit(spark: SparkSession, dir: String): TimeUnit =
    tsUnitCache.computeIfAbsent(s"$dir/events.parquet", { key: String =>
      val conf = spark.sessionState.newHadoopConf()
      val root = new Path(key)
      val fs = root.getFileSystem(conf)
      // events.parquet may be a single file or a directory of part files.
      val dataFile =
        if (fs.getFileStatus(root).isFile) root
        else fs.listStatus(root).map(_.getPath)
          .filter(p => p.getName.endsWith(".parquet") && !p.getName.startsWith("_"))
          .headOption.getOrElse(root)
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(dataFile, conf))
      try {
        val schema = reader.getFooter.getFileMetaData.getSchema
        schema.getType(schema.getFieldIndex("ts")).asPrimitiveType()
          .getLogicalTypeAnnotation match {
          case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation => t.getUnit
          // No timestamp annotation (plain INT64 / INT96): let Spark's native
          // reader interpret it — treat as MICROS here so we take that path.
          case _ => TimeUnit.MICROS
        }
      } finally reader.close()
    })

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    eventsTsUnit(s, d) match {
      case TimeUnit.NANOS =>
        // Vectorized reader rejects TIMESTAMP(NANOS): read raw LONG nanos and
        // integral-divide — ns ≈ 1.7e18 exceeds double's 53-bit mantissa, so
        // a floating `/ 1000` would corrupt the low-order digits.
        eventsRaw(s, d).withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        // MICROS / MILLIS: the native reader handles the decode. The footer's
        // isAdjustedToUTC=false makes Spark infer TIMESTAMP_NTZ; cast to the
        // session-tz TimestampType every consumer (windows, watermarks,
        // oracle compares) was built against — a no-op wall-clock-wise under
        // the engine's fixed UTC session timezone.
        load(s, d, "events").withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
