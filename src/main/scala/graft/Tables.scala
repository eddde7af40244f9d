package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  /** `events.ts` is physically TIMESTAMP(NANOS) parquet, which Spark's
    * vectorized reader rejects. Read it as raw nanos (legacy conf) and
    * convert to Spark's native microsecond TimestampType. Queries should
    * still avoid emitting raw `ts` values to the oracle compare (DuckDB
    * keeps ns precision); derive coarser columns (date_trunc, epoch secs).
    */
  private def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw = eventsRaw(s, d)
    // integral div: ns ≈ 1.7e18 exceeds double's 53-bit mantissa, so a
    // floating `/ 1000` would corrupt the low-order digits.
    raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
