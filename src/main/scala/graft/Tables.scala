package graft

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

  /** `events.ts` is physically TIMESTAMP(NANOS) parquet, which Spark's
    * vectorized reader rejects under schema inference. Reading with an
    * explicit user schema typing `ts` as LONG yields the raw nanos
    * directly — scoped to this read only (no session-wide legacy conf, no
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
