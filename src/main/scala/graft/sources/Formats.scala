package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface beyond parquet: CSV and JSON-lines, always with
  * EXPLICIT schemas on read (schema inference costs a full extra pass
  * over the data and types drift between runs — at 100 TB both are
  * unacceptable; the reference's analogue is its fixed block layout,
  * /root/reference/src/opusdb/memory/page.clj:16-38: readers never guess
  * the shape).
  *
  * Timestamps round-trip via an explicit ISO-8601 micros pattern so
  * CSV/JSON text forms are stable across engines and sessions (UTC is
  * pinned session-wide in build.sbt).
  */
object Formats {

  private val TsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write
      .mode("overwrite")
      .option("header", "true")
      .option("timestampFormat", TsFmt)
      .csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("timestampFormat", TsFmt)
      .csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write
      .mode("overwrite")
      .option("timestampFormat", TsFmt)
      .json(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("timestampFormat", TsFmt)
      .json(path)

  /** ORC: the other columnar format with footer statistics + predicate
    * pushdown — same explicit-schema discipline (binary formats carry
    * their schema, but pinning it keeps reader behavior contractual).
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)
}
