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
}
