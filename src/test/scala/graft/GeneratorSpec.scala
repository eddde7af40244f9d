package graft

import graft.functions.Hashing
import org.apache.spark.sql.functions._

/** Custom Generator (UDTF) contract: NGramShingles must be ROW-IDENTICAL
  * to `explode(shingles(c, n))` — including the degenerate cases (string
  * shorter than n → one whole-string shingle; empty string → one empty
  * shingle; NULL → no rows) — so a query can swap the streamed generator
  * for the HOF pipeline without perturbing the DuckDB-oracle compare.
  */
class GeneratorSpec extends SparkSpec {

  test("NGramShingles == explode(shingles), row-for-row, on the corpus") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), lower(col("text")).as("t"))
    val viaGen = docs
      .select(col("doc_id"), Hashing.ngramShingles(col("t"), 3).as("sh"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), countDistinct(col("sh")).as("d"),
           min(col("sh")).as("mn"), max(col("sh")).as("mx"))
    val viaHof = docs
      .select(col("doc_id"), explode(Hashing.shingles(col("t"), 3)).as("sh"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), countDistinct(col("sh")).as("d"),
           min(col("sh")).as("mn"), max(col("sh")).as("mx"))
    assert(viaGen.exceptAll(viaHof).isEmpty && viaHof.exceptAll(viaGen).isEmpty)
    assert(viaGen.count() > 0)
  }

  test("NGramShingles degenerate inputs: short, empty, null") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "ab"),   // shorter than n=3 → one shingle "ab"
      (2L, ""),     // empty → one empty shingle
      (3L, null.asInstanceOf[String]), // null → no rows
      (4L, "abcd")  // → "abc", "bcd"
    ).toDF("id", "t")
    val rows = df
      .select(col("id"), Hashing.ngramShingles(col("t"), 3).as("sh"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .toSeq
      .sorted
    assert(rows == Seq((1L, "ab"), (2L, ""), (4L, "abc"), (4L, "bcd")))
  }

  test("NGramShingles counts codepoints, not bytes, on multibyte input") {
    val s = spark
    import s.implicits._
    // é = 2 bytes, 汉 = 3 bytes, 𐍈 = 4 bytes (one codepoint each)
    val df = Seq((1L, "aé汉𐍈b")).toDF("id", "t")
    val got = df
      .select(Hashing.ngramShingles(col("t"), 3).as("sh"))
      .collect()
      .map(_.getString(0))
      .toSeq
    assert(got == Seq("aé汉", "é汉𐍈", "汉𐍈b"))
    // and stays identical to the HOF pipeline on the same input
    val viaHof = df
      .select(explode(Hashing.shingles(col("t"), 3)).as("sh"))
      .collect()
      .map(_.getString(0))
      .toSeq
    assert(got == viaHof)
  }

  test("generator emits its rows inside a Generate node (planned as UDTF)") {
    val plan = Tables
      .documents(spark, sf)
      .select(Hashing.ngramShingles(lower(col("text")), 3).as("sh"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Generate"), s"no Generate node:\n$plan")
  }
}
