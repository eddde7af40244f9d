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

  test("TokenWindowFp == interpreted polynomial twin on the corpus + degenerate inputs") {
    // the native exact-substring kernel must produce the identical
    // numbers as the spelled-out fold (the same definition the DuckDB
    // twin evaluates): th = fold(ascii, a*31+c mod P), wh = fold over
    // the window's th values. Spot-check per-doc aggregates on the real
    // corpus plus the degenerate shapes (short doc -> one window over
    // all tokens, empty array -> fingerprint 0, null -> no rows).
    val P = Hashing.FpPrime
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), Hashing.tokens(col("text")).as("toks"))
      .localCheckpoint() // twin must see the SAME token arrays, once
    val viaGen = docs
      .select(col("doc_id"), Hashing.tokenWindowFp(col("toks"), 20).as("wh"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), min(col("wh")).as("mn"),
        max(col("wh")).as("mx"), sum(col("wh")).as("s"))
    val th = transform(col("toks"), t =>
      aggregate(
        transform(sequence(lit(1), length(t)), i => ascii(substring(t, i, lit(1)))),
        lit(0L),
        (a, c) => pmod(a * lit(31L) + c.cast("long"), lit(P))))
    val viaHof = docs
      .select(col("doc_id"), th.as("th"))
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), greatest(size(col("th")) - 19, lit(1))),
        i => aggregate(
          slice(col("th"), i, lit(20)),
          lit(0L),
          (a, x) => pmod(a * lit(31L) + x, lit(P))))).as("wh"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), min(col("wh")).as("mn"),
        max(col("wh")).as("mx"), sum(col("wh")).as("s"))
    assert(viaGen.exceptAll(viaHof).isEmpty && viaHof.exceptAll(viaGen).isEmpty)
    assert(viaGen.count() > 0)
    val s0 = spark
    import s0.implicits._
    val edge = Seq(
      (1L, Seq("ab", "cd")),                  // < win -> one window
      (2L, Seq.empty[String]),                // empty -> fingerprint 0
      (3L, null.asInstanceOf[Seq[String]]))   // null -> no rows
      .toDF("id", "toks")
    val got = edge
      .select(col("id"), Hashing.tokenWindowFp(col("toks"), 20).as("wh"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val thAb = ("ab".foldLeft(0L)((a, c) => (a * 31 + c) % P))
    val thCd = ("cd".foldLeft(0L)((a, c) => (a * 31 + c) % P))
    val w1 = ((thAb % P) * 31 + thCd) % P
    assert(got == Seq((1L, w1), (2L, 0L)))
  }

  test("generator emits its rows inside a Generate node (planned as UDTF)") {
    val plan = Tables
      .documents(spark, sf)
      .select(Hashing.ngramShingles(lower(col("text")), 3).as("sh"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Generate"), s"no Generate node:\n$plan")
  }
}
