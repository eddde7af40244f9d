package graft

import graft.plans.DamerauLevenshtein
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Contract of the native unrestricted Damerau-Levenshtein expression.
  *
  * The value vectors below were produced by DuckDB's
  * `damerau_levenshtein` (the oracle that gates q_damerau), including
  * the variant discriminator ("ca","abc") = 2 — the restricted
  * optimal-string-alignment variant would answer 3, so a variant
  * mismatch fails here in milliseconds instead of as an oracle red.
  */
class DamerauSpec extends SparkSpec {

  // (a, b, DuckDB damerau_levenshtein(a, b))
  private val vectors: Seq[(String, String, Int)] = Seq(
    ("", "", 0),
    ("a", "", 1),
    ("", "a", 1),
    ("ca", "abc", 2),
    ("ab", "ba", 1),
    ("kitten", "sitting", 3),
    ("a", "bbba", 3),
    ("aedaaabb", "eaebedbd", 6),
    ("abdc", "bbca", 3),
    ("d", "c", 1),
    ("ecade", "d", 4),
    ("e", "eceb", 3),
    ("a", "cab", 2),
    ("d", "dcbc", 3),
    ("bcaeb", "bbddcebc", 5),
    ("", "acd", 3),
    ("abec", "ddd", 4),
    ("cb", "eec", 3),
    ("edcbbe", "aaabbde", 4),
    ("d", "edecea", 5),
    ("e", "cacd", 4),
    ("da", "ebea", 3),
    ("eebb", "beeae", 3),
    ("daacc", "abe", 4),
    ("a", "aebbdeb", 6),
    ("eedb", "bcdcdeda", 6),
    ("bac", "", 3),
    ("bebaaaba", "", 8),
    ("aebcd", "ebe", 3),
    ("bddbaad", "dddaa", 3),
    ("recieve", "receive", 1))

  test("static kernel matches the DuckDB value vectors") {
    vectors.foreach { case (a, b, want) =>
      val got = DamerauLevenshtein.distance(
        UTF8String.fromString(a),
        UTF8String.fromString(b))
      assert(got == want, s"""distance("$a", "$b") = $got, want $want""")
    }
  }

  test("distance is symmetric and bounded by Levenshtein") {
    import spark.implicits._
    val df = vectors.map { case (a, b, _) => (a, b) }.toDF("a", "b")
    val rows = df
      .select(
        DamerauLevenshtein.damerau(col("a"), col("b")).as("ab"),
        DamerauLevenshtein.damerau(col("b"), col("a")).as("ba"),
        levenshtein(col("a"), col("b")).as("lev"))
      .collect()
    rows.foreach { r =>
      assert(r.getInt(0) == r.getInt(1), "not symmetric")
      assert(r.getInt(0) <= r.getInt(2), "exceeds Levenshtein")
      // a transposition models two substitutions at worst: DL >= lev/2
      assert(2 * r.getInt(0) >= r.getInt(2), "below the lev/2 floor")
    }
  }

  test("SQL registration and codegen participation") {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    Seq(("ca", "abc")).toDF("a", "b").createOrReplaceTempView("dl_probe")
    val viaSql =
      spark.sql("SELECT damerau_levenshtein(a, b) FROM dl_probe").first().getInt(0)
    assert(viaSql == 2)
    // plan over a real scan — a literal local relation constant-folds
    // the expression away before it can reach codegen
    val plan = Tables
      .documents(spark, sf)
      .select(
        DamerauLevenshtein
          .damerau(substring(col("text"), 1, 8), col("source"))
          .as("d"))
      .queryExecution
      .executedPlan
      .toString
    assert(
      plan.contains("*(1) Project [damerau_levenshtein"),
      s"damerau_levenshtein not inside a codegen stage:\n$plan")
    spark.catalog.dropTempView("dl_probe")
  }

  test("metric properties: identity, symmetry, triangle inequality") {
    // UNRESTRICTED Damerau-Levenshtein is a true metric (the restricted
    // OSA variant famously is NOT: d("ca","ac")+d("ac","abc") < its
    // d("ca","abc")=3) — violating the triangle inequality here would
    // mean the implementation drifted to the wrong variant
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    val strs = vectors.flatMap { case (a, b, _) => Seq(a, b) }.distinct
    def dist(a: String, b: String): Int =
      DamerauLevenshtein.distance(u(a), u(b))
    strs.foreach(a => assert(dist(a, a) == 0, s"d($a,$a) != 0"))
    // triangle over a systematic sample of triples (full cube is 50^3)
    val sample = strs.take(14)
    for (a <- sample; b <- sample; c <- sample)
      assert(
        dist(a, c) <= dist(a, b) + dist(b, c),
        s"triangle violated: d($a,$c) > d($a,$b) + d($b,$c)")
  }

  test("null contract: NULL iff either side is NULL") {
    import spark.implicits._
    val df = Seq(
      (Some("ab"), Some("ba")),
      (None: Option[String], Some("x")),
      (Some("x"), None: Option[String]),
      (None: Option[String], None: Option[String]))
      .toDF("a", "b")
      .select(DamerauLevenshtein.damerau(col("a"), col("b")).as("d"))
      .collect()
    assert(!df(0).isNullAt(0) && df(0).getInt(0) == 1)
    assert(df(1).isNullAt(0) && df(2).isNullAt(0) && df(3).isNullAt(0))
  }
}
