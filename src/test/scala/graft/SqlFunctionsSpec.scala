package graft

/** The injectFunction leg of the extension matrix: every custom
  * expression must be reachable from PLAIN SQL and produce bit-identical
  * results to its Column API form (same Expression class — this is a
  * registration test, not a reimplementation).
  */
class SqlFunctionsSpec extends SparkSpec {

  override def beforeAll(): Unit = {
    super.beforeAll()
    graft.plans.GraftFunctions.register(spark)
  }

  test("zorder2 and fvec_dot usable from SQL == Column API semantics") {
    val s2 = spark
    import s2.implicits._
    Seq((3L, 9L, Seq(1.0f, 2.0f), Seq(0.5f, 0.25f)))
      .toDF("a", "b", "v1", "v2")
      .createOrReplaceTempView("t_sqlfn")
    val row = spark
      .sql("SELECT zorder2(a, b) AS z, fvec_dot(v1, v2) AS d FROM t_sqlfn")
      .head()
    val wantZ =
      (graft.plans.ZOrder2.spread16(3L) << 1) | graft.plans.ZOrder2.spread16(9L)
    assert(row.getLong(0) == wantZ, "zorder2 SQL mismatch")
    assert(row.getDouble(1) == (1.0f * 0.5f + 2.0f * 0.25f).toDouble)
  }

  test("ngram_shingles generator usable from SQL") {
    val s2 = spark
    import s2.implicits._
    Seq("abcd").toDF("txt").createOrReplaceTempView("t_sqlgen")
    val rows = spark
      .sql("SELECT ngram_shingles(txt, 2) FROM t_sqlgen")
      .collect()
      .map(_.getString(0))
      .toSeq
    assert(rows == Seq("ab", "bc", "cd"), s"got $rows")
  }

  test("token_window_fp generator usable from SQL == Column API") {
    val s2 = spark
    import s2.implicits._
    Seq(Seq("spark", "sql", "engine")).toDF("toks")
      .createOrReplaceTempView("t_sqlwfp")
    val viaSql = spark
      .sql("SELECT token_window_fp(toks, 2) FROM t_sqlwfp")
      .collect().map(_.getLong(0)).toSeq
    val viaCol = Seq(Seq("spark", "sql", "engine")).toDF("toks")
      .select(graft.functions.Hashing.tokenWindowFp(
        org.apache.spark.sql.functions.col("toks"), 2))
      .collect().map(_.getLong(0)).toSeq
    assert(viaSql == viaCol && viaSql.length == 2, s"got $viaSql vs $viaCol")
  }

  test("kmin_distinct and log_histogram aggregates usable from SQL") {
    val s2 = spark
    import s2.implicits._
    val vals = Seq(9L, 3L, 3L, 77L, 14L, 5L, 1L, 1L, 200L)
    vals.toDF("v").createOrReplaceTempView("t_sqlagg")
    val km = spark
      .sql("SELECT kmin_distinct(v, 4) FROM t_sqlagg")
      .head()
      .getSeq[Long](0)
    assert(km == Seq(1L, 3L, 5L, 9L), s"kmin_distinct SQL got $km")
    val lh = spark
      .sql("SELECT log_histogram(v, 3) FROM t_sqlagg")
      .head()
      .getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getLong(0), r.getLong(1)))
    val want = vals
      .map(v => graft.plans.LogHistogram.bucketOf(v, 3).toLong)
      .groupBy(identity)
      .view
      .mapValues(_.size.toLong)
      .toSeq
      .sortBy(_._1)
    assert(lh == want, s"log_histogram SQL got $lh want $want")
    // a non-literal buffer-size parameter must fail, never run
    intercept[Exception] {
      spark.sql("SELECT kmin_distinct(v, CAST(v AS INT)) FROM t_sqlagg").head()
    }
    // out-of-range literals must die at ANALYSIS time, not as a
    // NegativeArraySize/ArrayIndexOutOfBounds mid-aggregation
    intercept[Exception] {
      spark.sql("SELECT log_histogram(v, 30) FROM t_sqlagg").head()
    }
    intercept[Exception] {
      spark.sql("SELECT log_histogram(v, -1) FROM t_sqlagg").head()
    }
    intercept[Exception] {
      spark.sql("SELECT kmin_distinct(v, 0) FROM t_sqlagg").head()
    }
  }

  test("jaccard_ge and damerau_levenshtein usable from SQL == Column API") {
    val s2 = spark
    import s2.implicits._
    Seq((Seq(1, 2, 3, 4), Seq(2, 3, 4, 5)))
      .toDF("a", "b")
      .createOrReplaceTempView("t_sqljac")
    // J = 3/5: >= 1/2 true, >= 2/3 false
    val r = spark
      .sql("SELECT jaccard_ge(a, b, 1, 2), jaccard_ge(a, b, 2, 3) FROM t_sqljac")
      .head()
    assert(r.getBoolean(0) && !r.getBoolean(1))
    val viaCol = Seq((Seq(1, 2, 3, 4), Seq(2, 3, 4, 5)))
      .toDF("a", "b")
      .select(graft.plans.JaccardGE.jaccardGE(
        org.apache.spark.sql.functions.col("a"),
        org.apache.spark.sql.functions.col("b"), 1, 2))
      .head()
      .getBoolean(0)
    assert(viaCol == r.getBoolean(0))
    // threshold params must be literals and range-checked at analysis
    intercept[Exception] {
      spark.sql("SELECT jaccard_ge(a, b, 2, 0) FROM t_sqljac").head()
    }
    assert(
      spark.sql("SELECT damerau_levenshtein('ca', 'abc')").head().getInt(0) == 2)
  }
}
