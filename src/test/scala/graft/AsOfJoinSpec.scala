package graft

import graft.plans.AsOf
import org.apache.spark.sql.functions._

/** Native as-of join operator: semantics vs the union+running-last
  * formulation, null behavior, plan shape.
  */
class AsOfJoinSpec extends SparkSpec {

  test("native as-of join == union-trick as-of join (aggregate values)") {
    val native = ops.Analytics
      .asofNative(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val unionForm = ops.Analytics
      .asofJoin(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(native == unionForm)
  }

  test("left rows with no prior match get nulls, not dropped") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 10L), (1L, 20L), (2L, 5L)).toDF("k", "t")
    val right = Seq((1L, 15L, "a"), (3L, 1L, "b")).toDF("rk", "rt", "v")
    val out = AsOf
      .join(left, "k", "t", right, "rk", "rt")
      .select(col("k"), col("t"), col("v"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> Option(r.getString(2)))
      .toMap
    assert(out((1L, 10L)).isEmpty) // match is later than t=10
    assert(out((1L, 20L)).contains("a")) // rt=15 <= 20
    assert(out((2L, 5L)).isEmpty) // key has no right rows
  }

  test("tolerance: stale matches null out; boundary diff == tolerance still matches") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 100L), (1L, 200L), (1L, 301L)).toDF("k", "t")
    val right = Seq((1L, 90L, "a"), (1L, 195L, "b")).toDF("rk", "rt", "v")
    val out = AsOf
      .join(left, "k", "t", right, "rk", "rt", 10L)
      .select(col("t"), col("v"))
      .collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)))
      .toMap
    assert(out(100L).contains("a")) // diff 10 == tolerance: inclusive
    assert(out(200L).contains("b")) // diff 5 within tolerance
    assert(out(301L).isEmpty) // latest prior is b at 195, diff 106 > 10
  }

  test("inner variant drops unmatched/out-of-horizon rows; matched rows identical to outer") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 10L), (1L, 20L), (2L, 5L), (1L, 300L)).toDF("k", "t")
    val right = Seq((1L, 15L, "a"), (3L, 1L, "b")).toDF("rk", "rt", "v")
    val inner = AsOf
      .innerJoin(left, "k", "t", right, "rk", "rt", 50L)
      .select(col("k"), col("t"), col("v"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSet
    // only (1,20) matches within tolerance 50; (1,300) is stale, (1,10)
    // precedes the match, (2,5) has no right rows
    assert(inner == Set((1L, 20L, "a")))
    // inner == outer-with-tolerance restricted to its matched rows, on real events
    val e = Tables.events(spark, sf).withColumn("t_us", unix_micros(col("ts")))
    val tol = 3600L * 1000000L
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("t_us"), col("event_id"))
    val v = e.filter(col("event_type") === "view")
      .select(col("user_id").as("vu"), col("t_us").as("vt"), col("value").as("vv"))
    val viaInner = AsOf
      .innerJoin(p, "user_id", "t_us", v, "vu", "vt", tol)
      .select(col("event_id"), col("vt"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaOuter = AsOf
      .join(p, "user_id", "t_us", v, "vu", "vt", tol)
      .filter(col("vv").isNotNull)
      .select(col("event_id"), col("vt"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaInner == viaOuter && viaInner.nonEmpty)
  }

  test("tolerance variant == window-computed expected on real events") {
    val e = Tables.events(spark, sf).withColumn("t_us", unix_micros(col("ts")))
    val tol = 3600L * 1000000L
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("t_us"))
    val v = e.filter(col("event_type") === "view")
      .select(col("user_id").as("vu"), col("t_us").as("vt"), col("value").as("vv"))
    val native = AsOf.join(p, "user_id", "t_us", v, "vu", "vt", tol)
      .groupBy(col("user_id"))
      .agg(sum(when(col("vv").isNotNull, 1L).otherwise(0L)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // expected: latest prior view per purchase via a window over the
    // interleaved stream, then the tolerance as a plain post-filter
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("t_us").asc, col("is_p").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val union = p.withColumn("is_p", lit(1)).withColumn("vt", lit(null).cast("long"))
      .unionByName(
        v.select(col("vu").as("user_id"), col("vt").as("t_us"))
          .withColumn("is_p", lit(0)).withColumn("vt", col("t_us")))
    val expected = union
      .withColumn("last_vt", last(col("vt"), ignoreNulls = true).over(w))
      .filter(col("is_p") === 1)
      .groupBy(col("user_id"))
      .agg(sum(when(col("t_us") - col("last_vt") <= tol, 1L).otherwise(0L)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native.keySet == expected.keySet)
    native.foreach { case (u, n) => assert(n == expected(u), s"user $u") }
  }

  test("forward: first at-or-after match; shared candidate; tolerance") {
    val s = spark
    import s.implicits._
    // two purchases of key 1 BOTH attach to the same later view (the
    // candidate is peeked, not consumed); t=100 matches itself-time 100
    // (inclusive); key 2 has only an EARLIER right row -> null
    val left = Seq((1L, 10L), (1L, 20L), (1L, 100L), (2L, 50L)).toDF("k", "t")
    val right =
      Seq((1L, 25L, "a"), (1L, 100L, "b"), (2L, 5L, "c")).toDF("rk", "rt", "v")
    val out = AsOf
      .forwardJoin(left, "k", "t", right, "rk", "rt")
      .select(col("k"), col("t"), col("v"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> Option(r.getString(2)))
      .toMap
    assert(out((1L, 10L)).contains("a"))
    assert(out((1L, 20L)).contains("a")) // same candidate, still buffered
    assert(out((1L, 100L)).contains("b")) // rt >= t inclusive
    assert(out((2L, 50L)).isEmpty) // only an earlier right row exists
    // tolerance: rt - t must be <= horizon
    val tol = AsOf
      .forwardJoin(left, "k", "t", right, "rk", "rt", 10L)
      .select(col("k"), col("t"), col("v"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> Option(r.getString(2)))
      .toMap
    assert(tol((1L, 10L)).isEmpty) // a at 25 is 15 away > 10
    assert(tol((1L, 20L)).contains("a")) // 5 away, inclusive horizon
    assert(tol((1L, 100L)).contains("b")) // 0 away
  }

  test("forward == window-computed expected on real events") {
    val e = Tables.events(spark, sf)
      .withColumn("t_us", unix_micros(col("ts")))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("t_us"), col("event_id"))
    val v = e.filter(col("event_type") === "view")
      .select(
        col("user_id").as("vu"),
        col("t_us").as("v_t"),
        col("value").as("v_val"))
    val native = AsOf
      .forwardJoin(p, "user_id", "t_us", v, "vu", "v_t")
      .select(col("event_id"), col("v_t"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    // expected: per purchase, min view time >= purchase time via a join
    val expected = p
      .join(v, col("user_id") === col("vu") && col("v_t") >= col("t_us"), "left")
      .groupBy(col("event_id"))
      .agg(coalesce(min(col("v_t")), lit(-1L)).as("m"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(native == expected)
  }

  test("nearest: least |Δt| wins; exact tie breaks backward; tolerance bounds both sides") {
    val s = spark
    import s.implicits._
    // key 1: left t=100 sits between rt=90 (Δ10) and rt=105 (Δ5) → fwd;
    // left t=200 sits between rt=190 (Δ10) and rt=210 (Δ10) → TIE →
    // backward wins; left t=300 has only a backward row; key 2 only a
    // forward row; key 3 nothing
    val left =
      Seq((1L, 100L), (1L, 200L), (1L, 300L), (2L, 50L), (3L, 7L)).toDF("k", "t")
    val right = Seq(
      (1L, 90L, "b90"), (1L, 105L, "f105"),
      (1L, 190L, "b190"), (1L, 210L, "f210"),
      (2L, 60L, "f60")).toDF("rk", "rt", "v")
    val out = AsOf
      .nearestJoin(left, "k", "t", right, "rk", "rt")
      .select(col("k"), col("t"), col("v"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> Option(r.getString(2)))
      .toMap
    assert(out((1L, 100L)).contains("f105")) // Δ5 forward beats Δ10 back
    assert(out((1L, 200L)).contains("b190")) // tie Δ10 → backward wins
    assert(out((1L, 300L)).contains("f210")) // rt=210 is backward here (Δ90), only candidate
    assert(out((2L, 50L)).contains("f60")) // forward-only key
    assert(out((3L, 7L)).isEmpty) // no right rows at all
    // tolerance 8: at t=100, fwd Δ5 ok; at t=200 both Δ10 out → null
    val tol = AsOf
      .nearestJoin(left, "k", "t", right, "rk", "rt", 8L)
      .select(col("k"), col("t"), col("v"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> Option(r.getString(2)))
      .toMap
    assert(tol((1L, 100L)).contains("f105"))
    assert(tol((1L, 200L)).isEmpty)
    assert(tol((2L, 50L)).isEmpty) // Δ10 > 8
  }

  test("nearest == pick-rule over window-computed candidates on real events") {
    val e = Tables.events(spark, sf)
      .withColumn("t_us", unix_micros(col("ts")))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("t_us"), col("event_id"))
    val v = e.filter(col("event_type") === "view")
      .select(
        col("user_id").as("vu"),
        col("t_us").as("v_t"),
        col("value").as("v_val"))
    val native = AsOf
      .nearestJoin(p, "user_id", "t_us", v, "vu", "v_t")
      .select(col("event_id"), col("v_t"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    // expected: per purchase, the view time minimizing |Δ|, backward on
    // ties, via an unbounded join + conditional aggregation
    val expected = p
      .join(v, col("user_id") === col("vu"), "left")
      .groupBy(col("event_id"), col("t_us"))
      .agg(
        max(when(col("v_t") <= col("t_us"), col("v_t"))).as("bt"),
        min(when(col("v_t") >= col("t_us"), col("v_t"))).as("ft"))
      .select(
        col("event_id"),
        when(
          col("bt").isNotNull &&
            (col("ft").isNull ||
              (col("t_us") - col("bt")) <= (col("ft") - col("t_us"))),
          col("bt"))
          .otherwise(coalesce(col("ft"), lit(-1L)))
          .as("m"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(native == expected)
  }

  test("inclusive boundary: right row at exactly left time matches") {
    val s = spark
    import s.implicits._
    val left = Seq((7L, 100L)).toDF("k", "t")
    val right = Seq((7L, 100L, 42.0)).toDF("rk", "rt", "v")
    val out = AsOf.join(left, "k", "t", right, "rk", "rt").collect()
    assert(out.length == 1 && out(0).getDouble(4) == 42.0)
  }

  test("latest of several candidates wins") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 50L)).toDF("k", "t")
    val right =
      Seq((1L, 10L, "old"), (1L, 30L, "mid"), (1L, 49L, "new"), (1L, 51L, "future"))
        .toDF("rk", "rt", "v")
    val out = AsOf.join(left, "k", "t", right, "rk", "rt").collect()
    assert(out(0).getString(4) == "new")
  }

  test("generic key/time types: string keys, timestamp times") {
    val s = spark
    import s.implicits._
    val left = Seq(
      ("alpha", java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1),
      ("beta", java.sql.Timestamp.valueOf("2024-01-01 09:00:00"), 2))
      .toDF("k", "t", "n")
    val right = Seq(
      ("alpha", java.sql.Timestamp.valueOf("2024-01-01 09:30:00"), "early"),
      ("alpha", java.sql.Timestamp.valueOf("2024-01-01 09:59:00"), "late"),
      ("beta", java.sql.Timestamp.valueOf("2024-01-01 09:30:00"), "too-late"))
      .toDF("rk", "rt", "v")
    val out = AsOf
      .join(left, "k", "t", right, "rk", "rt")
      .select(col("k"), col("v"))
      .collect()
      .map(r => r.getString(0) -> Option(r.getString(1)))
      .toMap
    assert(out("alpha").contains("late"))
    assert(out("beta").isEmpty)
  }

  test("pruning rule narrows both scans through the custom node") {
    // join FULL event tables, then keep only two columns — the custom
    // rule must narrow both parquet ReadSchemas to the referenced +
    // key/time columns instead of all six
    val e = Tables.events(spark, sf)
      .withColumn("t_us", unix_micros(col("ts")))
    val right = e
      .select(
        col("user_id").as("v_user"),
        col("t_us").as("v_t"),
        col("value").as("v_val"),
        col("event_type").as("v_type"),
        col("props").as("v_props"))
    val joined = AsOf
      .join(e, "user_id", "t_us", right, "v_user", "v_t")
      .select(col("user_id"), col("v_val"))
    joined.collect()
    val plan =
      joined.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // neither scan should read props (never referenced after pruning)
    val schemas = "ReadSchema: struct<[^>]*>".r.findAllIn(plan).toList
    assert(schemas.nonEmpty)
    assert(
      !schemas.exists(_.contains("props")),
      s"props survived pruning: $schemas")
  }

  test("plan: AsOfJoinExec with one exchange+sort per side, no theta join") {
    val df = ops.Analytics.asofNative(spark, sf)
    df.collect()
    val plan =
      df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // SparkPlan.nodeName strips the Exec suffix: the operator prints as
    // "AsOfJoin <keys>"
    assert(plan.contains("AsOfJoin "), s"operator not planned:\n$plan")
    assert(
      !plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"theta-join fallback appeared:\n$plan")
  }
}
