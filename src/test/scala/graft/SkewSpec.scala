package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._

/** Salted join / aggregation must be value-identical to their unsalted
  * forms — salting redistributes work, never changes results.
  */
class SkewSpec extends SparkSpec {

  test("salted join == plain join (values), spread over (key, salt)") {
    val e = Tables.events(spark, sf)
    val c = Tables.customer(spark, sf)
    val plain = e
      .join(c, e("user_id") === c("c_custkey"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(18,4)"))
        .cast("double").as("v"))
    val salted = Skew
      .saltedJoin(e, c, "user_id", "c_custkey", col("event_id"), salts = 8)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(18,4)"))
        .cast("double").as("v"))
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("salted two-phase aggregation == direct groupBy aggregation") {
    val e = Tables.events(spark, sf)
    val direct = e
      .groupBy(col("user_id"))
      .agg(
        sum(col("value").cast("decimal(18,4)")).cast("double").as("value_sum"),
        count(lit(1)).as("n"))
    val salted =
      Skew.saltedAgg(e, "user_id", col("value"), col("event_id"), salts = 8)
    assert(salted.exceptAll(direct).count() == 0)
    assert(direct.exceptAll(salted).count() == 0)
  }

  test("AQE splits a skewed join partition at runtime") {
    val s = spark
    import s.implicits._
    // force the skew machinery at toy scale: tiny thresholds, no
    // broadcast (skew split only applies to sort-merge joins)
    val confs = Map(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 50k rows on ONE key + a sprinkle of others = one fat partition
      val big = spark.range(0, 50000).select(
        (col("id") % 50).cast("long").as("pad"),
        when(col("id") % 100 === 0, col("id") % 7).otherwise(0L).as("k"),
        col("id").as("payload"))
      val dim = spark.range(0, 7).select(col("id").as("dk"),
        concat(lit("v"), col("id")).as("dv"))
      val joined = big.join(dim, col("k") === col("dk"))
      // collect() (not count()) so THIS QueryExecution runs and AQE
      // finalizes its plan
      assert(joined.collect().length == 50000)
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(
        plan.contains("skew=true") || plan.contains("isSkew=true") ||
          plan.contains("skewed"),
        s"AQE did not mark the skewed join:\n$plan")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("salt is deterministic and in range") {
    val e = Tables.events(spark, sf)
    val s1 = e.select(Skew.salt(col("event_id"), 8).as("s")).collect().map(_.getInt(0))
    val s2 = e.select(Skew.salt(col("event_id"), 8).as("s")).collect().map(_.getInt(0))
    assert(s1.sameElements(s2))
    assert(s1.forall(s => s >= 0 && s < 8))
    // actually spreads: more than one salt value in use
    assert(s1.distinct.length > 1)
  }
  test("bucketed interval join == naive theta join under a hot bucket") {
    // adversarial shape for bucket blocking: EVERY interval lands in one
    // hour, so the equi join degenerates to a single bucket — results
    // must still match the naive theta join exactly (the blocking is a
    // pure execution strategy). Intervals engineered with exact-boundary
    // touches to pin the half-open contract: an interval ending exactly
    // where another starts must NOT pair with it.
    val s2 = spark
    import s2.implicits._
    val hour0 = 1700000000L * 1000000L - (1700000000L * 1000000L) % (3600L * 1000000L)
    val a = (0L until 120L)
      .map(i => (i, hour0 + i * 25000000L, hour0 + i * 25000000L + 300000000L))
      .toDF("a_id", "a_s", "a_e")
    val b = (0L until 80L)
      .map(j => (j, hour0 + j * 30000000L + 300000000L, hour0 + j * 30000000L + 900000000L))
      .toDF("b_id", "b_s", "b_e")
    val bucketed = ops.Temporal
      .intervalOverlapPairs(a, b)
      .select(col("a_id"), col("b_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val naive = a
      .crossJoin(b)
      .filter(col("a_s") < col("b_e") && col("b_s") < col("a_e"))
      .select(col("a_id"), col("b_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(bucketed == naive,
      s"bucketed\\naive=${(bucketed -- naive).take(5)} naive\\bucketed=${(naive -- bucketed).take(5)}")
    assert(naive.nonEmpty, "degenerate fixture: no overlaps at all")
    // the boundary-touch case: a_e == b_s for (a_id=12, b_id=0) by
    // construction (12*25M + 300M == 0*30M + 300M + 300M? verify on data)
    val touchPairs = a.crossJoin(b)
      .filter(col("a_e") === col("b_s") || col("b_e") === col("a_s"))
      .select(col("a_id"), col("b_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(touchPairs.nonEmpty,
      "degenerate fixture: no exact boundary touches to exercise")
    // the BUCKETED implementation must exclude every exact-touch pair —
    // asserting against `naive` here would be tautological (naive is
    // built with strict inequalities, so the intersection is empty by
    // construction and never exercises intervalOverlapPairs)
    assert(bucketed.intersect(touchPairs).isEmpty,
      "half-open contract violated: exact boundary touch paired by " +
        s"intervalOverlapPairs: ${bucketed.intersect(touchPairs).take(5)}")
  }
}

