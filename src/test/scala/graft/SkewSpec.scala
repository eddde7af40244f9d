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

  test("salt is deterministic and in range") {
    val e = Tables.events(spark, sf)
    val s1 = e.select(Skew.salt(col("event_id"), 8).as("s")).collect().map(_.getInt(0))
    val s2 = e.select(Skew.salt(col("event_id"), 8).as("s")).collect().map(_.getInt(0))
    assert(s1.sameElements(s2))
    assert(s1.forall(s => s >= 0 && s < 8))
    // actually spreads: more than one salt value in use
    assert(s1.distinct.length > 1)
  }
}
