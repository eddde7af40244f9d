package graft.ops

import graft.Tables
import graft.functions.Hashing._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic corpus sampling — the mixture-construction step of a
  * training-data pipeline: given per-stratum counts, compute
  * temperature-scaled quotas and draw exactly those many documents per
  * stratum, reproducibly (no RNG state — the "random" order is a
  * content hash, so the same corpus always yields the same sample, on
  * any cluster at any parallelism).
  *
  * Scale design: the stratum statistics are one tiny aggregate
  * (|langs| rows) joined back broadcast; the draw is one window
  * row_number per stratum — WindowGroupLimit-style per-partition heads
  * bounded by the quota, never a global sort. Nothing here depends on
  * partition count or row order.
  */
object Sampling {
  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------------
  // q_stratified_sample — temperature-scaled mixture sampling at
  // α = 0.5: stratum weight ∝ (n_l)^α, i.e. sqrt — the standard trick
  // for up-weighting low-resource languages in a multilingual mix.
  // Quota_l = floor(T · sqrt(n_l) / Σ_m sqrt(n_m)) with budget T=200.
  //
  // Exactness notes: α is 0.5 PRECISELY so the power is sqrt(), which
  // IEEE 754 guarantees correctly rounded on both engines (general
  // pow() is not). The denominator Σ sqrt(n_m) is summed in
  // DECIMAL(18,9) — order-independent — then the single quota division
  // runs in double with identical association on both engines. The
  // per-stratum draw ranks by (h32 of the text, doc_id): content-keyed,
  // so exact duplicates rank adjacently and the sample is stable under
  // corpus re-partitioning / re-ordering.
  // ---------------------------------------------------------------------
  private val sampleBudget = 200L
  private val sampleSeed = 13

  val stratifiedSample: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val strata = docs
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("sq", sqrt(col("n_docs")).cast("decimal(18,9)"))
    val denom = strata.agg(sum(col("sq")).as("denom")) // exact decimal sum
    val quotas = strata
      .crossJoin(broadcast(denom)) // 1-row witness
      .withColumn(
        "quota",
        floor(
          (lit(sampleBudget) * col("sq").cast("double")) /
            col("denom").cast("double")).cast("long"))
      .select(col("lang"), col("n_docs"), col("quota"))
    val wDraw = Window
      .partitionBy(col("lang"))
      .orderBy(h32(sampleSeed, col("text")).asc, col("doc_id").asc)
    docs
      .withColumn("rk", row_number().over(wDraw).cast("long"))
      .join(broadcast(quotas), Seq("lang"))
      .withColumn("kept", when(col("rk") <= col("quota"), 1L).otherwise(0L))
      .groupBy(col("lang"), col("n_docs"), col("quota"))
      .agg(
        sum(col("kept")).as("n_sampled"),
        sum(when(col("kept") === 1L, col("n_chars")).otherwise(0L)).as("chars_sampled"))
      .orderBy(col("lang"))
  }

  val stratifiedSampleSql: String =
    s"""WITH strata AS (
       |  SELECT lang, count(*) AS n_docs,
       |    CAST(sqrt(count(*)) AS DECIMAL(18,9)) AS sq
       |  FROM documents GROUP BY lang),
       |denom AS (SELECT SUM(sq) AS denom FROM strata),
       |quotas AS (
       |  SELECT lang, n_docs,
       |    CAST(floor(($sampleBudget * CAST(sq AS DOUBLE)) / CAST(denom AS DOUBLE)) AS BIGINT) AS quota
       |  FROM strata CROSS JOIN denom),
       |ranked AS (
       |  SELECT lang, n_chars,
       |    CAST(row_number() OVER (PARTITION BY lang
       |      ORDER BY ${sqlH32(sampleSeed, "text")} ASC, doc_id ASC) AS BIGINT) AS rk
       |  FROM documents)
       |SELECT r.lang, q.n_docs, q.quota,
       |  CAST(SUM(CASE WHEN r.rk <= q.quota THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       |  CAST(SUM(CASE WHEN r.rk <= q.quota THEN r.n_chars ELSE 0 END) AS BIGINT) AS chars_sampled
       |FROM ranked r JOIN quotas q ON r.lang = q.lang
       |GROUP BY r.lang, q.n_docs, q.quota
       |ORDER BY r.lang""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_stratified_sample" -> stratifiedSample
  )

  val oracleSql: Map[String, String] = Map(
    "q_stratified_sample" -> stratifiedSampleSql
  )
}
