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

  // ---------------------------------------------------------------------
  // q_weighted_sample — PRIORITY SAMPLING (Duffield–Lund–Thorup): a
  // weight-proportional sample of k documents without replacement, the
  // standard one-pass scheme for weighted corpus subsampling and
  // sum-estimation. Each doc gets priority p = w / u with u uniform in
  // (0,1]; the k highest priorities form the sample, and the (k+1)-th
  // priority is the estimator threshold τ (ŵ = max(w, τ) is unbiased
  // for the total — demonstrated in SamplingSpec; the gate here pins
  // the exact deterministic SELECTION).
  //
  // Exactness: u is the dyadic rational (h32+1)/2^32 — deterministic
  // content-free hash of the doc id, no RNG state. The priority is
  // computed as (w · 2^32) / (h+1) with both operands exact in double
  // (w·2^32 ≤ n_chars·2^32 < 2^53 for any plausible doc; h+1 < 2^32),
  // and IEEE division is correctly rounded — so every priority is
  // BIT-IDENTICAL on both engines and the top-k cut is exact. Ties
  // break on doc_id.
  //
  // Scale: one scan computing (w, priority), one TakeOrderedAndProject
  // head of k+1 — no global sort, no shuffle beyond the bounded head
  // (the same top-k machinery as q_top_customers). The aggregate is
  // over k rows.
  // ---------------------------------------------------------------------
  private val prioK = 50
  private val prioSeed = 29

  val weightedSample: Q = (s, d) => {
    val docs = Tables
      .documents(s, d)
      .select(
        col("doc_id"),
        col("source"),
        col("n_chars").cast("long").as("w"),
        ((col("n_chars").cast("double") * lit(4294967296.0)) /
          (h32(prioSeed, col("doc_id").cast("string")) + lit(1L))
            .cast("double")).as("priority"))
    val top = docs
      .orderBy(col("priority").desc, col("doc_id").asc)
      .limit(prioK)
    top
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_sampled"),
        sum(col("w")).as("sum_w_sampled"),
        min(col("priority")).as("min_priority"),
        max(col("w")).as("max_w"))
      .orderBy(col("source"))
  }

  val weightedSampleSql: String =
    s"""SELECT source, count(*) AS n_sampled,
       |CAST(SUM(w) AS BIGINT) AS sum_w_sampled,
       |min(priority) AS min_priority, max(w) AS max_w
       |FROM (
       |  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS w,
       |    (CAST(n_chars AS DOUBLE) * 4294967296.0) /
       |      CAST(${sqlH32(prioSeed, "CAST(doc_id AS VARCHAR)")} + 1 AS DOUBLE)
       |      AS priority
       |  FROM documents
       |  ORDER BY priority DESC, doc_id ASC LIMIT $prioK)
       |GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------------
  // q_grouped_sample — PER-GROUP priority sampling: the k highest
  // DLT priorities (same exact dyadic arithmetic as q_weighted_sample)
  // within EACH source — the per-stratum weighted draw a mixture
  // builder runs after quota planning. Distinct plan shape from the
  // global top-k: a rank window per group, which Spark executes as a
  // WindowGroupLimit (k rows survive per group map-side — the bounded
  // head never ships a stratum's full row stream). Ties break on
  // doc_id; all emitted stats are exact.
  // ---------------------------------------------------------------------
  private val grpK = 10

  val groupedSample: Q = (s, d) => {
    val prio = Tables
      .documents(s, d)
      .select(
        col("doc_id"),
        col("source"),
        col("n_chars").cast("long").as("w"),
        ((col("n_chars").cast("double") * lit(4294967296.0)) /
          (h32(prioSeed, col("doc_id").cast("string")) + lit(1L))
            .cast("double")).as("priority"))
    val wRank = Window
      .partitionBy(col("source"))
      .orderBy(col("priority").desc, col("doc_id").asc)
    prio
      .withColumn("rk", row_number().over(wRank))
      .filter(col("rk") <= grpK)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_sampled"),
        sum(col("w")).as("sum_w"),
        min(col("priority")).as("min_priority"))
      .orderBy(col("source"))
  }

  val groupedSampleSql: String =
    s"""SELECT source, count(*) AS n_sampled,
       |CAST(SUM(w) AS BIGINT) AS sum_w, min(priority) AS min_priority
       |FROM (
       |  SELECT source, w, priority,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY priority DESC, doc_id ASC) AS rk
       |  FROM (
       |    SELECT doc_id, source, CAST(n_chars AS BIGINT) AS w,
       |      (CAST(n_chars AS DOUBLE) * 4294967296.0) /
       |        CAST(${sqlH32(prioSeed, "CAST(doc_id AS VARCHAR)")} + 1 AS DOUBLE)
       |        AS priority
       |    FROM documents))
       |WHERE rk <= $grpK
       |GROUP BY source ORDER BY source""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_stratified_sample" -> stratifiedSample,
    "q_weighted_sample" -> weightedSample,
    "q_grouped_sample" -> groupedSample
  )

  val oracleSql: Map[String, String] = Map(
    "q_stratified_sample" -> stratifiedSampleSql,
    "q_weighted_sample" -> weightedSampleSql,
    "q_grouped_sample" -> groupedSampleSql
  )
}
