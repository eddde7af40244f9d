package graft.ops

import graft.Tables
import graft.functions.Exact._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Privacy / anonymization operators for training-data release.
  *
  * The reference has no privacy surface (SURVEY.md §2.11); these are
  * north-star pipeline operators: before a corpus or an analytics
  * extract leaves the boundary, identifiers must be tokenized
  * consistently (so joins still work downstream) and quasi-identifier
  * re-identification risk must be measured (k-anonymity) with the
  * at-risk rows suppressed.
  *
  * Scale design (100 TB):
  *  - Pseudonymization is a STATELESS projection — surrogate =
  *    hash(domain-separated key), no token-vault lookup join, so it adds
  *    zero shuffles and the downstream join shuffles on the token
  *    exactly as it would on the raw key (same cardinality, same
  *    distribution — a keyed HMAC in production; md5 here so the DuckDB
  *    oracle reproduces the exact tokens).
  *  - The k-anonymity audit is two hash aggregates: QI-group sizes
  *    (shuffle keyed by the QI tuple), then a per-segment rollup of the
  *    group-size frame, which is O(groups) not O(rows). Suppression is
  *    a join back on the QI key only if the caller materializes the
  *    filtered corpus; the audit itself never rescans the fact table.
  */
object Privacy {
  type Q = (SparkSession, String) => DataFrame

  /** Domain-separated deterministic token for a customer key. */
  private def token(c: org.apache.spark.sql.Column) =
    md5(concat(lit("cust:"), c.cast("string")))

  private val sqlToken: String => String =
    e => s"md5('cust:' || CAST($e AS VARCHAR))"

  // ---------------------------------------------------------------------
  // q_pseudonymize — consistent tokenization across tables: customer and
  // orders both replace custkey with md5('cust:'||key), then join ON THE
  // TOKEN. Referential integrity survives tokenization (the hash gate
  // pins per-segment order counts, distinct-token counts, and exact
  // revenue — all equal to the raw-key join's), and min(token) pins the
  // token values themselves cross-engine.
  // ---------------------------------------------------------------------
  val pseudonymize: Q = (s, d) => {
    val c = Tables
      .customer(s, d)
      .select(token(col("c_custkey")).as("c_token"), col("c_mktsegment"))
    val o = Tables
      .orders(s, d)
      .select(token(col("o_custkey")).as("o_token"), col("o_totalprice"))
    c.join(o, c("c_token") === o("o_token"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_orders"),
        countDistinct(col("c_token")).as("d_tokens"),
        min(col("c_token")).as("min_token"),
        dsum(col("o_totalprice")).as("revenue")
      )
      .orderBy(col("c_mktsegment"))
  }

  val pseudonymizeSql: String =
    s"""SELECT c_mktsegment, count(*) AS n_orders,
       |count(DISTINCT c_token) AS d_tokens, min(c_token) AS min_token,
       |${sqlDsum("o_totalprice")} AS revenue
       |FROM (SELECT ${sqlToken("c_custkey")} AS c_token, c_mktsegment
       |      FROM customer) c
       |JOIN (SELECT ${sqlToken("o_custkey")} AS o_token, o_totalprice
       |      FROM orders) o ON c_token = o_token
       |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------------
  // q_kanon — k-anonymity audit (k = 5) on the quasi-identifier tuple
  // (mktsegment, nationkey, acctbal rounded to 1000s): a row whose QI
  // group has fewer than k members is re-identifiable and must be
  // suppressed before release. Per segment: QI groups, at-risk groups,
  // rows, suppressed rows, and the released-row count after suppression.
  // The acctbal bucket is floor(x/1000) — identical IEEE double ops on
  // both engines, so group membership is bit-deterministic.
  // ---------------------------------------------------------------------
  val kAnonymity: Q = (s, d) => {
    val k = 5L
    val groups = Tables
      .customer(s, d)
      .select(
        col("c_mktsegment"),
        col("c_nationkey"),
        floor(col("c_acctbal") / 1000).cast("long").as("bal_band")
      )
      .groupBy(col("c_mktsegment"), col("c_nationkey"), col("bal_band"))
      .agg(count(lit(1)).as("gsize"))
    groups
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_groups"),
        sum(when(col("gsize") < k, 1L).otherwise(0L)).as("n_atrisk"),
        sum(col("gsize")).as("n_rows"),
        sum(when(col("gsize") < k, col("gsize")).otherwise(0L))
          .as("n_suppressed"),
        sum(when(col("gsize") >= k, col("gsize")).otherwise(0L))
          .as("n_released"),
        min(col("gsize")).as("min_gsize")
      )
      .orderBy(col("c_mktsegment"))
  }

  val kAnonymitySql: String =
    """SELECT c_mktsegment, count(*) AS n_groups,
      |CAST(SUM(CASE WHEN gsize < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_atrisk,
      |CAST(SUM(gsize) AS BIGINT) AS n_rows,
      |CAST(SUM(CASE WHEN gsize < 5 THEN gsize ELSE 0 END) AS BIGINT) AS n_suppressed,
      |CAST(SUM(CASE WHEN gsize >= 5 THEN gsize ELSE 0 END) AS BIGINT) AS n_released,
      |min(gsize) AS min_gsize
      |FROM (SELECT c_mktsegment, c_nationkey,
      |        CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
      |        count(*) AS gsize
      |      FROM customer GROUP BY 1, 2, 3)
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------------
  // q_pii_redact — pattern-based PII redaction: identifier-like digit
  // runs (≥4 digits — account numbers, phone fragments) are masked in
  // place with regexp_replace, then the audit reports per segment how
  // many rows were touched and how the distinct-value count collapses
  // (150 unique names → 1 redacted form: the anonymity gain, and the
  // joinability loss, of masking vs q_pseudonymize's consistent
  // tokens). Stateless projection — zero added shuffles at any scale.
  // Spark's regexp_replace is replace-ALL by default; DuckDB needs the
  // explicit 'g' flag — same regex class semantics for this pattern.
  // ---------------------------------------------------------------------
  val piiRedact: Q = (s, d) => {
    val red = Tables
      .customer(s, d)
      .select(
        col("c_mktsegment"),
        col("c_name"),
        regexp_replace(col("c_name"), "[0-9]{4,}", "#").as("red"))
    red
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("c_name") =!= col("red"), 1L).otherwise(0L))
          .as("n_redacted"),
        countDistinct(col("c_name")).as("d_raw"),
        countDistinct(col("red")).as("d_redacted"),
        min(col("red")).as("sample_red"))
      .orderBy(col("c_mktsegment"))
  }

  val piiRedactSql: String =
    """SELECT c_mktsegment, count(*) AS n_rows,
      |CAST(SUM(CASE WHEN c_name <> red THEN 1 ELSE 0 END) AS BIGINT) AS n_redacted,
      |count(DISTINCT c_name) AS d_raw, count(DISTINCT red) AS d_redacted,
      |min(red) AS sample_red
      |FROM (SELECT c_mktsegment, c_name,
      |        regexp_replace(c_name, '[0-9]{4,}', '#', 'g') AS red
      |      FROM customer)
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_pseudonymize" -> pseudonymize,
    "q_kanon" -> kAnonymity,
    "q_pii_redact" -> piiRedact
  )

  val oracleSql: Map[String, String] = Map(
    "q_pseudonymize" -> pseudonymizeSql,
    "q_kanon" -> kAnonymitySql,
    "q_pii_redact" -> piiRedactSql
  )
}
