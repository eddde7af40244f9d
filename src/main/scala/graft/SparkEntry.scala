package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every named query the engine ships. Each operator family
  * lives in its own module under `graft.ops`; this object is only the
  * registry the driver's Verify/Bench mains consume.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Balance conservation per region/nation — the analytic dual of the
    * reference's signature invariant
    * (/root/reference/src/opusdb/benchmark/bank.clj:41-44).
    */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.bankConservation(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Relational.queries ++
      ops.Transactional.queries ++
      ops.TextPipeline.queries ++
      ops.Embeddings.queries ++
      ops.Temporal.queries ++
      ops.Analytics.queries ++
      ops.Multimodal.queries ++
      ops.Graph.queries ++
      ops.Search.queries ++
      ops.Sampling.queries ++
      ops.Sketches.queries ++
      ops.Layout.queries ++
      ops.Privacy.queries ++
      ops.Warehouse.queries ++
      ops.Reports.queries ++
      sources.Formats.queries ++
      streaming.Streams.queries

  /** Queries filtered by the optional SPARK_GRAFT_ONLY=q_a,q_b env var
    * (local-iteration convenience; the driver never sets it). Shared by
    * Bench and Verify. Fails loudly when a requested name matches no
    * registered query — a misspelling must not masquerade as a
    * 0-query success.
    */
  def selectedQueries: Map[String, (SparkSession, String) => DataFrame] =
    sys.env
      .get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet) match {
      case Some(names) =>
        val unknown = names -- queries.keySet
        require(
          unknown.isEmpty,
          s"SPARK_GRAFT_ONLY names match no registered query: " +
            unknown.toSeq.sorted.mkString(", "))
        queries.filter(kv => names(kv._1))
      case None => queries
    }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    ops.Relational.oracleSql ++
      ops.Transactional.oracleSql ++
      ops.TextPipeline.oracleSql ++
      ops.Embeddings.oracleSql ++
      ops.Temporal.oracleSql ++
      ops.Analytics.oracleSql ++
      ops.Multimodal.oracleSql ++
      ops.Graph.oracleSql ++
      ops.Search.oracleSql ++
      ops.Sampling.oracleSql ++
      ops.Sketches.oracleSql ++
      ops.Layout.oracleSql ++
      ops.Privacy.oracleSql ++
      ops.Warehouse.oracleSql ++
      ops.Reports.oracleSql ++
      sources.Formats.oracleSql ++
      streaming.Streams.oracleSql
}
