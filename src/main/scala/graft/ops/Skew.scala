package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators: salted joins and two-phase hot-key
  * aggregation.
  *
  * AQE's skew-join split handles storage-level skew at runtime, but it
  * only fires for sort-merge joins and cannot help a hash AGGREGATION
  * whose reduce key is hot (one reducer gets the hot key's entire
  * partition regardless of how files were split). These helpers encode
  * the classic salt-and-merge pattern:
  *
  *  - [[saltedJoin]]: the big (skewed) side gets a deterministic salt in
  *    [0, salts); the dimension side is exploded `salts` ways; the join
  *    key becomes (key, salt), spreading one hot key over `salts`
  *    reducers. Replication factor is `salts` × |dim| — use for dims too
  *    big to broadcast but far smaller than the fact side.
  *  - [[saltedAgg]]: phase 1 aggregates on (key, salt) — map-side
  *    partials land on `salts` different reducers for a hot key — then
  *    phase 2 merges the ≤`salts` partial rows per key. Works for any
  *    algebraic aggregate (sum/count here).
  *
  * The salt must be DETERMINISTIC (derived from row content, not rand())
  * so task retries and speculative attempts reproduce identical output —
  * the same replay-determinism the reference's WAL guarantees
  * (/root/reference/src/opusdb/logging/log_mgr.clj:16-33).
  */
object Skew {

  /** Deterministic salt in [0, salts) from any per-row expression (use a
    * high-cardinality column, e.g. an event id or the fact row's own
    * unique key).
    */
  def salt(saltSource: Column, salts: Int): Column =
    pmod(hash(saltSource), lit(salts))

  /** Inner equi-join of a skewed fact side against a non-broadcastable
    * dimension, spread over `salts` reducers per key.
    *
    * The SHUFFLE_HASH hint pins the join to the strategy the salt
    * exists for: salting only matters when the key is a shuffle
    * partition key (a broadcast join has no per-key reducer to
    * overload, and paying `salts`× dim replication for one would be
    * pure loss). At production scale the dim is past the broadcast
    * threshold anyway; the hint makes the demonstrated plan at test SF
    * the same plan that ships.
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      saltSource: Column,
      salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt", salt(saltSource, salts))
    val explodedDim = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
      .hint("shuffle_hash")
    saltedFact
      .join(
        explodedDim,
        saltedFact(factKey) === explodedDim(dimKey) &&
          saltedFact("__salt") === explodedDim("__salt"))
      .drop("__salt")
  }

  /** Two-phase skew-safe sum+count per key: (key, salt) partials, then a
    * final merge of at most `salts` rows per key.
    */
  def saltedAgg(
      df: DataFrame,
      key: String,
      value: Column,
      saltSource: Column,
      salts: Int): DataFrame = {
    df.withColumn("__salt", salt(saltSource, salts))
      .groupBy(col(key), col("__salt"))
      .agg(
        sum(value.cast("decimal(18,4)")).as("__psum"),
        count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(
        sum(col("__psum")).cast("double").as("value_sum"),
        sum(col("__pcnt")).as("n"))
  }
}
