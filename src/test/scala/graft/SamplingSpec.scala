package graft

import graft.functions.Hashing._
import org.apache.spark.sql.functions._

/** Priority sampling (q_weighted_sample) — beyond the oracle gate (which
  * pins the deterministic selection), this spec checks the STATISTICAL
  * contract that makes the operator useful: the Duffield–Lund–Thorup
  * estimator Σ max(w, τ) over the k sampled items approximates the true
  * total weight, and the selection is weight-biased (the sample's mean
  * weight exceeds the population's).
  */
class SamplingSpec extends SparkSpec {

  private val k = 50
  private val seed = 29

  private def prioritized = Tables
    .documents(spark, sf)
    .select(
      col("doc_id"),
      col("n_chars").cast("long").as("w"),
      ((col("n_chars").cast("double") * lit(4294967296.0)) /
        (h32(seed, col("doc_id").cast("string")) + lit(1L)).cast("double"))
        .as("priority"))

  test("DLT estimator lands within 30% of the true total weight") {
    val topK1 = prioritized
      .orderBy(col("priority").desc, col("doc_id").asc)
      .limit(k + 1)
      .collect()
    assert(topK1.length == k + 1)
    val tau = topK1.last.getDouble(2) // (k+1)-th priority = threshold
    val est = topK1.take(k).map(r => math.max(r.getLong(1).toDouble, tau)).sum
    val truth =
      prioritized.agg(sum(col("w"))).first().getLong(0).toDouble
    val rel = math.abs(est - truth) / truth
    assert(
      rel < 0.30,
      s"estimate $est vs truth $truth (rel err $rel) — k=$k priority sample")
  }

  test("selection is weight-biased: sampled mean weight > population mean") {
    val sampleMean = prioritized
      .orderBy(col("priority").desc, col("doc_id").asc)
      .limit(k)
      .agg(avg(col("w")))
      .first()
      .getDouble(0)
    val popMean = prioritized.agg(avg(col("w"))).first().getDouble(0)
    assert(
      sampleMean > popMean,
      s"sample mean $sampleMean <= population mean $popMean — not weight-proportional")
  }

  test("priorities are exact doubles: every operand below 2^53") {
    // the exactness argument of the query's scaladoc, checked on data:
    // w * 2^32 must stay under 2^53 or the priority stops being the
    // correctly-rounded quotient of exact operands
    val maxW = prioritized.agg(max(col("w"))).first().getLong(0)
    assert(
      maxW.toDouble * 4294967296.0 < math.pow(2, 53),
      s"max weight $maxW pushes w*2^32 past 2^53 — exactness contract broken")
  }
}
