package graft

import graft.functions.Hashing
import org.apache.spark.sql.functions._

/** Custom Catalyst expression contract: FloatVecDot / PlaneVecDot must be
  * BIT-IDENTICAL to the higher-order-function formulation (same ordered
  * double fold) — this is what lets the embedding queries swap in the
  * codegen'd path without perturbing the DuckDB-oracle hash compare.
  */
class VecExprSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf)

  test("FloatVecDot == HOF dot, bit-for-bit, on every vector pair sample") {
    val both = emb
      .select(
        col("vec_id"),
        Hashing.dot(col("embedding"), col("embedding")).as("hof"),
        Hashing.fdot(col("embedding"), col("embedding")).as("gen"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(
        java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"vec ${r.getLong(0)}: ${r.getDouble(1)} != ${r.getDouble(2)}")
    }
  }

  test("FloatVecDot agrees with a driver-side reference computation") {
    val row = emb.select(col("embedding"), Hashing.fdot(col("embedding"), col("embedding"))).first()
    val v = row.getSeq[Float](0)
    var acc = 0.0
    v.foreach(x => acc += x.toDouble * x.toDouble)
    assert(java.lang.Double.doubleToLongBits(acc) ==
      java.lang.Double.doubleToLongBits(row.getDouble(1)))
  }

  test("expression participates in whole-stage codegen") {
    val plan = emb
      .select(Hashing.fdot(col("embedding"), col("embedding")).as("d"))
      .queryExecution
      .executedPlan
      .toString
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage
    assert(
      plan.contains("*(1) Project [float_vec_dot"),
      s"float_vec_dot not inside a codegen stage:\n$plan")
  }

  test("null array yields null, not a crash or zero") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Some(Array(1.0f, 2.0f)), Some(Array(3.0f, 4.0f))),
      (2L, None, Some(Array(3.0f, 4.0f))))
      .toDF("id", "a", "b")
    val out = df
      .select(col("id"), Hashing.fdot(col("a"), col("b")).as("d"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out(1L).contains(11.0))
    assert(out(2L).isEmpty)
  }
}
