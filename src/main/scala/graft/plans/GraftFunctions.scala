package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL registration of the library's custom Catalyst expressions — the
  * `injectFunction` leg of the extension-point matrix: after
  * registration, `spark.sql("SELECT zorder2(a, b) ...")` and
  * `kmin_distinct(x, 64)` work in plain SQL exactly like their Column
  * API forms (same Expression instances, same codegen, same aggregate
  * buffers). Shipped both ways, like the as-of strategy:
  * conf-based (`spark.sql.extensions=graft.plans.GraftExtensions`) for
  * deployments, and [[register]] for an already-built session.
  *
  * Size/shift parameters must be integer LITERALS — they size bounded
  * aggregation buffers, so a per-row value can't mean anything; the
  * builder rejects non-literals at analysis time.
  */
object GraftFunctions {

  private def intLit(fn: String, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other =>
      throw new IllegalArgumentException(
        s"$fn: parameter must be an integer literal, got $other")
  }

  private def info(name: String, clazz: Class[_]): ExpressionInfo =
    new ExpressionInfo(clazz.getName, name)

  /** (name, info, builder) for every SQL-exposed custom expression. */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (
        FunctionIdentifier("zorder2"),
        info("zorder2", classOf[ZOrder2]),
        args => ZOrder2(args(0), args(1))),
      (
        FunctionIdentifier("fvec_dot"),
        info("fvec_dot", classOf[FloatVecDot]),
        args => FloatVecDot(args(0), args(1))),
      (
        FunctionIdentifier("ngram_shingles"),
        info("ngram_shingles", classOf[NGramShingles]),
        args => NGramShingles(args(0), intLit("ngram_shingles", args(1)))),
      (
        FunctionIdentifier("kmin_distinct"),
        info("kmin_distinct", classOf[KMinDistinct]),
        args => KMinDistinct(args(0), intLit("kmin_distinct", args(1)))),
      (
        FunctionIdentifier("log_histogram"),
        info("log_histogram", classOf[LogHistogram]),
        args => LogHistogram(args(0), intLit("log_histogram", args(1)))),
      (
        FunctionIdentifier("minhash_union"),
        info("minhash_union", classOf[MinHashUnion]),
        args => MinHashUnion(args(0), intLit("minhash_union", args(1)))))

  /** Runtime registration on an already-built session (idempotent —
    * re-registration overwrites with identical builders).
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    all.foreach { case (id, inf, builder) =>
      reg.registerFunction(id, inf, builder)
    }
  }
}
