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

  /** Like [[intLit]] but range-checked: these literals size bounded
    * aggregation buffers, so an out-of-range value must die HERE at
    * analysis time (the failure the doc above promises), not as a
    * NegativeArraySize/ArrayIndexOutOfBounds mid-aggregation.
    */
  private def intLitIn(fn: String, e: Expression, lo: Int, hi: Int): Int = {
    val v = intLit(fn, e)
    if (v < lo || v > hi)
      throw new IllegalArgumentException(
        s"$fn: parameter must be in [$lo, $hi], got $v")
    v
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
        args => NGramShingles(args(0), intLitIn("ngram_shingles", args(1), 1, 64))),
      (
        FunctionIdentifier("kmin_distinct"),
        info("kmin_distinct", classOf[KMinDistinct]),
        args => KMinDistinct(args(0), intLitIn("kmin_distinct", args(1), 1, 1 << 22))),
      (
        FunctionIdentifier("log_histogram"),
        info("log_histogram", classOf[LogHistogram]),
        // shift > 20 overflows maxBuckets' Int shift arithmetic (and a
        // multi-million-bucket dense buffer is never what you meant)
        args => LogHistogram(args(0), intLitIn("log_histogram", args(1), 0, 20))),
      (
        FunctionIdentifier("minhash_union"),
        info("minhash_union", classOf[MinHashUnion]),
        args => MinHashUnion(args(0), intLitIn("minhash_union", args(1), 1, 1 << 22))),
      (
        FunctionIdentifier("token_window_fp"),
        info("token_window_fp", classOf[TokenWindowFp]),
        // window > 4096 tokens is never a substring-dedup shape (and the
        // per-window cost is linear in it)
        args => TokenWindowFp(args(0), intLitIn("token_window_fp", args(1), 1, 4096))),
      (
        FunctionIdentifier("damerau_levenshtein"),
        info("damerau_levenshtein", classOf[DamerauLevenshtein]),
        args => DamerauLevenshtein(args(0), args(1))),
      (
        FunctionIdentifier("jaccard_ge"),
        info("jaccard_ge", classOf[JaccardGE]),
        // threshold num/den are literals: they bake into the generated
        // early-abort bound (den validated > 0, num <= den in the ctor)
        args => JaccardGE(
          args(0),
          args(1),
          intLitIn("jaccard_ge", args(2), 0, 1 << 20),
          intLitIn("jaccard_ge", args(3), 1, 1 << 20))))

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
