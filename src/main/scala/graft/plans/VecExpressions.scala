package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext,
  ExprCode
}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the embedding hot path.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) are
  * CodegenFallback: every element evaluation goes through the
  * interpreted lambda machinery with boxing. A 64-dim dot product per
  * candidate pair is exactly the shape that suffers most, so these are
  * native `BinaryExpression`s with `doGenCode` — a tight primitive loop
  * inside whole-stage codegen, no allocation, no boxing (SURVEY.md §7.4:
  * custom expressions only on measured need; the similarity queries are
  * that need).
  *
  * VALUE CONTRACT: bit-identical to the HOF formulation in
  * [[graft.functions.Hashing.dot]] — left-to-right double accumulation
  * `((0 + p0) + p1) + …` with f32→f64 widening (exact) per element, so
  * swapping one for the other never changes a query result, and the
  * DuckDB oracle (same sequential fold) keeps hash-matching.
  *
  * Null contract: result is NULL iff either ARRAY is null (standard
  * BinaryExpression null-intolerance). Array ELEMENTS must be non-null —
  * the embeddings testdata and any sane vector store guarantee this;
  * the HOF form would instead poison the sum to NULL.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<float>, array<float>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(
      ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Dot product of a DOUBLE plane (precomputed literal) against a FLOAT
  * vector: `acc += plane[i] * (double) vec[i]` — the LSH hyperplane
  * projection. Same value contract as [[FloatVecDot]], mirroring
  * `zip_with(plane, v, (p, x) => p * x.cast(double))` + ordered fold.
  */
case class PlaneVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<double>, array<float>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "plane_vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val p = a.asInstanceOf[ArrayData]
    val x = b.asInstanceOf[ArrayData]
    val n = math.min(p.numElements(), x.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += p.getDouble(i) * x.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(
      ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += $a.getDouble($i) * ((double) $b.getFloat($i));
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
