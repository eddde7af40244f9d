package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext,
  ExprCode
}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (z-order) interleave of two 16-bit keys — the clustering key
  * behind multi-dimensional data layout (Delta/Iceberg `OPTIMIZE
  * ZORDER BY`): sorting by the interleaved bits places rows close in
  * BOTH dimensions into the same files, so min/max footer stats prune
  * 2-D range predicates instead of only the leading sort column.
  *
  * Input contract: two longs, of which the LOW 16 BITS are the key
  * (higher bits are masked off — callers bucket their dimension into
  * [0, 2^16) first). Output: the 32-bit interleave, left's bits in the
  * odd (higher) positions. Pure bit arithmetic — the classic
  * shift-or-mask spread — in a native `doGenCode`, so the clustering
  * key costs a few ALU ops per row inside whole-stage codegen at
  * 100 TB sort time. Null iff either input is null.
  *
  * The DuckDB twin ([[ZOrder2.sqlZOrder]]) computes the identical
  * arithmetic with SQL bit operators, so layout queries hash-match.
  */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (bigint, bigint), got ($l, $r)")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder2"

  override def nullSafeEval(a: Any, b: Any): Any =
    (ZOrder2.spread16(a.asInstanceOf[Long]) << 1) |
      ZOrder2.spread16(b.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => {
        val x = ctx.freshName("zx")
        val y = ctx.freshName("zy")
        def steps(v: String): String =
          s"""
             |$v &= 0xFFFFL;
             |$v = ($v | ($v << 8)) & 0x00FF00FFL;
             |$v = ($v | ($v << 4)) & 0x0F0F0F0FL;
             |$v = ($v | ($v << 2)) & 0x33333333L;
             |$v = ($v | ($v << 1)) & 0x55555555L;
           """.stripMargin
        s"""
           |long $x = $a;
           |long $y = $b;
           |${steps(x)}
           |${steps(y)}
           |${ev.value} = ($x << 1) | $y;
         """.stripMargin
      })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrder2 {

  /** Spread the low 16 bits of v to the even bit positions of a 32-bit
    * value (the classic Morton shift-or-mask cascade).
    */
  def spread16(v0: Long): Long = {
    var v = v0 & 0xffffL
    v = (v | (v << 8)) & 0x00ff00ffL
    v = (v | (v << 4)) & 0x0f0f0f0fL
    v = (v | (v << 2)) & 0x33333333L
    v = (v | (v << 1)) & 0x55555555L
    v
  }

  /** Column API: z-order interleave of two long columns' low 16 bits. */
  def zorder(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.Exprs
    Exprs.column(ZOrder2(Exprs.expression(a), Exprs.expression(b)))
  }

  /** DuckDB SQL twin: identical spread cascade with SQL bit operators.
    * Textual nesting doubles per step; with a column-name leaf the full
    * fragment stays ~1 KB — the oracle runs once at test SF.
    */
  def sqlZOrder(a: String, b: String): String = {
    def spread(e0: String): String = {
      var e = s"(CAST($e0 AS BIGINT) & 65535)"
      for ((sh, mask) <- Seq(
          (8, 16711935L), // 0x00FF00FF
          (4, 252645135L), // 0x0F0F0F0F
          (2, 858993459L), // 0x33333333
          (1, 1431655765L) // 0x55555555
        )) e = s"(($e | ($e << $sh)) & $mask)"
      e
    }
    s"((${spread(a)} << 1) | ${spread(b)})"
  }
}
