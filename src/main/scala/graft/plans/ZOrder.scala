package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext,
  ExprCode
}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
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

/** N-dimensional Morton (z-order) interleave — [[ZOrder2]] generalized
  * to 2–4 clustering columns, the arity real `OPTIMIZE ZORDER BY`
  * statements use. Bit `j` of dimension `i` lands at output position
  * `j * n + (n - 1 - i)` (dimension 0 owns the most significant bit of
  * each group), which for n = 2 reproduces ZOrder2's layout exactly.
  *
  * Input contract: longs whose LOW `bits` bits are the key (callers
  * rank-scale each dimension into `[0, 2^bits)` first); `n * bits`
  * must fit a positive long. The interleave is a fully unrolled
  * shift-mask-or chain inside whole-stage codegen — `n * bits` ALU ops
  * per row, paid once per OPTIMIZE rewrite. Null iff any input is
  * null. [[ZOrderN.sqlZOrder]] is the DuckDB bit-twin.
  */
case class ZOrderN(children: Seq[Expression], bits: Int)
    extends Expression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.size < 2 || children.size > 4)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName takes 2-4 dimensions, got ${children.size}")
    else if (bits < 1 || bits > 16 || bits * children.size > 63)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: bits=$bits with ${children.size} dims must " +
          "satisfy 1 <= bits <= 16 and dims*bits <= 63")
    else if (children.exists(_.dataType != LongType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires bigint dimensions, got " +
          children.map(_.dataType.simpleString).mkString(", "))
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "zordern"
  override def foldable: Boolean = children.forall(_.foldable)

  override def eval(input: InternalRow): Any = {
    val n = children.size
    var z = 0L
    var i = 0
    while (i < n) {
      val v = children(i).eval(input)
      if (v == null) return null
      val x = v.asInstanceOf[Long]
      var j = 0
      while (j < bits) {
        z |= ((x >> j) & 1L) << (j * n + (n - 1 - i))
        j += 1
      }
      i += 1
    }
    z
  }

  override protected def doGenCode(
      ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val n = children.size
    val evals = children.map(_.genCode(ctx))
    val terms = (for {
      i <- 0 until n
      j <- 0 until bits
    } yield s"${ev.value} |= ((${evals(i).value} >> $j) & 1L) << " +
      s"${j * n + (n - 1 - i)};").mkString("\n")
    val childCode = evals.map(_.code.toString).mkString("\n")
    val anyNull = evals.map(_.isNull.toString).mkString(" || ")
    ev.copy(code =
      code"""
        $childCode
        boolean ${ev.isNull} = $anyNull;
        long ${ev.value} = 0L;
        if (!${ev.isNull}) {
          $terms
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object ZOrderN {

  /** Column API: N-D z-order interleave of long columns' low `bits`
    * bits (see the class doc for the bit layout).
    */
  def zorder(
      cols: Seq[org.apache.spark.sql.Column],
      bits: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.Exprs
    Exprs.column(ZOrderN(cols.map(Exprs.expression), bits))
  }

  /** Reference interleave for tests: identical bit placement to eval. */
  def interleave(vals: Seq[Long], bits: Int): Long = {
    val n = vals.size
    var z = 0L
    for (i <- 0 until n; j <- 0 until bits)
      z |= ((vals(i) >> j) & 1L) << (j * n + (n - 1 - i))
    z
  }

  /** DuckDB SQL twin: the same unrolled shift-mask-or chain with SQL
    * bit operators (BIGINT `>> << & |` match Java long semantics at
    * these widths). `n * bits` terms — the oracle runs once at test SF.
    */
  def sqlZOrder(cols: Seq[String], bits: Int): String = {
    val n = cols.size
    val terms = for {
      i <- 0 until n
      j <- 0 until bits
    } yield s"(((CAST(${cols(i)} AS BIGINT) >> $j) & 1) << " +
      s"${j * n + (n - 1 - i)})"
    terms.mkString("(", " | ", ")")
  }
}
