package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext,
  ExprCode
}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `jaccard_ge(a, b)` for SORTED-ascending distinct int arrays: true iff
  * `(den+num)·|a ∩ b| >= num·(|a| + |b|)`, i.e. Jaccard(a, b) >= num/den —
  * the near-duplicate threshold predicate of the dedup lane
  * (q_dup_clusters / q_dup_clusters_star edge generation).
  *
  * Why an Expression and not `size(array_intersect(a,b))`: the built-in
  * intersect builds a hash set PER CANDIDATE PAIR (an allocation plus
  * O(|a|+|b|) hashing), and a blocked self-join evaluates the predicate
  * on ~|block|² pairs to keep ~none of them. This is a sorted-merge
  * count — no allocation — with an EARLY-ABORT bound: at merge position
  * (i, j) with c matches so far, the intersection can reach at most
  * `c + min(|a|-i, |b|-j)`; once that bound falls below the threshold
  * the pair is rejected without finishing the merge. For the dominant
  * disjoint pairs at threshold 0.9 the merge aborts ~5% in, so the
  * predicate costs ~1/20 of a full intersect exactly where almost all
  * the join's time goes. Same rearranged-integer-threshold trick as the
  * SQL twin (no float compare); sortedness is the caller's contract
  * (`sort_array` once per document, not per pair).
  *
  * VALUE CONTRACT: identical to
  * `size(array_intersect(a,b)) * (den+num) >= num * (size(a)+size(b))`
  * for sorted distinct inputs — the DuckDB twin keeps hash-matching.
  * Null contract: NULL iff either array is NULL; elements must be
  * non-null (hashed-gram arrays are).
  */
case class JaccardGE(left: Expression, right: Expression, num: Int, den: Int)
    extends BinaryExpression {

  require(num >= 0 && den > 0 && num <= den, s"bad threshold $num/$den")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<int>, array<int>) or " +
            s"(array<bigint>, array<bigint>), got ($l, $r)")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "jaccard_ge"

  private lazy val isLong: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    val need = num.toLong * (nx + ny) // threshold: (den+num)*c >= need
    val scale = (den + num).toLong
    var i = 0
    var j = 0
    var c = 0L
    var ok = false
    var done = false
    while (!done && i < nx && j < ny) {
      val xv = if (isLong) x.getLong(i) else x.getInt(i).toLong
      val yv = if (isLong) y.getLong(j) else y.getInt(j).toLong
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
      val bound = c + math.min(nx - i, ny - j)
      if (scale * c >= need) { ok = true; done = true }
      else if (scale * bound < need) done = true
    }
    ok || scale * c >= need
  }

  override protected def doGenCode(
      ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => {
        val nx = ctx.freshName("nx")
        val ny = ctx.freshName("ny")
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val c = ctx.freshName("c")
        val need = ctx.freshName("need")
        val bound = ctx.freshName("bound")
        val xv = ctx.freshName("xv")
        val yv = ctx.freshName("yv")
        val scale = (den + num).toLong
        val (jt, getter) =
          if (isLong) ("long", "getLong") else ("int", "getInt")
        s"""
           |int $nx = $a.numElements();
           |int $ny = $b.numElements();
           |long $need = ${num}L * ($nx + $ny);
           |int $i = 0; int $j = 0; long $c = 0L;
           |while ($i < $nx && $j < $ny) {
           |  $jt $xv = $a.$getter($i);
           |  $jt $yv = $b.$getter($j);
           |  if ($xv == $yv) { $c++; $i++; $j++; }
           |  else if ($xv < $yv) { $i++; } else { $j++; }
           |  if (${scale}L * $c >= $need) break;
           |  long $bound = $c + java.lang.Math.min($nx - $i, $ny - $j);
           |  if (${scale}L * $bound < $need) break;
           |}
           |${ev.value} = ${scale}L * $c >= $need;
         """.stripMargin
      })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): JaccardGE = copy(left = newLeft, right = newRight)
}

object JaccardGE {
  import org.apache.spark.sql.Column

  /** Column form: Jaccard(a, b) >= num/den for sorted distinct int arrays. */
  def jaccardGE(a: Column, b: Column, num: Int, den: Int): Column = {
    import org.apache.spark.sql.graft.Exprs
    Exprs.column(
      JaccardGE(Exprs.expression(a), Exprs.expression(b), num, den))
  }
}
