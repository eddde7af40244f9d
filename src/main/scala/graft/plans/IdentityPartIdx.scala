package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext,
  ExprCode
}
import org.apache.spark.sql.types._

/** The identity partition transform's index: the column's own integer
  * value ([[graft.streaming.MergeSink.partIdxExprOn]]).
  *
  * Exists because a plain `CAST(col AS INT)` cannot express this for
  * every identity-partitionable type under ANSI: DATE→INT is forbidden
  * at the SQL level, yet Spark's INTERNAL representation of a DATE is
  * exactly the epoch-day int — the same value `days(col)` computes and
  * the same value the driver-side prune ([[graft.streaming.MergeSink
  * .partIdxOf]]) derives. Dispatching on the child's resolved type
  * keeps one codegen'd expression serving INT/SHORT/BYTE/DATE
  * (pass-through or widen) and BIGINT (ANSI-faithful: out-of-int-range
  * raises rather than silently truncating into the wrong partition).
  */
case class IdentityPartIdx(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case IntegerType | DateType | ShortType | ByteType | LongType =>
      TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an integral or DATE column, got ${t.sql}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "identity_part_idx"

  override def nullSafeEval(v: Any): Any = v match {
    case i: Int => i // INT and DATE (internal epoch days)
    case s: Short => s.toInt
    case b: Byte => b.toInt
    case l: Long =>
      if (l != l.toInt)
        throw new ArithmeticException(
          s"identity partition index out of int range: $l")
      else l.toInt
  }

  override protected def doGenCode(
      ctx: CodegenContext,
      ev: ExprCode): ExprCode = child.dataType match {
    case LongType =>
      nullSafeCodeGen(ctx, ev, c => s"""
        |if ($c != (int) $c) {
        |  throw new ArithmeticException(
        |    "identity partition index out of int range: " + $c);
        |}
        |${ev.value} = (int) $c;
        |""".stripMargin)
    case _ =>
      defineCodeGen(ctx, ev, c => s"(int) ($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): IdentityPartIdx = copy(child = newChild)
}
