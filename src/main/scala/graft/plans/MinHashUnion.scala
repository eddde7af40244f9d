package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import java.nio.ByteBuffer

/** Custom `TypedImperativeAggregate` (SURVEY.md §7.4's named fallback):
  * the MinHash-signature UNION aggregator. Input: one k-component
  * signature (array<long>) per document; buffer: the running
  * elementwise minimum — which is exactly the MinHash signature of the
  * UNION of the documents' shingle sets (min is associative/commutative,
  * so map-side partials and any merge order give the identical result).
  * Output: the k-component corpus-level signature.
  *
  * Why imperative: the buffer is a fixed k-long primitive array mutated
  * in place per row — no per-row allocation, no catalyst row conversion,
  * and a compact flat serialization between partial and final
  * aggregation. The declarative alternative (k separate `min()` columns)
  * is what the DuckDB oracle uses, proving value-equivalence.
  *
  * Reference analogue: opusdb's bounded fold-into-state shape
  * (/root/reference/src/opusdb/atomic/stm.clj:42-53) — state strictly
  * smaller than its inputs, merged associatively.
  */
case class MinHashUnion(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr != null) {
      val n = math.min(k, arr.numElements())
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val v = arr.getLong(i)
          if (v < buf(i)) buf(i) = v
        }
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) {
      if (b2(i) < b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * k)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong())
  }

  // Analysis-time type gate: update() reads the child as array<bigint>;
  // anything else must fail analysis, not CCE mid-job (the KMinDistinct
  // / ZOrder2 discipline).
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<bigint> child, got $other")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "minhash_union"

  override def withNewMutableAggBufferOffset(o: Int): MinHashUnion =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashUnion =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MinHashUnion {
  /** Column API: aggregate a per-row array<long> signature column into
    * the group's union signature.
    */
  def union(sig: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.Exprs
    Exprs.column(
      MinHashUnion(Exprs.expression(sig), k).toAggregateExpression())
  }
}
