package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import java.nio.ByteBuffer

/** Custom `TypedImperativeAggregate`: the k smallest DISTINCT long
  * values of a column, returned as a sorted ascending array — the state
  * a KMV (k-minimum-values) cardinality sketch needs.
  *
  * Why imperative: the buffer is a bounded sorted primitive array
  * mutated in place. Once full, every row larger than the current k-th
  * minimum is rejected with ONE comparison, so a partition's pass over
  * n rows costs O(n) with only the ≤k kept rows paying the
  * binary-search insert. Map-side partials cap every partition's
  * contribution at k values, the shuffle carries O(k · groups ·
  * partitions) longs, and merge is a sorted-array merge — the sketch
  * never ships the row stream, which is what a 100 TB cardinality
  * estimate requires. The dedup is internal (binary search hits skip),
  * so no `distinct()` pre-shuffle is needed either.
  *
  * The declarative alternative — DISTINCT then rank-and-filter — is
  * exactly what the DuckDB oracle runs, proving value-equivalence.
  *
  * Reference analogue: opusdb's bounded fold-into-state shape
  * (/root/reference/src/opusdb/atomic/stm.clj:42-53) — state strictly
  * smaller than its inputs, merged associatively.
  */
case class KMinDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KMinDistinct.Buf] {

  import KMinDistinct.Buf

  override def createAggregationBuffer(): Buf =
    new Buf(new Array[Long](k), 0)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long], k)
    buf
  }

  override def merge(b1: Buf, b2: Buf): Buf = {
    var i = 0
    while (i < b2.n) { b1.insert(b2.arr(i), k); i += 1 }
    b1
  }

  override def eval(buf: Buf): Any =
    new GenericArrayData(java.util.Arrays.copyOf(buf.arr, buf.n))

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.arr(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val arr = new Array[Long](k)
    var i = 0
    while (i < n) { arr(i) = bb.getLong(); i += 1 }
    new Buf(arr, n)
  }

  // Analysis-time type gate: update() casts straight to Long, so a
  // non-bigint child must fail analysis, not ClassCastException at run.
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a bigint child, got $other")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "kmin_distinct"

  override def withNewMutableAggBufferOffset(o: Int): KMinDistinct =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KMinDistinct =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object KMinDistinct {

  /** Sorted ascending array of the n smallest distinct values seen;
    * n ≤ k. Mutable on purpose — one instance per aggregation buffer.
    */
  final class Buf(val arr: Array[Long], var n: Int) {
    /** Insert v keeping the array sorted, distinct, and capped at k. */
    def insert(v: Long, k: Int): Unit = {
      if (n == k && v >= arr(n - 1)) return // cheap common-case reject
      var lo = 0
      var hi = n
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (arr(mid) < v) lo = mid + 1 else hi = mid
      }
      if (lo < n && arr(lo) == v) return // duplicate
      val last = if (n == k) n - 1 else n
      var i = last
      while (i > lo) { arr(i) = arr(i - 1); i -= 1 }
      arr(lo) = v
      if (n < k) n += 1
    }
  }

  /** Column API: the group's k smallest distinct values of a long
    * column, sorted ascending (fewer if the group has < k distinct).
    */
  def kmin(c: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.Exprs
    Exprs.column(KMinDistinct(Exprs.expression(c), k).toAggregateExpression())
  }
}
