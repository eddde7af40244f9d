package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import java.nio.ByteBuffer

/** Custom `TypedImperativeAggregate`: a MERGEABLE log-scale histogram
  * over non-negative longs — the bounded-state quantile sketch a
  * 100 TB percentile query needs (the exact order statistics in
  * q_quantiles_exact shuffle the row stream; this never does).
  *
  * Bucketing is pure integer bit-math, so it is deterministic and
  * reproducible in ANY engine (the DuckDB oracle recomputes identical
  * buckets from SQL `bin()`/shifts — the sketch output hash-compares
  * exactly, the same discipline as [[KMinDistinct]]):
  *
  *   e = floor(log2 x)             (63 - numberOfLeadingZeros)
  *   d = max(e - S, 0)             (sub-bucket shift)
  *   bucket(x) = d * 2^S + (x >> d)
  *
  * Values below 2^S map to themselves (exact); above, each power-of-two
  * decade splits into 2^S sub-buckets, so a bucket's width is at most
  * 2^-S of its lower bound — a ≤ 1/2^S relative-error guarantee on any
  * picked quantile, asserted in SketchAccuracySpec. Bucket count is
  * bounded by (63-S)·2^S + 2^(S+1) (1,920 for S=5) regardless of data
  * size or distribution.
  *
  * Why imperative: the buffer is a dense primitive count array mutated
  * in place — one array index per row, no per-row allocation. Map-side
  * partials cap every partition's contribution at the fixed bucket
  * count, the shuffle carries O(buckets · groups · partitions) longs
  * (data-size independent), and merge is elementwise addition —
  * associative and commutative, so the result is partition-order
  * independent (what makes the cross-engine gate possible at all;
  * a GK/KLL sketch is merge-order dependent and could not be gated).
  *
  * Reference analogue: opusdb's bounded fold-into-state shape
  * (/root/reference/src/opusdb/atomic/stm.clj:42-53) — state strictly
  * smaller than its inputs, merged associatively.
  */
case class LogHistogram(
    child: Expression,
    shift: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  private val nBuckets = LogHistogram.maxBuckets(shift)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](nBuckets)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      buf(LogHistogram.bucketOf(v.asInstanceOf[Long], shift)) += 1L
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < nBuckets) { b1(i) += b2(i); i += 1 }
    b1
  }

  /** Sorted array of (bucket, count) structs, zero buckets omitted. */
  override def eval(buf: Array[Long]): Any = {
    var nz = 0
    var i = 0
    while (i < nBuckets) { if (buf(i) != 0L) nz += 1; i += 1 }
    val out = new Array[Any](nz)
    var j = 0
    i = 0
    while (i < nBuckets) {
      if (buf(i) != 0L) { out(j) = InternalRow(i.toLong, buf(i)); j += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }

  // Sparse wire format: count of nonzero entries, then (index, count)
  // pairs — a partition that saw one group ships O(distinct buckets).
  override def serialize(buf: Array[Long]): Array[Byte] = {
    var nz = 0
    var i = 0
    while (i < nBuckets) { if (buf(i) != 0L) nz += 1; i += 1 }
    val bb = ByteBuffer.allocate(4 + 12 * nz)
    bb.putInt(nz)
    i = 0
    while (i < nBuckets) {
      if (buf(i) != 0L) { bb.putInt(i); bb.putLong(buf(i)) }
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new Array[Long](nBuckets)
    var i = 0
    while (i < n) { buf(bb.getInt()) = bb.getLong(); i += 1 }
    buf
  }

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a bigint child, got $other")
    }

  override def dataType: DataType = ArrayType(
    StructType(
      Seq(
        StructField("bucket", LongType, nullable = false),
        StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "log_histogram"

  override def withNewMutableAggBufferOffset(o: Int): LogHistogram =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): LogHistogram =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): LogHistogram = copy(child = c.head)
}

object LogHistogram {

  /** Bucket count bound for sub-bucket shift S (positive longs have
    * exponents 0..62; each of the ≤ 63-S high decades contributes 2^S
    * buckets, the exact low range contributes 2^(S+1)).
    */
  def maxBuckets(shift: Int): Int =
    ((63 - shift) << shift) + (1 << (shift + 1))

  /** Integer-only bucket index; non-positive values collapse to 0. */
  def bucketOf(x: Long, shift: Int): Int = {
    if (x <= 0L) 0
    else {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(x)
      val d = math.max(e - shift, 0)
      ((d << shift) + (x >> d)).toInt
    }
  }

  /** Lower bound of a bucket's value range — the sketch's quantile
    * estimate (type-1 lower quantile of the bucketed distribution).
    */
  def lowerBound(bucket: Long, shift: Int): Long = {
    val t = bucket >> shift
    if (t <= 1L) bucket
    else (bucket - ((t - 1L) << shift)) << (t - 1L).toInt
  }

  /** Exclusive-width of a bucket (1 for the exact low range). */
  def bucketWidth(bucket: Long, shift: Int): Long = {
    val t = bucket >> shift
    if (t <= 1L) 1L else 1L << (t - 1L).toInt
  }

  /** Column API: the group's log-scale histogram of a long column as a
    * sorted array<struct<bucket:bigint, cnt:bigint>>.
    */
  def logHist(c: org.apache.spark.sql.Column, shift: Int)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.Exprs
    Exprs.column(
      LogHistogram(Exprs.expression(c), shift).toAggregateExpression())
  }
}
