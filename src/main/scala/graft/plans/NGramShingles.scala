package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{
  Expression,
  Generator,
  UnaryExpression
}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom table-valued Generator (UDTF): emits the character n-gram
  * shingles of a string as ROWS, completing the custom-Catalyst
  * extension-point matrix (expression, aggregate, typed-imperative
  * aggregate, logical plan + strategy + exec, optimizer rule — and now
  * generator).
  *
  * VALUE CONTRACT: row-for-row identical to
  * `explode(graft.functions.Hashing.shingles(c, n))` — positions
  * 1..max(numChars−n+1, 1), each shingle `substring(c, i, n)` with
  * Spark's codepoint semantics (UTF8String.substringSQL, the same
  * routine the built-in Substring expression calls), so the DuckDB
  * `unnest(list_transform(range(...), substr))` twin stays hash-exact.
  * A string shorter than n (including "") yields ONE shingle — the
  * whole string; a NULL input yields no rows (explode semantics).
  *
  * Why a Generator instead of the HOF pipeline: `sequence` +
  * `transform` materialize an intermediate array per row and evaluate
  * the lambda through the interpreted HOF machinery;
  * the generator streams rows straight out of one UTF8String with no
  * intermediate array. Eval-mode (CodegenFallback): GenerateExec only
  * codegens CollectionGenerators, which must still build the array —
  * the allocation-free iterator is the better trade.
  *
  * Reference analogue: the shingle loop a native engine would run
  * per-document in its dedup kernel; in Spark it distributes as a
  * Generate node over the scan partition-locally (no shuffle).
  */
case class NGramShingles(child: Expression, n: Int)
    extends UnaryExpression
    with Generator
    with CodegenFallback {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def elementSchema: StructType =
    StructType(StructField("shingle", StringType) :: Nil)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string input, got $t")
    }

  override def prettyName: String = "ngram_shingles"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val s = v.asInstanceOf[UTF8String]
      val bytes = s.getBytes
      // One pass over the UTF-8 bytes: byte offset of every codepoint
      // start (+ end sentinel), then each shingle i is the byte slice
      // [starts(i), starts(i+n)). substringSQL would rescan from byte 0
      // per shingle — O(L^2) per document; this is O(L).
      val nChars = s.numChars()
      val starts = new Array[Int](nChars + 1)
      var b = 0
      var c = 0
      while (b < bytes.length) {
        starts(c) = b
        b += UTF8String.numBytesForFirstByte(bytes(b))
        c += 1
      }
      starts(nChars) = bytes.length
      val count = math.max(nChars - n + 1, 1)
      Iterator.tabulate(count) { i =>
        val lo = starts(i)
        val hi = starts(math.min(i + n, nChars))
        InternalRow(UTF8String.fromBytes(bytes, lo, hi - lo))
      }
    }
  }

  override protected def withNewChildInternal(
      newChild: Expression): NGramShingles = copy(child = newChild)
}
