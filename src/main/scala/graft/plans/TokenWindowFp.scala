package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{
  Expression,
  Generator,
  UnaryExpression
}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom table-valued Generator: the polynomial fingerprint of every
  * `win`-token sliding window of a token array, as rows — the kernel of
  * exact-substring-duplication dedup (the train-set contamination class
  * minhash misses: a verbatim token span copied between otherwise-
  * different documents).
  *
  * VALUE CONTRACT (the DuckDB twin computes the identical numbers):
  *   th(t)  = fold over t's ASCII codes:  a ← (a·31 + code)  mod P
  *   wh(i)  = fold over th(i..i+win−1):   a ← (a·31 + th)    mod P
  * with P = [[graft.functions.Hashing.FpPrime]] ≈ 1e17, so every step
  * stays under 2⁶³ (a·31 ≤ 3.2e18) on BOTH engines — DuckDB raises on
  * BIGINT overflow rather than wrapping, which makes the shared bound
  * load-bearing. ASCII-only contract as for `fingerprint` (callers feed
  * `[a-z0-9]` token streams). A doc with fewer than `win` tokens yields
  * ONE window over all its tokens (even zero → fingerprint 0); a NULL
  * array yields no rows (explode semantics).
  *
  * Why a Generator instead of the HOF pipeline: the per-window md5/HOF
  * route evaluates interpreted lambda machinery per window (measured
  * ~6 s at sf0.1); here the per-token fingerprints are computed ONCE per
  * document in a tight JVM loop and each window is `win` multiply-adds —
  * plain long arithmetic, no per-window allocation but the emitted row.
  * Eval-mode (CodegenFallback) is the right trade for the same reason as
  * [[NGramShingles]]: GenerateExec only codegens CollectionGenerators,
  * which must still build the whole array.
  *
  * Reference analogue: the windowed-scan loop a native dedup kernel runs
  * per document; in Spark it distributes as a Generate over the scan,
  * partition-locally (no shuffle).
  */
case class TokenWindowFp(child: Expression, win: Int)
    extends UnaryExpression
    with Generator
    with CodegenFallback {
  require(win >= 1, s"window width must be >= 1, got $win")

  private val P = graft.functions.Hashing.FpPrime

  override def elementSchema: StructType =
    StructType(StructField("wh", LongType) :: Nil)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>, got $t")
    }

  override def prettyName: String = "token_window_fp"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      // per-token fingerprints, once per document
      val th = new Array[Long](n)
      var k = 0
      while (k < n) {
        val tok = arr.getUTF8String(k)
        var a = 0L
        if (tok != null) {
          val bytes = tok.getBytes
          var b = 0
          while (b < bytes.length) {
            a = (a * 31L + (bytes(b) & 0xffL)) % P
            b += 1
          }
        }
        th(k) = a
        k += 1
      }
      val count = math.max(n - win + 1, 1)
      Iterator.tabulate(count) { i =>
        var a = 0L
        var j = i
        val hi = math.min(i + win, n)
        while (j < hi) {
          a = (a * 31L + th(j)) % P
          j += 1
        }
        InternalRow(a)
      }
    }
  }

  override protected def withNewChildInternal(
      newChild: Expression): TokenWindowFp = copy(child = newChild)
}
