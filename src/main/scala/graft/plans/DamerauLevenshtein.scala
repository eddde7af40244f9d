package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext,
  ExprCode
}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `damerau_levenshtein(a, b)` — UNRESTRICTED Damerau-Levenshtein edit
  * distance (Lowrance–Wagner): minimum number of insertions, deletions,
  * substitutions and transpositions of adjacent characters, where a
  * transposed pair MAY be edited again afterwards. This is the variant
  * DuckDB's `damerau_levenshtein` implements (discriminator:
  * d("CA","ABC") = 2 here vs 3 under the restricted optimal-string-
  * alignment variant), so the oracle twin hash-matches by construction.
  *
  * Why an Expression: Spark ships only plain `levenshtein`; the fuzzy-
  * matching lane wants the transposition-aware distance (typo pairs like
  * "recieve"/"receive" are distance 1 here, 2 under Levenshtein) without
  * leaving whole-stage codegen for a Scala UDF. The generated code calls
  * the static kernel below — one JVM static call per pair, no boxing, no
  * Row encoding, exactly how Spark's own `levenshtein` rides
  * `UTF8String.levenshteinDistance`.
  *
  * Cost/contract: O(|a|·|b|) time AND space per pair (the full matrix is
  * required — the transposition recurrence reaches back to arbitrary
  * earlier rows via the last-occurrence index, so the two-row trick of
  * plain Levenshtein does not apply). Inputs longer than
  * [[DamerauLevenshtein.MaxLen]] fail with a clear runtime error rather
  * than OOM-ing an executor; cap compared prefixes the way the
  * q_edit_distance lane does. Distance is measured in
  * UTF-16 code units, identical to codepoints on the BMP; the query
  * lanes feed normalized ASCII, where Spark and DuckDB agree char-for-
  * char. Null contract: NULL iff either input is NULL.
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (string, string), got ($l, $r)")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "damerau_levenshtein"

  override def nullSafeEval(a: Any, b: Any): Any =
    DamerauLevenshtein.distance(
      a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(
      ctx,
      ev,
      (a, b) => s"graft.plans.DamerauLevenshtein.distance($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}

object DamerauLevenshtein {
  import org.apache.spark.sql.Column

  /** Static kernel shared by interpreted eval and generated code.
    *
    * Lowrance–Wagner DP over an (n+2)×(m+2) matrix with an ∞ border row/
    * column and a last-occurrence index per character: `da` maps each
    * character of `a` to the last row where it appeared, `db` tracks the
    * last column of the current row matching `b`. The transposition term
    * `H[i1-1][j1-1] + (i-i1-1) + 1 + (j-j1-1)` (in border-offset
    * coordinates below) prices deleting the characters strictly between
    * the transposed pair, which is what distinguishes the unrestricted
    * variant from optimal string alignment.
    */
  /** Hard per-input length bound: the kernel allocates a full
    * (n+2)×(m+2) int matrix per ROW, so unbounded ad-hoc SQL over long
    * document text would OOM an executor (2048² ≈ 17 MB per evaluation ×
    * one per task thread is the ceiling we accept). Edit distance over
    * longer text is the wrong tool anyway — prefix-cap with
    * `substring(col, 1, k)` (in-repo callers cap at 24) or use the
    * shingle/MinHash lanes.
    */
  val MaxLen: Int = 2048

  def distance(ua: UTF8String, ub: UTF8String): Int = {
    val a = ua.toString
    val b = ub.toString
    val n = a.length
    val m = b.length
    if (n > MaxLen || m > MaxLen)
      throw new IllegalArgumentException(
        s"damerau_levenshtein: input length ${math.max(n, m)} exceeds the " +
          s"$MaxLen-char bound (O(n*m) matrix per row); prefix-cap with " +
          "substring(col, 1, k) or use the shingle/MinHash similarity lanes")
    if (n == 0) return m
    if (m == 0) return n
    val inf = n + m
    // flat (n+2)*(m+2) matrix, index (i,j) -> i*(m+2)+j
    val w = m + 2
    val h = new Array[Int]((n + 2) * w)
    h(0) = inf
    var i = 0
    while (i <= n) { h((i + 1) * w) = inf; h((i + 1) * w + 1) = i; i += 1 }
    var j = 0
    while (j <= m) { h(j + 1) = inf; h(w + j + 1) = j; j += 1 }
    // last-occurrence row per character of `a` (0 = never seen)
    val da = new java.util.HashMap[Character, Integer]()
    i = 1
    while (i <= n) {
      var db = 0
      val ai = a.charAt(i - 1)
      j = 1
      while (j <= m) {
        val bj = b.charAt(j - 1)
        val i1: Int = { val v = da.get(bj); if (v == null) 0 else v.intValue }
        val j1 = db
        var cost = 1
        if (ai == bj) { cost = 0; db = j }
        val sub = h(i * w + j) + cost
        val ins = h((i + 1) * w + j) + 1
        val del = h(i * w + j + 1) + 1
        val trans = h(i1 * w + j1) + (i - i1 - 1) + 1 + (j - j1 - 1)
        var best = sub
        if (ins < best) best = ins
        if (del < best) best = del
        if (trans < best) best = trans
        h((i + 1) * w + j + 1) = best
        j += 1
      }
      da.put(ai, i)
      i += 1
    }
    h((n + 1) * w + m + 1)
  }

  /** Column form. */
  def damerau(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.Exprs
    Exprs.column(
      DamerauLevenshtein(Exprs.expression(a), Exprs.expression(b)))
  }
}
