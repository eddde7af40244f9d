package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic hashing / similarity primitives.
  *
  * Every helper here has a Spark `Column` form and a DuckDB SQL-fragment
  * twin that computes the bit-identical value, so dedup/similarity
  * queries can be verified exactly against the oracle. The common
  * foundation is md5 (identical on both engines) with the first 8 hex
  * chars parsed as a 32-bit integer — enough for minhash/LSH buckets.
  *
  * Scale stance: all of these are per-row scalar expressions that stay
  * inside whole-stage codegen (built-in functions only, no UDFs), so
  * they distribute trivially: the only shuffles in the dedup/similarity
  * pipelines are the groupBys on bucket keys.
  */
object Hashing {

  /** 32-bit hash of a string with a seed: int of md5(seed:s)[0,8). */
  def h32(seed: Int, c: Column): Column =
    conv(substring(md5(concat(lit(seed.toString), lit(":"), c)), 1, 8), 16, 10)
      .cast("long")

  def sqlH32(seed: Int, expr: String): String =
    s"CAST(('0x' || substr(md5($seed || ':' || $expr), 1, 8)) AS BIGINT)"

  /** Character n-gram shingles of a string column (keeps duplicates —
    * harmless for minhash, and cheaper than a distinct).
    */
  def shingles(c: Column, n: Int): Column =
    transform(
      sequence(lit(1), greatest(length(c) - (n - 1), lit(1))),
      i => substring(c, i, lit(n))
    )

  def sqlShingles(expr: String, n: Int): String =
    s"list_transform(range(1, greatest(len($expr) - ${n - 1}, 1) + 1), " +
      s"i -> substr($expr, i, $n))"

  /** Shingles as ROWS via the custom table-valued Generator
    * [[graft.plans.NGramShingles]] — row-identical to
    * `explode(shingles(c, n))` but streamed without the intermediate
    * array (see the Generator's scaladoc for the value contract).
    */
  def ngramShingles(c: Column, n: Int): Column = {
    import org.apache.spark.sql.graft.Exprs
    Exprs.column(graft.plans.NGramShingles(Exprs.expression(c), n))
  }

  /** Sliding-window polynomial fingerprints as ROWS via the custom
    * table-valued Generator [[graft.plans.TokenWindowFp]] — the
    * exact-substring-dedup kernel (see the Generator's scaladoc for the
    * value contract and the cross-engine overflow bound).
    */
  def tokenWindowFp(toks: Column, win: Int): Column = {
    import org.apache.spark.sql.graft.Exprs
    Exprs.column(graft.plans.TokenWindowFp(Exprs.expression(toks), win))
  }

  /** Minhash component j: min over shingles of h32(j, shingle). */
  def minhash(sh: Column, seed: Int): Column =
    array_min(transform(sh, s => h32(seed, s)))

  def sqlMinhash(shExpr: String, seed: Int): String =
    s"list_min(list_transform($shExpr, s -> ${sqlH32(seed, "s")}))"

  /** One md5 digest per (seed, shingle): the 128-bit digest carries FOUR
    * independent 32-bit lanes (hex chars [8w, 8w+8) for lane w), so a
    * 16-component minhash signature costs 4 md5 calls per shingle, not
    * 16. The md5 array is materialized once per row and the four cheap
    * lane-min passes read it (CollapseProject keeps non-cheap aliases
    * referenced more than once from being inlined).
    */
  def md5Lanes(sh: Column, seed: Int): Column =
    transform(sh, x => md5(concat(lit(seed.toString), lit(":"), x)))

  def sqlMd5Lanes(shExpr: String, seed: Int): String =
    s"list_transform($shExpr, x -> md5($seed || ':' || x))"

  /** Min over shingles of 32-bit lane w of a [[md5Lanes]] digest array. */
  def laneMin(md5s: Column, w: Int): Column =
    array_min(
      transform(md5s, h => conv(substring(h, 1 + 8 * w, 8), 16, 10).cast("long")))

  def sqlLaneMin(md5Expr: String, w: Int): String =
    s"list_min(list_transform($md5Expr, " +
      s"h -> CAST(('0x' || substr(h, ${1 + 8 * w}, 8)) AS BIGINT)))"

  /** Distinct word bigrams of a token-array column — the gram set the
    * near-dup Jaccard queries compare. A single-token doc contributes
    * its lone token as the only "gram" on both engines (concat_ws skips
    * the null second element; the sequence upper bound is clamped to 1).
    */
  def wordBigrams(toks: Column): Column =
    array_distinct(
      transform(
        sequence(lit(1), greatest(size(toks) - 1, lit(1))),
        i =>
          concat_ws(
            " ",
            try_element_at(toks, i),
            try_element_at(toks, i + 1))))

  def sqlWordBigrams(toksExpr: String): String =
    s"list_distinct(list_transform(" +
      s"range(1, greatest(len($toksExpr) - 1, 1) + 1), " +
      s"i -> concat_ws(' ', $toksExpr[i], $toksExpr[i + 1])))"

  /** Word trigrams of a token-array column, NON-distinct (the
    * repetition metrics need total vs distinct gram counts). Same
    * short-doc contract as [[wordBigrams]]: out-of-range elements are
    * null and concat_ws skips them on both engines, so a ≤2-token doc
    * contributes exactly one (degenerate) gram.
    */
  def wordTrigrams(toks: Column): Column =
    transform(
      sequence(lit(1), greatest(size(toks) - 2, lit(1))),
      i =>
        concat_ws(
          " ",
          try_element_at(toks, i),
          try_element_at(toks, i + 1),
          try_element_at(toks, i + 2)))

  def sqlWordTrigrams(toksExpr: String): String =
    s"list_transform(" +
      s"range(1, greatest(len($toksExpr) - 2, 1) + 1), " +
      s"i -> concat_ws(' ', $toksExpr[i], $toksExpr[i + 1], $toksExpr[i + 2]))"

  /** Word tokens: lowercase alnum runs (the BPE-ish tokenizer of the
    * text pipeline; identical regex class on both engines).
    */
  def tokens(c: Column): Column =
    regexp_extract_all(lower(c), lit("[a-z0-9]+"), lit(0))

  val sqlTokens: String => String =
    expr => s"regexp_extract_all(lower($expr), '[a-z0-9]+')"

  /** Polynomial rolling-hash fingerprint of a whole string, mod a prime
    * small enough that 31*p + 255 never overflows a signed 64-bit int on
    * either engine (DuckDB raises on BIGINT overflow rather than
    * wrapping, so the mod is applied at every step).
    *
    * ASCII-ONLY INPUT CONTRACT: Spark's `ascii()` returns the first UTF-8
    * byte (sign-extended) while the DuckDB twin uses `unicode()` (full
    * codepoint); they agree only on 7-bit ASCII. Callers must feed a
    * string from an ASCII alphabet — e.g. the `[a-z0-9 ]` token stream
    * produced by [[tokens]] joined with spaces (what q_doc_fingerprint
    * does), never raw multilingual text.
    */
  val FpPrime = 100000000000000003L

  def fingerprint(c: Column): Column =
    aggregate(
      transform(sequence(lit(1), length(c)), i => ascii(substring(c, i, lit(1)))),
      lit(0L),
      (acc, ch) => pmod(acc * lit(31L) + ch.cast("long"), lit(FpPrime))
    )

  def sqlFingerprint(expr: String): String =
    s"list_reduce(list_prepend(0::BIGINT, list_transform(range(1, len($expr) + 1), " +
      s"i -> unicode(substr($expr, i, 1))::BIGINT)), " +
      s"(acc, ch) -> (acc * 31 + ch) % $FpPrime)"

  // -------------------------------------------------------------------
  // Embedding similarity: sequential double-precision accumulation in
  // index order on BOTH engines → bit-identical dot products / cosines.
  // -------------------------------------------------------------------

  /** Dot product of two float-array columns, accumulated in double in
    * index order (f32→f64 widening and each fused step correctly
    * rounded the same way on both engines).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v
    )

  def sqlDot(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, len($a) + 1), " +
      s"i -> $a[i]::DOUBLE * $b[i]::DOUBLE)), (x, y) -> x + y)"

  /** Codegen'd dot product via the custom Catalyst expression
    * [[graft.plans.FloatVecDot]] — bit-identical values to [[dot]] (same
    * left-to-right double fold), but a primitive loop inside whole-stage
    * codegen instead of interpreted higher-order lambdas. Use this in
    * per-pair hot paths; [[dot]] remains the HOF reference formulation.
    */
  def fdot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.Exprs
    Exprs.column(
      graft.plans.FloatVecDot(Exprs.expression(a), Exprs.expression(b)))
  }

  /** Codegen'd plane·vector dot ([[graft.plans.PlaneVecDot]]): double
    * plane literal against a float vector, value-identical to
    * `zip_with(plane, v, (p, x) => p * x.cast("double"))` + ordered fold.
    */
  def pdot(plane: Column, v: Column): Column = {
    import org.apache.spark.sql.graft.Exprs
    Exprs.column(
      graft.plans.PlaneVecDot(Exprs.expression(plane), Exprs.expression(v)))
  }

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  def sqlCosine(a: String, b: String): String =
    s"${sqlDot(a, b)} / (sqrt(${sqlDot(a, a)}) * sqrt(${sqlDot(b, b)}))"

  /** Hex md5 digest computed driver-side — value-identical to Spark's
    * `md5()` and DuckDB's `md5()` (all three are RFC-1321 over UTF-8).
    */
  private def md5Hex(s: String): String =
    java.security.MessageDigest
      .getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x")
      .mkString

  /** Plane component (j, i): first 8 md5 hex chars of "j_i" as an int,
    * scaled to [-1, 1). Same arithmetic as the DuckDB twin in
    * [[sqlLshBucket]]; the int→double division and subtraction are exact
    * or correctly rounded identically on both sides.
    */
  private def planeComponent(j: Int, i: Int): Double =
    java.lang.Long.parseLong(md5Hex(s"${j}_$i").substring(0, 8), 16).toDouble /
      2147483648.0 - 1.0

  /** Random-hyperplane LSH bucket: `bits` sign bits of md5-seeded
    * pseudo-random planes dotted with the vector. The plane components
    * are CONSTANTS per (plane, dimension) — computed once on the driver
    * and shipped as literal arrays, so per row the executors do only the
    * multiply-adds (the previous form recomputed bits*dim md5 digests of
    * constants for every single row). The DuckDB twin keeps the inline
    * md5 form (oracle runs once; the values are identical by
    * construction).
    */
  def lshBucket(v: Column, bits: Int, dim: Int, planeOffset: Int = 0): Column = {
    val bitCols = (0 until bits).map { j =>
      // typedLit: ONE ArrayType literal, not a 64-child CreateArray —
      // keeps the expression tree (and analysis/codegen time) small.
      val plane =
        typedLit((1 to dim).map(i => planeComponent(planeOffset + j, i)))
      val planeDot = pdot(plane, v)
      when(planeDot >= 0, lit(1L << (bits - 1 - j))).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  def sqlLshBucket(v: String, bits: Int, planeOffset: Int = 0): String = {
    val terms = (0 until bits).map { j =>
      val p = planeOffset + j
      val planeDot =
        s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, len($v) + 1), " +
          s"i -> ((CAST(('0x' || substr(md5($p || '_' || i), 1, 8)) AS BIGINT)::DOUBLE " +
          s"/ 2147483648.0) - 1.0) * $v[i]::DOUBLE)), (x, y) -> x + y)"
      s"(CASE WHEN $planeDot >= 0 THEN ${1L << (bits - 1 - j)} ELSE 0 END)"
    }
    terms.mkString("CAST((", " + ", ") AS BIGINT)")
  }
}
