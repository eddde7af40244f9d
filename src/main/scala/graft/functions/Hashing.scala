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

  /** Minhash component j: min over shingles of h32(j, shingle). */
  def minhash(sh: Column, seed: Int): Column =
    array_min(transform(sh, s => h32(seed, s)))

  def sqlMinhash(shExpr: String, seed: Int): String =
    s"list_min(list_transform($shExpr, s -> ${sqlH32(seed, "s")}))"

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

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  def sqlCosine(a: String, b: String): String =
    s"${sqlDot(a, b)} / (sqrt(${sqlDot(a, a)}) * sqrt(${sqlDot(b, b)}))"

  /** Random-hyperplane LSH bucket: `bits` sign bits of md5-seeded
    * pseudo-random planes dotted with the vector. Plane component
    * (j, i) = h32(j*1024 + i) scaled to [-1, 1) — deterministic and
    * identical on both engines, so the bucketing (the ANN scale path)
    * is oracle-checkable.
    */
  def lshBucket(v: Column, bits: Int): Column = {
    val bitCols = (0 until bits).map { j =>
      val planeDot = aggregate(
        transform(
          sequence(lit(1), size(v)),
          i =>
            (conv(
              substring(
                md5(concat(lit(j.toString), lit("_"), i.cast("string"))),
                1,
                8
              ),
              16,
              10
            ).cast("long").cast("double") / lit(2147483648.0) - lit(1.0)) *
              element_at(v, i).cast("double")
        ),
        lit(0.0),
        (acc, x) => acc + x
      )
      when(planeDot >= 0, lit(1L << (bits - 1 - j))).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  def sqlLshBucket(v: String, bits: Int): String = {
    val terms = (0 until bits).map { j =>
      val planeDot =
        s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, len($v) + 1), " +
          s"i -> ((CAST(('0x' || substr(md5($j || '_' || i), 1, 8)) AS BIGINT)::DOUBLE " +
          s"/ 2147483648.0) - 1.0) * $v[i]::DOUBLE)), (x, y) -> x + y)"
      s"(CASE WHEN $planeDot >= 0 THEN ${1L << (bits - 1 - j)} ELSE 0 END)"
    }
    terms.mkString("CAST((", " + ", ") AS BIGINT)")
  }
}
