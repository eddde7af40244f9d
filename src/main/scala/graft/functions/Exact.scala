package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine-exact aggregation helpers.
  *
  * The driver hash-compares Spark results against a DuckDB oracle. Double
  * summation is order-dependent (IEEE addition is not associative), and
  * Spark's partial aggregation order differs from DuckDB's scan order, so a
  * raw `sum(double)` can differ in the last ulp and fail the hash compare.
  *
  * The fix: sum in exact decimal arithmetic. The testdata money/value
  * columns carry at most 2 fractional decimal digits, so `DECIMAL(18,4)`
  * represents every input exactly; decimal addition is associative, so both
  * engines produce the identical exact sum regardless of order, and the
  * final cast to double is the same correctly-rounded conversion on both
  * sides.
  */
object Exact {
  private val D = DecimalType(18, 4)

  /** Order-independent, engine-exact sum of a ≤4-decimal double column. */
  def dsum(c: Column): Column = sum(c.cast(D)).cast("double")

  /** Engine-exact average: exact decimal sum / count, divided in double. */
  def davg(c: Column): Column =
    (sum(c.cast(D)).cast("double") / count(c)).cast("double")

  /** Exact decimal product for revenue-style expressions:
    * price * (1 - discount), both operands lifted to decimal first so the
    * multiplication itself is exact (no double rounding either engine could
    * disagree on).
    */
  def revenue(price: Column, discount: Column): Column =
    price.cast(D) * (lit(1).cast(D) - discount.cast(D))

  /** Sum of an already-exact decimal expression (e.g. [[revenue]]),
    * RESCALED to DECIMAL(18,4) before the double cast. The rescale is
    * what keeps the conversion cross-engine-exact: a scale-8 revenue sum
    * carries an unscaled value past 2^53, where Spark's one-step
    * BigDecimal→double (correctly rounded) and DuckDB's int128→double
    * then /10^scale (double-rounded) can disagree by 1 ulp — observed at
    * sf0.1 on q_pricing_summary. At scale 4 the unscaled value is
    * exactly representable in a double again and both paths agree
    * bit-for-bit.
    */
  def decSum(c: Column): Column = sum(c).cast(D).cast("double")

  /** SQL fragments for the DuckDB oracle mirroring the helpers above. */
  def sqlDecSum(expr: String): String =
    s"CAST(CAST(SUM($expr) AS DECIMAL(18,4)) AS DOUBLE)"
  def sqlDsum(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,4))) AS DOUBLE)"
  def sqlDavg(expr: String): String =
    s"CAST(CAST(SUM(CAST($expr AS DECIMAL(18,4))) AS DOUBLE) / COUNT($expr) AS DOUBLE)"
  def sqlRevenue(price: String, discount: String): String =
    s"CAST($price AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST($discount AS DECIMAL(18,4)))"
}
