package graft

import graft.plans.{ZOrder2, ZOrderN}
import org.apache.spark.sql.functions._

/** ZOrder2 expression contract: the codegen'd interleave must equal the
  * driver-side reference bit-for-bit (same arithmetic the DuckDB oracle
  * runs), mask high bits, participate in whole-stage codegen, and pass
  * nulls through.
  */
class ZOrderSpec extends SparkSpec {

  private def refZ(x: Long, y: Long): Long = {
    def bit(v: Long, i: Int): Long = (v >> i) & 1L
    var z = 0L
    for (i <- 0 until 16) {
      z |= bit(x, i) << (2 * i + 1)
      z |= bit(y, i) << (2 * i)
    }
    z
  }

  test("interleave == bit-by-bit reference on exhaustive small + random values") {
    val s2 = spark
    import s2.implicits._
    val rnd = new scala.util.Random(42)
    val pairs =
      (for (x <- 0L to 17L; y <- 0L to 17L) yield (x, y)) ++
        Seq.fill(200)((rnd.nextLong().abs % 65536, rnd.nextLong().abs % 65536)) ++
        Seq((65535L, 65535L), (0L, 65535L), (65535L, 0L))
    val got = pairs
      .toDF("x", "y")
      .select(col("x"), col("y"), ZOrder2.zorder(col("x"), col("y")).as("z"))
      .collect()
    got.foreach { r =>
      val (x, y) = (r.getLong(0), r.getLong(1))
      assert(r.getLong(2) == refZ(x, y), s"($x, $y)")
    }
  }

  test("high bits beyond 16 are masked off") {
    val s2 = spark
    import s2.implicits._
    val df = Seq((65536L + 3L, (1L << 40) + 5L)).toDF("x", "y")
    val z = df.select(ZOrder2.zorder(col("x"), col("y"))).head().getLong(0)
    assert(z == refZ(3L, 5L))
  }

  test("z-order locality: each top-byte z-range is a narrow rectangle") {
    // the layout query's reason to exist: fixing the z top byte fixes
    // the 4 high bits of BOTH 16-bit dims, so every z-range spans at
    // most 2^12 of each scaled dimension — and with both dims scaled to
    // fill their 16 bits, that is a small fraction of each dim's range
    val rows = ops.Layout.zorderLayout(spark, sf).collect()
    assert(rows.length > 16, s"only ${rows.length} z-ranges — interleave degenerate")
    rows.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) < 4096, s"day span too wide: $r")
      assert(r.getLong(5) - r.getLong(4) < 4096, s"price span too wide: $r")
    }
  }

  test("expression participates in whole-stage codegen") {
    // a parquet-backed plan — a local Seq would be constant-folded to a
    // LocalTableScan and never exercise doGenCode
    val plan = Tables
      .orders(spark, sf)
      .select(
        ZOrder2.zorder(col("o_orderkey"), col("o_custkey")).as("z"))
      .queryExecution
      .executedPlan
      .toString
    assert(
      plan.contains("*(1) Project [zorder2"),
      s"zorder2 not inside a codegen stage:\n$plan")
  }

  test("null input yields null") {
    val s2 = spark
    import s2.implicits._
    val out = Seq((Some(1L), Option.empty[Long]), (Some(1L), Some(1L)))
      .toDF("x", "y")
      .select(ZOrder2.zorder(col("x"), col("y")).as("z"))
      .collect()
    assert(out(0).isNullAt(0))
    assert(!out(1).isNullAt(0))
  }

  test("ZOrderN: n=2 reproduces ZOrder2; 3-D/4-D match the reference interleave") {
    val s2 = spark
    import s2.implicits._
    val rnd = new scala.util.Random(7)
    // n=2 @ 16 bits is bit-identical to ZOrder2 (layout compatibility)
    val pairs = Seq.fill(100)(
      (rnd.nextLong().abs % 65536, rnd.nextLong().abs % 65536))
    pairs.toDF("x", "y")
      .select(
        ZOrder2.zorder(col("x"), col("y")).as("z2"),
        ZOrderN.zorder(Seq(col("x"), col("y")), 16).as("zn"))
      .collect()
      .foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
    // 3-D: codegen path (parquet-backed would be needed for WSCG; here
    // exercise eval + the reference) on exhaustive small domain
    val triples = for (x <- 0L to 7L; y <- 0L to 7L; w <- 0L to 7L)
      yield (x, y, w)
    triples.toDF("x", "y", "w")
      .select(col("x"), col("y"), col("w"),
        ZOrderN.zorder(Seq(col("x"), col("y"), col("w")), 3).as("z"))
      .collect()
      .foreach { r =>
        val want = ZOrderN.interleave(
          Seq(r.getLong(0), r.getLong(1), r.getLong(2)), 3)
        assert(r.getLong(3) == want, r.toString)
      }
    // the 3-D interleave is a bijection on the cube — 512 distinct
    // values covering [0, 512)
    val zs = triples.map { case (x, y, w) =>
      ZOrderN.interleave(Seq(x, y, w), 3)
    }
    assert(zs.toSet == (0L until 512L).toSet)
    // 4-D @ 15 bits: monotone locality sanity — fixing all dims' high
    // bits fixes the z high bits
    val a = ZOrderN.interleave(Seq(1L << 14, 1L << 14, 1L << 14, 1L << 14), 15)
    assert(a == (15L << 56), s"4-D top-bit placement wrong: $a")
    // null propagates
    val out = Seq((Some(1L), Option.empty[Long], Some(2L)))
      .toDF("x", "y", "w")
      .select(ZOrderN.zorder(Seq(col("x"), col("y"), col("w")), 8).as("z"))
      .collect()
    assert(out(0).isNullAt(0))
  }

  test("ZOrderN participates in whole-stage codegen") {
    val plan = Tables
      .orders(spark, sf)
      .select(ZOrderN.zorder(
        Seq(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice")).cast("long")), 16).as("z"))
      .queryExecution
      .executedPlan
      .toString
    assert(
      plan.contains("*(1) Project [zordern"),
      s"zordern not inside a codegen stage:\n$plan")
  }
}
