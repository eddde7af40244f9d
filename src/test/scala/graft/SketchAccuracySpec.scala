package graft

import org.apache.spark.sql.functions._

/** Accuracy bounds for the cardinality sketches: the engine-native HLL
  * (approx_count_distinct) can't be oracle-gated — its sketch hashes are
  * engine-private — so its contract lives here instead: estimates within
  * the documented relative standard deviation of the exact counts. The
  * KMV query (ops/Sketches.kmvDistinct) IS oracle-gated; here we pin its
  * statistical quality too, so a hash-green-but-useless estimator (e.g.
  * a degenerate k) can't slip through the exactness gate.
  */
class SketchAccuracySpec extends SparkSpec {

  test("approx_count_distinct stays within 5x the configured 2% rsd") {
    val rows = ops.Relational
      .distinctCounts(spark, sf)
      .select(col("l_returnflag"), col("d_orders"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val approx = Tables
      .lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_orderkey"), 0.02).as("a"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(approx.keySet == rows.keySet)
    for ((flag, exact) <- rows) {
      val est = approx(flag)
      val relErr = math.abs(est - exact).toDouble / exact
      assert(relErr < 0.10, s"flag $flag: approx $est vs exact $exact (relErr $relErr)")
    }
  }

  test("KMinDistinct: bounded buffer == sort-distinct-limit on skewed multi-partition input") {
    // dedup (every value delivered 3×), cap at k, cross-partition merge,
    // and the ascending order contract — against the declarative truth
    val s2 = spark
    import s2.implicits._
    val k = 7
    val values = (1L to 50L).flatMap(v => Seq(v * 977 % 331, v * 977 % 331, v * 977 % 331))
    val df = values.toDF("v").repartition(8)
    val got = df
      .agg(graft.plans.KMinDistinct.kmin(col("v"), k).as("hs"))
      .head()
      .getSeq[Long](0)
    val want = values.distinct.sorted.take(k)
    assert(got == want, s"got $got want $want")
    // under-full group: fewer than k distinct values → all of them
    val small = Seq(5L, 3L, 5L, 3L, 9L).toDF("v")
      .agg(graft.plans.KMinDistinct.kmin(col("v"), k).as("hs"))
      .head()
      .getSeq[Long](0)
    assert(small == Seq(3L, 5L, 9L))
  }

  test("KMV estimate lands within the 1/sqrt(k) band of the exact count") {
    val rows = ops.Sketches.kmvDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val exact = r.getAs[Long]("d_exact")
      val est = r.getAs[Long]("est_distinct")
      val relErr = math.abs(est - exact).toDouble / exact
      // KMV rse ≈ 1/sqrt(k-2) ≈ 0.127 at k=64; allow 4 sigma
      assert(relErr < 0.51, s"flag ${r.get(0)}: KMV $est vs exact $exact (relErr $relErr)")
    }
  }

  test("PQ-ADC recall@10 vs exact L2 stays above the measured floor") {
    // q_similarity_pq is hash-gated (deterministic), but a hash-green
    // degenerate codebook (e.g. collapsed cells) would still rank
    // garbage — pin the statistical quality like KMV/HLL. Measured:
    // 0.475 (sf0.001) / 0.447 (sf0.01) at (M=16, k=32) vs the 0.02
    // random baseline.
    val pq = ops.Embeddings
      .similarityPq(spark, sf)
      .select(col("query_id"), col("neighbor_id"))
      .collect()
      .groupBy(_.getLong(0))
      .view
      .mapValues(_.map(_.getLong(1)).toSet)
      .toMap
    // exact quantized-L2 top-10 per query, brute force on the driver
    // (500 × 64 at test SF)
    val vecs = Tables
      .embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r =>
        r.getLong(0) ->
          r.getSeq[Float](1)
            .map(x => math.round(x.toDouble * (1L << 20)))
            .toArray)
      .toMap
    val queryIds = vecs.keys.toSeq.sorted.take(32)
    val recalls = queryIds.map { q =>
      val qv = vecs(q)
      val exact = vecs.iterator
        .filter(_._1 != q)
        .map { case (id, v) =>
          var s2 = 0L
          var i = 0
          while (i < qv.length) {
            val dd = qv(i) - v(i); s2 += dd * dd; i += 1
          }
          (s2, id)
        }
        .toSeq
        .sortBy(identity)
        .take(10)
        .map(_._2)
        .toSet
      (exact & pq.getOrElse(q, Set.empty)).size / 10.0
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.30, s"PQ mean recall@10 $mean below floor 0.30")
  }

  test("IVF+PQ recall@10 holds the flat-PQ floor while scoring < 1/4 of the collection") {
    // the composition must keep the flat-PQ quality floor (the exact
    // re-rank should offset IVF's cell-boundary misses) AND actually
    // prune: every query's audited candidate count stays under a
    // quarter of the collection, or the "index" is a scan in disguise.
    // Measured at sf0.01: the 500-vector sf0.001 fixture seeds only 8
    // coarse cells, so P=3 probes legitimately cover 3/8 of it — the
    // pruning claim needs the real 64-cell quantizer.
    val sf = "/root/testdata/sf0.01"
    val out = ops.Embeddings
      .similarityIvfPq(spark, sf)
      .select(col("query_id"), col("neighbor_id"), col("n_candidates"))
      .collect()
    val byQ = out.groupBy(_.getLong(0))
    val nVecs = Tables.embeddings(spark, sf).count()
    byQ.foreach { case (q, rows) =>
      val nc = rows.map(_.getLong(2)).max
      assert(
        nc < nVecs / 4,
        s"query $q scored $nc of $nVecs candidates — pruning defeated")
    }
    // exact cosine top-10 per query, brute force on the driver
    val vecs = Tables
      .embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    val queryIds = vecs.keys.toSeq.sorted.take(32)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val recalls = queryIds.map { q =>
      val qv = vecs(q)
      val qn = math.sqrt(dot(qv, qv))
      val exact = vecs.iterator
        .filter(_._1 != q)
        .map { case (id, v) =>
          (-dot(qv, v) / (qn * math.sqrt(dot(v, v))), id)
        }
        .toSeq
        .sortBy(identity)
        .take(10)
        .map(_._2)
        .toSet
      val got = byQ
        .getOrElse(q, Array.empty[org.apache.spark.sql.Row])
        .map(_.getLong(1))
        .toSet
      (exact & got).size / 10.0
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.30, s"IVF+PQ mean recall@10 $mean below the flat-PQ floor 0.30")
  }

  test("LogHistogram quantiles: DETERMINISTIC bucket-width error bound vs exact ranks") {
    // The sketch's guarantee is not statistical: the picked estimate is
    // the lower bound of the bucket holding the true rank-ceil(q·n)
    // value, so exact ∈ [est, est + width(bucket)) ALWAYS, and width is
    // ≤ 2^-shift of the bound for values past the exact low range.
    import graft.plans.LogHistogram
    val shift = 5
    val est = ops.Sketches
      .approxQuantiles(spark, sf)
      .collect()
      .map(r =>
        (r.getString(0), r.getDouble(1)) ->
          r.getAs[Long]("est_cents"))
      .toMap
    assert(est.size == 15, s"3 flags x 5 fractions, got ${est.size}")
    // exact type-1 quantiles of the identical cents column
    val centsByFlag = Tables
      .lineitem(spark, sf)
      .select(
        col("l_returnflag"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("long")
          .as("cents"))
      .collect()
      .groupBy(_.getString(0))
      .view
      .mapValues(_.map(_.getLong(1)).sorted)
      .toMap
    for (((flag, q), estCents) <- est) {
      val sorted = centsByFlag(flag)
      val exact = sorted(math.ceil(q * sorted.length).toInt - 1)
      val b = LogHistogram.bucketOf(exact, shift)
      val width = LogHistogram.bucketWidth(b.toLong, shift)
      assert(
        estCents <= exact && exact < estCents + width,
        s"($flag, $q): est $estCents, exact $exact, width $width")
      // relative-error form of the same bound for non-tiny values
      if (estCents >= (1L << (shift + 1)))
        assert(
          (exact - estCents).toDouble / estCents <= 1.0 / (1 << shift),
          s"($flag, $q): rel err above 2^-$shift")
    }
  }
}
