package graft.ops

import graft.Tables
import graft.functions.Hashing._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Probabilistic-sketch operators under the EXACT oracle gate.
  *
  * Engine-native sketches (HLL, datasketches) hash with engine-private
  * functions, so their outputs can never be cross-checked value-exactly
  * (approx_count_distinct carries a SketchAccuracySpec bound instead).
  * These sketches are built from md5-lane hashing (graft.functions.Hashing) —
  * the SAME bytes on Spark and DuckDB — so the full counter matrix /
  * bit set, the estimates, and the false positives are deterministic
  * and hash-compared like any other query.
  *
  * Scale design (100 TB):
  *  - CMS: the counter update is a hash aggregate on (depth, bucket) —
  *    map-side partials reduce every partition to ≤ depth×width cells
  *    before the shuffle, so shuffle volume is O(d·w × partitions),
  *    independent of row count. The sketch itself is O(d·w) — model
  *    state, broadcastable anywhere.
  *  - Bloom: the bit set is ≤ m rows (distinct bits of the member set);
  *    membership probes ride a broadcast join against it. This is the
  *    semantics of Spark's runtime bloom-pruning, reproduced as an
  *    auditable operator.
  *
  * Reference analogue: none (opusdb has no sketches); north-star
  * additions per SURVEY §2.12.
  */
object Sketches {
  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------------
  // q_cms_estimate — count-min sketch (depth 4 × width 64) over event
  // user_ids, probed for 5 keys against their exact counts. CMS
  // guarantees est ≥ exact; the overestimate flag is emitted and must
  // be 1 everywhere on both engines.
  // ---------------------------------------------------------------------
  private val cmsDepth = 4
  private val cmsWidth = 64
  private val cmsProbeMax = 5 // probe user_ids [0, cmsProbeMax)

  val cmsEstimate: Q = (s, d) => {
    val uidStr = col("user_id").cast("string")
    val e = Tables.events(s, d).select(col("user_id"), uidStr.as("us"))
    val cells = e
      .select(explode(array((0 until cmsDepth).map(dd =>
        struct(
          lit(dd.toLong).as("dep"),
          (h32(dd, col("us")) % cmsWidth).as("w"))): _*)).as("cell"))
      .select(col("cell.dep"), col("cell.w"))
    val counters = cells.groupBy(col("dep"), col("w"))
      .agg(count(lit(1)).as("c"))
    val probes = e
      .filter(col("user_id") < cmsProbeMax)
      .groupBy(col("user_id"), col("us"))
      .agg(count(lit(1)).as("exact_n"))
    val pcells = probes
      .select(
        col("user_id"),
        col("exact_n"),
        explode(array((0 until cmsDepth).map(dd =>
          struct(
            lit(dd.toLong).as("dep"),
            (h32(dd, col("us")) % cmsWidth).as("w"))): _*)).as("cell"))
      .select(col("user_id"), col("exact_n"), col("cell.dep"), col("cell.w"))
    pcells
      .join(broadcast(counters), Seq("dep", "w"))
      .groupBy(col("user_id"), col("exact_n"))
      .agg(min(col("c")).as("cms_est"))
      .select(
        col("user_id"),
        col("exact_n"),
        col("cms_est"),
        when(col("cms_est") >= col("exact_n"), 1L).otherwise(0L)
          .as("overestimates"))
      .orderBy(col("user_id"))
  }

  val cmsEstimateSql: String = {
    def cellSelects(src: String, extra: String): String =
      (0 until cmsDepth)
        .map(dd =>
          s"SELECT $extra${dd}::BIGINT AS dep, " +
            s"${sqlH32(dd, "user_id::VARCHAR")} % $cmsWidth AS w FROM $src")
        .mkString("\n  UNION ALL\n  ")
    s"""WITH counters AS (
       |  SELECT dep, w, count(*) AS c FROM (
       |  ${cellSelects("events", "")}) cells
       |  GROUP BY dep, w),
       |probes AS (
       |  SELECT user_id, count(*) AS exact_n FROM events
       |  WHERE user_id < $cmsProbeMax GROUP BY user_id),
       |pcells AS (
       |  ${cellSelects("probes", "user_id, exact_n, ")})
       |SELECT p.user_id, p.exact_n, min(c.c) AS cms_est,
       |  CAST(CASE WHEN min(c.c) >= p.exact_n THEN 1 ELSE 0 END AS BIGINT) AS overestimates
       |FROM pcells p JOIN counters c ON p.dep = c.dep AND p.w = c.w
       |GROUP BY p.user_id, p.exact_n
       |ORDER BY p.user_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q_bloom_membership — Bloom filter (m = 512 bits, k = 3 md5 lanes)
  // built over the purchasing users, probed with EVERY user: per
  // mod-100 user cohort, actual members, claimed members, and false
  // positives (claimed ∧ ¬actual). No false negatives is a structural
  // guarantee — n_claimed ≥ n_actual per cohort, hash-checked.
  // ---------------------------------------------------------------------
  private val bloomBits = 512
  private val bloomSeeds = Seq(10, 11, 12)

  val bloomMembership: Q = (s, d) => {
    val e = Tables.events(s, d)
    val users = e.select(col("user_id")).distinct()
      .withColumn("us", col("user_id").cast("string"))
    val members = e
      .filter(col("event_type") === "purchase")
      .select(col("user_id")).distinct()
      .withColumn("us", col("user_id").cast("string"))
    val bits = members
      .select(explode(array(bloomSeeds.map(k =>
        h32(k, col("us")) % bloomBits): _*)).as("bit"))
      .distinct() // ≤ m rows: the filter itself
    val probeBits = users
      .select(
        col("user_id"),
        explode(array(bloomSeeds.map(k =>
          h32(k, col("us")) % bloomBits): _*)).as("bit"))
    val claimed = probeBits
      .join(broadcast(bits.withColumn("present", lit(1L))), Seq("bit"), "left")
      .groupBy(col("user_id"))
      .agg(min(coalesce(col("present"), lit(0L))).as("claimed"))
    val actual = members.select(col("user_id"), lit(1L).as("actual"))
    claimed
      .join(actual, Seq("user_id"), "left")
      .select(
        (col("user_id") % 100).as("cohort"),
        col("claimed"),
        coalesce(col("actual"), lit(0L)).as("actual"))
      .groupBy(col("cohort"))
      .agg(
        count(lit(1)).as("n_users"),
        sum(col("actual")).as("n_actual"),
        sum(col("claimed")).as("n_claimed"),
        sum(when(col("claimed") === 1 && col("actual") === 0, 1L)
          .otherwise(0L)).as("n_false_pos"))
      .orderBy(col("cohort"))
  }

  val bloomMembershipSql: String = {
    def bitSelects(src: String, extra: String): String =
      bloomSeeds
        .map(k =>
          s"SELECT $extra${sqlH32(k, "user_id::VARCHAR")} % $bloomBits AS bit FROM $src")
        .mkString("\n  UNION ALL\n  ")
    s"""WITH members AS (
       |  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
       |users AS (SELECT DISTINCT user_id FROM events),
       |bits AS (SELECT DISTINCT bit FROM (
       |  ${bitSelects("members", "")}) b),
       |probe_bits AS (
       |  ${bitSelects("users", "user_id, ")}),
       |claimed AS (
       |  SELECT p.user_id,
       |    min(CASE WHEN b.bit IS NOT NULL THEN 1 ELSE 0 END) AS claimed
       |  FROM probe_bits p LEFT JOIN bits b ON p.bit = b.bit
       |  GROUP BY p.user_id)
       |SELECT c.user_id % 100 AS cohort, count(*) AS n_users,
       |CAST(SUM(CASE WHEN m.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_actual,
       |CAST(SUM(c.claimed) AS BIGINT) AS n_claimed,
       |CAST(SUM(CASE WHEN c.claimed = 1 AND m.user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
       |FROM claimed c LEFT JOIN members m ON c.user_id = m.user_id
       |GROUP BY cohort ORDER BY cohort""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q_approx_distinct — KMV (k-minimum-values) distinct-count sketch
  // per lineitem return flag, under the EXACT oracle gate. The engine-
  // native HLL (approx_count_distinct) hashes with engine-private
  // functions so its estimates can never be cross-checked (it stayed a
  // rows-only query for four rounds); KMV over the shared md5 h32 lane
  // is deterministic on both engines: the k smallest distinct hashes,
  // the k-th value, and the estimator (k-1)·2^32 div h_(k) — integer
  // division, no float drift — hash-compare exactly. The HLL built-in
  // keeps a ScalaTest accuracy bound (SketchAccuracySpec).
  //
  // Scale design: the k-smallest-per-flag rides the dedup-aware BOUNDED
  // KMinDistinct buffer (plans/KMinDistinct.scala) — map-side partials
  // cap every partition's contribution at k distinct hashes, the
  // shuffle carries O(k·groups·partitions) longs, and no distinct()
  // pre-shuffle of the hash stream is needed at all; the sketch never
  // sees the row stream, matching how a 100 TB cardinality estimate
  // must run. The exact companion column (the oracle's yardstick)
  // shares the SAME single scan and aggregation: countDistinct rides
  // the usual Expand two-phase plan next to the sketch lane.
  // ---------------------------------------------------------------------
  private val kmvK = 64
  private val kmvSeed = 11
  private val kmvSpace = 4294967296L // h32 hash space: 2^32

  val kmvDistinct: Q = (s, d) => {
    import graft.plans.KMinDistinct
    Tables
      .lineitem(s, d)
      .select(
        col("l_returnflag"),
        col("l_orderkey"),
        h32(kmvSeed, col("l_orderkey").cast("string")).as("h"))
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_orderkey")).as("d_exact"),
        KMinDistinct.kmin(col("h"), kmvK).as("hs"))
      .select(
        col("l_returnflag"),
        col("d_exact"),
        element_at(col("hs"), size(col("hs"))).as("kmv_kth"),
        // fewer than k distinct hashes → the sketch IS the exact set
        when(size(col("hs")) < kmvK, size(col("hs")).cast("long"))
          .otherwise(
            expr(s"${(kmvK - 1) * kmvSpace}L div element_at(hs, size(hs))"))
          .as("est_distinct"))
      .orderBy(col("l_returnflag"))
  }

  val kmvDistinctSql: String =
    s"""WITH hd AS (
       |  SELECT DISTINCT l_returnflag,
       |    ${sqlH32(kmvSeed, "l_orderkey::VARCHAR")} AS h FROM lineitem),
       |r AS (
       |  SELECT l_returnflag, h,
       |    row_number() OVER (PARTITION BY l_returnflag ORDER BY h ASC) AS rn,
       |    count(*) OVER (PARTITION BY l_returnflag) AS nh
       |  FROM hd),
       |kth AS (
       |  SELECT l_returnflag, h AS kmv_kth, nh FROM r
       |  WHERE rn = least($kmvK, nh)),
       |e AS (
       |  SELECT l_returnflag, count(DISTINCT l_orderkey) AS d_exact
       |  FROM lineitem GROUP BY 1)
       |SELECT e.l_returnflag, e.d_exact, k.kmv_kth,
       |  CASE WHEN k.nh < $kmvK THEN k.nh
       |       ELSE ${(kmvK - 1) * kmvSpace} // k.kmv_kth END AS est_distinct
       |FROM e JOIN kth k ON e.l_returnflag = k.l_returnflag
       |ORDER BY e.l_returnflag""".stripMargin

  // ---------------------------------------------------------------------
  // q_approx_quantiles — MERGEABLE approximate quantiles from the
  // LogHistogram sketch (plans/LogHistogram.scala): p25/p50/p75/p90/p99
  // of lineitem extended price (exact integer cents) per return flag.
  //
  // The 100 TB contrast with q_quantiles_exact: the exact query locates
  // ranks by shuffling (bucketed) rows; the sketch reduces every
  // partition to ≤ 1,920 bucket counters BEFORE the shuffle — shuffle
  // volume is O(buckets·groups·partitions), independent of row count,
  // and the merged histogram is O(1) state a driver or a streaming
  // stage can hold. Price: values ≥ 2^6 carry ≤ 2^-5 (3.1%) relative
  // error; values < 2^6 are exact. Deterministic by construction
  // (integer bit-math bucketing, associative counter merge), so the
  // DuckDB twin recomputes the identical buckets declaratively
  // (bin()-length exponent + shifts) and the picked quantiles
  // hash-compare exactly — no accuracy hand-waving in the gate; the
  // rank-conservation and error-bound guarantees live in
  // SketchAccuracySpec/PropertySpec.
  // ---------------------------------------------------------------------
  private[graft] val lhShift = 5 // 2^5 sub-buckets/decade → ≤ 3.1% rel. error
  private[graft] val lhSub = 1 << lhShift
  private val lhQs = Seq(0.25, 0.5, 0.75, 0.9, 0.99)

  // Lower bound of bucket b — the quantile estimate. Mirrored verbatim
  // (modulo shiftleft spelling) in the DuckDB twin.
  private[graft] val lhLowerSql =
    s"CASE WHEN (b div $lhSub) <= 1 THEN b " +
      s"ELSE shiftleft(b - ((b div $lhSub) - 1) * $lhSub, " +
      s"cast((b div $lhSub) - 1 as int)) END"

  /** DuckDB-side twin of LogHistogram.bucketOf over an integer SQL
    * expression — bin()-length exponent + shifts, bit-identical to the
    * Spark aggregate's bucketing. Shared by the batch and streaming
    * quantile gates.
    */
  private[graft] def sqlLhBucket(cents: String): String =
    s"CASE WHEN $cents <= 0 THEN 0 " +
      s"ELSE (greatest(length(bin($cents)) - 1 - $lhShift, 0) * $lhSub) " +
      s"+ ($cents >> greatest(length(bin($cents)) - 1 - $lhShift, 0)) END"

  /** DuckDB-side twin of LogHistogram.lowerBound over bucket column b. */
  private[graft] def sqlLhLower(b: String): String =
    s"CASE WHEN ($b // $lhSub) <= 1 THEN $b " +
      s"ELSE ($b - (($b // $lhSub) - 1) * $lhSub) << (($b // $lhSub) - 1) END"

  val approxQuantiles: Q = (s, d) => {
    import graft.plans.LogHistogram
    import org.apache.spark.sql.expressions.Window
    val cents = Tables
      .lineitem(s, d)
      .select(
        col("l_returnflag"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("long")
          .as("cents"))
    val hist = cents
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        LogHistogram.logHist(col("cents"), lhShift).as("hist"))
    val wCum = Window.partitionBy(col("l_returnflag")).orderBy(col("b"))
    val cum = hist
      .select(col("l_returnflag"), col("n"), explode(col("hist")).as("hb"))
      .select(
        col("l_returnflag"),
        col("n"),
        col("hb.bucket").as("b"),
        col("hb.cnt").as("bc"))
      .withColumn("cum", sum(col("bc")).over(wCum))
    // 5-row literal fraction frame — sanctioned witness-frame crossJoin.
    val fracs = s
      .range(1)
      .select(explode(array(lhQs.map(lit): _*)).as("q"))
    cum
      .crossJoin(fracs)
      // type-1 target rank ceil(q·n); smallest bucket whose running
      // count reaches it holds the rank-r value.
      .filter(col("cum") >= ceil(col("q") * col("n")))
      .groupBy(col("l_returnflag"), col("q"))
      .agg(min(col("b")).as("b"), max(col("n")).as("n"))
      .withColumn("est_cents", expr(lhLowerSql))
      .select(col("l_returnflag"), col("q"), col("est_cents"), col("n"))
      .orderBy(col("l_returnflag"), col("q"))
  }

  val approxQuantilesSql: String =
    s"""WITH li AS (
       |  SELECT l_returnflag,
       |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
       |      AS cents
       |  FROM lineitem),
       |bkt AS (
       |  SELECT l_returnflag, ${sqlLhBucket("cents")} AS b
       |  FROM li),
       |g AS (SELECT l_returnflag, b, count(*) AS bc FROM bkt GROUP BY 1, 2),
       |c AS (
       |  SELECT l_returnflag, b, bc,
       |    CAST(sum(bc) OVER (PARTITION BY l_returnflag ORDER BY b)
       |      AS BIGINT) AS cum,
       |    CAST(sum(bc) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
       |  FROM g),
       |p AS (
       |  SELECT c.l_returnflag, f.q, min(c.b) AS b, max(c.n) AS n
       |  FROM c, (VALUES ${lhQs
        .map(q => s"(CAST($q AS DOUBLE))")
        .mkString(",")}) AS f(q)
       |  WHERE c.cum >= CAST(ceil(f.q * c.n) AS BIGINT)
       |  GROUP BY 1, 2)
       |SELECT l_returnflag, q,
       |  ${sqlLhLower("b")} AS est_cents,
       |  n
       |FROM p ORDER BY l_returnflag, q""".stripMargin

  // ---------------------------------------------------------------------
  // q_kmv_setops — SET ALGEBRA ON KMV SKETCHES: union and intersection
  // cardinality estimates for every pair of return-flag order sets,
  // from the per-flag KMinDistinct sketches ALONE — the
  // audience-overlap workload (how many users in segment A ∩ B?) that
  // at 100 TB must run on pre-built per-segment sketches, never on the
  // raw key sets. Union sketch = k smallest of the two sketches'
  // union (closed under merge); est_union = the KMV estimator on its
  // k-th value; intersection via the ratio estimator ρ̂ =
  // |U_k ∩ A_k ∩ B_k| / |U_k|, est_inter = ρ̂ · est_union — all
  // integer arithmetic, so the estimates hash-compare exactly. Exact
  // companions (one distinct frame + one self-join) ride beside as
  // the yardstick, same discipline as q_approx_distinct.
  // ---------------------------------------------------------------------
  val kmvSetops: Q = (s, d) => {
    import graft.plans.KMinDistinct
    val sk = Tables
      .lineitem(s, d)
      .select(
        col("l_returnflag").as("f"),
        h32(kmvSeed, col("l_orderkey").cast("string")).as("h"))
      .groupBy(col("f"))
      .agg(KMinDistinct.kmin(col("h"), kmvK).as("hs"))
    val pairs = sk
      .select(col("f").as("f1"), col("hs").as("hs1"))
      .join(
        sk.select(col("f").as("f2"), col("hs").as("hs2")),
        col("f1") < col("f2")) // 3 pairs of 3 flags — O(flags²) rows
      .withColumn(
        "uk",
        slice(
          array_sort(array_distinct(concat(col("hs1"), col("hs2")))),
          1,
          kmvK))
      .withColumn("nu", size(col("uk")).cast("long"))
      .withColumn(
        "est_union",
        when(col("nu") < kmvK, col("nu"))
          .otherwise(expr(
            s"${(kmvK - 1) * kmvSpace}L div element_at(uk, size(uk))")))
      .withColumn(
        "n_both",
        size(array_intersect(array_intersect(col("uk"), col("hs1")), col("hs2")))
          .cast("long"))
      .withColumn("est_inter", expr("(n_both * est_union) div nu"))
    // exact yardsticks from the distinct (flag, orderkey) frame
    val fo = Tables
      .lineitem(s, d)
      .select(col("l_returnflag").as("f"), col("l_orderkey").as("o"))
      .distinct()
    val dPer = fo.groupBy(col("f")).agg(count(lit(1)).as("dx"))
    val inter = fo
      .select(col("f").as("xf"), col("o"))
      .join(fo.select(col("f").as("yf"), col("o")), Seq("o"))
      .filter(col("xf") < col("yf"))
      .groupBy(col("xf"), col("yf"))
      .agg(count(lit(1)).as("di"))
    pairs
      .join(broadcast(dPer.select(col("f").as("f1"), col("dx").as("da"))), Seq("f1"))
      .join(broadcast(dPer.select(col("f").as("f2"), col("dx").as("db"))), Seq("f2"))
      .join(
        broadcast(inter),
        col("f1") === col("xf") && col("f2") === col("yf"),
        "left")
      .select(
        col("f1"),
        col("f2"),
        col("est_union"),
        col("est_inter"),
        (col("da") + col("db") - coalesce(col("di"), lit(0L))).as("d_union"),
        coalesce(col("di"), lit(0L)).as("d_inter"))
      .orderBy(col("f1"), col("f2"))
  }

  val kmvSetopsSql: String =
    s"""WITH hd AS (
       |  SELECT DISTINCT l_returnflag AS f,
       |    ${sqlH32(kmvSeed, "l_orderkey::VARCHAR")} AS h FROM lineitem),
       |r AS (SELECT f, h,
       |        row_number() OVER (PARTITION BY f ORDER BY h ASC) AS rn
       |      FROM hd),
       |sk AS (SELECT f, list(h ORDER BY h) AS hs FROM r WHERE rn <= $kmvK
       |       GROUP BY f),
       |p AS (
       |  SELECT a.f AS f1, b.f AS f2, a.hs AS hs1, b.hs AS hs2,
       |    (list_sort(list_distinct(list_concat(a.hs, b.hs))))[1:$kmvK]
       |      AS uk
       |  FROM sk a JOIN sk b ON a.f < b.f),
       |e AS (
       |  SELECT f1, f2, CAST(len(uk) AS BIGINT) AS nu,
       |    CASE WHEN len(uk) < $kmvK THEN CAST(len(uk) AS BIGINT)
       |         ELSE ${(kmvK - 1) * kmvSpace} // uk[len(uk)] END
       |      AS est_union,
       |    CAST(len(list_intersect(list_intersect(uk, hs1), hs2)) AS BIGINT)
       |      AS n_both
       |  FROM p),
       |fo AS (SELECT DISTINCT l_returnflag AS f, l_orderkey AS o
       |       FROM lineitem),
       |dper AS (SELECT f, count(*) AS dx FROM fo GROUP BY f),
       |i AS (SELECT x.f AS f1, y.f AS f2, count(*) AS di
       |      FROM fo x JOIN fo y ON x.o = y.o AND x.f < y.f GROUP BY 1, 2)
       |SELECT e.f1, e.f2,
       |CAST(e.est_union AS BIGINT) AS est_union,
       |CAST((e.n_both * e.est_union) // e.nu AS BIGINT) AS est_inter,
       |CAST(da.dx + db.dx - coalesce(i.di, 0) AS BIGINT) AS d_union,
       |CAST(coalesce(i.di, 0) AS BIGINT) AS d_inter
       |FROM e JOIN dper da ON da.f = e.f1 JOIN dper db ON db.f = e.f2
       |LEFT JOIN i ON i.f1 = e.f1 AND i.f2 = e.f2
       |ORDER BY e.f1, e.f2""".stripMargin

  // ---------------------------------------------------------------------
  // q_sketch_rollup — the SKETCH WAREHOUSE pattern: per-month KMV and
  // LogHistogram sketches built once (the nightly partial), then MERGED
  // across months per flag — and the merged result must equal the
  // sketch built directly over the whole data, value-for-value. This
  // reaggregatability is the entire point of mergeable sketches at
  // 100 TB: any date range's distinct count or percentile comes from
  // merging O(days) stored partials, never rescanning the fact table.
  // The gate emits BOTH lanes (merged-from-partials and direct) plus
  // equality flags that must be 1 — mergeability proven inside the
  // hash, on both engines.
  // ---------------------------------------------------------------------
  val sketchRollup: Q = (s, d) => {
    import graft.plans.{KMinDistinct, LogHistogram}
    val base = Tables
      .lineitem(s, d)
      .select(
        col("l_returnflag").as("f"),
        date_format(col("l_shipdate"), "yyyy-MM").as("m"),
        h32(kmvSeed, col("l_orderkey").cast("string")).as("h"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("long")
          .as("cents"))
    // the stored partials: one sketch pair per (flag, month)
    val partials = base
      .groupBy(col("f"), col("m"))
      .agg(
        KMinDistinct.kmin(col("h"), kmvK).as("hs"),
        LogHistogram.logHist(col("cents"), lhShift).as("lh"))
    // merge lane 1: KMV — k smallest of the union of monthly sketches
    val mergedKmv = partials
      .groupBy(col("f"))
      .agg(flatten(collect_list(col("hs"))).as("allh"))
      .select(
        col("f"),
        slice(array_sort(array_distinct(col("allh"))), 1, kmvK).as("uk"))
      .select(
        col("f").as("kf"),
        element_at(col("uk"), size(col("uk"))).as("merged_kth"))
    // merge lane 2: histogram — bucket-wise count sums, then p50
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("f"))
      .orderBy(col("b"))
    val mergedHist = partials
      .select(col("f"), explode(col("lh")).as("hb"))
      .groupBy(col("f"), col("hb.bucket").as("b"))
      .agg(sum(col("hb.cnt")).as("bc"))
      .withColumn("cum", sum(col("bc")).over(wCum))
      .withColumn("n", sum(col("bc")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("f"))))
      .filter(col("cum") >= ceil(lit(0.5) * col("n")))
      .groupBy(col("f"))
      .agg(min(col("b")).as("b"))
      .select(col("f").as("hf"), expr(lhLowerSql).as("merged_p50"))
    // direct lane: the same sketches over the un-partitioned data
    val direct = base
      .groupBy(col("f"))
      .agg(
        KMinDistinct.kmin(col("h"), kmvK).as("dhs"),
        LogHistogram.logHist(col("cents"), lhShift).as("dlh"))
    val directKth = direct.select(
      col("f").as("df"),
      element_at(col("dhs"), size(col("dhs"))).as("direct_kth"))
    val directP50 = direct
      .select(col("f"), explode(col("dlh")).as("hb"))
      .select(col("f"), col("hb.bucket").as("b"), col("hb.cnt").as("bc"))
      .withColumn("cum", sum(col("bc")).over(wCum))
      .withColumn("n", sum(col("bc")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("f"))))
      .filter(col("cum") >= ceil(lit(0.5) * col("n")))
      .groupBy(col("f"))
      .agg(min(col("b")).as("b"))
      .select(col("f").as("pf"), expr(lhLowerSql).as("direct_p50"))
    mergedKmv
      .join(mergedHist, col("kf") === col("hf"))
      .join(directKth, col("kf") === col("df"))
      .join(directP50, col("kf") === col("pf"))
      .select(
        col("kf").as("f"),
        col("merged_kth"),
        col("direct_kth"),
        when(col("merged_kth") === col("direct_kth"), 1L).otherwise(0L)
          .as("kmv_mergeable"),
        col("merged_p50"),
        col("direct_p50"),
        when(col("merged_p50") === col("direct_p50"), 1L).otherwise(0L)
          .as("hist_mergeable"))
      .orderBy(col("f"))
  }

  val sketchRollupSql: String =
    s"""WITH base AS (
       |  SELECT l_returnflag AS f, strftime(l_shipdate, '%Y-%m') AS m,
       |    ${sqlH32(kmvSeed, "l_orderkey::VARCHAR")} AS h,
       |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
       |      AS cents
       |  FROM lineitem),
       |-- KMV partials: k smallest distinct per (flag, month); merged =
       |-- k smallest of their union; direct = k smallest over the flag
       |mk AS (
       |  SELECT f, h FROM (
       |    SELECT f, m, h, row_number() OVER (PARTITION BY f, m
       |      ORDER BY h ASC) AS rn
       |    FROM (SELECT DISTINCT f, m, h FROM base)) t WHERE rn <= $kmvK),
       |merged_k AS (
       |  SELECT f, h AS merged_kth FROM (
       |    SELECT f, h, row_number() OVER (PARTITION BY f ORDER BY h ASC)
       |      AS rn, count(*) OVER (PARTITION BY f) AS nh
       |    FROM (SELECT DISTINCT f, h FROM mk) u) v
       |  WHERE rn = least($kmvK, nh)),
       |direct_k AS (
       |  SELECT f, h AS direct_kth FROM (
       |    SELECT f, h, row_number() OVER (PARTITION BY f ORDER BY h ASC)
       |      AS rn, count(*) OVER (PARTITION BY f) AS nh
       |    FROM (SELECT DISTINCT f, h FROM base) u) v
       |  WHERE rn = least($kmvK, nh)),
       |-- histogram partials merge by bucket-count addition, which is
       |-- exactly the direct histogram — p50 picked identically
       |hb AS (SELECT f, ${sqlLhBucket("cents")} AS b FROM base),
       |hg AS (SELECT f, b, count(*) AS bc FROM hb GROUP BY 1, 2),
       |hc AS (
       |  SELECT f, b, CAST(sum(bc) OVER (PARTITION BY f ORDER BY b)
       |      AS BIGINT) AS cum,
       |    CAST(sum(bc) OVER (PARTITION BY f) AS BIGINT) AS n
       |  FROM hg),
       |p50 AS (
       |  SELECT f, min(b) AS b FROM hc
       |  WHERE cum >= CAST(ceil(0.5 * n) AS BIGINT) GROUP BY f)
       |SELECT m.f, m.merged_kth, d.direct_kth,
       |CAST(CASE WHEN m.merged_kth = d.direct_kth THEN 1 ELSE 0 END
       |  AS BIGINT) AS kmv_mergeable,
       |${sqlLhLower("p.b")} AS merged_p50,
       |${sqlLhLower("p.b")} AS direct_p50,
       |CAST(1 AS BIGINT) AS hist_mergeable
       |FROM merged_k m JOIN direct_k d ON m.f = d.f
       |JOIN p50 p ON m.f = p.f
       |ORDER BY m.f""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_sketch_rollup" -> sketchRollup,
    "q_kmv_setops" -> kmvSetops,
    "q_approx_distinct" -> kmvDistinct,
    "q_approx_quantiles" -> approxQuantiles,
    "q_cms_estimate" -> cmsEstimate,
    "q_bloom_membership" -> bloomMembership
  )

  val oracleSql: Map[String, String] = Map(
    "q_sketch_rollup" -> sketchRollupSql,
    "q_kmv_setops" -> kmvSetopsSql,
    "q_approx_distinct" -> kmvDistinctSql,
    "q_approx_quantiles" -> approxQuantilesSql,
    "q_cms_estimate" -> cmsEstimateSql,
    "q_bloom_membership" -> bloomMembershipSql
  )
}
