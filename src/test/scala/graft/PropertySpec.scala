package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based tests (SURVEY.md §5.2): as-of lookup equals a naive
  * max-scan on random version histories; dedup is idempotent; the top-k
  * Aggregator matches a full sort for arbitrary inputs. Uses raw
  * ScalaCheck generators with fixed seeds (deterministic across runs;
  * the scalatest-scalacheck bridge isn't in the offline cache).
  */
class PropertySpec extends SparkSpec {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private val historyGen: Gen[List[(Long, Long, Double)]] =
    for {
      n <- Gen.choose(1, 40)
      keys <- Gen.listOfN(n, Gen.choose(0L, 4L))
      vers <- Gen.listOfN(n, Gen.choose(0L, 100L))
      vals <- Gen.listOfN(n, Gen.choose(0, 99999).map(_ / 100.0))
    } yield keys.lazyZip(vers).lazyZip(vals).toList.zipWithIndex.map {
      // make (key, version) unique by folding the index into the version
      case ((k, v, x), i) => (k, v * 1000 + i, x)
    }

  test("as-of window lookup == naive per-key max-scan (random histories)") {
    val s = spark
    import s.implicits._
    (1 to 12).foreach { i =>
      val rows = sample(historyGen, 1000L + i)
      val readPoint = sample(Gen.choose(0L, 100000L), 2000L + i)
      val df = rows.toDF("key", "ver", "value")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("key"))
        .orderBy(col("ver").desc)
      val engine = df
        .filter(col("ver") <= readPoint)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("key"), col("ver"), col("value"))
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
        .toMap
      val naive = rows
        .filter(_._2 <= readPoint)
        .groupBy(_._1)
        .map { case (k, vs) =>
          val best = vs.maxBy(_._2)
          k -> (best._2, best._3)
        }
      assert(engine == naive, s"seed offset $i")
    }
  }

  test("exact dedup is idempotent: dedup(dedup(x)) == dedup(x)") {
    val s = spark
    import s.implicits._
    val textGen = Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "aa", "bb"))
    (1 to 6).foreach { i =>
      val texts = sample(textGen, 3000L + i)
      val df = texts.zipWithIndex
        .map { case (t, j) => (j.toLong, t) }
        .toDF("id", "text")
      def dedup(d: org.apache.spark.sql.DataFrame) = {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("text"))
          .orderBy(col("id").asc)
        d.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .drop("rn")
      }
      val once = dedup(df)
      val twice = dedup(once)
      assert(twice.exceptAll(once).count() == 0)
      assert(once.exceptAll(twice).count() == 0)
      assert(once.select(col("text")).distinct().count() == once.count())
    }
  }

  test("TopKAgg.merge/reduce == full sort take k (random buffers)") {
    import graft.functions.{ScoredId, TopKAgg}
    val pairGen = for {
      score <- Gen.choose(-1000, 1000).map(_ / 10.0)
      id <- Gen.choose(0L, 50L)
    } yield ScoredId(score, id)
    val listGen = Gen.listOf(pairGen)
    (1 to 50).foreach { i =>
      val items = sample(listGen, 4000L + i)
      val k = 1 + (i % 7)
      val agg = TopKAgg(k)
      val viaReduce = items.foldLeft(agg.zero)(agg.reduce)
      val (l, r) = items.splitAt(items.length / 2)
      val viaMerge = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      val expected = items.sortBy(x => (-x.score, x.id)).take(k)
      assert(viaReduce == expected, s"reduce mismatch, seed offset $i")
      assert(viaMerge == expected, s"merge mismatch, seed offset $i")
    }
  }

  test("KMinDistinct == sorted-distinct-take-k (random values, k, partitioning)") {
    val s = spark
    import s.implicits._
    val gen = for {
      n <- Gen.choose(0, 400)
      k <- Gen.choose(1, 40)
      parts <- Gen.choose(1, 9)
      // narrow domain forces duplicates; occasional negatives and
      // extremes exercise the binary-search boundaries
      vs <- Gen.listOfN(
        n,
        Gen.frequency(
          8 -> Gen.choose(-50L, 50L),
          1 -> Gen.const(Long.MinValue + 1),
          1 -> Gen.const(Long.MaxValue)))
    } yield (k, parts, vs)
    (1 to 12).foreach { i =>
      val (k, parts, vs) = sample(gen, 4000L + i)
      val want = vs.distinct.sorted.take(k)
      val got =
        if (vs.isEmpty) Seq.empty[Long]
        else
          vs.toDF("v")
            .repartition(parts)
            .agg(graft.plans.KMinDistinct.kmin(col("v"), k))
            .head()
            .getSeq[Long](0)
      assert(got == want, s"iter $i (k=$k, parts=$parts)")
    }
  }

  test("LogHistogram == group-by-bucket counts; bounds bracket every value (random input)") {
    import graft.plans.LogHistogram
    val s = spark
    import s.implicits._
    val gen = for {
      n <- Gen.choose(0, 300)
      shift <- Gen.choose(2, 7)
      parts <- Gen.choose(1, 9)
      vs <- Gen.listOfN(
        n,
        Gen.frequency(
          6 -> Gen.choose(0L, 5000L),
          2 -> Gen.choose(0L, Long.MaxValue),
          1 -> Gen.choose(-100L, 0L), // negatives collapse to bucket 0
          1 -> Gen.const(Long.MaxValue)))
    } yield (shift, parts, vs)
    (1 to 12).foreach { i =>
      val (shift, parts, vs) = sample(gen, 9000L + i)
      // the sketch is LOSSLESS at bucket granularity: its (bucket, cnt)
      // pairs must equal the plain group-by of the bucket function, for
      // any partitioning (merge = elementwise add, order-independent)
      val want = vs
        .map(v => LogHistogram.bucketOf(v, shift).toLong)
        .groupBy(identity)
        .view
        .mapValues(_.size.toLong)
        .toSeq
        .sortBy(_._1)
      val got =
        if (vs.isEmpty) Seq.empty[(Long, Long)]
        else
          vs.toDF("v")
            .repartition(parts)
            .agg(LogHistogram.logHist(col("v"), shift))
            .head()
            .getSeq[org.apache.spark.sql.Row](0)
            .map(r => (r.getLong(0), r.getLong(1)))
      assert(got == want, s"iter $i (shift=$shift, parts=$parts)")
      // bracket invariant: lowerBound(bucketOf(x)) <= x < lower + width
      for (v <- vs if v > 0L) {
        val b = LogHistogram.bucketOf(v, shift).toLong
        val lo = LogHistogram.lowerBound(b, shift)
        val w = LogHistogram.bucketWidth(b, shift)
        assert(lo <= v && (v - lo) < w, s"iter $i: v=$v b=$b lo=$lo w=$w")
      }
      // monotone: bucket index ordering respects value ordering
      val sortedVs = vs.filter(_ > 0L).sorted
      val bs = sortedVs.map(v => LogHistogram.bucketOf(v, shift))
      assert(bs == bs.sorted, s"iter $i: bucketOf not monotone")
    }
  }

  test("ZOrder2 preserves order along each axis within the other's value") {
    // fixing one 16-bit key, z is strictly monotone in the other — the
    // property range scans rely on; checked on random axes and values
    val s = spark
    import s.implicits._
    val gen = for {
      fixed <- Gen.choose(0L, 65535L)
      vals <- Gen.listOfN(60, Gen.choose(0L, 65535L))
    } yield (fixed, vals.distinct.sorted)
    (1 to 8).foreach { i =>
      val (fixedX, ys) = sample(gen, 6000L + i)
      val zs = ys
        .toDF("y")
        .select(
          graft.plans.ZOrder2.zorder(lit(fixedX), col("y")).as("z"),
          col("y"))
        .orderBy(col("y"))
        .collect()
        .map(_.getLong(0))
      assert(
        zs.sameElements(zs.sorted),
        s"iter $i: z not monotone in y for fixed x=$fixedX")
    }
  }

  test("query results are invariant under physical repartitioning") {
    // The classic distributed-correctness bug class: a result that
    // depends on partition count or row arrival order (unordered float
    // sums, undefined tie choices, collect_list without a sort). Every
    // oracle-checked query must be invariant — spot-check the round-3
    // additions plus the queries whose shapes are most at risk (exact
    // decimal sums, struct-argmax, quantized k-means, hash splits) by
    // comparing collected results under adversarial input partitioning.
    // round-7 additions most at risk: iterative LPA (per-round argmax
    // ties), PQ (two argmin passes + ADC ranking), KMV set algebra
    // (array merge order), the quantile sketch. round-8: recursive CTE
    // (UnionLoop iteration), multiset set ops (copy-count replication),
    // tokenized join (hash-keyed shuffle), the warehouse batch
    // (6-table join reorder, partial-merge union, posting-list
    // sorted-collect). round-9: containment (df-bounded candidate
    // generation + distinct pair dedup), the real-decode lanes
    // (mapPartitions over arbitrary partition boundaries), the Avro
    // round-trip (container-file-per-partition write), auto PageRank
    // (regime choice must not depend on partitioning). session-2
    // round-9 additions most at risk: the BPE argmax (driver collect of
    // a tie-broken top-1 per round), priority sampling (global top-k
    // cut), the concurrency sweep (two-level running sum must equal the
    // global order), table checksums (order-independence is the POINT),
    // dedup recall (checkpointed NLJ + bucket-join dedup), the
    // weighted/greedy merges and the per-file-group union of the mixed
    // loader path. round-10 additions most at risk: wave-batched BPE
    // (bounded-pool collect must rank identically at any partitioning),
    // the loaded-artifact ANN lane (k-means/PQ training jobs feed the
    // persisted bits), semantic dedup full + incremental (LSH-blocked
    // pair dedup + hash-min label merge), phrase search (position
    // arrays collected per (term, doc)), and the DSv2 read/write round
    // trips (per-task staging files, per-file partition readers).
    val names = Seq(
      "q_hash_split", "q_mru_sim", "q_snapshot_diff", "q_ivf_kmeans",
      "q_ngram_udtf", "q_transfer_fold", "q_label_prop", "q_similarity_pq",
      "q_kmv_setops", "q_approx_quantiles", "q_bfs_dist", "q_pagerank_pers",
      "q_recursive_cte", "q_setops_all", "q_pseudonymize",
      "q_market_share", "q_incr_agg", "q_inverted_index",
      "q_containment", "q_image_decode", "q_audio_decode",
      "q_avro_roundtrip", "q_pagerank_auto", "q_decay_features",
      "q_doc_chunks", "q_substring_dup",
      "q_damerau", "q_schema_evolution", "q_weighted_sample",
      "q_attribution", "q_concurrency", "q_interval_join",
      "q_json_malformed", "q_bpe_train", "q_table_checksum",
      "q_bitmap_distinct", "q_diversity", "q_dedup_recall",
      "q_image_resize",
      "q_bpe_train_batched", "q_bpe_encode_loaded",
      "q_similarity_ivfpq_loaded", "q_semantic_dedup",
      "q_semantic_dedup_incr", "q_phrase_search",
      "q_dsv2_write", "q_merge_retention",
      // round-11 additions most at risk: the SQL catalog lane (INSERT
      // INTO staging task count follows partitioning), MERGE INTO (the
      // delta writer's per-row ops arrive in partition order), the
      // footer-served aggregate (must not depend on how the table was
      // written), compaction (rebucket = full reshuffle by design),
      // the joined-frames ANN serving (argmin/ADC joins must rank
      // identically at any partitioning), and the closed-form quality
      // scorer (weight sums are integer and order-free — the POINT).
      "q_dsv2_sql", "q_dsv2_merge_into", "q_dsv2_agg_pushdown",
      "q_merge_compact", "q_similarity_ivfpq_served", "q_quality_score")
    val orig = spark.conf.getOption("spark.sql.shuffle.partitions")
    def run(parts: String): Map[String, Seq[String]] = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      names.map { n =>
        n -> SparkEntry
          .queries(n)(spark, sf)
          .collect()
          .map(_.toString)
          .toSeq
      }.toMap
    }
    try {
      val a = run("3")
      val b = run("17")
      names.foreach { n =>
        assert(a(n) == b(n), s"$n differs across shuffle-partition counts")
        assert(a(n).nonEmpty, s"$n returned no rows")
      }
    } finally orig.foreach(v =>
      spark.conf.set("spark.sql.shuffle.partitions", v))
  }

  test("iterative graph kernels are invariant under a hot-key skew fixture") {
    // The co-purchase gate graph is benign; a real dedup/link graph has
    // celebrity nodes. Fixture: a hub owning 50% of ALL edges (every
    // per-round join and aggregate sees one key carrying half the
    // rows — the AQE skew path SkewSpec proves for SMJ), plus a sparse
    // random remainder with long chains. LPA tie-breaks, BFS
    // relaxation, and both CC variants must produce IDENTICAL results
    // regardless of shuffle-partition count and input partitioning —
    // and the two CC algorithms must agree with each other, with the
    // star variant's round budget (its convergence require()) intact.
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val hub = 1L
    val nOther = 2000
    // 50% hub edges; 50% sparse chain-ish edges among the others
    val hubEdges = (2 to nOther + 1).map(i => (hub, i.toLong))
    val restEdges = (2 to nOther).map { i =>
      (i.toLong, (i + 1 + rnd.nextInt(5)).toLong) // forward chains
    }
    val undirected = (hubEdges ++ restEdges).toDF("u", "v")
    val bidirectional = undirected
      .select(col("u").as("src"), col("v").as("dst"))
      .unionAll(undirected.select(col("v").as("src"), col("u").as("dst")))

    val orig = spark.conf.getOption("spark.sql.shuffle.partitions")
    def runAll(parts: String, inParts: Int): Seq[Seq[String]] = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      val und = undirected.repartition(inParts)
      val bi = bidirectional.repartition(inParts)
      Seq(
        ops.Graph.labelPropCore(bi).collect().map(_.toString).toSeq,
        ops.Graph.bfsDistCore(bi, seedMax = 1L).collect().map(_.toString).toSeq,
        ops.Graph
          .connectedComponents(und)
          .orderBy(col("id"))
          .collect()
          .map(_.toString)
          .toSeq,
        ops.Graph
          .connectedComponentsStar(und)
          .orderBy(col("id"))
          .collect()
          .map(_.toString)
          .toSeq)
    }
    try {
      val a = runAll("3", 1)
      val b = runAll("17", 23)
      Seq("labelProp", "bfsDist", "cc", "ccStar").zipWithIndex.foreach {
        case (n, i) =>
          assert(a(i).nonEmpty, s"$n returned no rows on the skew fixture")
          assert(a(i) == b(i), s"$n differs under skewed repartitioning")
      }
      // one connected graph: both CC algorithms agree everywhere
      assert(a(2) == a(3), "hash-min and star CC disagree on the skew fixture")
    } finally orig.foreach(v =>
      spark.conf.set("spark.sql.shuffle.partitions", v))
  }
}
