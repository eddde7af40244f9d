package graft

import org.apache.spark.sql.functions._

/** Plan-quality audit (the "explain until it's the plan you'd want"
  * discipline): dimension joins must broadcast, bucketed joins must
  * co-locate without an exchange, and aggregation pipelines must not
  * shuffle more than their key structure requires.
  */
class PlanSpec extends SparkSpec {

  private def executed(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // materialize so AQE finalizes the plan
    // AQE's toString appends the pre-adaptive "Initial Plan" section,
    // which would double-count operators — keep only the final plan.
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  test("star join: fixed-size dims hinted, sf-proportional customer left to AQE") {
    val df = ops.Relational.multiJoin(spark, sf)
    // only nation (25 rows) and region (5 rows) carry broadcast HINTS;
    // customer grows with SF, so forcing its broadcast would OOM at
    // 100 TB — its strategy must be AQE's choice, not a hint.
    val analyzed = df.queryExecution.analyzed.toString
    val hints = "ResolvedHint".r.findAllIn(analyzed).length
    assert(hints == 2, s"expected exactly 2 broadcast hints (nation, region), got $hints:\n$analyzed")
    val plan = executed(df)
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(broadcasts >= 2, s"expected >=2 broadcast joins, plan:\n$plan")
  }

  test("ANN recall gate runs the equi-join LSH plan, never a nested-loop join") {
    // An OR-of-bucket-equalities join predicate expresses the same
    // candidate set but plans as BroadcastNestedLoopJoin — every
    // (vector, query) pair evaluated, brute force wearing an LSH
    // costume. The union-of-per-table-equi-joins form must survive
    // planning as hash joins only.
    val plan = executed(ops.Embeddings.annRecall(spark, sf))
    // Sanctioned non-equi joins, ALL against O(1)-size broadcast sides:
    // the exact ground-truth scoring (collection × fixed query sample)
    // and the centroid fan-outs (rows × centroid set: 2 untrained IVF +
    // 2 trained-quantizer). The LSH bucket joins and the IVF cell
    // probes must all be HASH joins.
    val nlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
    assert(nlj <= 5, s"unexpected nested-loop joins ($nlj > 5) in ANN recall plan:\n$plan")
    val hash = "BroadcastHashJoin".r.findAllIn(plan).length +
      "ShuffledHashJoin".r.findAllIn(plan).length +
      "SortMergeJoin".r.findAllIn(plan).length
    // long-format LSH: ONE compound-key bucket join + two re-rank joins
    // + the IVF cell probe — all hash joins
    assert(hash >= 4, s"expected >=4 hash joins (bucket + 2 re-rank + IVF probe), got $hash:\n$plan")
  }

  test("fact-to-dim join is broadcast, fact side never shuffles for it") {
    // part is sf-proportional, so the broadcast must be AQE's call
    // (no hint) — forced broadcast of a growing dim OOMs at 100 TB.
    val df = ops.Relational.brandRevenue(spark, sf)
    val hints = "ResolvedHint".r.findAllIn(df.queryExecution.analyzed.toString).length
    assert(hints == 0, s"expected no broadcast hints on sf-proportional part, got $hints")
    val plan = executed(df)
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
  }

  test("top-customers join leaves sf-proportional customer to AQE") {
    val df = ops.Relational.topCustomers(spark, sf)
    val hints = "ResolvedHint".r.findAllIn(df.queryExecution.analyzed.toString).length
    assert(hints == 0, s"expected no broadcast hints on sf-proportional customer, got $hints")
    val plan = executed(df)
    assert(plan.contains("BroadcastHashJoin"), s"AQE should broadcast customer at test SF:\n$plan")
  }

  test("salted join runs as a shuffle join — the plan salting exists for") {
    // a broadcast join has no per-key reducer a hot key could overload,
    // so a salted demo that broadcasts demonstrates nothing; the
    // SHUFFLE_HASH hint in Skew.saltedJoin pins the production shape
    val plan = executed(ops.Relational.saltedJoin(spark, sf))
    assert(plan.contains("ShuffledHashJoin"), s"no shuffle hash join:\n$plan")
    assert(
      !plan.contains("BroadcastHashJoin"),
      s"salted join broadcast a side:\n$plan")
  }

  test("source quota top-N pushes a WindowGroupLimit below the shuffle") {
    // a hot crawl domain must ship O(N) rows per input partition, not
    // its whole row stream — the rank<=N filter has to reach the map
    // side as a group limit
    val plan = executed(ops.TextPipeline.sourceQuota(spark, sf))
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit:\n$plan")
  }

  test("partition predicate prunes directories, not just row groups") {
    val plan = ops.Layout
      .prunedScan(spark, sf)
      .queryExecution
      .executedPlan
      .toString
    val pf = "PartitionFilters: \\[[^\\]]*\\]".r.findFirstIn(plan).getOrElse("")
    assert(
      pf.contains("event_type"),
      s"no partition filter on event_type (got '$pf'):\n$plan")
  }

  test("data-quality matrix reads lineitem at most twice (row-local agg + anti-join)") {
    // five checks, one fact: the row-local aggregate and the
    // referential anti-join probe are the only sanctioned scans — the
    // unpivot must not replicate the aggregate subtree per check row
    val plan = executed(ops.Relational.dataChecks(spark, sf))
    val scans = "lineitem\\.parquet".r.findAllIn(plan).length
    assert(scans <= 2, s"lineitem scanned $scans times:\n$plan")
  }

  test("shuffle-model pagerank never broadcasts the rank frame") {
    // the variant exists for the web-graph regime where the rank vector
    // exceeds any broadcast budget — a plan that sneaks the model into
    // a BroadcastExchange (AQE likes to at test SF) defeats it. The
    // checkpointed loop hides round plans, so inspect one raw round.
    val (e1, d1, r1, b1) = ops.Graph.pageRankInit(spark, sf, shuffleModel = true)
    val plan = executed(ops.Graph.pageRankStep(e1, d1, r1, b1, shuffleModel = true))
    assert(
      !plan.contains("BroadcastHashJoin") && !plan.contains("BroadcastExchange"),
      s"shuffle pagerank plans a broadcast:\n$plan")
    // and the baseline variant does broadcast the node-sized model
    val (e2, d2, r2, b2) = ops.Graph.pageRankInit(spark, sf, shuffleModel = false)
    val base = executed(ops.Graph.pageRankStep(e2, d2, r2, b2, shuffleModel = false))
    assert(base.contains("BroadcastHashJoin"), "baseline pagerank lost its broadcast")
  }

  test("containment is equi-join only, and the gram frame is materialized once") {
    // two plan hazards, both bitten in round 9: (a) a missing equi-key
    // would quietly plan a nested-loop pair enumeration — fatal at any
    // scale; (b) without the materialization barrier, CollapseProject
    // re-inlines the tokenize+shingle HOF into the explode and Generate
    // re-evaluates it per OUTPUT row (measured 23x). The checkpointed
    // gram frame shows up as LogicalRDD scans; the tokenizer expression
    // must appear in NO consumer plan.
    val plan = executed(ops.TextPipeline.containment(spark, sf))
    assert(
      !plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
      s"containment plans a non-equi join:\n$plan")
    assert(
      !plan.contains("regexp_extract_all"),
      s"gram computation re-inlined into a consumer (HOF re-eval trap):\n$plan")
  }

  test("decay features: window and aggregate share one user_id shuffle") {
    // row_number partitions by user_id and the aggregate groups by it —
    // the hash aggregate must ride the window's existing partitioning,
    // not re-exchange. Expected exchanges: one for user_id, one for the
    // final presentation sort, nothing else.
    val plan = executed(ops.Temporal.decayFeatures(spark, sf))
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 3, s"decay features re-shuffles ($exchanges Exchanges):\n$plan")
  }

  test("grouped sample keeps k rows per stratum map-side (WindowGroupLimit)") {
    // the per-group rank<=k filter must reach below the shuffle — a
    // stratum's full row stream must never ship to rank 10 survivors
    val plan = executed(ops.Sampling.groupedSample(spark, sf))
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit:\n$plan")
  }

  test("weighted sample takes a bounded top-k head, never a global sort") {
    // priority sampling is orderBy(priority).limit(k): the plan must run
    // it as TakeOrderedAndProject (per-partition k-heads merged on the
    // driver), not sort the whole corpus to keep 50 rows
    val plan = executed(ops.Sampling.weightedSample(spark, sf))
    assert(
      plan.contains("TakeOrderedAndProject"),
      s"no bounded top-k head in weighted sample:\n$plan")
    assert(!plan.contains("GlobalLimit"), s"global sort+limit:\n$plan")
  }

  test("concurrency sweep: the data-sized running sum is partitioned by day") {
    // the naive formulation is one global-order window = every delta on
    // one task. The two-level plan must show the big window partitioned
    // by day_idx; the only unpartitioned window may be the per-day
    // carry-in fold (one row per day)
    val df = ops.Temporal.concurrency(spark, sf)
    val plan = executed(df)
    val windows =
      "Window \\[[^\\]]*\\], \\[[^\\]]*\\]".r.findAllIn(plan).toList
    val dataWindows = windows.filter(_.contains("day_idx#"))
    assert(
      dataWindows.nonEmpty,
      s"no day-partitioned window found:\n$plan")
    // the attribution lane too: its carried first/last must partition
    // by user_id (never global)
    val aPlan = executed(ops.Temporal.attribution(spark, sf))
    assert(
      aPlan.contains("user_id"),
      s"attribution window lost its user partitioning:\n$aPlan")
  }

  test("interval-overlap join runs as a bucketed equi join, never a nested loop") {
    // no equi key exists in the semantics — the plan must manufacture
    // one (the hourly bucket) or the join degenerates to a cartesian
    // BroadcastNestedLoopJoin that dies at 100 TB
    val plan = executed(ops.Temporal.intervalJoin(spark, sf))
    assert(
      !plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
      s"interval join fell back to a nested loop:\n$plan")
    assert(
      plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
        plan.contains("BroadcastHashJoin"),
      s"no hash/merge equi join found:\n$plan")
  }

  test("schema evolution read prunes columns to the merged projection") {
    // mergeSchema must not force reading every column of every
    // generation: the aggregate touches 4 columns, ReadSchema must stay
    // within them
    val df = sources.Formats.schemaEvolution(spark, sf)
    val plan = executed(df)
    val reads = "ReadSchema: [^\\n]*".r.findAllIn(plan).toList
    assert(reads.nonEmpty)
    reads.foreach { r =>
      assert(
        !r.contains("o_comment:") && !r.contains("o_orderdate"),
        s"schema-evolution scan reads pruned-away columns: $r")
    }
  }

  test("auto pagerank picks broadcast at test SF, shuffle under a tiny threshold") {
    // the size-driven switch mirrors AQE's broadcast decision: model
    // size (nodes × row bytes) vs autoBroadcastJoinThreshold. At
    // sf0.001 the model is a few KB — broadcast regime; force the
    // threshold under it and the SAME entry point must flip to the
    // shuffle plan. Both arms are oracle-checked bit-identical
    // (q_pagerank_auto shares q_pagerank's SQL).
    assert(
      !ops.Graph.pageRankAutoRegime(spark, sf),
      "auto pagerank chose shuffle for a KB-scale model")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
      assert(
        ops.Graph.pageRankAutoRegime(spark, sf),
        "auto pagerank kept broadcasting over the threshold")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("sketch profiler aggregates without an Expand; exact profiler needs one") {
    // q_profile's 6 countDistinct lanes replicate the scanned rows 6×
    // through Expand; the KMV-lane twin must profile the same columns
    // from ONE un-expanded pass — that's its reason to exist
    val sketch = executed(ops.Relational.profileSketch(spark, sf))
    assert(!sketch.contains("Expand"), s"sketch profile plans an Expand:\n$sketch")
    val exact = executed(ops.Relational.profile(spark, sf))
    assert(exact.contains("Expand"), "exact profile lost its Expand — twin comment stale")
  }

  test("dim filter prunes fact partitions at RUNTIME (dynamic partition pruning)") {
    // the star-join staple: the pruning values come out of the dim
    // filter at runtime, so the fact scan's PartitionFilters must carry
    // a dynamicpruning subquery (reusing the dim broadcast) — the
    // dynamic sibling of the static directory-pruning assertion above
    val plan = ops.Layout
      .dppJoin(spark, sf)
      .queryExecution
      .executedPlan
      .toString
    val pf = "PartitionFilters: \\[[^\\]]*\\]".r.findFirstIn(plan).getOrElse("")
    assert(
      pf.toLowerCase.contains("dynamicpruning"),
      s"no dynamicpruning in PartitionFilters (got '$pf'):\n$plan")
  }

  test("exact dedup shuffles only on aggregation keys (<= 2 exchanges)") {
    val plan = executed(ops.TextPipeline.dedupExact(spark, sf))
    val exchanges = "Exchange ".r.findAllIn(plan).length
    // countDistinct expands to two-phase agg: (source, h) then (source);
    // +1 for the final tiny orderBy range partitioning
    assert(exchanges <= 3, s"too many exchanges ($exchanges):\n$plan")
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    // At 100 TB a selective dim filter should reach the FACT scan as a
    // runtime bloom filter (row-level semi-join reduction before the
    // shuffle), not only as a post-shuffle join. The size thresholds
    // exist for plan-cost sanity; lower them to test-scale so the
    // optimizer treats our MB-scale tables like the TB-scale case.
    val restore = Seq(
      "spark.sql.autoBroadcastJoinThreshold" ->
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
      "spark.sql.optimizer.runtime.bloomFilter.enabled" ->
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled"),
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" ->
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"),
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" ->
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    try {
      val li = Tables.lineitem(spark, sf)
      val p = Tables.part(spark, sf).filter(col("p_brand") === "Brand#23")
      val joined = li
        .join(p, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"))
      val plan = executed(joined)
      assert(
        plan.toLowerCase.contains("might_contain"),
        s"no runtime bloom filter on the fact scan:\n$plan")
    } finally restore.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("persist() serves repeated reads from the in-memory cache (§2.7 dual)") {
    val df = Tables.customer(spark, sf)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))
      .persist()
    try {
      df.count() // materialize the cache
      val again = df.filter(col("n") > 0)
      again.collect()
      val plan = again.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(
        plan.contains("InMemoryTableScan") || plan.contains("TableCacheQueryStage"),
        s"second action did not read the cache:\n$plan")
    } finally df.unpersist()
  }

  test("bucketed join co-locates without any exchange") {
    val s = spark
    import s.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
      Tables
        .orders(spark, sf)
        .write
        .mode("overwrite")
        .bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .saveAsTable("b_orders")
      Tables
        .customer(spark, sf)
        .write
        .mode("overwrite")
        .bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .saveAsTable("b_customer")
      val joined = spark
        .table("b_orders")
        .join(spark.table("b_customer"), $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n"))
      val plan = {
        joined.collect()
        joined.queryExecution.executedPlan.toString
      }
      // the join itself must not repartition either bucketed side — the
      // only exchange allowed is the one feeding the final aggregation
      val joinSection = plan.split("HashAggregate").last
      assert(
        !joinSection.contains("Exchange hashpartitioning(o_custkey")
          && !joinSection.contains("Exchange hashpartitioning(c_custkey"),
        s"bucketed join re-shuffled a bucketed side:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      // value sanity vs the unbucketed join
      val expect = Tables
        .orders(spark, sf)
        .join(
          Tables.customer(spark, sf),
          col("o_custkey") === col("c_custkey"))
        .count()
      assert(joined.agg(sum($"n")).first().getLong(0) == expect)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.enabled")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("observe() piggybacks data-quality metrics on the main query, zero extra scans") {
    // q_data_checks pays ≤2 scans for a standalone audit; the
    // production pattern for ALWAYS-ON quality metrics is
    // Dataset.observe — accumulator-backed metrics collected as a side
    // effect of whatever query already runs, so at 100 TB the audit
    // costs zero additional I/O. Pinned: the observed metrics equal
    // independently-computed aggregates, and the observed plan still
    // scans lineitem exactly once.
    val li = Tables.lineitem(spark, sf)
    val observed = li
      .observe(
        "dq",
        count(lit(1)).as("n_rows"),
        sum(when(col("l_quantity") <= 0, 1L).otherwise(0L)).as("bad_qty"),
        sum(when(col("l_discount") < 0 || col("l_discount") > 1, 1L).otherwise(0L))
          .as("bad_disc"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"))
    observed.collect()
    val metrics = observed.queryExecution.observedMetrics("dq")
    val expect = li
      .agg(
        count(lit(1)),
        sum(when(col("l_quantity") <= 0, 1L).otherwise(0L)),
        sum(when(col("l_discount") < 0 || col("l_discount") > 1, 1L).otherwise(0L)))
      .first()
    assert(metrics.getAs[Long]("n_rows") == expect.getLong(0))
    assert(metrics.getAs[Long]("bad_qty") == expect.getLong(1))
    assert(metrics.getAs[Long]("bad_disc") == expect.getLong(2))
    val plan = observed.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"observe() must not add a scan, got $scans:\n$plan")
  }

  test("file-served ANN joins the model frames — no codebook literal in the plan") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_ann_plan")
      .toString
    ops.Embeddings.saveAnnModel(spark, sf, path)
    val served = ops.Embeddings.serveAnnJoined(spark, sf, path)
    val plan = executed(served)
    // the model must enter the plan as SCANS of the artifact files...
    assert(plan.contains("pq_codebook"),
      s"codebook not scanned as a frame:\n${plan.take(4000)}")
    assert(plan.contains("ivf_centroids"),
      s"centroids not scanned as a frame:\n${plan.take(4000)}")
    // ...and never as a driver-resident model. Detector: the
    // model-carrying native expressions (pq_encode / pq_dtab hold the
    // codebook as an expression-referenced object — round 17's
    // replacement for the nested-array literal, which printed the
    // centroid values into the plan string; both forms mean the model
    // was inlined rather than joined as data).
    val inlineSigs = Seq("pq_encode", "pq_dtab")
    val firstCq = spark.read.parquet(s"$path/pq_codebook")
      .orderBy("sub", "j").head().getSeq[Long](2)
    val litSigs = Seq(firstCq.mkString(","), firstCq.mkString(", "))
    assert(!(inlineSigs ++ litSigs).exists(plan.contains),
      "codebook model inlined in the served plan")
    // the literal lane (same model bits) DOES carry it — proving the
    // detector sees what this lane avoids
    val loadedPlan = executed(ops.Embeddings.serveAnnFrom(spark, sf, path))
    assert(inlineSigs.exists(loadedPlan.contains),
      "detector failed to flag the literal lane's codebook model")
  }
}
