package graft.ops

import graft.Tables
import graft.functions.Hashing._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Distributed iterative graph algorithms over DataFrames — the step a
  * real dedup pipeline runs AFTER pair generation: near-duplicate PAIRS
  * are not clusters, and keeping "one of each pair" double-drops
  * documents that appear in two pairs (A~B, B~C must keep exactly one
  * of {A,B,C}, not one per pair). Connected components turn the edge
  * list into canonical duplicate clusters.
  *
  * Spark-first design: hash-min label propagation — every node starts
  * labeled with its own id; each round every node takes the min of its
  * own and its neighbors' labels; converged when no label changes. Each
  * round is one shuffle join (edges × labels, partitioned by node id)
  * plus one min-aggregate, all codegen'd; the driver only sees the
  * single `sum(label)` convergence scalar per round, never the labels.
  * Rounds needed = component diameter, and duplicate clusters are
  * shallow (a chain only forms through overlapping near-dup pairs) —
  * single digits in practice. For adversarial long-path graphs the
  * two-phase large-star/small-star variant (Kiveris et al., "Connected
  * Components in MapReduce and Beyond", SoCC'14) is implemented as
  * [[connectedComponentsStar]]: O(log² n) rounds with the same
  * per-round shuffle shape; hash-min stays the default for dedup
  * workloads, star is the fallback when the 25-round cap trips.
  *
  * Reference analogue: opusdb has no graph surface; this extends the
  * north-star LLM-pipeline family (SURVEY §2.12).
  */
object Graph {
  type Q = (SparkSession, String) => DataFrame

  private def normText(c: Column) =
    trim(regexp_replace(lower(c), "\\s+", " "))
  private val sqlNormText: String => String =
    e => s"trim(regexp_replace(lower($e), '\\s+', ' ', 'g'))"

  /** Max label-propagation rounds before declaring non-convergence: a
    * duplicate-cluster graph that still changes after 25 rounds has a
    * 25-hop near-dup chain and deserves a loud failure, not a silently
    * wrong cluster id.
    */
  private val maxCcRounds = 25

  /** Hash-min connected components. `edges` must be undirected pairs
    * (u, v); labels converge to the min node id of each component.
    * Returns (id, cluster_id) for every node that appears in an edge.
    *
    * Each round localCheckpoints the label frame: the loop would
    * otherwise rebuild the full lineage every round (N references to a
    * DataFrame are N subtree copies — no CSE), turning round k into k
    * recomputations. Convergence is detected through sum(label): labels
    * only ever decrease, so the sum strictly decreases iff any label
    * changed — one scalar job per round instead of a changed-row join.
    * The sum is aggregated in DECIMAL(38,0) so id magnitude can't
    * overflow at collection scale.
    */
  private[graft] def connectedComponents(edges: DataFrame): DataFrame = {
    // materialize the edge list ONCE: every loop round references `bi`
    // (and the union references `edges` twice), and each reference is a
    // full subtree copy — without this checkpoint the pair-generation
    // join upstream re-executes 2× per round (measured 50 s → 1.4 s on
    // q_dup_clusters at sf0.1)
    // LAZY checkpoints throughout the loop: the convergence probe right
    // after each one is the action that materializes its blocks, so a
    // round costs ONE job (materialize + probe fused), not two. With ~4
    // rounds plus init that halves the query's sequential-job count —
    // and these driver-coordinated round trips, not the shuffles, are
    // what dominates a small-diameter CC at any scale.
    val bi = edges
      .select(col("u").as("s"), col("v").as("d"))
      .unionAll(edges.select(col("v").as("s"), col("u").as("d")))
      .localCheckpoint(false)
    var labels = bi
      .select(col("s").as("id"))
      .distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(false)
    var prevSum = labels
      .agg(sum(col("label").cast("decimal(38,0)")))
      .head()
      .getDecimal(0)
    // an empty edge set (every doc its own cluster upstream) is a valid
    // input: sum over zero labels is NULL, and the loop below would NPE
    // on compareTo — converged trivially, return the empty label frame
    if (prevSum == null)
      return labels.select(col("id"), col("label").as("cluster_id"))
    var converged = false
    var round = 0
    while (!converged && round < maxCcRounds) {
      val neighborMin = bi
        .join(labels, bi("s") === labels("id"))
        .groupBy(col("d"))
        .agg(min(col("label")).as("nmin"))
      val next = labels
        .join(neighborMin, labels("id") === neighborMin("d"), "left")
        .select(
          col("id"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
        .localCheckpoint(false)
      val nextSum = next
        .agg(sum(col("label").cast("decimal(38,0)")))
        .head()
        .getDecimal(0)
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      labels = next
      round += 1
    }
    require(
      converged,
      s"connected components did not converge in $maxCcRounds rounds — " +
        "component diameter exceeds the hash-min budget; use " +
        "connectedComponentsStar (O(log² n) rounds) for long-chain graphs")
    labels.select(col("id"), col("label").as("cluster_id"))
  }

  /** Round cap for the star algorithm: convergence is proven in
    * O(log² n) two-phase rounds (SoCC'14 Thm 2), so 50 is far beyond
    * any graph that fits a cluster; hitting it means a logic bug, not a
    * big graph.
    */
  private val maxStarRounds = 50

  /** Two-phase large-star/small-star connected components (Kiveris et
    * al., SoCC'14) — same contract as [[connectedComponents]]: input
    * undirected pairs (u, v), output (id, cluster_id = component min)
    * for every node appearing in a non-self-loop edge. Unlike hash-min,
    * round count is O(log² n) rather than O(diameter), so a 100-hop
    * near-dup chain converges instead of tripping the round cap.
    *
    * Per round both phases are the hash-min shuffle shape — a groupBy
    * on a node key plus an equi-join back — and the edge set only ever
    * shrinks toward stars rooted at component minima, so partial
    * aggregation bounds every partition's contribution. Each round
    * localCheckpoints (lineage discipline as hash-min) and ships the
    * driver ONE (count, decimal checksum) pair; the edge set is a
    * distinct set, so an unchanged (count, Σ(s·2³² + d)) pair is the
    * fixpoint probe (exact compare of a set against itself, not a
    * monotone potential — the checksum is exact decimal arithmetic).
    */
  private[graft] def connectedComponentsStar(edges: DataFrame): DataFrame = {
    // direct every edge (larger → smaller), drop self loops
    // lazy: the probe() right below materializes the blocks in its own
    // job — same fusion as hash-min's loop
    var e = edges
      .filter(col("u") =!= col("v"))
      .select(
        greatest(col("u"), col("v")).as("s"),
        least(col("u"), col("v")).as("d"))
      .distinct()
      .localCheckpoint(false)

    def probe(df: DataFrame): (Long, java.math.BigDecimal) = {
      val r = df
        .agg(
          count(lit(1)),
          coalesce(
            sum(col("s").cast("decimal(38,0)") * lit(4294967296L) +
              col("d").cast("decimal(38,0)")),
            lit(0).cast("decimal(38,0)")))
        .head()
      (r.getLong(0), r.getDecimal(1))
    }

    // large-star: every node u sends its strictly-LARGER neighbors to
    // m(u) = min(Γ(u) ∪ {u}) — long tails collapse toward minima
    def largeStar(df: DataFrame): DataFrame = {
      val bi = df
        .select(col("s").as("a"), col("d").as("b"))
        .unionAll(df.select(col("d").as("a"), col("s").as("b")))
      val m = bi
        .groupBy(col("a"))
        .agg(min(col("b")).as("mb"))
        .select(col("a"), least(col("a"), col("mb")).as("m"))
      bi.join(m, Seq("a"))
        .filter(col("b") > col("a"))
        .select(col("b").as("s"), col("m").as("d"))
        .distinct()
    }

    // small-star: every node u re-points its SMALLER neighbors (and
    // itself) at m(u) = min of that neighborhood — stars flatten
    def smallStar(df: DataFrame): DataFrame = {
      val m = df.groupBy(col("s")).agg(min(col("d")).as("m"))
      df.join(m, Seq("s"))
        .select(col("d").as("v"), col("m"))
        .unionAll(m.select(col("s").as("v"), col("m")))
        .filter(col("v") =!= col("m"))
        .select(col("v").as("s"), col("m").as("d")) // v > m by construction
        .distinct()
    }

    var (pc, ps) = probe(e)
    var converged = false
    var round = 0
    while (!converged && round < maxStarRounds) {
      val next = smallStar(largeStar(e)).localCheckpoint(false)
      val (nc, ns) = probe(next)
      converged = nc == pc && ns.compareTo(ps) == 0
      pc = nc
      ps = ns
      e = next
      round += 1
    }
    require(converged, s"star CC did not converge in $maxStarRounds rounds")
    // fixpoint = stars rooted at each component min: every non-root
    // points at exactly one root; roots label themselves
    val nodes = e
      .select(col("s").as("id"))
      .unionAll(e.select(col("d").as("id")))
      .distinct()
    val lab = e.groupBy(col("s")).agg(min(col("d")).as("cl"))
    nodes
      .join(lab, nodes("id") === lab("s"), "left")
      .select(col("id"), coalesce(col("cl"), col("id")).as("cluster_id"))
  }

  // ---------------------------------------------------------------------
  // q_dup_clusters — canonical duplicate clusters over the documents
  // table. Edge set (deterministic on both engines):
  //   (a) near-dup pairs: word-bigram Jaccard >= 0.9 within the same
  //       (lang, n_chars div 100) block — the integer form
  //       10*|∩| >= 9*|∪| avoids a float threshold compare;
  //   (b) exact-dup star edges: every doc sharing an md5(norm(text))
  //       digest with an earlier doc gets an edge to the group's min
  //       doc_id — O(group) edges, not O(group²).
  // Then hash-min connected components; per clustered doc: cluster id
  // (min member id), cluster size, and the canonical-keep flag (longest
  // text wins, doc_id breaks ties) — the row a training pipeline keeps.
  // Scale: pair work is block-bounded (near-dup) or linear (exact), CC
  // rounds are diameter-bounded shuffle joins on the id key.
  // ---------------------------------------------------------------------
  val dupClusters: Q = (s, d) =>
    dupClustersWith(s, d, connectedComponents)

  // ---------------------------------------------------------------------
  // q_dup_clusters_star — the IDENTICAL query on the large-star/
  // small-star CC (SoCC'14) instead of hash-min: same edges, same
  // oracle, hash-identical output. This puts the O(log² n)-round
  // algorithm itself — the one that survives adversarial diameters
  // hash-min's 25-round cap refuses — under the exact gate, not just
  // under GraphSpec's property tests.
  // ---------------------------------------------------------------------
  val dupClustersStar: Q = (s, d) =>
    dupClustersWith(s, d, connectedComponentsStar)

  private[graft] def profileEdges(s: SparkSession, d: String): Long =
    dupEdges(s, d).count()

  private[graft] def dupEdges(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    // Pairs are compared in HASHED gram space: h32 of each bigram,
    // deduped — the per-pair intersection then runs over primitive
    // longs instead of UTF8Strings (~5× cheaper in the join predicate,
    // measured at sf0.1). Hash collisions perturb |∩| identically on
    // both engines (the oracle applies the same h32), and the
    // minhash-style approximation is standard for near-dup edges.
    // Both self-join sides reference this subtree, and Catalyst plans
    // each reference as a full copy — without the checkpoint the
    // tokenize+bigram+hash pass (the scan-dominant half of this query)
    // runs twice. EAGER: the join's two map stages run concurrently, so
    // a lazy checkpoint would race and still compute it twice.
    // Grams are SORTED once per doc: the join predicate below is a
    // sorted-merge jaccard_ge, so the O(n log n) sort happens 5k times
    // (per doc) instead of any per-pair hashing (~600k pairs).
    val grams = docs
      .withColumn("toks", tokens(col("text")))
      .select(
        col("doc_id"),
        col("lang"),
        floor(col("n_chars") / 100).as("lenb"),
        sort_array(
          array_distinct(transform(wordBigrams(col("toks")), g => h32(31, g))))
          .as("grams"))
      .localCheckpoint(true)
    val a = grams.select(
      col("lang"), col("lenb"),
      col("doc_id").as("u"), col("grams").as("g_a"))
    val b = grams.select(
      col("lang"), col("lenb"),
      col("doc_id").as("v"), col("grams").as("g_b"))
    // The threshold J >= 0.9 is evaluated by the codegen'd sorted-merge
    // jaccard_ge Expression (plans/JaccardGE.scala): same rearranged
    // integer inequality 19·|∩| >= 9·(|A|+|B|) as before, but with NO
    // per-pair hash-set build and an early-abort bound — the dominant
    // disjoint pairs exit ~5% into the merge (array_intersect here was
    // ~2 s of the query's 3.3 s at sf0.1). The size-ratio gate is
    // implied by the threshold (J >= 0.9 forces |A|,|B| within 10%) and
    // short-circuits the merge for length-skewed pairs.
    val nearPairs = a
      .join(b, Seq("lang", "lenb"))
      .filter(
        col("u") < col("v") &&
          size(col("g_a")) * 10 >= size(col("g_b")) * 9 &&
          size(col("g_b")) * 10 >= size(col("g_a")) * 9 &&
          graft.plans.JaccardGE.jaccardGE(col("g_a"), col("g_b"), 9, 10))
      .select(col("u"), col("v"))
    val wDigest = Window.partitionBy(col("h"))
    val exactPairs = docs
      .select(col("doc_id"), md5(normText(col("text"))).as("h"))
      .withColumn("m", min(col("doc_id")).over(wDigest))
      .filter(col("doc_id") =!= col("m"))
      .select(col("m").as("u"), col("doc_id").as("v"))
    nearPairs.unionAll(exactPairs).distinct()
  }

  private def dupClustersWith(
      s: SparkSession,
      d: String,
      cc: DataFrame => DataFrame): DataFrame = {
    val docs = Tables.documents(s, d)
    val edges = dupEdges(s, d)
    val labels = cc(edges)
    val wCluster = Window.partitionBy(col("cluster_id"))
    val wKeep = Window
      .partitionBy(col("cluster_id"))
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    labels
      .join(docs.select(col("doc_id"), col("n_chars")), col("id") === col("doc_id"))
      .select(col("doc_id"), col("cluster_id"), col("n_chars"))
      .withColumn("cluster_size", count(lit(1)).over(wCluster))
      .withColumn(
        "is_canonical",
        when(row_number().over(wKeep) === 1, lit(1)).otherwise(lit(0)))
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"), col("is_canonical"))
      .orderBy(col("cluster_id"), col("doc_id"))
  }

  // ---------------------------------------------------------------------
  // q_dup_clusters_incr — INCREMENTAL duplicate-cluster maintenance: the
  // day-2 shape of q_dup_clusters. The corpus (doc_id % 5 != 4, the
  // q_dedup_incremental split) owns a persisted LABEL ARTIFACT — its
  // converged components. An ARRIVING batch then (1) generates only the
  // pairs that TOUCH an arriving doc (arriving × all within the same
  // (lang, length-bucket) blocks — never corpus × corpus again), and
  // (2) merges them with the label artifact REPLAYED AS EDGES
  // (cluster_id — id): hash-min over that graph re-converges in rounds
  // bounded by the new edges' topology, because the artifact edges are
  // already diameter-1 stars. At 100 TB the corpus self-join is ~25×
  // the arriving probe (95% × 95% vs 5% × 100%), so day-2 cost drops
  // by that factor while the result is pinned BIT-IDENTICAL to the
  // full recompute: the oracle is dupClustersSql verbatim.
  //
  // Exact-dup edges split the same way: within-corpus digest groups
  // star onto the corpus min (the artifact's half), and any digest
  // group containing an arriving doc re-stars onto the GLOBAL min —
  // which re-links the corpus star when the arriving doc takes over as
  // the minimum.
  // ---------------------------------------------------------------------
  val dupClustersIncr: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val arrivingPred = (col("doc_id") % 5) === 4
    val grams = docs
      .withColumn("toks", tokens(col("text")))
      .select(
        col("doc_id"),
        arrivingPred.as("arr"),
        col("lang"),
        floor(col("n_chars") / 100).as("lenb"),
        sort_array(
          array_distinct(transform(wordBigrams(col("toks")), g => h32(31, g))))
          .as("grams"))
      .localCheckpoint(true)
    // near-dup pairs with at least one side from `a` (blocked, sorted-
    // merge jaccard_ge — the q_dup_clusters predicate), normalized u<v
    def nearTouching(a: DataFrame, b: DataFrame): DataFrame =
      a.select(
        col("lang"), col("lenb"),
        col("doc_id").as("ua"), col("grams").as("g_a"))
        .join(
          b.select(
            col("lang"), col("lenb"),
            col("doc_id").as("vb"), col("grams").as("g_b")),
          Seq("lang", "lenb"))
        .filter(
          col("ua") =!= col("vb") &&
            size(col("g_a")) * 10 >= size(col("g_b")) * 9 &&
            size(col("g_b")) * 10 >= size(col("g_a")) * 9 &&
            graft.plans.JaccardGE.jaccardGE(col("g_a"), col("g_b"), 9, 10))
        .select(
          least(col("ua"), col("vb")).as("u"),
          greatest(col("ua"), col("vb")).as("v"))
        .distinct()
    val corpusG = grams.filter(!col("arr"))
    val dig = docs
      .select(
        col("doc_id"),
        arrivingPred.as("arr"),
        md5(normText(col("text"))).as("h"))
    val wD = Window.partitionBy(col("h"))
    val corpusExact = dig
      .filter(!col("arr"))
      .withColumn("m", min(col("doc_id")).over(wD))
      .filter(col("doc_id") =!= col("m"))
      .select(col("m").as("u"), col("doc_id").as("v"))
    // steady state: the corpus's converged labels (the persisted artifact)
    val corpusLabels = connectedComponents(
      nearTouching(corpusG, corpusG).unionAll(corpusExact).distinct())
    // day 2: only arriving-touching pairs + re-starred exact groups
    val newNear = nearTouching(grams.filter(col("arr")), grams)
    val arrExact = dig
      .withColumn("m", min(col("doc_id")).over(wD))
      .withColumn(
        "has_arr", max(when(col("arr"), 1).otherwise(0)).over(wD))
      .filter(col("has_arr") === 1 && col("doc_id") =!= col("m"))
      .select(col("m").as("u"), col("doc_id").as("v"))
    val merged = connectedComponents(
      corpusLabels
        .select(col("cluster_id").as("u"), col("id").as("v"))
        .unionAll(newNear)
        .unionAll(arrExact)
        .distinct())
    val wCluster = Window.partitionBy(col("cluster_id"))
    val wKeep = Window
      .partitionBy(col("cluster_id"))
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    merged
      .join(
        docs.select(col("doc_id"), col("n_chars")),
        col("id") === col("doc_id"))
      .select(col("doc_id"), col("cluster_id"), col("n_chars"))
      .withColumn("cluster_size", count(lit(1)).over(wCluster))
      .withColumn(
        "is_canonical",
        when(row_number().over(wKeep) === 1, lit(1)).otherwise(lit(0)))
      .select(
        col("doc_id"), col("cluster_id"), col("cluster_size"),
        col("is_canonical"))
      .orderBy(col("cluster_id"), col("doc_id"))
  }

  val dupClustersSql: String = {
    val toks = sqlTokens("text")
    s"""WITH RECURSIVE
       |g AS (
       |  SELECT doc_id, lang, CAST(floor(n_chars / 100) AS BIGINT) AS lenb,
       |    list_distinct(list_transform(${sqlWordBigrams(toks)},
       |      g -> ${sqlH32(31, "g")})) AS grams
       |  FROM documents),
       |np AS (
       |  SELECT a.doc_id AS u, b.doc_id AS v
       |  FROM g a JOIN g b ON a.lang = b.lang AND a.lenb = b.lenb
       |    AND a.doc_id < b.doc_id
       |    AND len(a.grams) * 10 >= len(b.grams) * 9
       |    AND len(b.grams) * 10 >= len(a.grams) * 9
       |  WHERE 19 * len(list_intersect(a.grams, b.grams)) >=
       |    9 * (len(a.grams) + len(b.grams))),
       |hx AS (
       |  SELECT doc_id, min(doc_id) OVER (PARTITION BY h) AS m
       |  FROM (SELECT doc_id, md5(${sqlNormText("text")}) AS h FROM documents)),
       |edges AS (
       |  SELECT u, v FROM np
       |  UNION
       |  SELECT m AS u, doc_id AS v FROM hx WHERE doc_id != m),
       |bi AS (
       |  SELECT u AS s, v AS dd FROM edges
       |  UNION ALL SELECT v AS s, u AS dd FROM edges),
       |reach(id, lab) AS (
       |  SELECT DISTINCT s AS id, s AS lab FROM bi
       |  UNION
       |  SELECT b.dd AS id, r.lab FROM reach r JOIN bi b ON b.s = r.id),
       |lbl AS (SELECT id, min(lab) AS cluster_id FROM reach GROUP BY id)
       |SELECT l.id AS doc_id, l.cluster_id,
       |  count(*) OVER (PARTITION BY l.cluster_id) AS cluster_size,
       |  CASE WHEN row_number() OVER (PARTITION BY l.cluster_id
       |    ORDER BY dc.n_chars DESC, l.id ASC) = 1 THEN 1 ELSE 0 END AS is_canonical
       |FROM lbl l JOIN documents dc ON dc.doc_id = l.id
       |ORDER BY l.cluster_id, doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q_pagerank — PageRank over the part↔supplier co-occurrence graph
  // (distinct lineitem (part, supplier) pairs, both directions, so no
  // dangling nodes), made bit-deterministic by QUANTIZED-INTEGER rank
  // arithmetic — the same discipline as q_ivf_kmeans's centroids: float
  // ranks are order-dependent under parallel summation, so ranks live
  // at scale Q = 10^12 and every step is integer-exact on both engines:
  //   r0(v)   = Q div N
  //   c(u)    = (17 · (r(u) div deg(u))) div 20        (damping 0.85)
  //   r'(v)   = (3·Q) div (20·N) + Σ_in c(u)
  // (floor division drops sub-ulp mass — documented, identical on both
  // engines; the RANKING is what the operator ships). Three iterations,
  // each one shuffle join + one hash aggregate, labels localCheckpoint'd
  // per round (lineage would otherwise re-run round k, k times); N and
  // the per-round base are driver-held MODEL STATE like the k-means
  // centroids. Emits the top-10 nodes. Oracle: three unrolled CTEs.
  // ---------------------------------------------------------------------
  private val prQ = 1000000000000L // rank scale 10^12
  private val prIters = 3

  val pageRank: Q = (s, d) => pageRankWith(s, d, shuffleModel = false)

  // ---------------------------------------------------------------------
  // q_pagerank_shuffle — the SAME computation with the rank-model join
  // run as a SHUFFLE join instead of a broadcast: the web-graph regime,
  // where the rank vector no longer fits an executor broadcast. Edges
  // pre-partition by src (the join key), so each round's join reuses
  // that partitioning and only the node-sized model and the
  // edge-narrow contributions cross the wire. Integer rank arithmetic
  // makes the two variants bit-identical — same oracle SQL, and
  // PlanSpec asserts the model is genuinely not broadcast.
  // ---------------------------------------------------------------------
  val pageRankShuffle: Q = (s, d) => pageRankWith(s, d, shuffleModel = true)

  // ---------------------------------------------------------------------
  // q_pagerank_auto — SIZE-DRIVEN regime selection between the two
  // variants above, mirroring what AQE does for ordinary joins: estimate
  // the rank-model frame's size from the node count (one cheap
  // countDistinct pre-pass over the distinct edge pairs — no edge
  // materialization) and compare against the session's
  // autoBroadcastJoinThreshold. Under the threshold the model rides a
  // per-round broadcast (the data-warehouse regime); over it the join
  // flips to the src-partitioned shuffle plan (the web-graph regime,
  // where a node-sized broadcast would OOM every executor). Both arms
  // are integer-exact and bit-identical, so the choice is a pure
  // physical-plan decision — same oracle SQL as q_pagerank.
  // ---------------------------------------------------------------------
  /** ~48 bytes per model row: three packed longs (node, r, deg) plus
    * UnsafeRow/broadcast-hashmap overhead — deliberately conservative so
    * the flip to shuffle happens BEFORE the broadcast becomes a risk.
    */
  private val prModelRowBytes = 48L

  /** The regime decision, exposed for PlanSpec: true = shuffle model. */
  private[graft] def pageRankAutoRegime(s: SparkSession, d: String): Boolean = {
    val cnt = Tables
      .lineitem(s, d)
      .select(col("l_partkey"), col("l_suppkey"))
      .distinct()
      .agg(
        countDistinct(col("l_partkey")).as("np"),
        countDistinct(col("l_suppkey")).as("ns"))
      .head()
    val nNodes = cnt.getLong(0) + cnt.getLong(1)
    val thr = s.sessionState.conf.autoBroadcastJoinThreshold
    thr >= 0 && nNodes * prModelRowBytes > thr
  }

  val pageRankAuto: Q = (s, d) =>
    pageRankWith(s, d, shuffleModel = pageRankAutoRegime(s, d))

  /** One rank iteration, un-checkpointed — the loop body, also the
    * plan-inspection surface PlanSpec drives (the checkpointed loop
    * hides its join plans behind LogicalRDDs).
    */
  private[graft] def pageRankStep(
      edges: DataFrame,
      deg: DataFrame,
      r: DataFrame,
      base: Long,
      shuffleModel: Boolean): DataFrame = {
    // In the web-graph regime EVERY node-sized frame (rank, degree,
    // their join) exceeds the broadcast budget, so the shuffle variant
    // pins shuffle_hash on both joins — and on the baseline, the
    // node-sized model rides one broadcast per round.
    val model =
      if (shuffleModel) r.hint("shuffle_hash").join(deg, Seq("node"))
      else r.join(deg, Seq("node"))
    val joined =
      if (shuffleModel)
        // SHUFFLE_HASH pins the plan even where AQE would see a
        // broadcast-sized model at test SF — the variant exists to
        // prove the no-broadcast plan
        edges.join(model.hint("shuffle_hash"), col("src") === col("node"))
      else edges.join(broadcast(model), col("src") === col("node"))
    joined
      .select(col("dst"), expr("(17 * (r div deg)) div 20").as("c"))
      .groupBy(col("dst"))
      .agg(sum(col("c")).as("s"))
      .select(col("dst").as("node"), (lit(base) + col("s")).as("r"))
  }

  /** Edge/degree/initial-rank frames for [[pageRankStep]]. */
  private[graft] def pageRankInit(
      s: SparkSession,
      d: String,
      shuffleModel: Boolean): (DataFrame, DataFrame, DataFrame, Long) = {
    val pairs = Tables
      .lineitem(s, d)
      .select(col("l_partkey"), col("l_suppkey"))
      .distinct()
    val fwd = pairs.select(
      (col("l_partkey") * 2).as("src"),
      (col("l_suppkey") * 2 + 1).as("dst"))
    // The edge list is the BIG side — pre-partition it ONCE on the key
    // each round re-uses and checkpoint (localCheckpoint preserves the
    // partitioning). Broadcast model: partition by dst, so the per-round
    // aggregation reduces in place and NOTHING edge-sized ever moves.
    // Shuffle model: partition by src, so the per-round JOIN is
    // exchange-free on the edge side and only the node-sized model and
    // the (dst, c) contributions shuffle — the web-graph trade.
    // EXPLICIT partition count: a bare repartition(col) is an AQE
    // coalescing target, and a coalesced read no longer reports the
    // HashPartitioning the per-round join/aggregation requires — the
    // checkpointed partitioning would be re-exchanged every round.
    val p = s.sessionState.conf.numShufflePartitions
    val edges = fwd
      .unionAll(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(p, if (shuffleModel) col("src") else col("dst"))
      .localCheckpoint()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .select(col("src").as("node"), col("deg"))
      .localCheckpoint()
    val nNodes = deg.count() // driver-held model scalar
    val base = (3L * prQ) / (20L * nNodes)
    val r0 = deg.select(col("node"), lit(prQ / nNodes).as("r"))
    (edges, deg, r0, base)
  }

  private def pageRankWith(
      s: SparkSession,
      d: String,
      shuffleModel: Boolean): DataFrame = {
    val (edges, deg, r0, base) = pageRankInit(s, d, shuffleModel)
    var r = r0
    for (_ <- 1 to prIters) {
      r = pageRankStep(edges, deg, r, base, shuffleModel).localCheckpoint()
    }
    r.select(
        when(col("node") % 2 === 0, lit("part")).otherwise(lit("supplier"))
          .as("kind"),
        expr("node div 2").as("orig_id"),
        col("r").as("rank_q"))
      .orderBy(col("rank_q").desc, col("kind").asc, col("orig_id").asc)
      .limit(10)
  }

  val pageRankSql: String = {
    def cIter(rPrev: String, i: Int): String =
      s"""c$i AS (
         |  SELECT e.dst AS node,
         |    CAST(SUM((17 * (r.r // d.deg)) // 20) AS BIGINT) AS s
         |  FROM edges e JOIN $rPrev r ON e.src = r.node
         |  JOIN deg d ON e.src = d.src
         |  GROUP BY e.dst),
         |r$i AS (SELECT node, (3 * $prQ) // (20 * nn.n) + s AS r FROM c$i, nn)""".stripMargin
    s"""WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
       |edges AS (
       |  SELECT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst FROM pairs
       |  UNION ALL
       |  SELECT l_suppkey * 2 + 1 AS src, l_partkey * 2 AS dst FROM pairs),
       |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
       |nn AS (SELECT count(*) AS n FROM deg),
       |r0 AS (SELECT src AS node, $prQ // nn.n AS r FROM deg, nn),
       |${cIter("r0", 1)},
       |${cIter("r1", 2)},
       |${cIter("r2", 3)}
       |SELECT CASE WHEN node % 2 = 0 THEN 'part' ELSE 'supplier' END AS kind,
       |  node // 2 AS orig_id, r AS rank_q
       |FROM r3
       |ORDER BY rank_q DESC, kind ASC, orig_id ASC
       |LIMIT 10""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q_triangles — triangle counting (the standard graph-motif
  // benchmark) over the embedding near-dup graph: edges are
  // (label, lsh-bucket)-blocked pairs above a cosine threshold — the
  // same compound blocking q_embed_neardup ships, so candidate pairs
  // stay bounded at any collection size — and triangles are counted by
  // the ordered two-join form: for a < b < c, edges (a,b)⋈(b,c)⋈(a,c).
  // Ordering every edge (a < b) makes each triangle count EXACTLY once
  // with no post-dedup; both joins key on node ids (shuffle-local).
  // Emits per-label edge/triangle counts.
  //
  // Parameters are calibrated against the synthetic embeddings (max
  // within-label cosine ≈ 0.45): 3-bit × 2-table blocking at
  // cosine > 0.2 yields 232 edges / 6 triangles at sf0.001 and
  // 3846 / 493 at sf0.1 — a non-trivial motif workload at every SF.
  // ---------------------------------------------------------------------
  private val triBits = 3
  private val triTables = 2
  private val triPlaneBase = 100 // same plane family as q_embed_neardup
  private val triDim = 64
  private val triCos = 0.2

  val triangles: Q = (s, d) => {
    val e0 = Tables.embeddings(s, d)
      .withColumn("nrm", sqrt(fdot(col("embedding"), col("embedding"))))
    val e = (0 until triTables).foldLeft(e0) { (df, t) =>
      df.withColumn(
        s"bkt_$t",
        lshBucket(col("embedding"), triBits, triDim, triPlaneBase + t * triBits))
    }
    val edges = (0 until triTables)
      .map { t =>
        val a = e.select(
          col("label"),
          col(s"bkt_$t").as("bkt"),
          col("vec_id").as("ia"),
          col("embedding").as("va"),
          col("nrm").as("na"))
        val b = e.select(
          col("label"),
          col(s"bkt_$t").as("bkt"),
          col("vec_id").as("ib"),
          col("embedding").as("vb"),
          col("nrm").as("nb"))
        a.join(b, Seq("label", "bkt"))
          .filter(col("ia") < col("ib") &&
            fdot(col("va"), col("vb")) / (col("na") * col("nb")) > triCos)
          .select(col("label"), col("ia"), col("ib"))
      }
      .reduce(_ unionAll _)
      .distinct()
      .localCheckpoint() // referenced three times by the motif join
    val tri = edges.as("xy")
      .join(
        edges.as("yz"),
        col("xy.label") === col("yz.label") && col("xy.ib") === col("yz.ia"))
      .join(
        edges.as("xz"),
        col("yz.label") === col("xz.label") &&
          col("xy.ia") === col("xz.ia") && col("yz.ib") === col("xz.ib"))
      .groupBy(col("xy.label").as("label"))
      .agg(count(lit(1)).as("n_triangles"))
    edges
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_edges"))
      .join(tri, Seq("label"), "left")
      .select(
        col("label"),
        col("n_edges"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
      .orderBy(col("label"))
  }

  val trianglesSql: String = {
    val bktCols = (0 until triTables)
      .map(t =>
        s"${sqlLshBucket("embedding", triBits, triPlaneBase + t * triBits)} AS bkt_$t")
      .mkString(", ")
    val branches = (0 until triTables)
      .map(t =>
        s"""SELECT a.label, a.vec_id AS ia, c.vec_id AS ib
           |FROM b a JOIN b c
           |  ON a.label = c.label AND a.bkt_$t = c.bkt_$t AND a.vec_id < c.vec_id
           |WHERE ${sqlCosine("a.embedding", "c.embedding")} > ${triCos}e0""".stripMargin)
      .mkString("\n  UNION\n  ")
    s"""WITH b AS (SELECT label, vec_id, embedding, $bktCols FROM embeddings),
       |edges AS (
       |  $branches),
       |tri AS (
       |  SELECT xy.label, count(*) AS n_triangles
       |  FROM edges xy
       |  JOIN edges yz ON xy.label = yz.label AND xy.ib = yz.ia
       |  JOIN edges xz ON yz.label = xz.label AND xy.ia = xz.ia AND yz.ib = xz.ib
       |  GROUP BY xy.label)
       |SELECT e.label, count(*) AS n_edges,
       |  COALESCE(max(tri.n_triangles), 0) AS n_triangles
       |FROM edges e LEFT JOIN tri ON e.label = tri.label
       |GROUP BY e.label ORDER BY e.label""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q_label_prop — COMMUNITY DETECTION via deterministic synchronous
  // label propagation over the co-purchase graph (parts sharing ≥ 2
  // orders). Classic LPA is nondeterministic (random tie-breaks,
  // async order); this is the gateable variant: SYNCHRONOUS rounds, a
  // FIXED round budget (4), and total tie order (neighbor-label count
  // desc, then smallest label) — both engines run the identical
  // recurrence, so the final community assignment hash-compares
  // exactly. Unlike connected components (one community per connected
  // blob), LPA splits dense regions along their internal structure —
  // the catalog-clustering / fraud-ring shape CC cannot express.
  //
  // Scale: edge build is the q_copurchase basket collapse (one
  // lineitem shuffle + partition-local pair explosion, pairs kept only
  // with support ≥ 2); each round is ONE shuffle join (edges × labels
  // on src) + one (dst, label) count aggregate + a per-dst top-1
  // window — the hash-min CC round shape with argmax instead of min.
  // Labels localCheckpoint per round (bounded lineage, the dup-cluster
  // discipline); round count is fixed, so no driver convergence probe
  // is even needed.
  // ---------------------------------------------------------------------
  private val lpaRounds = 4
  private val lpaMinSupport = 2

  /** Undirected co-purchase edges (support ≥ [[lpaMinSupport]]), both
    * directions, checkpointed — the shared graph of the LPA and BFS
    * gates. Basket collapse: one lineitem shuffle + partition-local
    * pair explosion bounded by basket-choose-2.
    */
  private def copurchaseEdges(s: SparkSession, d: String): DataFrame = {
    val li = Tables
      .lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey"))
      .distinct()
    val baskets = li
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
    val pairCol = transform(
      col("ps"),
      (x, i) =>
        transform(
          slice(col("ps"), i + lit(2), size(col("ps"))),
          y => struct(x.as("p1"), y.as("p2"))))
    val pe = baskets
      .select(explode(flatten(pairCol)).as("pr"))
      .groupBy(col("pr.p1").as("p1"), col("pr.p2").as("p2"))
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= lpaMinSupport)
    pe.select(col("p1").as("src"), col("p2").as("dst"))
      .unionAll(pe.select(col("p2").as("src"), col("p1").as("dst")))
      .localCheckpoint() // read once per round — stop re-deriving pairs
  }

  val labelProp: Q = (s, d) => labelPropCore(copurchaseEdges(s, d))

  /** The LPA loop on an arbitrary bidirectional edge frame (src, dst) —
    * split out so PropertySpec can drive it over adversarially skewed
    * fixtures the lineitem-derived gate graph can't produce.
    */
  private[graft] def labelPropCore(ed: DataFrame): DataFrame = {
    var labels = ed
      .select(col("src").as("v"))
      .distinct()
      .withColumn("l", col("v"))
      .localCheckpoint(true)
    val wTop = Window
      .partitionBy(col("dst"))
      .orderBy(col("cnt").desc, col("nl").asc)
    for (_ <- 1 to lpaRounds) {
      val newl = ed
        .join(labels.select(col("v").as("src"), col("l").as("nl")), Seq("src"))
        .groupBy(col("dst"), col("nl"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(wTop))
        .filter(col("rn") === 1)
        .select(col("dst").as("v"), col("nl"))
      labels = labels
        .join(newl, Seq("v"), "left")
        .select(col("v"), coalesce(col("nl"), col("l")).as("l"))
        .localCheckpoint(true)
    }
    labels
      .groupBy(col("l").as("community"))
      .agg(count(lit(1)).as("n_parts"))
      .orderBy(col("n_parts").desc, col("community").asc)
      .limit(20)
  }

  val labelPropSql: String = {
    val roundTpl = (r: Int, p: Int) =>
      s"""l$r AS (
         |  SELECT n.v, coalesce(w.nl, n.l) AS l FROM l$p n
         |  LEFT JOIN (
         |    SELECT dst, nl FROM (
         |      SELECT e.dst, x.l AS nl,
         |        row_number() OVER (PARTITION BY e.dst
         |          ORDER BY count(*) DESC, x.l ASC) AS rn
         |      FROM ed e JOIN l$p x ON e.src = x.v
         |      GROUP BY e.dst, x.l) t WHERE rn = 1) w ON n.v = w.dst)"""
        .stripMargin
    val rounds =
      (1 to lpaRounds).map(r => roundTpl(r, r - 1)).mkString(",\n")
    s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |pe AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2
       |       FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
       |        AND a.l_partkey < b.l_partkey
       |       GROUP BY 1, 2 HAVING count(*) >= $lpaMinSupport),
       |ed AS (SELECT p1 AS src, p2 AS dst FROM pe
       |       UNION ALL SELECT p2, p1 FROM pe),
       |l0 AS (SELECT DISTINCT src AS v, src AS l FROM ed),
       |$rounds
       |SELECT l AS community, count(*) AS n_parts FROM l$lpaRounds
       |GROUP BY l ORDER BY n_parts DESC, community LIMIT 20""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q_bfs_dist — MULTI-SOURCE BFS DISTANCES over the co-purchase graph:
  // hop distance from the seed set (parts with id ≤ 100) to every
  // reachable part within 6 rounds, emitted as a distance histogram.
  // The distance dual of hash-min CC: each round relaxes
  // dist(v) = min(dist(v), min over in-neighbors dist(u) + 1) — one
  // shuffle join + one min-aggregate per round, frontier-monotone
  // (distances only decrease), and a FIXED round budget makes the
  // result deterministic on both engines without a convergence probe.
  // The reachable-set histogram is the "blast radius" query every
  // recall/contamination analysis runs (how much of the catalog is
  // within k hops of a flagged item?).
  // ---------------------------------------------------------------------
  private val bfsRounds = 6
  private val bfsSeedMax = 100L

  val bfsDist: Q = (s, d) => bfsDistCore(copurchaseEdges(s, d), bfsSeedMax)

  /** The BFS relaxation loop on an arbitrary bidirectional edge frame —
    * see [[labelPropCore]].
    */
  private[graft] def bfsDistCore(ed: DataFrame, seedMax: Long): DataFrame = {
    var dist = ed
      .select(col("src").as("v"))
      .distinct()
      .filter(col("v") <= seedMax)
      .withColumn("dist", lit(0L))
      .localCheckpoint(true)
    for (_ <- 1 to bfsRounds) {
      dist = dist
        .unionAll(
          ed.join(dist.select(col("v").as("src"), col("dist")), Seq("src"))
            .select(col("dst").as("v"), (col("dist") + 1L).as("dist")))
        .groupBy(col("v"))
        .agg(min(col("dist")).as("dist"))
        .localCheckpoint(true)
    }
    dist
      .groupBy(col("dist"))
      .agg(count(lit(1)).as("n_parts"))
      .orderBy(col("dist"))
  }

  val bfsDistSql: String = {
    val roundTpl = (r: Int, p: Int) =>
      s"""d$r AS (
         |  SELECT v, min(dist) AS dist FROM (
         |    SELECT v, dist FROM d$p
         |    UNION ALL
         |    SELECT e.dst AS v, x.dist + 1 AS dist
         |    FROM ed e JOIN d$p x ON e.src = x.v) t
         |  GROUP BY v)""".stripMargin
    val rounds =
      (1 to bfsRounds).map(r => roundTpl(r, r - 1)).mkString(",\n")
    s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |pe AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2
       |       FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
       |        AND a.l_partkey < b.l_partkey
       |       GROUP BY 1, 2 HAVING count(*) >= $lpaMinSupport),
       |ed AS (SELECT p1 AS src, p2 AS dst FROM pe
       |       UNION ALL SELECT p2, p1 FROM pe),
       |d0 AS (SELECT DISTINCT src AS v, CAST(0 AS BIGINT) AS dist
       |       FROM ed WHERE src <= $bfsSeedMax),
       |$rounds
       |SELECT dist, count(*) AS n_parts FROM d$bfsRounds
       |GROUP BY dist ORDER BY dist""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q_pagerank_pers — PERSONALIZED PageRank: teleport mass restricted
  // to a seed set (parts with id ≤ 50) instead of uniform — "importance
  // FROM these items' point of view", the related-items / trust-rank
  // primitive recommenders run. Same quantized-integer arithmetic,
  // damping 17/20, and dst-partitioned checkpointed edges as
  // q_pagerank; the deltas: rank starts concentrated on the seeds, the
  // per-round base term lands ONLY on seeds, and nodes drop to exact 0
  // (absent) when unreached — the rank frame stays frontier-sized
  // until the graph is covered. Contributions and the seed base ride
  // ONE union + ONE sum aggregate per round.
  // ---------------------------------------------------------------------
  private val pprSeedMax = 50L

  val pageRankPersonalized: Q = (s, d) => {
    val pairs = Tables
      .lineitem(s, d)
      .select(col("l_partkey"), col("l_suppkey"))
      .distinct()
    val fwd = pairs.select(
      (col("l_partkey") * 2).as("src"),
      (col("l_suppkey") * 2 + 1).as("dst"))
    val edges = fwd
      .unionAll(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(col("dst"))
      .localCheckpoint()
    val deg = edges
      .groupBy(col("src"))
      .agg(count(lit(1)).as("deg"))
      .select(col("src").as("node"), col("deg"))
      .localCheckpoint()
    val seeds = deg
      .filter(col("node") % 2 === 0 && col("node") <= 2 * pprSeedMax)
      .select(col("node"))
      .localCheckpoint()
    val nSeeds = seeds.count() // driver-held model scalar
    val sBase = (3L * prQ) / (20L * nSeeds)
    var r = seeds.withColumn("r", lit(prQ / nSeeds))
    for (_ <- 1 to prIters) {
      val model = r.join(deg, Seq("node")) // frontier-sized: broadcastable
      r = edges
        .join(broadcast(model), col("src") === col("node"))
        .select(col("dst").as("n2"), expr("(17 * (r div deg)) div 20").as("p"))
        .unionAll(seeds.select(col("node").as("n2"), lit(sBase).as("p")))
        .groupBy(col("n2"))
        .agg(sum(col("p")).as("r"))
        .select(col("n2").as("node"), col("r"))
        .localCheckpoint()
    }
    r.select(
        when(col("node") % 2 === 0, lit("part")).otherwise(lit("supplier"))
          .as("kind"),
        expr("node div 2").as("orig_id"),
        col("r").as("rank_q"))
      .orderBy(col("rank_q").desc, col("kind").asc, col("orig_id").asc)
      .limit(10)
  }

  val pageRankPersonalizedSql: String = {
    def rIter(prev: String, i: Int): String =
      s"""r$i AS (
         |  SELECT n2 AS node, CAST(SUM(p) AS BIGINT) AS r FROM (
         |    SELECT e.dst AS n2, (17 * (r.r // d.deg)) // 20 AS p
         |    FROM edges e JOIN $prev r ON e.src = r.node
         |    JOIN deg d ON e.src = d.src
         |    UNION ALL
         |    SELECT node AS n2, (3 * $prQ) // (20 * ns.n) AS p
         |    FROM seeds, ns) t
         |  GROUP BY n2)""".stripMargin
    s"""WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
       |edges AS (
       |  SELECT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst FROM pairs
       |  UNION ALL
       |  SELECT l_suppkey * 2 + 1 AS src, l_partkey * 2 AS dst FROM pairs),
       |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
       |seeds AS (SELECT src AS node FROM deg
       |          WHERE src % 2 = 0 AND src <= ${2 * pprSeedMax}),
       |ns AS (SELECT count(*) AS n FROM seeds),
       |r0 AS (SELECT node, $prQ // ns.n AS r FROM seeds, ns),
       |${rIter("r0", 1)},
       |${rIter("r1", 2)},
       |${rIter("r2", 3)}
       |SELECT CASE WHEN node % 2 = 0 THEN 'part' ELSE 'supplier' END AS kind,
       |  node // 2 AS orig_id, r AS rank_q
       |FROM r3
       |ORDER BY rank_q DESC, kind ASC, orig_id ASC
       |LIMIT 10""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "q_pagerank_pers" -> pageRankPersonalized,
    "q_bfs_dist" -> bfsDist,
    "q_label_prop" -> labelProp,
    "q_dup_clusters" -> dupClusters,
    "q_dup_clusters_star" -> dupClustersStar,
    "q_dup_clusters_incr" -> dupClustersIncr,
    "q_pagerank" -> pageRank,
    "q_pagerank_shuffle" -> pageRankShuffle,
    "q_pagerank_auto" -> pageRankAuto,
    "q_triangles" -> triangles
  )

  val oracleSql: Map[String, String] = Map(
    "q_pagerank_pers" -> pageRankPersonalizedSql,
    "q_bfs_dist" -> bfsDistSql,
    "q_label_prop" -> labelPropSql,
    "q_dup_clusters" -> dupClustersSql,
    // star CC must produce the hash-identical clustering
    "q_dup_clusters_star" -> dupClustersSql,
    // the incremental merge must converge to the full recompute, bit-for-bit
    "q_dup_clusters_incr" -> dupClustersSql,
    "q_pagerank" -> pageRankSql,
    "q_pagerank_shuffle" -> pageRankSql,
    // the auto regime must land on the identical ranking either way
    "q_pagerank_auto" -> pageRankSql,
    "q_triangles" -> trianglesSql
  )
}
