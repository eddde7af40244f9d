package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashing.fdot

/** The catalog ANN surface ([[graft.sources.AnnCatalog]]): create_ann
  * trains + freezes the quantizer and builds the postings; refresh_ann
  * folds exactly the changed keys via the change feed; ann_search
  * answers cosine top-k through SQL. Correctness yardstick: with every
  * cell probed, multi-probe IVF degenerates to exact search — the
  * result must equal the brute-force cosine top-k. Also pins the
  * DSv2 write path for ARRAY<primitive> columns (SQL INSERT / UPDATE /
  * CTAS on a vector table), which the ANN surface rides.
  */
class AnnCatalogSpec extends SparkSpec {

  private val nVec = 400

  /** Deterministic synthetic vectors: ids 0..n-1, dim 4, last component
    * 1 so every norm is positive; ids ≡ 0 (mod 61) exist → the stride
    * seed picks centroids.
    */
  private def vecs(n: Int): DataFrame = {
    val s = spark
    import s.implicits._
    (0L until n.toLong)
      .map(i => (i, Array((i % 7).toFloat, (i * 3 % 5).toFloat,
        (i * 5 % 11).toFloat, 1.0f)))
      .toDF("vec_id", "embedding")
  }

  private def freshCat(tag: String): String = {
    val cat = s"annspec_$tag"
    val wh = Files.createTempDirectory(s"graft_annspec_$tag").toString
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE $cat.a")
    spark.sql(
      s"""CREATE TABLE $cat.a.vecs
         |(vec_id BIGINT, embedding ARRAY<FLOAT>, rv BIGINT)
         |USING `graft-merge` OPTIONS (key 'vec_id', seq 'rv')
         |""".stripMargin)
    spark.sql(s"CALL $cat.sys.set_history_keep('a.vecs', 8)")
    vecs(nVec).createOrReplaceTempView(s"annspec_src_$tag")
    spark.sql(s"""INSERT INTO $cat.a.vecs
                 |SELECT vec_id, embedding, 1 AS rv
                 |FROM annspec_src_$tag""".stripMargin)
    cat
  }

  private def makePanel(cat: String, ids: Seq[Long]): Unit =
    spark.sql(
      s"""CREATE TABLE $cat.a.panel
         |USING `graft-merge` OPTIONS (key 'vec_id', seq 'rv')
         |AS SELECT vec_id, embedding, CAST(1 AS BIGINT) AS rv
         |FROM $cat.a.vecs WHERE vec_id IN (${ids.mkString(",")})
         |""".stripMargin)

  /** Brute-force cosine top-k per panel id over the CURRENT table state
    * — the exact answer ann_search must reproduce when every cell is
    * probed. Same tie-break: cos desc, neighbor asc.
    */
  private def bruteTopK(cat: String, ids: Seq[Long], k: Int)
      : Seq[(Long, Long, Long)] = {
    val st = spark.table(s"$cat.a.vecs")
      .select(col("vec_id"), col("embedding"),
        sqrt(fdot(col("embedding"), col("embedding"))).as("nrm"))
    val q = st.filter(col("vec_id").isin(ids: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("nrm").as("qnrm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    st.join(broadcast(q), lit(true))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (fdot(col("qv"), col("embedding")) / (col("qnrm") * col("nrm")))
          .as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(1)))
      .toSeq // (query, rank, neighbor)
  }

  test("create_ann + ann_search with all cells probed == brute force") {
    val cat = freshCat("exact")
    val built = spark
      .sql(s"CALL $cat.sys.create_ann('a.vix', 'a.vecs', 'vec_id', 'embedding')")
      .head().getInt(0)
    assert(built == nVec, s"full build must post every vector: $built")
    val panelIds = Seq(3L, 100L, 255L)
    makePanel(cat, panelIds)
    // probes >> n_cells (7 stride seeds) => every cell probed => exact
    val got = spark
      .sql(s"CALL $cat.sys.ann_search('a.vix', 'a.panel', 4, 99)")
      .orderBy(col("query_id"), col("rank"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    assert(got == bruteTopK(cat, panelIds, 4))
  }

  test("probes-limited ann_search plans strictly fewer postings files than the manifest total") {
    val cat = freshCat("prune")
    spark.sql(
      s"CALL $cat.sys.create_ann('a.vix', 'a.vecs', 'vec_id', 'embedding')")
    makePanel(cat, Seq(42L))
    // probes=1 → one probed cell of the 7 the stride seed mints; the
    // static cell IN (...) pushed into the served scan must drop every
    // other identity(cell) partition at the MANIFEST level — the scan
    // plans a strict subset of the postings files (the postings scan
    // is the LAST graft scan the search plans: panel + probe read
    // checkpointed blocks)
    graft.sources.GraftMergeScan.lastPrune.set(null)
    val rows = spark
      .sql(s"CALL $cat.sys.ann_search('a.vix', 'a.panel', 3, 1)")
      .collect()
    assert(rows.nonEmpty, "probes=1 search returned nothing")
    val prune = graft.sources.GraftMergeScan.lastPrune.get()
    assert(prune != null, "postings scan never planned")
    val (planned, total, _) = prune
    assert(planned < total,
      s"probe cells did not prune postings files: planned $planned of $total")
  }

  test("create_ann ivfpq: frozen codebook sidecar; search re-ranks the ADC shortlist exactly") {
    val cat = freshCat("pq")
    // PQ quantizes pqM x pqDsub subspaces: the index's vectors must be
    // full-width (64) — replace the dim-4 fixture table's contents
    val s2 = spark
    import s2.implicits._
    (0L until nVec.toLong)
      .map(i => (i, Array.tabulate(64)(k =>
        (((i + 1) * (k + 3) % 17).toFloat) + (if (k == 63) 1.0f else 0.0f)),
        2L))
      .toDF("vec_id", "embedding", "rv")
      .createOrReplaceTempView("annspec_pq_vecs")
    spark.sql(s"INSERT INTO $cat.a.vecs SELECT * FROM annspec_pq_vecs")
    spark.sql(
      s"CALL $cat.sys.create_ann('a.pix', 'a.vecs', 'vec_id', " +
        "'embedding', 'ivfpq')")
    val props = spark.sql(s"SHOW TBLPROPERTIES $cat.a.pix")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("graft.ann.mode") == "ivfpq")
    // the codebook persisted beside the centroids
    val ixPath = props("path").stripPrefix("file:")
    assert(new java.io.File(s"$ixPath/_ann_pq_codebook").exists())
    val panelIds = Seq(7L, 123L, 250L)
    makePanel(cat, panelIds)
    val got = spark
      .sql(s"CALL $cat.sys.ann_search('a.pix', 'a.panel', 3, 99)")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // shape: exactly k ranked rows per query, ranks 1..3
    assert(got.groupBy(_._1).forall { case (_, rs) =>
      rs.map(_._2).sorted.toSeq == Seq(1L, 2L, 3L)
    })
    // the re-rank is EXACT: every returned cosine equals the true
    // cosine of that (query, neighbor) pair
    val st = spark.table(s"$cat.a.vecs")
      .select(col("vec_id"), col("embedding"),
        sqrt(fdot(col("embedding"), col("embedding"))).as("nrm"))
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Float](1).toArray, r.getDouble(2))).toMap
    got.foreach { case (q, _, nb, cos) =>
      val (qv, qn) = st(q); val (nv, nn) = st(nb)
      val dot = qv.zip(nv).map { case (a, b) => a.toDouble * b.toDouble }
        .foldLeft(0.0)(_ + _)
      assert(math.abs(cos - dot / (qn * nn)) == 0.0,
        s"re-ranked cosine must be exact for ($q, $nb)")
    }
    // an unknown mode fails loudly, leaving no table behind
    val e = intercept[Exception] {
      spark.sql(s"CALL $cat.sys.create_ann('a.bad', 'a.vecs', 'vec_id', " +
        "'embedding', 'blah')").collect()
    }
    assert(e.getMessage.contains("unknown mode"))
    assert(!spark.catalog.tableExists(s"$cat.a.bad"))
  }

  test("refresh_ann folds exactly the changed keys and is free at head") {
    val cat = freshCat("incr")
    spark.sql(s"CALL $cat.sys.create_ann('a.vix', 'a.vecs', 'vec_id', 'embedding')")
    // day 2: one delete, three re-embeds (UPDATE on the ARRAY column
    // through the row-level delta writer), two inserts
    spark.sql(s"DELETE FROM $cat.a.vecs WHERE vec_id = 42")
    spark.sql(s"""UPDATE $cat.a.vecs
                 |SET embedding = transform(embedding, x -> -x)
                 |WHERE vec_id IN (7, 8, 9)""".stripMargin)
    spark.sql(s"""INSERT INTO $cat.a.vecs VALUES
                 |(${nVec}, array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT),
                 |  CAST(0.0 AS FLOAT), CAST(1.0 AS FLOAT)), 2),
                 |(${nVec + 1}, array(CAST(0.0 AS FLOAT), CAST(2.0 AS FLOAT),
                 |  CAST(0.0 AS FLOAT), CAST(1.0 AS FLOAT)), 2)
                 |""".stripMargin)
    val refreshed = spark.sql(s"CALL $cat.sys.refresh_ann('a.vix')")
      .head().getInt(0)
    assert(refreshed == 6, s"1 delete + 3 updates + 2 inserts: $refreshed")
    assert(spark.sql(s"CALL $cat.sys.refresh_ann('a.vix')")
      .head().getInt(0) == 0, "refresh at head must be free")
    // the postings converged: served keys == live source keys, and the
    // deleted key is gone
    val ix = spark.table(s"$cat.a.vix").select(col("vec_id"))
    assert(ix.count() == nVec + 1)
    assert(ix.filter(col("vec_id") === 42).isEmpty)
    // the re-embedded vectors' stored postings carry the NEW embedding
    val e7 = spark.table(s"$cat.a.vix").filter(col("vec_id") === 7)
      .select(col("embedding")).head().getSeq[Float](0)
    assert(e7.forall(_ <= 0f), s"update must reach the postings: $e7")
  }

  test("the frozen quantizer serves a brand-new catalog instance") {
    val cat = freshCat("persist")
    spark.sql(s"CALL $cat.sys.create_ann('a.vix', 'a.vecs', 'vec_id', 'embedding')")
    makePanel(cat, Seq(5L, 77L))
    val before = spark
      .sql(s"CALL $cat.sys.ann_search('a.vix', 'a.panel', 3, 99)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // a second catalog over the SAME warehouse: model comes from the
    // sidecar + table properties, not from any per-JVM registry
    val wh = spark.conf.get(s"spark.sql.catalog.$cat.warehouse")
    val cat2 = cat + "_re"
    spark.conf.set(s"spark.sql.catalog.$cat2",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat2.warehouse", wh)
    assert(spark.sql(s"CALL $cat2.sys.refresh_ann('a.vix')")
      .head().getInt(0) == 0, "re-instantiated catalog sees the head")
    val after = spark
      .sql(s"CALL $cat2.sys.ann_search('a.vix', 'a.panel', 3, 99)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(after == before)
  }

  test("ann_search rejects non-index tables; oversized panels batch") {
    val cat = freshCat("guard")
    spark.sql(s"CALL $cat.sys.create_ann('a.vix', 'a.vecs', 'vec_id', 'embedding')")
    makePanel(cat, Seq(1L, 2L, 3L))
    val e1 = intercept[Exception] {
      spark.sql(s"CALL $cat.sys.ann_search('a.vecs', 'a.panel', 3, 2)")
        .collect()
    }
    assert(e1.getMessage.contains("not an ANN index"))
    def answers(): Seq[(Long, Long, Long)] =
      spark.sql(s"CALL $cat.sys.ann_search('a.vix', 'a.panel', 3, 2)")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val whole = answers()
    // a panel LARGER than the cap answers in cap-sized batches — same
    // rows, never a throw (each query rides exactly one batch)
    spark.conf.set("spark.graft.annMaxQueryPanel", "2")
    try assert(answers() == whole,
      "a batched oversized panel must answer exactly like one pass")
    finally spark.conf.unset("spark.graft.annMaxQueryPanel")
  }

  test("ann_search serves a non-BIGINT (INT) key layout correctly") {
    val cat = freshCat("intkey")
    spark.sql(
      s"""CREATE TABLE $cat.a.ivecs (vec_id INT, embedding ARRAY<FLOAT>,
         |rv BIGINT) USING `graft-merge`
         |OPTIONS (key 'vec_id', seq 'rv')""".stripMargin)
    val s = spark
    import s.implicits._
    (0 until 64)
      .map(i => (i, Array.tabulate(4)(j =>
        math.cos(i * 0.37 + j).toFloat), 1L))
      .toDF("vec_id", "embedding", "rv")
      .createOrReplaceTempView("ivecs_src")
    spark.sql(s"INSERT INTO $cat.a.ivecs SELECT * FROM ivecs_src")
    spark.sql(
      s"CALL $cat.sys.create_ann('a.iix', 'a.ivecs', 'vec_id', 'embedding')")
    // the postings' cell column is BIGINT even for an INT key (the
    // assignment casts) — reading the index table through the catalog
    // must decode cleanly and the search must answer
    val cells = spark.sql(s"SELECT DISTINCT cell FROM $cat.a.iix")
      .collect().map(_.getLong(0))
    assert(cells.nonEmpty)
    spark.sql(
      s"""CREATE TABLE $cat.a.ipanel (vec_id INT, embedding ARRAY<FLOAT>,
         |rv BIGINT) USING `graft-merge`
         |OPTIONS (key 'vec_id', seq 'rv')""".stripMargin)
    spark.sql(
      s"INSERT INTO $cat.a.ipanel SELECT * FROM ivecs_src WHERE vec_id < 3")
    val hits = spark.sql(
      s"CALL $cat.sys.ann_search('a.iix', 'a.ipanel', 3, 99)")
      .collect()
    assert(hits.length == 9, s"3 queries x top-3, got ${hits.length}")
  }

  test("create_ann is failure-atomic: a failed CALL strands no table") {
    val cat = freshCat("atomic")
    spark.sql(
      s"""CREATE TABLE $cat.a.empty (vec_id BIGINT, embedding ARRAY<FLOAT>,
         |rv BIGINT) USING `graft-merge`
         |OPTIONS (key 'vec_id', seq 'rv')""".stripMargin)
    val e = intercept[Exception] {
      spark.sql(
        s"CALL $cat.sys.create_ann('a.eix', 'a.empty', 'vec_id', 'embedding')")
        .collect()
    }
    assert(e.getMessage.contains("empty"))
    // nothing stranded: the index name is free, and create over the
    // now-populated source succeeds on the SAME identifier
    spark.sql(
      s"""INSERT INTO $cat.a.empty
         |SELECT vec_id, embedding, rv FROM $cat.a.vecs""".stripMargin)
    spark.sql(
      s"CALL $cat.sys.create_ann('a.eix', 'a.empty', 'vec_id', 'embedding')")
    assert(spark.sql(s"SELECT count(*) FROM $cat.a.eix")
      .head().getLong(0) > 0)
  }

  test("DROP TABLE unregisters the index: later source commits stay clean") {
    val cat = freshCat("ghost")
    spark.sql(s"CALL $cat.sys.create_ann('a.gix', 'a.vecs', 'vec_id', 'embedding')")
    spark.sql(s"DROP TABLE $cat.a.gix")
    spark.conf.set("spark.graft.autoRefreshAnn", "true")
    try {
      // a ghost _dependents line would resurrect the dropped index dir
      // (or fail the commit outright) — the INSERT must just work
      spark.sql(
        s"""INSERT INTO $cat.a.vecs
           |SELECT vec_id + 5000, embedding, 2 AS rv FROM $cat.a.vecs
           |WHERE vec_id < 2""".stripMargin)
      assert(spark.sql(
        s"SELECT count(*) FROM $cat.a.vecs WHERE vec_id >= 5000")
        .head().getLong(0) == 2)
      // and the index name is reusable
      spark.sql(
        s"CALL $cat.sys.create_ann('a.gix', 'a.vecs', 'vec_id', 'embedding')")
      assert(spark.sql(s"SELECT count(*) FROM $cat.a.gix")
        .head().getLong(0) > 0)
    } finally spark.conf.unset("spark.graft.autoRefreshAnn")
  }

  test(".detail reports ann_source/ann_lag; autoRefreshAnn advances in-commit") {
    val cat = freshCat("lag")
    spark.sql(s"CALL $cat.sys.create_ann('a.lix', 'a.vecs', 'vec_id', 'embedding')")
    def detail(): (String, Long) = {
      val r = spark.table(s"$cat.a.lix.detail").head()
      (r.getAs[String]("ann_source"),
        r.getAs[java.lang.Long]("ann_lag_versions"): Long)
    }
    val (src0, lag0) = detail()
    assert(src0 != null && lag0 == 0L, s"fresh index must report lag 0, got $lag0")
    // a source commit WITHOUT refresh: lag becomes observable
    spark.sql(
      s"""INSERT INTO $cat.a.vecs
         |SELECT vec_id + 1000, embedding, 2 AS rv FROM $cat.a.vecs
         |WHERE vec_id < 3""".stripMargin)
    assert(detail()._2 == 1L, "a stale index must report its lag")
    spark.sql(s"CALL $cat.sys.refresh_ann('a.lix')")
    assert(detail()._2 == 0L)
    // autoRefreshAnn: the NEXT source commit advances the index inside
    // the commit — no CALL, lag stays 0 and the new key is served
    spark.conf.set("spark.graft.autoRefreshAnn", "true")
    try {
      spark.sql(
        s"""INSERT INTO $cat.a.vecs
           |SELECT vec_id + 2000, embedding, 3 AS rv FROM $cat.a.vecs
           |WHERE vec_id < 2""".stripMargin)
      assert(detail()._2 == 0L,
        "autoRefreshAnn must advance the index inside the source commit")
      assert(spark.sql(
        s"SELECT count(*) FROM $cat.a.lix WHERE vec_id >= 2000")
        .head().getLong(0) > 0,
        "the in-commit refresh must serve the new keys")
    } finally spark.conf.unset("spark.graft.autoRefreshAnn")
  }
}
