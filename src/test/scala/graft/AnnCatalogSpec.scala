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

  test("ann_search rejects non-index tables and oversized panels") {
    val cat = freshCat("guard")
    spark.sql(s"CALL $cat.sys.create_ann('a.vix', 'a.vecs', 'vec_id', 'embedding')")
    makePanel(cat, Seq(1L, 2L, 3L))
    val e1 = intercept[Exception] {
      spark.sql(s"CALL $cat.sys.ann_search('a.vecs', 'a.panel', 3, 2)")
        .collect()
    }
    assert(e1.getMessage.contains("not an ANN index"))
    spark.conf.set("spark.graft.annMaxQueryPanel", "2")
    try {
      val e2 = intercept[Exception] {
        spark.sql(s"CALL $cat.sys.ann_search('a.vix', 'a.panel', 3, 2)")
          .collect()
      }
      assert(e2.getMessage.contains("cap is 2"))
    } finally spark.conf.unset("spark.graft.annMaxQueryPanel")
  }
}
