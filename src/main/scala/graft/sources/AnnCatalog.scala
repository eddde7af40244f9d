package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Hashing.fdot
import graft.ops.Embeddings
import graft.streaming.MergeSink

/** The maintained ANN index as a CATALOG CITIZEN — the pure-SQL surface
  * over [[Embeddings.annIndexRefresh]]:
  *
  *  - `CALL cat.sys.create_ann('db.ix', 'db.vecs', 'vec_id',
  *    'embedding')` trains the coarse quantizer on the source's CURRENT
  *    state (2 Lloyd iterations from the deterministic stride seed),
  *    FREEZES it as a parquet sidecar under the index table (re-training
  *    is a rebuild, not a refresh — the standard IVF maintenance
  *    discipline), creates the postings table with the source binding
  *    persisted as `graft.ann.*` table properties, and runs the first
  *    (full) build.
  *  - `CALL cat.sys.refresh_ann('db.ix')` advances the postings to the
  *    source's head through the change feed: O(changed keys ×
  *    centroids), never a corpus re-index; free when already at head.
  *  - `CALL cat.sys.ann_search('db.ix', 'db.queries', k, probes)`
  *    answers cosine top-k per query-panel row via multi-probe IVF
  *    against the SERVED postings — the one query the index exists for,
  *    now issuable by a consumer who only speaks SQL.
  *
  * Scale shape of `search`: the query panel × the O(centroidCap)
  * broadcast centroid frame picks probe cells (bounded cross — never
  * panel × corpus); candidates arrive by EQUI-join on `cell`, so
  * candidate work is linear in the probed cells' sizes. The returned
  * relation is the ANSWER itself — k rows per panel query — and the
  * panel is capped (`spark.graft.annMaxQueryPanel`, default 10k), so
  * the procedure's result materialization is bounded by the response
  * size, not by any table.
  *
  * The analytic dual of the reference's derived-ref pattern (a ref
  * holding an index of others, advanced inside the same transaction —
  * /root/reference/src/opusdb/core/stm.clj:42 apply-writes! keeps every
  * derived structure at the committed head).
  */
object AnnCatalog {

  private val PSrc = "graft.ann.source"
  private val PKey = "graft.ann.key"
  private val PVec = "graft.ann.vec"

  /** The frozen-quantizer sidecar: O(centroidCap × dim) parquet inside
    * the index table's directory. Not data, not a commit artifact —
    * retention GC and VACUUM both key on marker/manifest/data-file
    * patterns and never touch it.
    */
  private def sidecar(ixPath: String): String = ixPath + "/_ann_centroids"

  private def centroids(spark: SparkSession, ixPath: String): DataFrame =
    spark.read.parquet(sidecar(ixPath))
      .select(col("cent_id"), col("cv"), col("cnrm2"))

  private def annOpts(
      cat: GraftCatalog,
      ixIdent: String): Map[String, String] = {
    val o = cat.tableOptions(MaterializedViews.identOf(ixIdent))
    require(o.contains(PSrc),
      s"'$ixIdent' is not an ANN index (no $PSrc property — " +
        "create it with CALL cat.sys.create_ann)")
    o
  }

  /** Create + first full build. Returns postings rows written. */
  def create(
      spark: SparkSession,
      cat: GraftCatalog,
      ixIdent: String,
      srcIdent: String,
      keyCol: String,
      vecCol: String): Long = {
    val srcOpts = cat.tableOptions(MaterializedViews.identOf(srcIdent))
    val srcSchema = DataType.fromJson(srcOpts("schema"))
      .asInstanceOf[StructType]
    def srcField(c: String): StructField = srcSchema.fields
      .find(_.name == c)
      .getOrElse(throw new IllegalArgumentException(
        s"create_ann: column '$c' not in source schema " +
          srcSchema.fieldNames.mkString("(", ",", ")")))
    val keyType = srcField(keyCol).dataType
    val vecType = srcField(vecCol).dataType
    require(vecType == ArrayType(FloatType, containsNull = true) ||
      vecType == ArrayType(FloatType, containsNull = false),
      s"create_ann: '$vecCol' must be ARRAY<FLOAT>, got ${vecType.sql}")
    // postings schema is engine-owned: (vec_id, cell, embedding, nrm)
    // keyed by vec_id — the source's naming maps at refresh time
    val schema = StructType(Seq(
      StructField("vec_id", keyType),
      StructField("cell", LongType),
      StructField("embedding", vecType),
      StructField("nrm", DoubleType),
      StructField("__rv", LongType)))
    val P = org.apache.spark.sql.connector.catalog.TableCatalog.OPTION_PREFIX
    val props = new java.util.HashMap[String, String]()
    props.put("key", "vec_id")
    props.put("seq", "__rv")
    props.put(P + PSrc, srcIdent)
    props.put(P + PKey, keyCol)
    props.put(P + PVec, vecCol)
    cat.createTable(MaterializedViews.identOf(ixIdent), schema,
      Array.empty[org.apache.spark.sql.connector.expressions.Transform],
      props)
    val ixPath = cat.tableOptions(MaterializedViews.identOf(ixIdent))("path")
    val st = MergeSink.currentState(spark, srcOpts("path"))
      .getOrElse(throw new IllegalArgumentException(
        s"create_ann: source '$srcIdent' is empty — nothing to train on"))
    val ck2 = Embeddings.annTrain(
      spark, st.select(col(keyCol).as("vec_id"), col(vecCol).as("embedding")))
    // one tiny file, written once: the model is frozen at create time
    ck2.coalesce(1).write.mode("overwrite").parquet(sidecar(ixPath))
    refresh(spark, cat, ixIdent)
  }

  /** Advance the postings to the source's head (0 = already current). */
  def refresh(
      spark: SparkSession,
      cat: GraftCatalog,
      ixIdent: String): Long = {
    val ixOpts = annOpts(cat, ixIdent)
    val srcOpts = cat.tableOptions(MaterializedViews.identOf(ixOpts(PSrc)))
    Embeddings.annIndexRefresh(
      spark,
      srcDir = srcOpts("path"),
      srcKey = ixOpts(PKey),
      ixDir = ixOpts("path"),
      ck2 = centroids(spark, ixOpts("path")),
      vecCol = ixOpts(PVec))
  }

  /** Cosine top-k per query-panel row, multi-probe IVF over the served
    * postings. The panel table exposes the SAME key/vector columns as
    * the index's source. Self-matches (panel key == posting key) are
    * excluded. Returns (query_id, rank, neighbor_id, cos).
    */
  def search(
      spark: SparkSession,
      cat: GraftCatalog,
      ixIdent: String,
      queriesIdent: String,
      k: Int,
      probes: Int): DataFrame = {
    require(k >= 1, s"ann_search: k must be >= 1, got $k")
    require(probes >= 1, s"ann_search: probes must be >= 1, got $probes")
    val ixOpts = annOpts(cat, ixIdent)
    val keyCol = ixOpts(PKey)
    val vecCol = ixOpts(PVec)
    val qOpts = cat.tableOptions(MaterializedViews.identOf(queriesIdent))
    val panel = MergeSink.currentState(spark, qOpts("path"))
      .getOrElse(throw new IllegalArgumentException(
        s"ann_search: query table '$queriesIdent' is empty"))
      .select(col(keyCol).as("query_id"), col(vecCol).as("qv"))
      .localCheckpoint() // probed once, ranked once — read it once
    // the procedure materializes k rows per panel query: cap the panel
    // so the response stays response-sized at any corpus scale
    val maxPanel = spark.conf.getOption("spark.graft.annMaxQueryPanel")
      .map(_.toInt).getOrElse(10000)
    val qn = panel.count()
    require(qn <= maxPanel,
      s"ann_search: query panel has $qn rows, cap is $maxPanel " +
        "(spark.graft.annMaxQueryPanel) — batch the panel instead")
    val probe = Embeddings.annProbe(panel, centroids(spark, ixOpts("path")),
      probes)
    val served = spark.read.format("graft-merge")
      .option("path", ixOpts("path"))
      .option("key", "vec_id").option("seq", "__rv")
      .load()
    val wRank = Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    served
      .join(broadcast(probe), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (fdot(col("qv"), col("embedding")) / (col("qnrm") * col("nrm")))
          .as("cos"))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
      .orderBy(col("query_id"), col("rank"))
  }
}
