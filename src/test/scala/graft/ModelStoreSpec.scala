package graft

import org.apache.spark.sql.functions._

/** Persisted model artifacts — the build/serve split across restarts:
  * trained models (IVF centroids, PQ codebook, BPE merge list) written
  * as parquet must serve bit-identically when loaded, and serving must
  * actually READ the artifact (a tampered artifact changes the answer).
  */
class ModelStoreSpec extends SparkSpec {

  private def tempDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  test("ANN artifact roundtrip: loaded model serves bit-identically") {
    val path = tempDir("model_store_ann")
    ops.Embeddings.saveAnnModel(spark, sf, path)
    // the artifact is plain parquet with the documented shapes
    val cents = spark.read.parquet(s"$path/ivf_centroids")
    assert(cents.columns.sorted.sameElements(Array("cent_id", "cnrm2", "cv")))
    assert(cents.count() > 0)
    val cb = spark.read.parquet(s"$path/pq_codebook")
    assert(cb.columns.sorted.sameElements(Array("cq", "j", "sub")))
    assert(cb.select("sub").distinct().count() == 16)
    // RESTART SEMANTICS: serveAnnFrom touches neither the registry nor
    // any training job — it is what a fresh JVM runs. Its output must
    // equal the in-session-trained lane row for row.
    val loaded = ops.Embeddings.serveAnnFrom(spark, sf, path).collect()
    val trained = ops.Embeddings.similarityIvfPq(spark, sf).collect()
    assert(loaded.sameElements(trained),
      s"loaded-artifact serve diverged from trained lane " +
        s"(${loaded.length} vs ${trained.length} rows)")
  }

  test("ANN serving actually reads the artifact (tamper changes answers)") {
    val path = tempDir("model_store_tamper")
    ops.Embeddings.saveAnnModel(spark, sf, path)
    val baseline = ops.Embeddings.serveAnnFrom(spark, sf, path).collect()
    // drop half the centroids: probing and assignment must change
    val cents = spark.read.parquet(s"$path/ivf_centroids")
      .filter(col("cent_id") % 2 === 0)
      .collect()
    val schema = spark.read.parquet(s"$path/ivf_centroids").schema
    spark
      .createDataFrame(java.util.Arrays.asList(cents: _*), schema)
      .repartition(1)
      .write.mode("overwrite").parquet(s"$path/ivf_centroids")
    val tampered = ops.Embeddings.serveAnnFrom(spark, sf, path).collect()
    assert(!tampered.sameElements(baseline),
      "halving the stored centroids did not change served results — " +
        "serving is not reading the artifact")
  }

  test("BPE merge-list artifact roundtrip rebuilds the exact encoder") {
    val path = tempDir("model_store_bpe")
    ops.TextPipeline.saveBpeMerges(spark, sf, path)
    val merges = ops.TextPipeline.loadBpeMerges(spark, path)
    assert(merges.nonEmpty)
    assert(merges.distinct.length == merges.length, "duplicate merges")
    val (trainedVocab, trainedMerges, _) = ops.TextPipeline.bpeBatchTrain(spark, sf)
    // the stored list is the trained list, in training order
    assert(merges == trainedMerges.map(_._3),
      "persisted merge order diverged from training order")
    // replaying the LOADED list reproduces the trained reprs exactly
    val replayed = ops.TextPipeline
      .bpeVocabFrom(spark, sf, merges)
      .select("word", "repr")
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .toMap
    val trained = trainedVocab
      .select("word", "repr")
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .toMap
    assert(replayed == trained, "replayed encoder vocab != trained vocab")
  }
}
