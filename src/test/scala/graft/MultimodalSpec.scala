package graft

import graft.ops.Multimodal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Multimodal plumbing: schema, determinism, shuffle-freedom, and batch
  * shape — the contract a real codec would drop into.
  */
class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.mediaTable(spark, sf)

  test("media table: binary payload column + typed metadata schema") {
    val schema = media.toDF().schema
    assert(schema("payload").dataType == BinaryType)
    assert(
      Seq("doc_id", "kind", "width", "height", "sample_rate", "n_frames")
        .forall(schema.fieldNames.contains))
    // every document lands in exactly one modality
    assert(media.count() == Tables.documents(spark, sf).count())
  }

  test("binaryFile source ingests raw media files with content intact") {
    // how image/audio actually ENTERS a 100 TB pipeline: a directory of
    // opaque files read by the built-in binaryFile source into (path,
    // length, content) rows — the upstream of mediaTable's typed lane.
    // Round-trip: write payloads as loose files, ingest, join back by
    // doc_id parsed from the filename, byte-equality per row.
    val dir = java.nio.file.Files.createTempDirectory("graft_binfiles")
    val sample = media.toDF().select(col("doc_id"), col("payload")).limit(20)
    val rows = sample.collect()
    rows.foreach { r =>
      java.nio.file.Files.write(
        dir.resolve(s"doc_${r.getLong(0)}.bin"),
        r.getAs[Array[Byte]](1))
    }
    val ingested = spark.read
      .format("binaryFile")
      .load(dir.toString)
      .select(
        regexp_extract(col("path"), "doc_(\\d+)\\.bin", 1)
          .cast("long")
          .as("doc_id"),
        col("length"),
        col("content"))
    assert(ingested.count() == rows.length.toLong)
    val joined = ingested
      .join(sample.withColumnRenamed("payload", "expected"), Seq("doc_id"))
      .select(
        col("doc_id"),
        (col("length") === octet_length(col("expected")).cast("long") &&
          col("content") === col("expected")).as("ok"))
      .collect()
    assert(joined.length == rows.length)
    assert(joined.forall(_.getBoolean(1)), "byte mismatch after binaryFile ingest")
  }

  test("STREAMING binaryFile ingest survives kill/restart exactly-once through the MERGE sink") {
    // the streaming composition of the ingest above: files arrive in
    // two waves, the query is killed between them, and the restarted
    // query (same checkpoint) must pick up ONLY the new files — final
    // state holds every file exactly once, payload fingerprints intact
    val dir = java.nio.file.Files.createTempDirectory("graft_sbin_src")
    val table = java.nio.file.Files.createTempDirectory("graft_sbin_tbl").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sbin_ckpt").toString
    val rows = media.toDF().select(col("doc_id"), col("payload")).limit(40).collect()
    val (h1, h2) = rows.splitAt(rows.length / 2)
    def writeFiles(rs: Array[org.apache.spark.sql.Row]): Unit =
      rs.foreach { r =>
        java.nio.file.Files.write(
          dir.resolve(s"doc_${r.getLong(0)}.bin"),
          r.getAs[Array[Byte]](1))
      }
    writeFiles(h1)
    val schema = spark.read.format("binaryFile").load(dir.toString).schema
    def run(): Unit = {
      val q = graft.streaming.MergeSink
        .sink(
          spark.readStream
            .format("binaryFile")
            .schema(schema)
            .load(dir.toString)
            .select(
              regexp_extract(col("path"), "doc_(\\d+)\\.bin", 1)
                .cast("long")
                .as("doc_id"),
              col("length").cast("long").as("length"),
              crc32(col("content")).as("crc")),
          table,
          ckpt,
          key = "doc_id",
          seq = "length")
        .start()
      try q.processAllAvailable()
      finally q.stop() // the mid-ingest kill
    }
    run()
    assert(
      graft.streaming.MergeSink.currentState(spark, table).get.count() ==
        h1.length.toLong,
      "first wave not fully ingested")
    writeFiles(h2)
    run() // restart from the same checkpoint: only h2 may be processed
    val got = graft.streaming.MergeSink
      .currentState(spark, table)
      .get
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("length"), r.getAs[Long]("crc")))
      .toSet
    val want = rows.map { r =>
      val bytes = r.getAs[Array[Byte]](1)
      val c = new java.util.zip.CRC32
      c.update(bytes)
      (r.getLong(0), bytes.length.toLong, c.getValue)
    }.toSet
    assert(got == want, s"ingest state diverged (${got.size} vs ${want.size} files)")
  }

  test("image decode is deterministic and partition-local (no shuffle)") {
    val feats = Multimodal.decodeImage(media)
    val a = feats.collect().map(f => f.doc_id -> f).toMap
    val b = Multimodal.decodeImage(media).collect().map(f => f.doc_id -> f).toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (id, f) =>
      assert(f.mean_pixel == b(id).mean_pixel && f.max_pixel == b(id).max_pixel)
      assert(f.mean_pixel >= 0.0 && f.mean_pixel <= 255.0)
      assert(f.max_pixel >= 0 && f.max_pixel <= 255)
    }
    // narrow pipeline: no Exchange in the physical plan
    val plan = feats.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"decode plan shuffles:\n$plan")
  }

  test("resize pools to a fixed grid with in-range values") {
    val out = Multimodal.resize(media, 4).collect()
    assert(out.nonEmpty)
    out.foreach { case (_, grid) =>
      assert(grid.length == 16)
      assert(grid.forall(v => v >= 0.0 && v <= 255.0))
    }
  }

  test("audio features: fixed arity, non-negative energy") {
    val a = Multimodal.decodeAudio(media).collect()
    assert(a.nonEmpty)
    a.foreach { f =>
      assert(f.energy >= 0.0)
      assert(f.zero_crossings >= 0 && f.zero_crossings < f.n_samples)
    }
  }

  test("REAL PNG decode round-trips pixels exactly (javax.imageio)") {
    val px = Array.tabulate(24 * 17)(i => (i * 7 + 3) % 256)
    val bytes = Multimodal.MediaCodec.encodePng(24, 17, px)
    // a real PNG container, not a fake: magic bytes present
    assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P'.toByte)
    val (w, h, back) = Multimodal.MediaCodec.decodeImage(bytes)
    assert(w == 24 && h == 17)
    assert(back.sameElements(px), "grayscale PNG round-trip lost pixels")
  }

  test("REAL WAV decode round-trips PCM16 samples exactly (RIFF chunk walk)") {
    val samples =
      Array.tabulate(777)(i => ((i * 131) % 65536 - 32768).toShort)
    val bytes = Multimodal.MediaCodec.encodeWavPcm16(11000, samples)
    assert(new String(bytes.slice(0, 4), "US-ASCII") == "RIFF")
    val (rate, back) = Multimodal.MediaCodec.decodeWavPcm16(bytes)
    assert(rate == 11000)
    assert(back.sameElements(samples), "PCM16 round-trip lost samples")
  }

  test("frame container round-trips and REAL video decode matches per-frame formula") {
    val frames = Array.tabulate(5)(f =>
      Multimodal.MediaCodec.encodePng(8, 8,
        Array.tabulate(64)(i => (7 * f + i) % 256)))
    val packed = Multimodal.MediaCodec.packFrames(frames)
    val back = Multimodal.MediaCodec.unpackFrames(packed).toArray
    assert(back.length == 5)
    back.zip(frames).foreach { case (a, b) => assert(a.sameElements(b)) }
    // corrupt length prefix must fail loudly, not mis-frame silently
    val corrupt = packed.clone(); corrupt(0) = 0x7f.toByte
    intercept[IllegalArgumentException] {
      Multimodal.MediaCodec.unpackFrames(corrupt).toArray
    }
    // decode through the real codec lane on the generated table
    val f0 = Multimodal
      .decodeVideoReal(Multimodal.realMediaTable(spark, sf), maxFrames = 8)
      .filter(f => f.doc_id == 2L && f.frame_idx == 1)
      .head()
    // doc 2, frame 1: pixels (2 + 31 + i) % 256 for i < 64
    assert(f0.checksum == (0 until 64).map(i => (33 + i) % 256).sum.toLong)
  }

  test("real decode lanes stay partition-local and match the generation formula") {
    val rm = Multimodal.realMediaTable(spark, sf)
    val feats = Multimodal.decodeImageReal(rm)
    val plan = feats.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"real decode plan shuffles:\n$plan")
    // doc 0: w=16, h=16, px(i) = i % 256 — mean is the full-cycle average
    val f0 = feats.filter(_.doc_id == 0L).head()
    assert(f0.width == 16 && f0.height == 16)
    assert(math.round(f0.mean_pixel * 256) == (0 until 256).sum)
    val a0 = Multimodal.decodeAudioReal(rm).filter(_.doc_id == 1L).head()
    // doc 1: rate = 8000 + 1000·(1 % 5), n = 400 + 1 % 100
    assert(a0.sample_rate == 9000 && a0.n_samples == 401L)
  }

  test("frame sampling bounds fan-out per video") {
    val frames = Multimodal.frameSample(media, stride = 2, maxFrames = 5)
    val perDoc = frames
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"))
      .collect()
    assert(perDoc.nonEmpty)
    perDoc.foreach(r => assert(r.getLong(1) <= 5))
    // frame indices respect the stride
    assert(
      frames.filter(col("frame_idx") % 2 =!= 0).count() == 0)
  }
}
