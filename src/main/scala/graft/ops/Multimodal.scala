package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque BinaryType
  * payloads with typed metadata, processed by partition-local typed
  * transforms (`mapPartitions` over `Dataset[T]` — the Scala-native
  * equivalent of a Pandas `mapInPandas` batch UDF: one iterator per
  * partition, streaming through rows without collecting).
  *
  * DECODE IS STUBBED: this container has no image/audio codecs, so
  * `decodeImage` / `decodeAudio` produce a clearly-marked DETERMINISTIC
  * FAKE (bytes of the payload re-projected as "pixels"/"samples"). The
  * Spark-side plumbing is real and tested: BinaryType schema, typed
  * Encoders, partition-preserving iterator transforms, fixed batch
  * shapes (every feature row has a statically-known arity). Swapping the
  * fake for javax.imageio / a JNI codec changes ONE function body and no
  * plumbing.
  *
  * Scale notes (100 TB): payloads never shuffle — every transform below
  * is a narrow mapPartitions (no exchange in the plan, asserted in
  * MultimodalSpec); only the small extracted feature rows flow into
  * joins/aggregations. Frame sampling emits at most `maxFrames` rows per
  * video, bounding the fan-out of the explode.
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  /** Opaque media payload + typed metadata. `payload` stands in for the
    * encoded image/audio/video bytes; metadata is the typed companion a
    * real ingest would carry (dimensions, sample rate, frame count).
    */
  case class MediaRow(
      doc_id: Long,
      kind: String, // image | audio | video
      payload: Array[Byte],
      width: Int,
      height: Int,
      sample_rate: Int,
      n_frames: Int)

  case class ImageFeatures(
      doc_id: Long,
      width: Int,
      height: Int,
      n_bytes: Long,
      mean_pixel: Double,
      max_pixel: Int)

  case class AudioFeatures(
      doc_id: Long,
      sample_rate: Int,
      n_samples: Long,
      energy: Double,
      zero_crossings: Long)

  case class Frame(doc_id: Long, frame_idx: Int, n_bytes: Int, checksum: Long)

  /** Deterministic media table derived from `documents`: the text bytes
    * play the encoded payload; metadata fields are stable functions of
    * doc_id. (A real pipeline would read these from an object store —
    * the schema and partitioning are what matter here.)
    */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .map { r =>
        val id = r.getLong(0)
        val payload = r.getString(1).getBytes("UTF-8")
        val kind = (id % 3) match {
          case 0 => "image"
          case 1 => "audio"
          case _ => "video"
        }
        MediaRow(
          doc_id = id,
          kind = kind,
          payload = payload,
          width = 16 + (id % 16).toInt,
          height = 16 + (id % 8).toInt,
          sample_rate = 8000 + 1000 * (id % 5).toInt,
          n_frames = 1 + (payload.length / FrameBytes))
      }
  }

  private val FrameBytes = 256

  /** STUB — deterministic fake image decode. A real implementation
    * replaces the body with an actual codec (e.g. javax.imageio) reading
    * `m.payload`; everything around it (typed Dataset in/out, partition-
    * local iterator, fixed output arity) is production plumbing.
    */
  private def fakePixels(m: MediaRow): Array[Int] = {
    val n = m.width * m.height
    val p = m.payload
    Array.tabulate(n)(i =>
      if (p.isEmpty) 0 else p(((i * 31) % p.length + p.length) % p.length) & 0xff)
  }

  /** Image decode + feature extraction: one pass per partition, no
    * shuffle; output shape is fixed (6 columns per image).
    */
  def decodeImage(media: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media
      .filter(_.kind == "image")
      .mapPartitions { it =>
        it.map { m =>
          val px = fakePixels(m) // STUB decode (see Scaladoc)
          val mean =
            if (px.isEmpty) 0.0 else px.map(_.toLong).sum.toDouble / px.length
          ImageFeatures(
            doc_id = m.doc_id,
            width = m.width,
            height = m.height,
            n_bytes = m.payload.length.toLong,
            mean_pixel = mean,
            max_pixel = if (px.isEmpty) 0 else px.max)
        }
      }
  }

  /** Average-pool "resize" of the fake pixel grid to target×target.
    * The pooling math is real (and what a thumbnail stage does); only
    * the pixels underneath are the stubbed fake.
    */
  def resize(
      media: Dataset[MediaRow],
      target: Int): Dataset[(Long, Array[Double])] = {
    import media.sparkSession.implicits._
    media
      .filter(_.kind == "image")
      .mapPartitions { it =>
        it.map { m =>
          val px = fakePixels(m) // STUB decode
          val out = Array.tabulate(target * target) { cell =>
            val cy = cell / target
            val cx = cell % target
            val y0 = cy * m.height / target
            val y1 = math.max(y0 + 1, (cy + 1) * m.height / target)
            val x0 = cx * m.width / target
            val x1 = math.max(x0 + 1, (cx + 1) * m.width / target)
            var acc = 0L
            var cnt = 0
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                acc += px(y * m.width + x); cnt += 1; x += 1
              }
              y += 1
            }
            acc.toDouble / cnt
          }
          (m.doc_id, out)
        }
      }
  }

  /** STUB — deterministic fake audio decode: payload bytes as signed
    * samples. Real codec goes here; the energy / zero-crossing math and
    * the plumbing are real.
    */
  def decodeAudio(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media
      .filter(_.kind == "audio")
      .mapPartitions { it =>
        it.map { m =>
          val samples = m.payload.map(_.toInt) // STUB decode
          var energy = 0.0
          var zc = 0L
          var i = 0
          while (i < samples.length) {
            energy += samples(i).toDouble * samples(i)
            if (i > 0 && (samples(i) >= 0) != (samples(i - 1) >= 0)) zc += 1
            i += 1
          }
          AudioFeatures(
            doc_id = m.doc_id,
            sample_rate = m.sample_rate,
            n_samples = samples.length.toLong,
            energy = energy,
            zero_crossings = zc)
        }
      }
  }

  /** Frame sampling for "video": split the payload into fixed 256-byte
    * frames and keep every `stride`-th, capped at `maxFrames` — bounds
    * the fan-out per video regardless of payload size (the property that
    * matters at 100 TB; a real pipeline samples keyframes the same way).
    */
  def frameSample(
      media: Dataset[MediaRow],
      stride: Int,
      maxFrames: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media
      .filter(_.kind == "video")
      .mapPartitions { it =>
        it.flatMap { m =>
          val p = m.payload
          val nFrames = (p.length + FrameBytes - 1) / FrameBytes
          Iterator
            .range(0, nFrames, stride)
            .take(maxFrames)
            .map { f =>
              val start = f * FrameBytes
              val end = math.min(start + FrameBytes, p.length)
              var sum = 0L
              var i = start
              while (i < end) { sum = sum * 31 + (p(i) & 0xff); i += 1 }
              Frame(m.doc_id, f, end - start, sum)
            }
        }
      }
  }

  // ---------------------------------------------------------------------
  // q_binary_meta — the oracle-able slice of the binary pipeline: typed
  // metadata over the payload bytes (octet length, content digest) with
  // no decode involved. Spark md5(BINARY of UTF-8 text) == DuckDB
  // md5(VARCHAR) byte-for-byte.
  // ---------------------------------------------------------------------
  val binaryMeta: Q = (s, d) => {
    Tables.documents(s, d)
      .select(
        col("source"),
        octet_length(col("text")).cast("long").as("n_bytes"),
        md5(encode(col("text"), "UTF-8")).as("digest"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_bytes")).as("total_bytes"),
        countDistinct(col("digest")).as("d_digests"),
        max(col("n_bytes")).as("max_bytes"),
        min(col("digest")).as("min_digest"))
      .orderBy(col("source"))
  }

  val binaryMetaSql: String =
    """SELECT source, count(*) AS n_docs,
      |CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
      |count(DISTINCT digest) AS d_digests,
      |max(n_bytes) AS max_bytes,
      |min(digest) AS min_digest
      |FROM (SELECT source,
      |      CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |      md5(text) AS digest
      |      FROM documents) t
      |GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------------
  // q_binary_hist — payload-SIZE DISTRIBUTION per source via the
  // LogHistogram sketch (plans/LogHistogram.scala): the capacity-
  // planning question every multimodal ingest asks ("what are the p50 /
  // p99 object sizes per corpus?") answered from O(buckets) state per
  // source, never a size sort. Composes the multimodal metadata lane
  // with the mergeable-sketch lane; the twin recomputes identical
  // buckets declaratively (bin()-length exponents).
  // ---------------------------------------------------------------------
  private val bhQs = Seq(0.5, 0.99)
  private val bhShift = 5
  private val bhSub = 1 << bhShift

  /** Per-source payload-size LogHistogram — the STREAMABLE half of
    * q_binary_hist (a plain hash aggregate over (source, nb), so it
    * runs identically as a batch agg or as micro-batch state; the
    * sketch's merge is associative+commutative, which is what makes
    * that equivalence hold). Input: (source, nb) rows.
    */
  private[graft] def sizeHistAgg(sizes: DataFrame): DataFrame = {
    import graft.plans.LogHistogram
    sizes
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n"),
        LogHistogram.logHist(col("nb"), bhShift).as("hist"))
  }

  /** Quantile extraction from the aggregated histograms — the batch
    * tail shared by q_binary_hist and the streaming q_stream_binary
    * gate (which runs [[sizeHistAgg]] through the micro-batch engine
    * and hands the final state here). Input: (source, n, hist).
    */
  private[graft] def histQuantiles(hists: DataFrame): DataFrame = {
    val s = hists.sparkSession
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("b"))
    val fracs = s
      .range(1)
      .select(explode(array(bhQs.map(lit): _*)).as("q"))
    val lower =
      s"CASE WHEN (b div $bhSub) <= 1 THEN b " +
        s"ELSE shiftleft(b - ((b div $bhSub) - 1) * $bhSub, " +
        s"cast((b div $bhSub) - 1 as int)) END"
    hists
      .select(col("source"), col("n"), explode(col("hist")).as("hb"))
      .select(
        col("source"),
        col("n"),
        col("hb.bucket").as("b"),
        col("hb.cnt").as("bc"))
      .withColumn("cum", sum(col("bc")).over(wCum))
      .crossJoin(fracs)
      .filter(col("cum") >= ceil(col("q") * col("n")))
      .groupBy(col("source"), col("q"))
      .agg(min(col("b")).as("b"), max(col("n")).as("n"))
      .withColumn("est_bytes", expr(lower))
      .select(col("source"), col("q"), col("est_bytes"), col("n"))
      .orderBy(col("source"), col("q"))
  }

  val binaryHist: Q = (s, d) =>
    histQuantiles(sizeHistAgg(
      Tables
        .documents(s, d)
        .select(col("source"), octet_length(col("text")).cast("long").as("nb"))))

  val binaryHistSql: String =
    s"""WITH nb AS (
       |  SELECT source, CAST(octet_length(encode(text)) AS BIGINT) AS nb
       |  FROM documents),
       |bkt AS (
       |  SELECT source,
       |    CASE WHEN nb <= 0 THEN 0
       |         ELSE (greatest(length(bin(nb)) - 1 - $bhShift, 0) * $bhSub)
       |              + (nb >> greatest(length(bin(nb)) - 1 - $bhShift, 0))
       |    END AS b
       |  FROM nb),
       |g AS (SELECT source, b, count(*) AS bc FROM bkt GROUP BY 1, 2),
       |c AS (
       |  SELECT source, b, bc,
       |    CAST(sum(bc) OVER (PARTITION BY source ORDER BY b) AS BIGINT)
       |      AS cum,
       |    CAST(sum(bc) OVER (PARTITION BY source) AS BIGINT) AS n
       |  FROM g),
       |p AS (
       |  SELECT c.source, f.q, min(c.b) AS b, max(c.n) AS n
       |  FROM c, (VALUES ${bhQs
        .map(q => s"(CAST($q AS DOUBLE))")
        .mkString(",")}) AS f(q)
       |  WHERE c.cum >= CAST(ceil(f.q * c.n) AS BIGINT)
       |  GROUP BY 1, 2)
       |SELECT source, q,
       |  CASE WHEN (b // $bhSub) <= 1 THEN b
       |       ELSE (b - ((b // $bhSub) - 1) * $bhSub) << ((b // $bhSub) - 1)
       |  END AS est_bytes,
       |  n
       |FROM p ORDER BY source, q""".stripMargin

  // ---------------------------------------------------------------------
  // REAL decode lanes — actual codecs behind the same typed interface as
  // the fake lanes above: PNG via javax.imageio (JDK-native, headless)
  // and WAV/PCM16 via the RIFF container format. Payloads are GENERATED
  // deterministically from doc_id (this container has no media fixtures),
  // so each lane is encode → real decode → features, and the oracle
  // recomputes the same features arithmetically — the gate proves the
  // decode is byte-exact, not just shaped right.
  // ---------------------------------------------------------------------

  /** Real media codecs. Encode exists so the decode path has real
    * container bytes to chew on; at production scale only decode runs
    * (payloads arrive from the lake).
    */
  object MediaCodec {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO

    /** 8-bit grayscale PNG encode — lossless, so decode(encode(px)) == px. */
    def encodePng(width: Int, height: Int, px: Array[Int]): Array[Byte] = {
      val img = new BufferedImage(width, height, BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          raster.setSample(x, y, 0, px(y * width + x) & 0xff); x += 1
        }
        y += 1
      }
      val out = new ByteArrayOutputStream()
      ImageIO.write(img, "png", out)
      out.toByteArray
    }

    /** Real image decode: any ImageIO-supported container (PNG/JPEG/BMP/
      * GIF); returns dimensions + one luminance sample per pixel.
      */
    def decodeImage(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
      val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      require(img != null, "undecodable image payload")
      val (w, h) = (img.getWidth, img.getHeight)
      val raster = img.getRaster
      val px = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { px(y * w + x) = raster.getSample(x, y, 0); x += 1 }
        y += 1
      }
      (w, h, px)
    }

    /** Length-prefixed frame container (the simplest honest chunked
      * video shape): per frame a 4-byte big-endian length then the
      * encoded frame bytes.
      */
    def packFrames(frames: Array[Array[Byte]]): Array[Byte] = {
      val total = frames.map(_.length + 4).sum
      val buf = java.nio.ByteBuffer.allocate(total) // big-endian default
      frames.foreach { f => buf.putInt(f.length); buf.put(f) }
      buf.array()
    }

    /** Walk the frame container, yielding each frame's encoded bytes. */
    def unpackFrames(bytes: Array[Byte]): Iterator[Array[Byte]] = {
      val buf = java.nio.ByteBuffer.wrap(bytes)
      Iterator.continually(buf).takeWhile(_.remaining() >= 4).map { b =>
        val len = b.getInt
        require(len >= 0 && len <= b.remaining(), s"corrupt frame length $len")
        val out = new Array[Byte](len)
        b.get(out)
        out
      }
    }

    /** Minimal RIFF/WAVE writer: PCM16 mono little-endian. */
    def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
      val dataLen = samples.length * 2
      val buf = java.nio.ByteBuffer
        .allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
      buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1) // PCM
        .putShort(1) // mono
        .putInt(sampleRate)
        .putInt(sampleRate * 2) // byte rate
        .putShort(2) // block align
        .putShort(16) // bits/sample
      buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
      samples.foreach(buf.putShort)
      buf.array()
    }

    /** Real WAV/PCM16 decode: parses the RIFF chunk list (not a fixed
      * 44-byte offset — real files carry LIST/fact chunks too).
      */
    def decodeWavPcm16(bytes: Array[Byte]): (Int, Array[Short]) = {
      val buf = java.nio.ByteBuffer
        .wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def tag(): String = {
        val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
      }
      require(tag() == "RIFF", "not a RIFF container")
      buf.getInt // riff size
      require(tag() == "WAVE", "not a WAVE file")
      var sampleRate = -1
      var out: Array[Short] = null
      while (buf.remaining() >= 8 && (sampleRate < 0 || out == null)) {
        val id = tag()
        val len = buf.getInt
        id match {
          case "fmt " =>
            val fmt = buf.getShort
            require(fmt == 1, s"not PCM (fmt=$fmt)")
            buf.getShort // channels
            sampleRate = buf.getInt
            buf.position(buf.position() + len - 8)
          case "data" =>
            out = new Array[Short](len / 2)
            var i = 0
            while (i < out.length) { out(i) = buf.getShort; i += 1 }
          case _ => buf.position(buf.position() + len)
        }
      }
      require(sampleRate > 0 && out != null, "missing fmt/data chunk")
      (sampleRate, out)
    }
  }

  /** Media table with REAL container payloads (PNG for images, WAV for
    * audio), generated deterministically from doc_id so both the decode
    * lanes and the oracle can reproduce the content arithmetically.
    * Same narrow mapPartitions shape as [[mediaTable]].
    */
  def realMediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"))
      .filter(col("doc_id") < RealMediaDocs)
      .map { r =>
        val id = r.getLong(0)
        val w = 16 + (id % 16).toInt
        val h = 16 + (id % 8).toInt
        val rate = 8000 + 1000 * (id % 5).toInt
        val n = 400 + (id % 100).toInt
        (id % 3) match {
          case 0 =>
            val px = Array.tabulate(w * h)(i => ((id + i) % 256).toInt)
            MediaRow(id, "image", MediaCodec.encodePng(w, h, px), w, h, 0, 0)
          case 1 =>
            val samples = Array.tabulate(n)(i =>
              (((id * 7 + i.toLong * 13) % 65536) - 32768).toShort)
            MediaRow(id, "audio", MediaCodec.encodeWavPcm16(rate, samples),
              0, 0, rate, 0)
          case _ =>
            // "video" = a real frame container: length-prefixed PNG
            // frames (the AVI/MJPEG chunk idea in its simplest honest
            // form); each frame is an 8×8 grayscale PNG of formula pixels
            val frames = Array.tabulate(2 + (id % 4).toInt) { f =>
              MediaCodec.encodePng(8, 8,
                Array.tabulate(64)(i => ((id + 31L * f + i) % 256).toInt))
            }
            MediaRow(id, "video", MediaCodec.packFrames(frames), 0, 0, 0,
              frames.length)
        }
      }
  }

  private val RealMediaDocs = 120L

  /** REAL image decode + feature extraction — [[decodeImage]]'s twin with
    * javax.imageio in place of the fake, same narrow-plan shape.
    */
  def decodeImageReal(media: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media
      .filter(_.kind == "image")
      .mapPartitions { it =>
        it.map { m =>
          val (w, h, px) = MediaCodec.decodeImage(m.payload)
          val mean =
            if (px.isEmpty) 0.0 else px.map(_.toLong).sum.toDouble / px.length
          ImageFeatures(m.doc_id, w, h, m.payload.length.toLong, mean,
            if (px.isEmpty) 0 else px.max)
        }
      }
  }

  /** REAL audio decode + feature extraction — WAV/PCM16 parse in place of
    * the fake byte-projection, same energy/zero-crossing math.
    */
  def decodeAudioReal(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media
      .filter(_.kind == "audio")
      .mapPartitions { it =>
        it.map { m =>
          val (rate, samples) = MediaCodec.decodeWavPcm16(m.payload)
          var energy = 0.0
          var zc = 0L
          var i = 0
          while (i < samples.length) {
            energy += samples(i).toDouble * samples(i)
            if (i > 0 && (samples(i) >= 0) != (samples(i - 1) >= 0)) zc += 1
            i += 1
          }
          AudioFeatures(m.doc_id, rate, samples.length.toLong, energy, zc)
        }
      }
  }

  /** REAL video decode: walk the frame container, decode every frame
    * through the actual PNG codec, cap the fan-out at `maxFrames` per
    * video (the bound that matters at 100 TB) — [[frameSample]]'s twin
    * with a real container and a real codec in place of the byte-split.
    */
  def decodeVideoReal(
      media: Dataset[MediaRow],
      maxFrames: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media
      .filter(_.kind == "video")
      .mapPartitions { it =>
        it.flatMap { m =>
          MediaCodec.unpackFrames(m.payload).take(maxFrames).zipWithIndex
            .map { case (bytes, f) =>
              val (_, _, px) = MediaCodec.decodeImage(bytes)
              Frame(m.doc_id, f, bytes.length, px.map(_.toLong).sum)
            }
        }
      }
  }

  // ---------------------------------------------------------------------
  // q_video_frames — the REAL frame-container decode under the oracle
  // gate: per video, every frame PNG-decoded and reduced to its
  // integer-exact pixel sum (frame f of doc id has pixels
  // (id + 31f + i) mod 256 on an 8×8 grid); the oracle regenerates the
  // (doc, frame, pixel) grid arithmetically. One flipped byte anywhere —
  // container framing, PNG encode, codec decode — shifts a checksum and
  // fails the hash. Completes the real-decode triple (image/audio/video).
  // ---------------------------------------------------------------------
  val videoFrames: Q = (s, d) => {
    import s.implicits._
    decodeVideoReal(realMediaTable(s, d), maxFrames = 8)
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_frames"),
        sum(col("checksum")).as("px_total"),
        max(col("checksum")).as("px_max_frame"))
      .orderBy(col("doc_id"))
  }

  val videoFramesSql: String =
    s"""WITH g AS (
       |  SELECT doc_id, CAST(2 + doc_id % 4 AS BIGINT) AS nf
       |  FROM documents WHERE doc_id % 3 = 2 AND doc_id < $RealMediaDocs),
       |fr AS (SELECT f FROM range(0, 8) t(f)),
       |px AS (SELECT i FROM range(0, 64) t(i)),
       |s AS (
       |  SELECT g.doc_id, fr.f,
       |    CAST(SUM((g.doc_id + 31 * fr.f + px.i) % 256) AS BIGINT) AS fsum
       |  FROM g JOIN fr ON fr.f < g.nf CROSS JOIN px
       |  GROUP BY 1, 2)
       |SELECT doc_id, count(*) AS n_frames,
       |CAST(SUM(fsum) AS BIGINT) AS px_total,
       |CAST(MAX(fsum) AS BIGINT) AS px_max_frame
       |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q_image_decode — the REAL PNG decode under the oracle gate: pixels
  // px(i) = (doc_id + i) % 256 are PNG-encoded, decoded back through
  // javax.imageio, and reduced to integer-exact features; the oracle
  // regenerates the same pixels arithmetically (a bounded static range
  // join — max w·h is 31·23 = 713 < 1024). Any byte error anywhere in
  // encode→container→decode shifts px_sum and fails the hash.
  // ---------------------------------------------------------------------
  val imageDecode: Q = (s, d) => {
    import s.implicits._
    decodeImageReal(realMediaTable(s, d))
      .map(f => (f.doc_id, f.width, f.height,
        math.round(f.mean_pixel * f.width * f.height), f.max_pixel.toLong))
      .toDF("doc_id", "width", "height", "px_sum", "px_max")
      .orderBy(col("doc_id"))
  }

  val imageDecodeSql: String =
    s"""WITH g AS (
       |  SELECT doc_id,
       |    CAST(16 + doc_id % 16 AS INT) AS width,
       |    CAST(16 + doc_id % 8 AS INT) AS height
       |  FROM documents WHERE doc_id % 3 = 0 AND doc_id < $RealMediaDocs),
       |r AS (SELECT i FROM range(0, 1024) t(i))
       |SELECT g.doc_id, g.width, g.height,
       |  CAST(SUM((g.doc_id + r.i) % 256) AS BIGINT) AS px_sum,
       |  CAST(MAX((g.doc_id + r.i) % 256) AS BIGINT) AS px_max
       |FROM g JOIN r ON r.i < g.width * g.height
       |GROUP BY 1, 2, 3 ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q_image_resize — feature-extraction RESIZE on the REAL decode path:
  // each PNG is decoded (javax.imageio) and nearest-neighbor downsampled
  // to an 8×8 thumbnail — the canonical cheap image fingerprint (pHash's
  // first stage, dataset-dedup thumbnails). Sampling indices are pure
  // integer arithmetic (row r samples source row ⌊r·h/8⌋), so the
  // oracle regenerates the EXACT thumbnail from the pixel formula
  // without ever seeing a byte of PNG: a resize-indexing bug (the
  // classic off-by-one/rounding-mode class) shifts thumb_sum and fails
  // the hash. Same narrow mapPartitions shape as every decode lane —
  // one pass, no shuffle before the final bounded aggregate.
  // ---------------------------------------------------------------------
  private val ThumbSide = 8

  val imageResize: Q = (s, d) => {
    import s.implicits._
    realMediaTable(s, d)
      .filter(_.kind == "image")
      .mapPartitions { it =>
        it.map { m =>
          val (w, h, px) = MediaCodec.decodeImage(m.payload)
          var sum = 0L
          var mx = 0L
          var r = 0
          while (r < ThumbSide) {
            var c = 0
            val sr = r * h / ThumbSide
            while (c < ThumbSide) {
              val v = px(sr * w + c * w / ThumbSide).toLong
              sum += v
              if (v > mx) mx = v
              c += 1
            }
            r += 1
          }
          (m.doc_id, w, h, sum, mx)
        }
      }
      .toDF("doc_id", "width", "height", "thumb_sum", "thumb_max")
      .orderBy(col("doc_id"))
  }

  val imageResizeSql: String =
    s"""WITH g AS (
       |  SELECT doc_id,
       |    CAST(16 + doc_id % 16 AS INT) AS width,
       |    CAST(16 + doc_id % 8 AS INT) AS height
       |  FROM documents WHERE doc_id % 3 = 0 AND doc_id < $RealMediaDocs),
       |t AS (SELECT r, c FROM range(0, $ThumbSide) a(r), range(0, $ThumbSide) b(c)),
       |s AS (
       |  SELECT g.doc_id, g.width, g.height,
       |    (g.doc_id + ((t.r * g.height // $ThumbSide) * g.width
       |                 + (t.c * g.width // $ThumbSide))) % 256 AS v
       |  FROM g CROSS JOIN t)
       |SELECT doc_id, width, height,
       |  CAST(SUM(v) AS BIGINT) AS thumb_sum,
       |  CAST(MAX(v) AS BIGINT) AS thumb_max
       |FROM s GROUP BY 1, 2, 3 ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q_audio_decode — the REAL WAV/PCM16 decode under the oracle gate:
  // samples s(i) = ((7·doc_id + 13·i) mod 2¹⁶) − 2¹⁵ round-trip the RIFF
  // container; energy (Σ s²) and signed sum (Σ s) are integer-exact, so
  // one flipped byte anywhere in the 2-byte-LE lane fails the hash.
  // ---------------------------------------------------------------------
  val audioDecode: Q = (s, d) => {
    import s.implicits._
    decodeAudioReal(realMediaTable(s, d))
      .map(f => (f.doc_id, f.sample_rate, f.n_samples,
        math.round(f.energy), f.zero_crossings))
      .toDF("doc_id", "sample_rate", "n_samples", "energy", "zero_crossings")
      .orderBy(col("doc_id"))
  }

  val audioDecodeSql: String =
    s"""WITH g AS (
       |  SELECT doc_id,
       |    CAST(8000 + 1000 * (doc_id % 5) AS INT) AS sample_rate,
       |    CAST(400 + doc_id % 100 AS BIGINT) AS n
       |  FROM documents WHERE doc_id % 3 = 1 AND doc_id < $RealMediaDocs),
       |r AS (SELECT i FROM range(0, 500) t(i)),
       |s AS (
       |  SELECT g.doc_id, g.sample_rate, g.n,
       |    ((7 * g.doc_id + 13 * r.i) % 65536) - 32768 AS v,
       |    r.i
       |  FROM g JOIN r ON r.i < g.n)
       |SELECT doc_id, sample_rate, max(n) AS n_samples,
       |  CAST(SUM(v * v) AS BIGINT) AS energy,
       |  CAST(SUM(CASE WHEN i > 0 AND (v >= 0) <>
       |    (((7 * doc_id + 13 * (i - 1)) % 65536) - 32768 >= 0)
       |    THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
       |FROM s GROUP BY 1, 2 ORDER BY doc_id""".stripMargin

  val queries: Map[String, Q] =
    Map(
      "q_binary_meta" -> binaryMeta,
      "q_binary_hist" -> binaryHist,
      "q_image_decode" -> imageDecode,
      "q_image_resize" -> imageResize,
      "q_audio_decode" -> audioDecode,
      "q_video_frames" -> videoFrames)
  val oracleSql: Map[String, String] =
    Map(
      "q_binary_meta" -> binaryMetaSql,
      "q_binary_hist" -> binaryHistSql,
      "q_image_decode" -> imageDecodeSql,
      "q_image_resize" -> imageResizeSql,
      "q_audio_decode" -> audioDecodeSql,
      "q_video_frames" -> videoFramesSql)
}
