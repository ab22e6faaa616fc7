package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, and per-partition batch decode/feature-extract.
  *
  * The image path is REAL: `javax.imageio` (JDK-builtin) encodes a
  * deterministic PNG per document and decodes it back inside the scan
  * stage; the verified query emits exact integer pixel statistics that a
  * DuckDB oracle recomputes analytically from the same pixel formula — a
  * full encode→decode→extract round-trip check (PNG is lossless, so the
  * sums match bit-for-bit) — and resize is REAL as well: a 2× box-average
  * downsample over decoded pixels with a fresh encode ([[resizeBox2x]],
  * verified by `multimodal_resize`). The audio path is REAL too:
  * `javax.sound.sampled` (also JDK-builtin) writes 16-bit PCM clips into
  * the RIFF/WAVE container and parses them back ([[wavMediaTable]] /
  * [[decodeWav]], verified by `multimodal_audio`). Only VIDEO remains a
  * stub ([[sampleFrames]] — no video codec library exists in this
  * container) with the Spark-side contract (binary column, typed metadata,
  * per-partition batching) identical to the real paths.
  *
  * Scale design: media blobs never pass through a shuffle — features are
  * extracted map-side in the same stage as the scan, and only the (small)
  * feature vectors flow downstream. A real 100 TB media pipeline keeps the
  * decode in the scan stage exactly like this, with
  * `spark.sql.files.maxPartitionBytes` sizing partitions so a task's batch
  * of blobs fits executor memory.
  */
object Multimodal {

  /** One media record: payload + typed metadata. */
  case class Media(doc_id: Long, media: Array[Byte], fmt: String, width: Int, height: Int)

  /** Deterministic synthetic media table derived from `documents`: UTF-8
    * payload bytes standing in for encoded media, with fake-but-typed
    * metadata. (A real pipeline reads `binaryFile` sources or parquet with
    * a binary column; the schema is identical.)
    */
  def mediaTable(spark: SparkSession, dir: String): Dataset[Media] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        encode(col("text"), "UTF-8").as("media"),
        lit("fake/raw").as("fmt"),
        (pmod(col("doc_id"), lit(640)) + 1).cast("int").as("width"),
        (pmod(col("doc_id"), lit(480)) + 1).cast("int").as("height"))
      .as[Media]
  }

  /** One sampled "frame" of a media payload. */
  case class Frame(doc_id: Long, frame_idx: Int, offset: Long, frame_bytes: Long, checksum: Long)

  /** Frame sampling: one-to-many per-partition extraction (the video
    * analog — every Nth fixed-size chunk of the payload becomes a frame
    * row). The chunking is real; only the codec behind it is the stub.
    * Like [[extractFeatures]], runs in the scan stage; frames (small) flow
    * downstream, payloads don't.
    */
  def sampleFrames(media: Dataset[Media], frameSize: Int = 64, every: Int = 2): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val nFrames = math.max(1, m.media.length / frameSize)
      (0 until nFrames by every).map { i =>
        val start = i * frameSize
        val end = math.min(start + frameSize, m.media.length)
        var sum = 0L
        var j = start
        while (j < end) { sum += (m.media(j) & 0xff); j += 1 }
        Frame(m.doc_id, i, start.toLong, (end - start).toLong, sum)
      }
    }
  }

  // ---- real image path (javax.imageio, JDK-builtin) -------------------

  val ImgW = 16
  val ImgH = 16

  /** Deterministic RGB pixel formula — the single source of truth shared by
    * the PNG generator and the DuckDB oracle.
    */
  @inline def pixelR(id: Long, x: Int, y: Int): Int = ((id * 31 + x * 7 + y * 13) % 256).toInt
  @inline def pixelG(id: Long, x: Int, y: Int): Int = ((id * 17 + x * 3 + y * 5) % 256).toInt
  @inline def pixelB(id: Long, x: Int, y: Int): Int = ((id * 7 + x * 11 + y * 3) % 256).toInt

  /** Media table with REAL PNG payloads: one 16×16 image per document,
    * pixels from [[pixelR]]/G/B, encoded with `javax.imageio` inside the
    * scan-stage `mapPartitions` batch (per-task codec setup amortized,
    * exactly where a production pipeline decodes camera/scan blobs).
    */
  /** ImageIO defaults to a DISK-backed stream cache: every encode/decode
    * round-trips a temp file. For 16×16 in-memory blobs that temp-file
    * churn dwarfs the codec work itself and contends on /tmp across 32
    * concurrent tasks (measured ~2× on the multimodal_features bench).
    * Heap-backed streams instead — idempotent per-JVM static, forced once
    * per executor at first codec use (lazy-val read thereafter).
    */
  private lazy val imageIOHeapStreams: Unit = javax.imageio.ImageIO.setUseCache(false)

  def pngMediaTable(spark: SparkSession, dir: String): Dataset[Media] = {
    import spark.implicits._
    // widen BEFORE the codec stage: a narrow scan (few row groups) would
    // pin the per-row encode/decode onto those few tasks; shuffling just
    // the ids (8 bytes each) buys full-cluster codec parallelism — the
    // standard repartition-before-expensive-map shape
    Dedup.widen(Tables.documents(spark, dir).select(col("doc_id")))
      .as[Long]
      .mapPartitions { ids =>
        imageIOHeapStreams
        ids.map { id =>
          val img = new java.awt.image.BufferedImage(
            ImgW, ImgH, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < ImgH) {
            var x = 0
            while (x < ImgW) {
              img.setRGB(x, y,
                (pixelR(id, x, y) << 16) | (pixelG(id, x, y) << 8) | pixelB(id, x, y))
              x += 1
            }
            y += 1
          }
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", out)
          Media(id, out.toByteArray, "image/png", ImgW, ImgH)
        }
      }
  }

  /** Decoded per-image pixel statistics (exact integers). */
  case class PixelStats(doc_id: Long, img_w: Int, img_h: Int,
      sum_r: Long, sum_g: Long, sum_b: Long)

  /** REAL decode: `ImageIO.read` the PNG payload back to pixels and reduce
    * to exact per-channel sums — map-side, in the same stage as encode.
    */
  def decodePng(m: Media): PixelStats = {
    imageIOHeapStreams
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.media))
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
        x += 1
      }
      y += 1
    }
    PixelStats(m.doc_id, img.getWidth, img.getHeight, sr, sg, sb)
  }

  /** End-to-end verified image pipeline: pixel formula → PNG encode →
    * PNG decode → exact channel sums. The oracle recomputes the sums
    * analytically from the shared formula, so any corruption anywhere in
    * the encode/decode/extract chain breaks the hash match.
    */
  def pixelStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    pngMediaTable(spark, dir).mapPartitions { batch =>
      // per-task codec setup would go here (ImageIO is stateless)
      batch.map(decodePng)
    }.toDF()
  }

  /** REAL image resize: 2× box-average downsample (OpenCV's INTER_AREA at
    * an integer factor) over the DECODED pixels, then a fresh PNG encode —
    * so the verified chain is formula → encode → decode → resample →
    * encode → decode → stats, with every pixel transform in exact integer
    * arithmetic (`(p00+p01+p10+p11) / 4` floor division) the oracle can
    * recompute analytically. This replaces the former metadata-only
    * resize stub for images; [[resizeStub]] remains only for the opaque
    * fake-payload table.
    */
  def resizeBox2x(m: Media): Media = {
    imageIOHeapStreams
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.media))
    val w2 = img.getWidth / 2
    val h2 = img.getHeight / 2
    val out = new java.awt.image.BufferedImage(
      w2, h2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var by = 0
    while (by < h2) {
      var bx = 0
      while (bx < w2) {
        var (sr, sg, sb) = (0, 0, 0)
        var dy = 0
        while (dy < 2) {
          var dx = 0
          while (dx < 2) {
            val rgb = img.getRGB(2 * bx + dx, 2 * by + dy)
            sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
            dx += 1
          }
          dy += 1
        }
        out.setRGB(bx, by, ((sr / 4) << 16) | ((sg / 4) << 8) | (sb / 4))
        bx += 1
      }
      by += 1
    }
    val bytes = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", bytes)
    Media(m.doc_id, bytes.toByteArray, "image/png", w2, h2)
  }

  /** Verified resize pipeline: encode → decode → box-downsample →
    * re-encode → decode → exact channel sums of the 8×8 result. Runs
    * entirely in the scan stage ([[pngMediaTable]]'s widened layout);
    * only the 6-column stats rows flow downstream.
    */
  def resizedStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    pngMediaTable(spark, dir).mapPartitions { batch =>
      batch.map(m => decodePng(resizeBox2x(m)))
    }.toDF()
  }

  // ---- real audio path (javax.sound.sampled, JDK-builtin) -------------

  val WavSamples = 256
  val WavRateHz = 8000f

  /** Deterministic 16-bit PCM sample formula — the single source of truth
    * shared by the WAV generator and the DuckDB oracle (exact integers in
    * [-32768, 32767], same role as [[pixelR]] for the image path).
    */
  @inline def pcmSample(id: Long, i: Int): Int =
    (((id * 31 + i * 17) % 65536) - 32768).toInt

  /** Media table with REAL WAV payloads: one 256-sample 16-bit mono PCM
    * clip per document, samples from [[pcmSample]], encoded to the RIFF/WAVE
    * container with `javax.sound.sampled.AudioSystem` inside the scan-stage
    * `mapPartitions` batch — the audio leg of the multimodal contract, same
    * widen-before-codec shape as [[pngMediaTable]].
    */
  def wavMediaTable(spark: SparkSession, dir: String): Dataset[Media] = {
    import spark.implicits._
    Dedup.widen(Tables.documents(spark, dir).select(col("doc_id")))
      .as[Long]
      .mapPartitions { ids =>
        val fmt = new javax.sound.sampled.AudioFormat(WavRateHz, 16, 1, true, false)
        ids.map { id =>
          val pcm = new Array[Byte](WavSamples * 2)
          var i = 0
          while (i < WavSamples) {
            val s = pcmSample(id, i)
            pcm(2 * i) = (s & 0xff).toByte          // little-endian
            pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
            i += 1
          }
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, WavSamples.toLong)
          val out = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(
            ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
          Media(id, out.toByteArray, "audio/wav", WavSamples, 1)
        }
      }
  }

  /** Decoded per-clip sample statistics (exact integers). */
  case class AudioStats(doc_id: Long, n_samples: Int,
      sum_amp: Long, sum_abs: Long, max_abs: Long)

  /** REAL decode: `AudioSystem.getAudioInputStream` parses the RIFF header
    * back to the PCM frames, which reduce map-side to exact amplitude
    * sums — encode→container→decode round-trip, like [[decodePng]].
    */
  def decodeWav(m: Media): AudioStats = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(m.media))
    val bytes = ais.readAllBytes()
    ais.close()
    var (sum, sabs, mabs) = (0L, 0L, 0L)
    var i = 0
    while (i + 1 < bytes.length) {
      val s = ((bytes(i) & 0xff) | (bytes(i + 1) << 8)).toShort.toInt
      sum += s
      val a = math.abs(s).toLong
      sabs += a
      if (a > mabs) mabs = a
      i += 2
    }
    AudioStats(m.doc_id, bytes.length / 2, sum, sabs, mabs)
  }

  /** End-to-end verified audio pipeline: PCM formula → WAV encode → WAV
    * decode → exact amplitude stats; oracle recomputes analytically from
    * the shared formula (the [[pixelStats]] pattern on the audio leg).
    */
  def audioStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    wavMediaTable(spark, dir).mapPartitions { batch =>
      // per-task codec setup would go here (AudioSystem is stateless)
      batch.map(decodeWav)
    }.toDF()
  }

  /** Silence threshold (absolute 16-bit amplitude) and minimum run.
    * 16384 is calibrated to the fixture's PCM formula: doc_id·31 spans
    * [0, 65536·sf·…] slowly, so a band narrower than 2¹⁴ would select no
    * sample at small scale factors and the gate would pass vacuously.
    */
  val SilenceAbs = 16384L
  val SilenceMinRun = 4

  case class AudioSegment(doc_id: Long, seg_start: Long, seg_len: Long)

  /** Silence/activity segmentation — the VAD front-end of every speech
    * pipeline: maximal runs of consecutive DECODED samples with
    * |amplitude| < [[SilenceAbs]], kept at length ≥ [[SilenceMinRun]].
    * The run-length scan happens INSIDE the decode task (per-clip local
    * state, O(samples) once, emitting only (doc_id, seg_start, seg_len)
    * triples) — raw audio never shuffles, the exact posture a 100 TB
    * audio corpus needs. The oracle replays it relationally: the
    * `i - row_number()` gaps-and-islands trick over the analytic sample
    * formula, so one corrupted sample anywhere in the encode→RIFF→decode
    * round-trip breaks the hash match.
    */
  def audioSilence(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    wavMediaTable(spark, dir).mapPartitions { batch =>
      batch.flatMap { m =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(m.media))
        val bytes = ais.readAllBytes()
        ais.close()
        val segs = scala.collection.mutable.ArrayBuffer.empty[AudioSegment]
        var runStart = -1
        var i = 0
        val n = bytes.length / 2
        while (i < n) {
          val s = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toInt
          if (math.abs(s) < SilenceAbs) {
            if (runStart < 0) runStart = i
          } else {
            if (runStart >= 0 && i - runStart >= SilenceMinRun)
              segs += AudioSegment(m.doc_id, runStart.toLong, (i - runStart).toLong)
            runStart = -1
          }
          i += 1
        }
        if (runStart >= 0 && n - runStart >= SilenceMinRun)
          segs += AudioSegment(m.doc_id, runStart.toLong, (n - runStart).toLong)
        segs
      }
    }.toDF()
  }

  // ---- perceptual hash (dHash) over the real decoded pixels -----------

  /** 64-bit difference hash, split into 32-bit halves so both engines stay
    * inside signed-BIGINT arithmetic (bit 63 of a packed long would flip
    * the sign and diverge from any SUM-of-powers oracle).
    */
  case class PHash(doc_id: Long, phash_hi: Long, phash_lo: Long)

  /** dHash over a DECODED 8×8 image: gray = (r+g+b)/3 (floor), bit y*8+x
    * set iff gray((x+1) mod 8, y) > gray(x, y) — the classic row-gradient
    * perceptual fingerprint (wraparound keeps exactly 64 bits without a
    * 9th column). Runs on [[resizeBox2x]] output, so the verified chain is
    * formula → encode → decode → box-downsample → encode → decode → gray →
    * hash, all exact integer arithmetic the oracle can replay.
    */
  def dhashOf(m: Media): PHash = {
    imageIOHeapStreams
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.media))
    val w = img.getWidth
    val h = img.getHeight
    val gray = Array.ofDim[Int](h, w)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        gray(y)(x) = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
        x += 1
      }
      y += 1
    }
    var (hi, lo) = (0L, 0L)
    y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        if (gray(y)((x + 1) % w) > gray(y)(x)) {
          val bit = y * w + x
          if (bit >= 32) hi |= 1L << (bit - 32) else lo |= 1L << bit
        }
        x += 1
      }
      y += 1
    }
    PHash(m.doc_id, hi, lo)
  }

  /** Verified perceptual-hash pipeline: one 64-bit dHash per document,
    * computed from the REAL decoded-resampled pixels in the scan stage.
    * Only 24 bytes per image flow downstream — the fingerprint table a
    * 100 TB image-dedup pass actually shuffles.
    */
  def perceptualHash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    pngMediaTable(spark, dir).mapPartitions { batch =>
      batch.map(m => dhashOf(resizeBox2x(m)))
    }.toDF()
  }

  /** Perceptual-duplicate pairs: hash-equality self-join on the dHash —
    * image dedup as a bounded equi-join on a 64-bit signature, the exact
    * shape of [[Dedup]]'s fingerprint joins (never all-pairs pixel
    * comparison). The fixture formula repeats every 256 ids, so id ≡ id'
    * (mod 256) yields byte-identical images; the hash join must recover
    * exactly those pairs plus any true dHash collisions — and the oracle
    * recomputes the same hashes analytically, so one corrupted pixel
    * anywhere in the double codec round-trip breaks the match.
    */
  def perceptualDupPairs(spark: SparkSession, dir: String): DataFrame = {
    val h = perceptualHash(spark, dir)
    h.as("a").join(h.as("b"),
        col("a.phash_hi") === col("b.phash_hi") &&
        col("a.phash_lo") === col("b.phash_lo") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_features" -> pixelStats _,
    "multimodal_resize" -> resizedStats _,
    "multimodal_audio" -> audioStats _,
    "multimodal_audio_vad" -> audioSilence _,
    "multimodal_phash" -> perceptualHash _,
    "multimodal_phash_dup" -> perceptualDupPairs _,
  )

  /** Dialect mirror of one box-averaged channel at resampled pixel
    * (x.x, y.y): floor-mean of the four source pixels' `(id*m1+x*m2+y*m3)
    * mod 256` values — shared by the phash oracles.
    */
  private def chanAvgSql(m1: Int, m2: Int, m3: Int): String =
    s"""(((d.doc_id*$m1 + (2*x.x)*$m2 + (2*y.y)*$m3) % 256
       |  + (d.doc_id*$m1 + (2*x.x+1)*$m2 + (2*y.y)*$m3) % 256
       |  + (d.doc_id*$m1 + (2*x.x)*$m2 + (2*y.y+1)*$m3) % 256
       |  + (d.doc_id*$m1 + (2*x.x+1)*$m2 + (2*y.y+1)*$m3) % 256) // 4)""".stripMargin

  /** Shared CTE body computing every document's dHash halves analytically
    * (gray grid → wraparound row-gradient bits → packed 32-bit halves).
    */
  private val phashCte: String =
    s"""g AS (
       |  SELECT d.doc_id, x.x, y.y,
       |    ((${chanAvgSql(31, 7, 13)} + ${chanAvgSql(17, 3, 5)} + ${chanAvgSql(7, 11, 3)}) // 3) AS gray
       |  FROM documents d,
       |       generate_series(0, ${ImgW / 2 - 1}) x(x),
       |       generate_series(0, ${ImgH / 2 - 1}) y(y)),
       |bits AS (
       |  SELECT a.doc_id, a.y * ${ImgW / 2} + a.x AS bit
       |  FROM g a JOIN g b ON b.doc_id = a.doc_id AND b.y = a.y
       |   AND b.x = (a.x + 1) % ${ImgW / 2}
       |  WHERE b.gray > a.gray),
       |h AS (
       |  SELECT d.doc_id,
       |    coalesce(sum(CASE WHEN bit >= 32 THEN 1::BIGINT << (bit - 32) END), 0)::BIGINT AS phash_hi,
       |    coalesce(sum(CASE WHEN bit < 32 THEN 1::BIGINT << bit END), 0)::BIGINT AS phash_lo
       |  FROM documents d LEFT JOIN bits ON d.doc_id = bits.doc_id
       |  GROUP BY d.doc_id)""".stripMargin

  def oracle: Map[String, String] = Map(
    "multimodal_phash" ->
      s"""WITH $phashCte
         |SELECT doc_id, phash_hi, phash_lo FROM h""".stripMargin,
    "multimodal_phash_dup" ->
      s"""WITH $phashCte
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |FROM h a JOIN h b
         |  ON a.phash_hi = b.phash_hi AND a.phash_lo = b.phash_lo
         | AND a.doc_id < b.doc_id""".stripMargin,
    "multimodal_features" ->
      s"""SELECT d.doc_id, $ImgW AS img_w, $ImgH AS img_h,
         | SUM((d.doc_id * 31 + x.x * 7 + y.y * 13) % 256)::BIGINT AS sum_r,
         | SUM((d.doc_id * 17 + x.x * 3 + y.y * 5) % 256)::BIGINT AS sum_g,
         | SUM((d.doc_id * 7 + x.x * 11 + y.y * 3) % 256)::BIGINT AS sum_b
         |FROM documents d,
         |     generate_series(0, ${ImgW - 1}) x(x),
         |     generate_series(0, ${ImgH - 1}) y(y)
         |GROUP BY d.doc_id""".stripMargin,
    "multimodal_resize" ->
      s"""SELECT d.doc_id, ${ImgW / 2} AS img_w, ${ImgH / 2} AS img_h,
         | SUM(((d.doc_id * 31 + (2*x.x) * 7 + (2*y.y) * 13) % 256
         |    + (d.doc_id * 31 + (2*x.x+1) * 7 + (2*y.y) * 13) % 256
         |    + (d.doc_id * 31 + (2*x.x) * 7 + (2*y.y+1) * 13) % 256
         |    + (d.doc_id * 31 + (2*x.x+1) * 7 + (2*y.y+1) * 13) % 256) // 4)::BIGINT AS sum_r,
         | SUM(((d.doc_id * 17 + (2*x.x) * 3 + (2*y.y) * 5) % 256
         |    + (d.doc_id * 17 + (2*x.x+1) * 3 + (2*y.y) * 5) % 256
         |    + (d.doc_id * 17 + (2*x.x) * 3 + (2*y.y+1) * 5) % 256
         |    + (d.doc_id * 17 + (2*x.x+1) * 3 + (2*y.y+1) * 5) % 256) // 4)::BIGINT AS sum_g,
         | SUM(((d.doc_id * 7 + (2*x.x) * 11 + (2*y.y) * 3) % 256
         |    + (d.doc_id * 7 + (2*x.x+1) * 11 + (2*y.y) * 3) % 256
         |    + (d.doc_id * 7 + (2*x.x) * 11 + (2*y.y+1) * 3) % 256
         |    + (d.doc_id * 7 + (2*x.x+1) * 11 + (2*y.y+1) * 3) % 256) // 4)::BIGINT AS sum_b
         |FROM documents d,
         |     generate_series(0, ${ImgW / 2 - 1}) x(x),
         |     generate_series(0, ${ImgH / 2 - 1}) y(y)
         |GROUP BY d.doc_id""".stripMargin,
    "multimodal_audio_vad" ->
      s"""WITH s AS (
         |  SELECT d.doc_id, i.i,
         |   abs((d.doc_id * 31 + i.i * 17) % 65536 - 32768) AS amp
         |  FROM documents d, generate_series(0, ${WavSamples - 1}) i(i)),
         |g AS (
         |  SELECT doc_id, i,
         |   i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS grp
         |  FROM s WHERE amp < $SilenceAbs)
         |SELECT doc_id, min(i)::BIGINT AS seg_start, count(*)::BIGINT AS seg_len
         |FROM g GROUP BY doc_id, grp
         |HAVING count(*) >= $SilenceMinRun""".stripMargin,
    "multimodal_audio" ->
      s"""SELECT d.doc_id, $WavSamples AS n_samples,
         | SUM((d.doc_id * 31 + i.i * 17) % 65536 - 32768)::BIGINT AS sum_amp,
         | SUM(abs((d.doc_id * 31 + i.i * 17) % 65536 - 32768))::BIGINT AS sum_abs,
         | MAX(abs((d.doc_id * 31 + i.i * 17) % 65536 - 32768))::BIGINT AS max_abs
         |FROM documents d, generate_series(0, ${WavSamples - 1}) i(i)
         |GROUP BY d.doc_id""".stripMargin,
  )
}
