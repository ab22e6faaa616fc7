package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, and per-partition batch "decode"/feature-extract.
  *
  * The actual codec step is STUBBED (no image/audio libraries in this
  * container): [[decodeStub]] is a deterministic fake — a byte-histogram
  * "feature vector" — clearly marked as the seam where a real decoder
  * (JNI/FFmpeg/ImageIO) would slot in. Everything around it — the schema,
  * the binary column, the `mapPartitions` batching (the Scala analog of
  * `mapInPandas`: one iterator per partition, amortized per-batch setup),
  * partitioning behavior — is real and tested.
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

  /** Extracted features: fixed-dim vector + payload stats. */
  case class MediaFeatures(doc_id: Long, n_bytes: Long, features: Array[Double])

  val FeatureDim = 16

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

  /** STUB decoder — the seam for a real codec. Deterministic: a normalized
    * 16-bin byte histogram plus no-op "resize" semantics. A real
    * implementation would decode `m.media` with an image/audio library and
    * emit embeddings/frames; the Spark-side contract (pure function on the
    * payload, called once per record inside a partition batch) is unchanged.
    */
  def decodeStub(m: Media): MediaFeatures = {
    val hist = new Array[Double](FeatureDim)
    var i = 0
    while (i < m.media.length) {
      hist((m.media(i) & 0xff) % FeatureDim) += 1d
      i += 1
    }
    val n = math.max(1, m.media.length)
    MediaFeatures(m.doc_id, m.media.length.toLong, hist.map(_ / n))
  }

  /** Per-partition batched feature extraction (`mapPartitions` = the Scala
    * analog of `mapInPandas`: per-partition setup happens once, records
    * stream through).
    */
  def extractFeatures(media: Dataset[Media]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      // real decoders initialize their codec context here, once per task
      batch.map(decodeStub)
    }
  }

  /** STUB resize — the metadata-transform seam: a real implementation
    * rescales pixel data; the stub rewrites the typed metadata and keeps
    * the payload opaque, preserving the exact contract shape (pure
    * per-record function, map-side).
    */
  def resizeStub(m: Media, newWidth: Int, newHeight: Int): Media =
    m.copy(width = newWidth, height = newHeight)

  def resize(media: Dataset[Media], w: Int, h: Int): Dataset[Media] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(resizeStub(_, w, h)))
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

  /** End-to-end: documents → media table → batched decode → features.
    * Rows-only verification (the stubbed codec is not SQL-expressible).
    */
  def features(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(mediaTable(spark, dir))
      .select(col("doc_id"), col("n_bytes"),
        round(element_at(col("features"), 1), 4).as("f0"),
        round(element_at(col("features"), 2), 4).as("f1"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_features" -> features _,
  )

  /** No oracle — the decode stub is engine-side only; the driver records a
    * rows-only check for this entry.
    */
  def oracle: Map[String, String] = Map()
}
