package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("box resize halves dimensions and conserves channel mass up to floor error") {
    val orig = Multimodal.pngMediaTable(spark, TestSpark.sf).filter(_.doc_id < 20L)
    val pairs = orig.mapPartitions { batch =>
      batch.map { m =>
        val o = Multimodal.decodePng(m)
        val r = Multimodal.decodePng(Multimodal.resizeBox2x(m))
        (o, r)
      }
    }.collect()
    assert(pairs.length == 20)
    pairs.foreach { case (o, r) =>
      assert(r.img_w == o.img_w / 2 && r.img_h == o.img_h / 2)
      // each output pixel is floor(mean of 4): 4·resized ≤ original and the
      // floor loses at most 3 per output pixel per channel
      val maxLoss = 3L * r.img_w * r.img_h
      for ((so, sr) <- Seq((o.sum_r, r.sum_r), (o.sum_g, r.sum_g), (o.sum_b, r.sum_b))) {
        assert(4 * sr <= so && so <= 4 * sr + maxLoss,
          s"doc ${o.doc_id}: original $so vs 4×resized ${4 * sr}")
      }
    }
  }

  test("media table carries binary payloads with typed metadata") {
    val m = Multimodal.mediaTable(spark, TestSpark.sf)
    val first = m.filter(_.doc_id == 0L).head()
    assert(first.media.nonEmpty && first.fmt == "fake/raw"
      && first.width >= 1 && first.height >= 1)
    assert(m.count() == 500)
  }

  test("frame sampling: every-Nth fixed-size chunks, deterministic checksums") {
    val media = Multimodal.mediaTable(spark, TestSpark.sf)
    val frames = Multimodal.sampleFrames(media, frameSize = 64, every = 2).collect()
    assert(frames.nonEmpty)
    frames.foreach { f =>
      assert(f.frame_idx % 2 == 0 && f.offset == f.frame_idx * 64L && f.frame_bytes <= 64)
    }
    // doc 0's text is known: checksum of its first 64 utf8 bytes
    val m0 = media.filter(_.doc_id == 0L).head()
    val expected = m0.media.take(64).map(b => (b & 0xff).toLong).sum
    val f0 = frames.filter(f => f.doc_id == 0L && f.frame_idx == 0).head
    assert(f0.checksum == expected)
  }

  test("PNG pipeline: ImageIO round-trip reproduces the pixel formula exactly") {
    val stats = Multimodal.pixelStats(spark, TestSpark.sf)
      .as[Multimodal.PixelStats].collect()
    assert(stats.length == 500)
    stats.foreach { s =>
      assert(s.img_w == Multimodal.ImgW && s.img_h == Multimodal.ImgH)
      val coords = for { y <- 0 until Multimodal.ImgH; x <- 0 until Multimodal.ImgW } yield (x, y)
      assert(s.sum_r == coords.map { case (x, y) => Multimodal.pixelR(s.doc_id, x, y).toLong }.sum)
      assert(s.sum_g == coords.map { case (x, y) => Multimodal.pixelG(s.doc_id, x, y).toLong }.sum)
      assert(s.sum_b == coords.map { case (x, y) => Multimodal.pixelB(s.doc_id, x, y).toLong }.sum)
    }
  }

  test("PNG payloads are real decodable images") {
    val m = Multimodal.pngMediaTable(spark, TestSpark.sf).filter(_.doc_id == 3L).head()
    assert(m.fmt == "image/png")
    // PNG magic bytes
    assert((m.media(0) & 0xff) == 0x89 && m.media(1) == 'P' && m.media(2) == 'N' && m.media(3) == 'G')
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.media))
    assert(img.getWidth == Multimodal.ImgW && img.getHeight == Multimodal.ImgH)
    assert(((img.getRGB(5, 9) >> 16) & 0xff) == Multimodal.pixelR(3L, 5, 9))
  }

  test("WAV pipeline: AudioSystem round-trip reproduces the PCM formula exactly") {
    val stats = Multimodal.audioStats(spark, TestSpark.sf)
      .as[Multimodal.AudioStats].collect()
    assert(stats.length == 500)
    stats.foreach { s =>
      assert(s.n_samples == Multimodal.WavSamples)
      val samples = (0 until Multimodal.WavSamples).map(i => Multimodal.pcmSample(s.doc_id, i))
      assert(s.sum_amp == samples.map(_.toLong).sum)
      assert(s.sum_abs == samples.map(v => math.abs(v).toLong).sum)
      assert(s.max_abs == samples.map(v => math.abs(v).toLong).max)
    }
  }

  test("WAV payloads are real RIFF/WAVE files") {
    val m = Multimodal.wavMediaTable(spark, TestSpark.sf).filter(_.doc_id == 3L).head()
    assert(m.fmt == "audio/wav")
    // RIFF....WAVE magic
    assert(new String(m.media.take(4)) == "RIFF" && new String(m.media.slice(8, 12)) == "WAVE")
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(m.media))
    assert(ais.getFormat.getSampleSizeInBits == 16 && ais.getFormat.getChannels == 1)
    assert(ais.getFrameLength == Multimodal.WavSamples.toLong)
  }

  test("pixel features survive repartitioning (map-side, shuffle-free semantics)") {
    // the REAL codec path must be layout-invariant too: decode happens
    // per record inside whatever partition holds it, so a different
    // partitioning yields identical per-document stats
    def statsOf(ds: org.apache.spark.sql.Dataset[Multimodal.Media]) =
      ds.mapPartitions(_.map(Multimodal.decodePng))
        .collect().map(s => s.doc_id -> ((s.sum_r, s.sum_g, s.sum_b))).toMap
    val base = statsOf(Multimodal.pngMediaTable(spark, TestSpark.sf))
    val rep = statsOf(Multimodal.pngMediaTable(spark, TestSpark.sf).repartition(7))
    assert(base == rep)
  }
}
