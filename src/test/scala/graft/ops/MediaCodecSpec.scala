package graft.ops

import java.awt.image.BufferedImage
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The real (javax.imageio) media decode path: actual PNG/JPEG bytes are
  * decoded, scaled, re-encoded — and undecodable payloads fall back to the
  * deterministic stub, so a mixed corpus flows end-to-end.
  */
class MediaCodecSpec extends AnyFunSuite with BeforeAndAfterAll {
  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-media-codec-test")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** A real encoded image: a gradient so resampling has structure. */
  private def realImageBytes(w: Int, h: Int, format: String): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 255 / w) << 16) | ((y * 255 / h) << 8) | 0x40)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  private def media(rows: (Long, String, Array[Byte], Int, Int)*) = {
    val s = spark; import s.implicits._
    spark.createDataset(rows.map { case (id, kind, payload, w, h) =>
      MediaOps.MediaFile(id * 10 + 1, id, kind,
        if (kind == "image") "png" else "mp4", w, h,
        if (kind == "image") 0L else 2000L, payload,
        new Timestamp(1700000000000L + id))
    })
  }

  test("codec probe: JDK imageio is present and decodes what it encodes") {
    assert(MediaOps.codecAvailable)
    val png = realImageBytes(20, 12, "png")
    val img = MediaOps.decodeImage(png)
    assert(img.exists(i => i.getWidth == 20 && i.getHeight == 12))
    // junk bytes decode to None, not an exception
    assert(MediaOps.decodeImage("not an image".getBytes("UTF-8")).isEmpty)
    assert(MediaOps.decodeImage(Array.emptyByteArray).isEmpty)
  }

  test("codec resize really decodes and rescales: output is a valid PNG at target dims") {
    val src = media((0L, "image", realImageBytes(40, 30, "png"), 40, 30),
      (3L, "image", realImageBytes(16, 16, "jpg"), 16, 16))
    val out = MediaOps.resizeImagesCodec(src, 8, 8).collect().sortBy(_.media_id)
    out.foreach { m =>
      assert(m.width == 8 && m.height == 8)
      val back = MediaOps.decodeImage(m.payload)
      assert(back.exists(i => i.getWidth == 8 && i.getHeight == 8),
        s"resized payload of ${m.media_id} is not a decodable 8x8 image")
    }
    // bilinear downscale of a gradient preserves ordering along the axis
    val px = MediaOps.decodeImage(out.head.payload).get
    val leftRed = (px.getRGB(0, 4) >> 16) & 0xff
    val rightRed = (px.getRGB(7, 4) >> 16) & 0xff
    assert(leftRed < rightRed, s"gradient lost: $leftRed !< $rightRed")
  }

  test("undecodable payloads fall back to the stub row; non-images pass through") {
    val junk = "definitely not pixels but long enough to sample".getBytes("UTF-8")
    val src = media((0L, "image", junk, 64, 64), (2L, "video", junk, 0, 0))
    val codec = MediaOps.resizeImagesCodec(src, 16, 16).collect().sortBy(_.media_id)
    val stub = MediaOps.resizeImages(src, 16, 16).collect().sortBy(_.media_id)
    codec.zip(stub).foreach { case (c, s) =>
      assert(c.width == s.width && c.height == s.height)
      assert(c.payload.sameElements(s.payload), s"fallback diverged for ${c.media_id}")
    }
    assert(codec.find(_.kind == "video").get.payload.sameElements(junk))
  }

  test("null payload (failed download) is in-domain on every path: no NPE, zero features") {
    val src = media((0L, "image", null, 64, 64), (1L, "video", null, 0, 0))
    // codec features: null payload -> empty features, n_bytes 0 (the same
    // contract the stub resize has for failed downloads)
    val feats = MediaOps.extractFeaturesCodec(src, dims = 8).collect().sortBy(_.media_id)
    feats.foreach { f =>
      assert(f.n_bytes == 0, s"media ${f.media_id}")
      assert(f.features.forall(_ == 0.0f), s"media ${f.media_id}")
    }
    // stub features and both resize paths agree: pass through, no throw
    val stubFeats = MediaOps.extractFeatures(src, dims = 8).collect().sortBy(_.media_id)
    feats.zip(stubFeats).foreach { case (c, s) =>
      assert(c.n_bytes == s.n_bytes && c.sha_lo == s.sha_lo)
    }
    assert(MediaOps.resizeImagesCodec(src, 8, 8).collect().forall(_.payload == null))
    assert(MediaOps.resizeImages(src, 8, 8).collect().forall(_.payload == null))
  }

  /** A real WAV container: 16-bit signed PCM mono sine at `freqHz`. */
  private def realWavBytes(freqHz: Double, seconds: Double, rate: Float = 8000f,
                           amplitude: Double = 0.5): Array[Byte] = {
    import javax.sound.sampled._
    val n = (seconds * rate).toInt
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s = (math.sin(2 * math.Pi * freqHz * i / rate) * amplitude * 32767).toInt
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, rate, 16, 1, 2, rate, false)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("audio codec probe: JDK javax.sound.sampled decodes a real WAV with exact sample count") {
    assert(MediaOps.audioCodecAvailable)
    val rate = 8000f
    val clip = MediaOps.decodeAudio(realWavBytes(440.0, seconds = 0.5, rate = rate))
    assert(clip.isDefined, "synthesized WAV did not decode")
    // exact round-trip: 0.5 s at 8 kHz = 4000 mono samples at the same rate
    assert(clip.get.samples.length == 4000, s"got ${clip.get.samples.length} samples")
    assert(clip.get.sampleRate == rate)
    // samples are real sine values in [-1, 1] peaking near the amplitude
    val peak = clip.get.samples.map(math.abs).max
    assert(peak > 0.45f && peak <= 0.51f, s"peak $peak")
    // junk bytes decode to None, not an exception
    assert(MediaOps.decodeAudio("not audio at all".getBytes("UTF-8")).isEmpty)
    assert(MediaOps.decodeAudio(Array.emptyByteArray).isEmpty)
    // a VALID WAV with an empty data chunk decodes to zero samples and
    // keeps the frames >= 1 invariant (no downstream divide-by-zero)
    val emptyClip = MediaOps.decodeAudio(realWavBytes(440.0, seconds = 0.0, rate = rate))
    assert(emptyClip.exists(_.samples.isEmpty))
    val (feats, frames) = MediaOps.audioFeatures(emptyClip.get, dims = 8)
    assert(frames == 1 && feats.forall(_ == 0.0f))
  }

  test("audio features: per-window RMS matches the sine's a/sqrt(2), ZCR tracks frequency") {
    val rate = 8000f
    val freq = 400.0
    val wav = realWavBytes(freq, seconds = 1.0, rate = rate, amplitude = 0.5)
    val s = spark; import s.implicits._
    val src = spark.createDataset(Seq(MediaOps.MediaFile(
      11L, 1L, "audio", "wav", 0, 0, 1000L, wav,
      new java.sql.Timestamp(1700000000000L))))
    val f = MediaOps.extractFeaturesCodec(src, dims = 8).collect().head
    // 4 windows of (rms, zcr): sine RMS = a/sqrt(2) ~= 0.354; each window
    // sees the same stationary signal
    assert(f.frames == 4, s"frames ${f.frames}")
    for (w <- 0 until 4) {
      val rms = f.features(2 * w)
      assert(math.abs(rms - 0.5 / math.sqrt(2)) < 0.02, s"window $w rms $rms")
      // a 400 Hz sine crosses zero 2*400 times/s -> zcr ~= 800/8000 = 0.1
      val zcr = f.features(2 * w + 1)
      assert(math.abs(zcr - 2 * freq / rate) < 0.02, s"window $w zcr $zcr")
    }
    // the stub path is untouched: undecodable "audio" rows keep the stub's
    // deterministic fake features and duration-derived frame count
    val junk = spark.createDataset(Seq(MediaOps.MediaFile(
      12L, 2L, "audio", "wav", 0, 0, 2000L, "junk bytes".getBytes("UTF-8"),
      new java.sql.Timestamp(1700000000000L))))
    val g = MediaOps.extractFeaturesCodec(junk, dims = 8).collect().head
    assert(g.frames == 4) // 2000 ms / 500
    assert(g.features.toSeq == MediaOps.fakeDecode("junk bytes".getBytes("UTF-8"), 8).toSeq)
  }

  test("codec features: per-cell RGB means reflect real pixel content; deterministic") {
    // left half black, right half white -> first-row cells dark to bright
    val w = 32; val h = 32
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val src = media((0L, "image", bos.toByteArray, w, h))
    val f1 = MediaOps.extractFeaturesCodec(src, dims = 12).collect().head
    val f2 = MediaOps.extractFeaturesCodec(src, dims = 12).collect().head
    assert(f1.features.toSeq == f2.features.toSeq)
    // grid = 2x2, 3 channels: cells 0-2 = top-left (dark), 3-5 = top-right
    assert(f1.features(0) < 0.3f, s"left cell should be dark: ${f1.features.toSeq}")
    assert(f1.features(3) > 0.7f, s"right cell should be bright: ${f1.features.toSeq}")
  }
}
