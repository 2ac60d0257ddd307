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
