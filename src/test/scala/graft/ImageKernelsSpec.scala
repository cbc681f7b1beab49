package graft

import graft.operators.image.ImageKernels
import java.awt.image.BufferedImage
import javax.imageio.ImageIO

/** Real-codec kernels tested on images generated in-memory (the JDK
  * writes PNG/JPEG/BMP too, so no fixtures or external libs needed). */
class ImageKernelsSpec extends SparkSpec {
  import spark.implicits._

  private def render(w: Int, h: Int, fmt: String)(draw: java.awt.Graphics2D => Unit): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    draw(g)
    g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  /** Block-structured test image: random 8×8 tiles give the DCT real
    * low-frequency content (a smooth gradient leaves most coefficients
    * ≈0, making the median threshold numeric noise — not a realistic
    * phash input). */
  private def gradient(seed: Int): java.awt.Graphics2D => Unit = g => {
    val rnd = new scala.util.Random(seed)
    for (bx <- 0 until 8; by <- 0 until 6) {
      g.setColor(new java.awt.Color(rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256)))
      g.fillRect(bx * 8, by * 8, 8, 8)
    }
  }

  test("dims reads width/height from real PNG/JPEG/BMP headers") {
    for (fmt <- Seq("png", "jpg", "bmp")) {
      val bytes = render(64, 48, fmt)(gradient(0))
      assert(ImageKernels.dims(bytes) === Some((64, 48)), fmt)
    }
    assert(ImageKernels.dims("not an image".getBytes) === None)
    assert(ImageKernels.dims(Array.emptyByteArray) === None)
  }

  test("phash: identical content matches across formats, edits stay near, distinct images far") {
    val png = ImageKernels.phash64(render(64, 48, "png")(gradient(0))).get
    val bmp = ImageKernels.phash64(render(64, 48, "bmp")(gradient(0))).get
    val edited = ImageKernels.phash64(render(64, 48, "png") { g =>
      gradient(0)(g); g.setColor(java.awt.Color.WHITE); g.fillRect(0, 0, 4, 4)
    }).get
    val different = ImageKernels.phash64(render(64, 48, "png") { g =>
      g.setColor(java.awt.Color.BLACK); g.fillRect(0, 0, 64, 48)
      g.setColor(java.awt.Color.WHITE); g.fillRect(10, 10, 20, 20)
    }).get
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(png, bmp) == 0)        // lossless formats → identical pixels
    assert(ham(png, edited) <= 12)    // small edit → small distance
    assert(ham(png, different) > 16)  // different content → far
  }

  test("pixel entropy: flat image 0, gradient high") {
    val flat = render(32, 32, "png") { g =>
      g.setColor(java.awt.Color.GRAY); g.fillRect(0, 0, 32, 32)
    }
    val busy = render(64, 48, "png")(gradient(3))
    assert(ImageKernels.pixelEntropy(flat).get === 0.0)
    assert(ImageKernels.pixelEntropy(busy).get > 4.0)
  }

  test("kernels run distributed over a binary column; phash dedup keeps firsts") {
    val a = render(40, 30, "png")(gradient(0))
    val b = render(40, 30, "bmp")(gradient(0)) // same pixels, different container
    val c = render(40, 30, "png") { g =>
      g.setColor(java.awt.Color.RED); g.fillRect(0, 0, 40, 30)
    }
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "image")
    val meta = ImageKernels.withRealMetadata(df)
      .select("doc_id", "width", "height").as[(Long, Int, Int)].collect().toSet
    assert(meta === Set((1L, 40, 30), (2L, 40, 30), (3L, 40, 30)))
    val kept = ImageKernels.phashDedup(df).select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 3L)) // b collapses onto a
  }
}
