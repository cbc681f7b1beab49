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

  /** JPEG at an explicit quality setting (ImageIO.write's default is
    * high quality, which leaves no visible blocks). */
  private def jpeg(w: Int, h: Int, quality: Float)(draw: java.awt.Graphics2D => Unit): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    draw(g)
    g.dispose()
    val writer = ImageIO.getImageWritersByFormatName("jpg").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    writer.dispose()
    ios.close()
    bos.toByteArray
  }

  test("blockiness matches the reference arithmetic on a constructed two-band image") {
    // The reference samples the pixel pair (i·8, i·8+1) per axis — the
    // rows just BELOW each block boundary, not across it — so the test
    // band edge sits between rows 8 and 9 where the kernel looks.
    // 24×24, rows 0–8 gray 100, rows 9–23 gray 148. Sampled vertical
    // pairs (h=24 → 2): y=0 (rows 0,1: |100−100|=0) and y=8 (rows 8,9:
    // |100−148|=48 at every x → integer per-pair mean 48). Horizontal
    // pairs x=0, x=8 cross identical columns → 0. Expected:
    // ((0+48)/2/255 + 0) / 2 = 48/1020.
    val bytes = render(24, 24, "png") { g =>
      g.setColor(new java.awt.Color(100, 100, 100)); g.fillRect(0, 0, 24, 9)
      g.setColor(new java.awt.Color(148, 148, 148)); g.fillRect(0, 9, 24, 15)
    }
    assert(math.abs(ImageKernels.blockiness(bytes).get - 48.0 / 1020.0) < 1e-12)
    // full artifact formula on the same image: 0.6·blockiness +
    // 0.4·(1 − min(2·len/(3wh), 1)), clamped
    val expected = math.min(1.0, 0.6 * (48.0 / 1020.0) +
      0.4 * (1.0 - math.min(2.0 * bytes.length / (24.0 * 24 * 3), 1.0)))
    assert(math.abs(ImageKernels.artifactScore(bytes).get - expected) < 1e-12)
  }

  test("blockiness keys on the sampled 8-aligned pairs; flat image scores 0; JPEG decodes") {
    // band steps landing ON the sampled pairs (edges at y ≡ 8k, between
    // rows 8k and 8k+1) score high; the same bands shifted by 4 rows
    // put every step between unsampled rows → 0. This is exactly the
    // reference's sensitivity profile (JPEG block artifacts are
    // 8-aligned; content edges usually aren't).
    def bands(offset: Int): Array[Byte] = render(48, 48, "png") { g =>
      for (y <- 0 until 48) {
        val band = (y + 48 - offset) / 8 // band index, edges at y ≡ offset (mod 8)
        val v = if (band % 2 == 0) 60 else 200
        g.setColor(new java.awt.Color(v, v, v)); g.fillRect(0, y, 48, 1)
      }
    }
    val aligned = ImageKernels.blockiness(bands(1)).get   // steps at rows 8k|8k+1
    val misaligned = ImageKernels.blockiness(bands(5)).get // steps at rows 8k+4|8k+5
    assert(aligned > 0.05 && misaligned == 0.0,
      s"aligned $aligned should dwarf misaligned $misaligned")
    val flat = render(32, 32, "png") { g =>
      g.setColor(java.awt.Color.GRAY); g.fillRect(0, 0, 32, 32)
    }
    assert(ImageKernels.blockiness(flat).get === 0.0)
    // real JPEG bytes decode through the same kernel and stay in range
    val crushed = jpeg(96, 96, 0.05f) { g =>
      val rnd = new scala.util.Random(7)
      for (bx <- 0 until 12; by <- 0 until 12) {
        g.setColor(new java.awt.Color(rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256)))
        g.fillRect(bx * 8, by * 8, 8, 8)
      }
    }
    val a = ImageKernels.artifactScore(crushed).get
    assert(a >= 0.0 && a <= 1.0)
    assert(ImageKernels.blockiness(crushed).get >= 0.0)
  }

  test("config-built real technical-quality refiner emits the reference's columns") {
    val yaml =
      """operators:
        |  - name: image_real_technical_quality_refiner
        |""".stripMargin
    val pipeline = graft.pipeline.PipelineConfig.parse(yaml)
    val a = render(48, 48, "png")(gradient(1))
    val b = jpeg(96, 96, 0.05f)(gradient(2))
    val out = pipeline(Seq((1L, a), (2L, b)).toDF("doc_id", "image"))
      .select("doc_id", "image_information_entropy", "image_blockiness",
        "image_compression_artifacts")
      .as[(Long, Double, Double, Double)].collect().sortBy(_._1)
    assert(out(0)._2 === ImageKernels.pixelEntropy(a).get)
    assert(out(0)._3 === ImageKernels.blockiness(a).get)
    assert(out(0)._4 === ImageKernels.artifactScore(a).get)
    assert(out(1)._3 === ImageKernels.blockiness(b).get)
    assert(out(1)._4 === ImageKernels.artifactScore(b).get)
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
