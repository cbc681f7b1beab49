package graft.operators.image

import java.awt.image.BufferedImage
import javax.imageio.ImageIO
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** REAL image kernels on the JDK's built-in codecs (javax.imageio reads
  * PNG/JPEG/BMP/GIF with no external dependency) — the production path
  * for binary image columns, complementing the deterministic stubs used
  * by the oracle queries (the synthetic test corpus has no real image
  * bytes; these kernels are spec-tested on images generated in-memory).
  *
  * Execution shape: plain JVM functions exposed as UDFs. Pixel decode
  * can't be expressed as a Catalyst expression anyway, and a scalar UDF
  * over a binary column is exactly how Spark runs per-record native
  * kernels (same shape the reference uses for its Rust calls:
  * src/lib.rs image ops). Decode cost dominates, not the UDF bridge.
  */
object ImageKernels extends Serializable {

  /** (width, height) from the image header — readers report dimensions
    * without decoding pixel data, so this is cheap even on large files. */
  def dims(bytes: Array[Byte]): Option[(Int, Int)] =
    if (bytes == null || bytes.length == 0) None
    else {
      val iis = ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            Some((r.getWidth(0), r.getHeight(0)))
          } finally r.dispose()
        }
      } catch { case _: Exception => None } finally iis.close()
    }

  private def decode(bytes: Array[Byte]): Option[BufferedImage] =
    if (bytes == null || bytes.length == 0) None
    else
      try Option(ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      catch { case _: Exception => None }

  /** n×n grayscale downsample (area-average via Graphics2D bilinear). */
  private def gray(img: BufferedImage, n: Int): Array[Double] = {
    val small = new BufferedImage(n, n, BufferedImage.TYPE_BYTE_GRAY)
    val g = small.createGraphics()
    g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g.drawImage(img, 0, 0, n, n, null)
    g.dispose()
    val out = new Array[Double](n * n)
    val raster = small.getRaster
    var i = 0
    while (i < n * n) { out(i) = raster.getSample(i % n, i / n, 0).toDouble; i += 1 }
    out
  }

  /** 64-bit perceptual hash: 32×32 grayscale → 2D DCT-II → low-frequency
    * 8×8 block (DC dropped) → bits = coefficient > median. The standard
    * pHash construction; hamming distance on the result is robust to
    * resize/recompress/small edits. */
  def phash64(bytes: Array[Byte]): Option[Long] = decode(bytes).map { img =>
    val n = 32
    val px = gray(img, n)
    // 2D DCT-II via two 1D passes
    def dct1(in: Array[Double], stride: Int, offset: Int, len: Int): Array[Double] = {
      val out = new Array[Double](len)
      var k = 0
      while (k < len) {
        var s = 0.0
        var i = 0
        while (i < len) {
          s += in(offset + i * stride) * math.cos(math.Pi / len * (i + 0.5) * k)
          i += 1
        }
        out(k) = s
        k += 1
      }
      out
    }
    val rows = Array.tabulate(n)(r => dct1(px, 1, r * n, n))
    val colMajor = new Array[Double](n * n)
    for (r <- 0 until n; c <- 0 until n) colMajor(c * n + r) = rows(r)(c)
    val dct = Array.tabulate(n)(c => dct1(colMajor, 1, c * n, n))
    // low-frequency 8x8 block; the median threshold makes the DC term's
    // magnitude irrelevant
    val coefs = (for (u <- 0 until 8; v <- 0 until 8) yield dct(v)(u)).toArray
    val sorted = coefs.sorted
    val median = (sorted(31) + sorted(32)) / 2.0
    coefs.zipWithIndex.foldLeft(0L) { case (acc, (c, i)) =>
      if (c > median) acc | (1L << i) else acc
    }
  }

  /** Shannon entropy (bits) of the 256-bin luminance histogram of the
    * decoded pixels — the real analogue of the stub ByteEntropy. */
  def pixelEntropy(bytes: Array[Byte]): Option[Double] = decode(bytes).map { img =>
    val hist = new Array[Long](256)
    val w = img.getWidth
    val h = img.getHeight
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
        hist(lum) += 1
        x += 1
      }
      y += 1
    }
    val total = w.toLong * h
    hist.filter(_ > 0).map { c =>
      val p = c.toDouble / total
      -p * math.log(p) / math.log(2.0)
    }.sum
  }

  /** JPEG blockiness: mean luminance step across sampled 8×8 block
    * boundaries, normalized to [0, 1]. Arithmetic parity with the
    * reference kernel `detect_compression_artifacts_from_rgb`
    * (src/image_ops.rs:51-124) GIVEN identical decoded RGB: integer
    * `(r+g+b)/3` gray, per-boundary mean `|Δgray|` with integer
    * division by the row/column length, at most 64 sampled boundaries
    * per axis starting at 0 (the reference samples `i*8` for `i = 0..`,
    * so the image edge row is included), and the final vertical/
    * horizontal averages each divided by 255 then averaged. Caveats:
    * the DECODERS differ (ImageIO here vs the Rust `image` crate's
    * JPEG/IDCT there), so scores on real lossy-compressed inputs can
    * diverge by whatever the decoded pixels diverge; and the reference
    * accumulates `w*h*3` in u32 (overflows past ~1.4 gigapixel) where
    * this uses Long — identical below that size. */
  def blockiness(bytes: Array[Byte]): Option[Double] = decode(bytes).map(blockinessOf)

  private def blockinessOf(img: BufferedImage): Double = {
    val w = img.getWidth
    val h = img.getHeight
    val block = 8
    val maxSamples = 64
    def grayAt(x: Int, y: Int): Int = {
      val rgb = img.getRGB(x, y)
      (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
    }
    val hBlocks = math.min(math.max(h - 1, 0) / block, maxSamples)
    val wBlocks = math.min(math.max(w - 1, 0) / block, maxSamples)
    var vSum = 0L
    var vCount = 0
    var i = 0
    while (i < hBlocks) {
      val y = i * block
      if (y + 1 < h) {
        var sum = 0L
        var x = 0
        while (x < w) { sum += math.abs(grayAt(x, y) - grayAt(x, y + 1)); x += 1 }
        vSum += sum / w
        vCount += 1
      }
      i += 1
    }
    var hSum = 0L
    var hCount = 0
    var j = 0
    while (j < wBlocks) {
      val x = j * block
      if (x + 1 < w) {
        var sum = 0L
        var y = 0
        while (y < h) { sum += math.abs(grayAt(x, y) - grayAt(x + 1, y)); y += 1 }
        hSum += sum / h
        hCount += 1
      }
      j += 1
    }
    if (vCount > 0 && hCount > 0)
      (vSum.toDouble / vCount / 255.0 + hSum.toDouble / hCount / 255.0) / 2.0
    else 0.0
  }

  /** Compression-artifact score on real decoded pixels:
    * `clamp(0.6·blockiness + 0.4·(1 − min(2·bytes/(3wh), 1)), 0, 1)` —
    * the reference's combined score (src/image_ops.rs:110-124). The
    * second term rewards aggressive compression (small file for its
    * pixel count ⇒ more artifacts expected). */
  def artifactScore(bytes: Array[Byte]): Option[Double] = decode(bytes).map { img =>
    val uncompressed = img.getWidth.toLong * img.getHeight * 3L
    val ratio = if (uncompressed > 0) bytes.length.toDouble / uncompressed else 1.0
    val compressionScore = 1.0 - math.min(ratio * 2.0, 1.0)
    math.max(0.0, math.min(1.0, blockinessOf(img) * 0.6 + compressionScore * 0.4))
  }

  // ---- Column API (UDF bridge) ----

  private val dimsUdf = udf((b: Array[Byte]) => dims(b))
  private val phashUdf = udf((b: Array[Byte]) => phash64(b))
  private val entropyUdf = udf((b: Array[Byte]) => pixelEntropy(b))
  private val blockinessUdf = udf((b: Array[Byte]) => blockiness(b))
  private val artifactUdf = udf((b: Array[Byte]) => artifactScore(b))

  /** struct(width, height) or null for undecodable bytes. */
  def realDims(image: Column): Column = dimsUdf(image)
  def realPhash(image: Column): Column = phashUdf(image)
  def realEntropy(image: Column): Column = entropyUdf(image)
  def realBlockiness(image: Column): Column = blockinessUdf(image)
  def realArtifactScore(image: Column): Column = artifactUdf(image)

  /** Metadata refiner over real image bytes. */
  def withRealMetadata(df: DataFrame, imageCol: String = "image"): DataFrame =
    df.withColumn("__d", realDims(col(imageCol)))
      .withColumn("width", col("__d._1"))
      .withColumn("height", col("__d._2"))
      .drop("__d")

  /** Keep-first dedup on the real perceptual hash. */
  def phashDedup(df: DataFrame, imageCol: String = "image",
      idCol: String = "doc_id"): DataFrame =
    graft.operators.dedup.KeepFirst(df, realPhash(col(imageCol)), idCol)
}
