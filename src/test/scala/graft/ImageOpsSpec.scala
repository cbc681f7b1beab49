package graft

import graft.operators.image._
import org.apache.spark.sql.functions._

class ImageOpsSpec extends SparkSpec {
  import spark.implicits._

  val jpeg: Array[Byte] = Array(0xFF, 0xD8, 0xFF, 0xE0, 0x00, 0x10).map(_.toByte)
  val png: Array[Byte] = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
  val gif: Array[Byte] = "GIF89a".getBytes("UTF-8")
  val junk: Array[Byte] = "not an image".getBytes("UTF-8")

  test("ImageFormat.sniff detects real magic bytes") {
    val df = Seq(jpeg, png, gif, junk).toDF("image")
    val got = df.select(ImageFormat.sniff($"image")).as[String].collect().toSeq
    assert(got == Seq("JPEG", "PNG", "GIF", "UNKNOWN"))
  }

  test("ImageMetadata adds size/format/dims") {
    val df = Seq((1L, jpeg), (2L, junk)).toDF("doc_id", "image")
    val out = ImageMetadata()(df).collect().map(r =>
      r.getAs[Long]("doc_id") -> (r.getAs[Long]("image_file_size_bytes"),
        r.getAs[String]("image_format"), r.getAs[Int]("image_width"))).toMap
    assert(out(1L)._1 == 6L && out(1L)._2 == "JPEG")
    assert(out(2L)._1 == 12L && out(2L)._2 == "UNKNOWN")
    assert(out.values.forall(v => v._3 >= 1 && v._3 <= 4096))
  }

  test("entropy: uniform bytes > repeated bytes") {
    val df = Seq((1L, "aaaaaaaaaaaaaaaa".getBytes("UTF-8")),
      (2L, "abcdefghijklmnop".getBytes("UTF-8"))).toDF("doc_id", "image")
    val e = ImageTechnicalQuality().entropy(df)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(e(1L) == 0.0)
    assert(e(2L) == 4.0) // 16 distinct equiprobable bytes
  }

  test("ImagePhashDedup keeps first per identical content") {
    val df = Seq((1L, jpeg), (2L, jpeg), (3L, png)).toDF("doc_id", "image")
    val kept = ImagePhashDedup()(df).select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L))
  }

  test("refiners emit bounded stub scores") {
    val df = Seq((1L, jpeg)).toDF("doc_id", "image")
    val vd = VisualDegradations()(df).head()
    Seq("img_vd_color_cast", "img_vd_blurriness", "img_vd_watermark", "img_vd_noise")
      .foreach(c => { val v = vd.getAs[Double](c); assert(v >= 0 && v < 1) })
    val aa = AestheticAigc()(df).head()
    assert(aa.getAs[Double]("aesthetic_score") >= 0 && aa.getAs[Double]("aesthetic_score") < 10)
    val emb = ClipEmbeddingStub()(df).select($"clip_embedding").as[Seq[Double]].head()
    assert(emb.size == 8)
    assert(math.abs(emb.map(x => x * x).sum - 1.0) < 1e-9)
  }
}
