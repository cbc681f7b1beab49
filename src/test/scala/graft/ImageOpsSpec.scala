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

  test("PhashHammingDedup: keep-first within radius, planted distances") {
    // hashes chosen directly: 20 is 2 flips from 23 (bits 0,1), 3 flips
    // from 16 (bits 0,1,2); 1<<59 exercises the top band
    val rows = Seq(
      (1L, 20L),          // base — survives (smallest id overall)
      (2L, 20L),          // identical hash → drops to 1
      (3L, 23L),          // hamming(20,23)=2 ≤ r → drops to 1's group
      (4L, 16L),          // hamming(20,16)=... 20=10100, 16=10000 → 1 flip → drops
      (5L, (1L << 59) | (1L << 39) | (1L << 29) | (1L << 19) | (1L << 9)),
      // ^ ≥ 5 flips from every other row → survives
      (6L, (1L << 59) | (1L << 39) | (1L << 29) | (1L << 19) | (1L << 9) | 7L)
      // ^ 3 flips from 5 → OUTSIDE r=2 → survives
    ).toDF("doc_id", "phash")
    val got = PhashHammingDedup(radius = 2).flagged(rows)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> false, 4L -> false,
      5L -> true, 6L -> true))
  }

  test("PhashHammingDedup: banded candidates == brute force at r=2") {
    // derived corpus with planted near pairs at mixed distances
    val base = (0L until 120L).map(i =>
      (i, java.lang.Long.parseLong(
        graft.operators.vector.DeterministicPlanes.md5Hex(s"ph$i").substring(0, 15), 16)))
    val twins = base.map { case (i, h) =>
      val flips = (i % 4).toInt
      val mask = (0 until flips).map(j => 1L << (((i % 47) + 13 * j) % 60)).fold(0L)(_ | _)
      (i + 1000L, h ^ mask)
    }
    val df = (base ++ twins).toDF("doc_id", "phash")
    val keptBanded = PhashHammingDedup(radius = 2).flagged(df)
      .filter($"keep").select("doc_id").as[Long].collect().toSet
    // brute force keep-first
    val all = (base ++ twins).sortBy(_._1)
    val keptBrute = all.filter { case (id, h) =>
      !all.exists { case (id2, h2) =>
        id2 < id && java.lang.Long.bitCount(h ^ h2) <= 2 }
    }.map(_._1).toSet
    assert(keptBanded == keptBrute)
    // the planted distance-0/1/2 twins dropped, distance-3 twins kept
    assert(twins.filter(t => (t._1 - 1000L) % 4 == 3).forall(t => keptBanded(t._1)))
    assert(twins.filter(t => (t._1 - 1000L) % 4 != 3).forall(t => !keptBanded(t._1)))
  }

  test("PhashHammingDedup plan: equi-joins only, no cartesian") {
    val df = (0L until 50L).map(i => (i, i * 1315423911L)).toDF("doc_id", "phash")
    val plan = PhashHammingDedup().flagged(df).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("VideoFrameDedup: aligned-frame matching, splice tolerance, stop-frame cut") {
    def vid(s: String): Array[Byte] = (s * 40).getBytes("UTF-8")
    val a = vid("the quick brown fox jumps over the lazy dog ")
    // one byte spliced mid-stream: most sampled frames still align
    val b = a.clone(); b(41) = 'X'.toByte
    val c = vid("a completely different recording with other bytes ")
    val got = VideoFrameDedup().flagged(
      Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "video"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> true))

    // stop-frame cut: with maxFrameGroup=2, frames shared by ALL
    // videos are non-discriminative and generate no pairs
    val flood = (1L to 5L).map(i => (i, a)).toDF("doc_id", "video")
    assert(VideoFrameDedup(maxFrameGroup = 2).candidatePairs(flood).count() == 0)
    // ...but under the default cap the flood collapses to doc 1
    val keptFlood = VideoFrameDedup().flagged(flood)
      .filter($"keep").select("doc_id").as[Long].collect().toSet
    assert(keptFlood == Set(1L))

    val plan = VideoFrameDedup().flagged(
      Seq((1L, a)).toDF("doc_id", "video")).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("DctKernels: brightness invariance, perturbation locality, null safety") {
    val s = ("pack my box with five dozen liquor jugs " * 4).getBytes("UTF-8")
    // uniform +1 shift on every byte (the re-encode brightness family):
    // EXACT hash invariance — the quantized cosine columns cancel, so
    // only the DC coefficient moves and the median ranks are unchanged
    val shifted = s.map(b => (b + 1).toByte)
    assert(DctKernels.dctPhash(s, 16) == DctKernels.dctPhash(shifted, 16))
    assert(DctKernels.dctPhash(s, 60) == DctKernels.dctPhash(shifted, 60))
    // a single-byte edit moves the hash a FEW bits (only coefficients
    // near the median flip) — the md5 stub lost the whole frame
    val noisy = s.clone(); noisy(10) = 'X'.toByte
    val d = java.lang.Long.bitCount(
      DctKernels.dctPhash(s, 16).get ^ DctKernels.dctPhash(noisy, 16).get)
    assert(d >= 1 && d <= 4, s"one-byte edit moved $d bits")
    // unrelated content is far away
    val other = ("zzzz completely different recording bytes here " * 4)
      .getBytes("UTF-8")
    assert(java.lang.Long.bitCount(
      DctKernels.dctPhash(s, 16).get ^ DctKernels.dctPhash(other, 16).get) > 2)
    assert(DctKernels.dctPhash(null, 16).isEmpty)
    assert(DctKernels.dctPhash(Array.emptyByteArray, 60).isEmpty)
  }

  test("VideoFrameDedup: match counting is orientation-free (r13 ADVICE high)") {
    // regression: repPairs is canonicalized ha <= hb, and the old
    // id_a < id_b filter after the back join dropped every nonzero-
    // distance match where the smaller-ID video held the LARGER hash —
    // half the aligned matches of a real re-encode
    // aperiodic deterministic bytes (a repeated phrase collapses to 2
    // distinct frames and may land one orientation only)
    val a = Array.tabulate(1800)(j => (33 + (j * 131 + 7) % 90).toByte)
    val b = a.clone()
    // one-byte edit inside every sampled frame window (integer stride,
    // matching VideoOps.frameSample): each moves that frame's DCT hash
    // a few bits in a content-dependent direction
    val stride = math.max((a.length - 64) / 7, 1)
    (0 until 8).foreach(i => b(i * stride + 10) = ('A' + i).toByte)
    val d = VideoFrameDedup(minMatches = 1)
    def hashes(id: Long, v: Array[Byte]): Map[Int, Long] =
      d.frameHashes(Seq((id, v)).toDF("doc_id", "video"))
        .select($"frame_idx", $"frame_hash").as[(Int, Long)].collect().toMap
    val (fa, fb) = (hashes(1L, a), hashes(2L, b))
    val within = (0 until 8).filter(i =>
      java.lang.Long.bitCount(fa(i) ^ fb(i)) <= d.radius)
    // the planted corpus must exercise BOTH orientations among matched
    // frames, else this test proves nothing
    assert(within.exists(i => fa(i) < fb(i)) && within.exists(i => fa(i) > fb(i)),
      s"edits gave one orientation only: ${within.map(i => (fa(i), fb(i)))}")
    val pairs = d.candidatePairs(Seq((1L, a), (2L, b)).toDF("doc_id", "video"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs == Seq((1L, 2L, within.size.toLong)),
      s"expected all ${within.size} in-radius aligned frames counted, got $pairs")
  }

  test("VideoFrameDedup: brightness-shifted re-encode dedups at hamming 0") {
    def vid(s: String): Array[Byte] = (s * 40).getBytes("UTF-8")
    val a = vid("the quick brown fox jumps over the lazy dog ")
    val bright = a.map(b => (b + 1).toByte) // zero bytes in common with a
    val got = VideoFrameDedup().flagged(
      Seq((1L, a), (2L, bright)).toDF("doc_id", "video"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep"))
      .toMap
    assert(got == Map(1L -> true, 2L -> false))
  }
}
