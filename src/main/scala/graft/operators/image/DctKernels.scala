package graft.operators.image

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Quantized-integer DCT perceptual hashing over raw byte frames — the
  * real-kernel replacement for the md5 frame-hash stub
  * (reference operators/dedup/image_phash_dedup.py builds exactly this
  * DCT-median construction per image; here it runs per video frame).
  *
  * Why INTEGER-quantized: the classic pHash (32×32 float DCT →
  * [[ImageKernels.phash64]]) is the production path for decodable
  * image frames, but float cos/sum ordering differs across engines, so
  * a bit sitting at the median boundary could flip between Spark and
  * the DuckDB oracle. This kernel fixes the DCT basis to
  * `round_half_away(1e4 · cos(π/8 · (c+0.5) · k))` — a table of 64
  * integers BOTH engines share verbatim — and does everything after in
  * exact 64-bit integer arithmetic (|coef| ≤ 255·1e8·64 < 2^63), so
  * the hash is bit-reproducible anywhere.
  *
  * Robustness properties (what makes it a REAL perceptual hash, where
  * the md5 stub broke on any single-byte change):
  *   - a small byte perturbation moves a few coefficients slightly →
  *     only bits whose coefficient sits near the median flip →
  *     hamming distance 0–3, caught by banded-hamming matching;
  *   - a UNIFORM brightness shift (every byte +δ) is EXACTLY
  *     invariant: for (u,k) ≠ (0,0), Δcoef = δ·S(u)·S(k) with
  *     S(k) = Σ_c Q(c)(k) = 0 for every k ≥ 1 (the quantized cosine
  *     columns cancel in magnitude-paired exact integers), and the DC
  *     term only grows — its rank and therefore the median are
  *     unchanged, so the hash is IDENTICAL. The spec plants exactly
  *     this re-encode family.
  *
  * Sizing: `nbits = 16` (low 4×4 coefficient block incl. DC, median
  * threshold) keeps the SQL oracle replay compact — use it at
  * key/test scale only, since a 16-bit space saturates rep buckets at
  * corpus scale. `nbits = 60` (8×8 block minus DC, first 60 coefs) is
  * the scale configuration: same kernel, hash space big enough that
  * banded rep-join buckets stay sparse at 1M+ videos. */
object DctKernels extends Serializable {

  /** Q(c)(k) = round-half-away(1e4·cos(π/8·(c+0.5)·k)) — the shared
    * 8-point DCT-II basis. Magnitude-paired rounding keeps the exact
    * antisymmetry the brightness-invariance proof needs. */
  val Q: Array[Array[Long]] = Array.tabulate(8, 8) { (c, k) =>
    val x = math.cos(math.Pi / 8.0 * (c + 0.5) * k) * 10000.0
    if (x >= 0) math.round(x) else -math.round(-x)
  }

  /** The 2D coefficient grid D(u)(k) of an 8×8 row-major pixel block
    * (bytes unsigned, zero-padded to 64). */
  private def dct2(px: Array[Long]): Array[Array[Long]] = {
    // pass 1: rows — R(r)(k) = Σ_c px(r·8+c) · Q(c)(k)
    val r1 = Array.ofDim[Long](8, 8)
    var r = 0
    while (r < 8) {
      var k = 0
      while (k < 8) {
        var s = 0L
        var c = 0
        while (c < 8) { s += px(r * 8 + c) * Q(c)(k); c += 1 }
        r1(r)(k) = s
        k += 1
      }
      r += 1
    }
    // pass 2: columns — D(u)(k) = Σ_r R(r)(k) · Q(r)(u)
    val d = Array.ofDim[Long](8, 8)
    var u = 0
    while (u < 8) {
      var k = 0
      while (k < 8) {
        var s = 0L
        var rr = 0
        while (rr < 8) { s += r1(rr)(k) * Q(rr)(u); rr += 1 }
        d(u)(k) = s
        k += 1
      }
      u += 1
    }
    d
  }

  /** Coefficient selection per nbits (flattened (u, k) order). */
  private[image] def selectCoefs(d: Array[Array[Long]], nbits: Int): Array[Long] =
    nbits match {
      case 16 => // low 4×4 block including DC, order u*4+k
        (for (u <- 0 until 4; k <- 0 until 4) yield d(u)(k)).toArray
      case 60 => // full 8×8 minus DC, first 60 of the remaining 63
        (for (u <- 0 until 8; k <- 0 until 8; if u + k > 0)
          yield d(u)(k)).take(60).toArray
      case n => throw new IllegalArgumentException(
        s"dctPhash supports nbits 16 or 60, got $n")
    }

  /** nbits-bit DCT perceptual hash of a raw byte frame; None for
    * null/empty frames (no-signature rows pass through dedup kept, the
    * family convention). Bit i = (2·coef_i > sorted(mid-1)+sorted(mid))
    * — doubled to keep the median average in integers. */
  def dctPhash(bytes: Array[Byte], nbits: Int): Option[Long] =
    if (bytes == null || bytes.isEmpty) None
    else {
      val px = new Array[Long](64)
      var j = 0
      while (j < math.min(64, bytes.length)) { px(j) = bytes(j) & 0xffL; j += 1 }
      val coefs = selectCoefs(dct2(px), nbits)
      val sorted = coefs.sorted
      val m2 = sorted(nbits / 2 - 1) + sorted(nbits / 2)
      var acc = 0L
      var i = 0
      while (i < nbits) {
        if (2 * coefs(i) > m2) acc |= 1L << i
        i += 1
      }
      Some(acc)
    }

  private val dctPhash16Udf = udf((b: Array[Byte]) => dctPhash(b, 16))
  private val dctPhash60Udf = udf((b: Array[Byte]) => dctPhash(b, 60))

  def framePhash(frame: Column, nbits: Int): Column = nbits match {
    case 16 => dctPhash16Udf(frame)
    case 60 => dctPhash60Udf(frame)
    case n => throw new IllegalArgumentException(
      s"dctPhash supports nbits 16 or 60, got $n")
  }

  /** W(u·4+k)(j) = Q(r)(u)·Q(c)(k) with j = r·8+c — the flattened
    * per-coefficient weight rows the SQL oracle embeds as literals. */
  def weights16: Seq[Seq[Long]] =
    for (u <- 0 until 4; k <- 0 until 4)
      yield for (r <- 0 until 8; c <- 0 until 8) yield Q(r)(u) * Q(c)(k)
}
