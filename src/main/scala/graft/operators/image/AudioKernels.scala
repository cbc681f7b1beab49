package graft.operators.image

import javax.sound.sampled.AudioSystem
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** REAL audio kernels on the JDK's built-in WAV/AIFF/AU support
  * (javax.sound.sampled — zero external dependency), completing the
  * multimodal binary-column triad next to [[ImageKernels]] and
  * [[VideoOps]]. Same execution shape: per-record JVM kernels over a
  * binary column, where decode cost dominates the UDF bridge. */
object AudioKernels extends Serializable {

  /** The installed container parsers, resolved ONCE per executor JVM
    * with the WAV reader first. `AudioSystem.getAudioInputStream`
    * walks the SPI provider registry on EVERY call and probes each
    * provider by thrown `UnsupportedAudioFileException` — measured
    * 114 µs per open against ~10 µs for the actual PCM decode of a
    * KB-scale clip, i.e. the open was >90% of the 1M-row audio probe.
    * Caching the provider list and trying the dominant container first
    * makes the open a plain header parse. */
  @transient private lazy val fileReaders: List[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader],
        classOf[AudioSystem].getClassLoader)
      .iterator().asScala.toList
      .sortBy(r => if (r.getClass.getName.contains("Wave")) 0 else 1)
  }

  /** Open via the cached readers; None when no container matches. */
  private def open(bytes: Array[Byte]): Option[javax.sound.sampled.AudioInputStream] = {
    val bin = new java.io.ByteArrayInputStream(bytes)
    val it = fileReaders.iterator
    while (it.hasNext) {
      val r = it.next()
      bin.reset()
      try return Some(r.getAudioInputStream(bin))
      catch { case _: Exception => () }
    }
    None
  }

  /** (sample_rate_hz, channels, bits_per_sample, n_frames) from the
    * container header. */
  def info(bytes: Array[Byte]): Option[(Int, Int, Int, Long)] =
    if (bytes == null || bytes.length == 0) None
    else
      open(bytes).flatMap { in =>
        try {
          val f = in.getFormat
          Some((f.getSampleRate.toInt, f.getChannels,
            f.getSampleSizeInBits, in.getFrameLength))
        } catch { case _: Exception => None } finally in.close()
      }

  /** Duration in seconds from the header. */
  def durationSec(bytes: Array[Byte]): Option[Double] =
    info(bytes).collect { case (rate, _, _, frames) if rate > 0 && frames >= 0 =>
      frames.toDouble / rate
    }

  /** RMS amplitude of the decoded PCM samples, normalized to [0,1] —
    * the basic audio-quality / silence-detection feature. Supports the
    * 8/16-bit PCM the JDK decodes. */
  def rms(bytes: Array[Byte]): Option[Double] =
    if (bytes == null || bytes.length == 0) None
    else
      open(bytes).flatMap { in =>
        try {
          val f = in.getFormat
          val data = in.readAllBytes()
          val bits = f.getSampleSizeInBits
          if (bits != 8 && bits != 16) None
          else {
            var sumSq = 0.0
            var n = 0
            if (bits == 8) {
              var i = 0
              while (i < data.length) {
                val v = (data(i) & 0xff) - 128
                sumSq += (v / 128.0) * (v / 128.0); n += 1; i += 1
              }
            } else {
              val le = !f.isBigEndian
              var i = 0
              while (i + 1 < data.length) {
                val v =
                  if (le) ((data(i + 1) << 8) | (data(i) & 0xff)).toShort
                  else ((data(i) << 8) | (data(i + 1) & 0xff)).toShort
                sumSq += (v / 32768.0) * (v / 32768.0); n += 1; i += 2
              }
            }
            if (n == 0) None else Some(math.sqrt(sumSq / n))
          }
        } catch { case _: Exception => None } finally in.close()
      }

  /** Energy-contour fingerprint: decode PCM, split the sample stream
    * into `windows` contiguous chunks (sample i → window ⌊i·w/n⌋ —
    * integer arithmetic, engine-replayable), per-window INTEGER energy
    * Σ v² (exact — no FP anywhere), then one bit per adjacent window
    * pair: bit j = 1 iff energy(j+1) > energy(j). The delta-sign
    * contour is the classic coarse audio signature: a localized
    * corruption (clipped samples, a dropped packet) flips at most the
    * two bits touching its window, so near-identical recordings sit
    * within a small hamming radius and
    * [[graft.operators.image.PhashHammingDedup]] (bands over the
    * fingerprint) groups them — the audio twin of the pHash story.
    * None when the clip has fewer samples than windows.
    *
    * WIDTH is the recall/false-merge knob: `windows` − 1 delta bits.
    * The 17-window/16-bit default is oracle-replay-compact but its
    * 2^16 space SATURATES past ~10^4 distinct clips (natural
    * collisions become false merges — measured in SURVEY §5.13); at
    * corpus scale use 33 windows → 32 bits (with the hamming dedup's
    * bands widened to match, e.g. 8×4-bit bands at radius 1 — the
    * `audio_fingerprint_wide` key), which pushes the birthday horizon
    * past 10^9 clips. Up to 65 windows → 64 bits fits the long. */
  def fingerprint(bytes: Array[Byte], windows: Int = 17): Option[Long] =
    if (bytes == null || bytes.length == 0) None
    else if (windows < 2 || windows > 65)
      throw new IllegalArgumentException(
        s"windows must be in [2, 65] (got $windows): the contour packs " +
          "windows-1 delta bits into one long")
    else
      open(bytes).flatMap { in =>
        try {
          val f = in.getFormat
          val data = in.readAllBytes()
          val bits = f.getSampleSizeInBits
          if (bits != 8 && bits != 16) None
          else {
            val n = if (bits == 8) data.length else data.length / 2
            if (n < windows) None
            else {
              // tight per-sample loops: format branches hoisted, and the
              // per-sample window index `i·w/n` (an integer divide per
              // sample) replaced by a precomputed-boundary compare —
              // boundary w starts at ceil(w·n/windows), which yields the
              // identical assignment (⌊i·windows/n⌋ ≥ w ⇔ i ≥ ⌈w·n/windows⌉)
              val sums = new Array[Long](windows)
              val bound = new Array[Int](windows + 1)
              var w = 0
              while (w <= windows) {
                bound(w) = ((w.toLong * n + windows - 1) / windows).toInt
                w += 1
              }
              var cur = 0
              var next = bound(1)
              var i = 0
              if (bits == 8) {
                while (i < n) {
                  while (i >= next) { cur += 1; next = bound(cur + 1) }
                  val v = (data(i) & 0xff) - 128
                  sums(cur) += v.toLong * v
                  i += 1
                }
              } else if (!f.isBigEndian) {
                while (i < n) {
                  while (i >= next) { cur += 1; next = bound(cur + 1) }
                  val v = ((data(2 * i + 1) << 8) | (data(2 * i) & 0xff)).toShort.toInt
                  sums(cur) += v.toLong * v
                  i += 1
                }
              } else {
                while (i < n) {
                  while (i >= next) { cur += 1; next = bound(cur + 1) }
                  val v = ((data(2 * i) << 8) | (data(2 * i + 1) & 0xff)).toShort.toInt
                  sums(cur) += v.toLong * v
                  i += 1
                }
              }
              var fp = 0L
              var j = 0
              while (j < windows - 1) {
                if (sums(j + 1) > sums(j)) fp |= 1L << j
                j += 1
              }
              Some(fp)
            }
          }
        } catch { case _: Exception => None } finally in.close()
      }

  // ---- Column API ----
  private val infoUdf = udf((b: Array[Byte]) => info(b))
  private val durUdf = udf((b: Array[Byte]) => durationSec(b))
  private val rmsUdf = udf((b: Array[Byte]) => rms(b))
  private val fpUdf = udf((b: Array[Byte]) => fingerprint(b))

  def audioInfo(audio: Column): Column = infoUdf(audio)
  def audioDuration(audio: Column): Column = durUdf(audio)
  def audioRms(audio: Column): Column = rmsUdf(audio)
  def audioFingerprint(audio: Column): Column = fpUdf(audio)

  /** Parameterized-width contour ([[fingerprint]]'s `windows` knob). */
  def audioFingerprint(audio: Column, windows: Int): Column = {
    val w = windows // stable capture for the UDF closure
    val u = udf((b: Array[Byte]) => fingerprint(b, w))
    u(audio)
  }

  /** Deterministic 8-bit mono PCM WAV whose samples are the text's
    * byte codes — the audio twin of the text-as-binary image
    * derivation, but through a REAL container: the bytes round-trip
    * javax.sound's WAV parser, so the audio_metadata oracle key drives
    * the same decode path production audio would, while the expected
    * values stay computable from the construction formula (rate and
    * layout are constants, frames = text length, RMS over the
    * unsigned-byte samples). */
  def wavFromText(text: String, sampleRate: Int = 8000): Array[Byte] = {
    val data =
      if (text == null) Array.emptyByteArray else text.getBytes("ISO-8859-1")
    val bb = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + data.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate).putInt(sampleRate)
      .putShort(1).putShort(8)
      .put("data".getBytes("US-ASCII")).putInt(data.length)
      .put(data)
    bb.array()
  }
  private val wavFromTextUdf = udf((t: String) => wavFromText(t))
  def textWav(text: Column): Column = wavFromTextUdf(text)

  /** Metadata refiner: sample_rate, channels, bits, n_frames, duration_s,
    * rms — null fields for undecodable bytes. */
  def withAudioMetadata(df: DataFrame, audioCol: String = "audio"): DataFrame =
    df.withColumn("__a", audioInfo(col(audioCol)))
      .withColumn("sample_rate", col("__a._1"))
      .withColumn("channels", col("__a._2"))
      .withColumn("bits_per_sample", col("__a._3"))
      .withColumn("n_frames", col("__a._4"))
      .drop("__a")
      .withColumn("duration_s", audioDuration(col(audioCol)))
      .withColumn("rms", audioRms(col(audioCol)))
}
