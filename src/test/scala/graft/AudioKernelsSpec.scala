package graft

import graft.operators.image.AudioKernels
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

class AudioKernelsSpec extends SparkSpec {
  import spark.implicits._

  /** In-memory 16-bit mono PCM WAV of a sine at `amp` ∈ [0,1]. */
  private def sineWav(seconds: Double, hz: Double, amp: Double,
      rate: Float = 8000f): Array[Byte] = {
    val n = (seconds * rate).toInt
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val v = (math.sin(2 * math.Pi * hz * i / rate) * amp * 32767).toInt
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, n)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("wav header: rate/channels/bits/frames/duration") {
    val wav = sineWav(0.5, 440, 0.8)
    assert(AudioKernels.info(wav) === Some((8000, 1, 16, 4000L)))
    assert(math.abs(AudioKernels.durationSec(wav).get - 0.5) < 1e-9)
    assert(AudioKernels.info("not audio".getBytes) === None)
  }

  test("rms: sine ~ amp/sqrt(2), silence ~ 0") {
    val loud = AudioKernels.rms(sineWav(0.25, 440, 0.8)).get
    val quiet = AudioKernels.rms(sineWav(0.25, 440, 0.0)).get
    assert(math.abs(loud - 0.8 / math.sqrt(2)) < 0.01)
    assert(quiet < 1e-3)
  }

  test("wavFromText: real container round-trips the construction formula") {
    val wav = AudioKernels.wavFromText("abcd")
    assert(AudioKernels.info(wav) === Some((8000, 1, 8, 4L)))
    assert(math.abs(AudioKernels.durationSec(wav).get - 4.0 / 8000) < 1e-12)
    // RMS from the byte codes: sqrt(mean(((c-128)/128)^2)) over a..d
    val want = math.sqrt("abcd".map(c => math.pow((c - 128) / 128.0, 2)).sum / 4)
    assert(math.abs(AudioKernels.rms(wav).get - want) < 1e-12)
    assert(AudioKernels.info(AudioKernels.wavFromText("")).exists(_._4 == 0L))
  }

  test("audio metadata refiner runs distributed over a binary column") {
    val df = Seq((1L, sineWav(0.25, 440, 0.5)), (2L, Array.emptyByteArray))
      .toDF("doc_id", "audio")
    val rows = AudioKernels.withAudioMetadata(df)
      .select("doc_id", "sample_rate", "duration_s")
      .collect().map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(rows(1L) === ((Some(8000), Some(0.25))))
    assert(rows(2L) === ((None, None)))
  }

  test("fingerprint width knob: 33 windows -> 32 bits, bounds enforced") {
    val wav = AudioKernels.wavFromText("x" * 200 + "loud PEAKS here" * 8)
    val fp16 = AudioKernels.fingerprint(wav, 17)
    val fp32 = AudioKernels.fingerprint(wav, 33)
    assert(fp16.nonEmpty && fp32.nonEmpty)
    // 32 delta bits occupy [0, 32); the narrow contour only [0, 16)
    assert(fp32.get >= 0L && fp32.get < (1L << 32))
    assert(fp16.get >= 0L && fp16.get < (1L << 16))
    // a clip shorter than the window count has no contour
    assert(AudioKernels.fingerprint(AudioKernels.wavFromText("tiny"), 33).isEmpty)
    intercept[IllegalArgumentException] {
      AudioKernels.fingerprint(wav, 66)
    }
    intercept[IllegalArgumentException] {
      AudioKernels.fingerprint(wav, 1)
    }
    // the wide contour REFINES the narrow one's resolution: two clips
    // the 16-bit contour confuses (same coarse energy shape) can part
    // at 32 bits, never the reverse for localized edits... assert the
    // cheap direction: identical clips agree at every width
    assert(AudioKernels.fingerprint(wav.clone(), 33) == fp32)
  }

  test("fingerprint: deterministic, contour-sensitive, locality-bounded") {
    val quiet = "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"   // flat contour
    val loud = quiet.take(17) + "zz!!zz!!zz!!zz!!z"     // energy jump mid-clip
    val w1 = AudioKernels.wavFromText(loud)
    // identical bytes → identical fingerprint
    assert(AudioKernels.fingerprint(w1) == AudioKernels.fingerprint(w1.clone()))
    // a flat clip and a contoured clip differ
    assert(AudioKernels.fingerprint(AudioKernels.wavFromText(quiet)) !=
      AudioKernels.fingerprint(w1))
    // corrupting ONE sample flips at most the two bits whose windows
    // touch it — the hamming-dedup locality claim
    val corrupted = loud.updated(20, '~')
    val d = AudioKernels.fingerprint(w1).get ^
      AudioKernels.fingerprint(AudioKernels.wavFromText(corrupted)).get
    assert(java.lang.Long.bitCount(d) <= 2, s"flipped ${java.lang.Long.bitCount(d)} bits")
    // shorter than the window count → no fingerprint
    assert(AudioKernels.fingerprint(AudioKernels.wavFromText("short")).isEmpty)
    assert(AudioKernels.fingerprint(null).isEmpty)
  }
}
