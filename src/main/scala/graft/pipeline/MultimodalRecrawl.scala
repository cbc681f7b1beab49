package graft.pipeline

import graft.operators.image.{PhashHammingDedup, VideoFrameDedup}
import org.apache.spark.sql.DataFrame

/** Day-2 incremental re-crawl for the MULTIMODAL chain — [[RecrawlOps]]
  * (B63) extended to [[MultimodalCapstone]]'s image/audio/video triad
  * (the reference's staged re-run pitch, framework/executor.py, covers
  * its image pipeline too): yesterday's curated multimodal corpus plus
  * today's crawl delta, WITHOUT re-decoding or re-hashing yesterday.
  *
  * The persisted day-1 state is one narrow SIGNATURE table per dedup
  * stage, each holding every row REACHING that stage (the B63
  * `indexRowsAll` requirement — the keep rules drop on collision with
  * any smaller-id reaching doc, survivor or not):
  *
  *   - `phashIndex`: distinct 60-bit image phashes reaching stage 6;
  *   - `audioIndex`: distinct 16-bit audio contours reaching stage 10;
  *   - `videoIndex`: the (id, frame_idx, frame_hash) stream reaching
  *     stage 11 (ids matter: the ≥ minMatches count is per video pair).
  *
  * Day-2 the delta alone pays stages 1-5 and 7-9 (all per-document and
  * content-deterministic — identical verdicts to a from-scratch rebuild
  * by construction), and each dedup stage probes its signature index
  * with a banded equi-join + hamming verify
  * ([[PhashHammingDedup.survivorsIndexed]],
  * [[VideoFrameDedup.survivorsIndexed]]) — corpus media is never
  * re-read; only narrow hashes join.
  *
  * == Rebuild equality (what `recrawl_multimodal_corpus` gates) ==
  *
  * curated(day1) ∪ survivors(delta) == the from-scratch capstone chain
  * over old ∪ rekey(delta), because (a) per-doc verdicts are content
  * functions, (b) all delta ids sort above all old ids, so old docs'
  * dedup verdicts cannot change, and (c) each dedup's keep rule is
  * "drop iff ANY smaller-id reaching doc matches", which the reaching-
  * signature indexes answer exactly. Skipped unchanged pages lose no
  * information: an identical re-crawl carries identical signatures, so
  * it collides with its day-1 twin's indexed hash whether or not the
  * twin survived. Cap caveats (the minhash-style guard bounds): the
  * video ubiquitous-frame cut counts within each side separately —
  * equality holds while no merged frame group crosses `maxFrameGroup`.
  */
object MultimodalRecrawlOps {

  /** Registry-built sub-chain over the capstone's op rows [from, until). */
  private def sub(from: Int, until: Int): Pipeline =
    Pipeline(MultimodalCapstone.ops.slice(from, until)
      .map { case (n, p) => OperatorRegistry.build(n, p) })

  // the three dedup stages instantiated with the capstone config's
  // exact params (MultimodalCapstone.ops rows 5, 9, 10), so the
  // incremental probes share semantics with the registry chain
  private[graft] val imageDedup =
    PhashHammingDedup(radius = 2, bands = 6, nbits = 60)
  private[graft] val audioDedup =
    PhashHammingDedup(radius = 1, bands = 4, nbits = 16,
      phashCol = "audio_fp")
  private[graft] val videoDedup =
    VideoFrameDedup(n = 8, frameBytes = 64, minMatches = 5,
      maxFrameGroup = 1000)

  private def toPhash(df: DataFrame) = sub(0, 5)(df) // synth→quality→phash
  private def clipGate(df: DataFrame) = sub(6, 7)(df)
  private def toAudioFp(df: DataFrame) = sub(7, 9)(df) // media cols + contour
  private def shards(df: DataFrame) = sub(11, 12)(df)

  case class State(curated: DataFrame, phashIndex: DataFrame,
      audioIndex: DataFrame, videoIndex: DataFrame)

  case class Batch(survivors: DataFrame, newPhash: DataFrame,
      newAudio: DataFrame, newVideo: DataFrame)

  /** Day-1 build: the full capstone chain over `old`, with the three
    * reaching-signature tables captured at their stages. Frames are
    * lineage-cut at each capture (each feeds ≥ 2 consumers). */
  def init(old: DataFrame): State = {
    import graft.operators.Lineage.cut
    val s5 = cut(toPhash(old))
    val phashIndex = cut(imageDedup.indexRows(s5))
    val s7 = cut(clipGate(imageDedup(s5)))
    val s9 = cut(toAudioFp(s7))
    val audioIndex = cut(audioDedup.indexRows(s9))
    val s10 = cut(audioDedup(s9))
    val videoIndex = cut(videoDedup.indexRows(s10))
    State(shards(videoDedup(s10)), phashIndex, audioIndex, videoIndex)
  }

  /** One day-2 batch over the routed delta ([[RecrawlOps.delta]]):
    * survivors plus the signature rows that roll each index forward. */
  def ingest(state: State, deltaDocs: DataFrame): Batch =
    ingestIndexed(state.phashIndex, state.audioIndex, state.videoIndex,
      deltaDocs)

  /** [[ingest]] against bare signature tables — the form the
    * continuous loop ([[graft.streaming.StreamingMultimodal]]) calls
    * per micro-batch, where the indexes live as persisted `batch=<id>`
    * parquet rather than a day-1 [[State]]. Same contract: batch ids
    * must sort above every indexed id. */
  def ingestIndexed(phashIndex: DataFrame, audioIndex: DataFrame,
      videoIndex: DataFrame, deltaDocs: DataFrame): Batch = {
    import graft.operators.Lineage.cut
    val d5 = cut(toPhash(deltaDocs))
    val newPhash = imageDedup.indexRows(d5)
    val d6 = cut(imageDedup.survivorsIndexed(phashIndex, d5))
    val d9 = cut(toAudioFp(clipGate(d6)))
    val newAudio = audioDedup.indexRows(d9)
    val d10 = cut(audioDedup.survivorsIndexed(audioIndex, d9))
    val newVideo = videoDedup.indexRows(d10)
    val d11 = videoDedup.survivorsIndexed(videoIndex, d10)
    Batch(shards(d11), newPhash, newAudio, newVideo)
  }
}
