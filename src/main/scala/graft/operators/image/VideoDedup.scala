package graft.operators.image

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Video near-dup via aligned frame-pHash matching — the video leg of
  * the multimodal dedup triad (image: [[ImagePhashDedup]] /
  * [[PhashHammingDedup]]; audio: [[AudioKernels.fingerprint]]): two
  * videos are near-duplicates when ≥ `minMatches` of their `n`
  * deterministically sampled frames land within hamming `radius` of
  * each other AT THE SAME frame index (temporal alignment — a
  * re-encode keeps the timeline, so aligned comparison is the cheap
  * high-precision test; clipped or re-cut videos are a different
  * operator's problem).
  *
  * Frames hash with the REAL DCT kernel ([[DctKernels.dctPhash]]:
  * quantized-integer 8×8 DCT, median threshold) — a re-encode's bit
  * flips move a hash a few hamming bits where the old md5 content hash
  * lost every affected frame, and a uniform brightness shift doesn't
  * move it at all. Frames holding decodable image bytes can use
  * [[ImageKernels.phash64]] through the same column instead; the
  * matching machinery below is hash-agnostic.
  *
  * Scale shape — never pairwise over videos:
  *   1. frame stream: explode [[VideoOps.frameSample]]'s n frames per
  *      video, DCT-hash each;
  *   2. UBIQUITOUS frames (black frames, station logos — shared by
  *      more videos than `maxFrameGroup`) are dropped first, the
  *      stop-word move: non-discriminative, and their C(k,2) fan-out
  *      is the skew bomb at corpus scale;
  *   3. collapse to DISTINCT (frame_idx, hash) reps, then find
  *      neighbor rep pairs with the [[PhashHammingDedup]] pigeonhole:
  *      split the hash into `bands` disjoint bit-bands — a pair within
  *      hamming radius < bands agrees exactly on some band, so a
  *      per-band equi-join finds every candidate (EXACT recall, no LSH
  *      S-curve), verified by one codegen'd `bit_count(xor) ≤ radius`.
  *      Equal hashes pair at distance 0 through the same join. The
  *      rep join is bounded by the HASH SPACE, not the corpus — but
  *      that cuts both ways: at corpus scale use `nbits = 60` (rep
  *      buckets stay sparse); `nbits = 16` exists for oracle-replay
  *      compactness and saturates beyond ~10^4 distinct frames;
  *   4. matched frames come from joining the rep pairs back to the
  *      capped frame stream on (frame_idx, hash); per-pair match
  *      counting is one aggregate; ≥ minMatches pairs feed the
  *      family's keep-first collapse (drop the larger id).
  *
  * Dropped-frame approximation (documented): a pair whose every shared
  * frame is ubiquitous is missed — by construction such videos agree
  * only on boilerplate frames. */
case class VideoFrameDedup(
    n: Int = 8,
    frameBytes: Int = 64,
    minMatches: Int = 5,
    radius: Int = 2,
    bands: Int = 4,
    nbits: Int = 16,
    maxFrameGroup: Int = 1000,
    videoCol: String = "video",
    idCol: String = "doc_id") {
  require(n >= 1 && minMatches >= 1 && minMatches <= n,
    "need 1 <= minMatches <= n")
  require(radius >= 0 && radius < bands,
    s"pigeonhole exactness needs radius < bands (got $radius >= $bands)")
  require(nbits % bands == 0, "bands must divide nbits")

  private val width = nbits / bands

  /** (idCol, frame_idx, frame_hash) — the narrow frame stream. Frames
    * too short/empty to hash carry a null (no near-dup signal). */
  def frameHashes(df: DataFrame): DataFrame =
    df.select(col(idCol),
        explode(VideoOps.frameSample(col(videoCol), n, frameBytes))
          .as("__f"))
      .select(col(idCol), col("__f.frame_idx").as("frame_idx"),
        DctKernels.framePhash(col("__f.frame"), nbits).as("frame_hash"))
      .filter(col("frame_hash").isNotNull)

  private def bandKeys(h: Column): Column =
    array((0 until bands).map(j =>
      shiftrightunsigned(h, j * width).bitwiseAND(lit((1L << width) - 1))): _*)

  /** (id_a, id_b, n_matched) for pairs with ≥ minMatches aligned
    * frames within hamming `radius`, after the ubiquitous-frame cut. */
  def candidatePairs(df: DataFrame): DataFrame = {
    // narrow (id, frame_idx, hash) stream, lineage-cut: the ubiquitous
    // cut, the rep set and both sides of the back join all read it —
    // without the cut the frame sampling + DCT would re-run per
    // reference
    val fh = graft.operators.Lineage.cut(frameHashes(df))
    val common = fh.groupBy("frame_idx", "frame_hash")
      .agg(count(lit(1)).as("__k"))
      .filter(col("__k") > maxFrameGroup)
      .select("frame_idx", "frame_hash")
    val kept = fh.join(common, Seq("frame_idx", "frame_hash"), "left_anti")
    // rep level: distinct hashes per frame index
    val reps = kept.select("frame_idx", "frame_hash").distinct()
    val banded = reps.select(col("frame_idx"), col("frame_hash"),
      posexplode(bandKeys(col("frame_hash"))).as(Seq("__band", "__key")))
    val repPairs = banded
      .select(col("frame_idx"), col("__band"), col("__key"),
        col("frame_hash").as("ha"))
      .join(banded.select(col("frame_idx"), col("__band"), col("__key"),
        col("frame_hash").as("hb")), Seq("frame_idx", "__band", "__key"))
      .filter(col("ha") <= col("hb"))
      .select("frame_idx", "ha", "hb").distinct()
      .filter(bit_count(col("ha").bitwiseXOR(col("hb"))) <= radius)
    // back to videos: every (a, b) sharing a neighbor-rep aligned frame.
    // repPairs is canonicalized ha <= hb, so the back join's (id_a, id_b)
    // orientation is HASH order, not id order — canonicalize with
    // least/greatest (a plain id_a < id_b filter would drop every
    // radius>0 match where the smaller-id video holds the larger hash)
    val matched = repPairs
      .join(kept.select(col("frame_idx"), col("frame_hash").as("ha"),
        col(idCol).as("id_a")), Seq("frame_idx", "ha"))
      .join(kept.select(col("frame_idx"), col("frame_hash").as("hb"),
        col(idCol).as("id_b")), Seq("frame_idx", "hb"))
      .filter(col("id_a") =!= col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"), col("frame_idx"))
      .distinct()
    matched.groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_matched"))
      .filter(col("n_matched") >= minMatches)
  }

  /** Every input row + `keep` (keep-first: a row drops iff a
    * smaller-id near-dup exists). The input is lineage-cut first
    * ([[graft.operators.Lineage]]): the pair search references it
    * three times (frame stream feeds the ubiquitous cut, the rep set
    * and both sides of the back join) plus the verdict join — composed
    * lazily after expression-deriving stages, each reference would
    * re-run the whole upstream. */
  def flagged(df0: DataFrame): DataFrame = {
    val df = graft.operators.Lineage.cut(df0)
    val drops = candidatePairs(df).select(col("id_b").as(idCol)).distinct()
      .withColumn("__dropped", lit(true))
    df.join(drops, Seq(idCol), "left_outer")
      .withColumn("keep", col("__dropped").isNull)
      .drop("__dropped")
  }

  /** Surviving rows only. */
  def apply(df: DataFrame): DataFrame =
    flagged(df).filter(col("keep")).drop("keep")

  /** The persisted incremental-probe state: the narrow (id, frame_idx,
    * frame_hash) stream of every row REACHING this stage (ids matter
    * here, unlike [[PhashHammingDedup.indexRows]] — the ≥ minMatches
    * count is per VIDEO pair, so matches must group by the indexed
    * doc). */
  def indexRows(df: DataFrame): DataFrame = frameHashes(df)

  /** Batch rows surviving against a persisted [[indexRows]] state PLUS
    * batch-internal keep-first — equal to the batch operator over the
    * concatenated corpus whenever every batch id sorts above every
    * indexed id: a batch video then drops iff ≥ minMatches of its
    * aligned frames land within the radius of some ONE indexed video's
    * frames, or of a smaller-id batch video's ([[flagged]]). The cross
    * probe mirrors [[candidatePairs]] at rep level (distinct
    * (frame_idx, hash) per side, banded pigeonhole join, one hamming
    * verify) — bounded by distinct frame hashes, never videos².
    * Cap caveat: the batch operator's ubiquitous-frame cut counts
    * frame groups within its own input; the incremental path applies
    * it within the batch only, so results match the rebuild whenever
    * no MERGED frame group crosses `maxFrameGroup` (the same guard-not-
    * semantics caveat as the minhash bucket cap, documented at B63). */
  def survivorsIndexed(index: DataFrame, batch: DataFrame): DataFrame = {
    val bFh = graft.operators.Lineage.cut(frameHashes(batch))
    val iReps = index.select("frame_idx", "frame_hash").distinct()
      .select(col("frame_idx"), col("frame_hash").as("ha"),
        posexplode(bandKeys(col("frame_hash"))).as(Seq("__band", "__key")))
    val bReps = bFh.select("frame_idx", "frame_hash").distinct()
      .select(col("frame_idx"), col("frame_hash").as("hb"),
        posexplode(bandKeys(col("frame_hash"))).as(Seq("__band", "__key")))
    val repPairs = iReps.join(bReps, Seq("frame_idx", "__band", "__key"))
      .filter(bit_count(col("ha").bitwiseXOR(col("hb"))) <= radius)
      .select("frame_idx", "ha", "hb").distinct()
    val hit = repPairs
      .join(index.select(col("frame_idx"), col("frame_hash").as("ha"),
        col(idCol).as("__iid")), Seq("frame_idx", "ha"))
      .join(bFh.select(col("frame_idx"), col("frame_hash").as("hb"),
        col(idCol).as("__bid")), Seq("frame_idx", "hb"))
      .select("__iid", "__bid", "frame_idx").distinct()
      .groupBy("__iid", "__bid").agg(count(lit(1)).as("__m"))
      .filter(col("__m") >= minMatches)
      .select(col("__bid").as(idCol)).distinct()
    flagged(batch).filter(col("keep")).drop("keep")
      .join(hit, Seq(idCol), "left_anti")
  }
}
