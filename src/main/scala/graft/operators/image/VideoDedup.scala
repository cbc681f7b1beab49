package graft.operators.image

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Video near-dup via aligned frame-hash matching — the video leg of
  * the multimodal dedup triad (image: [[ImagePhashDedup]] /
  * [[PhashHammingDedup]]; audio: [[AudioKernels.fingerprint]]): two
  * videos are near-duplicates when ≥ `minMatches` of their `n`
  * deterministically sampled frames hash identically AT THE SAME
  * frame index (temporal alignment — a re-encode keeps the timeline,
  * so aligned comparison is the cheap high-precision test; clipped or
  * re-cut videos are a different operator's problem).
  *
  * Scale shape — never pairwise over videos:
  *   1. frame stream: explode [[VideoOps.frameSample]]'s n
  *      frames per video, hash each (stub 60-bit content hash; a real
  *      DCT pHash slots into the same column);
  *   2. candidate pairs come from a hash equi-join on (frame_idx,
  *      frame_hash) — only videos sharing an aligned identical frame
  *      ever meet;
  *   3. UBIQUITOUS frames (black frames, station logos — shared by
  *      more videos than `maxFrameGroup`) are dropped from the join
  *      first, the stop-word move: they are non-discriminative and
  *      their C(k,2) fan-out is the skew bomb at corpus scale (a
  *      `groupBy` count + broadcastable filter, mirroring
  *      EmbeddingNearDup's bucket cap);
  *   4. per-pair match counting is one aggregate over the joined
  *      narrow stream; ≥ minMatches pairs feed the family's
  *      keep-first collapse (drop the larger id of each pair).
  *
  * The dropped-frame approximation is documented: a pair whose every
  * shared frame is ubiquitous is missed — by construction such videos
  * agree only on boilerplate frames. */
case class VideoFrameDedup(
    n: Int = 8,
    frameBytes: Int = 32,
    minMatches: Int = 5,
    maxFrameGroup: Int = 1000,
    videoCol: String = "video",
    idCol: String = "doc_id") {
  require(n >= 1 && minMatches >= 1 && minMatches <= n,
    "need 1 <= minMatches <= n")

  /** (idCol, frame_idx, frame_hash) — the narrow frame stream. */
  def frameHashes(df: DataFrame): DataFrame =
    df.select(col(idCol),
        explode(VideoOps.frameSample(col(videoCol), n, frameBytes))
          .as("__f"))
      .select(col(idCol), col("__f.frame_idx").as("frame_idx"),
        conv(substring(md5(col("__f.frame")), 1, 15), 16, 10).cast("long")
          .as("frame_hash"))

  /** (id_a, id_b, n_matched) for pairs with ≥ minMatches aligned
    * identical frames, after the ubiquitous-frame cut. */
  def candidatePairs(df: DataFrame): DataFrame = {
    val fh = frameHashes(df)
    val common = fh.groupBy("frame_idx", "frame_hash")
      .agg(count(lit(1)).as("__k"))
      .filter(col("__k") > maxFrameGroup)
      .select("frame_idx", "frame_hash")
    val kept = fh.join(common, Seq("frame_idx", "frame_hash"), "left_anti")
    kept.select(col("frame_idx"), col("frame_hash"), col(idCol).as("id_a"))
      .join(kept.select(col("frame_idx"), col("frame_hash"),
        col(idCol).as("id_b")), Seq("frame_idx", "frame_hash"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_matched"))
      .filter(col("n_matched") >= minMatches)
  }

  /** Every input row + `keep` (keep-first: a row drops iff a
    * smaller-id near-dup exists). */
  def flagged(df: DataFrame): DataFrame = {
    val drops = candidatePairs(df).select(col("id_b").as(idCol)).distinct()
      .withColumn("__dropped", lit(true))
    df.join(drops, Seq(idCol), "left_outer")
      .withColumn("keep", col("__dropped").isNull)
      .drop("__dropped")
  }

  /** Surviving rows only. */
  def apply(df: DataFrame): DataFrame =
    flagged(df).filter(col("keep")).drop("keep")
}
