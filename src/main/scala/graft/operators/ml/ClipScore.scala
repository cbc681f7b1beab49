package graft.operators.ml

import graft.operators.image.BatchInference
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Image-text alignment (CLIP-score) filtering — the LAION rule: embed
  * the image and its caption with a dual-tower encoder and keep the
  * pair iff the towers' cosine clears a threshold (LAION-5B kept
  * CLIP-score ≥ 0.28 of ~50B crawled pairs; the reference's embedding
  * refiners — operators/refiners/image_clip_embedding.py /
  * image_siglip_embedding.py — exist to feed exactly this selection).
  * The encoder here is the trained-in-repo [[TrainedEmbedding]] (real
  * pretrained weights are environment-blocked; the slot and plumbing
  * are the product), which embeds image bytes and caption bytes into
  * the same space, so misaligned pairs genuinely score lower.
  *
  * Scale shape: both towers run in ONE batched mapPartitions pass
  * ([[BatchInference.embedPair]] — a GPU dual-encoder's batch shape),
  * the cosine is the fused native expression, and the verdict comes
  * back to the wide corpus as a semi/left join on the id — map-only
  * end to end, zero shuffles of the payload. */
case class CrossModalAlignment(
    threshold: Double = 0.8,
    idCol: String = "doc_id",
    imageCol: String = "image",
    captionCol: String = "caption",
    batchSize: Int = 64) {

  /** (idCol, clip_score, clip_keep): cosine of the two towers, rounded
    * 6 dp; captions embed through their UTF-8 bytes. */
  def scored(df: DataFrame): DataFrame =
    BatchInference.embedPair(
      df.withColumn("__cap", col(captionCol).cast("binary")),
      TrainedEmbedding.kernel, batchSize, idCol, imageCol, "__cap")
      .select(col(idCol),
        round(graft.functions.VecFns.cosine(col("a_embedding"),
          col("b_embedding")), 6).as("clip_score"))
      .withColumn("clip_keep", col("clip_score") >= threshold)

  /** df + (clip_score, clip_keep) — the refine form. Input lineage-cut
    * first ([[graft.operators.Lineage]]): the verdict join references
    * it twice. */
  def flag(df0: DataFrame): DataFrame = {
    val df = graft.operators.Lineage.cut(df0)
    df.join(scored(df), Seq(idCol))
  }

  /** Aligned pairs only (full rows; semi join on the kept ids, so the
    * wide payload never shuffles for the verdict). Input lineage-cut
    * first — see [[flag]]. */
  def apply(df0: DataFrame): DataFrame = {
    val df = graft.operators.Lineage.cut(df0)
    df.join(scored(df).filter(col("clip_keep")).select(idCol),
      Seq(idCol), "left_semi")
  }
}
