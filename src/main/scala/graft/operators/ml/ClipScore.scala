package graft.operators.ml

import graft.operators.image.BatchInference
import org.apache.spark.sql.{Column, DataFrame}
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

/** Cross-modal retrieval evaluation — recall@k in both directions
  * (image→text and text→image), the standard benchmark for a
  * dual-tower (CLIP/SigLIP) encoder on a paired corpus (Radford et al.
  * 2021 §3.1 eval; every LAION release reports it): embed both towers
  * once, retrieve each image's top-k captions (and vice versa) by
  * cosine, and score the fraction of queries whose TRUE partner (same
  * id) ranks within k. The number a [[CrossModalAlignment]] threshold
  * choice should be justified by — if recall@1 is low, a cosine gate
  * is cutting aligned pairs.
  *
  * Composition: one [[BatchInference.embedPair]] pass (both towers, the
  * GPU batch shape) pinned once — the narrow (id, 2×8 floats) table is
  * consumed by both retrieval directions — then
  * [[graft.operators.vector.BruteForceKnn.topKCross]] per direction
  * (cross form: the true partner SHARES the query's id) and one
  * hit-within-k aggregate per (direction, k). Brute force is the eval
  * harness (eval sets are bounded by construction); a corpus-scale
  * retrieval system serves from the B7/B8 indexes and this report
  * evaluates THEM by swapping the candidate source, exactly like
  * ann_eval_recall. */
case class CrossModalRecall(
    ks: Seq[Int] = Seq(1, 5),
    idCol: String = "doc_id",
    imageCol: String = "image",
    captionCol: String = "caption",
    batchSize: Int = 64) {
  require(ks.nonEmpty && ks.forall(_ >= 1), "ks must be positive")

  /** One row per (direction, k): (direction, k, recall 6dp,
    * n_queries). `queryPred` (over `idCol`) bounds the QUERY set — the
    * eval discipline: recall against the FULL corpus of distractors is
    * estimated from a query sample, so cost is |sample|·|corpus|, not
    * |corpus|² (an unsampled run at 5k docs measured 84-226 s vs ~3 s
    * sampled — and a real eval suite is a sample by construction). */
  def apply(df: DataFrame, queryPred: Column = lit(true)): DataFrame = {
    import graft.operators.vector.BruteForceKnn
    // both towers in one batched pass; eagerly pinned — the embedding
    // table feeds four legs (each direction's query and corpus side)
    val emb = BatchInference.embedPair(
      df.withColumn("__cap", col(captionCol).cast("binary")),
      TrainedEmbedding.kernel, batchSize, idCol, imageCol, "__cap")
      .localCheckpoint(true)
    val img = emb.select(col(idCol).as("vec_id"), col("a_embedding").as("embedding"))
    val cap = emb.select(col(idCol).as("vec_id"), col("b_embedding").as("embedding"))
    val qImg = img.where(queryPred)
    val qCap = cap.where(queryPred)
    val knn = BruteForceKnn(ks.max)
    def leg(q: DataFrame, c: DataFrame, direction: String): DataFrame = {
      val tk = knn.topKCross(q, c)
      ks.map { k =>
        tk.filter(col("rn") <= k)
          .groupBy("qid")
          .agg(max(when(col("cid") === col("qid"), 1).otherwise(0)).as("__hit"))
          .agg(round(avg(col("__hit")), 6).as("recall"),
            count(lit(1)).as("n_queries"))
          .select(lit(direction).as("direction"), lit(k).as("k"),
            col("recall"), col("n_queries"))
      }.reduce(_ unionByName _)
    }
    leg(qImg, cap, "i2t").unionByName(leg(qCap, img, "t2i"))
  }
}
