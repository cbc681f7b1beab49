package graft.pipeline

/** The multimodal curation capstone — the image/audio/video twin of
  * [[CurationCapstone]]. The reference pitches itself as a *multimodal*
  * pipeline (configs/example_image_pipeline.yaml: loader → image
  * metadata → technical quality → quality filter → pHash dedup → CLIP
  * embedding → writer); this chain composes that image leg with the
  * audio-fingerprint and video-frame dedup legs into ONE registry-built
  * pipeline, gated on per-stage survivor counts against a DuckDB replay
  * of every stage formula (key `multimodal_curation_funnel`).
  *
  * Stage order (each a §2 row proven alone; the capstone gates the
  * COMPOSITION):
  *
  *   1. synthetic_image_column        — media derivation (test corpus
  *                                      ships no real bytes; production
  *                                      swaps in the image_real_* ops)
  *   2. synthetic_caption_column      — deterministic related caption
  *   3. image_technical_quality_refiner — dims, artifacts, entropy
  *   4. image_quality_filter          — the cheap gate FIRST: no hash,
  *                                      tower or decode runs on rows a
  *                                      metadata predicate can drop
  *   5. image_phash_refiner           — 60-bit content phash
  *   6. phash_hamming_dedup           — image near-dup (radius 2)
  *   7. clip_score_filter             — dual-tower alignment ≥ 0.99
  *   8. synthetic_media_columns       — audio (real WAV container) +
  *                                      video payloads, derived only
  *                                      for the survivors
  *   9. audio_fingerprint             — energy-contour signature
  *                                      through the real javax.sound
  *                                      decode (the expensive leg —
  *                                      deliberately AFTER every text/
  *                                      image gate)
  *  10. phash_hamming_dedup           — audio near-dup (radius 1 over
  *                                      the 16-bit contour)
  *  11. video_frame_dedup             — aligned frame-DCT near-dup
  *  12. training_shard_assigner       — deterministic output layout
  *
  * Scale shape: stages 1-5 are map-only projections fused by Catalyst;
  * 6 and 10 are the banded-pigeonhole rep joins (bounded by distinct
  * hashes, never the corpus); 7 is one batched dual-tower mapPartitions
  * pass + a semi join; 9 is the once-per-survivor decode UDF; 11 is the
  * frame-level banded join with the ubiquitous-frame skew cut. The
  * expensive legs (towers, decode, frame DCT) all run on the
  * quality-gated survivor fraction — the production ordering for a
  * multimodal crawl, where metadata gates are ~free and GPU/codec
  * stages dominate.
  */
object MultimodalCapstone {

  /** (operator, params) rows — same names as the YAML config
    * (configs/example_multimodal_capstone.yaml). */
  def ops: Seq[(String, OperatorRegistry.Params)] = Seq(
    "synthetic_image_column" -> Map.empty[String, Any],
    "synthetic_caption_column" -> Map.empty[String, Any],
    "image_technical_quality_refiner" -> Map.empty[String, Any],
    "image_quality_filter" -> Map[String, Any](
      "min_width" -> 512, "min_height" -> 512,
      "max_compression_artifacts" -> 0.85,
      "min_information_entropy" -> 3.0),
    "image_phash_refiner" -> Map.empty[String, Any],
    "phash_hamming_dedup" -> Map[String, Any](
      "radius" -> 2, "bands" -> 6, "nbits" -> 60),
    "clip_score_filter" -> Map[String, Any](
      "threshold" -> 0.99, "caption_field" -> "caption"),
    "synthetic_media_columns" -> Map[String, Any](
      "video_text_field" -> "video_src"),
    "audio_fingerprint" -> Map.empty[String, Any],
    "phash_hamming_dedup" -> Map[String, Any](
      "radius" -> 1, "bands" -> 4, "nbits" -> 16,
      "phash_field" -> "audio_fp"),
    "video_frame_dedup" -> Map[String, Any](
      "n_frames" -> 8, "frame_bytes" -> 64, "min_matches" -> 5,
      "max_frame_group" -> 1000),
    "training_shard_assigner" -> Map[String, Any]("n_shards" -> 8))

  /** The capstone chain as a lazy [[Pipeline]], built through the same
    * registry the YAML runner uses. */
  def pipeline: Pipeline =
    Pipeline(ops.map { case (n, p) => OperatorRegistry.build(n, p) })
}
