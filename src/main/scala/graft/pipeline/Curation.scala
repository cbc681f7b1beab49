package graft.pipeline

/** The end-to-end FineWeb/RefinedWeb-style curation capstone — the
  * reference's whole pitch is this staged chain
  * (mega_data_factory/framework/executor.py:1,
  * configs/example_commoncrawl.yaml: loader → filter/refine/dedup
  * stages → writer with a metrics funnel); here the same chain is ONE
  * lazy Spark DAG built through [[OperatorRegistry]] — the exact
  * builders the YAML runner uses, so the oracle-gated chain and
  * `configs/example_fineweb_curation.yaml` cannot drift apart.
  *
  * Stage order (each is a §2 row proven alone; the capstone gates the
  * COMPOSITION — per-stage survivor counts against a DuckDB replay of
  * the full chain, key `pipeline_curation_funnel`):
  *
  *   1. unicode_normalizer       — encoding repair FIRST (damage
  *                                 fractures every later key/shingle)
  *   2. url_deduplicator         — crawl-frontier keep-first on the
  *                                 canonical URL (cheapest dedup first:
  *                                 no content ever touched)
  *   3. url_filter               — domain blocklist + word scoring
  *   4. text_length_filter       — trivial bounds before anything
  *                                 tokenizes
  *   5. gopher_quality_filter    — Rae 2021 rule bundle (keeps g_*
  *                                 signal columns for later stages)
  *   6. c4_cleaner               — Raffel 2020 line rules; REWRITES
  *                                 text, so every later hash/shingle
  *                                 sees cleaned pages
  *   7. text_exact_deduplicator  — md5 content hash keep-first
  *   8. quality_survivor_deduplicator — MinHash-LSH components, keep
  *                                 the best-quality member per cluster
  *   9. decontaminator           — benchmark n-gram overlap drop
  *  10. top_fraction_by_group    — per-source top-fraction quality gate
  *  11. ccnet_bucket_filter      — CCNet per-language perplexity
  *                                 terciles under the pruned corpus LM
  *                                 (B67); tail dropped
  *  12. soft_dedup_reweighter    — SoftDedup (B75) sd_weight column for
  *                                 the training sampler; drops nothing
  *  13. training_shard_assigner  — deterministic (shard, pos) layout
  *
  * Scale shape: stages 1–6 are map-only (filters fuse into the scan
  * under whole-stage codegen); 7 is one narrow (hash, id) shuffle; 8 is
  * the banded LSH equi-join family (no all-pairs anywhere); 9 is a
  * broadcast semi-join (bench suites are small); 10 is the histogram
  * percentile gate; 11 one bounded pruned-LM join + histogram-CDF
  * terciles (the payload semi-joins a narrow id set); 12 one
  * distinct-n-gram df join-back; 13 one narrow re-sort. Catalyst fuses
  * the map-only prefix into a single pass — stage boundaries cost
  * nothing until the first dedup shuffle, the opposite of the
  * reference's per-stage actor batches.
  */
object CurationCapstone {

  /** Sources gated out by the url_filter stage in the keyed run. */
  val blockedDomains: Seq[String] = Seq(
    "src2.example.com", "src7.example.com",
    "src12.example.com", "src17.example.com")

  /** (operator, params) rows — same names as the YAML config. */
  def ops(benchmarkPath: String): Seq[(String, OperatorRegistry.Params)] = Seq(
    "unicode_normalizer" -> Map.empty[String, Any],
    "url_deduplicator" -> Map.empty[String, Any],
    "url_filter" -> Map[String, Any]("blocklist_domains" -> blockedDomains),
    "text_length_filter" -> Map[String, Any](
      "min_length" -> 100, "max_length" -> 100000),
    "gopher_quality_filter" -> Map[String, Any](
      "min_words" -> 20, "stop_words" -> Seq("the", "a")),
    "c4_cleaner" -> Map.empty[String, Any],
    "text_exact_deduplicator" -> Map.empty[String, Any],
    "quality_survivor_deduplicator" -> Map.empty[String, Any],
    "decontaminator" -> Map[String, Any]("benchmark_path" -> benchmarkPath),
    "top_fraction_by_group" -> Map[String, Any](
      "frac" -> 0.5, "score_field" -> "g_word_count"),
    "ccnet_bucket_filter" -> Map[String, Any](
      "keep_buckets" -> Seq("head", "middle"), "max_vocab_per_lang" -> 64),
    "soft_dedup_reweighter" -> Map[String, Any](
      "ngram" -> 3, "alpha" -> 1.0),
    "training_shard_assigner" -> Map[String, Any]("n_shards" -> 8))

  /** The capstone chain as a lazy [[Pipeline]]. */
  def pipeline(benchmarkPath: String): Pipeline =
    Pipeline(ops(benchmarkPath).map { case (n, p) =>
      OperatorRegistry.build(n, p)
    })
}
