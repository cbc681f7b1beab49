package graft

import graft.operators.dedup.{EmbeddingNearDup, IncrementalMinHashDedup, MinHashLSH}
import graft.operators.text.{CrossDocLineDedup, Decontaminator, MixtureSampler, TokenBudgetSampler}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY §5 scale probes: replicate the sf corpus to ~1M rows with a
  * group structure that keeps near-dup clusters CONSTANT-sized as the
  * corpus grows — each text group's words carry a group suffix (so
  * shingle clusters never cross groups), and each vector group is a
  * cyclic dimension shift (which preserves intra-group cosines exactly
  * and decorrelates groups) — then time operators end to end.
  *
  * {{{
  * SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 java … graft.ScaleProbe \
  *     [boilerplate mixture embedding bloom]     # default: all
  * }}}
  * Prints one `PROBE op rows_in rows_out seconds` line per operator.
  */
object ScaleProbe {

  /** 5k docs × 10 groups × 20 replicas = 1M. Group 0 keeps the original
    * vocabulary (so a benchmark built from the base corpus still hits
    * it); groups 1+ suffix every word. Replicas within a group are exact
    * duplicates at offset ids — the duplicate-heavy web-corpus shape. */
  def docs1m(spark: SparkSession, sfDir: String,
      groups: Int = 10, reps: Int = 20): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text", "source")
    docs
      .withColumn("__g", explode(sequence(lit(0), lit(groups - 1))))
      .withColumn("__r", explode(sequence(lit(0), lit(reps - 1))))
      .select(
        (col("doc_id") + (col("__g") * reps + col("__r")) * lit(10000000L))
          .as("doc_id"),
        when(col("__g") === 0, col("text"))
          .otherwise(regexp_replace(col("text"), lit("(\\S+)"),
            concat(lit("$1_g"), col("__g")))).as("text"),
        col("source"))
  }

  /** 2k vectors × 50 shift-groups × 10 replicas = 1M. */
  def vectors1m(spark: SparkSession, sfDir: String,
      groups: Int = 50, reps: Int = 10): DataFrame = {
    val emb = Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "embedding")
    val dim = 64
    emb
      .withColumn("__g", explode(sequence(lit(0), lit(groups - 1))))
      .withColumn("__r", explode(sequence(lit(0), lit(reps - 1))))
      .select(
        (col("vec_id") + (col("__g") * reps + col("__r")) * lit(10000000L))
          .as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => element_at(col("embedding"), pmod(i + col("__g"), lit(dim)) + 1))
          .as("embedding"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val ops = if (args.isEmpty) Set("boilerplate", "mixture", "embedding",
      "bloom", "incremental", "token_budget", "span", "dsir", "clip", "bpe",
      "topq", "cards", "normalize", "phash_hamming", "video", "audiofp",
      "datacard", "hardneg", "sourcegate", "overlap", "polyglot",
      "compact", "winsorize", "quantize", "pagerank", "percentiles",
      "drift", "bm25", "dedupeval", "fertility", "hardneg100k",
      "overlapsketch", "corpusdiff", "unimax", "ccnet", "ccnet_pruned",
      "softdedup", "protoprune", "bitext", "bigram", "doremi")
      else args.toSet
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def probe(name: String, rowsIn: Long)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val out = f
      println(f"PROBE $name rows_in=$rowsIn rows_out=$out ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    if (ops("boilerplate") || ops("mixture") || ops("bloom") ||
        ops("incremental") || ops("token_budget") || ops("span") ||
        ops("dsir") || ops("dsir_fast") || ops("clip") || ops("bpe") ||
        ops("topq") || ops("cards") || ops("normalize") ||
        ops("phash_hamming") || ops("video") || ops("audiofp") ||
        ops("audiofp_width") ||
        ops("datacard") || ops("sourcegate") || ops("overlap") ||
        ops("polyglot") || ops("compact") || ops("winsorize") ||
        ops("pagerank") || ops("percentiles") || ops("drift") ||
        ops("bm25") || ops("dedupeval") || ops("fertility") ||
        ops("overlapsketch") || ops("corpusdiff") ||
        ops("unimax") || ops("ccnet") || ops("ccnet_pruned") ||
        ops("softdedup") || ops("bigram") || ops("doremi")) {
      // materialize once so each probe times its operator, not the
      // corpus replication. REPARTITIONED to the core count: the
      // replicated corpus inherits the single sf-parquet file's 1-2
      // input partitions, which starves every map-only probe stage
      // down to ~1 core — a real 1M-doc corpus arrives as thousands
      // of files. (Probes whose first step is a shuffle were
      // unaffected; map-only probes before this fix measured
      // near-single-core numbers.)
      val corpus = docs1m(spark, sfDir)
        .repartition(cpus.toInt)
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      val n = corpus.count()
      if (ops("boilerplate")) {
        val withBp = corpus.withColumn("text", concat(
          lit("subscribe to our newsletter\n"), col("text"),
          lit("\ncopyright "), col("source")))
        // aggregate over the REBUILT text — a bare count() would let
        // Catalyst prune the whole line-strip computation away
        probe("boilerplate_removal", n)(
          CrossDocLineDedup(minDocs = 10)(withBp)
            .agg(sum(length(col("text")))).head().getLong(0))
      }
      if (ops("mixture"))
        probe("mixture_sample", n)(MixtureSampler().sample(corpus,
          Map("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2, "src3" -> 0.1),
          budget = 12000).count())
      if (ops("bloom")) {
        // the benchmark stays original-sized (bench sets don't grow with
        // the corpus); group 0 kept base vocabulary, so real hits exist
        val bench = Tables.load(spark, sfDir, "documents")
          .filter(col("doc_id") % 50 === 0)
        probe("decontaminate_bloom", n)(
          Decontaminator(n = 5).contaminatedIdsBloom(corpus, bench).count())
      }
      if (ops("token_budget"))
        probe("token_budget_sample", n)(TokenBudgetSampler()
          .sample(corpus, graft.functions.TextFns.wsTokenCount(col("text")),
            Map.empty, defaultBudget = 500000L).count())
      if (ops("unimax")) {
        // the million-domain story in miniature: refine the 20 sources
        // to 10k (source × id-hash) so the waterfill's two-phase
        // rank/prefix-sum over the SOURCE table actually has a table to
        // rank, and the greedy fill windows over 10k modest partitions
        // instead of 20 giant ones. Budget ~1/4 of the corpus's tokens
        // with a 2-epoch cap → a capped prefix AND a waterfilled tail
        val fine = corpus.withColumn("source",
          concat(col("source"), lit("_"), pmod(col("doc_id"), lit(500L))))
        probe("mixture_unimax_10ksrc", n)(
          graft.operators.text.UniMaxSampler(epochCap = 2)
            .sample(fine, graft.functions.TextFns.wsTokenCount(col("text")),
              totalBudget = 15000000L).count())
      }
      if (ops("ccnet") || ops("ccnet_pruned")) {
        // 7 synthetic languages over the suffixed-vocab corpus (vocab
        // ~10× base — the LM join's real scale test); thresholds
        // from the bounded HistCdf, so no corpus-wide sort anywhere.
        // Since r16 the full-vocab LM joins UNHINTED (AQE picks the
        // side — the r15 verdict's broadcast-ceiling fix), so this
        // probe is the evidence the join SURVIVES with the hint gone;
        // ccnet_pruned is the production recipe (top-50k/lang + OOV
        // floor, hint restored on the now-bounded table)
        val withLang = corpus.withColumn("lang",
          concat(lit("lang"), pmod(col("doc_id"), lit(7L))))
        if (ops("ccnet"))
          probe("ccnet_buckets", n)(
            graft.operators.text.CcnetBucketer()(withLang)
              .groupBy("bucket").count().agg(sum("count")).head().getLong(0))
        if (ops("ccnet_pruned"))
          probe("ccnet_buckets_pruned50k", n)(
            graft.operators.text.CcnetBucketer(maxVocabPerLang = 50000)(withLang)
              .groupBy("bucket").count().agg(sum("count")).head().getLong(0))
      }
      if (ops("bigram")) {
        // the three-table backoff LM at 1M docs: counts bounded by the
        // (bi)gram vocabulary, joins unhinted (AQE), corpus payload
        // never shuffles. agg over scores so nothing prunes away
        val sc = graft.operators.text.BigramPerplexityScorer()
        probe("perplexity_bigram", n) {
          sc.scores(corpus).agg(sum("perplexity")).head(); n
        }
        probe("perplexity_bigram_pruned50k", n) {
          graft.operators.text.BigramPerplexityScorer(
            maxVocab = 50000, maxBigrams = 200000).scores(corpus)
            .agg(sum("perplexity")).head(); n
        }
      }
      if (ops("doremi")) {
        // per-round cost = one groupBy(domain) over a hash-filtered
        // stream; the loss column here is a cheap deterministic
        // stand-in (the probe prices the LOOP, not the LM scorers —
        // those are priced by the bigram probe above)
        val ex = corpus.select(col("doc_id"), col("source"),
          (pmod(xxhash64(col("doc_id")), lit(1000)) / 1000.0)
            .as("excess_loss"))
        probe("doremi_weights_4r", n)(
          graft.operators.text.DoremiMixer(rounds = 4,
            batchPerRound = 100000L).weights(ex).count())
      }
      if (ops("softdedup")) {
        // the dup-heavy corpus is soft dedup's home turf: 20 replicas
        // per group text → weight ~1/20 for every replicated doc.
        // agg over the weights so Catalyst can't prune the df join
        probe("soft_dedup_weights", n)(
          graft.operators.dedup.SoftDedup(n = 3).weights(corpus)
            .agg(count(when(col("weight") < 1.0, 1)))
            .head().getLong(0))
        probe("soft_dedup_sample", n)(
          graft.operators.dedup.SoftDedup(n = 3).sample(corpus, k = 100000)
            .count())
      }
      if (ops("span")) {
        // duplicate-heavy worst case: every replica repeats its group's
        // text 20×, so ~every n-gram is corpus-duplicated and nearly
        // every token is cut — the probe times the full pipeline at its
        // maximum coverage volume. agg over the rebuilt text so the
        // left join can't be pruned by a bare count()
        probe("span_removal", n)(
          graft.operators.text.DuplicatedSpanRemover(n = 3)(corpus)
            .agg(sum(length(col("text"))) + sum(col("n_removed")))
            .head().getLong(0))
      }
      if (ops("dsir") || ops("dsir_fast")) {
        // target stays benchmark-sized (1/50th of the BASE corpus,
        // group-0 vocabulary) while raw grows — the DSIR deployment
        // shape: tiny in-domain exemplar set, huge raw crawl
        val target = Tables.load(spark, sfDir, "documents")
          .filter(col("doc_id") % 50 === 0)
        if (ops("dsir"))
          probe("dsir_select", n)(
            graft.operators.text.DsirSelector()
              .resample(corpus, target, k = 10000).count())
        // the production-recipe hash lever: same pipeline, native
        // xxhash64 bucketing instead of the engine-portable md5
        if (ops("dsir_fast"))
          probe("dsir_select_fast", n)(
            graft.operators.text.DsirSelector(fastHash = true)
              .resample(corpus, target, k = 10000).count())
      }
      if (ops("clip")) {
        // dual-tower alignment is map-only — this probes raw encode
        // throughput at 1M pairs; agg over the score so the pass runs
        val pairs = corpus
          .withColumn("image", col("text").cast("binary"))
          .withColumn("caption", reverse(col("text")))
        probe("clip_score", n)(
          graft.operators.ml.CrossModalAlignment(threshold = 0.99)
            .scored(pairs).agg(sum(col("clip_score"))).head().getDouble(0).toLong)
      }
      if (ops("bpe")) {
        // 5 merges over the 1M-doc word-freq dictionary; the corpus is
        // read once (wordFreq), iterations touch only the word table
        probe("bpe_train_5merges", n)(
          graft.operators.text.DistributedBpeTrainer.fit(corpus, 5).count())
      }
      if (ops("topq"))
        // exact per-source top 20% by token count at 1M — the histogram
        // path; integer scores force the boundary tie machinery
        probe("quality_topq", n)(
          graft.operators.text.TopFractionByGroup(frac = 0.2)(
            corpus.withColumn("score",
              graft.functions.TextFns.wsTokenCount(col("text")).cast("long")))
            .count())
      if (ops("cards"))
        // Luhn verification at 1M: every doc carries one card-shaped
        // number (half valid, half failing the checksum)
        probe("pii_credit_card", n)(
          graft.operators.text.CreditCardRedactor()(
            corpus.withColumn("text", concat(col("text"),
              when(col("doc_id") % 2 === 0, lit(" 4111 1111 1111 1111"))
                .otherwise(lit(" 4111-1111-1111-1112")))))
            .agg(sum(col("n_cards")) + sum(length(col("text"))))
            .head().getLong(0))
      if (ops("normalize"))
        probe("text_normalize", n)(
          graft.operators.text.UnicodeNormalizer()(
            corpus.withColumn("text", concat(col("text"),
              lit(" cafÃ© éclair"))))
            .agg(sum(col("n_mojibake_chars")) + sum(length(col("text"))))
            .head().getLong(0))
      if (ops("phash_hamming"))
        // 1M 60-bit hashes, every doc with a planted flipped-bits twin
        // (the key's recipe at 2000x the rows)
        probe("dedup_phash_hamming", n * 2) {
          val base = corpus.select(col("doc_id"),
            conv(substring(md5(col("text")), 1, 15), 16, 10).cast("long")
              .as("phash"))
          val nf = pmod(col("doc_id"), lit(4L))
          val mask = (0 until 3).map { i =>
            val pos = pmod(pmod(col("doc_id"), lit(47L)) + lit(i * 13), lit(60L))
            when(nf >= i + 1, pow(lit(2.0), pos).cast("long")).otherwise(lit(0L))
          }.reduce(_ bitwiseOR _)
          val copies = base.select((col("doc_id") + lit(1000000000L)).as("doc_id"),
            col("phash").bitwiseXOR(mask).as("phash"))
          graft.operators.image.PhashHammingDedup(radius = 2)
            .flagged(base.unionByName(copies)).filter(col("keep")).count()
        }
      if (ops("video"))
        probe("dedup_video_frames", n)(
          graft.operators.image.VideoFrameDedup()(
            corpus.withColumn("video", repeat(col("text"), 4).cast("binary")))
            .count())
      if (ops("audiofp"))
        // the decode-UDF kernel at 1M clips: WAV construct + parse +
        // integer-window fingerprint per row
        probe("audio_fingerprint", n)(
          corpus.select(graft.operators.image.AudioKernels.audioFingerprint(
              graft.operators.image.AudioKernels.textWav(col("text"))).as("fp"))
            .agg(count(col("fp"))).head().getLong(0))
      if (ops("audiofp_width")) {
        // the §5.13 width experiment: natural-collision (false-merge)
        // rate of the 16-bit vs 32-bit contour over the corpus's
        // DISTINCT clips — replicas are exact copies (true dups), so
        // only the distinct-text set measures saturation
        import graft.operators.image.AudioKernels
        val distinctClips = corpus.dropDuplicates("text")
          .select(col("doc_id"),
            AudioKernels.textWav(col("text")).as("audio"))
          .localCheckpoint()
        val nClips = distinctClips.count()
        for (w <- Seq(17, 33)) {
          // distinct contours (resolution) AND the false-merge count:
          // fingerprints shared ACROSS different base docs. Same-base
          // group variants sharing a contour are near-dup family
          // members (the suffix perturbation moves no window energy
          // sign — the §5.13 space-count-domination); only cross-base
          // sharing merges genuinely unrelated clips.
          val fps = distinctClips.select(
            pmod(col("doc_id"), lit(10000000L)).as("base"),
            AudioKernels.audioFingerprint(col("audio"), w).as("fp"))
            .filter(col("fp").isNotNull).localCheckpoint()
          probe(s"audiofp_width_w${w}_distinct", nClips)(
            fps.agg(countDistinct(col("fp"))).head().getLong(0))
          probe(s"audiofp_width_w${w}_crossbase", nClips)(
            fps.groupBy("fp")
              .agg(countDistinct(col("base")).as("nb"))
              .filter(col("nb") >= 2).count())
        }
      }
      if (ops("datacard"))
        probe("corpus_datacard", n)(
          graft.operators.CorpusDatacard(langCol = "source")(corpus).count())
      if (ops("sourcegate"))
        // domain-level gate at 1M: even-numbered sources keep the fully
        // replicated text (dup_frac 1.0 → flagged), odd sources salt
        // each doc unique (dup_frac 0 → pass) — both branches of the
        // verdict arithmetic run, ~half the corpus survives
        probe("source_flagging", n)(
          graft.operators.text.SourceQualityGate(maxDupFrac = 0.5)(
            corpus.withColumn("text",
              when(substring(col("source"), 4, 10).cast("int") % 2 === 0,
                col("text"))
                .otherwise(concat(col("text"), lit(" "), col("doc_id")))))
            .count())
      if (ops("overlap")) {
        // graded overlap with a benchmark-sized right side (bench sets
        // don't grow with the corpus; group 0 keeps base vocabulary)
        val bench = Tables.load(spark, sfDir, "documents")
          .filter(col("doc_id") % 50 === 0)
        probe("contamination_overlap", n)(
          Decontaminator(n = 5).overlapStats(corpus, bench)
            .agg(sum(col("n_shared")) + sum(col("n_ngrams")))
            .head().getLong(0))
      }
      if (ops("polyglot"))
        // map-only per-line langid at 1M: every doc gets a German
        // second line; agg over the signals so nothing prunes away
        probe("lang_consistency", n)(
          graft.operators.text.PolyglotDetector()(
            corpus.withColumn("text", concat(col("text"),
              lit("\nder hund und die katze ist nicht ein zu"))))
            .agg(sum(col("n_foreign_lines")) + sum(col("n_id_lines")))
            .head().getLong(0))
      if (ops("compact"))
        // keep-latest over 1M rows, ~50k keys: one max_by aggregate
        probe("snapshot_compact", n)(
          graft.operators.events.SnapshotCompactor(
            Seq("__k", "source"), versionCol = "doc_id", idCol = "doc_id")(
            corpus.withColumn("__k", pmod(col("doc_id"), lit(50000L))))
            .count())
      if (ops("winsorize")) {
        // histogram-CDF clipping at 1M rows over a ~49k-value rounded
        // domain (precision-bounded histogram)
        probe("events_winsorize", n)(
          graft.operators.events.Winsorizer(valueCol = "__v")(
            corpus.withColumn("__v",
              pmod(col("doc_id") * 37L, lit(49000L)) / 100.0))
            .agg(sum(col("__v_clipped"))).head().getDouble(0).toLong)
        // the heavy-tail case the two-phase HistCdf cumsum exists for:
        // EVERY row a distinct rounded value (10⁶-row histogram) — the
        // old Window.orderBy cumsum funneled all of it through one
        // partition; now no window sees more than one range span
        probe("events_winsorize_1m_distinct", n)(
          graft.operators.events.Winsorizer(valueCol = "__v", precision = 6)(
            corpus.withColumn("__v", col("doc_id").cast("double") / 1000000.0))
            .agg(sum(col("__v_clipped"))).head().getDouble(0).toLong)
      }
      if (ops("bm25"))
        // 100 queries against the 1M-doc inverted index: index build
        // (two map-side aggregates) + broadcast query join + top-5
        probe("bm25_search", n) {
          val queries = Tables.load(spark, sfDir, "documents")
            .filter(col("doc_id") % 5 === 0).limit(100)
            .select(col("doc_id").as("query_id"),
              substring(col("text"), 1, 40).as("text"))
          graft.operators.text.Bm25().search(corpus, queries, k = 5).count()
        }
      if (ops("overlapsketch")) {
        // crawl-over-crawl overlap at 1M vs 1M: two narrow
        // distinct+TakeOrdered passes and a 2k-row driver merge —
        // the exact overlapStats content join never happens
        val b = corpus.withColumn("text",
          when(col("doc_id") % 10 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")))
        probe("corpus_overlap_sketch", n * 2)(
          graft.operators.CorpusOverlapSketch(k = 1024)
            .estimate(corpus, b).count())
      }
      if (ops("corpusdiff")) {
        // 1M-vs-1M changelog: narrow (id, md5) full-outer merge
        val b = corpus.filter(col("doc_id") % 20 =!= 0).withColumn("text",
          when(col("doc_id") % 10 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")))
        probe("corpus_diff", n * 2)(
          graft.operators.CorpusDiff().summary(corpus, b)
            .agg(sum("n")).head().getLong(0))
      }
      if (ops("dedupeval")) {
        // recall/precision harness at 2M docs (1M + 1M planted twins),
        // on top of the replica structure's 20-copy clusters — the
        // candidate set is the pair-explosion stress case
        val mh2 = MinHashLSH(numHashes = 12, bands = 4, shingleSize = 3)
        val base = corpus.select("doc_id", "text")
        val twins = base.select((col("doc_id") + 2000000000L).as("doc_id"),
          concat(col("text"), lit(" planted twin suffix")).as("text"))
        val truth = base.select(col("doc_id").as("id_a"),
          (col("doc_id") + 2000000000L).as("id_b"))
        probe("dedup_eval_minhash", n * 2)(
          graft.operators.dedup.DedupEval
            .prf(mh2.candidatePairs(base.unionByName(twins)), truth)
            .head().getAs[Long]("n_hits"))
      }
      if (ops("fertility"))
        probe("tokenizer_fertility", n)(
          graft.operators.TokenizerFertility(langCol = "source")(corpus)
            .count())
      if (ops("drift")) {
        // release-over-release PSI at 1M vs 1M: per feature two bucket
        // counts + a tiny joined-histogram sum
        val a = corpus.withColumn("lang", col("source"))
        val b = a.filter(col("doc_id") % 5 =!= 0)
          .withColumn("text", when(col("doc_id") % 3 === 0,
            substring(col("text"), 1, 50)).otherwise(col("text")))
        probe("corpus_drift", n * 2)(
          graft.operators.CorpusDrift(threshold = 0.05).report(a, b).count())
      }
      if (ops("pagerank"))
        // 5 iterations over a 1M-node 2-out graph: per iteration one
        // co-partitioned hash join + one map-side-combined sum
        probe("page_rank", n) {
          val nodes = corpus.select("doc_id")
          val edges = nodes.select(col("doc_id").as("src"),
            explode(array(
              pmod(col("doc_id") * 131 + 7919, lit(999983L)),
              pmod(col("doc_id") * 137 + 104729, lit(999983L)))).as("dst"))
          graft.operators.graph.PageRank(iterations = 5)(edges, nodes)
            .agg((sum(col("rank")) * 1e6).cast("long")).head().getLong(0)
        }
      if (ops("percentiles"))
        probe("events_percentiles", n)(
          graft.operators.events.GroupedPercentiles(
            Seq(0.5, 0.95, 0.99), groupCol = "source", valueCol = "__v")(
            corpus.withColumn("__v",
              pmod(col("doc_id") * 37L, lit(49000L)) / 100.0))
            .count())
      if (ops("incremental")) {
        // daily-ingest shape: 60% of the corpus is already indexed (the
        // narrow band-bucket table is materialized — at 100 TB it lives
        // in parquet); the probe times ONLY the 40% batch's cost:
        // shingling + two (band, bucket) equi-joins
        val mh = MinHashLSH(numHashes = 12, bands = 4, shingleSize = 3)
        val index = mh.buckets(corpus.filter(col("doc_id") % 5 < 3))
          .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
        index.count()
        val batch = corpus.filter(col("doc_id") % 5 >= 3)
        probe("dedup_incremental", n * 2 / 5)(
          IncrementalMinHashDedup(mh).survivors(index, batch).count())
        index.unpersist()
      }
      corpus.unpersist()
    }
    if (ops("embedding") || ops("hardneg") || ops("hardneg100k") ||
        ops("quantize") || ops("protoprune") || ops("bitext")) {
      // same repartition rationale as the docs corpus above: the
      // replicated vectors inherit the single parquet file's input
      // partitioning, starving map-only stages (the broadcast-argmin
      // assign) to ~1 core
      val vecs = vectors1m(spark, sfDir)
        .repartition(cpus.toInt)
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      val n = vecs.count()
      if (ops("hardneg") || ops("hardneg100k")) {
        // 1024 deterministic first-k centroids (the √n rule at 1M);
        // anchors = a 10k query batch, the training-loop shape
        val cents = vecs.filter(col("vec_id") < 1024)
          .select(col("vec_id").cast("int").as("centroid_id"),
            transform(col("embedding"), x => x.cast("double")).as("cvec"))
        if (ops("hardneg"))
          probe("hard_negatives", n)(
            graft.operators.vector.HardNegativeMiner(lo = 0.0, hi = 0.95, k = 3)
              .mine(vecs, cents, nprobe = 2,
                anchorPred = col("vec_id") % 100 === 0).count())
        if (ops("hardneg100k")) {
          // the real contrastive-training shape: EVERY 10th vector is an
          // anchor (100k). Track the straggler explicitly — per-anchor
          // candidate volume is cell-size-bound, so a skewed cell shows
          // up as one long rank-window task before it shows up in wall
          val maxTask = new java.util.concurrent.atomic.AtomicLong(0)
          val listener = new org.apache.spark.scheduler.SparkListener {
            override def onTaskEnd(
                te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
              if (te.taskInfo != null)
                maxTask.updateAndGet(m => math.max(m, te.taskInfo.duration))
          }
          spark.sparkContext.addSparkListener(listener)
          probe("hard_negatives_100k", n)(
            graft.operators.vector.HardNegativeMiner(lo = 0.0, hi = 0.95, k = 3)
              .mine(vecs, cents, nprobe = 2,
                anchorPred = col("vec_id") % 10 === 0).count())
          spark.sparkContext.removeSparkListener(listener)
          println(f"PROBE_DETAIL hard_negatives_100k max_task=${maxTask.get / 1000.0}%.1f s")
        }
      }
      // the registered toy-scale banding (4-bit digests = 16 buckets per
      // band) floods at 1M vectors — Σ C(n/B,2)·B·bands joined rows is
      // quadratic in n for ANY fixed banding, so the 100 TB shape is
      // exact-collapse first (10 bit-identical copies per vector here →
      // 100k reps), then LSH with scale banding (12-bit digests, recall
      // at cos 0.95 = 1-(1-0.899^12)^16 ≈ 99.4%) on the reps only
      if (ops("bitext")) {
        // B76's 100 TB recipe end to end: candidates from a 16-bit LSH
        // bucket equi-join (the B7 generator — 65k buckets over 100k
        // distinct vectors keeps the pair volume ~4M, never 500k²),
        // margin layer + mutual argmax over them. Sides = even/odd ids
        // (identical replicas straddle sides, so exact matches exist).
        val lsh = graft.operators.vector.LshAnn(dim = 64, nbits = 16)
        val xs = lsh.withBuckets(vecs.filter(col("vec_id") % 2 === 0))
          .select(col("vec_id").as("x_id"), col("embedding").as("__xv"),
            col("bucket"))
        val ys = lsh.withBuckets(vecs.filter(col("vec_id") % 2 === 1))
          .select(col("vec_id").as("y_id"), col("embedding").as("__yv"),
            col("bucket"))
        val cands = xs.join(ys, Seq("bucket"))
          .select(col("x_id"), col("y_id"),
            round(graft.functions.VecFns.cosine(col("__xv"), col("__yv")), 6)
              .as("cos"))
        probe("bitext_lsh_1m", n)(
          graft.operators.vector.MarginBitextMiner(k = 4, threshold = 1.0)
            .mineFromCandidates(cands).count())
      }
      if (ops("embedding"))
        probe("dedup_embedding_collapsed", n) {
          val (repPairs, members) = EmbeddingNearDup(threshold = 0.95,
            bands = 16, bitsPerBand = 12, maxBucketSize = 1000)
            .collapsedLshPairs(vecs)
          repPairs.count() + members.count()
        }
      if (ops("protoprune")) {
        // D4's diversify half at 1M vectors: broadcast-argmin assign +
        // one cosine per row + the GroupQuota histogram selection over
        // 1024 cells (the √n rule) — rounded-proto histogram stays
        // bounded, so no per-cluster sort of the corpus
        val cents = vecs.filter(col("vec_id") < 1024)
          .select(col("vec_id").cast("int").as("centroid_id"),
            transform(col("embedding"), x => x.cast("double")).as("cvec"))
        probe("prototype_prune", n)(
          graft.operators.vector.PrototypePruner(keepFrac = 0.6)(vecs, cents)
            .count())
      }
      if (ops("quantize")) {
        // int8 encode+decode at 1M vectors: one bounded stats pass,
        // then two map-only transforms; agg a reconstruction checksum
        val vq = graft.operators.vector.VectorQuantizer()
        probe("embedding_quantize_int8", n)(
          vq.compressed(vecs)
            .agg(sum(element_at(col("embedding"), 1))).head().getDouble(0).toLong)
      }
      vecs.unpersist()
    }
    spark.stop()
  }
}
