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
      "bloom", "incremental", "token_budget", "span", "dsir", "clip", "bpe")
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
        ops("dsir") || ops("dsir_fast") || ops("clip") || ops("bpe")) {
      // materialize once so each probe times its operator, not the
      // corpus replication
      val corpus = docs1m(spark, sfDir)
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
    if (ops("embedding")) {
      val vecs = vectors1m(spark, sfDir)
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      val n = vecs.count()
      // the registered toy-scale banding (4-bit digests = 16 buckets per
      // band) floods at 1M vectors — Σ C(n/B,2)·B·bands joined rows is
      // quadratic in n for ANY fixed banding, so the 100 TB shape is
      // exact-collapse first (10 bit-identical copies per vector here →
      // 100k reps), then LSH with scale banding (12-bit digests, recall
      // at cos 0.95 = 1-(1-0.899^12)^16 ≈ 99.4%) on the reps only
      probe("dedup_embedding_collapsed", n) {
        val (repPairs, members) = EmbeddingNearDup(threshold = 0.95,
          bands = 16, bitsPerBand = 12, maxBucketSize = 1000)
          .collapsedLshPairs(vecs)
        repPairs.count() + members.count()
      }
      vecs.unpersist()
    }
    spark.stop()
  }
}
