package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection with importance resampling (Xie et al.
  * 2023, arXiv:2302.03169 "Data Selection for Language Models via
  * Importance Resampling"): score each raw document by how much more
  * likely its hashed n-gram features are under a TARGET distribution
  * (a high-quality exemplar set — curated wiki/books, an in-domain
  * corpus) than under the RAW distribution, then resample top-k by
  * importance weight. This is the selection family the reference's
  * quality models feed (operators/refiners — model-scored filtering);
  * DSIR replaces the trained scorer with closed-form n-gram statistics,
  * so it runs before any model exists.
  *
  * Features are hashed unigrams + bigrams over normalized tokens,
  * folded into `buckets` counts (the paper's hashed n-gram model; the
  * hash is an md5 prefix so any engine reproduces the bucketing).
  * Per-bucket log-likelihood-ratio:
  *
  *   λ(b) = ln p̂_target(b) − ln p̂_raw(b),   p̂(b) = (cnt(b)+α)/(N+αB)
  *
  * and a document's score is Σ_features λ(bucket(f)) — evaluated as an
  * explode → broadcast join on the λ table → per-doc sum.
  *
  * Scale shape: both distribution tables are ≤ `buckets` rows (config
  * constant — broadcastable at any corpus size), built by one
  * map-side-combined groupBy each; scoring joins the corpus feature
  * stream against the broadcast λ table and re-aggregates per doc —
  * the corpus payload itself never shuffles (selection comes back as a
  * semi join on the id). Resampling is the Gumbel-top-k trick: adding
  * G = −ln(−ln U) to a log-weight and taking the global top-k draws k
  * documents without replacement with probability proportional to the
  * importance weight — and U here is a salted-md5 uniform
  * ([[HashSampler]]'s 28-bit family), so the "randomness" is a pure
  * deterministic column: rerun-stable on any cluster layout and
  * replayable by a SQL oracle. The global top-k is a TakeOrdered (heap
  * per partition + k-row driver merge), never a full sort. */
case class DsirSelector(
    buckets: Int = 1024,
    alpha: Double = 1.0,
    seed: String = "dsir",
    idCol: String = "doc_id",
    textCol: String = "text",
    fastHash: Boolean = false) {
  require(buckets > 0 && alpha > 0.0, "buckets and alpha must be positive")

  /** Feature bucket in [0, buckets). Default: md5-prefix (the
    * engine-portable [[HashSampler]] hash family — any engine replays
    * the bucketing, which is what the oracle checks). `fastHash`
    * switches to the native codegen'd xxhash64 — statistically
    * equivalent bucketing (any uniform hash serves the hashed n-gram
    * model identically), JVM-only, measured 8.7× on the whole 1M-doc
    * selection (303 → 35 s — SURVEY §14: with the probe corpus
    * properly partitioned, the per-occurrence md5 IS the md5 path's
    * cost) — the production recipe at 100 TB. */
  private def bucketOf(feat: Column): Column =
    if (fastHash)
      pmod(xxhash64(feat, lit(":" + seed)), lit(buckets.toLong))
    else
      pmod(conv(substring(md5(concat(feat, lit(":" + seed))), 1, 7), 16, 10)
        .cast("long"), lit(buckets.toLong))

  /** (idCol, __bucket) — one row per unigram+bigram occurrence. The
    * token array is let-bound once (two separate wordShingles calls
    * would each re-run the normalize+split tree per row). */
  private def features(df: DataFrame): DataFrame = {
    import graft.functions.TextFns.{normalizeText, wsTokens}
    val feats = graft.functions.Cols.bind(
      wsTokens(normalizeText(col(textCol)))) { toks =>
      concat(toks,
        when(size(toks) < 2, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(1), size(toks) - 1),
            i => concat_ws(" ", slice(toks, i, lit(2))))))
    }
    df.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol), explode(feats).as("__f"))
      .select(col(idCol), bucketOf(col("__f")).as("__bucket"))
  }

  /** Per-bucket occurrence counts (≤ `buckets` rows). */
  private def bucketCounts(df: DataFrame): DataFrame =
    features(df).groupBy("__bucket").agg(count(lit(1)).as("__cnt"))

  /** The λ table from two pre-aggregated bucket tables, with
    * additive-α smoothing so unseen buckets stay finite. Rounded to
    * 9 dp — portable across engines evaluating the same doubles. */
  private def lamOf(t: DataFrame, r: DataFrame): DataFrame = {
    val tTot = t.agg(sum(col("__ct")).as("__tt"))
    val rTot = r.agg(sum(col("__cr")).as("__rt"))
    val aB = alpha * buckets
    t.join(r, Seq("__bucket"), "full_outer")
      .crossJoin(broadcast(tTot)).crossJoin(broadcast(rTot))
      .select(col("__bucket"),
        round(
          log((coalesce(col("__ct"), lit(0L)) + alpha) / (col("__tt") + aB)) -
          log((coalesce(col("__cr"), lit(0L)) + alpha) / (col("__rt") + aB)),
          9).as("lam"))
  }

  /** The λ table: (__bucket, lam) for every bucket either side
    * populates. */
  def logRatios(raw: DataFrame, target: DataFrame): DataFrame =
    lamOf(bucketCounts(target).withColumnRenamed("__cnt", "__ct"),
      bucketCounts(raw).withColumnRenamed("__cnt", "__cr"))

  /** (idCol, dsir_score): Σ λ over the document's hashed feature
    * occurrences, rounded to 6 dp. Documents with no features (blank
    * text) score 0.
    *
    * Scale shape: the corpus tokenizes TWICE and materializes NOTHING
    * in between — pass 1 (the raw distribution) map-side combines the
    * feature stream down to ≤ `buckets` rows per partition before its
    * ≤ `buckets`-row shuffle; pass 2 joins the feature stream to the
    * broadcast λ table and map-side combines the per-doc sums, so its
    * shuffle is one row per document. The earlier design materialized
    * the per-(doc, bucket) counts between the passes (localCheckpoint)
    * to tokenize once; at 1M docs that intermediate is ~10⁸ narrow
    * rows, and writing + twice re-reading it cost far more than the
    * second codegen'd tokenize pass it saved (probe row, SURVEY §14 —
    * 1062 s → re-measured after this change). */
  def scored(raw: DataFrame, target: DataFrame): DataFrame = {
    val feats = features(raw)
    val r = feats.groupBy("__bucket").agg(count(lit(1)).as("__cr"))
    val t = bucketCounts(target).withColumnRenamed("__cnt", "__ct")
    val lam = lamOf(t, r)
    val sums = feats
      .join(broadcast(lam), Seq("__bucket"))
      .groupBy(idCol)
      .agg(round(sum(col("lam")), 6).as("dsir_score"))
    raw.select(col(idCol)).join(sums, Seq(idCol), "left")
      .withColumn("dsir_score", coalesce(col("dsir_score"), lit(0.0)))
  }

  /** Deterministic Gumbel noise for the resampling draw: U is the
    * (h+0.5)/2^24 salted-md5 uniform (24-bit prefix; never exactly 0
    * or 1), G = −ln(−ln U), rounded 6 dp. */
  private def gumbel: Column =
    round(-log(-log((conv(substring(md5(concat(col(idCol).cast("string"),
      lit(":" + seed + ":gum"))), 1, 6), 16, 10).cast("double") + 0.5) /
      16777216.0)), 6)

  /** Gumbel-top-k importance resampling: k ids drawn without
    * replacement with probability ∝ exp(dsir_score / temperature).
    * Returns (idCol, dsir_score, rnk) with rnk 1..k by the perturbed
    * weight (ties broken by id). `temperature` flattens (>1) or
    * sharpens (<1) the draw; temperature → 0 degrades to plain top-k
    * by score. */
  def resample(raw: DataFrame, target: DataFrame, k: Int,
      temperature: Double = 1.0): DataFrame = {
    require(k > 0 && temperature > 0.0, "k and temperature must be positive")
    // orderBy+limit is a TakeOrdered (per-partition heap + k-row driver
    // merge), so the global draw never full-sorts the corpus; the
    // row_number window then ranks only the k surviving rows.
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__adj").desc, col(idCol).asc)
    scored(raw, target)
      .withColumn("__adj", round(col("dsir_score") / temperature + gumbel, 6))
      .orderBy(col("__adj").desc, col(idCol).asc).limit(k)
      .withColumn("rnk", row_number().over(w))
      .select(col(idCol), col("dsir_score"), col("rnk"))
  }

  /** Full-row selection: the resampled corpus subset (semi join on the
    * drawn ids — the wide payload never sorts or shuffles for the
    * draw). */
  def select(raw: DataFrame, target: DataFrame, k: Int,
      temperature: Double = 1.0): DataFrame =
    raw.join(resample(raw, target, k, temperature).select(idCol),
      Seq(idCol), "left_semi")
}

/** CCNet perplexity bucketing (Wenzek et al. 2020, arXiv:1911.00359
  * "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
  * Data"): score every document against a language model of ITS OWN
  * language and split each language into equal-count head / middle /
  * tail terciles by perplexity — head = most-fluent third, the slice
  * CCNet ships as the high-quality corpus, tail = the crawl noise.
  * Bucketing per language (not globally) is the paper's point: raw
  * perplexity scales are not comparable across languages, so a global
  * cut would keep easy languages wholesale and drop hard ones.
  *
  * The LM is the corpus's own per-language unigram model (the
  * [[PerplexityScorer]] stand-in for CCNet's KenLM — same seam, a real
  * KenLM drops in per language), perplexity rounded to 4 dp so any
  * engine reproduces the score. Tercile thresholds are VALUE
  * thresholds from the per-language (lang, perplexity)-histogram CDF —
  * `t_q = min{v : cdf(v) ≥ ⌈q·n⌉}` — so tied scores always share a
  * bucket and the bucketing is rerun-stable (no row_number over the
  * corpus, no approximate quantiles).
  *
  * Scale shape: the per-language LM is one map-side-combined groupBy
  * (rows = Σ per-language vocab — broadcastable, the PerplexityScorer
  * argument); scoring re-aggregates the token stream per doc; the
  * histogram is bounded by distinct (lang, rounded-pp) values, its CDF
  * runs through the bounded-window [[graft.operators.events.HistCdf]]
  * machinery, and the threshold table (one row per language) joins
  * back broadcast. The corpus payload never shuffles. Docs with no
  * tokens have no perplexity and are excluded, matching the
  * `perplexity` key's convention. */
case class CcnetBucketer(idCol: String = "doc_id", textCol: String = "text",
    langCol: String = "lang", maxVocabPerLang: Int = 0, oovAlpha: Double = 1.0) {
  require(maxVocabPerLang >= 0 && oovAlpha > 0.0,
    "maxVocabPerLang must be >= 0 and oovAlpha positive")
  import graft.functions.TextFns.{normalizeText, wsTokens}
  import graft.operators.events.HistCdf

  /** Top-`maxVocabPerLang` (lang, token, count) rows by
    * (count DESC, token ASC) within each language — the CCNet
    * pruned-KenLM move, and the fix for the r15 verdict's one
    * scale-killer plan (a hinted broadcast of an unbounded
    * vocabulary). Exact per-group top-k WITHOUT a one-task-per-language
    * sort (an English web-crawl vocab can be 10⁸⁺ rows): the
    * [[graft.operators.vector.HardNegativeMiner]] salted two-level
    * discipline — stage 1 ranks inside 64 hash-salted sub-partitions
    * per language (any global top-k row is top-k within its own salt
    * slice), stage 2 re-ranks the ≤ 64·k survivors per language. */
  private def pruned(counts: DataFrame): DataFrame =
    graft.operators.TopK.perGroup(counts,
      group = Seq(col(langCol)),
      order = Seq(col("__n").desc, col("t").asc),
      saltOn = col("t"), k = maxVocabPerLang, salts = 64)

  /** (idCol, langCol, perplexity): per-doc perplexity under the
    * document's own language's unigram LM. With `maxVocabPerLang > 0`
    * the LM is pruned to the per-language top-k and OOV tokens score
    * at a per-language floor ln(oovAlpha/total) — total is UNPRUNED,
    * so kept tokens' probabilities are unchanged by pruning and
    * capped ≡ uncapped whenever the true vocab fits (gated by
    * PerplexityPruneSpec). Only the pruned (bounded-by-construction)
    * LM carries a broadcast hint; the full-vocab LM joins unhinted so
    * AQE picks the side — a too-big vocabulary degrades to a shuffle
    * join instead of a broadcast-ceiling crash. */
  def scores(df: DataFrame): DataFrame = {
    // blank docs carry no fluency signal and must not seed the LM with
    // an empty-string token (wsTokens("") is [""], not [])
    val toks = df.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol), col(langCol),
        explode(wsTokens(normalizeText(col(textCol)))).as("t"))
    // counts feeds THREE consumers (totals, the pruned top-k, the LM
    // join) — materialize it once or each re-runs the corpus
    // tokenize+explode+groupBy subtree. Narrow and bounded by Σ
    // per-language vocab (never the token stream), so the checkpoint
    // is scale-safe where checkpointing `toks` would not be.
    val counts = toks.groupBy(langCol, "t").agg(count(lit(1)).as("__n"))
      .localCheckpoint()
    val totals = counts.groupBy(langCol).agg(sum("__n").as("__total"))
    val kept = if (maxVocabPerLang > 0) pruned(counts) else counts
    val lm = kept.join(broadcast(totals.withColumnRenamed(langCol, "__lmlang")),
        col(langCol) <=> col("__lmlang"))
      .select(col(langCol).as("__lang"), col("t").as("__t"),
        log(col("__n").cast("double") / col("__total").cast("double")).as("__logp"))
    // one row per language — always broadcastable
    val floors = totals.select(col(langCol).as("__flang"),
      log(lit(oovAlpha) / col("__total").cast("double")).as("__floor"))
    val hinted = if (maxVocabPerLang > 0) broadcast(lm) else lm
    toks.join(hinted,
        col(langCol) <=> col("__lang") && col("t") === col("__t"), "left")
      .join(broadcast(floors), col(langCol) <=> col("__flang"))
      .groupBy(idCol, langCol)
      .agg(round(exp(-avg(coalesce(col("__logp"), col("__floor")))), 4)
        .as("perplexity"))
  }

  /** (idCol, langCol, perplexity, bucket) with bucket ∈
    * {head, middle, tail} by per-language terciles. */
  def apply(df: DataFrame): DataFrame = {
    // the narrow score table feeds BOTH the threshold histogram and the
    // final join-back — materialize it once (the SemanticDedup
    // assignedOf discipline) instead of re-running the LM join + token
    // re-aggregation per reference
    val sc = scores(df).localCheckpoint()
    val hist = sc.groupBy(col(langCol), col("perplexity"))
      .agg(count(lit(1)).as("__c"))
    val cdf = HistCdf.withCdf(hist, Seq(langCol), "perplexity", "__c")
    val thr = cdf.groupBy(langCol).agg(
      min(when(col("__cum") >= ceil(col("__n") / 3.0), col("perplexity")))
        .as("__t1"),
      min(when(col("__cum") >= ceil(lit(2.0) * col("__n") / 3.0),
        col("perplexity"))).as("__t2"))
      .withColumnRenamed(langCol, "__thrlang")
    sc.join(broadcast(thr), col(langCol) <=> col("__thrlang"))
      .select(col(idCol), col(langCol), col("perplexity"),
        when(col("perplexity") <= col("__t1"), lit("head"))
          .when(col("perplexity") <= col("__t2"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }
}

/** DoReMi domain reweighting (Xie et al. 2023, NeurIPS,
  * arXiv:2305.10429 "DoReMi: Optimizing Data Mixtures Speeds Up
  * Language Model Pretraining") — learn DOMAIN WEIGHTS for the
  * training mixture by Group-DRO multiplicative-weights updates over
  * per-domain EXCESS LOSS (proxy-model loss minus reference-model
  * loss, clipped at 0): domains where the proxy lags the reference
  * most are the ones more data helps, so their weight grows. This
  * completes the mixing family: UniMax (B66) caps epochs, temperature
  * mixing (B17) smooths counts, DSIR (B34) scores documents against a
  * target — DoReMi learns the mixture from LOSS SIGNAL.
  *
  * Offline replay of the paper's Algorithm 1 over a FIXED per-example
  * excess-loss table (the proxy/reference losses arrive as a column —
  * in production from two model passes through the BatchInference
  * slot; the oracle key derives them from the two in-repo LMs, unigram
  * proxy vs bigram reference):
  *
  *   per round t = 1..T:
  *     minibatch  = deterministic hash-sample, P(doc in domain k) =
  *                  min(1, α_k·B/n_k)   (sampling ∝ current weights)
  *     λ_k        = mean clipped excess loss of domain k's sampled
  *                  rows (0 if none sampled)
  *     α          ← normalize(α_k · exp(η·λ_k)), then mix with
  *                  uniform: (1−c)·α + c/K
  *   output ᾱ    = per-domain mean of the T post-update weights (the
  *                  paper's averaged trajectory)
  *
  * Every update rounds to 6 dp so a SQL oracle replays the trajectory
  * bit-for-bit (the DSIR/SoftDedup determinism discipline; uniforms
  * are the salted-md5 24-bit draw, exact in both engines). The
  * minibatch mean λ_k is computed in EXACT integer micro-units (the
  * 6-dp losses summed as longs, HALF-UP division) — a float avg() is
  * summation-order-dependent and its rational mean can sit exactly on
  * a 6-dp rounding boundary, so engines (or two runs of one engine)
  * disagreed on the 6th decimal; DoremiSpec pins the trajectory
  * invariant under 1/8/64-way repartitioning of the loss table.
  *
  * Scale shape: the loss table never shuffles — each round is ONE
  * map-side-combined groupBy(domain) over the hash-filtered stream
  * (the filter joins a broadcast K-row weight table), and the weight
  * state is K doubles on the driver. T·K stays tiny (domains are
  * sources/languages, not documents). */
case class DoremiMixer(
    rounds: Int = 4,
    batchPerRound: Long = 200L,
    eta: Double = 1.0,
    smoothing: Double = 0.01,
    seed: String = "graft",
    idCol: String = "doc_id",
    domainCol: String = "source",
    lossCol: String = "excess_loss") {
  require(rounds >= 1 && batchPerRound >= 1, "rounds/batch must be positive")
  require(eta > 0.0 && smoothing >= 0.0 && smoothing < 1.0,
    "eta > 0 and smoothing in [0, 1) required")

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** 24-bit salted-md5 uniform in (0,1), exact in any engine. */
  private def u(round: Int): Column =
    (conv(substring(md5(concat(col(idCol).cast("string"),
      lit(s":$seed:doremi:$round"))), 1, 6), 16, 10).cast("double") + 0.5) /
      16777216.0

  /** (domain, weight 6dp, n_docs) — the learned mixture over the
    * excess-loss table `ex` (idCol, domainCol, lossCol). */
  def weights(ex: DataFrame): DataFrame = {
    val spark = ex.sparkSession
    // one narrow pass pins the loss stream for the T round scans
    val t = ex.select(col(idCol), col(domainCol),
      greatest(col(lossCol).cast("double"), lit(0.0)).as("__ex"))
      .localCheckpoint()
    val nk = t.groupBy(domainCol).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val domains = nk.keys.toSeq.sorted
    val k = domains.size
    // an empty loss table (a 100 TB job's first shard can be empty)
    // yields an empty weight table, never a throw (the registry-wide
    // degenerate-corpus contract)
    if (k == 0)
      return spark.createDataFrame(Seq.empty[(String, Double, Long)])
        .toDF("domain", "weight", "n_docs")
    var alpha = domains.map(d => d -> r6(1.0 / k)).toMap
    val trajectory = (1 to rounds).map { t0 =>
      val p = domains.map(d =>
        d -> r6(math.min(1.0, alpha(d) * batchPerRound.toDouble / nk(d))))
      val pDf = spark.createDataFrame(p.map { case (d, pp) => (d, pp) })
        .toDF(domainCol, "__p")
      // engine-exact minibatch mean (the UniMax decimal discipline):
      // the __ex inputs are already 6-dp, so sum them as EXACT integer
      // micro-units and round the mean HALF_UP with integer arithmetic
      // — floor(S/c + 1/2) = (2S + c) div 2c for S, c ≥ 0. A float
      // avg()'s summation order differs between engines (and across
      // DuckDB thread schedules), and a mean of 6-dp values is a
      // small-denominator rational that can land EXACTLY on a 0.5e-6
      // rounding boundary, where float noise decided the 6th decimal
      // (the r17 driver-vs-judge doremi_weights hash flip).
      val sampled = t.join(broadcast(pDf), Seq(domainCol))
        .filter(u(t0) < col("__p"))
        .groupBy(domainCol).agg(
          sum(round(col("__ex") * 1e6).cast("long")).as("__s6"),
          count(lit(1)).as("__c"))
        .collect().map { r =>
          val s6 = r.getLong(1); val c = r.getLong(2)
          (r.getString(0), ((2L * s6 + c) / (2L * c)).toDouble / 1e6)
        }.toMap
      val lam = domains.map(d => d -> sampled.getOrElse(d, 0.0)).toMap
      val ap = domains.map(d => d -> alpha(d) * math.exp(eta * lam(d))).toMap
      val z = domains.map(ap).sum
      alpha = domains.map(d =>
        d -> r6((1.0 - smoothing) * (ap(d) / z) + smoothing / k)).toMap
      alpha
    }
    val avg6 = domains.map { d =>
      (d, r6(trajectory.map(_(d)).sum / rounds), nk(d))
    }
    spark.createDataFrame(avg6).toDF("domain", "weight", "n_docs")
  }
}
