package graft.queries

import graft.Tables
import graft.functions.TextFns._
import graft.functions.UrlFns._
import graft.operators.dedup._
import graft.operators.text._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-operator correctness queries over the `documents` table, each
  * paired with a DuckDB oracle that re-derives the same values in ANSI
  * SQL. Oracle fragments are generated from the same config constants as
  * the Spark side so the two can't drift.
  */
object TextQueries {

  /** Deterministic URL synthesized from document fields (both engines
    * build the identical string; replace() is non-regex in both). */
  private def urlCol: Column =
    concat(lit("https://"), col("source"), lit(".example.com/"),
      replace(substring(col("text"), 1, 40), lit(" "), lit("-")))

  private val urlSql =
    "'https://' || source || '.example.com/' || replace(substr(text, 1, 40), ' ', '-')"

  /** Word weights chosen to actually occur in the synthetic corpus. */
  private val scoreWeights: Map[String, Double] =
    Map("slow" -> 0.9, "batch" -> 0.5, "fast" -> 0.4, "crack" -> 0.5)
  private val scoreThreshold = 0.5

  private val blockedDomains = Seq("src1.example.com", "src3.example.com")

  private def domainSql(u: String) =
    s"lower(regexp_extract($u, '^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?([^/?#]+)', 1))"

  private def domainInSetSql(d: String, domains: Seq[String]): String =
    domains.map(x => s"($d = '$x' OR $d LIKE '%.$x')").mkString("(", " OR ", ")")

  private val normSql = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
  private val wsToksSql = "string_split_regex(trim(text), '\\s+')"

  /** Bigram absolute-discount backoff replay (B-family r17,
    * [[graft.operators.text.BigramPerplexityScorer]] with D = 0.75,
    * oovAlpha = 1): P(w|h) = max(c(h,w)−D,0)/c(h) + λ(h)·P_uni(w),
    * λ(h) = (D·N1+(h·))/c(h); doc-initial and pruned-history positions
    * back off to P_uni; pruning = top-k with the same deterministic
    * tiebreaks as the Spark TakeOrdered. */
  private def bigramPerplexitySql(maxVocab: Int, maxBigrams: Int): String =
    s"""WITH ${bigramPerplexityCtes(maxVocab, maxBigrams)}
       |SELECT doc_id, round(exp(-avg(lp)), 4) AS perplexity
       |FROM scored GROUP BY doc_id""".stripMargin

  /** The CTE body (ending in `scored(doc_id, lp)`) — shared by the
    * perplexity_bigram keys and the DoReMi excess-loss derivation. */
  private def bigramPerplexityCtes(maxVocab: Int, maxBigrams: Int): String = {
    val ukept = if (maxVocab > 0)
      s"""(SELECT t, n FROM (
         |    SELECT t, n, row_number() OVER (ORDER BY n DESC, t ASC) AS r
         |    FROM uc) WHERE r <= $maxVocab)""".stripMargin
    else "uc"
    val hkept = if (maxVocab > 0)
      s"""(SELECT h, ch, lam FROM (
         |    SELECT h, ch, lam, row_number() OVER (ORDER BY ch DESC, h ASC) AS r
         |    FROM hist) WHERE r <= $maxVocab)""".stripMargin
    else "hist"
    val bkept = if (maxBigrams > 0)
      s"""(SELECT h, w, c FROM (
         |    SELECT h, w, c,
         |      row_number() OVER (ORDER BY c DESC, h ASC, w ASC) AS r
         |    FROM bc) WHERE r <= $maxBigrams)""".stripMargin
    else "bc"
    s"""tt AS (
       |  SELECT doc_id, string_split($normSql, ' ') AS ws
       |  FROM documents WHERE length(trim(text)) > 0),
       |rows_ AS (
       |  SELECT doc_id, struct_extract(hw, 'h') AS h,
       |    struct_extract(hw, 'w') AS w
       |  FROM (
       |    SELECT doc_id, unnest(list_transform(range(1, len(ws) + 1),
       |      i -> struct_pack(h := CASE WHEN i = 1 THEN NULL
       |                         ELSE ws[CAST(i AS INT) - 1] END,
       |                       w := ws[CAST(i AS INT)]))) AS hw
       |    FROM tt)),
       |uc AS (SELECT w AS t, count(*) AS n FROM rows_ GROUP BY w),
       |tot AS (SELECT sum(n) AS total FROM uc),
       |pu AS (SELECT t, CAST(n AS DOUBLE) / total AS p FROM $ukept u, tot),
       |bc AS (SELECT h, w, count(*) AS c FROM rows_
       |       WHERE h IS NOT NULL GROUP BY h, w),
       |hist AS (
       |  SELECT h, ch, (0.75 * n1p) / ch AS lam FROM (
       |    SELECT h, CAST(sum(c) AS DOUBLE) AS ch,
       |      CAST(count(*) AS DOUBLE) AS n1p
       |    FROM bc GROUP BY h)),
       |scored AS (
       |  SELECT r.doc_id,
       |    ln(CASE WHEN r.h IS NULL OR hk.ch IS NULL
       |         THEN coalesce(pu.p, (SELECT 1.0 / total FROM tot))
       |         ELSE greatest(CAST(coalesce(bk.c, 0) AS DOUBLE) - 0.75, 0.0)
       |                / hk.ch
       |              + hk.lam * coalesce(pu.p, (SELECT 1.0 / total FROM tot))
       |         END) AS lp
       |  FROM rows_ r
       |  LEFT JOIN pu ON r.w = pu.t
       |  LEFT JOIN $hkept hk ON r.h = hk.h
       |  LEFT JOIN $bkept bk ON r.h = bk.h AND r.w = bk.w)""".stripMargin
  }

  /** DoReMi Algorithm-1 replay (arXiv:2305.10429), T rounds unrolled:
    * excess loss = clipped ln(unigram pp) − ln(bigram pp) from the two
    * in-repo LMs, per-round md5-uniform minibatch at P = min(1, α·B/n),
    * multiplicative-weights update with uniform smoothing, 6 dp at
    * every state write (the [[graft.operators.text.DoremiMixer]]
    * trajectory bit-for-bit). */
  private def doremiSql(rounds: Int, batch: Long, eta: Double,
      smoothing: Double): String = {
    val roundCtes = (1 to rounds).map { t =>
      val prev = if (t == 1) "a0" else s"a${t - 1}"
      s"""p$t AS MATERIALIZED (SELECT nk.source, round(least(1.0, a * $batch.0 / n), 6) AS p
         |  FROM $prev JOIN nk USING (source)),
         |mb$t AS MATERIALIZED (
         |  SELECT ex.source, ex.ex FROM ex JOIN p$t USING (source)
         |  WHERE (CAST(('0x' || substr(md5(CAST(ex.doc_id AS VARCHAR)
         |    || ':graft:doremi:$t'), 1, 6)) AS BIGINT) + 0.5) / 16777216.0 < p),
         |l$t AS MATERIALIZED (
         |  SELECT nk.source,
         |    coalesce(CAST((2 * m.s6 + m.c) // (2 * m.c) AS DOUBLE)
         |      / 1000000.0, 0.0) AS lam
         |  FROM nk LEFT JOIN (
         |    SELECT source, sum(CAST(round(ex * 1000000.0) AS BIGINT)) AS s6,
         |      count(*) AS c FROM mb$t GROUP BY source) m
         |  USING (source)),
         |au$t AS MATERIALIZED (SELECT source, a * exp($eta * lam) AS au
         |  FROM $prev JOIN l$t USING (source)),
         |a$t AS MATERIALIZED (SELECT source,
         |  round((1.0 - $smoothing) * (au / (SELECT sum(au) FROM au$t))
         |    + $smoothing / k, 6) AS a
         |  FROM au$t, kk)""".stripMargin
    }.mkString(",\n")
    val trajSum = (1 to rounds).map(t => s"a$t.a").mkString(" + ")
    val trajJoin = (2 to rounds).map(t => s"JOIN a$t USING (source)")
      .mkString(" ")
    // head/tail stripMargin'd SEPARATELY from the already-stripped
    // round CTEs: re-stripping interpolated content would eat one pipe
    // of every line-leading `||` concat
    val head = s"""WITH ${bigramPerplexityCtes(0, 0)},
       |bpp AS MATERIALIZED (SELECT doc_id, round(exp(-avg(lp)), 4) AS pp
       |        FROM scored GROUP BY doc_id),
       |utoks AS (
       |  SELECT doc_id, unnest(string_split($normSql, ' ')) AS t2
       |  FROM documents),
       |ucounts AS (SELECT t2, count(*) AS n FROM utoks GROUP BY t2),
       |utotal AS (SELECT sum(n) AS total FROM ucounts),
       |ulm AS (SELECT t2, ln(CAST(n AS DOUBLE) / total) AS logp
       |        FROM ucounts, utotal),
       |upp AS MATERIALIZED (SELECT utoks.doc_id, round(exp(-avg(logp)), 4) AS pp
       |        FROM utoks JOIN ulm ON utoks.t2 = ulm.t2
       |        GROUP BY utoks.doc_id),
       |ex AS MATERIALIZED (
       |  SELECT d.doc_id, d.source,
       |    greatest(round(ln(upp.pp) - ln(bpp.pp), 6), 0.0) AS ex
       |  FROM documents d
       |  JOIN upp ON d.doc_id = upp.doc_id
       |  JOIN bpp ON d.doc_id = bpp.doc_id),
       |nk AS MATERIALIZED (SELECT source, count(*) AS n FROM ex GROUP BY source),
       |kk AS MATERIALIZED (SELECT count(*) AS k FROM nk),
       |a0 AS MATERIALIZED (SELECT source, round(1.0 / k, 6) AS a FROM nk, kk)""".stripMargin
    val tail = s"""SELECT source AS domain,
       |  round(($trajSum) / $rounds.0, 6) AS weight,
       |  CAST(nk.n AS BIGINT) AS n_docs
       |FROM a1 $trajJoin JOIN nk USING (source)""".stripMargin
    head + ",\n" + roundCtes + "\n" + tail
  }

  /** UniMax key constants (shared by the Spark side and the oracle so
    * the two can't drift): epoch cap 1, budget 25k over the ~27k-token
    * sf0.01 corpus — the two smallest sources cap, the rest waterfill. */
  private val unimaxEpochs = 1
  private val unimaxBudget = 25000L

  /** The UniMax waterfill as DuckDB CTEs ending in `b(source, budget)`
    * plus the shared `t` token table — the closed form
    * [[graft.operators.text.UniMaxSampler.budgets]] evaluates. */
  private def unimaxCteSql: String =
    s"""t AS (
       |  SELECT doc_id, source,
       |    CASE WHEN length(trim(text)) = 0 THEN 0
       |         ELSE len($wsToksSql) END AS tok
       |  FROM documents),
       |c AS (SELECT source, CAST(sum(tok) AS BIGINT) AS n_tokens
       |      FROM t GROUP BY source),
       |o AS (SELECT source, n_tokens,
       |    CAST(row_number() OVER (ORDER BY n_tokens, source NULLS FIRST) AS BIGINT) AS i,
       |    CAST(count(*) OVER () AS BIGINT) AS k,
       |    CAST($unimaxEpochs * n_tokens AS BIGINT) AS cap,
       |    CAST(sum($unimaxEpochs * n_tokens)
       |      OVER (ORDER BY n_tokens, source NULLS FIRST) AS BIGINT) AS cumcap
       |  FROM c),
       |mm AS (SELECT coalesce(min(CASE WHEN NOT (CAST(cap AS HUGEINT) * (k - i + 1)
       |         <= $unimaxBudget - (cumcap - cap)) THEN i END) - 1, max(k), 0) AS m
       |       FROM o),
       |sm AS (SELECT m, coalesce(max(CASE WHEN i = m THEN cumcap END), 0) AS s_m
       |       FROM o, mm GROUP BY m),
       |b AS (SELECT o.source, o.n_tokens,
       |  CASE WHEN o.i <= sm.m THEN o.cap
       |       ELSE ($unimaxBudget - sm.s_m) // (o.k - sm.m)
       |            + (CASE WHEN o.i - sm.m <= ($unimaxBudget - sm.s_m) % (o.k - sm.m)
       |               THEN 1 ELSE 0 END)
       |  END AS budget
       |  FROM o, sm)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_length_filter" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      TextLengthFilter(100, Some(2000))(docs)
        .select(col("doc_id"), length(col("text")).cast("long").as("text_len"))
    }),

    "token_count" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      TokenCounter()(docs).select("doc_id", "n_ws_tokens", "n_bpe_tokens")
    }),

    // GPT-style sequence packing: concatenate in doc_id order, cut at a
    // fixed token budget
    "pack_sequences" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      SequencePacker(budget = 2048)(docs)
    }),

    // long-doc chunking with overlap (RAG/long-context preprocessing)
    "chunk_documents" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      DocumentChunker(maxTokens = 64, overlap = 8)(docs)
    }),

    "tfidf_top_terms" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      TfIdf().topTerms(docs, k = 3)
    }),

    "top_bigrams" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      docs.select(explode(wordShingles(col("text"), 2)).as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram").asc)
        .limit(20)
    }),

    // canonicalize a deterministically-messy URL (fragment, default
    // port, tracking params, mixed case)
    "url_canonicalize" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val messy = concat(lit("HTTPS://WWW."), upper(col("source")),
        lit(".Example.COM:443/Docs/"), col("doc_id"),
        lit("/?utm_source=feed&ref=rss&q="), col("doc_id") % 7,
        lit("&utm_campaign=x#sec"), col("doc_id") % 3)
      docs.select(col("doc_id"), canonicalizeUrl(messy).as("canonical"))
    }),

    // crawl-frontier URL dedup: every doc's URL also arrives as a
    // re-crawl variant (different case, tracking params, fragment)
    // that canonicalizes identically — keep-first drops the variants
    "dedup_url" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val base = docs.select(col("doc_id"), concat(
        lit("HTTPS://WWW."), upper(col("source")),
        lit(".Example.COM:443/Docs/"), col("doc_id"),
        lit("/?utm_source=feed&ref=rss&q="), col("doc_id") % 7,
        lit("&utm_campaign=x#sec"), col("doc_id") % 3).as("url"))
      val variants = docs.select((col("doc_id") + 1000000L).as("doc_id"),
        concat(
          lit("https://WWW."), upper(col("source")),
          lit(".EXAMPLE.com/Docs/"), col("doc_id"),
          lit("/?utm_medium=email&q="), col("doc_id") % 7,
          lit("&fbclid=abc#other")).as("url"))
      // crawl rows with a missing URL: no dedup key → ALL pass through
      // (null must never collapse into one group and drop data)
      val unkeyed = docs.where(col("doc_id") % 100 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          lit(null).cast("string").as("url"))
      val d = UrlDedup()
      d(base.unionByName(variants).unionByName(unkeyed))
        .select(col("doc_id"), d.canonical.as("canonical"))
    }),

    // within-doc line dedup (words→lines so the synthetic corpus has
    // genuine repeats); keeps first occurrence in order
    "line_dedup" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .withColumn("text", regexp_replace(col("text"), " ", "\n"))
      LineDeduper()(docs)
        .select(col("doc_id"), col("text").as("deduped"),
          col("n_lines"), col("n_unique_lines"))
    }),

    // flag corpus docs sharing any 5-gram with the benchmark subset
    "decontaminate" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val bench = docs.filter(col("doc_id") % 50 === 0)
      Decontaminator(n = 5).flag(docs, bench)
        .select("doc_id", "is_contaminated")
    }),

    // percentile quality gate: per-source top 20% by token count
    // (integer score → heavy ties, so the boundary tie-admission path
    // is exercised, not just the wholesale-keep path). Every 97th doc
    // is left UNSCORED (null) — it must neither survive nor inflate
    // the group quota.
    "quality_topq" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .withColumn("score", when(col("doc_id") % 97 === 0, lit(null))
          .otherwise(wsTokenCount(col("text"))).cast("long"))
      TopFractionByGroup(frac = 0.2)(docs).select("doc_id", "source", "score")
    }),

    // anti-spam fixed quota: at most 15 docs per source by quality
    // (the fixed-count sibling of quality_topq; same null-score and
    // tie conventions)
    "domain_cap" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .withColumn("score", when(col("doc_id") % 97 === 0, lit(null))
          .otherwise(wsTokenCount(col("text"))).cast("long"))
      GroupCap(n = 15)(docs).select("doc_id", "source", "score")
    }),

    // stratified rebalance: 50% of en, 10% of everything else
    "sample_stratified" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      HashSampler().sampleStratified(docs, "lang", Map("en" -> 50), defaultKeep = 10)
        .select("doc_id", "lang")
    }),

    // Lee et al. duplicated-span signal: fraction of each doc's
    // distinct trigrams that recur in other documents
    "span_dup_stats" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      SpanDupStats(n = 3)(docs)
        .select("doc_id", "n_ngrams", "n_dup_ngrams", "dup_ngram_frac")
    }),

    // distributed BPE training: first two learned merges (count +
    // lexicographic tiebreak); iteration 2's counts depend on a correct
    // greedy application of merge 1, so the loop is what's verified
    "bpe_train_merges" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      DistributedBpeTrainer.fit(docs, numMerges = 2)
    }),

    // Lee-et-al duplicated-span REMOVAL: cut every covered token except
    // the canonical first occurrence of each duplicated trigram
    "span_removal" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      DuplicatedSpanRemover(n = 3)(docs)
        .select("doc_id", "text", "n_tokens", "n_removed")
    }),

    // cross-doc boilerplate removal: synthesize a shared header line +
    // per-source footer line (the corpus ships single-line texts), then
    // the operator must strip exactly those and keep every body
    "boilerplate_removal" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .withColumn("text", concat(
          lit("subscribe to our newsletter\n"), col("text"),
          lit("\ncopyright "), col("source")))
      CrossDocLineDedup(minDocs = 10)(docs)
    }),

    // domain-mixture sampling: target proportions within a doc budget,
    // rates from actual counts, deterministic hash filter (map-only)
    "mixture_sample" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      MixtureSampler().sample(docs,
          Map("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2, "src3" -> 0.1),
          budget = 60)
        .select("doc_id", "source")
    }),

    // temperature-scaled mixture (p_s ∝ n_s^(1/T), T=3): weights derive
    // from the corpus counts themselves — every 77th doc loses its
    // source so the null group is exercised through the null-safe join
    "mixture_temperature" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .withColumn("source",
          when(col("doc_id") % 77 === 0, lit(null)).otherwise(col("source")))
      MixtureSampler().sampleTemperature(docs, temperature = 3.0, budget = 120)
        .select("doc_id", "source")
    }),

    // UniMax waterfill allocation (epoch cap 1, budget 25k over the
    // ~27k-token corpus): the two smallest sources cap and are taken
    // whole, the other 18 split the remainder evenly (+1 token for the
    // first `rem` of them) — both branches of the closed form exercised
    "mixture_unimax_budgets" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      UniMaxSampler(epochCap = unimaxEpochs)
        .budgets(docs, wsTokenCount(col("text")), totalBudget = unimaxBudget)
    }),

    // the UniMax SAMPLE: each source's waterfilled budget filled
    // greedily in the TokenBudgetSampler salted-hash order — capped
    // sources survive whole, uncapped ones lose their tail
    "mixture_unimax" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      UniMaxSampler(epochCap = unimaxEpochs)
        .sample(docs, wsTokenCount(col("text")), totalBudget = unimaxBudget)
        .select("doc_id", "source")
    }),

    // CCNet head/middle/tail terciles per language: per-lang unigram
    // LM, per-doc perplexity, value thresholds off the per-lang
    // histogram CDF — ties share a bucket, no corpus-wide row_number
    "ccnet_buckets" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      CcnetBucketer()(docs)
    }),

    // pruned-KenLM semantics (the 100 TB recipe): LM capped to the
    // top-10 tokens per language (count desc, token asc), OOV tokens
    // score at the per-language ln(1/total) floor; only this bounded
    // LM carries a broadcast hint. The synthetic corpus has a ~31-word
    // vocabulary, so k=10 prunes HARD at oracle scale and the floor
    // path is genuinely exercised
    "ccnet_buckets_pruned" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      CcnetBucketer(maxVocabPerLang = 10)(docs)
    }),

    // packing-efficiency audit over the pack_sequences layout: the
    // boundary-crossing rate and tail fill a context-length choice is
    // judged by
    "packing_report" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      PackingReporter(budget = 2048)(docs)
    }),

    // token-budget fill per source: greedy in salted-hash order, the
    // budget is counted in tokens (what training consumes), not docs
    "token_budget_sample" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      TokenBudgetSampler().sample(docs, wsTokenCount(col("text")),
          Map("src0" -> 800L, "src1" -> 400L), defaultBudget = 150L)
        .select("doc_id", "source")
    }),

    // sharded variant (the skew escape hatch): same budgets split
    // exactly over 4 salted sub-shards per source, window partitioned
    // by (source, shard) — the plan a skewed giant source needs
    "token_budget_sharded" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      TokenBudgetSampler().sampleSharded(docs, wsTokenCount(col("text")),
          Map("src0" -> 800L, "src1" -> 400L), shards = 4,
          defaultBudget = 150L)
        .select("doc_id", "source")
    }),

    // deterministic training-shard layout: global md5-shuffled order
    // split into a fixed shard count — epoch order is part of the
    // experiment, so any engine must reproduce (shard, pos) exactly
    "training_shards" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      TrainingShardLayout(nShards = 8).assign(docs)
        .select("doc_id", "shard", "pos")
    }),

    // curriculum variant: same hash shards, but within each shard the
    // epoch order is perplexity-ascending (most-fluent first — the
    // CCNet head leads) instead of the shuffled :ord: hash
    "curriculum_shards" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val p = PerplexityScorer()
      CurriculumShardLayout(nShards = 8)
        .assign(p.scores(docs, p.model(docs)), col("perplexity"))
        .select("doc_id", "shard", "pos")
    }),

    // vocabulary-coverage curve: occurrences covered by the K most
    // frequent types at three candidate vocab sizes — computed over
    // the histogram OF frequencies, so no per-token rank or tiebreak
    "vocab_coverage" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      graft.operators.VocabCoverage(Seq(100L, 1000L, 10000L))(docs)
    }),

    // DSIR importance resampling: target = the English slice (the
    // in-domain exemplar stand-in), raw = the whole corpus; hashed
    // unigram+bigram log-likelihood-ratio scores, Gumbel-top-100 draw
    "dsir_select" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      DsirSelector().resample(docs, docs.filter(col("lang") === "en"), k = 100)
    }),

    // deterministic 3-per-language sample (hash-ranked reservoir)
    "sample_per_group" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      HashSampler().samplePerGroup(docs, "lang", k = 3)
        .select("doc_id", "lang")
    }),

    // deterministic hash split: same doc → same split on any run/cluster
    "hash_sample_split" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val hs = HashSampler()
      hs.split(docs, trainBuckets = 80, valBuckets = 10)
        .select(col("doc_id"), hs.bucket.as("bucket"), col("split"))
    }),

    // synthesize PII-bearing text (both engines build the identical
    // string), then redact + count — proves the masking actually fires
    // code detection: derived multi-line pages where every third doc
    // carries injected code lines — the per-line indicators and the
    // fraction replay in DuckDB over the same derivation
    "code_detect" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .withColumn("text", concat_ws("\n",
          substring(col("text"), 1, 40),
          when(col("doc_id") % 3 === 0, lit("def process(x):")),
          when(col("doc_id") % 3 === 0, lit("    return x * 2;")),
          when(col("doc_id") % 3 === 1, lit("just some plain prose here")),
          lit("another prose line")))
      CodeDetector(threshold = 0.3)(docs)
        .select("doc_id", "code_line_frac", "is_code")
    }),

    // encoding cleanup: planted UTF-8-as-Latin-1 mojibake + an
    // NFD-decomposed accent per doc; odd docs add curly-quote
    // artifacts — the oracle rebuilds the damage and replays the
    // repair table + nfc_normalize
    "text_normalize" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .withColumn("text", concat(
          substring(col("text"), 1, 30),
          lit(" cafÃ© éclair"),
          when(col("doc_id") % 2 === 1,
            lit(" â€™dâ€™accordâ€¦"))
            .otherwise(lit(""))))
      UnicodeNormalizer()(docs)
        .select("doc_id", "text", "n_mojibake_chars", "was_changed")
    }),

    // Luhn-verified card redaction: a valid card (16 digits, spaced),
    // an invalid same-shape number, or no card, planted by doc_id % 3 —
    // the checksum (not the regex) is what separates the first two
    "pii_credit_card" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .withColumn("text", concat(
          substring(col("text"), 1, 40),
          when(col("doc_id") % 3 === 0, lit(" card 4111 1111 1111 1111 thanks"))
            .when(col("doc_id") % 3 === 1, lit(" card 4111-1111-1111-1112 thanks"))
            .otherwise(lit(" no card here"))))
      CreditCardRedactor()(docs)
        .select(col("doc_id"), col("text").as("redacted"), col("n_cards"))
    }),

    "pii_redact" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .withColumn("text", concat(
          lit("user"), col("doc_id"), lit("@example.com ph 555-123-4567 ip 10.0.0."),
          col("doc_id") % 256,
          when(col("doc_id") % 3 === 0, lit(" ssn 987-65-4321")).otherwise(lit("")),
          lit(" "), substring(col("text"), 1, 60)))
      PiiRedactor()(docs)
        .select(col("doc_id"), col("text").as("redacted"),
          col("n_emails").cast("long").as("n_emails"),
          col("n_phones").cast("long").as("n_phones"),
          col("n_ssns").cast("long").as("n_ssns"),
          col("n_ips").cast("long").as("n_ips"))
    }),

    "quality_score" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      QualityScorer()(docs).select("doc_id", "q_n_chars", "q_n_words",
        "q_punct_ratio", "q_stopword_ratio", "q_alpha_ratio",
        "q_mean_word_len", "q_score")
    }),

    "c4_clean" -> ((s, dir) => {
      // B30's oracle row. The synthetic corpus is single-line word
      // soup, so pages that exercise C4's LINE rules are DERIVED
      // in-query with one deterministic formula the DuckDB oracle
      // repeats verbatim: four common words gain terminal periods (so
      // some 5-word lines end in punctuation and some don't), "spark"
      // becomes the javascript trigger, doc_id-keyed suffixes plant
      // the lorem-ipsum / curly-brace page flags, and the word stream
      // then chunks into 5-word lines.
      val docs = Tables.load(s, dir, "documents")
        .withColumn("text", regexp_replace(
          concat(
            regexp_replace(
              regexp_replace(col("text"), "(table|value|part|row)", "$1."),
              "spark", "javascript"),
            when(col("doc_id") % 11 === 0, lit(" lorem ipsum")).otherwise(lit("")),
            when(col("doc_id") % 13 === 0, lit(" {")).otherwise(lit(""))),
          "((?:\\S+ ){4}\\S+) ", "$1\n"))
      graft.operators.text.C4Cleaner().withFlags(docs)
        .select("doc_id", "c4_kept_lines", "c4_dropped_lines",
          "c4_has_lorem", "c4_has_brace", "c4_text", "c4_pass")
    }),

    "gopher_quality" -> ((s, dir) => {
      // stopword list matched to the synthetic corpus vocabulary (only
      // "the"/"a" of Gopher's eight occur); rule structure and every
      // other threshold are the paper's
      val docs = Tables.load(s, dir, "documents")
      graft.operators.text.GopherQualityFilter(stopWords = Seq("the", "a"))
        .withFlags(docs)
        .select("doc_id", "g_word_count", "g_mean_word_len",
          "g_symbol_ratio", "g_bullet_ratio", "g_ellipsis_ratio",
          "g_alpha_ratio", "g_stop_hits", "gopher_pass")
    }),

    "lang_id" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      LanguageId()(docs).select("doc_id", "lang_pred")
    }),

    "fingerprint" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      Fingerprinter(8)(docs).select("doc_id", "fingerprint", "content_hash")
    }),

    "html_extract" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val html = concat(
        lit("<html><head><style>b{color:red}</style></head><body><h1>Title &amp; Co</h1><p>"),
        col("text"), lit("</p><script>var x=1;</script></body></html>"))
      docs.select(col("doc_id"), htmlExtractText(html).as("extracted"))
    }),

    "url_filter_score" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents").withColumn("url", urlCol)
      docs.select(col("doc_id"),
        round(urlScore(col("url"), scoreWeights), 6).as("url_score"),
        (urlScore(col("url"), scoreWeights) < scoreThreshold).as("keep"))
    }),

    "url_filter_blocklist" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents").withColumn("url", urlCol)
      val f = UrlFilter(blocklistDomains = blockedDomains,
        wordWeights = Map.empty + ("zzzznope" -> 1.0))
      docs.select(col("doc_id"), extractDomain(col("url")).as("domain"),
        f.predicate.as("keep"))
    }),

    "url_filter_quality_sources" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents").withColumn("url",
        when(col("doc_id") % 7 === 0,
          concat(lit("https://en.wikipedia.org/wiki/"), col("doc_id")))
          .otherwise(urlCol))
      docs.select(col("doc_id"),
        domainInSet(extractDomain(col("url")), defaultQualitySources).as("is_quality"))
    }),

    "dedup_exact" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      ExactDedup().groups(docs)
    }),

    "dedup_ngram_jaccard" -> ((s, dir) => {
      // pinned to the r=1 banding: the operator DEFAULT is now r=2
      // (lowTauLsh — the measured 8× winner at 50k docs), which
      // dedup_jaccard_r2 below gates; keeping r=1 registered here
      // keeps BOTH banding paths oracle-checked and bench-gated
      val docs = Tables.load(s, dir, "documents")
      val nj = NgramJaccard(3, 0.2)
      nj.minhashVerifiedPairs(docs, nj.lowTauBanding(1))
    }),

    // the measured at-scale default (SURVEY §5.11: r=2 banding wins
    // 3.1× at 50k docs once r=1 candidates go quadratic): same verified
    // pair set, candidates from 170 two-row bands. The oracle is the
    // exact count-join — recall of the banding IS part of the gate.
    "dedup_jaccard_r2" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val nj = NgramJaccard(3, 0.2)
      nj.minhashVerifiedPairs(docs, nj.lowTauBanding(2))
    }),

    // the measured exact-collapse recipe (SURVEY §5: 296 s -> 12 s at
    // 10x-replicated sf0.1, byte-identical pair set) as a driver-gated
    // key: a corpus with planted exact copies (+1e6 for every 3rd doc,
    // +2e6 for every 6th -> content classes up to size 3) runs through
    // countJoinPairs, which collapses each class to one representative
    // BEFORE the quadratic jaccard and expands class pairs after
    // (inter-class: rep jaccard; intra-class: 1.0). The oracle is the
    // UNCOLLAPSED exact count-join over the same corpus — pair-set
    // equality is the gate, so the 100 TB recipe's first step (collapse
    // exact dups, then near-dup) is checked, not prose.
    "dedup_jaccard_collapsed" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val corpus = docs.select(col("doc_id"), col("text"))
        .unionByName(docs.filter(col("doc_id") % 3 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
        .unionByName(docs.filter(col("doc_id") % 6 === 0)
          .select((col("doc_id") + 2000000L).as("doc_id"), col("text")))
      NgramJaccard(3, 0.2).countJoinPairs(corpus)
    }),

    "repetition_scores" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      RepetitionScorer().scores(docs)
    }),

    "perplexity" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val p = PerplexityScorer()
      p.scores(docs, p.model(docs))
    }),

    // global-LM twin of ccnet_buckets_pruned: top-12 vocab (of ~31)
    // via TakeOrdered (never a full vocab sort), OOV floor ln(1/total)
    "perplexity_pruned" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val p = PerplexityScorer(maxVocab = 12)
      p.scores(docs, p.model(docs))
    }),

    // bigram LM with interpolated absolute-discount backoff (Ney 1994,
    // B-family r17): P(w|h) = max(c(h,w)−D,0)/c(h) + λ(h)·P_uni(w) —
    // the rung above the unigram stand-in toward CCNet's KenLM, same
    // bounded-model join shape (three tables, corpus never shuffles)
    "perplexity_bigram" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      BigramPerplexityScorer().scores(docs)
    }),

    // the pruned path: top-12 unigrams/histories + top-40 bigrams, all
    // tables ≤ k rows (broadcast-hinted); a pruned bigram degrades to
    // the λ(h)·P_uni backoff term, a pruned history to pure unigram
    "perplexity_bigram_pruned" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      BigramPerplexityScorer(maxVocab = 12, maxBigrams = 40).scores(docs)
    }),

    // DoReMi domain reweighting (B-family r17): Group-DRO
    // multiplicative-weights over per-domain excess loss — here the
    // unigram LM as the (weaker) proxy vs the bigram LM as the
    // reference, ln(pp_uni) − ln(pp_bigram) clipped at 0, so the whole
    // loss derivation is in-repo and oracle-replayable; 4 rounds of
    // weight-proportional hash-sampled minibatches
    "doremi_weights" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val uni = PerplexityScorer()
      val upp = uni.scores(docs, uni.model(docs))
        .withColumnRenamed("perplexity", "__upp")
      val bpp = BigramPerplexityScorer().scores(docs)
        .withColumnRenamed("perplexity", "__bpp")
      val ex = docs.select(col("doc_id"), col("source"))
        .join(upp, Seq("doc_id")).join(bpp, Seq("doc_id"))
        .select(col("doc_id"), col("source"),
          greatest(round(log(col("__upp")) - log(col("__bpp")), 6),
            lit(0.0)).as("excess_loss"))
      DoremiMixer().weights(ex)
    }),

    // domain-level gate: a synthetic content farm (125 docs, 3
    // templates → dup_frac 1.0, tiny avg length) joins the 20 clean
    // sources; only the farm gets flagged. Every 77th doc loses its
    // source — the null group shows in stats and must survive the gate
    "source_flagging" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .withColumn("source", when(col("doc_id") % 77 === 0, lit(null))
          .otherwise(col("source")))
      val farm = docs.where(col("doc_id") % 4 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(lit("breaking news "), (col("doc_id") % 3).cast("string"))
            .as("text"),
          col("lang"), lit("farm").as("source"), col("n_chars"))
      val gate = SourceQualityGate(maxDupFrac = 0.2, minAvgScore = 50.0)
      val corpus = docs.unionByName(farm)
      // null-safe survivor join (a bare equi-join would zero the
      // null-source row's survivor count even though its docs survive)
      val surv = gate(corpus)
        .groupBy(coalesce(col("source"), lit("__null__")).as("__k"))
        .agg(count(lit(1)).as("n_survivors"))
      gate.stats(corpus)
        .withColumn("__k", coalesce(col("source"), lit("__null__")))
        .join(surv, Seq("__k"), "left_outer")
        .drop("__k")
        .withColumn("n_survivors", coalesce(col("n_survivors"), lit(0L)))
    }),

    // graded decontamination: per-doc fraction of distinct 5-grams
    // shared with the benchmark (same split as `decontaminate`)
    "contamination_overlap" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val bench = docs.filter(col("doc_id") % 50 === 0)
      Decontaminator(n = 5).overlapStats(docs, bench)
    }),

    // lexical retrieval: BM25 top-5 per query, queries = 40-char
    // prefixes of every 125th doc (so real term matches exist)
    "bm25_search" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val queries = docs.filter(col("doc_id") % 125 === 0)
        .select(col("doc_id").as("query_id"),
          substring(col("text"), 1, 40).as("text"))
      Bm25().search(docs, queries, k = 5)
    }),

    // the same ranking served from the PERSISTED index (postings/
    // vocab/lens bucketed+sorted by their join keys): build once, then
    // search with zero corpus re-tokenization. Must be byte-identical
    // to bm25_search — the oracle below is literally the same SQL.
    "bm25_search_indexed" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val queries = docs.filter(col("doc_id") % 125 === 0)
        .select(col("doc_id").as("query_id"),
          substring(col("text"), 1, 40).as("text"))
      val bm = Bm25()
      bm.buildIndex(docs, "graft_bm25_vfy")
      bm.searchIndexed(s, "graft_bm25_vfy", queries, k = 5)
    }),

    // the incremental-ingest path: index built over 60% of the corpus,
    // rolled forward with the other 40% (refreshIndex — old corpus
    // never re-tokenized, df/stats re-derived from merged narrow
    // tables, new version under a new name), then searched. Must equal
    // a from-scratch search of the FULL corpus — same oracle SQL again.
    "bm25_search_refreshed" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val queries = docs.filter(col("doc_id") % 125 === 0)
        .select(col("doc_id").as("query_id"),
          substring(col("text"), 1, 40).as("text"))
      val bm = Bm25()
      bm.buildIndex(docs.filter(col("doc_id") % 5 < 3), "graft_bm25_v0")
      bm.refreshIndex(docs.filter(col("doc_id") % 5 >= 3),
        "graft_bm25_v0", "graft_bm25_v1")
      bm.searchIndexed(s, "graft_bm25_v1", queries, k = 5)
    }),

    // the segment-fold path: 60% build + 40% roll-forward leaves two
    // segments; compactIndex folds them to one from the NARROW persisted
    // tables (no re-tokenize), and the served ranking must still equal
    // the from-scratch full-corpus search — same oracle a fourth time
    "bm25_search_compacted" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val queries = docs.filter(col("doc_id") % 125 === 0)
        .select(col("doc_id").as("query_id"),
          substring(col("text"), 1, 40).as("text"))
      val bm = Bm25()
      bm.buildIndex(docs.filter(col("doc_id") % 5 < 3), "graft_bm25_w0")
      bm.refreshIndex(docs.filter(col("doc_id") % 5 >= 3),
        "graft_bm25_w0", "graft_bm25_w1")
      bm.compactIndex(s, "graft_bm25_w1", "graft_bm25_wz")
      bm.searchIndexed(s, "graft_bm25_wz", queries, k = 5)
    }),

    // retrieval-eval harness: nDCG@5 of the BM25 ranking against
    // graded shared-distinct-term relevance (rel = |q_terms ∩ d_terms|
    // capped at 3 — deterministic judgments both engines derive from
    // the corpus; the trec_eval-shaped qrels table is the operator's
    // real input at scale)
    "search_eval_ndcg" -> ((s, dir) => {
      import graft.functions.TextFns.{normalizeText, wsTokens}
      val docs = Tables.load(s, dir, "documents")
      val queries = docs.filter(col("doc_id") % 125 === 0)
        .select(col("doc_id").as("query_id"),
          substring(col("text"), 1, 40).as("text"))
      val results = Bm25().search(docs, queries, k = 5)
      val qt = queries.select(col("query_id"),
        explode(array_distinct(wsTokens(normalizeText(col("text"))))).as("term"))
      val dt = docs.select(col("doc_id"),
        explode(array_distinct(wsTokens(normalizeText(col("text"))))).as("term"))
      val qrels = qt.join(dt, "term").groupBy("query_id", "doc_id")
        .agg(least(count(lit(1)), lit(3L)).cast("double").as("rel"))
      graft.operators.text.SearchEval.ndcgAtK(results, qrels, k = 5)
    }),

    // hybrid retrieval: reciprocal-rank fusion of the BM25 top-5 and
    // the cosine top-5 (documents and embeddings align on id)
    "hybrid_search_rrf" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val emb = Tables.load(s, dir, "embeddings")
      val queries = docs.filter(col("doc_id") % 125 === 0)
        .select(col("doc_id").as("query_id"),
          substring(col("text"), 1, 40).as("text"))
      val lex = Bm25().search(docs, queries, k = 5)
      val sem = graft.operators.vector.BruteForceKnn(k = 5)
        .topK(emb.filter(col("vec_id") % 125 === 0), emb)
        .select(col("qid").as("query_id"), col("cid").as("doc_id"),
          col("rn").as("rnk"))
      RrfFusion(c = 60, k = 5).fuse(lex, sem)
    }),

    // polyglot detection: every doc gets a planted second line whose
    // language rotates by doc_id % 3 (de/en/es) — docs whose body
    // language matches the plant read consistent, the rest mixed
    "lang_consistency" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .withColumn("text", concat(
          substring(col("text"), 1, 120), lit("\n"),
          when(col("doc_id") % 3 === 0,
            lit("der hund und die katze ist nicht ein zu mit von"))
            .when(col("doc_id") % 3 === 1,
              lit("the cat and the dog is that for with a"))
            .otherwise(lit("el perro y la casa es de que un una"))))
      PolyglotDetector(maxForeignFrac = 0.3)(docs)
        .select("doc_id", "lang_pred", "n_id_lines", "n_foreign_lines",
          "foreign_line_frac", "is_polyglot")
    })
  )

  private def urlScoreSql(u: String): String = {
    val occ = scoreWeights.map { case (w, wt) =>
      val o = s"CAST((length($u) - length(replace($u, '$w', ''))) / ${w.length} AS INT)"
      (w, wt, o)
    }.toSeq
    val maxW = occ.map { case (_, wt, o) => s"CASE WHEN $o > 0 THEN $wt ELSE 0.0 END" }
      .mkString("greatest(", ", ", ")")
    val total = occ.map { case (_, wt, o) => s"CAST($o AS DOUBLE) * $wt" }.mkString(" + ")
    s"(CASE WHEN ($total) = 0.0 THEN 0.0 ELSE least(0.8 * $maxW + least(($total) / 3.0, 0.2), 1.0) END)"
  }

  /** Shared BM25 pipeline CTEs ending in `lex` = (query_id, doc_id,
    * score, rnk ≤ 5). Constants embed via Double.toString (shortest
    * round-trip repr), so DuckDB parses the exact doubles the Scala
    * side uses. */
  private def bm25CteSql: String = {
    val k1 = 1.2; val b = 0.75
    val k1p1 = (k1 + 1.0).toString
    val oneMb = (1.0 - b).toString
    s"""toks AS (
       |  SELECT doc_id, string_split($normSql, ' ') AS ws FROM documents),
       |post AS (
       |  SELECT term, doc_id, count(*) AS tf FROM (
       |    SELECT doc_id, unnest(ws) AS term FROM toks) GROUP BY 1, 2),
       |dls AS (SELECT doc_id, len(ws) AS dl FROM toks),
       |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n,
       |  CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl FROM dls),
       |dft AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
       |qt AS (
       |  SELECT query_id, unnest(list_distinct(qws)) AS term FROM (
       |    SELECT doc_id AS query_id,
       |      string_split(lower(trim(regexp_replace(substr(text, 1, 40),
       |        '\\s+', ' ', 'g'))), ' ') AS qws
       |    FROM documents WHERE doc_id % 125 = 0)),
       |per AS (
       |  SELECT qt.query_id, post.doc_id,
       |    ln((s.n - dft.df + 0.5) / (dft.df + 0.5) + 1.0) *
       |      (post.tf * $k1p1) /
       |      (post.tf + $k1 * ($oneMb + $b * dls.dl / s.avgdl)) AS sc
       |  FROM qt JOIN post USING (term)
       |  JOIN dft USING (term)
       |  JOIN dls ON post.doc_id = dls.doc_id
       |  CROSS JOIN stats s),
       |bm25agg AS (SELECT query_id, doc_id, round(sum(sc), 6) AS score
       |  FROM per GROUP BY 1, 2),
       |lex AS (
       |  SELECT query_id, doc_id, score,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, doc_id ASC) AS INT) AS rnk
       |  FROM bm25agg QUALIFY rnk <= 5)""".stripMargin
  }

  /** Per-line language-ID CASE (same generator as the `lang_id` oracle,
    * parameterized on the text expression so it can run inside a
    * list_transform lambda). */
  private def langCaseSql(txt: String): String = {
    val scores = LanguageId.profiles.map { case (lang, stops) =>
      val set = stops.map(w => s"'$w'").mkString(", ")
      lang -> s"len(list_filter(string_split_regex(trim(lower($txt)), '\\s+'), w -> w IN ($set)))"
    }
    val best = scores.map(_._2).mkString("greatest(", ", ", ")")
    val cases = scores.map { case (lang, sc) =>
      s"WHEN $sc = $best AND $best > 0 THEN '$lang'"
    }.mkString(" ")
    s"CASE $cases ELSE 'und' END"
  }

  def oracles: Map[String, String] = Map(
    "text_length_filter" ->
      """SELECT doc_id, length(text) AS text_len FROM documents
        |WHERE length(text) BETWEEN 100 AND 2000""".stripMargin,

    "token_count" ->
      s"""SELECT doc_id,
         |  CASE WHEN length(trim(text)) = 0 THEN 0
         |       ELSE len($wsToksSql) END AS n_ws_tokens,
         |  len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]')) AS n_bpe_tokens
         |FROM documents""".stripMargin,

    "c4_clean" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    regexp_replace(
        |      concat(
        |        regexp_replace(
        |          regexp_replace(text, '(table|value|part|row)', '\1.', 'g'),
        |          'spark', 'javascript', 'g'),
        |        CASE WHEN doc_id % 11 = 0 THEN ' lorem ipsum' ELSE '' END,
        |        CASE WHEN doc_id % 13 = 0 THEN ' {' ELSE '' END),
        |      '((?:\S+ ){4}\S+) ', '\1' || chr(10), 'g') AS t
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, t,
        |    string_split_regex(t, '\r?\n') AS lines,
        |    list_filter(string_split_regex(t, '\r?\n'), l ->
        |      (ends_with(trim(l), '.') OR ends_with(trim(l), '!') OR
        |       ends_with(trim(l), '?') OR ends_with(trim(l), '"')) AND
        |      len(string_split_regex(trim(l), '\s+')) >= 5 AND
        |      NOT contains(lower(l), 'javascript')) AS kept
        |  FROM d)
        |SELECT doc_id,
        |  CAST(len(kept) AS BIGINT) AS c4_kept_lines,
        |  CAST(len(lines) - len(kept) AS BIGINT) AS c4_dropped_lines,
        |  contains(lower(t), 'lorem ipsum') AS c4_has_lorem,
        |  contains(t, '{') AS c4_has_brace,
        |  coalesce(array_to_string(kept, chr(10)), '') AS c4_text,
        |  (len(kept) >= 3 AND NOT contains(lower(t), 'lorem ipsum')
        |    AND NOT contains(t, '{')) AS c4_pass
        |FROM f""".stripMargin,

    "gopher_quality" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    string_split_regex(trim(text), '\s+') AS words,
        |    string_split_regex(text, '\r?\n') AS lines,
        |    length(regexp_replace(text, '\s+', '', 'g')) AS chars,
        |    length(text) - length(replace(text, '#', '')) AS hashes,
        |    (length(text) - length(replace(text, '...', ''))) / 3 +
        |      (length(text) - length(replace(text, '…', ''))) AS ellipses
        |  FROM documents),
        |f AS (
        |  SELECT doc_id,
        |    CAST(len(words) AS BIGINT) AS g_word_count,
        |    round(CAST(chars AS DOUBLE) / len(words), 4) AS g_mean_word_len,
        |    round(CAST(hashes + ellipses AS DOUBLE) / len(words), 4) AS g_symbol_ratio,
        |    round(CAST(len(list_filter(lines, l -> trim(l) LIKE '-%' OR
        |      trim(l) LIKE '*%' OR trim(l) LIKE '•%')) AS DOUBLE) / len(lines), 4)
        |      AS g_bullet_ratio,
        |    round(CAST(len(list_filter(lines, l -> l LIKE '%...' OR l LIKE '%…'))
        |      AS DOUBLE) / len(lines), 4) AS g_ellipsis_ratio,
        |    round(CAST(len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]')))
        |      AS DOUBLE) / len(words), 4) AS g_alpha_ratio,
        |    CAST(CAST(list_contains(words, 'the') AS INT) +
        |         CAST(list_contains(words, 'a') AS INT) AS BIGINT) AS g_stop_hits
        |  FROM w)
        |SELECT *,
        |  (g_word_count BETWEEN 50 AND 100000 AND
        |   g_mean_word_len BETWEEN 3.0 AND 10.0 AND
        |   g_symbol_ratio <= 0.1 AND g_bullet_ratio <= 0.9 AND
        |   g_ellipsis_ratio <= 0.3 AND g_alpha_ratio >= 0.8 AND
        |   g_stop_hits >= 2) AS gopher_pass
        |FROM f""".stripMargin,

    "quality_score" -> {
      val stops = defaultStopwords.map(w => s"'$w'").mkString(", ")
      s"""WITH base AS (
         |  SELECT doc_id, length(text) AS q_n_chars,
         |    CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len($wsToksSql) END AS q_n_words,
         |    CASE WHEN length(text) = 0 THEN 0.0 ELSE
         |      CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) / length(text) END AS punct_raw,
         |    CASE WHEN length(trim(text)) = 0 THEN 0.0 ELSE
         |      CAST(len(list_filter($wsToksSql, t -> t IN ($stops))) AS DOUBLE) / len($wsToksSql) END AS stop_raw,
         |    CASE WHEN length(text) = 0 THEN 0.0 ELSE
         |      CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS DOUBLE) / length(text) END AS alpha_raw,
         |    CASE WHEN length(trim(text)) = 0 THEN 0.0 ELSE
         |      CAST(list_aggregate(list_transform($wsToksSql, t -> length(t)), 'sum') AS DOUBLE) / len($wsToksSql) END AS mwl_raw
         |  FROM documents)
         |SELECT doc_id, q_n_chars, q_n_words,
         |  round(punct_raw, 6) AS q_punct_ratio,
         |  round(stop_raw, 6) AS q_stopword_ratio,
         |  round(alpha_raw, 6) AS q_alpha_ratio,
         |  round(mwl_raw, 6) AS q_mean_word_len,
         |  round(least(CAST(q_n_words AS DOUBLE) / 100.0, 1.0) * 0.25
         |    + (1.0 - least(punct_raw * 4.0, 1.0)) * 0.25
         |    + least(stop_raw * 5.0, 1.0) * 0.25
         |    + alpha_raw * 0.25, 4) AS q_score
         |FROM base""".stripMargin
    },

    "lang_id" -> {
      val scores = LanguageId.profiles.map { case (lang, stops) =>
        val set = stops.map(w => s"'$w'").mkString(", ")
        lang -> s"len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), w -> w IN ($set)))"
      }
      val best = scores.map(_._2).mkString("greatest(", ", ", ")")
      val cases = scores.map { case (lang, sc) =>
        s"WHEN $sc = best AND best > 0 THEN '$lang'"
      }.mkString(" ")
      s"""WITH scored AS (SELECT doc_id, text, $best AS best FROM documents)
         |SELECT doc_id, CASE $cases ELSE 'und' END AS lang_pred FROM scored""".stripMargin
    },

    "fingerprint" ->
      s"""SELECT doc_id,
         |  CASE WHEN length($normSql) < 8 THEN md5($normSql)
         |       ELSE list_min(list_transform(range(1, length($normSql) - 6),
         |              i -> md5(substr($normSql, CAST(i AS INT), 8)))) END AS fingerprint,
         |  md5($normSql) AS content_hash
         |FROM documents""".stripMargin,

    "html_extract" -> {
      val html = "'<html><head><style>b{color:red}</style></head><body><h1>Title &amp; Co</h1><p>' || text || '</p><script>var x=1;</script></body></html>'"
      s"""SELECT doc_id, trim(regexp_replace(
         |  replace(replace(replace(replace(replace(replace(
         |    regexp_replace(
         |      regexp_replace(
         |        regexp_replace(
         |          regexp_replace($html, '<script[^>]*>.*?</script>', ' ', 'gis'),
         |        '<style[^>]*>.*?</style>', ' ', 'gis'),
         |      '<!--.*?-->', ' ', 'gs'),
         |    '<[^>]+>', ' ', 'gs'),
         |  '&nbsp;', ' '), '&amp;', '&'), '&lt;', '<'), '&gt;', '>'),
         |  '&quot;', '"'), '&#39;', ''''),
         |  '\\s+', ' ', 'g')) AS extracted
         |FROM documents""".stripMargin
    },

    "url_filter_score" -> {
      s"""WITH u AS (SELECT doc_id, lower($urlSql) AS url FROM documents)
         |SELECT doc_id, round(${urlScoreSql("url")}, 6) AS url_score,
         |  ${urlScoreSql("url")} < $scoreThreshold AS keep
         |FROM u""".stripMargin
    },

    "url_filter_blocklist" -> {
      val d = "domain"
      s"""WITH u AS (SELECT doc_id, ${domainSql(urlSql)} AS domain FROM documents)
         |SELECT doc_id, domain,
         |  NOT ${domainInSetSql(d, blockedDomains)} AS keep
         |FROM u""".stripMargin
    },

    "url_filter_quality_sources" -> {
      val u = s"CASE WHEN doc_id % 7 = 0 THEN 'https://en.wikipedia.org/wiki/' || doc_id ELSE $urlSql END"
      s"""WITH q AS (SELECT doc_id, ${domainSql(u)} AS domain FROM documents)
         |SELECT doc_id, ${domainInSetSql("domain", defaultQualitySources)} AS is_quality
         |FROM q""".stripMargin
    },

    "dedup_exact" ->
      s"""SELECT md5($normSql) AS content_hash, min(doc_id) AS keep_id,
         |  count(*) AS dup_count
         |FROM documents GROUP BY 1""".stripMargin,

    "pack_sequences" ->
      s"""WITH n AS (
         |  SELECT doc_id,
         |    CASE WHEN length(trim(text)) = 0 THEN 0
         |         ELSE len($wsToksSql) END AS n_tokens
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         |    CAST(sum(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
         |  FROM n)
         |SELECT doc_id, n_tokens, cum_tokens,
         |  CAST(floor((cum_tokens - n_tokens) / 2048.0) AS BIGINT) AS seq_id,
         |  (cum_tokens - n_tokens) % 2048 AS seq_offset
         |FROM c""".stripMargin,

    "chunk_documents" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split($normSql, ' ') AS ws
         |  FROM documents WHERE length(trim(text)) > 0),
         |c AS (
         |  SELECT doc_id, ws, unnest(range(0,
         |    GREATEST(CAST(ceil((len(ws) - 64) / 56.0) AS BIGINT), 0) + 1)) AS chunk_id
         |  FROM t)
         |SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
         |  array_to_string(list_slice(ws, chunk_id * 56 + 1, chunk_id * 56 + 64), ' ') AS chunk_text,
         |  CAST(LEAST(len(ws) - chunk_id * 56, 64) AS BIGINT) AS chunk_tokens
         |FROM c""".stripMargin,

    "tfidf_top_terms" ->
      s"""WITH d AS (
         |  SELECT doc_id, $normSql AS norm FROM documents
         |  WHERE length(trim(text)) > 0),
         |toks AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS term FROM d),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
         |dfreq AS (SELECT term, count(*) AS df
         |  FROM (SELECT DISTINCT doc_id, term FROM toks) GROUP BY 1),
         |n AS (SELECT count(*) AS c FROM d),
         |idf AS (SELECT term, round(ln((c + 1.0) / (df + 1.0)) + 1.0, 6) AS idf
         |  FROM dfreq, n),
         |s AS (SELECT doc_id, term, round(tf * idf, 6) AS tfidf
         |  FROM tf JOIN idf USING (term)),
         |r AS (SELECT doc_id, term, tfidf,
         |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS INT) AS rn
         |  FROM s)
         |SELECT doc_id, term, tfidf, rn FROM r WHERE rn <= 3""".stripMargin,

    "top_bigrams" ->
      s"""WITH bi AS (
         |  SELECT unnest(list_transform(range(1, len(ws)),
         |    i -> ws[CAST(i AS INT)] || ' ' || ws[CAST(i AS INT) + 1])) AS bigram
         |  FROM (SELECT string_split($normSql, ' ') AS ws FROM documents)
         |  WHERE len(ws) >= 2)
         |SELECT bigram, count(*) AS n FROM bi GROUP BY 1
         |ORDER BY n DESC, bigram ASC LIMIT 20""".stripMargin,

    "dedup_url" -> {
      val sh = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"
      s"""WITH raw AS (
         |  SELECT doc_id,
         |    'HTTPS://WWW.' || upper(source) || '.Example.COM:443/Docs/' ||
         |    CAST(doc_id AS VARCHAR) || '/?utm_source=feed&ref=rss&q=' ||
         |    CAST(doc_id % 7 AS VARCHAR) || '&utm_campaign=x#sec' ||
         |    CAST(doc_id % 3 AS VARCHAR) AS u
         |  FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000 AS doc_id,
         |    'https://WWW.' || upper(source) || '.EXAMPLE.com/Docs/' ||
         |    CAST(doc_id AS VARCHAR) || '/?utm_medium=email&q=' ||
         |    CAST(doc_id % 7 AS VARCHAR) || '&fbclid=abc#other' AS u
         |  FROM documents
         |  UNION ALL
         |  SELECT doc_id + 2000000 AS doc_id, CAST(NULL AS VARCHAR) AS u
         |  FROM documents WHERE doc_id % 100 = 0),
         |s1 AS (SELECT doc_id, regexp_replace(u, '#.*$$', '', 'g') AS u FROM raw),
         |s2 AS (SELECT doc_id,
         |  lower(regexp_extract(u, '$sh', 0)) || regexp_replace(u, '$sh', '', 'g') AS u
         |  FROM s1),
         |s3 AS (SELECT doc_id, regexp_replace(
         |  replace(replace(replace(replace(u, ':443/', '/'), ':80/', '/'),
         |    ':443?', '?'), ':80?', '?'), ':(80|443)$$', '', 'g') AS u FROM s2),
         |s4 AS (SELECT doc_id, regexp_replace(regexp_replace(u, '\\?', '&', 'g'),
         |  '${graft.functions.UrlFns.trackingParamPat}', '', 'g') AS u FROM s3),
         |s5 AS (SELECT doc_id, regexp_extract(u, '^[^&]*', 0) AS base,
         |  regexp_replace(u, '^[^&]*&?', '', 'g') AS rest FROM s4),
         |c AS (SELECT doc_id, regexp_replace(
         |  CASE WHEN rest = '' THEN base ELSE base || '?' || rest END,
         |  '/$$', '', 'g') AS canonical
         |FROM s5),
         |keyed AS (SELECT doc_id, canonical FROM c WHERE canonical IS NOT NULL
         |  QUALIFY row_number() OVER (PARTITION BY canonical ORDER BY doc_id) = 1)
         |SELECT doc_id, canonical FROM keyed
         |UNION ALL
         |SELECT doc_id, canonical FROM c WHERE canonical IS NULL""".stripMargin
    },

    "url_canonicalize" -> {
      val sh = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"
      s"""WITH t AS (
         |  SELECT doc_id,
         |    'HTTPS://WWW.' || upper(source) || '.Example.COM:443/Docs/' ||
         |    CAST(doc_id AS VARCHAR) || '/?utm_source=feed&ref=rss&q=' ||
         |    CAST(doc_id % 7 AS VARCHAR) || '&utm_campaign=x#sec' ||
         |    CAST(doc_id % 3 AS VARCHAR) AS u
         |  FROM documents),
         |s1 AS (SELECT doc_id, regexp_replace(u, '#.*$$', '', 'g') AS u FROM t),
         |s2 AS (SELECT doc_id,
         |  lower(regexp_extract(u, '$sh', 0)) || regexp_replace(u, '$sh', '', 'g') AS u
         |  FROM s1),
         |s3 AS (SELECT doc_id, regexp_replace(
         |  replace(replace(replace(replace(u, ':443/', '/'), ':80/', '/'),
         |    ':443?', '?'), ':80?', '?'), ':(80|443)$$', '', 'g') AS u FROM s2),
         |s4 AS (SELECT doc_id, regexp_replace(regexp_replace(u, '\\?', '&', 'g'),
         |  '${graft.functions.UrlFns.trackingParamPat}', '', 'g') AS u FROM s3),
         |s5 AS (SELECT doc_id, regexp_extract(u, '^[^&]*', 0) AS base,
         |  regexp_replace(u, '^[^&]*&?', '', 'g') AS rest FROM s4)
         |SELECT doc_id, regexp_replace(
         |  CASE WHEN rest = '' THEN base ELSE base || '?' || rest END,
         |  '/$$', '', 'g') AS canonical
         |FROM s5""".stripMargin
    },

    "line_dedup" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |idx AS (SELECT doc_id, unnest(list_transform(range(1, len(ws) + 1),
        |  i -> {'i': i, 'l': ws[CAST(i AS INT)]})) AS u FROM t),
        |firsts AS (SELECT doc_id, u.l AS l, min(u.i) AS mi FROM idx GROUP BY doc_id, u.l),
        |agg AS (SELECT doc_id, string_agg(l, chr(10) ORDER BY mi) AS deduped,
        |  count(*) AS n_unique_lines FROM firsts GROUP BY doc_id)
        |SELECT t.doc_id, agg.deduped, CAST(len(t.ws) AS BIGINT) AS n_lines,
        |  CAST(agg.n_unique_lines AS BIGINT) AS n_unique_lines
        |FROM t JOIN agg USING (doc_id)""".stripMargin,

    "decontaminate" -> {
      val n = 5
      val sh5 = (0 until n).map(j => s"ws[CAST(i AS INT) + $j]").mkString(" || ' ' || ")
      s"""WITH w AS (SELECT doc_id, string_split($normSql, ' ') AS ws FROM documents),
         |sh AS (
         |  SELECT doc_id, unnest(list_transform(range(1, len(ws) - ${n - 2}),
         |    i -> $sh5)) AS sh
         |  FROM w WHERE len(ws) >= $n),
         |bsh AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 50 = 0),
         |hits AS (SELECT DISTINCT s.doc_id FROM sh s JOIN bsh USING (sh))
         |SELECT d.doc_id, (h.doc_id IS NOT NULL) AS is_contaminated
         |FROM documents d LEFT JOIN hits h USING (doc_id)""".stripMargin
    },

    "sample_stratified" ->
      """WITH b AS (
        |  SELECT doc_id, lang,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':graft'), 1, 7)) AS BIGINT) % 100 AS bucket
        |  FROM documents)
        |SELECT doc_id, lang FROM b
        |WHERE bucket < CASE WHEN lang = 'en' THEN 50 ELSE 10 END""".stripMargin,

    "sample_per_group" ->
      """WITH r AS (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR) || ':graft'), doc_id) AS rn
        |  FROM documents)
        |SELECT doc_id, lang FROM r WHERE rn <= 3""".stripMargin,

    "quality_topq" ->
      s"""WITH scored AS (
         |  SELECT doc_id, source,
         |    CASE WHEN doc_id % 97 = 0 THEN NULL
         |         WHEN length(trim(text)) = 0 THEN 0
         |         ELSE len($wsToksSql) END AS score
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, source, score,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY score DESC, doc_id) AS rn,
         |    count(*) OVER (PARTITION BY source) AS n
         |  FROM scored WHERE score IS NOT NULL)
         |SELECT doc_id, source, CAST(score AS BIGINT) AS score
         |FROM r WHERE rn <= CAST(ceil(n * 0.2) AS BIGINT)""".stripMargin,

    "domain_cap" ->
      s"""WITH scored AS (
         |  SELECT doc_id, source,
         |    CASE WHEN doc_id % 97 = 0 THEN NULL
         |         WHEN length(trim(text)) = 0 THEN 0
         |         ELSE len($wsToksSql) END AS score
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, source, score,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY score DESC, doc_id) AS rn
         |  FROM scored WHERE score IS NOT NULL)
         |SELECT doc_id, source, CAST(score AS BIGINT) AS score
         |FROM r WHERE rn <= 15""".stripMargin,

    "hash_sample_split" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':graft'), 1, 7)) AS BIGINT) % 100 AS bucket
        |  FROM documents)
        |SELECT doc_id, bucket,
        |  CASE WHEN bucket < 80 THEN 'train'
        |       WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
        |FROM b""".stripMargin,

    "span_dup_stats" ->
      s"""WITH sh AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |    range(1, greatest(len(string_split($normSql, ' ')) - 1, 1)),
         |    i -> string_split($normSql, ' ')[CAST(i AS INT)] || ' ' ||
         |         string_split($normSql, ' ')[CAST(i AS INT) + 1] || ' ' ||
         |         string_split($normSql, ' ')[CAST(i AS INT) + 2]))) AS sh
         |  FROM documents WHERE len(string_split($normSql, ' ')) >= 3),
         |dfc AS (SELECT sh, count(DISTINCT doc_id) AS df FROM sh GROUP BY sh)
         |SELECT s.doc_id, count(*) AS n_ngrams,
         |  CAST(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_ngrams,
         |  round(CAST(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
         |    AS dup_ngram_frac
         |FROM sh s JOIN dfc ON s.sh = dfc.sh
         |GROUP BY s.doc_id""".stripMargin,

    "boilerplate_removal" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    'subscribe to our newsletter' || chr(10) || text || chr(10) || 'copyright ' || source AS t
        |  FROM documents),
        |lines AS (
        |  SELECT doc_id, i AS pos, string_split(t, chr(10))[CAST(i AS INT)] AS line
        |  FROM (SELECT doc_id, t, unnest(range(1, len(string_split(t, chr(10))) + 1)) AS i
        |        FROM base)),
        |boiler AS (
        |  SELECT line FROM lines WHERE length(trim(line)) > 0
        |  GROUP BY line HAVING count(DISTINCT doc_id) >= 10),
        |kept AS (
        |  SELECT l.doc_id, l.pos, l.line FROM lines l
        |  LEFT JOIN boiler b ON l.line = b.line WHERE b.line IS NULL),
        |rebuilt AS (
        |  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
        |  FROM kept GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(r.text, '') AS text
        |FROM documents d LEFT JOIN rebuilt r ON d.doc_id = r.doc_id""".stripMargin,

    "mixture_sample" ->
      """WITH rates AS (
        |  SELECT source, count(*) AS n,
        |    least(1.0, 60.0 * (CASE source WHEN 'src0' THEN 0.4 WHEN 'src1' THEN 0.3
        |      WHEN 'src2' THEN 0.2 WHEN 'src3' THEN 0.1 ELSE 0.0 END)
        |      / CAST(count(*) AS DOUBLE)) AS rate
        |  FROM documents GROUP BY source)
        |SELECT d.doc_id, d.source
        |FROM documents d JOIN rates r ON d.source = r.source
        |WHERE CAST(CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':graft'), 1, 7)) AS BIGINT) AS DOUBLE) / 268435456.0 < r.rate""".stripMargin,

    "mixture_temperature" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 77 = 0 THEN NULL ELSE source END AS source
        |  FROM documents),
        |c AS (
        |  SELECT source, count(*) AS n,
        |    pow(CAST(count(*) AS DOUBLE), 1.0 / 3.0) AS p
        |  FROM d GROUP BY source),
        |t AS (SELECT sum(p) AS tot FROM c),
        |r AS (
        |  SELECT source,
        |    least(1.0, round(120.0 * p / tot / CAST(n AS DOUBLE), 6)) AS rate
        |  FROM c, t)
        |SELECT d.doc_id, d.source
        |FROM d JOIN r ON d.source IS NOT DISTINCT FROM r.source
        |WHERE CAST(CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':graft'), 1, 7)) AS BIGINT) AS DOUBLE) / 268435456.0 < r.rate""".stripMargin,

    "mixture_unimax_budgets" ->
      s"""WITH $unimaxCteSql
        |SELECT source, n_tokens, budget FROM b""".stripMargin,

    "mixture_unimax" ->
      s"""WITH $unimaxCteSql,
        |g AS (
        |  SELECT doc_id, source, tok,
        |    CAST(sum(tok) OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR) || ':graft'), doc_id) AS BIGINT) AS cum
        |  FROM t)
        |SELECT g.doc_id, g.source
        |FROM g JOIN b ON g.source IS NOT DISTINCT FROM b.source
        |WHERE g.cum - g.tok < b.budget""".stripMargin,

    "ccnet_buckets" ->
      s"""WITH toks AS (
        |  SELECT doc_id, lang, unnest(string_split($normSql, ' ')) AS t
        |  FROM documents WHERE length(trim(text)) > 0),
        |counts AS (SELECT lang, t, count(*) AS n FROM toks GROUP BY 1, 2),
        |tot AS (SELECT lang, sum(n) AS total FROM counts GROUP BY lang),
        |lm AS (SELECT counts.lang, t, ln(CAST(n AS DOUBLE) / total) AS logp
        |       FROM counts JOIN tot ON counts.lang IS NOT DISTINCT FROM tot.lang),
        |sc AS (
        |  SELECT toks.doc_id, toks.lang, round(exp(-avg(logp)), 4) AS pp
        |  FROM toks JOIN lm ON toks.lang IS NOT DISTINCT FROM lm.lang
        |                   AND toks.t = lm.t
        |  GROUP BY 1, 2),
        |hist AS (SELECT lang, pp, count(*) AS c FROM sc GROUP BY 1, 2),
        |cdf AS (SELECT lang, pp,
        |    sum(c) OVER (PARTITION BY lang ORDER BY pp) AS cum,
        |    sum(c) OVER (PARTITION BY lang) AS n
        |  FROM hist),
        |thr AS (SELECT lang,
        |    min(CASE WHEN cum >= ceil(n / 3.0) THEN pp END) AS t1,
        |    min(CASE WHEN cum >= ceil(2.0 * n / 3.0) THEN pp END) AS t2
        |  FROM cdf GROUP BY lang)
        |SELECT sc.doc_id, sc.lang, sc.pp AS perplexity,
        |  CASE WHEN sc.pp <= thr.t1 THEN 'head'
        |       WHEN sc.pp <= thr.t2 THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM sc JOIN thr ON sc.lang IS NOT DISTINCT FROM thr.lang""".stripMargin,

    // pruned-LM replay: single-level per-lang row_number top-k (the
    // Spark side's salted two-level rank is exact, so the sets agree),
    // left join + per-language floor coalesce; in-vocab probabilities
    // keep the UNPRUNED per-language total
    "ccnet_buckets_pruned" ->
      s"""WITH toks AS (
        |  SELECT doc_id, lang, unnest(string_split($normSql, ' ')) AS t
        |  FROM documents WHERE length(trim(text)) > 0),
        |counts AS (SELECT lang, t, count(*) AS n FROM toks GROUP BY 1, 2),
        |tot AS (SELECT lang, sum(n) AS total FROM counts GROUP BY lang),
        |kept AS (
        |  SELECT lang, t, n FROM (
        |    SELECT lang, t, n,
        |      row_number() OVER (PARTITION BY lang ORDER BY n DESC, t ASC) AS r
        |    FROM counts) WHERE r <= 10),
        |lm AS (SELECT kept.lang, t, ln(CAST(n AS DOUBLE) / total) AS logp
        |       FROM kept JOIN tot ON kept.lang IS NOT DISTINCT FROM tot.lang),
        |fl AS (SELECT lang, ln(1.0 / total) AS floor FROM tot),
        |sc AS (
        |  SELECT toks.doc_id, toks.lang,
        |    round(exp(-avg(coalesce(lm.logp, fl.floor))), 4) AS pp
        |  FROM toks
        |  LEFT JOIN lm ON toks.lang IS NOT DISTINCT FROM lm.lang
        |               AND toks.t = lm.t
        |  JOIN fl ON toks.lang IS NOT DISTINCT FROM fl.lang
        |  GROUP BY 1, 2),
        |hist AS (SELECT lang, pp, count(*) AS c FROM sc GROUP BY 1, 2),
        |cdf AS (SELECT lang, pp,
        |    sum(c) OVER (PARTITION BY lang ORDER BY pp) AS cum,
        |    sum(c) OVER (PARTITION BY lang) AS n
        |  FROM hist),
        |thr AS (SELECT lang,
        |    min(CASE WHEN cum >= ceil(n / 3.0) THEN pp END) AS t1,
        |    min(CASE WHEN cum >= ceil(2.0 * n / 3.0) THEN pp END) AS t2
        |  FROM cdf GROUP BY lang)
        |SELECT sc.doc_id, sc.lang, sc.pp AS perplexity,
        |  CASE WHEN sc.pp <= thr.t1 THEN 'head'
        |       WHEN sc.pp <= thr.t2 THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM sc JOIN thr ON sc.lang IS NOT DISTINCT FROM thr.lang""".stripMargin,

    "packing_report" ->
      s"""WITH n AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len($wsToksSql) END AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |    CAST(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
        |  FROM n),
        |p AS (SELECT n_tokens, (cum_tokens - n_tokens) % 2048 AS seq_offset FROM c)
        |SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(ceil(sum(n_tokens) / 2048.0) AS BIGINT) AS n_seqs,
        |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |  CAST(sum(CASE WHEN seq_offset + n_tokens > 2048 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS crossing_docs,
        |  round(CAST(sum(CASE WHEN seq_offset + n_tokens > 2048 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 6) AS crossing_frac,
        |  CAST(sum(n_tokens) AS BIGINT) % 2048 AS tail_tokens
        |FROM p""".stripMargin,

    "token_budget_sample" ->
      s"""WITH t AS (
        |  SELECT doc_id, source,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len($wsToksSql) END AS tok,
        |    md5(CAST(doc_id AS VARCHAR) || ':graft') AS ok
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, tok,
        |    CAST(sum(tok) OVER (PARTITION BY source ORDER BY ok, doc_id) AS BIGINT) AS cum
        |  FROM t)
        |SELECT doc_id, source FROM c
        |WHERE cum - tok < CASE source WHEN 'src0' THEN 800
        |  WHEN 'src1' THEN 400 ELSE 150 END""".stripMargin,

    "token_budget_sharded" ->
      s"""WITH t AS (
        |  SELECT doc_id, source,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len($wsToksSql) END AS tok,
        |    md5(CAST(doc_id AS VARCHAR) || ':graft') AS ok,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':shard:graft'),
        |      1, 7)) AS BIGINT) % 4 AS shard
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, tok, shard,
        |    CASE source WHEN 'src0' THEN 800 WHEN 'src1' THEN 400
        |      ELSE 150 END AS budget,
        |    CAST(sum(tok) OVER (PARTITION BY source, shard
        |      ORDER BY ok, doc_id) AS BIGINT) AS cum
        |  FROM t)
        |SELECT doc_id, source FROM c
        |WHERE cum - tok < budget // 4 +
        |  (CASE WHEN shard < budget % 4 THEN 1 ELSE 0 END)""".stripMargin,

    "training_shards" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
        |      || ':shard:graft'), 1, 7)) AS BIGINT) % 8 AS INT) AS shard,
        |    md5(CAST(doc_id AS VARCHAR) || ':ord:graft') AS ok
        |  FROM documents)
        |SELECT doc_id, shard,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY ok, doc_id)
        |    - 1 AS BIGINT) AS pos
        |FROM t""".stripMargin,

    "curriculum_shards" ->
      s"""WITH toks AS (
        |  SELECT doc_id, unnest(string_split($normSql, ' ')) AS t FROM documents),
        |counts AS (SELECT t, count(*) AS n FROM toks GROUP BY t),
        |total AS (SELECT sum(n) AS total FROM counts),
        |lm AS (SELECT t, ln(CAST(n AS DOUBLE) / total) AS logp FROM counts, total),
        |pp AS (
        |  SELECT toks.doc_id, round(exp(-avg(logp)), 4) AS perplexity
        |  FROM toks JOIN lm ON toks.t = lm.t GROUP BY toks.doc_id),
        |sh AS (
        |  SELECT doc_id, perplexity,
        |    CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
        |      || ':shard:graft'), 1, 7)) AS BIGINT) % 8 AS INT) AS shard
        |  FROM pp)
        |SELECT doc_id, shard,
        |  CAST(row_number() OVER (PARTITION BY shard
        |    ORDER BY perplexity, doc_id) - 1 AS BIGINT) AS pos
        |FROM sh""".stripMargin,

    "vocab_coverage" ->
      s"""WITH toks AS (
        |  SELECT unnest(string_split($normSql, ' ')) AS t
        |  FROM documents WHERE length(trim(text)) > 0),
        |cnts AS (SELECT t, count(*) AS c FROM toks GROUP BY t),
        |hist AS MATERIALIZED (
        |  SELECT c, count(*) AS ntoks, count(*) * c AS mass FROM cnts GROUP BY c),
        |cdf AS MATERIALIZED (
        |  SELECT c, ntoks, mass,
        |    sum(ntoks) OVER (ORDER BY c DESC) AS cumt,
        |    sum(mass) OVER () AS totm
        |  FROM hist),
        |ks AS (SELECT unnest([100, 1000, 10000]) AS vocab_size)
        |SELECT vocab_size, covered_occurrences, total_occurrences,
        |  round(CAST(covered_occurrences AS DOUBLE) / total_occurrences, 6)
        |    AS coverage,
        |  round(CAST(total_occurrences - covered_occurrences AS DOUBLE)
        |    / total_occurrences, 6) AS oov_rate
        |FROM (
        |  SELECT ks.vocab_size AS vocab_size,
        |    CAST(coalesce(sum(CASE WHEN cumt <= ks.vocab_size THEN mass END), 0)
        |      + coalesce(max(CASE WHEN cumt - ntoks < ks.vocab_size
        |          AND ks.vocab_size < cumt
        |          THEN (ks.vocab_size - (cumt - ntoks)) * c END), 0) AS BIGINT)
        |      AS covered_occurrences,
        |    CAST(max(totm) AS BIGINT) AS total_occurrences
        |  FROM cdf, ks GROUP BY 1)""".stripMargin,

    "bpe_train_merges" ->
      """WITH words AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS n,
        |    list_concat(string_split(w, ''), ['</w>']) AS syms
        |  FROM (SELECT unnest(regexp_extract_all(lower(text), '[\p{L}\p{N}]+')) AS w
        |        FROM documents)
        |  GROUP BY w),
        |pc1 AS (
        |  SELECT syms[CAST(j AS INT)] AS l, syms[CAST(j AS INT) + 1] AS r,
        |    CAST(sum(n) AS BIGINT) AS cnt
        |  FROM (SELECT syms, n, unnest(range(1, len(syms))) AS j FROM words)
        |  GROUP BY 1, 2),
        |best1 AS (SELECT l, r, cnt FROM pc1 ORDER BY cnt DESC, l DESC, r DESC LIMIT 1),
        |pos1 AS (
        |  SELECT w, n, syms, CAST(j AS INT) AS j, syms[CAST(j AS INT)] AS s,
        |    syms[CAST(j AS INT) + 1] AS nxt
        |  FROM (SELECT w, n, syms, unnest(range(1, len(syms) + 1)) AS j FROM words)),
        |cand1 AS (
        |  SELECT p.w, p.j FROM pos1 p, best1 b
        |  WHERE p.j < len(p.syms) AND p.s = b.l AND p.nxt = b.r),
        |act1 AS (
        |  SELECT w, j FROM (
        |    SELECT w, j, j - min(j) OVER (PARTITION BY w, rid) AS off FROM (
        |      SELECT w, j, j - row_number() OVER (PARTITION BY w ORDER BY j) AS rid
        |      FROM cand1))
        |  WHERE off % 2 = 0),
        |words2 AS (
        |  SELECT x.w, any_value(x.n) AS n, list(x.tok ORDER BY x.j) AS syms
        |  FROM (
        |    SELECT p.w, p.n, p.j,
        |      CASE WHEN a.j IS NOT NULL THEN p.s || p.nxt ELSE p.s END AS tok
        |    FROM pos1 p
        |    LEFT JOIN act1 a ON p.w = a.w AND p.j = a.j
        |    LEFT JOIN act1 ap ON p.w = ap.w AND p.j - 1 = ap.j
        |    WHERE ap.j IS NULL) x
        |  GROUP BY x.w),
        |pc2 AS (
        |  SELECT syms[CAST(j AS INT)] AS l, syms[CAST(j AS INT) + 1] AS r,
        |    CAST(sum(n) AS BIGINT) AS cnt
        |  FROM (SELECT syms, n, unnest(range(1, len(syms))) AS j FROM words2)
        |  GROUP BY 1, 2),
        |best2 AS (SELECT l, r, cnt FROM pc2 ORDER BY cnt DESC, l DESC, r DESC LIMIT 1)
        |SELECT CAST(1 AS INT) AS rank, l AS "left", r AS "right", cnt FROM best1
        |UNION ALL
        |SELECT CAST(2 AS INT) AS rank, l AS "left", r AS "right", cnt FROM best2""".stripMargin,

    "span_removal" ->
      s"""WITH d AS (SELECT doc_id, string_split($normSql, ' ') AS w FROM documents),
         |toks AS (
         |  SELECT doc_id, CAST(i - 1 AS INT) AS pos, w[CAST(i AS INT)] AS tok
         |  FROM (SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS i FROM d)),
         |grams AS (
         |  SELECT doc_id, CAST(i - 1 AS INT) AS gpos,
         |    w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT) + 1] || ' ' ||
         |    w[CAST(i AS INT) + 2] AS sh
         |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i FROM d
         |        WHERE len(w) >= 3)),
         |occ AS (
         |  SELECT doc_id, gpos,
         |    row_number() OVER (PARTITION BY sh ORDER BY doc_id, gpos) AS rn,
         |    count(*) OVER (PARTITION BY sh) AS cnt
         |  FROM grams),
         |starts AS (SELECT doc_id, gpos FROM occ WHERE cnt >= 2 AND rn > 1),
         |covered AS (
         |  SELECT DISTINCT doc_id, gpos + CAST(k AS INT) AS pos
         |  FROM starts, range(0, 3) r(k)),
         |kept AS (
         |  SELECT t.doc_id, t.pos, t.tok FROM toks t
         |  LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.pos = c.pos
         |  WHERE c.doc_id IS NULL),
         |rebuilt AS (
         |  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text,
         |    count(*) AS n_kept
         |  FROM kept GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(r.text, '') AS text,
         |  CAST(len(d.w) AS BIGINT) AS n_tokens,
         |  CAST(len(d.w) - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed
         |FROM d LEFT JOIN rebuilt r ON d.doc_id = r.doc_id""".stripMargin,

    "dsir_select" ->
      s"""WITH d AS (
         |  SELECT doc_id, lang, $normSql AS norm FROM documents
         |  WHERE length(trim(text)) > 0),
         |feats AS (
         |  SELECT doc_id, lang, unnest(string_split(norm, ' ')) AS f FROM d
         |  UNION ALL
         |  SELECT doc_id, lang,
         |    string_split(norm, ' ')[CAST(i AS INT)] || ' ' ||
         |    string_split(norm, ' ')[CAST(i AS INT) + 1] AS f
         |  FROM (SELECT doc_id, lang, norm,
         |          unnest(range(1, len(string_split(norm, ' ')))) AS i FROM d)),
         |fb AS (
         |  SELECT doc_id, lang,
         |    CAST(('0x' || substr(md5(f || ':dsir'), 1, 7)) AS BIGINT) % 1024 AS b
         |  FROM feats),
         |t AS (SELECT b, count(*) AS ct FROM fb WHERE lang = 'en' GROUP BY b),
         |r AS (SELECT b, count(*) AS cr FROM fb GROUP BY b),
         |tt AS (SELECT sum(ct) AS tt FROM t),
         |rt AS (SELECT sum(cr) AS rt FROM r),
         |lam AS (
         |  SELECT coalesce(t.b, r.b) AS b,
         |    round(ln((coalesce(ct, 0) + 1.0) / (tt + 1024.0)) -
         |          ln((coalesce(cr, 0) + 1.0) / (rt + 1024.0)), 9) AS lam
         |  FROM t FULL OUTER JOIN r ON t.b = r.b, tt, rt),
         |sums AS (
         |  SELECT fb.doc_id, round(sum(lam), 6) AS dsir_score
         |  FROM fb JOIN lam ON fb.b = lam.b GROUP BY fb.doc_id),
         |sc AS (
         |  SELECT documents.doc_id, coalesce(dsir_score, 0.0) AS dsir_score,
         |    round(-ln(-ln((CAST(('0x' || substr(md5(CAST(documents.doc_id AS VARCHAR)
         |      || ':dsir:gum'), 1, 6)) AS BIGINT) + 0.5) / 16777216.0)), 6) AS g
         |  FROM documents LEFT JOIN sums ON documents.doc_id = sums.doc_id),
         |ranked AS (
         |  SELECT doc_id, dsir_score,
         |    CAST(row_number() OVER (ORDER BY round(dsir_score / 1.0 + g, 6) DESC,
         |      doc_id ASC) AS INT) AS rnk
         |  FROM sc)
         |SELECT doc_id, dsir_score, rnk FROM ranked WHERE rnk <= 100""".stripMargin,

    "code_detect" -> {
      import graft.operators.text.CodeDetector.{indentPat, punctPat, keywordPat}
      val isCode = s"regexp_matches(l, '$indentPat') OR " +
        s"regexp_matches(trim(l), '$punctPat') OR " +
        s"regexp_matches(l, '$keywordPat')"
      s"""WITH t AS (
         |  SELECT doc_id, concat_ws(chr(10),
         |    substr(text, 1, 40),
         |    CASE WHEN doc_id % 3 = 0 THEN 'def process(x):' END,
         |    CASE WHEN doc_id % 3 = 0 THEN '    return x * 2;' END,
         |    CASE WHEN doc_id % 3 = 1 THEN 'just some plain prose here' END,
         |    'another prose line') AS text
         |  FROM documents),
         |f AS (
         |  SELECT doc_id,
         |    list_filter(string_split(text, chr(10)),
         |      l -> length(trim(l)) > 0) AS ls
         |  FROM t),
         |s AS (
         |  SELECT doc_id,
         |    CASE WHEN len(ls) = 0 THEN NULL
         |         ELSE round(CAST(len(list_filter(ls, l -> $isCode)) AS DOUBLE)
         |                    / len(ls), 6) END AS code_line_frac
         |  FROM f)
         |SELECT doc_id, code_line_frac,
         |  coalesce(code_line_frac >= 0.3, FALSE) AS is_code
         |FROM s""".stripMargin
    },

    "text_normalize" -> {
      import graft.operators.text.UnicodeNormalizer.mojibakeTable
      def q(s: String) = s.replace("'", "''")
      // one CTE per repair step carrying (t = text so far, c = artifact
      // chars consumed so far) — the exact chained fold the operator runs
      val steps = mojibakeTable.zipWithIndex.map { case ((bad, good), i) =>
        s"""f${i + 1} AS (SELECT doc_id, orig,
           |  replace(t, '${q(bad)}', '${q(good)}') AS t,
           |  c + length(t) - length(replace(t, '${q(bad)}', '')) AS c
           |  FROM f$i)""".stripMargin
      }.mkString(",\n")
      val last = s"f${mojibakeTable.size}"
      s"""WITH t0 AS (
         |  SELECT doc_id,
         |    substr(text, 1, 30) || ' cafÃ© e' || chr(769) || 'clair' ||
         |    CASE WHEN doc_id % 2 = 1 THEN ' â€™dâ€™accordâ€¦' ELSE '' END AS orig
         |  FROM documents),
         |f0 AS (SELECT doc_id, orig, orig AS t, 0 AS c FROM t0),
         |$steps
         |SELECT doc_id, nfc_normalize(t) AS text,
         |  CAST(c AS INT) AS n_mojibake_chars,
         |  nfc_normalize(t) != orig AS was_changed
         |FROM $last""".stripMargin
    },

    "pii_credit_card" -> {
      // the 19-term closed-form Luhn sum over the reversed digit
      // string — the exact formula CreditCardRedactor.luhnValid builds
      val digits = "regexp_replace(x, '[^0-9]', '', 'g')"
      val terms = (1 to 19).map { i =>
        val dig = s"CASE WHEN length(reverse($digits)) >= $i " +
          s"THEN CAST(substr(reverse($digits), $i, 1) AS INT) ELSE 0 END"
        if (i % 2 == 0)
          s"(CASE WHEN 2 * ($dig) > 9 THEN 2 * ($dig) - 9 ELSE 2 * ($dig) END)"
        else s"($dig)"
      }.mkString(" + ")
      val luhn = s"(length($digits) BETWEEN 13 AND 19 AND ($terms) % 10 = 0)"
      val pat = """\b\d(?:[ -]?\d){12,18}\b"""
      s"""WITH t AS (
         |  SELECT doc_id,
         |    substr(text, 1, 40) ||
         |    CASE WHEN doc_id % 3 = 0 THEN ' card 4111 1111 1111 1111 thanks'
         |         WHEN doc_id % 3 = 1 THEN ' card 4111-1111-1111-1112 thanks'
         |         ELSE ' no card here' END AS text
         |  FROM documents),
         |v AS (
         |  SELECT doc_id, text,
         |    list_filter(regexp_extract_all(text, '$pat'), x -> $luhn) AS ok
         |  FROM t)
         |SELECT doc_id,
         |  list_reduce(list_prepend(text, ok),
         |    (a, b) -> replace(a, b, '<CC>')) AS redacted,
         |  CAST(len(ok) AS INT) AS n_cards
         |FROM v""".stripMargin
    },

    "pii_redact" -> {
      val e = PiiRedactor.emailPat
      val p = PiiRedactor.phonePat
      val n = PiiRedactor.ssnPat
      val i = PiiRedactor.ipPat
      s"""WITH t AS (
         |  SELECT doc_id,
         |    'user' || CAST(doc_id AS VARCHAR) || '@example.com ph 555-123-4567 ip 10.0.0.' ||
         |    CAST(doc_id % 256 AS VARCHAR) ||
         |    CASE WHEN doc_id % 3 = 0 THEN ' ssn 987-65-4321' ELSE '' END ||
         |    ' ' || substr(text, 1, 60) AS text
         |  FROM documents)
         |SELECT doc_id,
         |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
         |    '$e', '<EMAIL>', 'g'), '$p', '<PHONE>', 'g'),
         |    '$n', '<SSN>', 'g'), '$i', '<IP>', 'g') AS redacted,
         |  len(regexp_extract_all(text, '$e')) AS n_emails,
         |  len(regexp_extract_all(text, '$p')) AS n_phones,
         |  len(regexp_extract_all(text, '$n')) AS n_ssns,
         |  len(regexp_extract_all(text, '$i')) AS n_ips
         |FROM t""".stripMargin
    },

    "repetition_scores" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(string_split($normSql, ' ')) AS t FROM documents),
         |tok_stats AS (
         |  SELECT doc_id, sum(n) AS n_tokens, count(*) AS n_distinct
         |  FROM (SELECT doc_id, t, count(*) AS n FROM toks GROUP BY 1, 2)
         |  GROUP BY doc_id),
         |bigrams AS (
         |  SELECT doc_id, unnest(list_transform(range(1, len(ws)),
         |    i -> ws[CAST(i AS INT)] || ' ' || ws[CAST(i AS INT) + 1])) AS b
         |  FROM (SELECT doc_id, string_split($normSql, ' ') AS ws FROM documents)
         |  WHERE len(ws) >= 2),
         |bi_stats AS (
         |  SELECT doc_id, sum(n) AS n_bigrams, max(n) AS top_bigram_n
         |  FROM (SELECT doc_id, b, count(*) AS n FROM bigrams GROUP BY 1, 2)
         |  GROUP BY doc_id)
         |SELECT t.doc_id,
         |  round(CAST(n_tokens - n_distinct AS DOUBLE) / n_tokens, 6) AS dup_word_frac,
         |  round(coalesce(CAST(top_bigram_n AS DOUBLE) / n_bigrams, 0.0), 6) AS top_bigram_frac
         |FROM tok_stats t LEFT JOIN bi_stats b ON t.doc_id = b.doc_id""".stripMargin,

    "perplexity" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(string_split($normSql, ' ')) AS t FROM documents),
         |counts AS (SELECT t, count(*) AS n FROM toks GROUP BY t),
         |total AS (SELECT sum(n) AS total FROM counts),
         |lm AS (SELECT t, ln(CAST(n AS DOUBLE) / total) AS logp FROM counts, total)
         |SELECT toks.doc_id, round(exp(-avg(logp)), 4) AS perplexity
         |FROM toks JOIN lm ON toks.t = lm.t
         |GROUP BY toks.doc_id""".stripMargin,

    "perplexity_pruned" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(string_split($normSql, ' ')) AS t FROM documents),
         |counts AS (SELECT t, count(*) AS n FROM toks GROUP BY t),
         |total AS (SELECT sum(n) AS total FROM counts),
         |kept AS (
         |  SELECT t, n FROM (
         |    SELECT t, n, row_number() OVER (ORDER BY n DESC, t ASC) AS r
         |    FROM counts) WHERE r <= 12),
         |lm AS (SELECT t, ln(CAST(n AS DOUBLE) / total) AS logp FROM kept, total)
         |SELECT toks.doc_id,
         |  round(exp(-avg(coalesce(lm.logp,
         |    (SELECT ln(1.0 / total) FROM total)))), 4) AS perplexity
         |FROM toks LEFT JOIN lm ON toks.t = lm.t
         |GROUP BY toks.doc_id""".stripMargin,

    "perplexity_bigram" -> bigramPerplexitySql(0, 0),
    "perplexity_bigram_pruned" -> bigramPerplexitySql(12, 40),
    "doremi_weights" -> doremiSql(rounds = 4, batch = 200L,
      eta = 1.0, smoothing = 0.01),

    // Same exact count-join oracle as dedup_ngram_jaccard: the r=2
    // banding must reproduce the full ≥ τ pair set to pass, so the
    // recall claim is driver-gated, not prose.
    "dedup_jaccard_r2" ->
      s"""WITH sh AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |    range(1, greatest(len(string_split($normSql, ' ')) - 1, 1)),
         |    i -> string_split($normSql, ' ')[CAST(i AS INT)] || ' ' ||
         |         string_split($normSql, ' ')[CAST(i AS INT) + 1] || ' ' ||
         |         string_split($normSql, ' ')[CAST(i AS INT) + 2]))) AS sh
         |  FROM documents WHERE len(string_split($normSql, ' ')) >= 3),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
         |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b,
         |  round(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6) AS jaccard
         |FROM inter JOIN sizes sa ON inter.id_a = sa.doc_id
         |           JOIN sizes sb ON inter.id_b = sb.doc_id
         |WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.2""".stripMargin,

    // same exact count-join, over the dup-planted corpus — the
    // collapsed path must reproduce it byte for byte
    "dedup_jaccard_collapsed" ->
      s"""WITH corpus AS MATERIALIZED (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 3 = 0
         |  UNION ALL
         |  SELECT doc_id + 2000000 AS doc_id, text FROM documents WHERE doc_id % 6 = 0),
         |sh AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |    range(1, greatest(len(string_split($normSql, ' ')) - 1, 1)),
         |    i -> string_split($normSql, ' ')[CAST(i AS INT)] || ' ' ||
         |         string_split($normSql, ' ')[CAST(i AS INT) + 1] || ' ' ||
         |         string_split($normSql, ' ')[CAST(i AS INT) + 2]))) AS sh
         |  FROM corpus WHERE len(string_split($normSql, ' ')) >= 3),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
         |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b,
         |  round(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6) AS jaccard
         |FROM inter JOIN sizes sa ON inter.id_a = sa.doc_id
         |           JOIN sizes sb ON inter.id_b = sb.doc_id
         |WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.2""".stripMargin,

    "dedup_ngram_jaccard" ->
      s"""WITH sh AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |    range(1, greatest(len(string_split($normSql, ' ')) - 1, 1)),
         |    i -> string_split($normSql, ' ')[CAST(i AS INT)] || ' ' ||
         |         string_split($normSql, ' ')[CAST(i AS INT) + 1] || ' ' ||
         |         string_split($normSql, ' ')[CAST(i AS INT) + 2]))) AS sh
         |  FROM documents WHERE len(string_split($normSql, ' ')) >= 3),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
         |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b,
         |  round(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6) AS jaccard
         |FROM inter JOIN sizes sa ON inter.id_a = sa.doc_id
         |           JOIN sizes sb ON inter.id_b = sb.doc_id
         |WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.2""".stripMargin,

    "source_flagging" ->
      s"""WITH u AS (
         |  SELECT CASE WHEN doc_id % 77 = 0 THEN NULL ELSE source END AS source,
         |    text
         |  FROM documents
         |  UNION ALL
         |  SELECT 'farm' AS source,
         |    'breaking news ' || CAST(doc_id % 3 AS VARCHAR) AS text
         |  FROM documents WHERE doc_id % 4 = 0),
         |n AS (SELECT source, md5($normSql) AS h,
         |  CAST(length(text) AS DOUBLE) AS s FROM u),
         |g AS (SELECT source, h, count(*) AS c, sum(s) AS ss FROM n GROUP BY 1, 2),
         |agg AS (
         |  SELECT source, CAST(sum(c) AS BIGINT) AS n_docs,
         |    round(CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE) /
         |      sum(c), 6) AS dup_frac,
         |    round(sum(ss) / sum(c), 4) AS avg_score
         |  FROM g GROUP BY 1),
         |flags AS (
         |  SELECT source, n_docs, dup_frac, avg_score,
         |    (dup_frac > 0.2 OR avg_score < 50.0) AS flagged
         |  FROM agg)
         |SELECT f.source, f.n_docs, f.dup_frac, f.avg_score, f.flagged,
         |  CASE WHEN f.source IS NULL THEN f.n_docs
         |       WHEN f.flagged THEN 0 ELSE f.n_docs END AS n_survivors
         |FROM flags f""".stripMargin,

    "contamination_overlap" -> {
      val n = 5
      val sh5 = (0 until n).map(j => s"ws[CAST(i AS INT) + $j]").mkString(" || ' ' || ")
      s"""WITH w AS (SELECT doc_id, string_split($normSql, ' ') AS ws FROM documents),
         |sh0 AS (
         |  SELECT doc_id, unnest(list_transform(range(1, len(ws) - ${n - 2}),
         |    i -> $sh5)) AS sh
         |  FROM w WHERE len(ws) >= $n),
         |sh AS (SELECT DISTINCT doc_id, sh FROM sh0),
         |bsh AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 50 = 0),
         |cnt AS (
         |  SELECT s.doc_id, count(*) AS n_ngrams,
         |    sum(CASE WHEN b.sh IS NOT NULL THEN 1 ELSE 0 END) AS n_shared
         |  FROM sh s LEFT JOIN bsh b USING (sh) GROUP BY 1)
         |SELECT d.doc_id,
         |  CAST(coalesce(n_ngrams, 0) AS BIGINT) AS n_ngrams,
         |  CAST(coalesce(n_shared, 0) AS BIGINT) AS n_shared,
         |  round(coalesce(CAST(n_shared AS DOUBLE) / n_ngrams, 0.0), 6)
         |    AS overlap_frac
         |FROM documents d LEFT JOIN cnt USING (doc_id)""".stripMargin
    },

    "bm25_search" ->
      s"""WITH $bm25CteSql
         |SELECT query_id, doc_id, score, rnk FROM lex""".stripMargin,

    // identical ranking contract as bm25_search: the persisted-index
    // path must reproduce the from-scratch scores exactly
    "bm25_search_indexed" ->
      s"""WITH $bm25CteSql
         |SELECT query_id, doc_id, score, rnk FROM lex""".stripMargin,

    // and the refreshed (60% built + 40% rolled-forward) index too —
    // the merge must be indistinguishable from indexing the full corpus
    "bm25_search_refreshed" ->
      s"""WITH $bm25CteSql
         |SELECT query_id, doc_id, score, rnk FROM lex""".stripMargin,

    // and the compacted (segments folded back to one) index too
    "bm25_search_compacted" ->
      s"""WITH $bm25CteSql
         |SELECT query_id, doc_id, score, rnk FROM lex""".stripMargin,

    "search_eval_ndcg" ->
      s"""WITH $bm25CteSql,
         |qrels AS (
         |  SELECT qt.query_id, d.doc_id,
         |    CAST(least(count(*), 3) AS DOUBLE) AS rel
         |  FROM qt JOIN (
         |    SELECT doc_id, unnest(list_distinct(ws)) AS term FROM toks) d
         |  USING (term)
         |  GROUP BY 1, 2),
         |dcg AS (
         |  SELECT l.query_id,
         |    sum(coalesce(q.rel, 0.0) / log2(l.rnk + 1)) AS dcg
         |  FROM lex l LEFT JOIN qrels q
         |    ON l.query_id = q.query_id AND l.doc_id = q.doc_id
         |  GROUP BY 1),
         |ideal AS (
         |  SELECT query_id, rel,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY rel DESC, doc_id ASC) AS r
         |  FROM qrels WHERE rel > 0 QUALIFY r <= 5),
         |idcg AS (SELECT query_id, sum(rel / log2(r + 1)) AS idcg
         |  FROM ideal GROUP BY 1)
         |SELECT i.query_id, round(coalesce(d.dcg, 0.0) / i.idcg, 6) AS ndcg
         |FROM idcg i LEFT JOIN dcg d USING (query_id)""".stripMargin,

    "hybrid_search_rrf" -> {
      val cos = "round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), " +
        "CAST(c.embedding AS DOUBLE[])), 6)"
      s"""WITH $bm25CteSql,
         |sims AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS doc_id, $cos AS cos
         |  FROM embeddings q, embeddings c
         |  WHERE q.vec_id % 125 = 0 AND q.vec_id != c.vec_id),
         |sem AS (
         |  SELECT query_id, doc_id,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY cos DESC, doc_id ASC) AS INT) AS rnk
         |  FROM sims QUALIFY rnk <= 5),
         |fused AS (
         |  SELECT coalesce(l.query_id, s.query_id) AS query_id,
         |    coalesce(l.doc_id, s.doc_id) AS doc_id,
         |    round(coalesce(CAST(1.0 AS DOUBLE) / (60 + l.rnk), 0.0) +
         |      coalesce(CAST(1.0 AS DOUBLE) / (60 + s.rnk), 0.0), 6) AS rrf
         |  FROM lex l FULL OUTER JOIN sem s
         |    ON l.query_id = s.query_id AND l.doc_id = s.doc_id)
         |SELECT query_id, doc_id, rrf,
         |  CAST(row_number() OVER (PARTITION BY query_id
         |    ORDER BY rrf DESC, doc_id ASC) AS INT) AS rnk
         |FROM fused QUALIFY rnk <= 5""".stripMargin
    },

    "lang_consistency" -> {
      val plant = """CASE WHEN doc_id % 3 = 0 THEN 'der hund und die katze ist nicht ein zu mit von'
                    |       WHEN doc_id % 3 = 1 THEN 'the cat and the dog is that for with a'
                    |       ELSE 'el perro y la casa es de que un una' END""".stripMargin
      s"""WITH t AS (
         |  SELECT doc_id, substr(text, 1, 120) || chr(10) || $plant AS text
         |  FROM documents),
         |per AS (
         |  SELECT doc_id, ${langCaseSql("text")} AS lang_pred,
         |    list_filter(list_transform(string_split(text, chr(10)),
         |      l -> ${langCaseSql("l")}), x -> x != 'und') AS idl
         |  FROM t),
         |m AS (
         |  SELECT doc_id, lang_pred, len(idl) AS n_id,
         |    len(list_filter(idl, x -> x != lang_pred)) AS n_foreign
         |  FROM per)
         |SELECT doc_id, lang_pred,
         |  CAST(n_id AS INT) AS n_id_lines,
         |  CAST(n_foreign AS INT) AS n_foreign_lines,
         |  CASE WHEN n_id > 0
         |    THEN round(CAST(n_foreign AS DOUBLE) / n_id, 6) END AS foreign_line_frac,
         |  coalesce(CASE WHEN n_id > 0
         |    THEN round(CAST(n_foreign AS DOUBLE) / n_id, 6) > 0.3 END, FALSE)
         |    AS is_polyglot
         |FROM m""".stripMargin
    }
  )
}
