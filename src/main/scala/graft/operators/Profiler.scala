package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Table profiling (data-quality summary): one output row per column
  * with row/null/distinct counts and numeric min/max.
  *
  * Single scan: all per-column aggregates run in ONE `agg` (Catalyst
  * expands multi-distinct into one Expand + aggregate — still a single
  * pass over the data), then the wide row unpivots with `stack`. Exact
  * distinct counts keep the result engine-portable; swap in
  * `approx_count_distinct` at 100 TB when ±2% is acceptable. */
case class TableProfiler(round6: Boolean = true) {

  def profile(df: DataFrame): DataFrame = {
    val fields = df.schema.fields
    val aggs = fields.flatMap { f =>
      val c = col(f.name)
      val (mn, mx) = f.dataType match {
        case _: NumericType =>
          (round(min(c).cast("double"), 6), round(max(c).cast("double"), 6))
        case _ => (lit(null).cast("double"), lit(null).cast("double"))
      }
      Seq(sum(when(c.isNull, 1L).otherwise(0L)).as(s"__nn_${f.name}"),
        count_distinct(c).as(s"__nd_${f.name}"),
        mn.as(s"__mn_${f.name}"), mx.as(s"__mx_${f.name}"))
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs.toIndexedSeq: _*)
    val stackArgs = fields.map(f =>
      s"'${f.name}', __nn_${f.name}, __nd_${f.name}, __mn_${f.name}, __mx_${f.name}"
    ).mkString(", ")
    wide.selectExpr("__n AS n_rows",
      s"stack(${fields.length}, $stackArgs) AS (col_name, n_nulls, n_distinct, min_val, max_val)")
      .select("col_name", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val")
  }
}

/** Corpus datacard: the per-source "datasheet for datasets" summary a
  * curation run publishes next to its output (counts, token volume,
  * blank rate, language spread) — Gebru et al. 2021's transparency
  * artifact, computed as ONE rollup aggregate pass: every metric is an
  * algebraic aggregate with map-side combine, `ROLLUP(source)` adds
  * the corpus-total row in the same shuffle, and the output is
  * |sources|+1 rows — trivially collectable at any corpus size. */
case class CorpusDatacard(
    sourceCol: String = "source",
    textCol: String = "text",
    langCol: String = "lang") {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.functions._

  def apply(df: DataFrame): DataFrame = {
    val toks = graft.functions.TextFns.wsTokenCount(col(textCol)).cast("long")
    df.select(col(sourceCol), col(langCol), col(textCol))
      .rollup(sourceCol)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(toks).as("n_tokens"),
        round(avg(toks), 4).as("avg_tokens"),
        round(avg(length(col(textCol))), 4).as("avg_chars"),
        round(avg(when(length(trim(col(textCol))) === 0, 1.0).otherwise(0.0)), 6)
          .as("blank_frac"),
        countDistinct(col(langCol)).as("n_langs"),
        // grouping() distinguishes the ROLLUP total row from a data row
        // whose source is genuinely NULL — coalesce alone would label
        // both 'ALL' and make them indistinguishable
        grouping(col(sourceCol)).as("__total"))
      .withColumn(sourceCol, when(col("__total") === 1, lit("ALL"))
        .otherwise(coalesce(col(sourceCol), lit("UNKNOWN"))))
      .drop("__total")
  }
}

/** Tokenizer fertility report: corpus-level characters-per-token by
  * language, for both the whitespace and the BPE-ish tokenizer — the
  * standard check that a tokenizer serves every language in the mix
  * (high fertility = a language pays more tokens per character of
  * content, inflating its training cost and shrinking its effective
  * context; multilingual tokenizer papers report exactly this table).
  * ONE map-side-combinable aggregate over a narrow projection;
  * corpus-level ratios (Σ chars / Σ tokens), not averages of per-doc
  * ratios, so short docs don't dominate. */
case class TokenizerFertility(langCol: String = "lang",
    textCol: String = "text") {
  import graft.functions.TextFns.{bpeTokenCount, wsTokenCount}

  def apply(df: DataFrame): DataFrame =
    df.select(col(langCol),
      length(col(textCol)).cast("long").as("__chars"),
      wsTokenCount(col(textCol)).cast("long").as("__ws"),
      bpeTokenCount(col(textCol)).cast("long").as("__bpe"))
      .groupBy(langCol)
      .agg(
        count(lit(1)).as("n_docs"),
        sum("__chars").as("n_chars"),
        sum("__ws").as("n_ws_tokens"),
        sum("__bpe").as("n_bpe_tokens"),
        round(sum("__chars") / sum("__ws"), 4).as("chars_per_ws_token"),
        round(sum("__chars") / sum("__bpe"), 4).as("chars_per_bpe_token"))
}

/** Vocabulary-coverage curve — the table that sizes a tokenizer's
  * vocabulary BEFORE training one (the BPE trainer's planning twin;
  * Zipf's law makes the curve steep then brutally flat, and this
  * measures where): for each candidate vocab size K, the fraction of
  * corpus token OCCURRENCES covered by the K most frequent types, and
  * the complementary OOV rate. Coverage is computed over the histogram
  * OF FREQUENCIES — tokens sharing a count are interchangeable for
  * coverage, so no per-token ranking (and no tiebreak!) is ever
  * needed: fully-included count-groups contribute their whole mass,
  * the one boundary group contributes (K − tokens-above) × its count.
  *
  * Scale shape: one map-side-combined groupBy(token) to the frequency
  * table (vocabulary-bounded), one groupBy(count) to its histogram
  * (bounded by DISTINCT counts — far smaller), two bounded-window
  * [[graft.operators.events.HistCdf]] passes (token CDF + mass CDF),
  * then a bounded explode over the candidate sizes. The corpus payload
  * never shuffles; everything after the first groupBy is
  * histogram-sized. */
case class VocabCoverage(vocabSizes: Seq[Long] = Seq(100L, 1000L, 10000L),
    textCol: String = "text") {
  require(vocabSizes.nonEmpty && vocabSizes.forall(_ > 0),
    "vocabSizes must be positive")
  import graft.functions.TextFns.{normalizeText, wsTokens}
  import graft.operators.events.HistCdf

  def apply(df: DataFrame): DataFrame = {
    val counts = df.filter(length(trim(col(textCol))) > 0)
      .select(explode(wsTokens(normalizeText(col(textCol)))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("__c"))
    // materialize the (tiny — one row per distinct frequency) histogram
    // ONCE: it feeds BOTH HistCdf passes below, and without the pin the
    // corpus-wide tokenize + groupBy(token) would execute twice per
    // invocation (the CcnetBucketer/PrototypePruner materialize-once
    // discipline; r15 ADVICE)
    val hist = counts.groupBy("__c").agg(count(lit(1)).as("__ntoks"))
      .withColumn("__mass", col("__ntoks") * col("__c"))
      // CDF descends by frequency (commonest types first): HistCdf
      // orders ascending, so feed it the negated count
      .withColumn("__v", -col("__c"))
      .localCheckpoint()
    val cumT = HistCdf.withCdf(hist, Nil, "__v", "__ntoks")
      .withColumnRenamed("__cum", "__cumT").drop("__n")
    val cumM = HistCdf.withCdf(hist.select("__c", "__v", "__mass"),
        Nil, "__v", "__mass")
      .withColumnRenamed("__cum", "__cumM").withColumnRenamed("__n", "__totM")
      .select("__c", "__cumM", "__totM")
    val k = col("vocab_size")
    cumT.join(cumM, Seq("__c"))
      .withColumn("vocab_size",
        explode(array(vocabSizes.map(lit(_)): _*)))
      .groupBy("vocab_size").agg(
        (coalesce(sum(when(col("__cumT") <= k, col("__mass"))), lit(0L)) +
          coalesce(max(when(col("__cumT") - col("__ntoks") < k && k < col("__cumT"),
            (k - (col("__cumT") - col("__ntoks"))) * col("__c"))), lit(0L)))
          .cast("long").as("covered_occurrences"),
        max("__totM").cast("long").as("total_occurrences"))
      .withColumn("coverage",
        round(col("covered_occurrences").cast("double") /
          col("total_occurrences"), 6))
      .withColumn("oov_rate",
        round((col("total_occurrences") - col("covered_occurrences"))
          .cast("double") / col("total_occurrences"), 6))
  }
}

/** Corpus drift detection: Population Stability Index per feature
  * between two corpus snapshots — the data-quality regression test a
  * continuously-rebuilt training corpus runs between releases (did the
  * crawl's language mix shift? did a filter change shorten documents?).
  * PSI = Σ_buckets (p_a − p_b)·ln(p_a/p_b); the industry reading is
  * < 0.1 stable, 0.1–0.25 moderate, > 0.25 shifted.
  *
  * Scale shape: per feature, ONE map-side-combinable bucket count per
  * snapshot over a narrow projection; the PSI math runs on the joined
  * bucket tables (cardinality = distinct buckets, never corpus rows)
  * and collapses with a global sum. Zero-count buckets smooth to `eps`
  * so a vanished bucket contributes a large-but-finite term, exactly
  * like the scorecard-monitoring formulation. */
case class CorpusDrift(threshold: Double = 0.2, eps: Double = 1e-6) {
  import org.apache.spark.sql.Column

  /** One row: (feature, psi 6dp, drifted). `bucket` maps a row to its
    * histogram bucket (a categorical column, or a binned numeric).
    * NULL buckets coalesce to a sentinel so the null population is ONE
    * bucket matched across both snapshots — bare nulls never meet in
    * an equi-join, which would split one population into two
    * eps-smoothed phantom buckets and overstate drift. */
  def psi(a: DataFrame, b: DataFrame, bucket: Column,
      feature: String): DataFrame = {
    def shares(df: DataFrame, out: String) =
      df.select(coalesce(bucket.cast("string"), lit("__null__")).as("__b"))
        .groupBy("__b").agg(count(lit(1)).as("__c"))
        .select(col("__b"),
          (col("__c") / sum("__c").over(
            org.apache.spark.sql.expressions.Window
              .rowsBetween(Long.MinValue, Long.MaxValue))).as(out))
    shares(a, "__pa").join(shares(b, "__pb"), Seq("__b"), "full_outer")
      .select((greatest(coalesce(col("__pa"), lit(0.0)), lit(eps))).as("pa"),
        (greatest(coalesce(col("__pb"), lit(0.0)), lit(eps))).as("pb"))
      .agg(round(sum((col("pa") - col("pb")) * log(col("pa") / col("pb"))), 6)
        .as("psi"))
      .select(lit(feature).as("feature"), col("psi"),
        (col("psi") > threshold).as("drifted"))
  }

  /** The standard document-corpus report: language mix, source mix,
    * and length-decade buckets. */
  def report(a: DataFrame, b: DataFrame): DataFrame = {
    val lenBucket = floor(length(col("text")) / 100)
    psi(a, b, col("lang"), "lang")
      .unionByName(psi(a, b, col("source"), "source"))
      .unionByName(psi(a, b, lenBucket, "length_x100"))
  }
}

/** Corpus-overlap estimation from bottom-k (KMV / k-minimum-values)
  * sketches — the 100 TB answer to "how much of crawl N+1 is already
  * in crawl N" WITHOUT the corpus-scale content join the exact
  * `overlapStats` pays. Each corpus reduces to its k smallest distinct
  * content-hash values (a TakeOrdered: k bounded driver rows, one
  * narrow pass over each corpus, no cross-corpus shuffle at all); the
  * bottom-k of the UNION is computable from the two sketches alone
  * (min-merge property), and the classic KMV estimate
  *
  *   Ĵ = |{h ∈ bottomK(A ∪ B)} ∩ sketch(A) ∩ sketch(B)| / k
  *
  * is a DETERMINISTIC function of the corpora — the estimator is
  * approximate with respect to true Jaccard (±1/√k), but its VALUE is
  * exactly replayable, so the oracle gates it exactly (the same
  * discipline as `events_approx_bounds`). Containment estimates for
  * each side come from the same three sets. */
case class CorpusOverlapSketch(k: Int = 256,
    idCol: String = "doc_id", textCol: String = "text") {
  require(k > 0, "sketch size k must be positive")

  // md5-prefix hash (not xxhash64): the oracle replays the exact
  // estimator value, and DuckDB can rebuild this hash bit for bit
  private def hash(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** The k smallest distinct content hashes of a corpus — one narrow
    * distinct + TakeOrdered; never wider than (hash) and never more
    * than k driver rows. Null texts carry no content hash and are
    * excluded (they would also sort engine-dependently: Spark puts
    * nulls first ascending, DuckDB last). */
  def sketch(df: DataFrame): DataFrame =
    df.filter(col(textCol).isNotNull)
      .select(hash(col(textCol)).as("h")).distinct()
      .orderBy(col("h").asc).limit(k)

  /** One row: (k, n_a, n_b — the sketch sizes actually used —
    * jaccard_est, containment_a, containment_b), all 6 dp. Exact on
    * corpora with ≤ k distinct documents (the sketch IS the hash set);
    * ±1/√k beyond. */
  def estimate(a: DataFrame, b: DataFrame): DataFrame = {
    val sa = sketch(a).withColumn("__ina", lit(true))
    val sb = sketch(b).withColumn("__inb", lit(true))
    val merged = sa.join(sb, Seq("h"), "full_outer")
      .orderBy(col("h").asc).limit(k)
    merged.agg(
      lit(k).as("k"),
      sum(when(col("__ina"), 1L).otherwise(0L)).as("n_a"),
      sum(when(col("__inb"), 1L).otherwise(0L)).as("n_b"),
      round(sum(when(col("__ina") && col("__inb"), 1L).otherwise(0L)) /
        count(lit(1)).cast("double"), 6).as("jaccard_est"),
      round(sum(when(col("__ina") && col("__inb"), 1L).otherwise(0L)) /
        sum(when(col("__ina"), 1L).otherwise(0L)).cast("double"), 6)
        .as("containment_a"),
      round(sum(when(col("__ina") && col("__inb"), 1L).otherwise(0L)) /
        sum(when(col("__inb"), 1L).otherwise(0L)).cast("double"), 6)
        .as("containment_b"))
  }
}

/** Corpus snapshot diff — the changelog between two versions of a
  * corpus (yesterday's crawl vs today's): per-id status
  * added / removed / changed / unchanged by content hash. One
  * full-outer join on the id over NARROW (id, hash) projections — the
  * payloads never shuffle; at 100 TB this is the id-keyed merge any
  * incremental pipeline already pays, and the status breakdown feeds
  * the ingest decision (re-process only added+changed). */
case class CorpusDiff(idCol: String = "doc_id", textCol: String = "text") {

  /** (idCol, status) for every id present in either snapshot.
    * Presence travels as its own flag — a null TEXT also hashes to
    * null, and reading hash-null as "absent" would mislabel a row
    * whose text is null in both snapshots as added/removed; the
    * null-safe hash comparison then treats two null texts as
    * unchanged. */
  /** Snapshots are keyed tables: ids must be unique per snapshot (a
    * duplicate id would fan the full-outer join out multiplicatively,
    * as in any keyed merge). */
  def diff(old: DataFrame, neu: DataFrame): DataFrame = {
    val o = old.select(col(idCol), md5(col(textCol)).as("__ho"),
      lit(true).as("__po"))
    val n = neu.select(col(idCol), md5(col(textCol)).as("__hn"),
      lit(true).as("__pn"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__po").isNull, "added")
          .when(col("__pn").isNull, "removed")
          .when(col("__ho") <=> col("__hn"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Bounded rollup: one row per status. */
  def summary(old: DataFrame, neu: DataFrame): DataFrame =
    diff(old, neu).groupBy("status").agg(count(lit(1)).as("n"))
}
