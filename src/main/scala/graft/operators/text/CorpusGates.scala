package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Source/domain-level quality gating (RefinedWeb §G.1 operates per
  * URL-domain; Dolma and C4 both drop whole domains): instead of
  * judging documents one by one, aggregate per SOURCE — exact-dup rate
  * and mean quality — and drop every document of a source that fails.
  * Catches content farms whose individual pages pass doc-level
  * filters.
  *
  * Scale shape: doc-level signals compute map-side on a narrow
  * (id, source, hash, score) projection; the per-source rollup is two
  * chained map-side-combinable aggregates ((source, hash) → source);
  * the verdict table is |sources| rows — broadcast back for the gate,
  * so the corpus never shuffles on anything wider than the narrow
  * projection. */
case class SourceQualityGate(
    maxDupFrac: Double = 0.5,
    minAvgScore: Double = 0.0,
    sourceCol: String = "source",
    textCol: String = "text",
    idCol: String = "doc_id") {

  /** Quality signal; override for Gopher/classifier scores. */
  def score: Column = length(col(textCol)).cast("double")

  /** Per-source report: (source, n_docs, dup_frac 6dp, avg_score 4dp,
    * flagged). `dup_frac` = share of the source's docs whose
    * normalized text hash appears ≥2 times WITHIN the source. */
  def stats(df: DataFrame): DataFrame = {
    val narrow = df.select(col(sourceCol),
      md5(graft.functions.TextFns.normalizeText(col(textCol))).as("__h"),
      score.as("__s"))
    narrow.groupBy(col(sourceCol), col("__h"))
      .agg(count(lit(1)).as("__c"), sum("__s").as("__ssum"))
      .groupBy(sourceCol)
      .agg(
        sum("__c").as("n_docs"),
        round(sum(when(col("__c") > 1, col("__c")).otherwise(0L)) /
          sum("__c"), 6).as("dup_frac"),
        round(sum("__ssum") / sum("__c"), 4).as("avg_score"))
      .withColumn("flagged",
        col("dup_frac") > maxDupFrac || col("avg_score") < minAvgScore)
  }

  /** Survivors: documents of unflagged sources. The verdict table's
    * cardinality is \|sources\| — usually tiny, but distinct domains
    * grow with crawl size (10^7–10^8 hosts at full-web scale), so a
    * blanket broadcast hint would be a scale bug. Instead ONE bounded
    * driver action (the verdict row count — the SemanticDedup
    * plan-shape precedent) decides: broadcast below the threshold
    * (the corpus never shuffles), shuffled semi-join above it.
    * Measured at 1M docs: blind hint 6.4 s (unsafe at web scale),
    * no hint 18.2 s (the skewed source shuffle), guarded broadcast
    * 12.0 s — the residual vs the blind hint is the serialized stats
    * job, the price of not broadcasting an unbounded table.
    * Rows with a NULL source carry no domain signature and ALL pass
    * through (the UrlDedup/PhashHammingDedup family convention: no
    * signature must never mean dropped) — they still show up in
    * [[stats]] as the null-source row for visibility. */
  def apply(df: DataFrame, broadcastThreshold: Long = 1000000L): DataFrame = {
    // eager checkpoint: the verdict table is |sources| rows but COSTS
    // two corpus-wide aggregates — without it the plan-shape count and
    // the semi-join would each recompute the full stats pass (measured
    // 3.1× at 1M docs: 37.6 → 12.0 s)
    val ok = stats(df).filter(!col("flagged")).select(sourceCol)
      .localCheckpoint(eager = true)
    val okSide = if (ok.count() <= broadcastThreshold) broadcast(ok) else ok
    val keyed = df.where(col(sourceCol).isNotNull)
      .join(okSide, Seq(sourceCol), "left_semi")
    keyed.unionByName(df.where(col(sourceCol).isNull))
  }
}

/** Polyglot/mixed-language detection: per-LINE language identification
  * and the disagreement rate against the document-level prediction —
  * multilingual crawls are full of pages whose boilerplate is one
  * language and body another, which poisons per-language corpora if
  * routed by a single doc-level code (CCNet splits by paragraph for
  * exactly this reason).
  *
  * Entirely MAP-ONLY: the per-line language is the same stopword-argmax
  * as [[LanguageId]] applied inside a `transform` over the split lines
  * — no explode, no shuffle, one pass. Lines with no stopword signal
  * ("und") are abstentions and don't count toward disagreement. */
case class PolyglotDetector(
    maxForeignFrac: Double = 0.3,
    textCol: String = "text",
    sep: String = "\n") {

  private val lid = LanguageId(textCol)

  /** Adds `lang_pred` (doc-level), `n_id_lines` (lines with an
    * identified language), `n_foreign_lines` (identified lines
    * disagreeing with the doc), `foreign_line_frac` (6 dp; null when
    * no line identifies), `is_polyglot`. */
  def apply(df: DataFrame): DataFrame = {
    val quoted = java.util.regex.Pattern.quote(sep)
    val langs = transform(split(col(textCol), quoted), l => lid.language(l))
    df.withColumn("lang_pred", lid.language(col(textCol)))
      .withColumn("__idl", filter(langs, x => x =!= "und"))
      .withColumn("n_id_lines", size(col("__idl")))
      .withColumn("n_foreign_lines",
        size(filter(col("__idl"), x => x =!= col("lang_pred"))))
      .withColumn("foreign_line_frac",
        when(col("n_id_lines") > 0,
          round(col("n_foreign_lines").cast("double") / col("n_id_lines"), 6)))
      .withColumn("is_polyglot",
        coalesce(col("foreign_line_frac") > maxForeignFrac, lit(false)))
      .drop("__idl")
  }
}
