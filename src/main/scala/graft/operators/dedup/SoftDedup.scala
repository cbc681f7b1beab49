package graft.operators.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Duplication-aware REWEIGHTING — soft deduplication (He et al. 2024,
  * ACL, "SoftDedup: an Efficient Data Reweighting Method for Speeding
  * Up Language Model Pre-training"): instead of hard-dropping near
  * duplicates (B1–B5), keep every document and DOWN-WEIGHT its
  * sampling probability by how common its content is. Hard dedup
  * throws away the information that a passage was written ten
  * thousand times — which is itself a signal of importance — and is
  * all-or-nothing at the threshold; soft dedup trains on everything
  * but spends epochs ∝ novelty.
  *
  * Commonness here is the corpus-frequency view of Lee et al. 2022's
  * duplicated-span signal (the [[graft.operators.text.SpanDupStats]]
  * family): for each document, the mean document frequency of its
  * DISTINCT word n-grams,
  *
  *   commonness(d) = avg_{g ∈ distinct ngrams(d)} df(g)        (≥ 1)
  *   weight(d)     = commonness(d)^(−alpha)                    (≤ 1)
  *
  * so a document whose every n-gram is unique keeps weight 1.0, a
  * verbatim k-plicate converges to weight k^(−alpha) (its n-grams'
  * df is k), and partially-boilerplate pages land in between —
  * exactly the paper's "commonness" monotonicity. `alpha` trades
  * dedup strength against coverage (alpha = 1 makes a k-plicate
  * family's TOTAL weight ≈ 1 — the hard-dedup-equivalent mass).
  * Documents with fewer than `n` tokens carry no n-grams; their
  * commonness is the 1.0 floor (nothing to be duplicated).
  *
  * Scale shape: one explode → per-doc distinct (map-side combined) →
  * one groupBy(ngram) df count → equi-join back on the ngram →
  * one per-doc avg. Bounded by the distinct-ngram stream — never
  * pairwise, no windows, the wide payload never shuffles (weights
  * come back as a narrow (id, weight) table).
  *
  * [[sample]] draws a training subset without replacement with
  * probability ∝ weight via deterministic Gumbel-top-k on salted-md5
  * uniforms (the [[graft.operators.text.DsirSelector]] resampling
  * discipline — rerun-stable on any cluster layout, replayable by a
  * SQL oracle; the global top-k is a TakeOrdered, never a full
  * sort). */
case class SoftDedup(
    n: Int = 3,
    alpha: Double = 1.0,
    seed: String = "graft",
    idCol: String = "doc_id",
    textCol: String = "text") {
  require(n >= 1 && alpha >= 0.0, "n >= 1 and alpha >= 0 required")

  import graft.functions.TextFns.wordShingles

  /** (idCol, commonness 6dp, weight 6dp) — one row per input doc.
    *
    * The shingle stream `sh` feeds both the df count and the join-back
    * and is DELIBERATELY NOT materialized between them — the
    * [[graft.operators.text.DsirSelector.scored]] finding holds here
    * too, re-measured on this operator: localCheckpointing the
    * ~10⁸-row (id, shingle) stream at 1M docs cost 205.4 s vs 62.2 s
    * for tokenizing twice (SURVEY §5.18 row) — the codegen'd re-shingle
    * pass is 3× cheaper than writing + re-reading the wide string
    * intermediate. */
  def weights(df: DataFrame): DataFrame = {
    val sh = df.select(col(idCol),
      explode(array_distinct(wordShingles(col(textCol), n))).as("__g"))
    val dfT = sh.groupBy("__g").agg(count(lit(1)).as("__df"))
    val com = sh.join(dfT, Seq("__g"))
      .groupBy(idCol)
      .agg(round(avg(col("__df")), 6).as("commonness"))
    df.select(col(idCol)).join(com, Seq(idCol), "left")
      .withColumn("commonness", coalesce(col("commonness"), lit(1.0)))
      // floored at 1e-6 (one rounding ulp): an extreme duplicate whose
      // k^(−α) rounds to 0.000000 must stay a POSITIVE weight — log(0)
      // is null in Spark (breaking the P ∝ weight draw) and an
      // out-of-range ln() in the SQL oracle
      .withColumn("weight",
        greatest(round(pow(col("commonness"), -alpha), 6), lit(1e-6)))
  }

  /** Deterministic Gumbel noise (24-bit salted-md5 uniform, never
    * exactly 0 or 1), 6 dp. */
  private def gumbel: Column =
    round(-log(-log((conv(substring(md5(concat(col(idCol).cast("string"),
      lit(":" + seed + ":soft"))), 1, 6), 16, 10).cast("double") + 0.5) /
      16777216.0)), 6)

  /** k ids drawn without replacement with P ∝ weight (Gumbel-top-k on
    * ln weight): (idCol, commonness, weight, rnk). */
  def sample(df: DataFrame, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__adj").desc, col(idCol).asc)
    weights(df)
      .withColumn("__adj", round(log(col("weight")) + gumbel, 6))
      .orderBy(col("__adj").desc, col(idCol).asc).limit(k)
      .withColumn("rnk", row_number().over(w))
      .select(col(idCol), col("commonness"), col("weight"), col("rnk"))
  }
}
