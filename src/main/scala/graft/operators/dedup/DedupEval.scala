package graft.operators.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dedup-recipe evaluation harness: precision/recall of a candidate-
  * pair generator against planted ground truth — how a pipeline tunes
  * its banding (bands/rows trade recall against candidate volume on
  * the S-curve) before burning a 100 TB pass. Plant twins with a known
  * transformation, run the generator, score it.
  *
  * Scale shape: both pair sets normalize to (lo, hi) keys and meet in
  * ONE full-outer hash equi-join (cardinality = |candidates ∪ truth|,
  * never corpus²), then a single global aggregate emits the
  * confusion counts and P/R — no driver-side set arithmetic. */
object DedupEval {

  /** One row: (n_candidates, n_truth, n_hits, precision, recall).
    * Inputs are pair tables (idA, idB); orientation is normalized, so
    * either ordering is accepted. Empty inputs yield 0 counts and 0.0
    * metrics (never null): an over-tight banding config that produces
    * zero candidate pairs is exactly the case a tuning sweep reads this
    * row for, and a null precision would NPE the sweep's getDouble. */
  def prf(candidates: DataFrame, truth: DataFrame,
      idA: String = "id_a", idB: String = "id_b"): DataFrame = {
    def canon(df: DataFrame, flag: String) =
      df.select(least(col(idA), col(idB)).as("lo"),
        greatest(col(idA), col(idB)).as("hi"))
        .distinct()
        .withColumn(flag, lit(1L))
    canon(candidates, "__c").join(canon(truth, "__t"),
        Seq("lo", "hi"), "full_outer")
      .agg(
        // outer coalesce: a fully-empty join (both inputs empty)
        // aggregates zero rows and sum() itself returns null
        coalesce(sum(coalesce(col("__c"), lit(0L))), lit(0L)).as("n_candidates"),
        coalesce(sum(coalesce(col("__t"), lit(0L))), lit(0L)).as("n_truth"),
        coalesce(sum(when(col("__c") === 1L && col("__t") === 1L, 1L)
          .otherwise(0L)), lit(0L)).as("n_hits"))
      .select(col("n_candidates"), col("n_truth"), col("n_hits"),
        // explicit zero-denominator guard (not try_divide-then-coalesce):
        // ANSI mode — the default — makes a bare 0/0 throw, not null
        when(col("n_candidates") > 0,
          round(col("n_hits") / col("n_candidates"), 6)).otherwise(0.0)
          .as("precision"),
        when(col("n_truth") > 0,
          round(col("n_hits") / col("n_truth"), 6)).otherwise(0.0)
          .as("recall"))
  }
}
