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
    * either ordering is accepted. */
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
        sum(coalesce(col("__c"), lit(0L))).as("n_candidates"),
        sum(coalesce(col("__t"), lit(0L))).as("n_truth"),
        sum(when(col("__c") === 1L && col("__t") === 1L, 1L).otherwise(0L))
          .as("n_hits"))
      .select(col("n_candidates"), col("n_truth"), col("n_hits"),
        round(col("n_hits") / col("n_candidates"), 6).as("precision"),
        round(col("n_hits") / col("n_truth"), 6).as("recall"))
  }
}
