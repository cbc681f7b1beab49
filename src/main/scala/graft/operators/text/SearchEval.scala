package graft.operators.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval-quality evaluation — nDCG@k of a ranked result list
  * against graded relevance judgments, closing the evaluation-harness
  * triad next to [[graft.operators.dedup.DedupEval]] (P/R of a dedup
  * recipe) and `AnnEval.recallAtK` (ANN vs exact): the tuning loop for
  * [[Bm25]]'s k1/b and the [[RrfFusion]] constant.
  *
  *   nDCG@k(q) = Σ_{r≤k} rel(q, d_r)/log2(r+1)  /  IDCG@k(q)
  *
  * Everything is bounded by the EVAL SET, never the corpus: results
  * are top-k per query (k·|queries| rows), qrels are the judgment
  * table (the thing a human-labeled eval ships), and both the DCG join
  * and the ideal-ranking window run on those. Queries with judgments
  * but no results score 0; unjudged result docs contribute rel 0 (the
  * trec_eval convention). */
object SearchEval {

  /** (queryCol, ndcg) per judged query, 6 dp. `results` carries
    * (queryCol, docCol, rankCol); `qrels` carries (queryCol, docCol,
    * relCol ≥ 0) with ONE row per judged pair (the qrels-file
    * contract; a duplicate judgment would double its DCG term through
    * the join). */
  def ndcgAtK(results: DataFrame, qrels: DataFrame, k: Int,
      queryCol: String = "query_id", docCol: String = "doc_id",
      rankCol: String = "rnk", relCol: String = "rel"): DataFrame = {
    val dcg = results.filter(col(rankCol) <= k)
      .join(qrels, Seq(queryCol, docCol), "left_outer")
      .groupBy(queryCol)
      .agg(sum(coalesce(col(relCol), lit(0.0)) /
        log2(col(rankCol) + 1)).as("__dcg"))
    val w = Window.partitionBy(queryCol)
      .orderBy(col(relCol).desc, col(docCol).asc)
    val idcg = qrels.filter(col(relCol) > 0)
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= k)
      .groupBy(queryCol)
      .agg(sum(col(relCol) / log2(col("__r") + 1)).as("__idcg"))
    idcg.join(dcg, Seq(queryCol), "left_outer")
      .select(col(queryCol),
        round(coalesce(col("__dcg"), lit(0.0)) / col("__idcg"), 6).as("ndcg"))
  }
}
