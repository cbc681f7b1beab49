package graft

import graft.operators.dedup.ExactDedup
import graft.operators.text.{LanguageId, QualityScorer, TextLengthFilter}
import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory each
  * entry maps to. */
object SparkEntry {

  /** Flagship: the YAML-config-driven curation pipeline on the documents
    * table — quality scoring → language id → length filter → exact
    * dedup, exactly the reference's staged-config shape. Driver
    * smoke-checks rows > 0 on sf0.001. */
  def entry(spark: SparkSession): DataFrame = {
    val yaml =
      """stages:
        |  - name: curation
        |    operators:
        |      - name: quality_scorer
        |      - name: language_id
        |      - name: text_length_filter
        |        params: {min_length: 20}
        |      - name: text_exact_deduplicator
        |""".stripMargin
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    graft.pipeline.PipelineConfig.parse(yaml)(docs)
      .select("doc_id", "lang", "lang_pred", "q_score", "q_n_words")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    TextQueries.queries ++ AnalyticsQueries.queries ++
      DedupQueries.queries ++ VectorQueries.queries ++ ImageQueries.queries ++
      PipelineQueries.queries ++ JoinQueries.queries ++ TpchQueries.queries ++
      CurationQueries.queries ++ MultimodalQueries.queries ++
      RecrawlQueries.queries ++ WriterQueries.queries ++
      StreamingQueries.queries ++ CliQueries.queries

  /** DuckDB-runnable oracle SQL per query key (same column names). */
  def oracleSql: Map[String, String] =
    TextQueries.oracles ++ AnalyticsQueries.oracles ++
      DedupQueries.oracles ++ VectorQueries.oracles ++ ImageQueries.oracles ++
      PipelineQueries.oracles ++ JoinQueries.oracles ++ TpchQueries.oracles ++
      CurationQueries.oracles ++ MultimodalQueries.oracles ++
      RecrawlQueries.oracles ++ WriterQueries.oracles ++
      StreamingQueries.oracles ++ CliQueries.oracles
}
