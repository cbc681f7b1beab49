package graft.queries

import graft.Tables
import graft.functions.TextFns._
import graft.operators.text.{TextLengthFilter, UrlFilter}
import graft.pipeline._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end pipeline funnel + sketch/statistics queries. */
object PipelineQueries {

  private val blockedDomains = Seq("src1.example.com", "src3.example.com")

  private def urlCol = concat(lit("https://"), col("source"),
    lit(".example.com/"), col("doc_id"))
  private val urlSql = "'https://' || source || '.example.com/' || doc_id"

  /** The flagship curation pipeline as config: refine → filter →
    * filter → dedup. */
  def curationPipeline: Pipeline = Pipeline(Seq(
    RefineOp("add_url", df => df.withColumn("url", urlCol)),
    FilterOp("length_filter", df => TextLengthFilter(100, Some(2000)).predicate(df)),
    FilterOp("url_filter", _ => UrlFilter(blocklistDomains = blockedDomains,
      wordWeights = Map("zzzznope" -> 1.0)).predicate),
    DedupOp("exact_dedup", _ => contentHashMd5(col("text")), "doc_id")))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_funnel" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      curationPipeline.funnelCounts(docs)
    }),

    "events_exact_stats" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      ev.groupBy("event_type").agg(
        count(lit(1)).as("n"),
        countDistinct("user_id").as("n_users"),
        round(avg("value"), 4).as("avg_value"),
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.95)"), 4).as("p95"))
    }),

    // sketch-based variant: rows-only check (sketch internals are
    // engine-specific by design; HLL/KLL vs DuckDB's approximations)
    "events_approx_stats" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      ev.groupBy("event_type").agg(
        approx_count_distinct("user_id").as("approx_users"),
        round(expr("approx_percentile(value, 0.5, 10000)"), 4).as("approx_p50"))
    })
  )

  def oracles: Map[String, String] = Map(
    "pipeline_funnel" -> {
      val lenp = "length(text) BETWEEN 100 AND 2000"
      val domain = s"lower(regexp_extract($urlSql, '^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?([^/?#]+)', 1))"
      val keep = blockedDomains
        .map(d => s"($domain = '$d' OR $domain LIKE '%.$d')")
        .mkString("NOT (", " OR ", ")")
      val hash = "md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))"
      s"""SELECT 0 AS step_idx, 'input' AS step, count(*) AS n_rows FROM documents
         |UNION ALL SELECT 1, 'add_url', count(*) FROM documents
         |UNION ALL SELECT 2, 'length_filter', count(*) FROM documents WHERE $lenp
         |UNION ALL SELECT 3, 'url_filter', count(*) FROM documents WHERE $lenp AND $keep
         |UNION ALL SELECT 4, 'exact_dedup', count(DISTINCT $hash) FROM documents WHERE $lenp AND $keep""".stripMargin
    },

    "events_exact_stats" ->
      """SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users,
        |  round(avg(value), 4) AS avg_value,
        |  round(quantile_cont(value, 0.5), 4) AS p50,
        |  round(quantile_cont(value, 0.95), 4) AS p95
        |FROM events GROUP BY event_type""".stripMargin
  )
}
