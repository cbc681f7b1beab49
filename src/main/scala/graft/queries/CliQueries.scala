package graft.queries

import graft.Tables
import graft.sources.ShardedLoader
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle keys for the CONFIG-DRIVEN JOB surface (SURVEY §2 C23) and
  * the SHARDED LOADER (A18) — the last spec-only rows that CAN be
  * oracle-gated (A13/A17/A18's egress-blocked seams stay documented
  * stand-ins). Both keys run the real end-to-end machinery inside the
  * query function against a fresh temp dir and return a deterministic
  * per-lang aggregate the DuckDB oracle replays from the source table
  * alone.
  *
  * Reference: framework/executor.py (config-driven staged jobs) and
  * loaders/huggingface_loader.py (sharded streaming ingest with
  * checkpoint/resume; graft's local twin is ShardedLoader). */
object CliQueries {

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def langAgg(df: DataFrame): DataFrame =
    df.groupBy("lang").agg(
      count(lit(1)).as("n"),
      sum("doc_id").as("sum_id"),
      sum(length(col("text"))).as("sum_len"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // C23 — the YAML job path END TO END: documents exported to jsonl,
    // then ONE parsed job does loader (JsonlLoader) → staged operators
    // (length filter → exact dedup keep-first) → writer (ParquetData-
    // Writer, lang-partitioned), and the key aggregates the WRITTEN
    // artifact read back under the job's own output schema. Any parse
    // drift, loader mangling, wrong keep rule, or partition miswrite
    // shifts a sum and fails the hash compare.
    "yaml_job_roundtrip" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      if (docs.isEmpty) langAgg(docs.limit(0)) // nothing to export/load
      else {
        val tmp = tmpDir("graft_yaml_job")
        docs.coalesce(1).write.mode("overwrite").json(s"$tmp/src")
        val yaml =
          s"""data_loader:
             |  type: JsonlLoader
             |  params: {path: "$tmp/src"}
             |stages:
             |  - name: curate
             |    operators:
             |      - name: text_length_filter
             |        params: {min_length: 100, max_length: 2000}
             |      - name: text_exact_deduplicator
             |data_writer:
             |  type: ParquetDataWriter
             |  params:
             |    path: "$tmp/out"
             |    partition_by: [lang]
             |""".stripMargin
        val out = graft.pipeline.PipelineConfig.parseJob(yaml).run(s)
        // read back under the job's own output schema — a fully
        // filtered corpus leaves a partitioned dir with no footers
        langAgg(s.read.option("basePath", s"$tmp/out")
          .schema(out.schema).parquet(s"$tmp/out"))
      }
    }),

    // A20 — the metrics PERSISTENCE surface (the last spec-only
    // side-effect seam): the exact CLI `run --metrics-path` path runs
    // a small YAML job inside the key (fresh temp dirs per invocation,
    // so bench re-runs never double-append), then the key reads the
    // runs/ + stages/ parquet BACK and returns the dashboard rows —
    // per-stage funnel plus one __run__ roll-up. The oracle replays
    // every persisted number (stage in/out counts, pass rates, the
    // run-level totals) from the stage formulas. The HTML report's
    // existence is spec-gated (MetricsSpec); its bytes are
    // presentation, not data.
    "metrics_sink_funnel" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      def empty = s.range(0).select(
        col("id").cast("int").as("stage_idx"), lit("").as("stage_name"),
        col("id").as("input_records"), col("id").as("output_records"),
        lit(0.0).as("pass_rate"))
      if (docs.isEmpty) empty
      else {
        val tmp = tmpDir("graft_metrics_job")
        docs.coalesce(1).write.mode("overwrite").json(s"$tmp/src")
        val yaml =
          s"""data_loader:
             |  type: JsonlLoader
             |  params: {path: "$tmp/src"}
             |stages:
             |  - name: curate
             |    operators:
             |      - name: text_length_filter
             |        params: {min_length: 100, max_length: 2000}
             |      - name: text_exact_deduplicator
             |data_writer:
             |  type: ParquetDataWriter
             |  params: {path: "$tmp/out"}
             |""".stripMargin
        graft.Main.runJob(s, yaml, profile = false, report = false,
          metricsPath = Some(s"$tmp/metrics"))
        val stages = s.read.parquet(s"$tmp/metrics/stages")
          .select(col("stage_idx"), col("stage_name"),
            col("input_records"), col("output_records"),
            round(col("pass_rate"), 6).as("pass_rate"))
        val run = s.read.parquet(s"$tmp/metrics/runs")
          .select(lit(-1).as("stage_idx"), lit("__run__").as("stage_name"),
            col("total_input_records").as("input_records"),
            col("total_output_records").as("output_records"),
            round(col("overall_pass_rate"), 6).as("pass_rate"))
        stages.unionByName(run)
      }
    }),

    // A18 — sharded checkpoint/resume ingest: 3 id-ranged multi-file
    // parquet shards, a budget-cut first run (simulated mid-job kill
    // after 2 committed chunks), a resuming second run, then `loaded`
    // reads exactly the committed chunk partitions. The per-chunk
    // transform (length filter) rides the ingest, so the oracle replays
    // filter + identity: a re-ingested (duplicated) chunk, a dropped
    // resume offset, or a torn marker all shift the sums.
    "loader_sharded_resume" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .select("doc_id", "lang", "text")
      val maxId = Option(docs.agg(max("doc_id")).head().get(0))
        .map(_.asInstanceOf[Long]).getOrElse(-1L)
      if (maxId < 0) langAgg(docs.limit(0)) // empty corpus: no shards
      else {
        val tmp = tmpDir("graft_shards")
        val nShards = 3
        val step = maxId / nShards + 1
        val shards = (0 until nShards).map { i =>
          val p = s"$tmp/in/shard$i"
          docs.filter(col("doc_id") >= i * step &&
              col("doc_id") < (i + 1) * step)
            .repartition(4).write.mode("overwrite").parquet(p)
          p
        }
        val state = s"$tmp/state"
        val out = s"$tmp/out"
        val lenFilter = (df: DataFrame) =>
          df.filter(length(col("text")).between(100, 2000))
        ShardedLoader.ingest(s, shards, state, out,
          chunkRecords = 120, maxChunks = 2, transform = lenFilter)
        ShardedLoader.ingest(s, shards, state, out,
          chunkRecords = 120, transform = lenFilter)
        langAgg(ShardedLoader.loaded(s, out, state, shards))
      }
    })
  )

  private val replay =
    """SELECT lang, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(doc_id) AS BIGINT) AS sum_id,
      |  CAST(sum(length(text)) AS BIGINT) AS sum_len
      |FROM f GROUP BY lang""".stripMargin

  def oracles: Map[String, String] = Map(
    // filter → keep-first (min doc_id per normalized-content hash)
    "yaml_job_roundtrip" ->
      s"""WITH flt AS (
         |  SELECT * FROM documents WHERE length(text) BETWEEN 100 AND 2000),
         |f AS (
         |  SELECT * FROM flt
         |  QUALIFY row_number() OVER (
         |    PARTITION BY md5(${DedupQueries.normSql})
         |    ORDER BY doc_id) = 1)
         |$replay""".stripMargin,

    "loader_sharded_resume" ->
      s"""WITH f AS (
         |  SELECT * FROM documents WHERE length(text) BETWEEN 100 AND 2000)
         |$replay""".stripMargin,

    // stage formulas replayed: filter counts, keep-first counts, per-
    // stage and run-level pass rates (0 when the input side is empty —
    // the StageRow/runRow convention). Guarded on a non-empty corpus
    // to mirror the key's isEmpty early-out.
    "metrics_sink_funnel" ->
      s"""WITH inp AS (SELECT count(*) AS n FROM documents),
         |flt AS (
         |  SELECT count(*) AS n FROM documents
         |  WHERE length(text) BETWEEN 100 AND 2000),
         |ded AS (
         |  SELECT count(*) AS n FROM (
         |    SELECT 1 FROM documents
         |    WHERE length(text) BETWEEN 100 AND 2000
         |    QUALIFY row_number() OVER (
         |      PARTITION BY md5(${DedupQueries.normSql})
         |      ORDER BY doc_id) = 1)),
         |rows_ AS (
         |  SELECT 0 AS stage_idx, 'text_length_filter' AS stage_name,
         |    inp.n AS input_records, flt.n AS output_records
         |  FROM inp, flt
         |  UNION ALL
         |  SELECT 1, 'text_exact_deduplicator', flt.n, ded.n FROM flt, ded
         |  UNION ALL
         |  SELECT -1, '__run__', inp.n, ded.n FROM inp, ded)
         |SELECT stage_idx, stage_name,
         |  CAST(input_records AS BIGINT) AS input_records,
         |  CAST(output_records AS BIGINT) AS output_records,
         |  round(CASE WHEN input_records > 0
         |    THEN CAST(output_records AS DOUBLE) / input_records
         |    ELSE 0.0 END, 6) AS pass_rate
         |FROM rows_ WHERE (SELECT n FROM inp) > 0""".stripMargin
  )
}
