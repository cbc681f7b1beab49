package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Parquet metrics persistence + a self-contained HTML funnel report —
  * the Spark-native counterpart of the reference's metrics stack:
  * `framework/metrics/writer.py` (runs/ + stages/ parquet tables in a
  * Superset-compatible flat schema, one file set per run) and
  * `framework/metrics/reporter.py` + `scripts/generate_metrics_report.py`
  * (an HTML report with funnel / throughput sections).
  *
  * Layout under a metrics path (appended across runs, so the whole
  * history is ONE queryable table per level — `spark.read.parquet
  * (s"\$path/stages")` feeds a dashboard directly):
  * {{{
  * metrics_path/
  *   runs/    — one row per pipeline run
  *   stages/  — one row per operator per run
  *   report_run_<run_id>.html
  * }}}
  * The report is dependency-free HTML/CSS (no chart JS — zero-egress
  * build); the parquet side is what a dashboard actually queries.
  */
object MetricsSink {

  /** One operator's funnel row. `wall_sec`/`rec_per_sec` are None for
    * fused runs: Catalyst collapses all stages into one physical pass,
    * so per-stage wall time *does not exist* there (that IS the
    * optimization); [[Pipeline.profile]] materializes per-stage and
    * fills them in. */
  case class StageRow(
      run_id: String, stage_idx: Int, stage_name: String,
      input_records: Long, output_records: Long, pass_rate: Double,
      wall_sec: Option[Double], rec_per_sec: Option[Double])

  /** One pipeline run (reference RUN_SCHEMA: run_id, start/end,
    * duration, totals, overall pass rate, config payload). */
  case class RunRow(
      run_id: String, start_time: java.sql.Timestamp,
      end_time: java.sql.Timestamp, duration_sec: Double, num_stages: Int,
      total_input_records: Long, total_output_records: Long,
      overall_pass_rate: Double, avg_throughput: Double, config: String)

  /** UTC-timestamped run id with a short random suffix (unique across
    * concurrent drivers writing the same metrics path). */
  def newRunId(): String = {
    val ts = java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss")
      .withZone(java.time.ZoneOffset.UTC).format(java.time.Instant.now())
    val suffix = java.util.UUID.randomUUID().toString.take(8)
    s"${ts}_$suffix"
  }

  /** Stage rows from a fused-run funnel ([[Pipeline.funnelReport]]):
    * the head entry is the input count, each later entry one operator. */
  def fromFunnel(runId: String, funnel: Seq[(String, Long)]): Seq[StageRow] =
    funnel.sliding(2).zipWithIndex.collect {
      case (Seq((_, in), (op, out)), i) =>
        StageRow(runId, i, op, in, out,
          if (in > 0) out.toDouble / in else 0.0, None, None)
    }.toSeq

  /** Stage rows from a profiled run ([[Pipeline.profile]]) — wall time
    * and throughput are real per-stage measurements there. */
  def fromProfile(runId: String, metrics: Seq[StageMetrics]): Seq[StageRow] =
    metrics.zipWithIndex.map { case (m, i) =>
      StageRow(runId, i, m.op, m.rowsIn, m.rowsOut, m.passRate,
        Some(m.wallSec), Some(m.recPerSec))
    }

  /** The run-level row summarizing a stage set. */
  def runRow(runId: String, stages: Seq[StageRow], durationSec: Double,
      config: String, endMillis: Long = System.currentTimeMillis()): RunRow = {
    val in = stages.headOption.map(_.input_records).getOrElse(0L)
    val out = stages.lastOption.map(_.output_records).getOrElse(0L)
    RunRow(runId,
      new java.sql.Timestamp(endMillis - (durationSec * 1000).toLong),
      new java.sql.Timestamp(endMillis), durationSec, stages.size, in, out,
      if (in > 0) out.toDouble / in else 0.0,
      if (durationSec > 0) in / durationSec else 0.0, config)
  }

  /** Append one run into `path/runs` and its stage rows into
    * `path/stages`. Metrics are a handful of rows per run — coalesce(1)
    * keeps each run one file per level, like the reference writer. */
  def write(spark: SparkSession, path: String, run: RunRow,
      stages: Seq[StageRow]): Unit = {
    import spark.implicits._
    Seq(run).toDF().coalesce(1).write.mode("append")
      .parquet(s"${path.stripSuffix("/")}/runs")
    stages.toDF().coalesce(1).write.mode("append")
      .parquet(s"${path.stripSuffix("/")}/stages")
  }

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Self-contained HTML report: run summary tiles + a CSS funnel (bar
    * width ∝ rows relative to input) + the per-stage table. */
  def htmlReport(run: RunRow, stages: Seq[StageRow]): String = {
    val input = math.max(run.total_input_records, 1L)
    val bars = stages.map { s =>
      val pct = 100.0 * s.output_records / input
      val wall = s.wall_sec.map(w => f"$w%.2f s").getOrElse("—")
      val rps = s.rec_per_sec.map(r => f"$r%,.0f rec/s").getOrElse("fused")
      f"""<div class="row"><div class="label">${esc(s.stage_name)}</div>
         |<div class="track"><div class="bar" style="width:${math.max(pct, 0.5)}%%"></div></div>
         |<div class="nums">${s.output_records}%,d rows · ${s.pass_rate * 100}%.1f%% pass · $wall · $rps</div></div>""".stripMargin
    }.mkString("\n")
    val tableRows = stages.map { s =>
      val wall = s.wall_sec.map(w => f"$w%.3f").getOrElse("")
      val rps = s.rec_per_sec.map(r => f"$r%,.0f").getOrElse("")
      f"""<tr><td>${s.stage_idx}</td><td>${esc(s.stage_name)}</td>
         |<td>${s.input_records}%,d</td><td>${s.output_records}%,d</td>
         |<td>${s.pass_rate * 100}%.2f%%</td><td>$wall</td><td>$rps</td></tr>""".stripMargin
    }.mkString("\n")
    f"""<!DOCTYPE html><html><head><meta charset="utf-8">
       |<title>graft run ${esc(run.run_id)}</title><style>
       |body{font-family:system-ui,sans-serif;margin:2rem;color:#1a1a2e}
       |h1{font-size:1.3rem} .tiles{display:flex;gap:1rem;flex-wrap:wrap;margin:1rem 0}
       |.tile{border:1px solid #d0d4dc;border-radius:8px;padding:.8rem 1.2rem}
       |.tile .v{font-size:1.25rem;font-weight:600} .tile .k{font-size:.75rem;color:#5a6272}
       |.row{display:grid;grid-template-columns:14rem 1fr 22rem;gap:.6rem;align-items:center;margin:.25rem 0}
       |.label{text-align:right;font-size:.85rem} .nums{font-size:.8rem;color:#5a6272}
       |.track{background:#eef0f4;border-radius:4px}
       |.bar{background:#4662d7;height:1.1rem;border-radius:4px}
       |table{border-collapse:collapse;margin-top:1.5rem;font-size:.85rem}
       |td,th{border:1px solid #d0d4dc;padding:.35rem .7rem;text-align:right}
       |td:nth-child(2),th:nth-child(2){text-align:left}
       |</style></head><body>
       |<h1>graft pipeline run <code>${esc(run.run_id)}</code></h1>
       |<div class="tiles">
       |<div class="tile"><div class="v">${run.total_input_records}%,d</div><div class="k">rows in</div></div>
       |<div class="tile"><div class="v">${run.total_output_records}%,d</div><div class="k">rows out</div></div>
       |<div class="tile"><div class="v">${run.overall_pass_rate * 100}%.1f%%</div><div class="k">overall pass</div></div>
       |<div class="tile"><div class="v">${run.duration_sec}%.2f s</div><div class="k">wall</div></div>
       |<div class="tile"><div class="v">${run.avg_throughput}%,.0f</div><div class="k">rec/s</div></div>
       |<div class="tile"><div class="v">${run.num_stages}</div><div class="k">stages</div></div>
       |</div>
       |<h2>Funnel</h2>
       |<div class="row"><div class="label"><b>input</b></div>
       |<div class="track"><div class="bar" style="width:100%%"></div></div>
       |<div class="nums">${run.total_input_records}%,d rows</div></div>
       |$bars
       |<h2>Stages</h2>
       |<table><tr><th>#</th><th>operator</th><th>rows in</th><th>rows out</th>
       |<th>pass</th><th>wall s</th><th>rec/s</th></tr>
       |$tableRows</table>
       |</body></html>""".stripMargin
  }

  /** Render and write `report_run_<id>.html` next to the tables via the
    * Hadoop FS API (works on hdfs/s3a paths, not only file://). Returns
    * the report path. */
  def writeReport(spark: SparkSession, path: String, run: RunRow,
      stages: Seq[StageRow]): String = {
    val target = s"${path.stripSuffix("/")}/report_run_${run.run_id}.html"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(target), spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(target), true)
    try out.write(htmlReport(run, stages).getBytes("UTF-8"))
    finally out.close()
    target
  }

  /** One-call persistence: build the run row, append both tables, write
    * the report. Returns the run id. */
  def persist(spark: SparkSession, path: String, stages: Seq[StageRow],
      durationSec: Double, config: String): String = {
    val runId = stages.headOption.map(_.run_id).getOrElse(newRunId())
    val run = runRow(runId, stages, durationSec, config)
    write(spark, path, run, stages)
    writeReport(spark, path, run, stages)
    runId
  }
}
