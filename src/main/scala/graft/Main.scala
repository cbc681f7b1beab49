package graft

import graft.pipeline.{MetricsSink, PipelineConfig}

/** CLI entry point — the counterpart of the reference's `cli.py` +
  * `scripts/generate_metrics_report.py`: run a full YAML job
  * (data_loader → stages → data_writer) and print the funnel report,
  * or profile it per-operator. `--metrics-path` persists the run to the
  * reference-style parquet tables (runs/, stages/) plus a
  * self-contained HTML funnel report ([[graft.pipeline.MetricsSink]]).
  *
  * {{{
  * graft.Main run pipeline.yaml                     # fused run + funnel report
  * graft.Main run pipeline.yaml --no-report         # skip the funnel instrumentation
  * graft.Main run pipeline.yaml --metrics-path m/   # + persist metrics & report
  * graft.Main profile pipeline.yaml [--metrics-path m/]  # per-op wall + rec/s
  * }}}
  */
object Main {
  def main(args: Array[String]): Unit = {
    if (args.length < 2 || !Set("run", "profile").contains(args(0))) {
      System.err.println(
        "usage: graft.Main run|profile <config.yaml> [--no-report] [--metrics-path <dir>]")
      sys.exit(2)
    }
    val yaml = java.nio.file.Files.readString(java.nio.file.Path.of(args(1)))
    val report = !args.contains("--no-report")
    val metricsPath = args.indexOf("--metrics-path") match {
      case i if i >= 0 && i + 1 < args.length => Some(args(i + 1))
      case i if i >= 0 => System.err.println("--metrics-path needs a value"); sys.exit(2)
      case _ => None
    }
    val job = PipelineConfig.parseJob(yaml)
    val spark = GraftSession.local("graft-cli")
    try {
      val runId = MetricsSink.newRunId()
      if (args(0) == "profile") {
        val t0 = System.nanoTime()
        val (_, metrics) = job.runProfiled(spark)
        val wall = (System.nanoTime() - t0) / 1e9
        println(job.pipeline.formatStageReport(metrics))
        metricsPath.foreach { p =>
          MetricsSink.persist(spark, p,
            MetricsSink.fromProfile(runId, metrics), wall, yaml)
          println(s"[graft] metrics + report written to $p (run $runId)")
        }
      } else {
        val t0 = System.nanoTime()
        val in = job.loader.getOrElse(throw new IllegalArgumentException(
          "config has no data_loader section"))(spark)
        val (out, handles) =
          if (report || metricsPath.nonEmpty) job.pipeline.observed(in)
          else (job.pipeline(in), Seq.empty)
        job.writer match {
          case Some(w) => w(out)
          case None => println(s"[graft] rows out: ${out.count()} (no data_writer configured)")
        }
        val wall = (System.nanoTime() - t0) / 1e9
        if (handles.nonEmpty) {
          val funnel = job.pipeline.funnelReport(handles)
          if (report) println(job.pipeline.formatReport(funnel, wall))
          metricsPath.foreach { p =>
            MetricsSink.persist(spark, p,
              MetricsSink.fromFunnel(runId, funnel), wall, yaml)
            println(s"[graft] metrics + report written to $p (run $runId)")
          }
        }
      }
    } finally spark.stop()
  }
}
