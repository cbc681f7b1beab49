package graft

import graft.pipeline.PipelineConfig

/** CLI entry point — the counterpart of the reference's `cli.py` +
  * `scripts/generate_metrics_report.py`: run a full YAML job
  * (data_loader → stages → data_writer) and print the funnel report,
  * or profile it per-operator.
  *
  * {{{
  * graft.Main run pipeline.yaml              # fused run + funnel report
  * graft.Main run pipeline.yaml --no-report  # skip the funnel instrumentation
  * graft.Main profile pipeline.yaml          # per-op wall time + rec/s
  * }}}
  */
object Main {
  def main(args: Array[String]): Unit = {
    if (args.length < 2 || !Set("run", "profile").contains(args(0))) {
      System.err.println("usage: graft.Main run|profile <config.yaml> [--no-report]")
      sys.exit(2)
    }
    val yaml = java.nio.file.Files.readString(java.nio.file.Path.of(args(1)))
    val report = !args.contains("--no-report")
    val job = PipelineConfig.parseJob(yaml)
    val spark = GraftSession.local("graft-cli")
    try {
      if (args(0) == "profile") {
        val (_, metrics) = job.runProfiled(spark)
        println(job.pipeline.formatStageReport(metrics))
      } else {
        val t0 = System.nanoTime()
        val in = job.loader.getOrElse(throw new IllegalArgumentException(
          "config has no data_loader section"))(spark)
        val (out, handles) =
          if (report) job.pipeline.observed(in)
          else (job.pipeline(in), Seq.empty)
        job.writer match {
          case Some(w) => w(out)
          case None => println(s"[graft] rows out: ${out.count()} (no data_writer configured)")
        }
        if (report) {
          val wall = (System.nanoTime() - t0) / 1e9
          println(job.pipeline.formatReport(job.pipeline.funnelReport(handles), wall))
        }
      }
    } finally spark.stop()
  }
}
