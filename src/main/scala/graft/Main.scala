package graft

import graft.pipeline.PipelineConfig

/** CLI entry point — the counterpart of the reference's `cli.py`:
  * run a full YAML job (data_loader → stages → data_writer) and print
  * the per-operator funnel report.
  *
  * {{{
  * graft.Main run pipeline.yaml            # run + funnel report
  * graft.Main run pipeline.yaml --no-report  # skip the extra funnel pass
  * }}}
  */
object Main {
  def main(args: Array[String]): Unit = {
    if (args.length < 2 || args(0) != "run") {
      System.err.println("usage: graft.Main run <config.yaml> [--no-report]")
      sys.exit(2)
    }
    val yaml = java.nio.file.Files.readString(java.nio.file.Path.of(args(1)))
    val report = !args.contains("--no-report")
    val job = PipelineConfig.parseJob(yaml)
    val spark = GraftSession.local("graft-cli")
    try {
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
    } finally spark.stop()
  }
}
