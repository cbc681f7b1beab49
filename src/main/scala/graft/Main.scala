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
  * graft.Main index-build <docs.parquet> <index-dir>     # build the near-dup index
  * graft.Main ingest <batch.parquet> <index-dir> <out>   # delta dedup + roll index
  * }}}
  *
  * `index-build`/`ingest` implement the daily-ingest loop around
  * [[graft.operators.dedup.IncrementalMinHashDedup]]: build the narrow
  * (doc_id, band, bucket) corpus index once, then each ingest dedups a
  * new batch against it (corpus text never re-read), writes survivors,
  * and appends their bucket rows so the next ingest sees them. Both
  * accept `--num-hashes --bands --shingle-size --text-field --id-field`
  * (must match between the index build and every subsequent ingest).
  */
object Main {

  private def lshFromArgs(args: Array[String]): graft.operators.dedup.MinHashLSH = {
    def opt(name: String, default: String): String =
      args.indexOf(name) match {
        case i if i >= 0 && i + 1 < args.length => args(i + 1)
        case _ => default
      }
    graft.operators.dedup.MinHashLSH(
      numHashes = opt("--num-hashes", "12").toInt,
      bands = opt("--bands", "4").toInt,
      shingleSize = opt("--shingle-size", "3").toInt,
      textCol = opt("--text-field", "text"),
      idCol = opt("--id-field", "doc_id"))
  }

  /** Build the persisted band-bucket index for a curated corpus. */
  def runIndexBuild(spark: org.apache.spark.sql.SparkSession,
      docsPath: String, indexPath: String, args: Array[String]): Unit = {
    val lsh = lshFromArgs(args)
    lsh.buckets(spark.read.parquet(docsPath))
      .write.mode("overwrite").partitionBy("band").parquet(indexPath)
    println(s"[graft] index written to $indexPath")
  }

  /** Dedup a batch against the index, write survivors, roll the index. */
  def runIngest(spark: org.apache.spark.sql.SparkSession, batchPath: String,
      indexPath: String, outPath: String, args: Array[String]): Unit = {
    val lsh = lshFromArgs(args)
    val batch = spark.read.parquet(batchPath)
    val index = spark.read.parquet(indexPath)
    // materialize survivors before appending to the index we just read
    val survivors = graft.operators.dedup.IncrementalMinHashDedup(lsh)
      .survivors(index, batch).localCheckpoint()
    val nIn = batch.count()
    val nOut = survivors.count()
    survivors.write.mode("overwrite").parquet(outPath)
    lsh.buckets(survivors)
      .write.mode("append").partitionBy("band").parquet(indexPath)
    println(s"[graft] ingest: $nIn in, $nOut kept (${nIn - nOut} near-dups); " +
      s"survivors -> $outPath, index rolled forward")
  }

  def main(args: Array[String]): Unit = {
    if (args.length >= 3 && args(0) == "index-build") {
      val spark = GraftSession.local("graft-cli")
      try runIndexBuild(spark, args(1), args(2), args) finally spark.stop()
      return
    }
    if (args.length >= 4 && args(0) == "ingest") {
      val spark = GraftSession.local("graft-cli")
      try runIngest(spark, args(1), args(2), args(3), args) finally spark.stop()
      return
    }
    if (args.length < 2 || !Set("run", "profile").contains(args(0))) {
      System.err.println(
        "usage: graft.Main run|profile <config.yaml> [--no-report] [--metrics-path <dir>]\n" +
        "       graft.Main index-build <docs.parquet> <index-dir> [lsh opts]\n" +
        "       graft.Main ingest <batch.parquet> <index-dir> <survivors-out> [lsh opts]")
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
