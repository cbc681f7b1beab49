package graft

import graft.pipeline._
import org.apache.spark.sql.functions._

class MetricsSpec extends SparkSpec {
  import spark.implicits._

  private def samplePipeline = Pipeline(Seq(
    FilterOp("text_length_filter", d => length(col("text")) >= 10),
    RefineOp("quality_scorer", d => d.withColumn("q", length(col("text")) / 100.0)),
    FilterOp("quality_filter", d => col("q") > 0.1)))

  private def sampleDocs = Seq(
    (1L, "a sufficiently long document that easily survives all filtering"),
    (2L, "x"),
    (3L, "another long document with plenty of characters in its body"),
    (4L, "short but ok")).toDF("doc_id", "text")

  test("fused run persists runs/stages parquet with the reference schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft_metrics").toString
    val p = samplePipeline
    val (out, handles) = p.observed(sampleDocs)
    out.count()
    val funnel = p.funnelReport(handles)
    val runId = MetricsSink.newRunId()
    MetricsSink.persist(spark, dir, MetricsSink.fromFunnel(runId, funnel), 1.5, "config: x")

    val stages = spark.read.parquet(s"$dir/stages")
    assert(stages.columns.toSet == Set("run_id", "stage_idx", "stage_name",
      "input_records", "output_records", "pass_rate", "wall_sec", "rec_per_sec"))
    val rows = stages.orderBy("stage_idx")
      .select("stage_name", "input_records", "output_records")
      .as[(String, Long, Long)].collect().toSeq
    assert(rows == Seq(("text_length_filter", 4L, 3L),
      ("quality_scorer", 3L, 3L), ("quality_filter", 3L, 3L)))
    // fused runs have no per-stage wall time — that's the fused plan
    assert(stages.filter(col("wall_sec").isNotNull).count() == 0)

    val runs = spark.read.parquet(s"$dir/runs")
    assert(runs.columns.toSet == Set("run_id", "start_time", "end_time",
      "duration_sec", "num_stages", "total_input_records",
      "total_output_records", "overall_pass_rate", "avg_throughput", "config"))
    val r = runs.collect().head
    assert(r.getAs[String]("run_id") == runId)
    assert(r.getAs[Long]("total_input_records") == 4L)
    assert(r.getAs[Long]("total_output_records") == 3L)
    assert(r.getAs[Double]("overall_pass_rate") == 0.75)
    assert(r.getAs[String]("config") == "config: x")
  }

  test("profiled run fills wall/throughput; runs append across executions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_metrics2").toString
    val p = samplePipeline
    for (_ <- 1 to 2) {
      val (res, metrics) = p.profile(sampleDocs)
      res.unpersist()
      MetricsSink.persist(spark, dir,
        MetricsSink.fromProfile(MetricsSink.newRunId(), metrics), 0.7, "c")
    }
    val stages = spark.read.parquet(s"$dir/stages")
    assert(stages.count() == 6) // 3 stages × 2 runs appended
    assert(stages.filter(col("wall_sec").isNull).count() == 0)
    assert(stages.filter(col("rec_per_sec") <= 0).count() == 0)
    assert(spark.read.parquet(s"$dir/runs").select("run_id").distinct().count() == 2)
  }

  test("HTML report is self-contained and carries the funnel") {
    val dir = java.nio.file.Files.createTempDirectory("graft_metrics3").toString
    val runId = MetricsSink.newRunId()
    val stageRows = MetricsSink.fromProfile(runId, Seq(
      StageMetrics("url_filter", 1000, 400, 1.2),
      StageMetrics("exact_dedup", 400, 300, 0.8)))
    MetricsSink.persist(spark, dir, stageRows, 2.0, "cfg")
    val report = new java.io.File(dir).listFiles()
      .find(_.getName == s"report_run_$runId.html")
    assert(report.nonEmpty)
    val html = java.nio.file.Files.readString(report.get.toPath)
    assert(html.contains("url_filter") && html.contains("exact_dedup"))
    assert(html.contains("40.0% pass")) // per-stage pass rate rendered
    assert(!html.toLowerCase.contains("<script")) // dependency-free artifact
  }

  test("a table_profile-style query reads the stages table back") {
    val dir = java.nio.file.Files.createTempDirectory("graft_metrics4").toString
    MetricsSink.persist(spark, dir, MetricsSink.fromProfile(
      MetricsSink.newRunId(), Seq(StageMetrics("f1", 100, 60, 0.5))), 0.5, "c")
    val profile = spark.read.parquet(s"$dir/stages")
      .groupBy("stage_name")
      .agg(sum("input_records").as("in_total"), avg("pass_rate").as("avg_pass"))
      .collect()
    assert(profile.head.getAs[Long]("in_total") == 100L)
    assert(profile.head.getAs[Double]("avg_pass") == 0.6)
  }
}
