package graft

import graft.pipeline.{MetricsSink, PipelineConfig}

/** End-to-end multimodal funnel (the configs/bench/multimodal_1m.yaml
  * chain at test scale): binary image column → trained-PCA embedding
  * through the batched-inference slot → embedding-cosine near-dup →
  * sharded token-budget sampling → parquet sink, with the per-operator
  * profile persisted as the reference-style metrics tables + HTML
  * funnel report. */
class MultimodalE2ESpec extends SparkSpec {

  test("multimodal YAML funnel runs e2e and persists profile metrics + report") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mm").toString
    val yaml =
      s"""data_loader:
         |  type: ParquetLoader
         |  params: {path: /root/testdata/sf0.001/documents.parquet}
         |stages:
         |  - name: featurize
         |    operators:
         |      - name: synthetic_image_column
         |      - name: image_trained_embedding_refiner
         |        params: {batch_size: 64}
         |  - name: dedup
         |    operators:
         |      - name: embedding_near_dup_deduplicator
         |        params: {threshold: 0.98, dim: 8}
         |  - name: sample
         |    operators:
         |      - name: token_budget_sampler
         |        params: {default_budget: 2000, shards: 4}
         |data_writer:
         |  type: ParquetDataWriter
         |  params: {output_path: $dir/out}
         |""".stripMargin
    val job = PipelineConfig.parseJob(yaml)
    val (_, metrics) = job.runProfiled(spark)
    assert(metrics.map(_.op) == Seq("synthetic_image_column",
      "image_trained_embedding_refiner", "embedding_near_dup_deduplicator",
      "token_budget_sampler"))
    // featurize stages are 1:1; dedup and sampling only ever shrink
    assert(metrics(0).rowsOut == metrics(0).rowsIn)
    assert(metrics(1).rowsOut == metrics(1).rowsIn)
    assert(metrics(2).rowsOut <= metrics(2).rowsIn)
    assert(metrics(3).rowsOut <= metrics(3).rowsIn)
    assert(metrics(3).rowsOut > 0, "the funnel must not run dry")
    val out = spark.read.parquet(s"$dir/out")
    assert(out.columns.contains("embedding") && out.columns.contains("image"))
    assert(out.count() == metrics(3).rowsOut)
    // the embedding survived as array<float> of the model's dim
    val vec = out.select("embedding").head.getSeq[Float](0)
    assert(vec.length == graft.operators.ml.TrainedEmbedding.embeddingDim)
    // persist the profile the way graft.Main does; report must render
    val runId = MetricsSink.persist(spark, s"$dir/metrics",
      MetricsSink.fromProfile(MetricsSink.newRunId(), metrics), 1.0, yaml)
    val report = java.nio.file.Files.readString(
      java.nio.file.Path.of(s"$dir/metrics/report_run_$runId.html"))
    assert(report.contains("embedding_near_dup_deduplicator") &&
      report.contains("token_budget_sampler"))
  }
}
