package graft

import graft.pipeline.{MultimodalCapstone, OperatorRegistry, Pipeline, PipelineConfig}
import graft.queries.MultimodalQueries
import org.apache.spark.sql.functions._

/** The multimodal curation capstone: the YAML config and the
  * oracle-gated Scala chain must be the SAME pipeline, the funnel must
  * be a genuine monotone filter funnel, and each of the three dedup
  * layers must catch ITS planted twin family (image twins at the phash
  * stage, last-char audio twins at the audio stage, brightness-shift
  * video twins at the video stage). */
class MultimodalCapstoneSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.01"

  test("YAML config and MultimodalCapstone build the identical op chain") {
    val yaml = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("configs/example_multimodal_capstone.yaml")), "UTF-8")
    val parsed = PipelineConfig.parseJob(yaml)
    assert(parsed.pipeline.ops.map(_.name) == MultimodalCapstone.ops.map(_._1))
  }

  test("funnel is monotone and all three dedup layers do distinct work") {
    val docs = Tables.load(spark, sfDir, "documents")
    val funnel = MultimodalCapstone.pipeline
      .funnelStaged(MultimodalQueries.preppedInput(docs))
      .orderBy("step_idx")
      .as[(Int, String, Long)].collect()
    assert(funnel.map(_._2).toSeq ==
      "input" +: MultimodalCapstone.ops.map(_._1))
    val counts = funnel.map(_._3)
    counts.sliding(2).foreach { case Array(a, b) => assert(b <= a) }
    assert(counts.last > 0)
    // step indices: 6 = image phash dedup, 7 = clip filter,
    // 10 = audio dedup, 11 = video dedup (dedup stage names repeat, so
    // address by position)
    assert(counts(6) < counts(5), "image phash dedup dropped nothing")
    assert(counts(7) < counts(6), "clip filter dropped nothing")
    assert(counts(10) < counts(9), "audio dedup dropped nothing")
    assert(counts(11) < counts(10), "video dedup dropped nothing")
  }

  test("each twin family is caught by its own dedup stage") {
    val docs = Tables.load(spark, sfDir, "documents")
    val inp = MultimodalQueries.preppedInput(docs)
    def survivors(nOps: Int): Set[Long] =
      Pipeline(MultimodalCapstone.ops.take(nOps)
        .map { case (n, p) => OperatorRegistry.build(n, p) })(inp)
        .select("doc_id").as[Long].collect().toSet
    // after the image phash dedup (op 6): no byte-identical image twin
    // survives alongside its base
    val afterPhash = survivors(6)
    assert(afterPhash.filter(id => id >= 1000000L && id < 2000000L)
      .forall(id => !afterPhash.contains(id - 1000000L)),
      "an identical-payload image twin survived the phash stage with its base")
    // audio twins are NOT caught by the image stage (content hash
    // scrambles under the one-char bump)...
    val audioPairsAfterPhash = afterPhash
      .filter(id => id >= 2000000L && id < 3000000L)
      .filter(id => afterPhash.contains(id - 2000000L))
    assert(audioPairsAfterPhash.nonEmpty,
      "no audio twin pair even reached the audio stage")
    // ...but ARE caught by the audio dedup (op 10)
    val afterAudio = survivors(10)
    assert(afterAudio.filter(id => id >= 2000000L && id < 3000000L)
      .forall(id => !afterAudio.contains(id - 2000000L)),
      "an audio twin survived the radius-1 contour dedup with its base")
    // video twins survive image+audio stages for at least some pairs...
    val videoPairsAfterAudio = afterAudio
      .filter(id => id >= 3000000L)
      .filter(id => afterAudio.contains(id - 3000000L))
    assert(videoPairsAfterAudio.nonEmpty,
      "no video twin pair even reached the video stage")
    // ...and the video dedup (op 11) catches every remaining pair: the
    // quantized DCT is exactly invariant under the uniform +1 shift
    val afterVideo = survivors(11)
    assert(afterVideo.filter(_ >= 3000000L)
      .forall(id => !afterVideo.contains(id - 3000000L)),
      "a brightness-shift video twin survived the frame-DCT dedup with its base")
  }

  test("rejection audit partitions the input and reconciles with the funnel") {
    val docs = Tables.load(spark, sfDir, "documents")
    val inp = MultimodalQueries.preppedInput(docs)
    val pipe = MultimodalCapstone.pipeline
    val audit = pipe.rejectionAudit(inp).as[(Long, Int, String)].collect()
    assert(audit.length == inp.count())
    assert(audit.map(_._1).distinct.length == audit.length)
    val funnel = pipe.funnelStaged(inp).orderBy("step_idx")
      .as[(Int, String, Long)].collect()
    val drops = audit.filter(_._3 != "kept")
      .groupBy(_._2).map { case (i, rows) => i -> rows.length.toLong }
    funnel.sliding(2).foreach { case Array((_, _, a), (i, _, b)) =>
      assert(drops.getOrElse(i, 0L) == a - b,
        s"stage $i: audit says ${drops.getOrElse(i, 0L)}, funnel says ${a - b}")
    }
  }

  test("end-to-end YAML job run writes curated output with shard layout") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val inDir = java.nio.file.Files.createTempDirectory("mm_capstone_in").toString
    MultimodalQueries.preppedInput(docs)
      .write.mode("overwrite").parquet(s"$inDir/in")
    val outDir = java.nio.file.Files.createTempDirectory("mm_capstone_out").toString
    val yaml = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("configs/example_multimodal_capstone.yaml")), "UTF-8")
      .replace("/root/testdata/sf0.001/documents.parquet", s"$inDir/in")
      .replace("/tmp/graft_out/multimodal_capstone", s"$outDir/curated")
    val job = PipelineConfig.parseJob(yaml)
    val result = job.run(spark)
    val written = spark.read.parquet(s"$outDir/curated")
    assert(written.count() > 0)
    assert(written.columns.contains("shard") && written.columns.contains("pos"))
    assert(result.columns.contains("audio_fp") && result.columns.contains("phash"))
  }
}
