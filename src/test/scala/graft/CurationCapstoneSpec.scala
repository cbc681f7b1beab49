package graft

import graft.pipeline.{CurationCapstone, OperatorRegistry, Pipeline, PipelineConfig}
import graft.queries.CurationQueries
import org.apache.spark.sql.functions._

/** The end-to-end curation capstone: the YAML config and the
  * oracle-gated Scala chain must be the SAME pipeline, the funnel must
  * be a genuine monotone filter funnel with every dedup layer doing
  * distinct work, and the quality-survivor stage must keep the
  * best-quality copy of a planted near-dup re-crawl pair. */
class CurationCapstoneSpec extends SparkSpec {
  import spark.implicits._

  // sf0.01 for the funnel-shape tests: the planted twin families need
  // enough docs to survive the quality gates (at sf0.001 the re-crawl
  // pairs reaching the survivor stage can round to zero)
  private val sfDir = "/root/testdata/sf0.01"

  private def writeBench(): String = {
    val d = java.nio.file.Files.createTempDirectory("capstone_bench").toString
    CurationQueries.benchmarkFrame(Tables.load(spark, sfDir, "documents"))
      .write.mode("overwrite").parquet(d)
    d
  }

  test("YAML config and CurationCapstone build the identical op chain") {
    val yaml = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("configs/example_fineweb_curation.yaml")), "UTF-8")
    val parsed = PipelineConfig.parseJob(yaml)
    // the YAML prepends the test-corpus page + url derivations; from
    // there on the op chain must match the canonical capstone ops
    val yamlOps = parsed.pipeline.ops.map(_.name)
    assert(yamlOps.take(2) ==
      Seq("synthetic_page_column", "synthetic_url_column"))
    assert(yamlOps.drop(2) == CurationCapstone.ops("ignored").map(_._1))
  }

  test("capstone funnel is monotone and every dedup layer does distinct work") {
    val docs = Tables.load(spark, sfDir, "documents")
    val funnel = CurationCapstone.pipeline(writeBench())
      .funnelStaged(CurationQueries.preppedInput(docs))
      .orderBy("step_idx")
      .as[(Int, String, Long)].collect()
    assert(funnel.map(_._2).toSeq ==
      "input" +: CurationCapstone.ops("x").map(_._1))
    val counts = funnel.map(_._3)
    counts.sliding(2).foreach { case Array(a, b) => assert(b <= a) }
    assert(counts.last > 0)
    val byName = funnel.map(f => f._2 -> f._3).toMap
    // url dedup drops the tracking-param re-crawl variants
    assert(byName("url_deduplicator") < byName("unicode_normalizer"))
    // exact dedup drops the /amp/ identical-text twins
    assert(byName("text_exact_deduplicator") < byName("c4_cleaner"))
    // the minhash survivor stage drops the fast→quick near-dup twins
    assert(byName("quality_survivor_deduplicator") <
      byName("text_exact_deduplicator"))
  }

  test("quality survivors keep the longer re-crawl copy of a near-dup pair") {
    val docs = Tables.load(spark, sfDir, "documents")
    // run the chain through the survivor stage (dropping later stages
    // that could cut survivors for unrelated reasons)
    val toSurvivors = Pipeline(CurationCapstone.ops("x").take(8)
      .map { case (n, p) => OperatorRegistry.build(n, p) })
    val out = toSurvivors(CurationQueries.preppedInput(docs))
      .select("doc_id").as[Long].collect().toSet
    val both = out.filter(id => id >= 2000000L && out.contains(id - 2000000L))
    assert(both.isEmpty, s"base+recrawl twins both survived: $both")
    // where a pair reached the stage, the LONGER (fast→quick) re-crawl
    // copy is the keeper — quality-aware selection, not keep-first
    assert(out.exists(_ >= 2000000L),
      "no re-crawl survivor at all — the quality keep-best rule never fired")
  }

  test("rejection audit partitions the input and reconciles with the funnel") {
    val docs = Tables.load(spark, sfDir, "documents")
    val inp = CurationQueries.preppedInput(docs)
    val pipe = CurationCapstone.pipeline(writeBench())
    val audit = pipe.rejectionAudit(inp)
      .as[(Long, Int, String)].collect()
    // every input row appears exactly once
    assert(audit.length == inp.count())
    assert(audit.map(_._1).distinct.length == audit.length)
    // kept set == the chain's actual survivors
    val keptIds = audit.filter(_._3 == "kept").map(_._1).toSet
    assert(keptIds == pipe(inp).select("doc_id").as[Long].collect().toSet)
    // per-stage drop counts reconcile with the funnel deltas
    val funnel = pipe.funnelStaged(inp).orderBy("step_idx")
      .as[(Int, String, Long)].collect()
    val drops = audit.filter(_._3 != "kept")
      .groupBy(_._2).map { case (i, rows) => i -> rows.length.toLong }
    funnel.sliding(2).foreach { case Array((_, _, a), (i, _, b)) =>
      assert(drops.getOrElse(i, 0L) == a - b,
        s"stage $i: audit says ${drops.getOrElse(i, 0L)} drops, funnel says ${a - b}")
    }
  }

  test("end-to-end YAML job run writes curated output with shard layout") {
    val docs = Tables.load(spark, sfDir, "documents")
    val inDir = java.nio.file.Files.createTempDirectory("capstone_in").toString
    // the YAML job is self-contained on the RAW corpus: its
    // synthetic_page_column / synthetic_url_column prep stages derive
    // the page shape and url the cleaners act on
    docs.write.mode("overwrite").parquet(s"$inDir/in")
    val outDir = java.nio.file.Files.createTempDirectory("capstone_out").toString
    val yaml = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("configs/example_fineweb_curation.yaml")), "UTF-8")
      .replace("/root/testdata/sf0.001/documents.parquet", s"$inDir/in")
      .replace("/tmp/graft_out/capstone_bench", writeBench())
      .replace("/tmp/graft_out/fineweb_curated", s"$outDir/curated")
    val job = PipelineConfig.parseJob(yaml)
    val result = job.run(spark)
    val written = spark.read.parquet(s"$outDir/curated")
    assert(written.count() > 0)
    assert(written.columns.contains("shard") && written.columns.contains("pos"))
    assert(result.columns.contains("g_word_count"))
  }
}
