package graft

import graft.functions.TextFns
import graft.operators.text.TextLengthFilter
import graft.pipeline._
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  val docs = Seq(
    (1L, "one two three four five six seven eight nine ten"),
    (2L, "one two three four five six seven eight nine ten"), // dup of 1
    (3L, "short"),
    (4L, "another unique document with enough words to pass the filter")
  ).toDF("doc_id", "text")

  val pipe = Pipeline(Seq(
    RefineOp("n_words", df => df.withColumn("n_words", TextFns.wsTokenCount(col("text")))),
    FilterOp("min_len", df => TextLengthFilter(minLength = 10).predicate(df)),
    DedupOp("exact", _ => TextFns.contentHashMd5(col("text")), "doc_id")))

  test("apply: refine, filter, dedup compose lazily") {
    val out = pipe(docs)
    assert(out.columns.contains("n_words"))
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 4L))
  }

  test("observed funnel matches actual counts") {
    val (res, obs) = pipe.observed(docs)
    res.collect() // action triggers observations
    val funnel = pipe.funnelReport(obs).toMap
    assert(funnel("input") == 4L)
    assert(funnel("min_len") == 3L)
    assert(funnel("exact") == 2L)
  }

  test("funnelCounts single-pass agrees with observed funnel") {
    val got = pipe.funnelCounts(docs)
      .select("step", "n_rows").as[(String, Long)].collect().toMap
    assert(got == Map("input" -> 4L, "n_words" -> 4L, "min_len" -> 3L, "exact" -> 2L))
  }

  test("rejectionAudit on a 40-stage chain stays correct and plan-bounded") {
    // 40 filter stages, each dropping exactly the row whose id == stage
    // index — crosses the AuditCheckpointEvery boundary twice, so the
    // union accumulator is checkpointed mid-chain and the audit must
    // still attribute every drop to its exact stage.
    val n = 40
    val wide = spark.range(0, n + 5).toDF("doc_id")
    val chain = Pipeline((1 to n).map(i =>
      FilterOp(s"drop_$i", df => col("doc_id") =!= lit(i.toLong - 1))))
    val audit = chain.rejectionAudit(wide)
      .as[(Long, Int, String)].collect()
    assert(audit.length == n + 5)
    assert(audit.map(_._1).distinct.length == n + 5)
    (1 to n).foreach { i =>
      val row = audit.find(_._1 == i.toLong - 1).get
      assert(row._2 == i && row._3 == s"drop_$i")
    }
    assert(audit.count(_._3 == "kept") == 5)
    // the final audit plan is bounded: each un-checkpointed leg is one
    // anti-join, so after the mid-chain accumulator checkpoints the
    // plan carries at most AuditCheckpointEvery joins — not one per
    // stage (40 here)
    val legs = "(?i)\\bjoin\\b".r
      .findAllIn(chain.rejectionAudit(wide).queryExecution.optimizedPlan.toString)
      .size
    assert(legs <= Pipeline.AuditCheckpointEvery,
      s"audit plan carries $legs join legs — accumulator checkpoint not applied")
  }
}
