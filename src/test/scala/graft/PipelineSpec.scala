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
}
