package graft

import graft.operators.dedup.{ExactDedup, MinHashLSH}
import graft.operators.text.Bm25
import graft.pipeline.{OperatorRegistry, Pipeline}
import graft.streaming.{StreamingCuration, StreamingMetricsListener, StreamingOps}
import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The continuous curation capstone ([[StreamingCuration]]): streamed
  * ≡ batch at convergence, the per-micro-batch funnel from the
  * engine's own observedMetrics, and the index roll-forward — the
  * IndexStreamSpec discipline applied to the whole chain. */
class StreamingCurationSpec extends SparkSpec {
  import spark.implicits._

  private val perDoc = Pipeline(Seq(
    OperatorRegistry.build("unicode_normalizer", Map.empty),
    OperatorRegistry.build("text_length_filter",
      Map[String, Any]("min_length" -> 12))))

  private val lsh = MinHashLSH(shingleSize = 2)

  private def t(s: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")

  test("streamed curation == batch chain at convergence; funnel + index roll forward") {
    implicit val ctx = spark.sqlContext
    StreamingOps.clearIndexLog(spark, "graft_sc_bm25")
    val bm = Bm25()
    // v0: an empty base index the stream rolls forward from
    bm.buildIndex(Seq.empty[(Long, String)].toDF("doc_id", "text"),
      "graft_sc_bm25_v0", buckets = 4)
    val mem = MemoryStream[(Long, Timestamp, String)]
    val docs = mem.toDF().toDF("doc_id", "ts", "text")
    val listener = new StreamingMetricsListener
    spark.streams.addListener(listener)
    val tmp = java.nio.file.Files.createTempDirectory("graft_sc").toString
    val sc = StreamingCuration(perDoc, lsh, watermark = "10 minutes")
    val (q, live) = sc.start(docs, s"$tmp/out", s"$tmp/ckpt",
      index = Some(("graft_sc_bm25", "graft_sc_bm25_v0",
        (b: DataFrame, from: String, to: String) =>
          bm.refreshIndex(b.select("doc_id", "text"), from, to))))
    val batch1 = Seq(
      (1L, t(0), "alpha beta gamma delta epsilon words flow here"),
      (2L, t(1), "alpha beta gamma delta epsilon words flow here"), // exact dup
      (3L, t(2), "short"), // length-filtered
      (4L, t(3), "totally different content about fast boats and rivers"))
    val batch2 = Seq(
      (5L, t(10), "ALPHA beta gamma delta epsilon words flow here"), // exact dup after normalize
      (6L, t(11), "alpha beta gamma delta epsilon words flow here and more"), // near-dup of 1
      (7L, t(12), "fresh material that matches nothing else at all today"))
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
    } finally { q.stop(); spark.streams.removeListener(listener) }

    // streamed ≡ batch: union of committed batch partitions == the
    // batch chain (perDoc → exact → minhash keep-first) over all input
    val streamed = spark.read.parquet(s"$tmp/out")
      .select("doc_id").as[Long].collect().toSet
    val all = (batch1 ++ batch2).toDF("doc_id", "ts", "text")
    val batchRef = lsh.copy()(ExactDedup()(perDoc(all)))
      .select("doc_id").as[Long].collect().toSet
    assert(streamed == batchRef)
    assert(streamed == Set(1L, 4L, 7L),
      s"2/5 exact dups, 3 too short, 6 near-dup of 1: got $streamed")

    // the funnel arrived through observedMetrics, per stage, per batch
    val totals = listener.stageTotals.toMap
    assert(totals("input") == 7L)
    assert(totals("unicode_normalizer") == 7L)
    assert(totals("text_length_filter") == 6L) // doc 3 dropped

    // the index rolled forward once per non-empty batch and serves
    // exactly like a from-scratch build over the curated corpus
    assert(live.get.get == "graft_sc_bm25_v2")
    val curated = all.join(streamed.toSeq.toDF("doc_id"), "doc_id")
    bm.buildIndex(curated.select("doc_id", "text"), "graft_sc_bm25_full",
      buckets = 4)
    val queries = Seq((10L, "alpha rivers"), (11L, "fresh boats"))
      .toDF("query_id", "text")
    def rows(name: String) = bm.searchIndexed(spark, name, queries, k = 5)
      .select("query_id", "doc_id", "score", "rnk")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(rows("graft_sc_bm25_v2") == rows("graft_sc_bm25_full"))
  }

  test("replayed micro-batch converges: partition overwrite + committed-version skip") {
    implicit val ctx = spark.sqlContext
    StreamingOps.clearIndexLog(spark, "graft_sc_rp")
    val tmp = java.nio.file.Files.createTempDirectory("graft_sc_rp").toString
    val sc = StreamingCuration(perDoc, lsh, watermark = "10 minutes")
    def run(data: Seq[Seq[(Long, Timestamp, String)]], ckpt: String): Unit = {
      val mem = MemoryStream[(Long, Timestamp, String)]
      val (q, _) = sc.start(mem.toDF().toDF("doc_id", "ts", "text"),
        s"$tmp/out", ckpt)
      try data.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      finally q.stop()
    }
    val b0 = Seq((1L, t(0), "alpha beta gamma delta epsilon words flow here"))
    run(Seq(b0), s"$tmp/ckpt1")
    // "restart" with a fresh checkpoint re-delivers batch 0: the
    // batch=0 partition overwrites to the same rows instead of
    // doubling (the idempotence the sink contract promises)
    run(Seq(b0), s"$tmp/ckpt2")
    val out = spark.read.parquet(s"$tmp/out").select("doc_id").as[Long].collect()
    assert(out.toSeq == Seq(1L))
  }
}
