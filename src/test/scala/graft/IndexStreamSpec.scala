package graft

import graft.operators.text.Bm25
import graft.operators.vector.IvfIndex
import graft.streaming.StreamingOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming index maintenance: a memory stream of new documents /
  * vectors rolls the persisted BM25 and IVF indexes forward one
  * micro-batch at a time, and the final version is indistinguishable
  * from a from-scratch build over everything ingested. */
class IndexStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamed BM25 refreshes converge to the full-corpus build") {
    implicit val ctx = spark.sqlContext
    StreamingOps.clearIndexLog(spark, "graft_bm25s")
    val bm = Bm25()
    val d0 = Seq((1L, "apple banana plum"), (2L, "cherry apple words here"))
      .toDF("doc_id", "text")
    bm.buildIndex(d0, "graft_bm25s_v0")
    val mem = MemoryStream[(Long, String)]
    val (writer, live) = StreamingOps.indexMaintenance(
      mem.toDF().toDF("doc_id", "text"), "graft_bm25s", "graft_bm25s_v0",
      (batch, from, to) => bm.refreshIndex(batch, from, to))
    val ckpt = java.nio.file.Files.createTempDirectory("bm25s_ckpt").toString
    val q = writer.option("checkpointLocation", ckpt).start()
    try {
      mem.addData((3L, "durian and a tail of words"))
      q.processAllAvailable()
      mem.addData((4L, "apple apple banana"), (5L, "cherry banana durian"))
      q.processAllAvailable()
    } finally q.stop()
    val all = d0.unionByName(Seq(
      (3L, "durian and a tail of words"),
      (4L, "apple apple banana"),
      (5L, "cherry banana durian")).toDF("doc_id", "text"))
    bm.buildIndex(all, "graft_bm25s_full")
    val queries = Seq((10L, "apple cherry"), (11L, "durian banana"))
      .toDF("query_id", "text")
    def rows(name: String) = bm.searchIndexed(spark, name, queries, k = 5)
      .select("query_id", "doc_id", "score", "rnk")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(live.get == "graft_bm25s_v2")
    assert(rows(live.get) == rows("graft_bm25s_full"))
    // the start version is untouched by the whole stream
    assert(bm.searchIndexed(spark, "graft_bm25s_v0", queries, k = 5)
      .count() >= 0)
  }

  test("streamed refreshes with periodic compaction fold segments; results unchanged") {
    implicit val ctx = spark.sqlContext
    StreamingOps.clearIndexLog(spark, "graft_bm25sc")
    val bm = Bm25()
    val d0 = Seq((1L, "apple banana plum")).toDF("doc_id", "text")
    bm.buildIndex(d0, "graft_bm25sc_v0")
    val mem = MemoryStream[(Long, String)]
    val (writer, live) = StreamingOps.indexMaintenance(
      mem.toDF().toDF("doc_id", "text"), "graft_bm25sc", "graft_bm25sc_v0",
      (batch, from, to) => bm.refreshIndex(batch, from, to),
      compact = Some((2, (from, to) => bm.compactIndex(spark, from, to))))
    val ckpt = java.nio.file.Files.createTempDirectory("bm25sc_ckpt").toString
    val q = writer.option("checkpointLocation", ckpt).start()
    try {
      mem.addData((2L, "cherry apple words here")); q.processAllAvailable()
      mem.addData((3L, "durian and a tail of words")); q.processAllAvailable()
      mem.addData((4L, "apple apple banana")); q.processAllAvailable()
    } finally q.stop()
    // batches 0,1,2 commit v1, v2c (fold at every=2), v3; v3 rolls
    // forward FROM the folded v2c, so its manifest holds exactly
    // (folded segment, batch-2 segment)
    assert(live.get == "graft_bm25sc_v3")
    assert(bm.segments(spark, "graft_bm25sc_v3") ==
      Seq("graft_bm25sc_v2c_seg", "graft_bm25sc_v3_seg"))
    val all = d0.unionByName(Seq(
      (2L, "cherry apple words here"),
      (3L, "durian and a tail of words"),
      (4L, "apple apple banana")).toDF("doc_id", "text"))
    bm.buildIndex(all, "graft_bm25sc_full")
    val queries = Seq((10L, "apple cherry"), (11L, "durian banana"))
      .toDF("query_id", "text")
    def rows(name: String) = bm.searchIndexed(spark, name, queries, k = 5)
      .select("query_id", "doc_id", "score", "rnk")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(rows("graft_bm25sc_v3") == rows("graft_bm25sc_full"))
  }

  test("index maintenance recovers the live pointer across restarts") {
    // r13 ADVICE: the pointer was process-local, so a restart replaying
    // a micro-batch refreshed from the ORIGINAL base version and the
    // new version silently dropped every earlier committed batch's
    // documents. Now the commit log recovers (version, last batch id):
    // replayed ids skip, new batches refresh from the recovered tip.
    implicit val ctx = spark.sqlContext
    StreamingOps.clearIndexLog(spark, "graft_bm25rc")
    val bm = Bm25()
    val d0 = Seq((1L, "apple banana plum"), (2L, "cherry apple words here"))
      .toDF("doc_id", "text")
    bm.buildIndex(d0, "graft_bm25rc_v0")
    val b0 = Seq((3L, "durian and a tail of words"))
    val b1 = Seq((4L, "apple apple banana"), (5L, "cherry banana durian"))
    def run(batches: Seq[Seq[(Long, String)]]): String = {
      val mem = MemoryStream[(Long, String)]
      val (writer, live) = StreamingOps.indexMaintenance(
        mem.toDF().toDF("doc_id", "text"), "graft_bm25rc", "graft_bm25rc_v0",
        (batch, from, to) => bm.refreshIndex(batch, from, to))
      val ckpt = java.nio.file.Files.createTempDirectory("bm25rc_ckpt").toString
      val q = writer.option("checkpointLocation", ckpt).start()
      try batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      finally q.stop()
      live.get
    }
    assert(run(Seq(b0, b1)) == "graft_bm25rc_v2")
    // "restart": recovered pointer is the last flipped version, the two
    // replayed micro-batches (ids 0 and 1 again) are skipped — they are
    // already folded into v2 — and only the genuinely new third batch
    // rolls the index forward
    assert(StreamingOps.recoverIndexState(spark, "graft_bm25rc",
      "graft_bm25rc_v0") == ("graft_bm25rc_v2", 1L))
    val b2 = Seq((6L, "plum words and a new tail"))
    assert(run(Seq(b0, b1, b2)) == "graft_bm25rc_v3")
    val all = d0.unionByName((b0 ++ b1 ++ b2).toDF("doc_id", "text"))
    bm.buildIndex(all, "graft_bm25rc_full")
    val queries = Seq((10L, "apple cherry"), (11L, "durian plum"))
      .toDF("query_id", "text")
    def rows(name: String) = bm.searchIndexed(spark, name, queries, k = 5)
      .select("query_id", "doc_id", "score", "rnk")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(rows("graft_bm25rc_v3") == rows("graft_bm25rc_full"))
  }

  test("streamed IVF refreshes converge to the full-corpus build") {
    implicit val ctx = spark.sqlContext
    StreamingOps.clearIndexLog(spark, "graft_ivfs")
    def vec(axis: Int, i: Int): Array[Float] = {
      val v = Array.fill(8)(0.0f); v(axis) = 1.0f + 0.001f * i; v
    }
    val ivf = IvfIndex()
    val centroids = (0 until 4).map { a =>
      (a, Array.tabulate(8)(j => if (j == a) 1.0 else 0.0))
    }.toDF("centroid_id", "cvec")
    val base = (0 until 12).map(i => (i.toLong, vec(i % 4, i / 4)))
      .toDF("vec_id", "embedding")
    ivf.buildIndex(base, centroids, "graft_ivfs_v0")
    val mem = MemoryStream[(Long, Array[Float])]
    val (writer, live) = StreamingOps.indexMaintenance(
      mem.toDF().toDF("vec_id", "embedding"), "graft_ivfs", "graft_ivfs_v0",
      (batch, from, to) => ivf.refreshIndex(batch, from, to))
    val ckpt = java.nio.file.Files.createTempDirectory("ivfs_ckpt").toString
    val q = writer.option("checkpointLocation", ckpt).start()
    val extra = (12 until 24).map(i => (i.toLong, vec(i % 4, i / 4)))
    try {
      mem.addData(extra.take(6): _*)
      q.processAllAvailable()
      mem.addData(extra.drop(6): _*)
      q.processAllAvailable()
    } finally q.stop()
    val all = base.unionByName(extra.toDF("vec_id", "embedding"))
    ivf.buildIndex(all, centroids, "graft_ivfs_full")
    val queries = all.filter($"vec_id" < 4)
    def rows(name: String) = ivf.searchIndexed(spark, name, queries,
      k = 3, nprobe = 2).as[(Long, Long, Double, Int)].collect().toSet
    assert(live.get == "graft_ivfs_v2")
    assert(rows(live.get) == rows("graft_ivfs_full"))
  }

  test("maintenance compact hook escalates to a re-train when staleness trips") {
    // the full maintenance loop composed: refresh per batch → at the
    // compaction boundary, needsRebuild decides COMPACT (healthy) vs
    // REBUILD (drifted) — here the stream ingests only axis-2/3
    // vectors against an axis-0/1 build, so the boundary re-trains
    implicit val ctx = spark.sqlContext
    StreamingOps.clearIndexLog(spark, "graft_ivfr")
    def vec(axis: Int, i: Int): Array[Float] = {
      val v = Array.fill(8)(0.0f); v(axis) = 1.0f + 0.001f * i; v
    }
    val ivf = IvfIndex()
    val centroids = (0 until 4).map { a =>
      (a, Array.tabulate(8)(j => if (j == a) 1.0 else 0.0))
    }.toDF("centroid_id", "cvec")
    val base = (0 until 8).map(i => (i.toLong, vec(i % 2, i / 2)))
      .toDF("vec_id", "embedding")
    ivf.buildIndex(base, centroids, "graft_ivfr_v0")
    val mem = MemoryStream[(Long, Array[Float])]
    val escalate = (from: String, to: String) =>
      if (ivf.needsRebuild(spark, from)) ivf.rebuildIndex(spark, from, to)
      else ivf.compactIndex(spark, from, to)
    val (writer, live) = StreamingOps.indexMaintenance(
      mem.toDF().toDF("vec_id", "embedding"), "graft_ivfr", "graft_ivfr_v0",
      (batch, from, to) => ivf.refreshIndex(batch, from, to),
      compact = Some((2, escalate)))
    val ckpt = java.nio.file.Files.createTempDirectory("ivfr_ckpt").toString
    val q = writer.option("checkpointLocation", ckpt).start()
    val drifted = (8 until 20).map(i => (i.toLong, vec(2 + i % 2, i / 2)))
    try {
      mem.addData(drifted.take(6): _*); q.processAllAvailable()
      mem.addData(drifted.drop(6): _*); q.processAllAvailable()
    } finally q.stop()
    // batch 1 hits the every=2 boundary; the drifted ingest trips the
    // trigger, so the committed version is the RE-TRAINED fold
    assert(live.get == "graft_ivfr_v2c")
    assert(ivf.segments(spark, live.get).map(_._2) == Seq(0)) // gen-0 only
    assert(!ivf.needsRebuild(spark, live.get))
    val cells = spark.table(s"${live.get}_seg_cells")
    assert(cells.select("vec_id").as[Long].collect().sorted.toSeq ==
      (0L until 20L)) // whole population, no dup/loss
  }
}
