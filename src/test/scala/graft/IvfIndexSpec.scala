package graft

import graft.operators.vector.IvfIndex
import org.apache.spark.sql.functions._

/** The persisted IVF index artifact (the vector twin of the BM25
  * index): result parity with the direct topK plan, and the layout
  * claim itself — a query batch's cell reads BUCKET-PRUNE the cells
  * scan (SelectedBucketsCount < total). */
class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  // 40 vectors in 4 tight clusters around orthogonal-ish axes, so cell
  // assignment is unambiguous and every cluster holds 10 rows
  private def vec(axis: Int, i: Int): Array[Float] = {
    val v = Array.fill(8)(0.01f * ((axis * 31 + i * 7) % 5))
    v(axis) = 1.0f + 0.001f * i
    v
  }
  private lazy val corpus = (0 until 40).map { i =>
    (i.toLong, vec(i % 4, i / 4))
  }.toDF("vec_id", "embedding")
  private lazy val centroids = (0 until 4).map { a =>
    (a, Array.tabulate(8)(j => if (j == a) 1.0 else 0.0))
  }.toDF("centroid_id", "cvec")

  test("searchIndexed reproduces topK exactly from the persisted tables") {
    val ivf = IvfIndex()
    ivf.buildIndex(corpus, centroids, "graft_ivf_spec", buckets = 4)
    val queries = corpus.filter($"vec_id" < 6)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(rows(ivf.searchIndexed(spark, "graft_ivf_spec", queries,
        k = 3, nprobe = 2)) ==
      rows(ivf.topK(corpus, centroids, k = 3, nprobe = 2, $"vec_id" < 6)))
  }

  test("query batch bucket-prunes the cells scan to its probed cells") {
    val ivf = IvfIndex()
    ivf.buildIndex(corpus, centroids, "graft_ivf_prune", buckets = 4)
    // a single query vector probing 1 cell: only that cell's bucket
    // should be selected by the scan
    val one = corpus.filter($"vec_id" === 0L)
    val plan = ivf.searchIndexed(spark, "graft_ivf_prune", one,
      k = 3, nprobe = 1).queryExecution.executedPlan.toString
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(plan)
    assert(m.nonEmpty, s"no bucket pruning in plan:\n$plan")
    assert(m.get.group(1).toInt < m.get.group(2).toInt,
      s"scan read all ${m.get.group(2)} buckets")
  }

  test("refreshIndex: rolled-forward index ≡ full rebuild; old version intact") {
    val ivf = IvfIndex()
    ivf.buildIndex(corpus.filter($"vec_id" < 20), centroids,
      "graft_ivf_v0", buckets = 4)
    val queries = corpus.filter($"vec_id" < 4)
    val oldRows = ivf.searchIndexed(spark, "graft_ivf_v0", queries,
      k = 3, nprobe = 2).collect().toSet
    ivf.refreshIndex(corpus.filter($"vec_id" >= 20),
      "graft_ivf_v0", "graft_ivf_v1", buckets = 4)
    ivf.buildIndex(corpus, centroids, "graft_ivf_full", buckets = 4)
    def rows(name: String) = ivf.searchIndexed(spark, name, queries,
      k = 3, nprobe = 2).as[(Long, Long, Double, Int)].collect().toSet
    assert(rows("graft_ivf_v1") == rows("graft_ivf_full"))
    // a crashed refresh can never corrupt the live index: v0 unchanged
    assert(ivf.searchIndexed(spark, "graft_ivf_v0", queries,
      k = 3, nprobe = 2).collect().toSet == oldRows)
    intercept[IllegalArgumentException] {
      ivf.refreshIndex(corpus, "graft_ivf_v0", "graft_ivf_v0")
    }
  }

  test("attachIndex re-registers the on-disk index with bucket pruning intact") {
    val ivf = IvfIndex()
    ivf.buildIndex(corpus, centroids, "graft_ivf_att", buckets = 4)
    // a fresh session would have no catalog entry for the files on
    // disk; attaching under a NEW name exercises exactly that path
    ivf.attachIndex(spark, "graft_ivf_att", "graft_ivf_att2", buckets = 4)
    val queries = corpus.filter($"vec_id" < 4)
    def rows(name: String) = ivf.searchIndexed(spark, name, queries,
      k = 3, nprobe = 2).as[(Long, Long, Double, Int)].collect().toSet
    assert(rows("graft_ivf_att2") == rows("graft_ivf_att"))
    // the re-declared bucket spec still prunes the scan
    val plan = ivf.searchIndexed(spark, "graft_ivf_att2",
      corpus.filter($"vec_id" === 0L), k = 3, nprobe = 1)
      .queryExecution.executedPlan.toString
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
    assert(m.nonEmpty && m.get.group(1).toInt < m.get.group(2).toInt)
    spark.sql("DROP TABLE graft_ivf_att2_cells")
    spark.sql("DROP TABLE graft_ivf_att2_centroids")
    // the attached tables are location-backed: dropping them must not
    // have deleted the original index's files
    assert(rows("graft_ivf_att").nonEmpty)
  }

  test("index serves queries that are not corpus rows") {
    val ivf = IvfIndex()
    ivf.buildIndex(corpus, centroids, "graft_ivf_ext", buckets = 4)
    val external = Seq((1000L, vec(2, 3))).toDF("vec_id", "embedding")
    val got = ivf.searchIndexed(spark, "graft_ivf_ext", external,
      k = 3, nprobe = 1).as[(Long, Long, Double, Int)].collect()
    assert(got.length == 3)
    assert(got.forall(_._1 == 1000L))
    // nearest cell is axis-2: every hit comes from that cluster
    assert(got.forall { case (_, cid, _, _) => cid % 4 == 2 })
  }
}
