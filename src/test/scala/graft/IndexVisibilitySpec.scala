package graft

import graft.operators.text.Bm25
import graft.operators.vector.IvfIndex
import graft.streaming.StreamingOps
import org.apache.spark.sql.functions._

/** The index refresh VISIBILITY contract (verdict r13 #7): a reader
  * concurrent with a version flip sees the OLD version or the NEW one,
  * never a torn mix, because
  *
  *   1. version names are IMMUTABLE — `refreshIndex(from, to)` never
  *      writes under `from`, so a reader pinned to `from` is
  *      byte-for-byte undisturbed for the entire refresh (asserted on
  *      the data files themselves, not just the results);
  *   2. a reader resolves ALL of an index's tables under ONE version
  *      name, and flips names only at a commit boundary — it can never
  *      pair v1 postings with v2 vocab;
  *   3. the flip itself is the commit record (tmp + atomic rename in
  *      the index log, written AFTER the refresh completes), so a
  *      crashed mid-refresh leaves the pointer on the old version and
  *      the torn target invisible; the retry rebuilds the same version
  *      name cleanly (refresh drops a torn target first).
  */
class IndexVisibilitySpec extends SparkSpec {
  import spark.implicits._

  /** Recursive (relative-path, length, mtime) snapshot of the data
    * files behind an index version — the "old version untouched" oracle. */
  private def fileSnapshot(dirs: Seq[String]): Set[(String, Long, Long)] = {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val conf = spark.sparkContext.hadoopConfiguration
    dirs.flatMap { d =>
      val p = new org.apache.hadoop.fs.Path(s"$wh/$d")
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) Seq.empty
      else {
        val it = fs.listFiles(p, true)
        val buf = scala.collection.mutable.ArrayBuffer[(String, Long, Long)]()
        while (it.hasNext) {
          val st = it.next()
          buf += ((st.getPath.toString.stripPrefix(wh),
            st.getLen, st.getModificationTime))
        }
        buf.toSeq
      }
    }.toSet
  }

  // a version's OWN dirs under the segmented layout: the one segment
  // it wrote plus its manifest (inherited segments belong to — and are
  // snapshot under — the version that wrote them)
  private def bm25Dirs(name: String) =
    Seq("seg_postings", "seg_vocab", "seg_lens", "seg_stats", "manifest")
      .map(s => s"${name}_$s")
  private def ivfDirs(name: String) =
    Seq("seg_cells", "centroids", "manifest").map(s => s"${name}_$s")

  test("BM25: a reader pinned to the old version is byte-for-byte undisturbed by a refresh") {
    val bm = Bm25()
    val d0 = Seq((1L, "apple banana plum"), (2L, "cherry apple words here"),
      (3L, "plum cherry banana apple")).toDF("doc_id", "text")
    bm.buildIndex(d0, "graft_vis_v1")
    val queries = Seq((10L, "apple cherry"), (11L, "plum banana"))
      .toDF("query_id", "text")
    def rows(name: String) = bm.searchIndexed(spark, name, queries, k = 5)
      .select("query_id", "doc_id", "score", "rnk")
      .as[(Long, Long, Double, Int)].collect().toSet
    val before = rows("graft_vis_v1")
    val snap = fileSnapshot(bm25Dirs("graft_vis_v1"))
    assert(snap.nonEmpty)
    val batch = Seq((4L, "apple apple banana"), (5L, "cherry plum durian"))
      .toDF("doc_id", "text")
    bm.refreshIndex(batch, "graft_vis_v1", "graft_vis_v2")
    // old version: same files (path+len+mtime), same results
    assert(fileSnapshot(bm25Dirs("graft_vis_v1")) == snap,
      "refresh touched the old version's data files")
    assert(rows("graft_vis_v1") == before)
    // new version: indistinguishable from a from-scratch build
    bm.buildIndex(d0.unionByName(batch), "graft_vis_full")
    assert(rows("graft_vis_v2") == rows("graft_vis_full"))
  }

  test("BM25: a torn refresh is invisible to the pointer and heals on retry") {
    val bm = Bm25()
    val d0 = Seq((1L, "apple banana plum"), (2L, "cherry apple words"))
      .toDF("doc_id", "text")
    bm.buildIndex(d0, "graft_torn_v1")
    StreamingOps.clearIndexLog(spark, "graft_torn")
    StreamingOps.writeIndexCommit(spark, "graft_torn", 0L, "graft_torn_v1")
    // simulate a crash MID-refresh into v2: the new segment's postings
    // landed (with garbage content), the rest — including the manifest,
    // the commit record — did not. (A prior SESSION's torn leftover is
    // the exact stale-dir state this simulates — clear it first so the
    // simulation itself is re-run-idempotent.)
    spark.sql("DROP TABLE IF EXISTS graft_torn_v2_seg_postings")
    val tornDir = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir") + "/graft_torn_v2_seg_postings")
    val tornFs = tornDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (tornFs.exists(tornDir)) tornFs.delete(tornDir, true)
    Seq((99L, "torn"), (98L, "partial")).toDF("term", "junk")
      .write.mode("overwrite").format("parquet")
      .saveAsTable("graft_torn_v2_seg_postings")
    // a pointer-following reader recovers the LAST COMMITTED version —
    // the torn v2 is unreachable by name resolution
    val (live, lastId) =
      StreamingOps.recoverIndexState(spark, "graft_torn", "unused_fallback")
    assert(live == "graft_torn_v1" && lastId == 0L)
    val queries = Seq((10L, "apple cherry")).toDF("query_id", "text")
    assert(bm.searchIndexed(spark, live, queries, k = 5).count() > 0)
    // the retry rebuilds v2 under the SAME name: refresh drops the torn
    // target first, then the commit record flips the pointer
    val batch = Seq((3L, "durian words apple")).toDF("doc_id", "text")
    bm.refreshIndex(batch, "graft_torn_v1", "graft_torn_v2")
    StreamingOps.writeIndexCommit(spark, "graft_torn", 1L, "graft_torn_v2")
    val (live2, _) =
      StreamingOps.recoverIndexState(spark, "graft_torn", "unused_fallback")
    assert(live2 == "graft_torn_v2")
    bm.buildIndex(d0.unionByName(batch), "graft_torn_full")
    def rows(name: String) = bm.searchIndexed(spark, name, queries, k = 5)
      .select("query_id", "doc_id", "score", "rnk")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(rows("graft_torn_v2") == rows("graft_torn_full"))
  }

  test("IVF: old version immutable across refresh; new version ≡ rebuild") {
    val ivf = IvfIndex()
    def vec(axis: Int, i: Int): Array[Float] = {
      val v = Array.fill(8)(0.01f * ((axis * 31 + i * 7) % 5))
      v(axis) = 1.0f + 0.001f * i
      v
    }
    val corpus = (0 until 40).map(i => (i.toLong, vec(i % 4, i / 4)))
      .toDF("vec_id", "embedding")
    val centroids = (0 until 4).map(a =>
      (a, Array.tabulate(8)(j => if (j == a) 1.0 else 0.0)))
      .toDF("centroid_id", "cvec")
    ivf.buildIndex(corpus.filter($"vec_id" < 20), centroids,
      "graft_vis_ivf_v1")
    val queries = corpus.filter($"vec_id" < 4)
    def rows(name: String) = ivf.searchIndexed(spark, name, queries,
        k = 3, nprobe = 2)
      .as[(Long, Long, Double, Int)].collect().toSet
    val before = rows("graft_vis_ivf_v1")
    val snap = fileSnapshot(ivfDirs("graft_vis_ivf_v1"))
    assert(snap.nonEmpty)
    ivf.refreshIndex(corpus.filter($"vec_id" >= 20),
      "graft_vis_ivf_v1", "graft_vis_ivf_v2")
    assert(fileSnapshot(ivfDirs("graft_vis_ivf_v1")) == snap,
      "refresh touched the old IVF version's data files")
    assert(rows("graft_vis_ivf_v1") == before)
    ivf.buildIndex(corpus, centroids, "graft_vis_ivf_full")
    assert(rows("graft_vis_ivf_v2") == rows("graft_vis_ivf_full"))
  }
}
