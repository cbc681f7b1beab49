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
    ivf.buildIndex(corpus, centroids, "graft_ivf_spec")
    val queries = corpus.filter($"vec_id" < 6)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(rows(ivf.searchIndexed(spark, "graft_ivf_spec", queries,
        k = 3, nprobe = 2)) ==
      rows(ivf.topK(corpus, centroids, k = 3, nprobe = 2, $"vec_id" < 6)))
  }

  test("query batch bucket-prunes the cells scan to its probed cells") {
    val ivf = IvfIndex()
    ivf.buildIndex(corpus, centroids, "graft_ivf_prune")
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
      "graft_ivf_v0")
    val queries = corpus.filter($"vec_id" < 4)
    val oldRows = ivf.searchIndexed(spark, "graft_ivf_v0", queries,
      k = 3, nprobe = 2).collect().toSet
    ivf.refreshIndex(corpus.filter($"vec_id" >= 20),
      "graft_ivf_v0", "graft_ivf_v1")
    ivf.buildIndex(corpus, centroids, "graft_ivf_full")
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
    ivf.buildIndex(corpus, centroids, "graft_ivf_att")
    // a fresh session would have no catalog entry for the files on
    // disk; attaching under a NEW name exercises exactly that path
    ivf.attachIndex(spark, "graft_ivf_att", "graft_ivf_att2")
    val queries = corpus.filter($"vec_id" < 4)
    def rows(name: String) = ivf.searchIndexed(spark, name, queries,
      k = 3, nprobe = 2).as[(Long, Long, Double, Int)].collect().toSet
    assert(rows("graft_ivf_att2") == rows("graft_ivf_att"))
    // the durable alias manifest lists warehouse-backed prefixes (the
    // fresh-session resolvability invariant); simulate the fresh
    // session by copying the index dirs to a catalog-unknown prefix
    // and attaching THAT — the re-declared bucket spec must still
    // prune the scan
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val fs = new org.apache.hadoop.fs.Path(wh)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.read.parquet(s"$wh/graft_ivf_att2_manifest").collect().foreach { r =>
      assert(fs.exists(new org.apache.hadoop.fs.Path(
        s"$wh/${r.getString(0).toLowerCase}_cells")), r.getString(0))
    }
    val conf = spark.sparkContext.hadoopConfiguration
    // the warehouse dir persists across sbt runs: FileUtil.copy into a
    // leftover destination NESTS the copy under stale files written by
    // a previous run's layout — clear destinations first
    for (d <- Seq("graft_ivf_att8_seg_cells", "graft_ivf_att8_centroids"))
      fs.delete(new org.apache.hadoop.fs.Path(s"$wh/$d"), true)
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(s"$wh/graft_ivf_att_seg_cells"), fs,
      new org.apache.hadoop.fs.Path(s"$wh/graft_ivf_att8_seg_cells"), false, conf)
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(s"$wh/graft_ivf_att_centroids"), fs,
      new org.apache.hadoop.fs.Path(s"$wh/graft_ivf_att8_centroids"), false, conf)
    spark.read.parquet(s"$wh/graft_ivf_att_manifest")
      .selectExpr("'graft_ivf_att8_seg' AS seg", "gen", "layout").coalesce(1)
      .write.mode("overwrite").parquet(s"$wh/graft_ivf_att8_manifest")
    ivf.attachIndex(spark, "graft_ivf_att8", "graft_ivf_att8")
    assert(rows("graft_ivf_att8") == rows("graft_ivf_att"))
    val plan = ivf.searchIndexed(spark, "graft_ivf_att8",
      corpus.filter($"vec_id" === 0L), k = 3, nprobe = 1)
      .queryExecution.executedPlan.toString
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
    assert(m.nonEmpty && m.get.group(1).toInt < m.get.group(2).toInt)
    // attached tables are location-backed: dropping the att8 catalog
    // entries must not delete the copied files (nor the original's)
    spark.sql("DROP TABLE graft_ivf_att8_seg_cells")
    spark.sql("DROP TABLE graft_ivf_att8_centroids")
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      s"$wh/graft_ivf_att8_seg_cells")))
    assert(rows("graft_ivf_att").nonEmpty)
  }

  test("int8 index: quantized scan + exact rerank equals the float strategies") {
    val ivf = IvfIndex()
    ivf.buildIndex(corpus, centroids, "graft_ivf_f32")
    ivf.buildIndexInt8(corpus, centroids, "graft_ivf_i8")
    val queries = corpus.filter($"vec_id" < 6)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .as[(Long, Long, Double, Int)].collect().toSet
    // exact parity: same ids, same 6dp cosines (rerank runs on the
    // cold float store, not the dequantized codes), same ranks
    assert(rows(ivf.searchIndexedInt8(spark, "graft_ivf_i8", queries,
        k = 3, nprobe = 2)) ==
      rows(ivf.searchIndexed(spark, "graft_ivf_f32", queries,
        k = 3, nprobe = 2)))
    // the hot table really stores int8 codes, not floats
    val sch = spark.table("graft_ivf_i8_seg_cells").schema
    assert(sch.fieldNames.toSet == Set("vec_id", "centroid_id", "qvec"))
    val qs = spark.table("graft_ivf_i8_seg_cells")
      .selectExpr("max(array_max(qvec))", "min(array_min(qvec))").head()
    assert(qs.getInt(0) <= 127 && qs.getInt(1) >= -128)
    // refine=1 degrades gracefully (still k valid rows per query, by
    // approximate order) — the knob trades rerank fetches for recall
    assert(ivf.searchIndexedInt8(spark, "graft_ivf_i8", queries,
      k = 3, nprobe = 2, refine = 1).count() == 18)
  }

  test("compactIndex folds cells segments into one; results unchanged") {
    val ivf = IvfIndex()
    ivf.buildIndex(corpus.filter($"vec_id" < 15), centroids,
      "graft_ivf_cp0")
    ivf.refreshIndex(corpus.filter($"vec_id" >= 15 && $"vec_id" < 30),
      "graft_ivf_cp0", "graft_ivf_cp1")
    ivf.refreshIndex(corpus.filter($"vec_id" >= 30),
      "graft_ivf_cp1", "graft_ivf_cp2")
    assert(ivf.segments(spark, "graft_ivf_cp2").map(_._1) ==
      Seq("graft_ivf_cp0_seg", "graft_ivf_cp1_seg", "graft_ivf_cp2_seg"))
    ivf.compactIndex(spark, "graft_ivf_cp2", "graft_ivf_cpz")
    assert(ivf.segments(spark, "graft_ivf_cpz").size == 1)
    val queries = corpus.filter($"vec_id" < 4)
    def rows(name: String) = ivf.searchIndexed(spark, name, queries,
      k = 3, nprobe = 2).as[(Long, Long, Double, Int)].collect().toSet
    assert(rows("graft_ivf_cpz") == rows("graft_ivf_cp2"))
    assert(rows("graft_ivf_cp1").nonEmpty)
  }

  test("stalenessReport separates build-time cells from refreshed ones") {
    val ivf = IvfIndex()
    // build on axes 0-1 only, then refresh with a DRIFTED batch: axis-2
    // and axis-3 vectors that land in cells the build never populated
    ivf.buildIndex(corpus.filter($"vec_id" % 4 < 2), centroids,
      "graft_ivf_st0")
    ivf.refreshIndex(corpus.filter($"vec_id" % 4 >= 2),
      "graft_ivf_st0", "graft_ivf_st1")
    val rep = ivf.stalenessReport(spark, "graft_ivf_st1")
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // axis-0/1 cells: build rows only; axis-2/3: refreshed rows only
    // (virgin cells report their refreshed count as growth)
    assert(rep(0) == ((10L, 0L, 0.0)) && rep(1) == ((10L, 0L, 0.0)))
    assert(rep(2) == ((0L, 10L, 10.0)) && rep(3) == ((0L, 10L, 10.0)))
    // the drifted roll trips the default rebuild trigger; a pure
    // re-roll of build-distribution data would not
    assert(ivf.needsRebuild(spark, "graft_ivf_st1"))
    ivf.buildIndex(corpus.filter($"vec_id" % 4 < 2), centroids,
      "graft_ivf_st2")
    ivf.refreshIndex(corpus.filter($"vec_id" % 4 === 0), // same cells, same shape
      "graft_ivf_st2", "graft_ivf_st3")
    assert(!ivf.needsRebuild(spark, "graft_ivf_st3"))
  }

  test("rebuildIndex re-trains over the full indexed population and clears the trigger") {
    val ivf = IvfIndex()
    // the staleness fixture: build on axes 0-1, drifted roll-forward
    // with axes 2-3 → the trigger fires
    ivf.buildIndex(corpus.filter($"vec_id" % 4 < 2), centroids,
      "graft_ivf_rb0")
    ivf.refreshIndex(corpus.filter($"vec_id" % 4 >= 2),
      "graft_ivf_rb0", "graft_ivf_rb1")
    assert(ivf.needsRebuild(spark, "graft_ivf_rb1"))
    ivf.rebuildIndex(spark, "graft_ivf_rb1", "graft_ivf_rb2")
    // re-trained version: every row is gen-0 again, trigger clear
    assert(!ivf.needsRebuild(spark, "graft_ivf_rb2"))
    assert(ivf.segments(spark, "graft_ivf_rb2").map(_._2) == Seq(0))
    // population is preserved exactly (all 40 ids, no dup, no loss) …
    val cells = spark.table("graft_ivf_rb2_seg_cells")
    assert(cells.select("vec_id").as[Long].collect().sorted.toSeq ==
      (0L until 40L))
    // … and the new version serves the re-trained centroids' answer:
    // searchIndexed(new) ≡ the direct plan over the same population +
    // centroids (the searchIndexed parity contract, post-rebuild)
    val newCents = spark.table("graft_ivf_rb2_centroids")
    val queries = corpus.filter($"vec_id" % 10 === 0)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(rows(ivf.searchIndexed(spark, "graft_ivf_rb2", queries,
        k = 3, nprobe = 2)) ==
      rows(ivf.topK(corpus, newCents, k = 3, nprobe = 2,
        $"vec_id" % 10 === 0)))
    // the drifted pre-rebuild version is untouched (time travel)
    assert(ivf.needsRebuild(spark, "graft_ivf_rb1"))
  }

  test("index serves queries that are not corpus rows") {
    val ivf = IvfIndex()
    ivf.buildIndex(corpus, centroids, "graft_ivf_ext")
    val external = Seq((1000L, vec(2, 3))).toDF("vec_id", "embedding")
    val got = ivf.searchIndexed(spark, "graft_ivf_ext", external,
      k = 3, nprobe = 1).as[(Long, Long, Double, Int)].collect()
    assert(got.length == 3)
    assert(got.forall(_._1 == 1000L))
    // nearest cell is axis-2: every hit comes from that cluster
    assert(got.forall { case (_, cid, _, _) => cid % 4 == 2 })
  }
}
