package graft

import graft.operators.vector.{IncrementalSemanticDedup, IvfIndex, KMeansOps, SemanticDedup}
import org.apache.spark.sql.functions._

/** Vector-family scale probe: time nearest-centroid assignment and
  * cluster-scoped semantic dedup over a [[ScaleData.vectors]] corpus at
  * several cluster counts k. SemDeDup's costs pull in opposite
  * directions in k — brute-force assignment is Θ(n·k) while the
  * in-cluster candidate pairs are Θ(n²/k) — so the right k at a given
  * corpus size is an empirical crossover, and this main measures it
  * instead of guessing. Centroids are the corpus's first k vectors
  * (the oracle convention; training them with MLlib changes the
  * centroid QUALITY, not the probed plan costs).
  *
  * The corpus plants one near-dup per 5 ids (20% of rows), so the
  * reported kept-count doubles as a recall check: kept ≈ 0.8·n when
  * clustering places each planted pair together.
  *
  * Each k arg is `k` (uncapped semantics at the default cap) or
  * `k:cap` to probe a `maxClusterSize` lever setting — the salted
  * sub-split cap that bounds an oversized cluster's quadratic pair
  * stream.
  *
  * {{{ graft.VecProbe <dir> <threshold> <k[:cap]>... }}}
  *
  * `inc` mode probes [[IncrementalSemanticDedup]]'s delta-ingest cost
  * shape: the corpus index is WRITTEN partitioned by centroid_id (the
  * deployment layout), a cluster-CONCENTRATED batch (rows assigned to
  * the first `clusters` centroids, ids offset into fresh territory) is
  * deduped against it through [[IncrementalSemanticDedup.prunedIndex]],
  * and the probe reports the touched-index row count next to the wall —
  * the claim under test is that batch cost tracks the TOUCHED clusters'
  * index size (n/k per cluster), not the corpus size, because the
  * ≤ `clusters` distinct centroid ids prune the partitioned store.
  *
  * {{{ graft.VecProbe inc <dir> <threshold> <k> <clusters> <batchN> }}}
  */
object VecProbe {
  def incMain(args: Array[String]): Unit = {
    require(args.length == 5,
      "usage: VecProbe inc <dir> <threshold> <k> <clusters> <batchN>")
    val Array(dir, thresholdS, kS, clustersS, batchNS) = args
    val (threshold, k) = (thresholdS.toDouble, kS.toInt)
    val (clusters, batchN) = (clustersS.toInt, batchNS.toInt)
    val spark = GraftSession.local("graft-vecprobe-inc")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val cents = emb.filter(col("vec_id") < k)
      .select(col("vec_id").cast("int").as("centroid_id"),
        transform(col("embedding"), x => x.cast("double")).as("cvec"))
      .localCheckpoint()
    val inc = IncrementalSemanticDedup(threshold)
    val store = s"$dir/inc_index"
    inc.indexRows(emb, cents).write.mode("overwrite")
      .partitionBy("centroid_id").parquet(store)
    val index = spark.read.parquet(store)
    // concentrated batch: members of the first `clusters` clusters with
    // ids shifted into fresh territory — every row is an index near-dup
    // (cosine 1.0), so the probe times the expensive all-hits path
    val batch = index.filter(col("centroid_id") < clusters)
      .select((col("vec_id") + lit(1000000000L)).as("vec_id"), col("embedding"))
      .limit(batchN).localCheckpoint()
    val mx = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    System.gc()
    val t0 = System.nanoTime()
    val pruned = inc.prunedIndex(index, batch, cents).localCheckpoint()
    val survivors = inc.survivors(pruned, batch, cents).count()
    val sec = (System.nanoTime() - t0) / 1e9
    val touched = pruned.count()
    val total = index.count()
    println(f"inc_k${k}_c${clusters}_b$batchN,$sec%.1f,survivors=$survivors," +
      f"touched_rows=$touched,index_rows=$total,load=${mx.getSystemLoadAverage}%.1f")
    spark.stop()
  }

  /** `ivfserve` mode: the persisted-index amortization claim with
    * numbers — build the cells/centroids tables once over a 1M corpus
    * (timed), then serve `batches` query batches of `batchN` through
    * [[IvfIndex.searchIndexed]] vs the direct [[IvfIndex.topK]] (which
    * re-assigns the corpus per batch). The claim under test: per-batch
    * serve cost tracks the probed cells' size, direct cost tracks the
    * corpus.
    *
    * {{{ graft.VecProbe ivfserve <sfDir> <nCentroids> <buckets> <batchN> <batches> }}}
    * (`nCentroids` sizes the index's cell count; the search k itself is
    * fixed at 5, the registry key's value)
    */
  def ivfServeMain(args: Array[String]): Unit = {
    require(args.length == 5,
      "usage: VecProbe ivfserve <sfDir> <nCentroids> <buckets> <batchN> <batches>")
    val Array(dir, ncS, bS, batchNS, batchesS) = args
    val (nCentroids, buckets) = (ncS.toInt, bS.toInt)
    val (batchN, batches) = (batchNS.toInt, batchesS.toInt)
    val spark = GraftSession.local("graft-vecprobe-ivfserve")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // BOTH strategies start from stored tables (the deployment shape):
    // the direct path re-reads + re-assigns the stored corpus per
    // batch, the indexed path reads its probed slice of the cells table
    val corpusPath = java.nio.file.Files
      .createTempDirectory("ivfserve_corpus").toString
    ScaleProbe.vectors1m(spark, dir).repartition(cpus)
      .write.mode("overwrite").parquet(corpusPath)
    val emb = spark.read.parquet(corpusPath)
    println(s"CORPUS rows=${emb.count()}")
    val cents = emb.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").cast("int").as("centroid_id"),
        transform(col("embedding"), x => x.cast("double")).as("cvec"))
      .localCheckpoint(true)
    val ivf = IvfIndex()
    def wall[A](label: String)(f: => A): A = {
      System.gc()
      val t0 = System.nanoTime()
      val r = f
      println(f"IVFSERVE $label%-28s ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    wall("build_index")(
      ivf.buildIndex(emb, cents, "graft_ivf_probe", buckets))
    for (i <- 0 until batches) {
      val q = emb.filter(col("vec_id") % 9973 === i).limit(batchN)
        .localCheckpoint(true)
      val ids = q.select("vec_id")
      wall(s"serve_indexed_b$i")(
        ivf.searchIndexed(spark, "graft_ivf_probe", q, k = 5, nprobe = 2)
          .selectExpr("count(*)", "sum(cid)").collect())
      wall(s"direct_topk_b$i")(
        ivf.topK(emb, cents, k = 5, nprobe = 2,
          col("vec_id").isInCollection(
            ids.collect().map(_.getLong(0)).toSeq))
          .selectExpr("count(*)", "sum(cid)").collect())
    }
    spark.stop()
  }

  /** `refresh` mode: the segmented roll-forward claim with numbers —
    * for each corpus size n, build the IVF and BM25 indexes over n rows
    * (timed; O(corpus) by design), then roll each forward with a FIXED
    * `batchN`-row batch (timed). The claim under test (round-14 verdict
    * #1): refresh wall time is ∝ batch, ~flat across corpus sizes,
    * because a refresh writes one batch-sized segment + a manifest and
    * never reads or rewrites the corpus-sized artifact. A serve timing
    * after each roll checks the segment union doesn't regress queries,
    * and one compaction at the largest n prices the scheduled fold.
    *
    * {{{ graft.VecProbe refresh <sfDir> <batchN> <sizes...> }}}
    */
  def refreshMain(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: VecProbe refresh <sfDir> <batchN> <sizes...>")
    val dir = args(0)
    val batchN = args(1).toInt
    val sizes = args.drop(2).map(_.toInt).toSeq
    val spark = GraftSession.local("graft-vecprobe-refresh")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    def wall[A](label: String)(f: => A): A = {
      System.gc()
      val t0 = System.nanoTime()
      val r = f
      println(f"REFRESH $label%-34s ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    // materialize the largest corpus once; each size reads its prefix
    val vecPath = java.nio.file.Files
      .createTempDirectory("refresh_vec").toString
    ScaleProbe.vectors1m(spark, dir).repartition(cpus)
      .write.mode("overwrite").parquet(vecPath)
    val docPath = java.nio.file.Files
      .createTempDirectory("refresh_doc").toString
    ScaleProbe.docs1m(spark, dir).repartition(cpus)
      .write.mode("overwrite").parquet(docPath)
    val allVec = spark.read.parquet(vecPath)
    val allDoc = spark.read.parquet(docPath)
    val ivf = IvfIndex()
    val bm = graft.operators.text.Bm25()
    val cents = allVec.orderBy("vec_id").limit(1024)
      .select(col("vec_id").cast("int").as("centroid_id"),
        transform(col("embedding"), x => x.cast("double")).as("cvec"))
      .localCheckpoint(true)
    // fixed-size batches with ids in fresh territory (disjoint-id contract)
    val vecBatch = allVec.limit(batchN)
      .select((col("vec_id") + lit(2000000000L)).as("vec_id"),
        col("embedding")).localCheckpoint(true)
    val docBatch = allDoc.limit(batchN)
      .select((col("doc_id") + lit(2000000000L)).as("doc_id"), col("text"))
      .localCheckpoint(true)
    for (n <- sizes) {
      val vecs = allVec.limit(n).localCheckpoint(true)
      val docs = allDoc.limit(n).select("doc_id", "text").localCheckpoint(true)
      wall(s"ivf_build_n$n")(
        ivf.buildIndex(vecs, cents, s"graft_rfp_ivf_${n}_v0"))
      wall(s"ivf_refresh_n${n}_b$batchN")(
        ivf.refreshIndex(vecBatch, s"graft_rfp_ivf_${n}_v0",
          s"graft_rfp_ivf_${n}_v1"))
      val q = vecs.limit(100)
      wall(s"ivf_serve_n$n")(
        ivf.searchIndexed(spark, s"graft_rfp_ivf_${n}_v1", q,
          k = 5, nprobe = 2).selectExpr("count(*)").collect())
      wall(s"bm25_build_n$n")(
        bm.buildIndex(docs, s"graft_rfp_bm_${n}_v0", buckets = 32))
      wall(s"bm25_refresh_n${n}_b$batchN")(
        bm.refreshIndex(docBatch, s"graft_rfp_bm_${n}_v0",
          s"graft_rfp_bm_${n}_v1"))
      val queries = docs.limit(50)
        .select(col("doc_id").as("query_id"),
          substring(col("text"), 1, 40).as("text"))
      wall(s"bm25_serve_n$n")(
        bm.searchIndexed(spark, s"graft_rfp_bm_${n}_v1", queries, k = 5)
          .selectExpr("count(*)").collect())
    }
    val top = sizes.max
    wall(s"ivf_compact_n$top")(
      ivf.compactIndex(spark, s"graft_rfp_ivf_${top}_v1",
        s"graft_rfp_ivf_${top}_vz"))
    wall(s"bm25_compact_n$top")(
      bm.compactIndex(spark, s"graft_rfp_bm_${top}_v1",
        s"graft_rfp_bm_${top}_vz"))
    spark.stop()
  }

  /** `int8` mode: the B50×B8 quantized-segment claim measured — build
    * the float IVF index and the int8 one over the same n vectors,
    * report each cells table's ON-DISK bytes (the executor-memory/IO
    * story: codes ≈ 4× smaller than floats pre-compression) and the
    * serve walls of float-scan vs quantized-scan+exact-rerank on a
    * 100-query batch, asserting result parity in-probe.
    *
    * {{{ graft.VecProbe int8 <sfDir> <n> }}}
    */
  def int8Main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: VecProbe int8 <sfDir> <n>")
    val dir = args(0)
    val n = args(1).toInt
    val spark = GraftSession.local("graft-vecprobe-int8")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    def wall[A](label: String)(f: => A): A = {
      System.gc()
      val t0 = System.nanoTime()
      val r = f
      println(f"INT8 $label%-28s ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val vecs = ScaleProbe.vectors1m(spark, dir).limit(n)
      .repartition(cpus).localCheckpoint(true)
    val cents = vecs.orderBy("vec_id").limit(1024)
      .select(col("vec_id").cast("int").as("centroid_id"),
        transform(col("embedding"), x => x.cast("double")).as("cvec"))
      .localCheckpoint(true)
    val ivf = IvfIndex()
    wall(s"build_f32_n$n")(ivf.buildIndex(vecs, cents, "graft_q8p_f32", 32))
    wall(s"build_int8_n$n")(ivf.buildIndexInt8(vecs, cents, "graft_q8p_i8", 32))
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val fs = new org.apache.hadoop.fs.Path(wh)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def mb(t: String) = fs.getContentSummary(
      new org.apache.hadoop.fs.Path(s"$wh/$t")).getLength / 1048576.0
    println(f"INT8 cells_f32 ${mb("graft_q8p_f32_seg_cells")}%.1f MB  " +
      f"cells_int8 ${mb("graft_q8p_i8_seg_cells")}%.1f MB  " +
      f"vecs_cold ${mb("graft_q8p_i8_vecs")}%.1f MB  " +
      f"hot_ratio ${mb("graft_q8p_f32_seg_cells") / mb("graft_q8p_i8_seg_cells")}%.2f x")
    val q = vecs.limit(100).localCheckpoint(true)
    val a = wall(s"serve_f32_n$n")(
      ivf.searchIndexed(spark, "graft_q8p_f32", q, k = 5, nprobe = 2)
        .collect().toSet)
    val b = wall(s"serve_int8_n$n")(
      ivf.searchIndexedInt8(spark, "graft_q8p_i8", q, k = 5, nprobe = 2)
        .collect().toSet)
    println(s"INT8 parity ${a == b} (${a.size} rows)")
    spark.stop()
  }

  /** `rebuild` mode: price the SCHEDULED re-train the staleness trigger
    * gates (the other half of the refresh-is-O(batch) story: refreshes
    * stay cheap BECAUSE the occasional rebuild pays the corpus cost) —
    * build on n/2 rows, roll forward with a DRIFTED n/2 batch (a
    * dominant shared direction — the "new traffic clusters where the
    * build had little" signature, which concentrates the refresh into
    * a few cells and fires the growth trigger), then time
    * `needsRebuild` (the narrow per-cell monitor pass) and
    * `rebuildIndex` (population read-back + bounded Lloyd re-train +
    * fresh segmented build).
    *
    * {{{ graft.VecProbe rebuild <sfDir> <n> }}}
    */
  def rebuildMain(args: Array[String]): Unit = {
    require(args.length == 2, "usage: VecProbe rebuild <sfDir> <n>")
    val dir = args(0)
    val n = args(1).toInt
    val spark = GraftSession.local("graft-vecprobe-rebuild")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    def wall[A](label: String)(f: => A): A = {
      System.gc()
      val t0 = System.nanoTime()
      val r = f
      println(f"REBUILD $label%-34s ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val all = ScaleProbe.vectors1m(spark, dir).limit(n)
      .repartition(cpus).localCheckpoint(true)
    val half = all.filter(col("vec_id") % 2 === 0).localCheckpoint(true)
    val drifted = all.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === 0, lit(10.0f)).otherwise(x * lit(0.1f)))
          .as("embedding"))
      .localCheckpoint(true)
    val ivf = IvfIndex()
    val cents = half.orderBy("vec_id").limit(1024)
      .select(col("vec_id").cast("int").as("centroid_id"),
        transform(col("embedding"), x => x.cast("double")).as("cvec"))
      .localCheckpoint(true)
    wall(s"build_half_n$n")(
      ivf.buildIndex(half, cents, s"graft_rbp_v0"))
    wall(s"refresh_drifted_n$n")(
      ivf.refreshIndex(drifted, "graft_rbp_v0", "graft_rbp_v1"))
    val trips = wall("needs_rebuild_monitor")(
      ivf.needsRebuild(spark, "graft_rbp_v1"))
    println(s"REBUILD trigger_fires $trips")
    wall(s"rebuild_retrain_n$n")(
      ivf.rebuildIndex(spark, "graft_rbp_v1", "graft_rbp_v2", buckets = Some(64),
        // bounded Lloyd budget: 2 iterations move the centroids into
        // the merged distribution; more buys quality, not plan shape
        train = Some((pop, k) => KMeansOps.fit(pop, k, maxIter = 2))))
    println(s"REBUILD trigger_after ${ivf.needsRebuild(spark, "graft_rbp_v2")}")
    wall("serve_after_rebuild")(
      ivf.searchIndexed(spark, "graft_rbp_v2", all.limit(100), k = 5,
        nprobe = 2).selectExpr("count(*)").collect())
    spark.stop()
  }

  /** `hotcell` mode: the straggler case the two-level serve ranking
    * exists for — HALF the corpus is planted in ONE IVF cell (a dense
    * boilerplate-embedding cluster), and every query probes it. With a
    * single-level per-query `row_number` window, each query's window
    * partition holds the full hot-cell membership (n/2 rows) and the
    * serve stage tails on those sorts; the salted two-level
    * [[graft.operators.TopK.perGroup]] bounds every sort partition at
    * ~1/salts of that with byte-identical results. The probe builds the
    * index over the planted corpus, serves a query batch drawn from the
    * hot cell, and reports the serve wall + result checksum.
    *
    * {{{ graft.VecProbe hotcell <sfDir> <n> <batchN> }}}
    */
  def hotCellMain(args: Array[String]): Unit = {
    require(args.length == 3, "usage: VecProbe hotcell <sfDir> <n> <batchN>")
    val dir = args(0)
    val n = args(1).toInt
    val batchN = args(2).toInt
    val spark = GraftSession.local("graft-vecprobe-hotcell")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    def wall[A](label: String)(f: => A): A = {
      System.gc()
      val t0 = System.nanoTime()
      val r = f
      println(f"HOTCELL $label%-28s ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val base = ScaleProbe.vectors1m(spark, dir).limit(n)
    // even ids: the hot cluster — one shared direction plus a tiny
    // deterministic per-id wiggle (distinct vectors, same nearest
    // centroid); odd ids keep their natural spread
    val planted = base.select(col("vec_id"),
        when(col("vec_id") % 2 === 0,
          transform(col("embedding"), (x, i) =>
            when(i === 0, lit(100.0f) +
              (pmod(col("vec_id"), lit(997L)).cast("float") / lit(1000.0f)))
              .otherwise(x * lit(0.001f))))
          .otherwise(col("embedding")).as("embedding"))
      .repartition(cpus).localCheckpoint(true)
    val cents = planted.orderBy("vec_id").limit(256)
      .select(col("vec_id").cast("int").as("centroid_id"),
        transform(col("embedding"), x => x.cast("double")).as("cvec"))
      .localCheckpoint(true)
    val ivf = IvfIndex()
    wall(s"build_n$n")(ivf.buildIndex(planted, cents, "graft_hcp", 32))
    val hotCount = spark.table("graft_hcp_seg_cells")
      .groupBy("centroid_id").count().orderBy(col("count").desc).head()
    println(s"HOTCELL hottest_cell=${hotCount.get(0)} rows=${hotCount.get(1)} of $n")
    val q = planted.filter(col("vec_id") % 2 === 0).limit(batchN)
      .localCheckpoint(true)
    val res = wall(s"serve_hot_n${n}_b$batchN")(
      ivf.searchIndexed(spark, "graft_hcp", q, k = 5, nprobe = 2)
        .selectExpr("count(*)", "sum(cid)", "round(sum(cos),4)").head())
    println(s"HOTCELL result rows=${res.get(0)} sum_cid=${res.get(1)} sum_cos=${res.get(2)}")
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("hotcell")) return hotCellMain(args.drop(1))
    if (args.headOption.contains("inc")) return incMain(args.drop(1))
    if (args.headOption.contains("ivfserve")) return ivfServeMain(args.drop(1))
    if (args.headOption.contains("refresh")) return refreshMain(args.drop(1))
    if (args.headOption.contains("rebuild")) return rebuildMain(args.drop(1))
    if (args.headOption.contains("int8")) return int8Main(args.drop(1))
    require(args.length >= 3, "usage: VecProbe <dir> <threshold> <k[:cap]>...")
    val dir = args(0)
    val threshold = args(1).toDouble
    val ks = args.drop(2).map { a =>
      a.split(":") match {
        case Array(k) => (k.toInt, 1 << 16)
        case Array(k, cap) => (k.toInt, cap.toInt)
      }
    }.toSeq
    val spark = GraftSession.local("graft-vecprobe")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    emb.selectExpr("max(vec_id)").collect() // warm the scan path
    def timed(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      System.gc()
      val t0 = System.nanoTime()
      val rows = df.queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val mx = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      println(f"$label,$sec%.1f,$rows,load=${mx.getSystemLoadAverage}%.1f")
    }
    ks.foreach { case (k, cap) =>
      val cents = emb.filter(col("vec_id") < k)
        .select(col("vec_id").cast("int").as("centroid_id"),
          transform(col("embedding"), x => x.cast("double")).as("cvec"))
      timed(s"assign_k$k")(IvfIndex().assign(emb, cents))
      timed(s"semdedup_k${k}_cap$cap")(
        SemanticDedup(threshold, maxClusterSize = cap).kept(emb, cents))
    }
    spark.stop()
  }
}
