package graft

import graft.pipeline.{MultimodalCapstone, MultimodalRecrawlOps}
import graft.queries.MultimodalQueries
import graft.streaming.{StreamingMultimodal, StreamingOps}
import org.apache.spark.sql.functions._

/** The continuous multimodal loop (B64 ∘ B59/B63): streamed micro-batch
  * curation with persisted signature indexes must converge to the batch
  * capstone, its signature state must equal the batch day-1 build's,
  * and the per-batch ANN roll must equal a from-scratch index over the
  * converged survivors. */
class StreamingMultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("streamed multimodal == batch capstone; indexes and IVF roll converge") {
    import org.apache.hadoop.fs.Path
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val inp = MultimodalQueries.preppedInput(docs).localCheckpoint()
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_smm_spec").toString
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tmp), spark.sparkContext.hadoopConfiguration)
    val srcDir = s"$tmp/src"
    fs.mkdirs(new Path(srcDir))
    for (i <- 0 until 4) {
      val part = inp.filter(
        col("doc_id") >= i * 1000000L && col("doc_id") < (i + 1) * 1000000L)
      val stage = s"$tmp/stage$i"
      part.coalesce(1).write.mode("overwrite").parquet(stage)
      val f = fs.listStatus(new Path(stage)).map(_.getPath)
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new Path(srcDir, f"part$i%04d.parquet")
      fs.rename(f, dst)
      fs.setTimes(dst, 1700000000000L + i * 60000L, -1)
    }
    val schema = spark.read.parquet(srcDir).schema
    val in = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    val ivf = graft.operators.vector.IvfIndex()
    val base = "graft_smm_spec_ivf"
    StreamingOps.clearIndexLog(spark, base)
    val centroids = (0 until 4).map { a =>
      (a, Array.tabulate(8)(j => if (j == a) 1.0 else 0.0))
    }.toDF("centroid_id", "cvec")
    ivf.buildIndex(spark.range(0).select(col("id").as("vec_id"),
        lit(null).cast("array<float>").as("embedding")),
      centroids, s"${base}_v0", buckets = 4)
    def embOf(df: org.apache.spark.sql.DataFrame) =
      graft.operators.ml.TrainedEmbedding(df)
        .select(col("doc_id").as("vec_id"), col("embedding"))
    val sm = StreamingMultimodal(s"$tmp/state")
    // compactEvery = 2: every probe-equality assertion below runs
    // ACROSS signature folds, not just across plain batch partitions
    val (q, live) = sm.start(in, s"$tmp/out", s"$tmp/ckpt",
      index = Some((base, s"${base}_v0",
        (b, from, to) => ivf.refreshIndex(b, from, to))),
      project = embOf, compactEvery = 2)
    try q.processAllAvailable() finally q.stop()

    // the fold bounded the state partition count: 4 batches wrote 4
    // partitions per index; the id=2 fold collapsed {0,1}
    for (d <- Seq("phash", "audio", "video")) {
      val parts = fs.listStatus(new Path(s"$tmp/state/$d"))
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      assert(parts.length <= 3, s"$d: ${parts.map(_.getPath.getName).toSeq}")
    }

    // 1. converged survivors == the batch capstone over the whole corpus
    val streamed = spark.read.parquet(s"$tmp/out")
      .select("doc_id").as[Long].collect().toSet
    val batch = MultimodalCapstone.pipeline(inp)
      .select("doc_id").as[Long].collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
    // every planted family collides CROSS-batch: each twin range lost
    // members to an index probe, not only to intra-batch keep-first
    for (off <- Seq(1000000L, 2000000L, 3000000L)) {
      val fed = inp.filter(col("doc_id") >= off && col("doc_id") < off + 1000000L).count()
      val kept = streamed.count(id => id >= off && id < off + 1000000L)
      assert(kept < fed, s"family at +$off never collided through the index")
    }

    // 2. signature state == the batch day-1 build's reaching indexes
    val init = MultimodalRecrawlOps.init(inp)
    assert(spark.read.parquet(s"$tmp/state/phash").select("phash")
      .as[Long].collect().toSet ==
      init.phashIndex.as[Long].collect().toSet)
    assert(spark.read.parquet(s"$tmp/state/audio").select("audio_fp")
      .as[Long].collect().toSet ==
      init.audioIndex.as[Long].collect().toSet)
    assert(spark.read.parquet(s"$tmp/state/video")
      .select("doc_id", "frame_idx", "frame_hash")
      .as[(Long, Int, Long)].collect().toSet ==
      init.videoIndex.as[(Long, Int, Long)].collect().toSet)

    // 3. the rolled ANN index == a from-scratch build over the
    // converged survivors (same frozen centroids)
    assert(live.get.get == s"${base}_v4")
    val survRows = spark.read.parquet(s"$tmp/out")
    ivf.buildIndex(embOf(survRows), centroids, s"${base}_full", buckets = 4)
    def cells(name: String) =
      ivf.segments(spark, name).map { case (s0, _) =>
        spark.table(s"${s0}_cells") }.reduce(_ unionByName _)
        .select("vec_id", "centroid_id").as[(Long, Int)].collect().toSet
    assert(cells(live.get.get) == cells(s"${base}_full"))
  }

  private def smallInput() = {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    MultimodalQueries.preppedInput(docs).limit(60).localCheckpoint()
  }

  private def stageSource(tmp: String,
      inp: org.apache.spark.sql.DataFrame): String = {
    val srcDir = s"$tmp/src"
    inp.coalesce(1).write.mode("overwrite").parquet(srcDir)
    srcDir
  }

  test("a corrupt signature-index file FAILS the micro-batch — " +
      "never a silent empty-index probe that admits duplicates") {
    import org.apache.hadoop.fs.Path
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_smm_corrupt").toString
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tmp), spark.sparkContext.hadoopConfiguration)
    val srcDir = stageSource(tmp, smallInput())
    // a READABLE dir holding a garbage parquet footer where the phash
    // index lives — a corruption/transient-IO scenario, NOT the
    // committer residue (the dir HAS a non-empty data file). Pre-r17
    // the blanket Try(...).getOrElse(empty) read this as "no index",
    // silently admitting every cross-batch duplicate.
    fs.mkdirs(new Path(s"$tmp/state/phash/batch=0"))
    val bad = fs.create(new Path(s"$tmp/state/phash/batch=0/part-00000.parquet"), true)
    bad.write("definitely not a parquet footer".getBytes("UTF-8"))
    bad.close()
    val schema = spark.read.parquet(srcDir).schema
    val in = spark.readStream.schema(schema).parquet(srcDir)
    val sm = StreamingMultimodal(s"$tmp/state")
    val (q, _) = sm.start(in, s"$tmp/out", s"$tmp/ckpt")
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q.processAllAvailable()
      finally q.stop()
    }
    // the failed batch committed NOTHING (a retry will re-run it)
    assert(!fs.exists(new Path(s"$tmp/out/batch=0")))
  }

  test("foldBatchPartitions: identical row set, fewer partitions, torn fold heals") {
    import org.apache.hadoop.fs.Path
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_smm_fold").toString
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tmp), spark.sparkContext.hadoopConfiguration)
    val dir = s"$tmp/phash"
    for (i <- 0 until 3)
      spark.range(i * 10, i * 10 + 10).select(col("id").as("phash"))
        .coalesce(1).write.parquet(s"$dir/batch=$i")
    def rowSet = spark.read.parquet(dir).select("phash")
      .as[Long].collect().toSet
    val before = rowSet
    // fold below the "running" batch id 2: {0,1} -> batch=1; batch=2 stays
    assert(StreamingOps.foldBatchPartitions(spark, dir, 2L) == 1)
    def parts = fs.listStatus(new Path(dir))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .map(_.getPath.getName).toSet
    assert(parts == Set("batch=1", "batch=2"))
    assert(rowSet == before) // probe-equality across the fold
    // and the consolidated value stays NUMERIC and below future ids:
    // a probe at id=2 sees exactly batches {0,1}
    assert(spark.read.parquet(dir).filter(col("batch") < 2)
      .select("phash").as[Long].collect().toSet == (0L until 20L).toSet)
    // torn fold: a crash between swapIn's renames leaves batch=N__old
    // as the sole copy; the next fold (and readIndex) heals it
    fs.rename(new Path(s"$dir/batch=1"), new Path(s"$dir/batch=1__old"))
    assert(StreamingOps.foldBatchPartitions(spark, dir, 3L) == 1)
    assert(parts == Set("batch=2"))
    assert(rowSet == before)
  }

  test("first-batch committer residue (dir, no data files) still reads as empty") {
    import org.apache.hadoop.fs.Path
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_smm_residue").toString
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tmp), spark.sparkContext.hadoopConfiguration)
    val srcDir = stageSource(tmp, smallInput())
    // what a kill during the very first batch's index write leaves:
    // the dir exists, a _temporary committer dir and a zero-length
    // part file exist, but nothing was committed
    fs.mkdirs(new Path(s"$tmp/state/phash/_temporary/0"))
    fs.create(new Path(s"$tmp/state/phash/part-empty.parquet"), true).close()
    fs.mkdirs(new Path(s"$tmp/state/audio"))
    val schema = spark.read.parquet(srcDir).schema
    val in = spark.readStream.schema(schema).parquet(srcDir)
    val sm = StreamingMultimodal(s"$tmp/state")
    val (q, _) = sm.start(in, s"$tmp/out", s"$tmp/ckpt")
    try q.processAllAvailable() finally q.stop()
    assert(spark.read.parquet(s"$tmp/out").count() > 0)
  }
}
