package graft

import graft.streaming.{StreamingMetricsListener, StreamingMultimodal, StreamingOps}
import org.apache.spark.sql.functions._

/** Per-micro-batch cost shape of the CONTINUOUS MULTIMODAL loop
  * ([[graft.streaming.StreamingMultimodal]] — B64 ∘ B59/B63) at scale.
  * The claim under test: per-batch wall stays ~flat as the ingested
  * corpus grows, because each batch pays (a) the capstone chain over
  * the BATCH alone (per-doc content stages + batch-internal dedup),
  * (b) three signature-index probes that scan the narrow accumulated
  * hash tables (growing, but a few bytes/doc — the banded equi-join
  * broadcasts the batch side, so the index side is a map-only scan,
  * never a shuffle), and (c) one batch-sized IVF segment append (the
  * r15 segmented-index O(batch) contract). Nothing re-decodes old
  * media; the only corpus-proportional term is the narrow hash scan.
  *
  * {{{ graft.MmStreamProbe <sfDir> <n> <batches> [width] [compactEvery] [skew] }}}
  *
  * `compactEvery` folds the signature state's `batch=` partitions on
  * that schedule (default 4, 0 disables); `skew` floods that fraction
  * of every batch with one byte-identical payload (the adversarial
  * ubiquitous-frame case — per-batch walls must stay in the flat band).
  */
object MmStreamProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: MmStreamProbe <sfDir> <n> <batches>")
    val dir = args(0)
    val n = args(1).toInt
    val nb = args(2).toInt
    val width = if (args.length > 3) args(3).toInt else 8
    val spark = GraftSession.local("graft-mmstreamprobe")
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.shuffle.partitions", width.toString)
    import org.apache.hadoop.fs.Path
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_mmsp").toString
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tmp), spark.sparkContext.hadoopConfiguration)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // dense re-key (the StreamProbe staging discipline) + the
    // multimodal input shape; duplicate-heavy by construction (docs1m
    // replicates 20× per group), so the signature indexes absorb ~95%
    // adversarial skew (arg 6, fraction in [0,1)): that share of EVERY
    // batch collides into one byte-identical media payload — the
    // ubiquitous-frame / identical-hash flood. The claim under test:
    // the per-batch exact-collapse-first discipline caps the skew key
    // before any banded join, so the flooded batch stays in the flat
    // wall band instead of dragging one hash family into one task.
    val skewPct = (if (args.length > 5) args(5).toDouble else 0.0) * 100.0
    val docs = ScaleProbe.docs1m(spark, dir).limit(n)
      .select(col("doc_id").as("src_id"), col("source"), col("text"))
      .withColumn("doc_id", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("src_id"))
        .cast("long") - 1L)
      .withColumn("text",
        when(pmod(col("doc_id"), lit(100)) < lit(skewPct),
          lit("UBIQUITOUS FRAME the one payload every crawler sees " * 4))
          .otherwise(col("text")))
      .select(col("doc_id"), col("source"), col("text"),
        col("text").as("video_src"))
      .repartition(cpus).localCheckpoint(true)
    val step = n / nb + 1
    val srcDir = s"$tmp/src"
    fs.mkdirs(new Path(srcDir))
    val stage = s"$tmp/stage"
    docs.withColumn("part", (col("doc_id") / step).cast("int"))
      .repartition(col("part"))
      .write.mode("overwrite").partitionBy("part").parquet(stage)
    // step = n/nb + 1 can leave high-numbered parts empty when n is
    // small relative to nb — stage only the partitions that exist
    for (i <- 0 until nb if fs.exists(new Path(s"$stage/part=$i"))) {
      val pdir = new Path(s"$stage/part=$i")
      val f = fs.listStatus(pdir).map(_.getPath)
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new Path(srcDir, f"part$i%04d.parquet")
      fs.rename(f, dst)
      fs.setTimes(dst, 1700000000000L + i * 60000L, -1)
    }
    val ivf = graft.operators.vector.IvfIndex()
    StreamingOps.clearIndexLog(spark, "graft_mmsp_ivf")
    val centroids = (0 until 8).map { a =>
      (a, Array.tabulate(8)(j => if (j == a) 1.0 else 0.0))
    }.toDF("centroid_id", "cvec")
    ivf.buildIndex(spark.range(0).select(col("id").as("vec_id"),
        lit(null).cast("array<float>").as("embedding")),
      centroids, "graft_mmsp_ivf_v0", buckets = 8)
    val listener = new StreamingMetricsListener
    spark.streams.addListener(listener)
    val schema = spark.read.parquet(srcDir).schema
    val in = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    // signature-state fold every 4 batches (arg 5; 0 disables): the
    // always-on loop must BOUND its per-index partition count, not
    // grow one tiny dir per micro-batch forever
    val compactEvery = if (args.length > 4) args(4).toInt else 4
    val sm = StreamingMultimodal(s"$tmp/state")
    val (q, live) = sm.start(in, s"$tmp/out", s"$tmp/ckpt",
      index = Some(("graft_mmsp_ivf", "graft_mmsp_ivf_v0",
        (b: org.apache.spark.sql.DataFrame, from: String, to: String) =>
          ivf.refreshIndex(b, from, to))),
      project = surv => graft.operators.ml.TrainedEmbedding(surv)
        .select(col("doc_id").as("vec_id"), col("embedding")),
      compactEvery = compactEvery)
    val t1 = System.nanoTime()
    try q.processAllAvailable() finally q.stop()
    println(f"MMSTREAMPROBE stream_total ${(System.nanoTime() - t1) / 1e9}%.1f s ($nb batches, skew ${skewPct / 100.0}%.2f)")
    listener.batches.sortBy(_.batchId).foreach { b =>
      println(f"MMSTREAMPROBE batch ${b.batchId}%3d ${b.inputRows}%8d rows ${b.batchMs / 1000.0}%7.1f s")
    }
    val out = spark.read.parquet(s"$tmp/out")
    println(s"MMSTREAMPROBE survivors ${out.count()} of $n  final_index ${live.map(_.get)}")
    for (d <- Seq("phash", "audio", "video")) {
      val parts = fs.listStatus(new Path(s"$tmp/state/$d"))
        .count(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      println(s"MMSTREAMPROBE state_partitions $d $parts (of $nb batches, compact_every=$compactEvery)")
    }
    spark.stop()
  }
}
