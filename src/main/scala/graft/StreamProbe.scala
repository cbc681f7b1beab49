package graft

import graft.pipeline.{OperatorRegistry, Pipeline}
import graft.streaming.{StreamingCuration, StreamingMetricsListener, StreamingOps}
import org.apache.spark.sql.functions._

/** Per-micro-batch cost shape of the CONTINUOUS curation capstone
  * (SURVEY §2 B64) at scale — the claim under test: with the r15
  * segmented indexes, NOTHING in the always-on loop is
  * corpus-proportional, so per-batch wall stays ~flat as the ingested
  * corpus (and the dedup state, and the index) grow batch over batch.
  * What grows, and how it is paid, is exactly what the probe reports:
  *
  *  - band-digest/content-hash STATE grows with the ingested corpus,
  *    but per-batch state-store work is O(updates) (HDFS-backed store:
  *    one delta file per batch; snapshots fold in the background
  *    maintenance thread);
  *  - the BM25 index roll appends ONE batch-sized segment per batch
  *    (the r14 design paid a full index rewrite per micro-batch), with
  *    the compact hook folding every `compactEvery` batches — the fold
  *    is the scheduled O(index) cost, visible as a periodic bump on
  *    exactly the fold batches.
  *
  * Stages a [[ScaleProbe.docs1m]] corpus as `batches` id-ranged files
  * (ascending mtimes, one per trigger), builds the BM25 base over the
  * first file's range, streams the rest through the per-doc chain +
  * one-layer streaming dedup + idempotent sink + index roll, and
  * prints the engine's own per-batch walls
  * ([[StreamingMetricsListener]]).
  *
  * {{{ graft.StreamProbe <sfDir> <n> <batches> [compactEvery] [width] }}}
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: StreamProbe <sfDir> <n> <batches> [compactEvery]")
    val dir = args(0)
    val n = args(1).toInt
    val nb = args(2).toInt
    val every = if (args.length > 3) args(3).toInt else 8
    // the stateful-operator width binds at query start and is THE
    // horizontal-scale knob for the streaming chain: every stateful
    // stage (band-digest drop, window agg, hash branch) runs `width`
    // tasks, and state partitions across executors at that width
    val width = if (args.length > 4) args(4).toInt else 8
    val spark = GraftSession.local("graft-streamprobe")
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.shuffle.partitions", width.toString)
    import org.apache.hadoop.fs.Path
    val tmp = java.nio.file.Files.createTempDirectory("graft_sp").toString
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tmp), spark.sparkContext.hadoopConfiguration)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val docs = ScaleProbe.docs1m(spark, dir).limit(n)
      .select(col("doc_id").as("src_id"), col("text"))
      // docs1m ids are offset-replicated (sparse); re-key densely so
      // id-ranged files slice evenly — order preserved, so keep-first
      // winners are the same docs (one-time probe staging cost)
      .withColumn("doc_id", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("src_id"))
        .cast("long") - 1L)
      .select(col("doc_id"), col("text"))
      // id-derived event time, spread ≪ watermark: no mid-run eviction
      .withColumn("ts",
        timestamp_seconds(lit(1700000000L) + col("doc_id") % 86400))
      .repartition(cpus).localCheckpoint(true)
    val step = n / nb + 1
    val srcDir = s"$tmp/src"
    fs.mkdirs(new Path(srcDir))
    def slice(i: Int) = docs
      .filter(col("doc_id") >= i.toLong * step && col("doc_id") < (i + 1).toLong * step)
    // batch 0 seeds the base index; files 1..nb-1 stream one per
    // trigger. ONE partitioned write stages every slice in parallel
    // (a per-slice coalesce(1) loop re-scans the corpus nb times,
    // single-threaded — 20+ min at 1M); repartitioning BY the slice id
    // puts each slice in exactly one task, so each `part=i` dir holds
    // exactly one file to rename into mtime order.
    val stage = s"$tmp/stage"
    docs.filter(col("doc_id") >= step) // slices 1..nb-1
      .withColumn("part", (col("doc_id") / step).cast("int"))
      .repartition(col("part"))
      .write.mode("overwrite").partitionBy("part").parquet(stage)
    for (i <- 1 until nb) {
      val pdir = new Path(s"$stage/part=$i")
      val f = fs.listStatus(pdir).map(_.getPath)
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new Path(srcDir, f"part$i%04d.parquet")
      fs.rename(f, dst)
      fs.setTimes(dst, 1700000000000L + i * 60000L, -1)
    }
    val bm = graft.operators.text.Bm25()
    val t0 = System.nanoTime()
    bm.buildIndex(slice(0).select("doc_id", "text"), "graft_sp_bm_v0",
      buckets = 8)
    println(f"STREAMPROBE base_build ${(System.nanoTime() - t0) / 1e9}%.1f s (${step} docs)")
    StreamingOps.clearIndexLog(spark, "graft_sp_bm")
    val perDoc = Pipeline(Seq(OperatorRegistry.build("text_length_filter",
      Map[String, Any]("min_length" -> 50, "max_length" -> 100000))))
    val sc = StreamingCuration(perDoc, lsh = graft.operators.dedup.MinHashLSH(),
      watermark = "30 days")
    val listener = new StreamingMetricsListener
    spark.streams.addListener(listener)
    val schema = spark.read.parquet(srcDir).schema
    val in = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    val (q, live) = sc.start(in, s"$tmp/out", s"$tmp/ckpt",
      index = Some(("graft_sp_bm", "graft_sp_bm_v0",
        (b: org.apache.spark.sql.DataFrame, from: String, to: String) =>
          bm.refreshIndex(b.select("doc_id", "text"), from, to))),
      compact = Some((every,
        (from: String, to: String) => bm.compactIndex(spark, from, to))))
    val t1 = System.nanoTime()
    try q.processAllAvailable() finally q.stop()
    println(f"STREAMPROBE stream_total ${(System.nanoTime() - t1) / 1e9}%.1f s (${nb - 1} batches)")
    listener.batches.sortBy(_.batchId).foreach { b =>
      val fold = if ((b.batchId + 1) % every == 0) " [fold]" else ""
      println(f"STREAMPROBE batch ${b.batchId}%3d ${b.inputRows}%8d rows ${b.batchMs / 1000.0}%7.1f s$fold")
    }
    val out = spark.read.parquet(s"$tmp/out")
    println(s"STREAMPROBE survivors ${out.count()} of $n  final_index ${live.map(_.get)}")
    spark.stop()
  }
}
