package graft

import graft.pipeline.{MetricsSink, PipelineConfig}

/** CLI entry point — the counterpart of the reference's `cli.py` +
  * `scripts/generate_metrics_report.py`: run a full YAML job
  * (data_loader → stages → data_writer) and print the funnel report,
  * or profile it per-operator. `--metrics-path` persists the run to the
  * reference-style parquet tables (runs/, stages/) plus a
  * self-contained HTML funnel report ([[graft.pipeline.MetricsSink]]).
  *
  * {{{
  * graft.Main run pipeline.yaml                     # fused run + funnel report
  * graft.Main run pipeline.yaml --no-report         # skip the funnel instrumentation
  * graft.Main run pipeline.yaml --metrics-path m/   # + persist metrics & report
  * graft.Main profile pipeline.yaml [--metrics-path m/]  # per-op wall + rec/s
  * graft.Main index-build <docs.parquet> <index-dir>     # build the near-dup index
  * graft.Main ingest <batch.parquet> <index-dir> <out>   # delta dedup + roll index
  * graft.Main compact-index <index-dir>                  # fold committed batch= dirs
  * graft.Main load-shards <globs> <state> <out>          # resumable bulk load
  * }}}
  *
  * `index-build`/`ingest` implement the daily-ingest loop around
  * [[graft.operators.dedup.IncrementalMinHashDedup]]: build the narrow
  * (doc_id, band, bucket) corpus index once, then each ingest dedups a
  * new batch against it (corpus text never re-read), writes survivors,
  * and commits their bucket rows as an atomic `batch=<id>` partition so
  * the next ingest sees them (crash → just re-run; see [[runIngest]]).
  * Both accept `--num-hashes --bands --shingle-size --text-field
  * --id-field` (must match between the index build and every subsequent
  * ingest); `ingest` also accepts `--batch-id`.
  */
object Main {

  private def lshFromArgs(args: Array[String]): graft.operators.dedup.MinHashLSH = {
    def opt(name: String, default: String): String =
      args.indexOf(name) match {
        case i if i >= 0 && i + 1 < args.length => args(i + 1)
        case _ => default
      }
    graft.operators.dedup.MinHashLSH(
      numHashes = opt("--num-hashes", "12").toInt,
      bands = opt("--bands", "4").toInt,
      shingleSize = opt("--shingle-size", "3").toInt,
      textCol = opt("--text-field", "text"),
      idCol = opt("--id-field", "doc_id"))
  }

  /** Build the persisted band-bucket index for a curated corpus. The
    * index is laid out as `batch=<id>/band=<b>/` partitions so every
    * later [[runIngest]] commits its rows as ONE directory rename. */
  def runIndexBuild(spark: org.apache.spark.sql.SparkSession,
      docsPath: String, indexPath: String, args: Array[String]): Unit = {
    val lsh = lshFromArgs(args)
    lsh.buckets(spark.read.parquet(docsPath))
      .withColumn("batch", org.apache.spark.sql.functions.lit("base"))
      .write.mode("overwrite").partitionBy("batch", "band").parquet(indexPath)
    println(s"[graft] index written to $indexPath (batch=base)")
  }

  /** Batch ids become partition directory names (`batch=<id>`) and a
    * partition-value equality filter; restricting them to a charset
    * Spark never percent-escapes keeps the path and the filter agreeing
    * on the same string. `base` is reserved for the index build. */
  private[graft] def validateBatchId(id: String): String = {
    require(id.matches("[A-Za-z0-9._-]+"),
      s"--batch-id '$id' invalid: allowed characters are [A-Za-z0-9._-] " +
        "(the id becomes a partition directory name and an exclusion filter; " +
        "'/', '=', '%' or other escaped characters would break the round-trip)")
    require(id != "base", "--batch-id 'base' is reserved for index-build")
    id
  }

  /** A pre-batch index (written by an older index-build) has `band=<b>`
    * dirs at the TOP level; mixing that with `batch=<id>/band=<b>`
    * commits puts leaf files at two partition depths and Spark's
    * partition discovery throws "Conflicting directory structures".
    * Migrate in place — rename each top-level `band=<b>` under
    * `batch=base/` — before the first per-batch commit. Renames are
    * idempotent (a crash mid-migration just leaves fewer dirs to move
    * on the re-run). Per-directory, not transactional: migrate while
    * no concurrent readers or ingests are active — a reader racing the
    * migration can see the conflicting-depth layout it exists to fix. */
  private[graft] def migrateFlatIndex(
      fs: org.apache.hadoop.fs.FileSystem,
      indexPath: org.apache.hadoop.fs.Path): Unit = {
    // let the subsequent spark.read.parquet surface the user-facing
    // "path does not exist" error instead of a raw FileNotFoundException
    if (!fs.exists(indexPath)) return
    val entries = fs.listStatus(indexPath)
    val flatBands = entries.filter(e =>
      e.isDirectory && e.getPath.getName.startsWith("band="))
    if (flatBands.isEmpty) return
    val base = new org.apache.hadoop.fs.Path(indexPath, "batch=base")
    fs.mkdirs(base)
    flatBands.foreach { e =>
      val target = new org.apache.hadoop.fs.Path(base, e.getPath.getName)
      // HDFS rename into an EXISTING directory nests the source INSIDE
      // it (batch=base/band=N/band=N) instead of failing — which a
      // crashed prior migration or a racing ingest can set up. Fail
      // loudly rather than corrupt the layout silently; if the move
      // already completed, the source dir is gone and we never get here.
      if (fs.exists(target))
        throw new java.io.IOException(
          s"flat-index migration target already exists: $target " +
            "(crashed prior migration or concurrent ingest?); " +
            "remove or reconcile it manually before re-running")
      if (!fs.rename(e.getPath, target))
        throw new java.io.IOException(
          s"flat-index migration failed: ${e.getPath} -> $target")
    }
    // the old flat write's _SUCCESS marker is top-level noise now
    fs.delete(new org.apache.hadoop.fs.Path(indexPath, "_SUCCESS"), false)
    println(s"[graft] migrated flat index layout to $base " +
      s"(${flatBands.length} band partitions)")
  }

  /** Dedup a batch against the index, write survivors, roll the index.
    *
    * Crash-safe and idempotent per batch id (default: md5 of the batch
    * path; override with `--batch-id` when re-ingesting a path with new
    * content). The batch's index rows are staged under an
    * underscore-prefixed directory (invisible to parquet reads) and
    * committed by a single rename to `batch=<id>/`; the index read
    * EXCLUDES rows of the current batch id, so a re-run after any crash
    * recomputes the identical survivor set instead of re-rejecting its
    * own survivors or double-appending bucket rows. Failure anywhere →
    * re-run the same command; there is no partial state to clean up.
    *
    * Storage assumption: the commit rename is atomic on HDFS and local
    * filesystems. On object stores (S3A) rename is copy+delete, so a
    * crash mid-commit can leave a PARTIAL `batch=<id>` partition visible
    * to concurrent readers until the re-run replaces it — re-run
    * idempotence still holds (the re-run excludes and deletes the
    * partial partition), but readers racing an in-flight ingest should
    * check the `_batch_committed_<id>` marker this commit writes last,
    * or front the index with the snapshot-log pointer flip that
    * [[graft.sources.Sinks]] table commits use. */
  def runIngest(spark: org.apache.spark.sql.SparkSession, batchPath: String,
      indexPath: String, outPath: String, args: Array[String]): Unit = {
    import org.apache.spark.sql.functions.col
    val lsh = lshFromArgs(args)
    val batchId = args.indexOf("--batch-id") match {
      case i if i >= 0 && i + 1 < args.length => validateBatchId(args(i + 1))
      case _ => graft.operators.vector.DeterministicPlanes.md5Hex(batchPath).take(12)
    }
    val conf = spark.sparkContext.hadoopConfiguration
    val indexP = new org.apache.hadoop.fs.Path(indexPath)
    val fs = indexP.getFileSystem(conf)
    // a pre-batch flat layout must move under batch=base/ BEFORE this
    // batch commits, or partition discovery breaks on the next read
    migrateFlatIndex(fs, indexP)
    val batch = spark.read.parquet(batchPath)
    val raw = spark.read.parquet(indexPath)
    val index = // ignore rows a previous half-finished run of THIS batch committed
      if (raw.columns.contains("batch")) raw.filter(col("batch") =!= batchId)
      else raw // single-depth pre-batch layout (nothing to migrate yet)
    // materialize survivors before touching the index we just read
    val survivors = graft.operators.dedup.IncrementalMinHashDedup(lsh)
      .survivors(index, batch).localCheckpoint()
    val nIn = batch.count()
    val nOut = survivors.count()
    survivors.write.mode("overwrite").parquet(outPath)
    // stage, then one rename is the commit (atomic on HDFS/local; see
    // the storage assumption in the scaladoc for object stores)
    val staging = s"$indexPath/_staging_$batchId"
    lsh.buckets(survivors).write.mode("overwrite").partitionBy("band").parquet(staging)
    val stagingP = new org.apache.hadoop.fs.Path(staging)
    val target = new org.apache.hadoop.fs.Path(s"$indexPath/batch=$batchId")
    val marker = new org.apache.hadoop.fs.Path(indexPath, s"_batch_committed_$batchId")
    fs.delete(marker, false) // a re-run invalidates the old commit first
    if (fs.exists(target)) fs.delete(target, true) // idempotent re-run replaces
    // the staged dir carries Spark's _SUCCESS marker; drop it so the
    // committed partition holds only data files
    fs.delete(new org.apache.hadoop.fs.Path(staging, "_SUCCESS"), false)
    if (!fs.rename(stagingP, target))
      throw new java.io.IOException(s"commit rename failed: $staging -> $target")
    // written LAST: on copy+delete-rename stores, readers that require
    // this marker never observe a half-copied batch partition
    fs.create(marker, true).close()
    println(s"[graft] ingest: $nIn in, $nOut kept (${nIn - nOut} near-dups); " +
      s"survivors -> $outPath, index committed as batch=$batchId")
  }

  /** Index lifecycle compaction: fold every COMMITTED `batch=<id>`
    * partition (plus `batch=base`) into one consolidated
    * `batch=c<digest>` partition. Daily [[runIngest]] commits append a
    * directory per batch forever; past a few hundred batches the
    * partition listing itself becomes the index-read cost, and each
    * probe job plans one input leaf dir per batch. Compaction restores
    * O(1) layout without changing a single probe result.
    *
    * Protocol (same commit discipline as ingest): merge → stage under
    * an underscore dir → ONE rename to `batch=<digest>` → marker write
    * → THEN delete the source partitions. Torn-compaction windows are
    * all safe:
    *   - crash before the rename: the staging dir is parquet-invisible;
    *     re-run overwrites it.
    *   - crash after the rename, before the source deletes: the index
    *     temporarily holds every row twice — semantically benign (the
    *     ingest probe is a LEFT SEMI existence check; duplicate
    *     (id, band, bucket) rows cannot change any survivor set) — and
    *     the re-run converges: the merge `distinct()`s the doubled rows
    *     and the digest folds the half-compacted partition in.
    * Uncommitted partitions (no `_batch_committed_<id>` marker — e.g. a
    * torn object-store ingest) are left untouched for their own
    * ingest's re-run. Not concurrency-safe with a live ingest, like
    * [[migrateFlatIndex]].
    *
    * After compaction a PAST batch id can no longer be re-ingested
    * idempotently (its rows now live in the consolidated partition, so
    * the re-run's self-exclusion filter no longer sees them) — compact
    * finalizes history; re-ingest a path under a NEW --batch-id. */
  def runCompactIndex(spark: org.apache.spark.sql.SparkSession,
      indexPath: String): Unit = {
    import org.apache.spark.sql.functions.col
    val conf = spark.sparkContext.hadoopConfiguration
    val indexP = new org.apache.hadoop.fs.Path(indexPath)
    val fs = indexP.getFileSystem(conf)
    migrateFlatIndex(fs, indexP)
    def marker(id: String) =
      new org.apache.hadoop.fs.Path(indexPath, s"_batch_committed_$id")
    val all = fs.listStatus(indexP).filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=")).toSeq.sorted
    val committed = all.filter(id => id == "base" || fs.exists(marker(id)))
    if (committed.size < 2) {
      println(s"[graft] compact-index: ${committed.size} committed " +
        "partition(s) — nothing to compact")
      return
    }
    val digest = "c" + graft.operators.vector.DeterministicPlanes
      .md5Hex(committed.mkString(",")).take(12)
    val merged = spark.read
      // basePath: the listed dirs are sibling partitions of ONE table;
      // without it Spark infers a partition root per path and throws
      // CONFLICTING_DIRECTORY_STRUCTURES
      .option("basePath", indexPath)
      .parquet(committed.map(id => s"$indexPath/batch=$id"): _*)
      .drop("batch") // re-partitioned under the new consolidated id
      .distinct() // doubled rows from a torn prior compaction collapse here
    val staging = s"$indexPath/_staging_compact_$digest"
    merged.write.mode("overwrite").partitionBy("band").parquet(staging)
    fs.delete(new org.apache.hadoop.fs.Path(staging, "_SUCCESS"), false)
    val target = new org.apache.hadoop.fs.Path(s"$indexPath/batch=$digest")
    fs.delete(marker(digest), false)
    if (fs.exists(target)) fs.delete(target, true) // crashed prior attempt
    if (!fs.rename(new org.apache.hadoop.fs.Path(staging), target))
      throw new java.io.IOException(s"compact rename failed: $staging -> $target")
    fs.create(marker(digest), true).close()
    // sources go LAST — every crash before this line leaves a readable,
    // correct (if temporarily doubled) index
    committed.filterNot(_ == digest).foreach { id =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$indexPath/batch=$id"), true)
      fs.delete(marker(id), false)
    }
    println(s"[graft] compact-index: ${committed.size} partitions " +
      s"(${committed.mkString(", ")}) -> batch=$digest")
  }

  /** Resumable bulk load (the reference loader worker's per-shard
    * cursor, framework/loader_worker.py:30-60): expands the comma-
    * separated shard globs, then [[graft.sources.ShardedLoader]]
    * ingests each shard `--chunk-records` rows at a time with a
    * committed (shard, offset) marker per chunk — a killed run resumes
    * mid-shard, never re-reading or duplicating committed chunks.
    * `--max-chunks` bounds one invocation's work (the "budget per
    * worker wake-up" knob). */
  def runLoadShards(spark: org.apache.spark.sql.SparkSession, globsCsv: String,
      stateDir: String, outDir: String, args: Array[String]): Unit = {
    def intFlag(name: String, default: Int): Int = args.indexOf(name) match {
      case i if i >= 0 && i + 1 < args.length => args(i + 1).toInt
      case i if i >= 0 =>
        System.err.println(s"$name needs a value"); sys.exit(2)
      case _ => default
    }
    val chunkRecords = intFlag("--chunk-records", 1000000)
    val maxChunks = intFlag("--max-chunks", Int.MaxValue)
    val conf = spark.sparkContext.hadoopConfiguration
    val shards = globsCsv.split(',').toSeq.flatMap { g =>
      val p = new org.apache.hadoop.fs.Path(g)
      val fs = p.getFileSystem(conf)
      Option(fs.globStatus(p)).toSeq.flatten.map(_.getPath.toString)
    }.distinct.sorted
    require(shards.nonEmpty, s"no shards match: $globsCsv")
    val report = graft.sources.ShardedLoader.ingest(spark, shards, stateDir,
      outDir, chunkRecords.toLong, maxChunks)
    println(s"[graft] load-shards: ${shards.length} shards, " +
      s"${report.chunksWritten} chunks / ${report.recordsWritten} records " +
      s"this run, ${report.shardsCompleted} shards complete" +
      (if (report.budgetExhausted) " (budget exhausted — re-run to continue)" else ""))
  }

  def main(args: Array[String]): Unit = {
    if (args.length >= 3 && args(0) == "index-build") {
      val spark = GraftSession.local("graft-cli")
      try runIndexBuild(spark, args(1), args(2), args) finally spark.stop()
      return
    }
    if (args.length >= 4 && args(0) == "ingest") {
      val spark = GraftSession.local("graft-cli")
      try runIngest(spark, args(1), args(2), args(3), args) finally spark.stop()
      return
    }
    if (args.length >= 2 && args(0) == "compact-index") {
      val spark = GraftSession.local("graft-cli")
      try runCompactIndex(spark, args(1)) finally spark.stop()
      return
    }
    if (args.length >= 4 && args(0) == "load-shards") {
      val spark = GraftSession.local("graft-cli")
      try runLoadShards(spark, args(1), args(2), args(3), args)
      finally spark.stop()
      return
    }
    if (args.length < 2 || !Set("run", "profile").contains(args(0))) {
      System.err.println(
        "usage: graft.Main run|profile <config.yaml> [--no-report] [--metrics-path <dir>]\n" +
        "       graft.Main index-build <docs.parquet> <index-dir> [lsh opts]\n" +
        "       graft.Main ingest <batch.parquet> <index-dir> <survivors-out> [lsh opts] [--batch-id <id>]\n" +
        "       graft.Main compact-index <index-dir>\n" +
        "       graft.Main load-shards <shard-glob[,glob...]> <state-dir> <out-dir> [--chunk-records N] [--max-chunks N]")
      sys.exit(2)
    }
    val yaml = java.nio.file.Files.readString(java.nio.file.Path.of(args(1)))
    val report = !args.contains("--no-report")
    val metricsPath = args.indexOf("--metrics-path") match {
      case i if i >= 0 && i + 1 < args.length => Some(args(i + 1))
      case i if i >= 0 => System.err.println("--metrics-path needs a value"); sys.exit(2)
      case _ => None
    }
    val job = PipelineConfig.parseJob(yaml)
    val spark = GraftSession.local("graft-cli")
    try {
      val runId = MetricsSink.newRunId()
      if (args(0) == "profile") {
        val t0 = System.nanoTime()
        val (_, metrics) = job.runProfiled(spark)
        val wall = (System.nanoTime() - t0) / 1e9
        println(job.pipeline.formatStageReport(metrics))
        metricsPath.foreach { p =>
          MetricsSink.persist(spark, p,
            MetricsSink.fromProfile(runId, metrics), wall, yaml)
          println(s"[graft] metrics + report written to $p (run $runId)")
        }
      } else {
        val t0 = System.nanoTime()
        val in = job.loader.getOrElse(throw new IllegalArgumentException(
          "config has no data_loader section"))(spark)
        val (out, handles) =
          if (report || metricsPath.nonEmpty) job.pipeline.observed(in)
          else (job.pipeline(in), Seq.empty)
        job.writer match {
          case Some(w) => w(out)
          case None => println(s"[graft] rows out: ${out.count()} (no data_writer configured)")
        }
        val wall = (System.nanoTime() - t0) / 1e9
        if (handles.nonEmpty) {
          val funnel = job.pipeline.funnelReport(handles)
          if (report) println(job.pipeline.formatReport(funnel, wall))
          metricsPath.foreach { p =>
            MetricsSink.persist(spark, p,
              MetricsSink.fromFunnel(runId, funnel), wall, yaml)
            println(s"[graft] metrics + report written to $p (run $runId)")
          }
        }
      }
    } finally spark.stop()
  }
}
