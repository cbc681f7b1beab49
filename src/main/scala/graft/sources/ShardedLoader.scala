package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mid-shard checkpoint/resume for bulk ingest — the Spark twin of the
  * reference loader worker's per-shard cursor
  * (framework/loader_worker.py:30-60), the one loader behavior the r8
  * verdict listed as having no direct twin. A killed ingest resumes
  * FROM its committed (shard, offset) instead of re-reading the shard.
  *
  * Offsets are SHARD-GLOBAL record positions: parquet
  * `_metadata.row_index` (file-stable, task-split-proof) plus a
  * per-file base offset (files ordered by path, bases = cumulative row
  * counts from the footers). A resume boundary is exact regardless of
  * task splits, retries, parallelism, or how many part files the shard
  * directory holds; no "first N rows of some nondeterministic order".
  *
  * Crash protocol, per chunk:
  *   1. write the chunk's output under `out/<shard>/off=<o>` (overwrite
  *      mode — a torn previous attempt at the same offset is replaced);
  *   2. THEN flip the shard's progress marker to `offset = o + chunk`
  *      (write `.tmp`, close, delete old, rename).
  * A crash between 1 and 2 re-runs exactly one chunk into the same
  * directory — output is duplicate-free without any dedup pass. The
  * delete-then-rename in step 2 is NOT atomic; [[progress]] closes that
  * window by reading marker AND leftover `.tmp` and taking the larger
  * offset — offsets are monotone and any parseable marker reflects
  * already-written output, so the rule is crash-safe even against a
  * torn tmp (a truncated decimal prefix is always numerically smaller).
  * The marker is one tiny JSON per shard, not a log: O(shards) state.
  *
  * At 100 TB the driver loop below parallelizes trivially (shards are
  * independent — run one loader per executor pool or partition the
  * shard list across jobs). Chunk windows are FILE-aligned: a
  * `row_index` range does not prune parquet row groups (only the
  * file-constant `file_path` predicate prunes at planning time), so a
  * window cutting a file mid-way would re-decode the whole file per
  * adjacent chunk; whole-file windows decode exactly the rows they
  * emit. `chunkRecords` is the window's minimum — size it at or above
  * the shard's largest file to keep chunks near-uniform.
  */
object ShardedLoader {

  /** Committed progress of one shard. `offset` = first UNprocessed
    * row_index. */
  case class ShardProgress(shard: String, offset: Long, done: Boolean)

  case class IngestReport(chunksWritten: Int, recordsWritten: Long,
      shardsCompleted: Int, budgetExhausted: Boolean)

  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Stable shard directory key (also the output subdir name). */
  def shardKey(shard: String): String =
    graft.operators.vector.DeterministicPlanes.md5Hex(shard).take(16)

  private def markerPath(stateDir: String, shard: String) =
    s"$stateDir/shard_${shardKey(shard)}.json"

  private def parseMarker(f: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path, shard: String): Option[ShardProgress] =
    if (!f.exists(p)) None
    else scala.util.Try {
      val in = f.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      // two numeric fields + a boolean — a hand-rolled parse keeps the
      // marker dependency-free (no JSON lib on the unmanaged classpath)
      "\"offset\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(txt).map { m =>
        // whitespace-tolerant like the offset field: an exact-substring
        // match was coupled to commit()'s byte spacing, so a marker
        // written by any other tool read back done=false forever
        ShardProgress(shard, m.group(1).toLong,
          "\"done\"\\s*:\\s*true".r.findFirstIn(txt).isDefined)
      }
    }.toOption.flatten

  /** Read a shard's committed progress (offset 0 when none). Considers
    * the marker AND a leftover `.tmp` from a commit cut between its
    * delete and rename steps, keeping whichever carries the larger
    * offset (see the crash-protocol note above). */
  def progress(spark: SparkSession, stateDir: String,
      shard: String): ShardProgress = {
    val f = fs(spark, stateDir)
    val dst = parseMarker(f,
      new org.apache.hadoop.fs.Path(markerPath(stateDir, shard)), shard)
    val tmp = parseMarker(f,
      new org.apache.hadoop.fs.Path(markerPath(stateDir, shard) + ".tmp"), shard)
    (dst.toSeq ++ tmp.toSeq)
      .sortBy(pr => (pr.offset, pr.done)).lastOption
      .getOrElse(ShardProgress(shard, 0L, done = false))
  }

  private def commit(spark: SparkSession, stateDir: String,
      pr: ShardProgress): Unit = {
    val f = fs(spark, stateDir)
    f.mkdirs(new org.apache.hadoop.fs.Path(stateDir))
    val tmp = new org.apache.hadoop.fs.Path(
      markerPath(stateDir, pr.shard) + ".tmp")
    val dst = new org.apache.hadoop.fs.Path(markerPath(stateDir, pr.shard))
    val out = f.create(tmp, true)
    out.write(
      s"""{"shard": "${pr.shard}", "offset": ${pr.offset}, "done": ${pr.done}}"""
        .getBytes("UTF-8"))
    out.close()
    f.delete(dst, false)
    if (!f.rename(tmp, dst))
      throw new java.io.IOException(s"marker commit failed for ${pr.shard}")
  }

  /** Ingest `shards` into `outDir`, `chunkRecords` rows at a time,
    * resuming each shard from its committed offset. `maxChunks` bounds
    * this run's work (and lets a spec simulate a mid-shard kill);
    * `transform` runs per chunk before the write (the pipeline stage a
    * loader feeds). */
  def ingest(spark: SparkSession, shards: Seq[String], stateDir: String,
      outDir: String, chunkRecords: Long, maxChunks: Int = Int.MaxValue,
      transform: DataFrame => DataFrame = identity): IngestReport = {
    require(chunkRecords > 0, "chunkRecords must be positive")
    var chunks = 0
    var records = 0L
    var completed = 0
    for (shard <- shards) {
      var pr = progress(spark, stateDir, shard)
      if (pr.done) completed += 1
      // the chunks guard here, not just in the inner while: once the
      // budget is spent, every remaining shard would otherwise still
      // pay its full per-file footer-count job before discovering it
      // has no budget to run (r16 review finding). A budget-skipped
      // shard is NOT completed — it must not inflate the report.
      else if (chunks < maxChunks) {
        // `_metadata.row_index` restarts at 0 in EVERY part file, so a
        // multi-file shard needs per-file base offsets to make the
        // cursor shard-global. Footer-only work: per-file counts via a
        // scan pruned to the file-path metadata column, cumulated in
        // path order (stable — the file set is immutable input data).
        val files = spark.read.parquet(shard)
          .groupBy(col("_metadata.file_path").as("__f")).count()
          .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
        var acc = 0L
        val layout = files.map { case (p, c) => val b = acc; acc += c; (p, b, c) }
        val total = acc
        while (!pr.done && chunks < maxChunks) {
          val lo = pr.offset
          // FILE-ALIGNED chunk window: take whole files (in path order)
          // until the window reaches `chunkRecords`, at least one. A
          // `row_index` range filter does NOT prune parquet row groups
          // (only the file-constant `file_path` predicate prunes), so a
          // window cutting a file mid-way re-decodes that whole file
          // per adjacent chunk — at 100 TB that read amplification
          // dwarfs the value of byte-exact chunk sizes. Aligned windows
          // decode EXACTLY the rows they emit; `chunkRecords` becomes
          // the window's minimum (chunks run up to one file longer),
          // and resume offsets always land on file boundaries.
          val win = layout.filter { case (_, base, c) =>
            base >= lo && base < lo + chunkRecords
          }
          // an offset from a marker committed before chunks were
          // file-aligned can sit MID-file: finish that file with a
          // row_index filter (one transitional chunk pays the decode
          // amplification once), then all further offsets are aligned
          val head = layout.find { case (_, base, c) => base < lo && lo < base + c }
          val hi = (win.lastOption, head) match {
            case (Some((_, b, c)), _) => b + c
            case (None, Some((_, b, c))) => b + c
            case (None, None) => total
          }
          if (lo < hi) {
            val paths = win.map(_._1)
            val filePred = if (paths.isEmpty) lit(false)
              else col("_metadata.file_path").isin(paths: _*)
            val pred = head match {
              case Some((p, b, _)) => filePred ||
                (col("_metadata.file_path") === p &&
                  col("_metadata.row_index") >= lo - b)
              case None => filePred
            }
            val chunk = spark.read.parquet(shard).filter(pred)
            transform(chunk).write.mode("overwrite")
              .parquet(s"$outDir/shard_${shardKey(shard)}/off=$lo")
            records += hi - lo
            chunks += 1
          }
          pr = ShardProgress(shard, hi, done = hi >= total)
          commit(spark, stateDir, pr)
          if (pr.done) completed += 1
        }
      }
    }
    IngestReport(chunks, records, completed,
      // exhausted only if the budget stopped REMAINING work — finishing
      // the last chunk exactly at the budget is completion, not a cut
      budgetExhausted = chunks >= maxChunks && completed < shards.length)
  }

  /** All records COMMITTED so far: only chunk directories whose offset
    * the shard's marker has advanced past. A chunk written by a crash
    * that died before its marker flip (the step-1/step-2 window in the
    * crash protocol above) sits at `off >= marker.offset` and is
    * excluded — reading it would surface rows the resume is about to
    * overwrite. */
  def loaded(spark: SparkSession, outDir: String, stateDir: String,
      shards: Seq[String]): DataFrame = {
    val dirs = shards.flatMap { shard =>
      val committed = progress(spark, stateDir, shard).offset
      val dir = new org.apache.hadoop.fs.Path(
        s"$outDir/shard_${shardKey(shard)}")
      val f = fs(spark, outDir)
      if (!f.exists(dir)) Seq.empty
      else f.listStatus(dir).toSeq
        .map(_.getPath)
        .filter { p =>
          p.getName.startsWith("off=") &&
            scala.util.Try(p.getName.stripPrefix("off=").toLong)
              .toOption.exists(_ < committed)
        }
        .map(_.toString)
    }
    require(dirs.nonEmpty, "no committed chunks to load")
    spark.read.parquet(dirs: _*)
  }
}
