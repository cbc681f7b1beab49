package graft.sources

import graft.functions.TextFns
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data loaders — Spark-native counterparts of the reference's
  * loaders (huggingface_loader.py / commoncrawl_loader.py). In a
  * zero-egress environment these read local files; on a cluster the
  * same calls read s3a/gs/hdfs URIs. Sharding, predicate pushdown and
  * checkpointed resumption are Spark's file-source machinery rather
  * than hand-built loader workers.
  *
  * On HF-hub semantics specifically: the reference's streaming mode
  * (huggingface_loader.py `streaming=true` with shard resumption) maps
  * to reading the dataset's hosted parquet shards directly — Spark's
  * file listing + task retry replaces the loader's own shard cursor;
  * for continuous arrival use `spark.readStream.format("parquet")` on
  * the same directory. There is no separate resumption protocol to
  * re-implement.
  */
object Sources {

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** JSONL with optional explicit schema (always prefer explicit —
    * schema inference is a full extra pass at 100 TB). */
  def jsonl(spark: SparkSession, path: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(s => r.schema(s)).json(path)
  }

  def csv(spark: SparkSession, path: String, header: Boolean = true): DataFrame =
    spark.read.option("header", header.toString).csv(path)

  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** WARC reader — the CommonCrawl path (reference
    * loaders/commoncrawl_loader.py + Rust html extraction). Splits the
    * stream on record boundaries using the text source's custom record
    * delimiter, parses WARC headers, and keeps all records.
    *
    * Works on both plain `.warc` (splittable — one task per HDFS
    * block) and real CommonCrawl `.warc.gz`: Hadoop's gzip codec
    * decompresses multi-member files (one gzip member per record,
    * concatenated) as one stream, so the same delimiter split applies.
    * A `.gz` file is one task — CommonCrawl ships crawls as tens of
    * thousands of ~1 GB files, so at scale parallelism comes from the
    * file count, not intra-file splits.
    *
    * The delimiter consumes the `WARC/1.0` version line of records
    * 2..n but not of the file's first record, so a leading version
    * line is stripped explicitly before header parsing; the
    * record-final CRLF CRLF (spec: part of the record frame, not the
    * content) is stripped from the last record where no following
    * delimiter consumed it.
    *
    * Output: (warc_type, target_uri, content) — feed `content` to
    * [[graft.functions.TextFns.htmlExtractText]] for the RefinedWeb
    * text-extraction step.
    */
  def warc(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.option("lineSep", "\r\n\r\nWARC/1.0\r\n").text(path)
    val rec = when(col("value").startsWith("WARC/1.0\r\n"),
      expr("substring(value, 11)")).otherwise(col("value"))
    val header = substring_index(rec, "\r\n\r\n", 1)
    def h(name: String) =
      regexp_extract(header, "(?m)^" + name + ":\\s*(.*?)\\r?$", 1)
    val body = rec.substr(locate("\r\n\r\n", rec) + 4, length(rec))
    df.select(
        h("WARC-Type").as("warc_type"),
        h("WARC-Target-URI").as("target_uri"),
        regexp_replace(body, "\r\n\r\n$", "").as("content"))
      .filter(col("warc_type") =!= "")
  }

  /** WARC → extracted page text, RefinedWeb-style. */
  def warcText(spark: SparkSession, path: String): DataFrame =
    warc(spark, path)
      .filter(col("warc_type") === "response" && length(col("content")) > 0)
      .select(col("target_uri").as("url"),
        TextFns.htmlExtractText(col("content")).as("text"))
}

/** Sinks — reference writers/parquet_writer.py + iceberg_writer.py. */
object Sinks {

  /** Parquet sink with the scale knobs that matter: partition columns
    * (partition pruning for downstream readers), sort-within-partitions
    * (run-length/dictionary-friendly pages + min-max pruning), and
    * bounded file sizes. */
  def parquet(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil,
      sortWithin: Seq[String] = Nil,
      maxRecordsPerFile: Long = 5000000L,
      compression: String = "zstd"): Unit = {
    val sorted =
      if (sortWithin.nonEmpty) df.sortWithinPartitions(sortWithin.map(col): _*) else df
    val w = sorted.write.mode("overwrite")
      .option("compression", compression)
      .option("maxRecordsPerFile", maxRecordsPerFile)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** Globally range-sorted layout: `repartitionByRange` + sort-within
    * gives non-overlapping per-file min/max on `sortBy`, so downstream
    * range predicates prune to O(1) files (the poor man's Z-order for a
    * single sort dimension — the standard layout for time-series and
    * id-ranged tables). */
  def parquetSorted(df: DataFrame, path: String, sortBy: Seq[String],
      numFiles: Int = 0, compression: String = "zstd"): Unit = {
    require(sortBy.nonEmpty, "sortBy must be non-empty")
    val ranged =
      if (numFiles > 0) df.repartitionByRange(numFiles, sortBy.map(col): _*)
      else df.repartitionByRange(sortBy.map(col): _*)
    ranged.sortWithinPartitions(sortBy.map(col): _*)
      .write.mode("overwrite").option("compression", compression).parquet(path)
  }

  /** Upsert (MERGE) into a plain parquet directory: rows in `updates`
    * replace existing rows with the same key, everything else is kept —
    * the poor man's Delta/Iceberg merge for environments without a
    * table-format runtime. One anti join + union + atomic
    * rewrite-and-swap; at scale, partition the table and merge only the
    * touched partitions. */
  def upsert(updates: DataFrame, path: String, keyCols: Seq[String]): Unit = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val spark = updates.sparkSession
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    recoverSwap(fs, path)
    val exists = fs.exists(new org.apache.hadoop.fs.Path(path))
    val merged =
      if (!exists) updates
      else spark.read.parquet(path)
        .join(updates.select(keyCols.map(col): _*), keyCols, "left_anti")
        .unionByName(updates)
    val tmp = path.stripSuffix("/") + "__upsert_tmp"
    merged.write.mode("overwrite").option("compression", "zstd").parquet(tmp)
    swapIn(fs, path, tmp)
  }

  /** Recover a swap torn BETWEEN [[swapIn]]'s two renames: live
    * missing with `__old` present means the crash hit after
    * live→`__old` and before tmp→live — `__old` is then the SOLE copy
    * of the table, and without this restore the next upsert/compact
    * would see "no table", merge updates-only, and its swapIn would
    * delete `__old`: silent full-table loss (r16 review finding).
    * Restores `__old` → live; live AND `__old` both present means the
    * crash hit after the commit rename, so `__old` is garbage. Every
    * swapIn caller runs this before READING the table. */
  private[graft] def recoverSwap(fs: org.apache.hadoop.fs.FileSystem,
      livePath: String): Unit = {
    import org.apache.hadoop.fs.Path
    val live = new Path(livePath)
    val old = new Path(livePath.stripSuffix("/") + "__old")
    if (!fs.exists(live) && fs.exists(old)) {
      if (!fs.rename(old, live))
        throw new java.io.IOException(
          s"recovering torn swap: rename $old -> $live failed")
    } else if (fs.exists(live) && fs.exists(old)) fs.delete(old, true)
  }

  /** [[recoverSwap]] for every partition-level `__old` left INSIDE a
    * Hive-layout table root by a torn [[upsertPartitioned]] swap (the
    * per-partition swaps place `<part>__old` next to `<part>`). Also
    * keeps partition discovery clean: a lingering `day=X__old` dir
    * would otherwise parse as partition value "X__old". */
  private[graft] def recoverPartitionSwaps(fs: org.apache.hadoop.fs.FileSystem,
      root: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(root)
    if (fs.exists(p))
      fs.listStatus(p)
        .filter(s => s.isDirectory && s.getPath.getName.endsWith("__old"))
        .foreach { s =>
          recoverSwap(fs,
            s"${root.stripSuffix("/")}/${s.getPath.getName.stripSuffix("__old")}")
        }
  }

  /** Crash-safe directory swap: live → `__old`, tmp → live, drop
    * `__old`. A crash between the renames leaves either the old table
    * intact or both `__old` and the new live dir — never a window with
    * no table at all (the delete-then-rename it replaces had one) —
    * and [[recoverSwap]] at the head of every caller turns the
    * live-missing/`__old`-present state back into the old table. */
  private[graft] def swapIn(fs: org.apache.hadoop.fs.FileSystem,
      livePath: String, tmpPath: String): Unit = {
    import org.apache.hadoop.fs.Path
    val live = new Path(livePath)
    val tmp = new Path(tmpPath)
    val old = new Path(livePath.stripSuffix("/") + "__old")
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(live)) {
      if (!fs.rename(live, old))
        throw new java.io.IOException(s"rename $live -> $old failed")
    }
    if (!fs.rename(tmp, live))
      throw new java.io.IOException(s"rename $tmp -> $live failed")
    fs.delete(old, true)
  }

  /** Partition-scoped upsert for Hive-layout tables: only the
    * partitions present in `updates` are read, merged and swapped —
    * untouched partitions are never rewritten (the merge cost scales
    * with the update's partitions, not the table; this is the shape
    * Iceberg/Delta MERGE takes with partition predicates). The set of
    * touched partition values is collected to the driver — by contract
    * a small list (e.g. the day keys of an incremental load). */
  def upsertPartitioned(updates: DataFrame, path: String,
      keyCols: Seq[String], partitionCol: String): Unit = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val spark = updates.sparkSession
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    recoverPartitionSwaps(fs, path)
    if (!fs.exists(new org.apache.hadoop.fs.Path(path))) {
      parquet(updates, path, Seq(partitionCol)); return
    }
    // the partition column is NOT a trusted caller parameter: the
    // on-disk Hive layout is the truth, and an upsert keyed on a
    // different column would write `newcol=...` dirs NEXT to the
    // existing `day=...` dirs — a silently corrupt mixed layout (the
    // same trap class as the r17 index-layout fix). Fail loudly on
    // contradiction instead.
    fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .find(s => s.isDirectory && s.getPath.getName.contains("="))
      .map(_.getPath.getName.split("=", 2)(0))
      .foreach(k => require(k == partitionCol,
        s"table at $path is partitioned by '$k' on disk, not " +
          s"'$partitionCol' — the layout travels with the table"))
    // typed partition values (no string cast) so the read below prunes
    // partitions; a null value maps to Hive's default-partition dir
    val touchedVals = updates.select(col(partitionCol))
      .distinct().collect().map(_.get(0)).toSeq
    val (nullVals, realVals) = touchedVals.partition(_ == null)
    val touchedPred = {
      val in = if (realVals.nonEmpty) col(partitionCol).isin(realVals: _*) else lit(false)
      if (nullVals.nonEmpty) in || col(partitionCol).isNull else in
    }
    val existing = spark.read.option("basePath", path).parquet(path)
      .filter(touchedPred)
      // partition-dir type inference may widen; align to the update side
      .withColumn(partitionCol,
        col(partitionCol).cast(updates.schema(partitionCol).dataType))
    val merged = existing
      .join(updates.select(keyCols.map(col): _*), keyCols, "left_anti")
      .unionByName(updates.select(existing.columns.map(col): _*))
    val tmp = path.stripSuffix("/") + "__upsert_tmp"
    merged.write.mode("overwrite").option("compression", "zstd")
      .partitionBy(partitionCol).parquet(tmp)
    // swap the partition dirs the writer ACTUALLY created — their names
    // carry Hive's %XX path escaping (spaces, ':', '/') and
    // __HIVE_DEFAULT_PARTITION__ for null, which naive
    // "$partitionCol=$value" interpolation would get wrong
    fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(partitionCol + "="))
      .foreach { s =>
        val dir = s.getPath.getName
        swapIn(fs, s"${path.stripSuffix("/")}/$dir", s"$tmp/$dir")
      }
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
  }

  /** Z-value (Morton code) of up to three numeric columns, each mapped
    * to `bitsPerDim` bits of its [lo, hi] range and bit-interleaved.
    * `df.repartitionByRange(zvalue).sortWithinPartitions(zvalue)` gives
    * the multi-dimensional clustering that makes BOTH dimensions' range
    * predicates prune files (single-dim sorting only helps one). Pure
    * integer Column arithmetic — codegen'd, no UDF. */
  def zvalue(cols: Seq[(org.apache.spark.sql.Column, Double, Double)],
      bitsPerDim: Int = 16): org.apache.spark.sql.Column = {
    require(cols.nonEmpty && cols.size <= 3 && bitsPerDim * cols.size <= 62)
    val nDims = cols.size
    val quantized = cols.map { case (c, lo, hi) =>
      // 1L, not 1: Int << 31+ wraps and would zero the scale factor
      // for the bitsPerDim the require() admits (r16 review finding)
      val scaled = (c.cast("double") - lo) / (hi - lo) * ((1L << bitsPerDim) - 1)
      least(greatest(round(scaled, 0).cast("long"), lit(0L)),
        lit((1L << bitsPerDim) - 1))
    }
    (0 until bitsPerDim).foldLeft(lit(0L)) { (acc, bit) =>
      quantized.zipWithIndex.foldLeft(acc) { case (a, (q, d)) =>
        a.bitwiseOR(shiftleft(shiftright(q, bit).bitwiseAND(1), bit * nDims + d))
      }
    }
  }

  /** Write `df` z-ordered on the given (column, lo, hi) dims. */
  def parquetZOrdered(df: DataFrame, path: String,
      dims: Seq[(String, Double, Double)], numFiles: Int = 0,
      compression: String = "zstd"): Unit = {
    val z = zvalue(dims.map { case (n, lo, hi) => (col(n), lo, hi) })
    val withZ = df.withColumn("__z", z)
    val ranged =
      if (numFiles > 0) withZ.repartitionByRange(numFiles, col("__z"))
      else withZ.repartitionByRange(col("__z"))
    ranged.sortWithinPartitions("__z").drop("__z")
      .write.mode("overwrite").option("compression", compression).parquet(path)
  }

  /** Small-file compaction: rewrite a parquet dir into ~`targetFileMB`
    * files (AQE-style sizing from the actual on-disk bytes). The
    * standard maintenance pass after streaming/incremental writes; a
    * plain coalesce — no shuffle. */
  def compact(spark: SparkSession, path: String, targetFileMB: Int = 256): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    recoverSwap(fs, path)
    // a torn upsertPartitioned leaves `<part>__old` dirs INSIDE the
    // root; reading without healing them first would bake the garbage
    // copy into the compacted table as a bogus "X__old" partition
    // value (r16 advice). Safe on non-partitioned roots — it only
    // matches `__old`-suffixed dirs.
    recoverPartitionSwaps(fs, path)
    val bytes = fs.getContentSummary(new org.apache.hadoop.fs.Path(path)).getLength
    val nFiles = math.max(1, (bytes / (targetFileMB.toLong << 20)).toInt)
    val tmp = path.stripSuffix("/") + "__compact_tmp"
    // carry the Hive partition layout through the rewrite: a bare
    // coalesce-write would FLATTEN `day=.../` dirs into data columns,
    // killing partition pruning and corrupting a later
    // upsertPartitioned (its per-partition swap would leave the old
    // flat files in place next to the new dirs — duplicate rows; r16
    // review finding). Walks one `k=v` dir per level.
    val partCols = {
      val buf = scala.collection.mutable.ListBuffer[String]()
      var cur = new org.apache.hadoop.fs.Path(path)
      var descend = true
      while (descend) {
        val dirs = fs.listStatus(cur).filter(s =>
          s.isDirectory && s.getPath.getName.contains("="))
        if (dirs.isEmpty) descend = false
        else {
          buf += dirs.head.getPath.getName.split("=", 2)(0)
          cur = dirs.head.getPath
        }
      }
      buf.toList
    }
    val w = spark.read.parquet(path).coalesce(nFiles)
      .write.mode("overwrite").option("compression", "zstd")
    (if (partCols.nonEmpty) w.partitionBy(partCols: _*) else w).parquet(tmp)
    swapIn(fs, path, tmp)
  }

  /** Bucketed table sink: co-locates rows by hash(bucketCols) at WRITE
    * time so every later equi-join or aggregation on those columns reads
    * pre-partitioned data and skips its shuffle entirely — the standard
    * 100 TB trick for fact tables that join on the same key daily
    * (pay one shuffle at ingest, save one per downstream job). Both
    * sides of a join must use the same bucket count. Registered in the
    * session catalog (bucketing metadata lives there; a plain parquet
    * dir cannot carry it). */
  def bucketedTable(df: DataFrame, table: String, bucketCols: Seq[String],
      numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty, "bucketCols must be non-empty")
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Table-format sink with SNAPSHOT COMMIT semantics — the fallback
    * for the Iceberg writer (writers/iceberg_writer.py) in a build where
    * the runtime jar is intentionally absent (zero-egress); with
    * `iceberg-spark-runtime` on the classpath this becomes
    * `df.writeTo(table).append()` against a configured catalog.
    *
    * Layout (Iceberg's shape, minimally):
    * {{{
    * path/
    *   data/v<N>/…parquet     immutable, versioned — NEVER renamed/mutated
    *   snapshots/v<N>.json    version, timestamp, partition spec, file list
    *   manifest.json          the pointer; rewriting it IS the commit
    * }}}
    *
    * Commit protocol: (1) write `data/v<N>` (invisible — nothing points
    * at it), (2) write `snapshots/v<N>.json` after the data completes,
    * (3) flip `manifest.json` to N. A crash anywhere before (3) leaves
    * the previous snapshot live and intact — there is no rename of live
    * data and therefore no `swapIn`-style window with no table at all.
    * If the flip itself is interrupted, [[currentVersion]] falls back to
    * the highest snapshot file, which by (2) always has complete data.
    * Old versions stay readable ([[readTable]] time travel) until
    * [[expireSnapshots]]. Returns the committed version. */
  def table(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Long = {
    val spark = df.sparkSession
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val version = snapshotVersions(fs, path).lastOption.getOrElse(0L) + 1L
    parquet(df, s"$path/data/v$version", partitionBy)
    // schema travels in the snapshot metadata (the Iceberg discipline):
    // an empty commit — initial load of nothing, or a MERGE that
    // removed every row — leaves a data dir with no parquet footers,
    // and a reader that relied on inference would brick the table
    writeFile(fs, s"$path/snapshots/v$version.schema.json", df.schema.json)
    val files = listFilesRec(fs, new org.apache.hadoop.fs.Path(s"$path/data/v$version"))
      .filter(_.endsWith(".parquet"))
    val snapshot =
      s"""{"version":$version,"timestamp_ms":${System.currentTimeMillis()},
         |"partition_by":[${partitionBy.map("\"" + _ + "\"").mkString(",")}],
         |"files":[${files.map("\"" + _ + "\"").mkString(",")}]}""".stripMargin
    writeFile(fs, s"$path/snapshots/v$version.json", snapshot)
    val manifest =
      s"""{"table":"$path","format":"parquet","current":$version,
         |"partition_by":[${partitionBy.map("\"" + _ + "\"").mkString(",")}]}""".stripMargin
    // the flip: tmp + delete + rename; if interrupted, readers fall
    // back to the snapshot log (see currentVersion)
    writeFile(fs, s"$path/manifest.json.tmp", manifest)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/manifest.json"), false)
    fs.rename(new org.apache.hadoop.fs.Path(s"$path/manifest.json.tmp"),
      new org.apache.hadoop.fs.Path(s"$path/manifest.json"))
    version
  }

  /** MERGE as a snapshot commit: read the current snapshot, apply the
    * keyed upsert, commit the merged table as version N+1. No live data
    * is renamed or deleted, so unlike [[upsert]]'s directory swap there
    * is no crash window at all — a failed merge leaves version N live. */
  def upsertTable(updates: DataFrame, path: String, keyCols: Seq[String],
      partitionBy: Seq[String] = Nil): Long = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val spark = updates.sparkSession
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val merged = currentVersion(fs, path) match {
      case None => updates
      case Some(_) =>
        val existing = readTable(spark, path)
        existing
          .join(updates.select(keyCols.map(col): _*), keyCols, "left_anti")
          .unionByName(updates.select(existing.columns.map(col): _*))
    }
    table(merged, path, partitionBy)
  }

  /** Committed version: the manifest pointer, or — if a crash
    * interrupted the flip — the highest snapshot on the log (whose data
    * is complete by the commit protocol's write order). */
  def currentVersion(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Option[Long] = {
    val mp = new org.apache.hadoop.fs.Path(s"$path/manifest.json")
    val fromManifest =
      if (!fs.exists(mp)) None
      else {
        val in = fs.open(mp)
        val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
        "\"current\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(txt).map(_.group(1).toLong)
      }
    fromManifest.orElse(snapshotVersions(fs, path).lastOption)
  }

  /** The table at its current (or an explicit, time-travel) version.
    * Reads under the snapshot's RECORDED schema when present (written
    * by every commit since r15), so an empty version — or one whose
    * files were all pruned — still reads as a typed empty table; tables
    * committed before the schema file existed fall back to footer
    * inference. */
  def readTable(spark: SparkSession, path: String,
      asOfVersion: Option[Long] = None): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val v = asOfVersion.orElse(currentVersion(fs, path)).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot at $path"))
    val sp = new org.apache.hadoop.fs.Path(s"$path/snapshots/v$v.schema.json")
    val reader =
      if (!fs.exists(sp)) spark.read
      else {
        val in = fs.open(sp)
        val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
        spark.read.schema(org.apache.spark.sql.types.DataType.fromJson(txt)
          .asInstanceOf[org.apache.spark.sql.types.StructType])
      }
    reader.parquet(s"$path/data/v$v")
  }

  /** Versions on the snapshot log, ascending. */
  def snapshotVersions(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Seq[Long] = {
    val dir = new org.apache.hadoop.fs.Path(s"$path/snapshots")
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .flatMap(s => "^v(\\d+)\\.json$".r.findFirstMatchIn(s.getPath.getName)
        .map(_.group(1).toLong))
      .sorted
  }

  /** Retention maintenance: drop all but the last `keepLast` snapshots
    * (data dirs + log entries). The current version is always kept. */
  def expireSnapshots(spark: SparkSession, path: String, keepLast: Int): Unit = {
    require(keepLast >= 1, "keepLast must be >= 1")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val versions = snapshotVersions(fs, path)
    val cur = currentVersion(fs, path)
    versions.dropRight(keepLast).filterNot(cur.contains).foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/data/v$v"), true)
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/snapshots/v$v.json"), false)
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/snapshots/v$v.schema.json"), false)
    }
  }

  private def writeFile(fs: org.apache.hadoop.fs.FileSystem,
      path: String, content: String): Unit = {
    val out = fs.create(new org.apache.hadoop.fs.Path(path), true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  /** File paths RELATIVE to `dir` (partition subdirs included): a bare
    * getName lost the `day=.../` prefix, making partitioned snapshots'
    * file lists ambiguous and unresolvable for any manifest consumer
    * (pruning, expire/GC verification — r16 review finding). */
  private def listFilesRec(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Seq[String] = {
    val base = fs.getFileStatus(dir).getPath.toUri.getPath.stripSuffix("/")
    val it = fs.listFiles(dir, true)
    val buf = scala.collection.mutable.ArrayBuffer[String]()
    while (it.hasNext) {
      val p = it.next().getPath.toUri.getPath
      buf += (if (p.startsWith(base + "/")) p.substring(base.length + 1)
              else p.split('/').last)
    }
    buf.toSeq
  }
}
