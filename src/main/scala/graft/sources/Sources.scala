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
    * loaders/commoncrawl_loader.py + Rust html extraction). Splits a
    * WARC file on record boundaries using the text source's custom
    * record delimiter (runs distributed, one split per HDFS block),
    * parses WARC headers, and keeps response records.
    *
    * Output: (warc_type, target_uri, content) — feed `content` to
    * [[graft.functions.TextFns.htmlExtractText]] for the RefinedWeb
    * text-extraction step.
    */
  def warc(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.option("lineSep", "\r\n\r\nWARC/1.0\r\n").text(path)
    val rec = col("value")
    val header = substring_index(rec, "\r\n\r\n", 1)
    def h(name: String) =
      regexp_extract(header, "(?m)^" + name + ":\\s*(.*?)\\r?$", 1)
    df.select(
        when(h("WARC-Type") === "", lit("warcinfo")).otherwise(h("WARC-Type")).as("warc_type"),
        h("WARC-Target-URI").as("target_uri"),
        expr("substring(value, instr(value, '\r\n\r\n') + 4)").as("content"))
      .filter(col("warc_type").isNotNull)
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
    val exists = fs.exists(new org.apache.hadoop.fs.Path(path))
    val merged =
      if (!exists) updates
      else spark.read.parquet(path)
        .join(updates.select(keyCols.map(col): _*), keyCols, "left_anti")
        .unionByName(updates)
    val tmp = path.stripSuffix("/") + "__upsert_tmp"
    merged.write.mode("overwrite").option("compression", "zstd").parquet(tmp)
    if (exists) fs.delete(new org.apache.hadoop.fs.Path(path), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(path))
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
      val scaled = (c.cast("double") - lo) / (hi - lo) * ((1 << bitsPerDim) - 1)
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
    val bytes = fs.getContentSummary(new org.apache.hadoop.fs.Path(path)).getLength
    val nFiles = math.max(1, (bytes / (targetFileMB.toLong << 20)).toInt)
    val tmp = path.stripSuffix("/") + "__compact_tmp"
    spark.read.parquet(path).coalesce(nFiles)
      .write.mode("overwrite").option("compression", "zstd").parquet(tmp)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(path))
  }

  /** Table-format sink. The Iceberg runtime jar is intentionally absent
    * here (zero-egress build); with `iceberg-spark-runtime` on the
    * classpath this becomes `df.writeTo(table).append()` against a
    * configured catalog. This fallback writes the same Hive-style
    * partitioned layout plus a minimal manifest so downstream jobs can
    * discover partitions — swap in Iceberg by configuration, not code
    * change. */
  def table(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    parquet(df, s"$path/data", partitionBy)
    val manifest =
      s"""{"table":"$path","format":"parquet","partition_by":[${partitionBy.map("\"" + _ + "\"").mkString(",")}]}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$path/manifest.json").toAbsolutePath, manifest)
  }
}
