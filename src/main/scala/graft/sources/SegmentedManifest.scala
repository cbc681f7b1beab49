package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** THE segment-manifest commit protocol — one implementation of the
  * machinery [[graft.operators.text.Bm25]] (postings/vocab/lens/stats
  * segments) and [[graft.operators.vector.IvfIndex]] (cells segments)
  * previously each hand-rolled (the r15 verdict's "four copies"
  * finding; SURVEY §18.14). These are crash-recovery semantics, so
  * divergence under future edits is an index-corruption bug, not a
  * style issue — the contract lives here exactly once:
  *
  *  - A VERSION is a tiny `<name>_manifest` catalog table (seg, gen)
  *    naming immutable SEGMENTS in generation order. The manifest is
  *    written LAST (the commit record): a crash before it leaves the
  *    version unreadable and every older version byte-for-byte intact.
  *  - Every writer commits ≥ 1 segment row, so an empty manifest
  *    read-back is a torn or transiently-invisible manifest, never a
  *    legal state: [[read]] heals a stale file listing with one
  *    refreshTable + re-read and fails LOUDLY if still empty, instead
  *    of silently dropping the version's segments from the next
  *    manifest (seen once on the burst host: a just-written manifest
  *    read back 0 rows and a bare `.max` crashed with `empty.max`).
  *  - Writes against a REUSED name first clear catalog-unknown
  *    warehouse residue (a killed process leaves files the catalog no
  *    longer points to; CTAS then refuses the non-empty managed
  *    location), so build/refresh/attach retries are idempotent
  *    across crashes.
  *  - [[attachVersion]] re-registers a version in a FRESH session's
  *    catalog (parquet files outlive the session, in-memory catalog
  *    entries do not): with `as == dirOfName` every listed segment
  *    re-attaches under its recorded name and the manifest attaches
  *    location-backed; with an alias, the SAME segment files attach
  *    and a new (tiny) manifest under `as` lists the ORIGINAL segment
  *    prefixes — those are the names with warehouse-directory backing,
  *    so a fresh session can resolve the alias (catalog-only alias
  *    names in a durable manifest were unresolvable outside the
  *    attaching session — the r15 alias-manifest fix, preserved here).
  */
object SegmentedManifest {

  private def warehouse(spark: SparkSession): String =
    spark.conf.get("spark.sql.warehouse.dir")

  private def fs(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Delete a table's warehouse directory if present — the residue
    * clear for catalog-unknown locations. */
  private def deleteDir(spark: SparkSession, table: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(
      s"${warehouse(spark)}/${table.toLowerCase(java.util.Locale.ROOT)}")
    val f = fs(spark, p)
    if (f.exists(p)) f.delete(p, true)
  }

  /** Drop catalog tables AND their warehouse directories — a version
    * writer's first step against the tables the new version OWNS
    * (inherited segments are shared by reference and never in the
    * list). Clearing the directory even when the catalog has no entry
    * makes a retry after a kill idempotent. */
  def dropTablesAndDirs(spark: SparkSession, tables: Seq[String]): Unit =
    for (t <- tables) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      deleteDir(spark, t)
    }

  /** Write the version's manifest — the commit record, written last,
    * single file. */
  def write(spark: SparkSession, name: String,
      segs: Seq[(String, Int)]): Unit = {
    import spark.implicits._
    val t = s"${name}_manifest"
    if (!spark.catalog.tableExists(t)) deleteDir(spark, t)
    segs.toDF("seg", "gen").coalesce(1)
      .write.mode("overwrite").format("parquet")
      .saveAsTable(t)
  }

  /** The version's (segment, gen) rows in generation order (bounded
    * driver read: one row per refresh since the last compaction), with
    * the empty-read-back hardening described above. */
  def read(spark: SparkSession, name: String): Seq[(String, Int)] = {
    def once() = spark.table(s"${name}_manifest").orderBy(col("gen"))
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    val first = once()
    if (first.nonEmpty) first
    else {
      spark.catalog.refreshTable(s"${name}_manifest")
      val second = once()
      if (second.isEmpty) throw new IllegalStateException(
        s"${name}_manifest read back EMPTY twice — torn index state " +
          "(every build/refresh/compact commits at least one segment row)")
      second
    }
  }

  /** The generation a refresh appends after `old`. */
  def nextGen(old: Seq[(String, Int)]): Int = old.map(_._2).max + 1

  /** Manifest rows read straight from the warehouse parquet — the
    * attach-time path, where the source session's catalog entry is
    * gone but its files are not. */
  def readFiles(spark: SparkSession, dirOfName: String): Seq[(String, Int)] =
    spark.read.parquet(manifestLocation(spark, dirOfName)).orderBy(col("gen"))
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq

  private def manifestLocation(spark: SparkSession, name: String): String =
    s"${warehouse(spark)}/${name.toLowerCase(java.util.Locale.ROOT)}_manifest"

  /** Register `table` as an EXTERNAL parquet table over an existing
    * warehouse location (schema inferred from the files), restoring
    * the bucket metadata the source session declared — bucket
    * declarations exist only in the catalog, and without them every
    * downstream merge join re-sorts. No-op if the table exists;
    * attached tables never own their files (dropping them never
    * deletes data). */
  def attachTable(spark: SparkSession, table: String, srcTable: String,
      clusterCols: Seq[String] = Nil, sortCols: Seq[String] = Nil,
      buckets: Int = 8): Unit =
    if (!spark.catalog.tableExists(table)) {
      val loc =
        s"${warehouse(spark)}/${srcTable.toLowerCase(java.util.Locale.ROOT)}"
      val ddl = spark.read.parquet(loc).schema.toDDL
      val bucketClause =
        if (clusterCols.isEmpty) ""
        else s"CLUSTERED BY (${clusterCols.mkString(", ")}) " +
          (if (sortCols.nonEmpty) s"SORTED BY (${sortCols.mkString(", ")}) "
           else "") +
          s"INTO $buckets BUCKETS "
      spark.sql(s"""CREATE TABLE $table ($ddl) USING parquet
        |${bucketClause}LOCATION '$loc'""".stripMargin)
    }

  /** Re-register a persisted version under `as`: reads the manifest
    * files of `dirOfName`, calls `attachSeg(segPrefix)` for every
    * listed segment (the caller attaches its own per-segment tables
    * via [[attachTable]]), then attaches the manifest itself —
    * location-backed when `as == dirOfName`, else a new alias manifest
    * listing the original (warehouse-backed) segment prefixes. Returns
    * the segment list for any caller-side extras. */
  def attachVersion(spark: SparkSession, dirOfName: String, as: String)(
      attachSeg: String => Unit): Seq[(String, Int)] = {
    val man = readFiles(spark, dirOfName)
    man.foreach { case (seg, _) => attachSeg(seg) }
    if (as == dirOfName) {
      if (!spark.catalog.tableExists(s"${as}_manifest")) {
        val manLoc = manifestLocation(spark, dirOfName)
        val ddl = spark.read.parquet(manLoc).schema.toDDL
        spark.sql(
          s"CREATE TABLE ${as}_manifest ($ddl) USING parquet LOCATION '$manLoc'")
      }
    } else write(spark, as, man)
    man
  }
}
