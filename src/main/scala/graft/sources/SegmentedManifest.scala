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
/** The PHYSICAL layout a version's segment tables were written with —
  * bucket count plus per-table-kind (suffix, clusterCols, sortCols) —
  * persisted IN the manifest so that attach and maintenance read the
  * layout from the artifact instead of trusting a caller flag. Bucket
  * declarations exist only in the catalog: attaching an index built at
  * 64 buckets while declaring `INTO 8 BUCKETS` makes bucket pruning
  * select the wrong file set and asserts the Exchange/Sort-free merge
  * joins on a false premise — silent wrong results (r16 verdict
  * "what's wrong" #1). The layout travels with the files; an explicit
  * flag survives only as a cross-check that fails loudly on
  * contradiction ([[SegmentedManifest.resolveBuckets]]). */
final case class IndexLayout(buckets: Int,
    tables: Seq[(String, Seq[String], Seq[String])] = Nil) {
  /** One line, identifier-safe: `buckets|suf:c1,c2:s1,s2;suf2:..:..`. */
  def encode: String =
    s"$buckets|" + tables.map { case (suf, cc, sc) =>
      s"$suf:${cc.mkString(",")}:${sc.mkString(",")}"
    }.mkString(";")
  /** Recorded (clusterCols, sortCols) for a table kind, else the
    * implementation defaults (older manifests recorded buckets only). */
  def colsFor(suffix: String, defCluster: Seq[String],
      defSort: Seq[String]): (Seq[String], Seq[String]) =
    tables.find(_._1 == suffix)
      .map { case (_, cc, sc) => (cc, sc) }
      .getOrElse((defCluster, defSort))
}

object IndexLayout {
  def decode(s: String): IndexLayout = {
    val parts = s.split("\\|", 2)
    val tables =
      if (parts.length < 2 || parts(1).isEmpty) Seq.empty
      else parts(1).split(";").toSeq.map { t =>
        val f = t.split(":", -1)
        def cols(i: Int) =
          if (f.length > i && f(i).nonEmpty) f(i).split(",").toSeq
          else Seq.empty[String]
        (f(0), cols(1), cols(2))
      }
    IndexLayout(parts(0).toInt, tables)
  }
}

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
    * single file. `layout` (when the index's tables are bucketed)
    * rides on every row so the physical layout is part of the commit
    * record itself and survives into fresh sessions. */
  def write(spark: SparkSession, name: String,
      segs: Seq[(String, Int)], layout: Option[IndexLayout] = None): Unit = {
    import spark.implicits._
    val t = s"${name}_manifest"
    if (!spark.catalog.tableExists(t)) deleteDir(spark, t)
    val base = segs.toDF("seg", "gen")
    layout.fold(base)(l => base.withColumn("layout", lit(l.encode)))
      .coalesce(1)
      .write.mode("overwrite").format("parquet")
      .saveAsTable(t)
  }

  /** The version's recorded physical layout via the session catalog
    * (None for a pre-layout manifest). */
  def readLayout(spark: SparkSession, name: String): Option[IndexLayout] =
    readAll(spark, name)._2

  /** [[readLayout]] straight from the warehouse parquet — the
    * attach-time path. */
  def readFilesLayout(spark: SparkSession, dirOfName: String): Option[IndexLayout] =
    readFilesAll(spark, dirOfName)._2

  /** THE bucket-count resolution rule for attach/refresh/compact: the
    * artifact's recorded layout wins; an explicit flag is only a
    * cross-check and contradicting it fails LOUDLY (declaring the
    * wrong count mis-prunes buckets silently — never guess). With no
    * recorded layout (a pre-layout manifest) the flag is required. */
  def resolveBuckets(recorded: Option[IndexLayout], flag: Option[Int],
      what: String): Int =
    (recorded.map(_.buckets), flag) match {
      case (Some(r), Some(f)) if r != f => throw new IllegalArgumentException(
        s"$what: manifest records a physical layout of $r buckets but the " +
          s"caller passed $f — the artifact's layout wins; drop the flag " +
          "(it is read from the manifest) or rebuild the index at the new count")
      case (Some(r), _) => r
      case (None, Some(f)) => f
      case (None, None) => throw new IllegalStateException(
        s"$what: manifest has no recorded physical layout (pre-layout " +
          "artifact) and no bucket count was passed — pass it explicitly " +
          "once; the next write records it in the manifest")
    }

  /** The version's (segment, gen) rows in generation order (bounded
    * driver read: one row per refresh since the last compaction), with
    * the empty-read-back hardening described above. */
  def read(spark: SparkSession, name: String): Seq[(String, Int)] =
    readAll(spark, name)._1

  /** [[read]] + the recorded layout in ONE driver read — the
    * refresh/compact path reads the manifest exactly once (segments
    * and layout travel in the same rows). */
  def readAll(spark: SparkSession,
      name: String): (Seq[(String, Int)], Option[IndexLayout]) = {
    def once() = {
      val df = spark.table(s"${name}_manifest")
      val hasLayout = df.schema.fieldNames.contains("layout")
      val rows = (if (hasLayout) df.select(col("seg"), col("gen"), col("layout"))
                  else df.select(col("seg"), col("gen")))
        .orderBy(col("gen")).collect()
      val segs = rows.map(r => (r.getString(0), r.getInt(1))).toSeq
      val layout =
        if (!hasLayout) None
        else rows.headOption.flatMap(r => Option(r.getString(2)))
          .filter(_.nonEmpty).map(IndexLayout.decode)
      (segs, layout)
    }
    val first = once()
    if (first._1.nonEmpty) first
    else {
      spark.catalog.refreshTable(s"${name}_manifest")
      val second = once()
      if (second._1.isEmpty) throw new IllegalStateException(
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
    readFilesAll(spark, dirOfName)._1

  /** [[readFiles]] + the recorded layout in ONE parquet read — the
    * attach path's single manifest scan. */
  def readFilesAll(spark: SparkSession,
      dirOfName: String): (Seq[(String, Int)], Option[IndexLayout]) = {
    val df = spark.read.parquet(manifestLocation(spark, dirOfName))
    val hasLayout = df.schema.fieldNames.contains("layout")
    val rows = (if (hasLayout) df.select(col("seg"), col("gen"), col("layout"))
                else df.select(col("seg"), col("gen")))
      .orderBy(col("gen")).collect()
    val layout =
      if (!hasLayout) None
      else rows.headOption.flatMap(r => Option(r.getString(2)))
        .filter(_.nonEmpty).map(IndexLayout.decode)
    (rows.map(r => (r.getString(0), r.getInt(1))).toSeq, layout)
  }

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
    * listing the original (warehouse-backed) segment prefixes — with
    * the source's recorded layout carried into the alias manifest.
    * Returns the segment list for any caller-side extras. */
  def attachVersion(spark: SparkSession, dirOfName: String, as: String)(
      attachSeg: String => Unit): Seq[(String, Int)] = {
    val (man, layout) = readFilesAll(spark, dirOfName)
    attachVersionPre(spark, dirOfName, as, man, layout)(attachSeg)
    man
  }

  /** [[attachVersion]] over an ALREADY-READ (manifest, layout) — the
    * callers that read the manifest first (to resolve the layout their
    * attachSeg callback declares) pass it through instead of paying a
    * second parquet scan. */
  def attachVersionPre(spark: SparkSession, dirOfName: String, as: String,
      man: Seq[(String, Int)], layout: Option[IndexLayout])(
      attachSeg: String => Unit): Unit = {
    man.foreach { case (seg, _) => attachSeg(seg) }
    if (as == dirOfName) {
      if (!spark.catalog.tableExists(s"${as}_manifest")) {
        val manLoc = manifestLocation(spark, dirOfName)
        val ddl = spark.read.parquet(manLoc).schema.toDDL
        spark.sql(
          s"CREATE TABLE ${as}_manifest ($ddl) USING parquet LOCATION '$manLoc'")
      }
    } else write(spark, as, man, layout)
  }
}
