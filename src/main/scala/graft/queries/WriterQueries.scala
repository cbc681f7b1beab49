package graft.queries

import graft.Tables
import graft.sources.Sinks
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle keys for the WRITER surface (SURVEY §2 A16/A17) — the two
  * largest spec-only gaps until r15. Writers are side-effecting, so
  * each key performs its writes into a fresh temp directory inside the
  * query function (the recrawl keys proved the driver gates this shape
  * fine), reads the artifacts back, and returns a deterministic
  * aggregate the DuckDB oracle replays from the source table alone —
  * any dropped/duplicated/mangled row or a broken snapshot pointer
  * shifts a sum and fails the hash compare.
  *
  * Reference: writers/parquet_writer.py (partitioned parquet sink) and
  * writers/iceberg_writer.py (table-format append; graft implements the
  * snapshot-commit semantics in-repo — Sources.scala `Sinks.table`). */
object WriterQueries {

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val zBits = 8
  private val zDims = Seq(("n_chars", 0.0, 5000.0), ("id_mod", 0.0, 1024.0))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A16 — ParquetDataWriter: Hive-partitioned + sorted write and the
    // multi-dim Z-ordered layout, round-tripped. The per-lang aggregate
    // includes the MORTON CODE of every read-back row (the clustering
    // key itself, quantization + bit interleave), so the oracle gates
    // the z-value formula, not just row identity.
    "writer_zorder_roundtrip" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .withColumn("id_mod", pmod(col("doc_id"), lit(1024)).cast("double"))
      val tmp = tmpDir("graft_writer_z")
      Sinks.parquet(docs, s"$tmp/hive", partitionBy = Seq("lang"),
        sortWithin = Seq("doc_id"), maxRecordsPerFile = 100000L)
      Sinks.parquetZOrdered(docs, s"$tmp/z", zDims)
      val z = Sinks.zvalue(
        zDims.map { case (n, lo, hi) => (col(n), lo, hi) }, zBits)
      // read back under the writer's schema: a production reader knows
      // its table schema, and an EMPTY partitioned write leaves no
      // parquet footers to infer one from
      val hive = s.read.option("basePath", s"$tmp/hive")
        .schema(docs.schema).parquet(s"$tmp/hive")
        .groupBy("lang").agg(
          count(lit(1)).as("n"),
          sum("doc_id").as("sum_id"),
          sum("n_chars").as("sum_nchars"),
          sum(z).as("sum_z"))
      val zord = s.read.schema(docs.schema).parquet(s"$tmp/z")
        .groupBy("lang").agg(
          count(lit(1)).as("n_z"),
          sum(z).as("sum_z2"))
      hive.join(zord, "lang")
    }),

    // A17 — snapshot-commit table format: three committed versions
    // (base, MERGE, MERGE), retention down to the last two, then
    // TIME-TRAVEL reads of v2 and the current v3. The oracle replays
    // both versions' contents from the merge formulas; an expire that
    // deleted live data, a torn commit, or a wrong-version read all
    // break the aggregate.
    "writer_snapshot_timetravel" -> ((s, dir) => {
      val cols = Seq("doc_id", "text", "lang", "source", "n_chars").map(col)
      val docs = Tables.load(s, dir, "documents").select(cols: _*)
      val tmp = tmpDir("graft_writer_snap")
      val base = docs.filter(col("doc_id") % 3 =!= 0)
      Sinks.table(base, tmp, partitionBy = Seq("lang"))
      val u1 = docs.filter(col("doc_id") % 2 === 0)
        .withColumn("text", concat(lit("u:"), col("source")))
        .select(cols: _*)
      Sinks.upsertTable(u1, tmp, keyCols = Seq("doc_id"),
        partitionBy = Seq("lang"))
      val u2 = docs.filter(col("doc_id") % 5 === 0)
        .withColumn("text", concat(lit("w:"), col("lang")))
        .withColumn("n_chars", col("n_chars") + 1000L)
        .select(cols: _*)
      Sinks.upsertTable(u2, tmp, keyCols = Seq("doc_id"),
        partitionBy = Seq("lang"))
      Sinks.expireSnapshots(s, tmp, keepLast = 2)
      def agg(df: DataFrame, tag: String) =
        df.groupBy("lang").agg(
          count(lit(1)).as("n"),
          sum("doc_id").as("sum_id"),
          sum(length(col("text"))).as("sum_len"),
          sum("n_chars").as("sum_nchars"))
          .withColumn("snap", lit(tag))
      agg(Sinks.readTable(s, tmp, asOfVersion = Some(2L)), "v2")
        .unionByName(agg(Sinks.readTable(s, tmp), "v3"))
        .select("snap", "lang", "n", "sum_id", "sum_len", "sum_nchars")
    })
  )

  /** DuckDB morton code matching [[Sinks.zvalue]]: per-dim quantize to
    * `zBits` bits of [lo, hi], bit-interleave (disjoint bit positions,
    * so `+` ≡ OR). */
  private def mortonSql(dims: Seq[(String, Double, Double)]): String = {
    val maxQ = (1 << zBits) - 1
    val qs = dims.map { case (x, lo, hi) =>
      s"least(greatest(CAST(round(($x - $lo) / ${hi - lo} * $maxQ) AS BIGINT), 0), $maxQ)"
    }
    val n = dims.size
    (0 until zBits).flatMap { b =>
      qs.zipWithIndex.map { case (q, d) =>
        s"((($q >> $b) & 1) << ${b * n + d})"
      }
    }.mkString(" + ")
  }

  def oracles: Map[String, String] = Map(
    "writer_zorder_roundtrip" -> {
      val z = mortonSql(Seq(("n_chars", 0.0, 5000.0),
        ("(doc_id % 1024)", 0.0, 1024.0)))
      s"""SELECT lang,
         |  CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(doc_id) AS BIGINT) AS sum_id,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_nchars,
         |  CAST(sum($z) AS BIGINT) AS sum_z,
         |  CAST(count(*) AS BIGINT) AS n_z,
         |  CAST(sum($z) AS BIGINT) AS sum_z2
         |FROM documents GROUP BY 1""".stripMargin
    },

    "writer_snapshot_timetravel" ->
      s"""WITH base AS (
         |  SELECT doc_id, text, lang, source, n_chars FROM documents
         |  WHERE doc_id % 3 <> 0),
         |u1 AS (
         |  SELECT doc_id, 'u:' || source AS text, lang, source, n_chars
         |  FROM documents WHERE doc_id % 2 = 0),
         |v2 AS (
         |  SELECT * FROM base WHERE doc_id NOT IN (SELECT doc_id FROM u1)
         |  UNION ALL SELECT * FROM u1),
         |u2 AS (
         |  SELECT doc_id, 'w:' || lang AS text, lang, source,
         |    n_chars + 1000 AS n_chars
         |  FROM documents WHERE doc_id % 5 = 0),
         |v3 AS (
         |  SELECT * FROM v2 WHERE doc_id NOT IN (SELECT doc_id FROM u2)
         |  UNION ALL SELECT * FROM u2)
         |SELECT 'v2' AS snap, lang, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(doc_id) AS BIGINT) AS sum_id,
         |  CAST(sum(length(text)) AS BIGINT) AS sum_len,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_nchars
         |FROM v2 GROUP BY 2
         |UNION ALL
         |SELECT 'v3', lang, CAST(count(*) AS BIGINT),
         |  CAST(sum(doc_id) AS BIGINT),
         |  CAST(sum(length(text)) AS BIGINT),
         |  CAST(sum(n_chars) AS BIGINT)
         |FROM v3 GROUP BY 2""".stripMargin
  )
}
