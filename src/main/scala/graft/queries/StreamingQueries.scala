package graft.queries

import graft.Tables
import graft.pipeline.{OperatorRegistry, Pipeline}
import graft.streaming.StreamingCuration
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle key for the STREAMING layer (SURVEY §2 B64/C8/C15 — spec-only
  * until r15): the continuous-curation capstone actually RUNS inside
  * the query function — a real micro-batch FileStreamSource over the sf
  * documents table, split into id-ranged files delivered one per
  * trigger (mtimes force oldest-first pickup, so batches arrive in id
  * order — the convergence contract), through the per-doc chain with
  * observe nodes, the watermark-bounded streaming near-dup state, and
  * the idempotent per-batch sink — and the key returns the CONVERGED
  * survivor union. The DuckDB oracle replays the equivalent batch
  * chain: length filter → band collision keep-first (+ the short-doc
  * content-hash branch).
  *
  * Streaming near-dup semantics replayed exactly: a doc drops iff it
  * shares any band digest with a smaller-id doc reaching the stage —
  * NO bucket-size cap (the stateful one-winner-per-band layout never
  * materializes a bucket, so unlike the batch operator there is
  * nothing to cap). */
object StreamingQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "streaming_curation_converged" -> ((s, dir) => {
      import org.apache.hadoop.fs.Path
      val docs = Tables.load(s, dir, "documents").select("doc_id", "text")
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_stream_cur").toString
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(tmp), s.sparkContext.hadoopConfiguration)
      // 4 id-RANGED source files with ascending mtimes: one micro-batch
      // each (maxFilesPerTrigger=1), ids strictly increasing across
      // batches — the order under which streamed ≡ batch keep-first
      val maxId = docs.agg(max("doc_id")).head().getLong(0)
      val nSplits = 4
      val step = maxId / nSplits + 1
      val srcDir = s"$tmp/src"
      fs.mkdirs(new Path(srcDir))
      for (i <- 0 until nSplits) {
        val part = docs
          .filter(col("doc_id") >= i * step && col("doc_id") < (i + 1) * step)
          // deterministic event time derived from the id (documents has
          // no timestamp column); the spread (≤ maxId seconds) sits far
          // inside the watermark, so no state is evicted mid-run
          .withColumn("ts",
            timestamp_seconds(lit(1700000000L) + col("doc_id")))
        val stage = s"$tmp/stage$i"
        part.coalesce(1).write.mode("overwrite").parquet(stage)
        val f = fs.listStatus(new Path(stage)).map(_.getPath)
          .filter(_.getName.endsWith(".parquet")).head
        val dst = new Path(srcDir, f"part$i%04d.parquet")
        fs.rename(f, dst)
        fs.setTimes(dst, 1700000000000L + i * 60000L, -1)
      }
      val schema = s.read.parquet(srcDir).schema
      val in = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
      val perDoc = Pipeline(Seq(OperatorRegistry.build("text_length_filter",
        Map[String, Any]("min_length" -> 100, "max_length" -> 2000))))
      val sc = StreamingCuration(perDoc, DedupQueries.mh,
        watermark = "30 days")
      val (q, _) = sc.start(in, s"$tmp/out", s"$tmp/ckpt")
      try q.processAllAvailable() finally q.stop()
      s.read.parquet(s"$tmp/out").select("doc_id")
    })
  )

  def oracles: Map[String, String] = Map(
    "streaming_curation_converged" -> {
      val norm = DedupQueries.normSql
      s"""WITH f AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE length(text) BETWEEN 100 AND 2000),
         |${DedupQueries.mhSigSqlFrom("f")},
         |${DedupQueries.bandsSql},
         |rejected AS (
         |  SELECT DISTINCT b.doc_id
         |  FROM buckets a JOIN buckets b
         |    ON a.band = b.band AND a.bucket = b.bucket
         |    AND a.doc_id < b.doc_id),
         |shorts AS (
         |  SELECT doc_id FROM f
         |  WHERE len(string_split($norm, ' ')) < ${DedupQueries.mh.shingleSize}),
         |shorts_kept AS (
         |  SELECT min(doc_id) AS doc_id FROM f
         |  WHERE doc_id IN (SELECT doc_id FROM shorts)
         |  GROUP BY md5($norm))
         |SELECT doc_id FROM f
         |WHERE (doc_id NOT IN (SELECT doc_id FROM shorts)
         |       AND doc_id NOT IN (SELECT doc_id FROM rejected))
         |   OR doc_id IN (SELECT doc_id FROM shorts_kept)""".stripMargin
    }
  )
}
