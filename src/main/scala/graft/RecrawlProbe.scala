package graft

import graft.pipeline.{OperatorRegistry, Pipeline, RecrawlCapstone, RecrawlOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Day-2 re-crawl probes.
  *
  * {{{
  * graft.RecrawlProbe prep <docs.parquet> <new_snapshot.parquet>
  *     # derive the deterministic "second crawl" (the capstone's
  *     # planted families) — the input the shipped config ingests
  *
  * SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 graft.RecrawlProbe scale
  *     # the batch-cost-independence claim with numbers: one fixed
  *     # delta batch ingested against a 1M-doc corpus state vs a
  *     # 250k subset state, vs the from-scratch rebuild at 1M
  * }}}
  *
  * For the scale probe the replicated corpus gets a per-replica word
  * so replicas are NEAR-dups, not exact ones — otherwise the exact
  * stage collapses 95% of the corpus and both indexes stop growing
  * with corpus size, which would make "independent of corpus size"
  * trivially true instead of measured. */
object RecrawlProbe {

  private def perDocProbe: Pipeline = Pipeline(Seq(
    OperatorRegistry.build("unicode_normalizer", Map.empty),
    OperatorRegistry.build("text_length_filter",
      Map[String, Any]("min_length" -> 100, "max_length" -> 100000)),
    // group-suffixed replica vocabulary has no literal stopwords —
    // disable the stopword rule, keep the rest of the bundle
    OperatorRegistry.build("gopher_quality_filter",
      Map[String, Any]("min_words" -> 20, "min_stop_words" -> 0))))

  def main(args: Array[String]): Unit = args.headOption match {
    case Some("prep") =>
      require(args.length == 3,
        "usage: RecrawlProbe prep <docs.parquet> <out.parquet>")
      val spark = GraftSession.local("graft-recrawl-prep")
      RecrawlCapstone.deriveNewSnapshot(
        spark.read.parquet(args(1)).select("doc_id", "source", "lang", "text"))
        .write.mode("overwrite").parquet(args(2))
      println(s"[graft] second-crawl snapshot -> ${args(2)}")
      spark.stop()
    case Some("scale") => scaleMain()
    case _ => System.err.println(
      "usage: RecrawlProbe prep <docs.parquet> <out.parquet> | scale"); sys.exit(2)
  }

  private def scaleMain(): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tmp = java.nio.file.Files.createTempDirectory("graft_recrawl_scale").toString
    val rep = pmod((col("doc_id") / 10000000L).cast("long"), lit(20L))
    val full = ScaleProbe.docs1m(spark, sfDir).repartition(cpus)
      .withColumn("text", concat(col("text"), lit(" rep"), rep))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val nFull = full.count()
    val quarter = full.filter(rep < 5)
    val nQuarter = quarter.count()
    // one FIXED delta batch (the base table's added families), shared
    // by both ingests: near-dups target group 0's kept vocabulary
    val batch = Tables.load(spark, sfDir, "documents")
      .select((col("doc_id") + 9000000000L).as("doc_id"),
        when(col("doc_id") % 3 === 0, concat(col("text"), lit(" rep0")))
          .when(col("doc_id") % 3 === 1,
            concat(regexp_replace(col("text"), "data", "info"), lit(" rep0")))
          .otherwise(regexp_replace(col("text"),
            "((?:\\S+ ){3}\\S+) ", "$1 crawl2 ")).as("text"),
        col("source")).localCheckpoint()
    val nBatch = batch.count()
    def probe[A](name: String, rowsIn: Long)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val out = f
      println(f"PROBE $name rows_in=$rowsIn rows_out=$out " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    def buildState(corpus: DataFrame, dir: String, n: Long,
        label: String): Unit = probe(s"recrawl_init_$label", n) {
      val st = RecrawlOps.init(corpus, perDocProbe, RecrawlCapstone.lsh)
      st.exactIndex.write.mode("overwrite").parquet(s"$dir/exact_hashes")
      st.bandIndex.write.mode("overwrite").partitionBy("band")
        .parquet(s"$dir/minhash_index")
      st.curated.select("doc_id").write.mode("overwrite")
        .parquet(s"$dir/curated_ids")
      spark.read.parquet(s"$dir/curated_ids").count()
    }
    buildState(full, s"$tmp/full", nFull, "1m")
    buildState(quarter, s"$tmp/quarter", nQuarter, "250k")
    def ingestProbe(label: String, dir: String): Unit =
      probe(s"recrawl_ingest_$label", nBatch) {
        val st = RecrawlOps.State(
          curated = spark.emptyDataFrame,
          exactIndex = spark.read.parquet(s"$dir/exact_hashes"),
          bandIndex = spark.read.parquet(s"$dir/minhash_index"))
        RecrawlOps.ingest(st, batch, perDocProbe, RecrawlCapstone.lsh)
          .survivors.count()
      }
    ingestProbe("1m", s"$tmp/full")
    ingestProbe("250k", s"$tmp/quarter")
    probe("recrawl_rebuild_1m", nFull + nBatch) {
      val merged = full.select("doc_id", "text", "source")
        .unionByName(batch)
      val p = perDocProbe(merged).localCheckpoint()
      val e = graft.operators.dedup.ExactDedup()(p).localCheckpoint()
      RecrawlCapstone.lsh.copy()(e).count()
    }
    // isolate the band-index probe — the ONE ingest step whose cost
    // grew with corpus size (the plain semi join shuffles the full
    // index) — and measure the r14 bucketed-catalog alternative, which
    // reads the index in place and shuffles only the batch
    val inc = graft.operators.dedup.IncrementalMinHashDedup(
      RecrawlCapstone.lsh)
    for ((label, dir) <- Seq("1m" -> s"$tmp/full", "250k" -> s"$tmp/quarter")) {
      val idx = spark.read.parquet(s"$dir/minhash_index")
      val nIdx = idx.count()
      probe(s"band_probe_plain_$label", nIdx) {
        inc.survivors(idx, batch).count()
      }
      probe(s"band_index_build_$label", nIdx) {
        inc.persistIndex(idx, s"graft_band_idx_$label", buckets = cpus)
        spark.table(s"graft_band_idx_$label").count()
      }
      probe(s"band_probe_indexed_$label", nIdx) {
        inc.survivorsIndexed(spark, s"graft_band_idx_$label", batch).count()
      }
    }
    spark.stop()
  }
}
