package graft

import graft.operators.dedup.{ExactDedup, IncrementalMinHashDedup, MinHashLSH}
import graft.operators.vector.{IncrementalSemanticDedup, IvfIndex}
import graft.pipeline.{Pipeline, RecrawlCapstone, RecrawlOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Day-2 incremental re-crawl composition ([[RecrawlOps]]): the
  * rebuild-equality discipline end-to-end, the multi-batch index-roll
  * corner the equality depends on, the vector-side twin, and the CLI
  * lifecycle (init → ingest → compact) with its crash-idempotence. */
class RecrawlSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")
      .withColumn("source", lit("s")).withColumn("lang", lit("en"))

  // a per-doc chain with no thresholds in the way (the capstone chain's
  // SHAPE, small-corpus-friendly params)
  private val perDoc = Pipeline(Seq(
    graft.pipeline.OperatorRegistry.build("unicode_normalizer", Map.empty),
    graft.pipeline.OperatorRegistry.build("text_length_filter",
      Map[String, Any]("min_length" -> 8))))

  private val lsh = MinHashLSH(shingleSize = 2)

  private def fromScratch(merged: DataFrame): DataFrame = {
    val p = perDoc(merged)
    lsh.copy()(ExactDedup()(p))
  }

  test("incremental day-2 == from-scratch rebuild on the merged corpus") {
    val old = docs(
      1L -> "alpha beta gamma delta epsilon words flow here",
      2L -> "alpha beta gamma delta epsilon words flow here", // exact dup of 1
      3L -> "totally different content about fast boats and rivers",
      4L -> "short") // dropped by the length filter day 1
    val neu = docs(
      1L -> "alpha beta gamma delta epsilon words flow here", // unchanged
      2L -> "alpha beta gamma delta epsilon words flow here", // unchanged
      3L -> "totally different content about quick boats and rivers", // changed
      // 4 removed
      10L -> "alpha beta gamma delta epsilon words flow here", // added exact dup
      11L -> "fresh material that matches nothing else at all today")
    val state = RecrawlOps.init(old, perDoc, lsh)
    val delta = RecrawlOps.delta(old, neu, changedOffset = 100L)
    assert(delta.select("doc_id", "crawl_status").as[(Long, String)]
      .collect().toSet == Set((103L, "changed"), (10L, "added"), (11L, "added")))
    val got = RecrawlOps.ingest(state, delta, perDoc, lsh)
    val day2 = state.curated.unionByName(got.survivors,
      allowMissingColumns = true).select("doc_id").as[Long].collect().toSet
    val merged = old.unionByName(
      neu.withColumn("doc_id", when(col("doc_id") < 10L, col("doc_id") + 100L)
        .otherwise(col("doc_id"))))
    val expect = fromScratch(merged).select("doc_id").as[Long].collect().toSet
    assert(day2 == expect)
    // the exact re-post (10) deduped against the corpus hash set, the
    // fresh page (11) survived — and the changed page (103, a one-word
    // edit of its day-1 self) slipped past this 4-band LSH's S-curve
    // in BOTH paths, which is precisely what the equality above gates:
    // incremental recall == rebuild recall, missed pairs included
    assert(day2 == Set(1L, 3L, 103L, 11L))
  }

  test("multi-batch roll: indexRowsAll keeps stream-order equality, indexRows does not") {
    // need A ~ B, B ~ C, A !~ C (band collision is probabilistic in
    // content, deterministic in hashes) — search driver-side with the
    // operator's exact signature arithmetic for word lists realizing
    // the shape, then assert the operators on the found corpus
    def bandSet(words: Seq[String]): Set[String] = {
      val base = words.sliding(lsh.shingleSize).map(_.mkString(" "))
        .toSeq.distinct.map(s => java.lang.Long.parseLong(
          graft.operators.vector.DeterministicPlanes.md5Hex(s).take(7), 16))
      val sig = (0 until lsh.numHashes).map(i =>
        base.map(x => (x * lsh.coefA(i) + lsh.coefB(i)) % lsh.prime).min)
      sig.grouped(lsh.numHashes / lsh.bands).zipWithIndex.map {
        case (sl, bIdx) => graft.operators.vector.DeterministicPlanes
          .md5Hex(sl.mkString(",") + s":$bIdx")
      }.toSet
    }
    def collide(x: Seq[String], y: Seq[String]) = (bandSet(x) & bandSet(y)).nonEmpty
    val wa = "red green blue yellow purple orange pink teal".split(" ").toSeq
    val bFound = (0 until 200).iterator.map(i =>
      wa.take(5) ++ Seq(s"tail$i", s"mid$i", s"end$i"))
      .find(wb => collide(wa, wb))
    assert(bFound.nonEmpty, "no A~B candidate found in 200 tries")
    val wb = bFound.get
    val cFound = (0 until 500).iterator.map(i =>
      Seq(s"head$i", s"neck$i") ++ wb.drop(2))
      .find(wc => collide(wb, wc) && !collide(wa, wc))
    assert(cFound.nonEmpty, "no B~C, !A~C candidate found in 500 tries")
    val wc = cFound.get
    val (a, b, c) = (docs(1L -> wa.mkString(" ")),
      docs(2L -> wb.mkString(" ")), docs(3L -> wc.mkString(" ")))
    val batchResult = lsh.copy()(a.unionByName(b).unionByName(c))
      .select("doc_id").as[Long].collect().toSet
    assert(batchResult == Set(1L), s"batch operator should keep only A: $batchResult")
    val inc = IncrementalMinHashDedup(lsh)
    val idxA = lsh.buckets(a)
    assert(inc.survivors(idxA, b).count() == 0)
    // the batch operator drops C (collides with the DROPPED B);
    // rolling survivors only would keep it
    assert(inc.survivors(idxA.unionByName(inc.indexRowsAll(b)), c).count() == 0,
      "indexRowsAll must reject C like the batch operator")
    assert(inc.survivors(idxA.unionByName(inc.indexRows(idxA, b)), c).count() == 1,
      "survivors-only roll keeps C (documented divergence)")
  }

  test("vector-side day-2: diff-routed delta + incremental semantic dedup + IVF roll-forward") {
    def vec(axis: Int, eps: Float): Array[Float] = {
      val v = Array.fill(8)(0.0f); v(axis) = 1.0f; v(7) = eps; v
    }
    val centroids = (0 until 4).map { a =>
      (a, Array.tabulate(8)(j => if (j == a) 1.0 else 0.0))
    }.toDF("centroid_id", "cvec")
    val oldV = Seq((1L, vec(0, 0f)), (2L, vec(1, 0f)), (3L, vec(2, 0f)))
      .toDF("vec_id", "embedding")
    // new snapshot: 1 unchanged, 2 changed (tiny nudge), 3 removed,
    // 10 added near-dup of vec 1, 11 added novel direction
    val neuV = Seq((1L, vec(0, 0f)), (2L, vec(1, 0.01f)),
      (10L, vec(0, 0.02f)), (11L, vec(3, 0f))).toDF("vec_id", "embedding")
    // CorpusDiff on a rendered text twin of the payload (the diff only
    // needs a comparable content column)
    val asText = (df: DataFrame) => df.withColumn("text",
      concat_ws(",", col("embedding")))
    val delta = RecrawlOps.delta(asText(oldV), asText(neuV),
      changedOffset = 100L, idCol = "vec_id").drop("text", "crawl_status")
    assert(delta.select("vec_id").as[Long].collect().toSet == Set(102L, 10L, 11L))
    val inc = IncrementalSemanticDedup(threshold = 0.95)
    val index = inc.indexRows(oldV, centroids)
    val surv = inc.survivors(index, delta, centroids)
    // 102 and 10 cosine-collide with indexed 2 and 1; 11 is new
    assert(surv.select("vec_id").as[Long].collect().toSet == Set(11L))
    // IVF index rolls forward with the surviving delta only
    val ivf = IvfIndex()
    ivf.buildIndex(oldV, centroids, "graft_rc_ivf_v0")
    ivf.refreshIndex(surv, "graft_rc_ivf_v0", "graft_rc_ivf_v1")
    val day2Corpus = oldV.unionByName(surv)
    ivf.buildIndex(day2Corpus, centroids, "graft_rc_ivf_full")
    val queries = day2Corpus
    def rows(name: String) = ivf.searchIndexed(spark, name, queries,
      k = 2, nprobe = 2).as[(Long, Long, Double, Int)].collect().toSet
    assert(rows("graft_rc_ivf_v1") == rows("graft_rc_ivf_full"))
  }

  test("CLI lifecycle: recrawl-init -> recrawl-ingest -> compact-index, idempotent re-run") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_recrawl_cli").toString
    val old = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "source", "lang", "text")
    old.write.mode("overwrite").parquet(s"$tmp/old.parquet")
    RecrawlCapstone.deriveNewSnapshot(old)
      .write.mode("overwrite").parquet(s"$tmp/new.parquet")
    val yaml =
      s"""recrawl:
         |  old_path: $tmp/old.parquet
         |  new_path: $tmp/new.parquet
         |  state_dir: $tmp/state
         |  changed_offset: 4000000
         |  shards: 4
         |stages:
         |  - name: perdoc
         |    operators:
         |      - name: unicode_normalizer
         |      - name: text_length_filter
         |        params: {min_length: 100, max_length: 100000}
         |      - name: gopher_quality_filter
         |        params: {min_words: 20, stop_words: [the, a]}
         |data_writer:
         |  type: ParquetDataWriter
         |  params: {output_path: $tmp/out/delta}
         |""".stripMargin
    Main.runRecrawlInit(spark, yaml)
    val day1 = spark.read.parquet(s"$tmp/state/curated").drop("batch")
    Main.runRecrawlIngest(spark, yaml, Array("--batch-id", "day2"))
    // collect eagerly — the re-run below replaces batch=day2's files,
    // so a lazily-held frame over them would hit FILE_NOT_EXIST
    val corpusIds = spark.read.parquet(s"$tmp/state/curated")
      .select("doc_id").as[Long].collect().toSet
    // the committed corpus equals the oracle-gated in-process result
    val neu = spark.read.parquet(s"$tmp/new.parquet")
    val state = RecrawlOps.init(old, RecrawlCapstone.perDoc, RecrawlCapstone.lsh)
    val expect = state.curated.select(old.columns.map(col): _*).unionByName(
      RecrawlOps.ingest(state,
        RecrawlOps.delta(old, neu, RecrawlCapstone.changedOffset),
        RecrawlCapstone.perDoc, RecrawlCapstone.lsh)
        .survivors.select(old.columns.map(col): _*))
    assert(corpusIds == expect.select("doc_id").as[Long].collect().toSet)
    assert(corpusIds.size > day1.count())
    // re-running the same batch id converges to the identical corpus
    Main.runRecrawlIngest(spark, yaml, Array("--batch-id", "day2"))
    assert(spark.read.parquet(s"$tmp/state/curated")
      .select("doc_id").as[Long].collect().toSet == corpusIds)
    // shards committed per batch with a manifest
    assert(spark.read.parquet(s"$tmp/state/shards/batch=day2")
      .columns.contains("pos"))
    // compaction folds base+day2 into one partition, same rows
    Main.runCompactIndex(spark, s"$tmp/state/minhash_index")
    val folded = spark.read.parquet(s"$tmp/state/minhash_index")
    assert(folded.select("batch").distinct().count() == 1)
    Main.runCompactIndex(spark, s"$tmp/state/curated")
    assert(spark.read.parquet(s"$tmp/state/curated")
      .select("doc_id").as[Long].collect().toSet == corpusIds)
  }
}
