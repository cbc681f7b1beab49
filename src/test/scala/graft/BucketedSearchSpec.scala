package graft

import graft.operators.text.Bm25
import org.apache.spark.sql.functions._

/** The persisted BM25 index artifact: result parity with the
  * from-scratch search, and the layout claim itself — postings⋈vocab
  * joins with NO Exchange and NO Sort (bucketed + sorted by term, one
  * file per bucket). */
class BucketedSearchSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple banana plum"),
    (2L, "apple cherry cherry plus some extra words here"),
    (3L, "durian and a longer tail of words to vary lengths"),
    (4L, "apple apple apple apple banana"),
    (5L, "cherry banana durian apple")
  ).toDF("doc_id", "text")

  private val q = Seq((10L, "apple cherry"), (11L, "durian banana"))
    .toDF("query_id", "text")

  test("searchIndexed reproduces search exactly from the persisted tables") {
    val bm = Bm25()
    bm.buildIndex(docs, "graft_bm25_spec")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "doc_id", "score", "rnk")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(rows(bm.searchIndexed(spark, "graft_bm25_spec", q, k = 5)) ==
      rows(bm.search(docs, q, k = 5)))
  }

  test("segment lens/stats derived from postings keep token-less docs") {
    // writeSegment no longer re-tokenizes for lens/stats: dl = Σ tf from
    // the persisted postings, re-joined to the doc ids. Empty text still
    // tokenizes to [""] (one posting, dl = 1 — size(terms) parity) and a
    // NULL text yields no postings and a null dl, while stats' count(*)
    // counts BOTH docs. Search parity over such a corpus is the gate.
    val weird = docs.unionByName(Seq(
        (6L, ""), (7L, "   ")).toDF("doc_id", "text"))
      .unionByName(Seq(Tuple1(8L)).toDF("doc_id")
        .withColumn("text", lit(null).cast("string")))
    val bm = Bm25()
    bm.buildIndex(weird, "graft_bm25_weird")
    val lens = spark.table("graft_bm25_weird_seg_lens")
      .as[(Long, Option[Int])].collect().toMap
    assert(lens(6L).contains(1), "empty text tokenizes to one empty token")
    assert(lens(8L).isEmpty, "null text carries a null dl")
    val st = spark.table("graft_bm25_weird_seg_stats")
      .as[(Long, Long)].collect().head
    assert(st._1 == 8L, "stats n counts every doc incl. token-less")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "doc_id", "score", "rnk")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(rows(bm.searchIndexed(spark, "graft_bm25_weird", q, k = 5)) ==
      rows(bm.search(weird, q, k = 5)))
  }

  test("refreshIndex: rolled-forward index ≡ full rebuild; old version intact") {
    val bm = Bm25()
    bm.buildIndex(docs.filter($"doc_id" <= 3), "graft_bm25_r0")
    val oldRows = bm.searchIndexed(spark, "graft_bm25_r0", q, k = 5)
      .collect().toSet
    bm.refreshIndex(docs.filter($"doc_id" > 3), "graft_bm25_r0",
      "graft_bm25_r1")
    def rows(name: String) = bm.searchIndexed(spark, name, q, k = 5)
      .select("query_id", "doc_id", "score", "rnk")
      .as[(Long, Long, Double, Int)].collect().toSet
    bm.buildIndex(docs, "graft_bm25_full")
    assert(rows("graft_bm25_r1") == rows("graft_bm25_full"))
    // a crashed refresh can never corrupt the live index: v0 unchanged
    assert(bm.searchIndexed(spark, "graft_bm25_r0", q, k = 5)
      .collect().toSet == oldRows)
    intercept[IllegalArgumentException] {
      bm.refreshIndex(docs, "graft_bm25_r0", "graft_bm25_r0")
    }
    // O(batch) roll-forward: the new version SHARES v0's segment by
    // reference (manifest lists it) instead of rewriting the corpus
    assert(bm.segments(spark, "graft_bm25_r1") ==
      Seq("graft_bm25_r0_seg", "graft_bm25_r1_seg"))
  }

  test("compactIndex folds segments into one; results unchanged") {
    val bm = Bm25()
    bm.buildIndex(docs.filter($"doc_id" <= 2), "graft_bm25_c0")
    bm.refreshIndex(docs.filter($"doc_id" === 3), "graft_bm25_c0",
      "graft_bm25_c1")
    bm.refreshIndex(docs.filter($"doc_id" > 3), "graft_bm25_c1",
      "graft_bm25_c2")
    assert(bm.segments(spark, "graft_bm25_c2").size == 3)
    bm.compactIndex(spark, "graft_bm25_c2", "graft_bm25_cz")
    assert(bm.segments(spark, "graft_bm25_cz").size == 1)
    def rows(name: String) = bm.searchIndexed(spark, name, q, k = 5)
      .select("query_id", "doc_id", "score", "rnk")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(rows("graft_bm25_cz") == rows("graft_bm25_c2"))
    // pre-compaction versions stay readable (immutability)
    assert(rows("graft_bm25_c1").nonEmpty)
  }

  test("postings ⋈ vocab on the persisted index is Exchange- and Sort-free") {
    val bm = Bm25()
    bm.buildIndex(docs, "graft_bm25_plan")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // sorted-bucket scans only expose their ordering behind this flag
    // (off by default since Spark 3.0 because multi-file buckets would
    // need a merge; buildIndex writes exactly one file per bucket)
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try {
      val j = spark.table("graft_bm25_plan_seg_postings")
        .join(spark.table("graft_bm25_plan_seg_vocab"), "term")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketing not used:\n$plan")
      val sorts = plan.split("\n")
        .count(l => l.contains("Sort ") && !l.contains("SortMergeJoin"))
      assert(sorts == 0, s"sorted-bucket scan not used:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
    }
  }

  test("attachIndex re-registers the on-disk index, merge join stays Exchange-free") {
    val bm = Bm25()
    bm.buildIndex(docs, "graft_bm25_att")
    bm.attachIndex(spark, "graft_bm25_att", "graft_bm25_att2")
    def rows(name: String) = bm.searchIndexed(spark, name, q, k = 5)
      .select("query_id", "doc_id", "score", "rnk")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(rows("graft_bm25_att2") == rows("graft_bm25_att"))
    // the durable alias manifest must list only warehouse-backed
    // segment prefixes — the fresh-session resolvability invariant
    // (listing catalog-only <as>_seg<i> alias tables broke any later
    // session's attach of the alias)
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val fs = new org.apache.hadoop.fs.Path(wh)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.read.parquet(s"$wh/graft_bm25_att2_manifest").collect().foreach { r =>
      val seg = r.getString(0)
      assert(fs.exists(new org.apache.hadoop.fs.Path(
        s"$wh/${seg.toLowerCase}_postings")), s"unbacked manifest entry $seg")
    }
    // FRESH-SESSION simulation: copy the index dirs to a prefix this
    // session's catalog has never seen (data on disk, no catalog
    // entries — what a new session faces), attach, and serve; the
    // attached external tables carry the re-declared bucketing
    val conf = spark.sparkContext.hadoopConfiguration
    // clear leftover destinations first: the warehouse persists across
    // sbt runs and FileUtil.copy into an existing dir nests under the
    // previous run's stale files
    for (t <- Seq("postings", "vocab", "lens", "stats")) {
      fs.delete(new org.apache.hadoop.fs.Path(
        s"$wh/graft_bm25_att7_seg_$t"), true)
      org.apache.hadoop.fs.FileUtil.copy(fs,
        new org.apache.hadoop.fs.Path(s"$wh/graft_bm25_att_seg_$t"), fs,
        new org.apache.hadoop.fs.Path(s"$wh/graft_bm25_att7_seg_$t"),
        false, conf)
    }
    spark.read.parquet(s"$wh/graft_bm25_att_manifest")
      .selectExpr("'graft_bm25_att7_seg' AS seg", "gen", "layout").coalesce(1)
      .write.mode("overwrite").parquet(s"$wh/graft_bm25_att7_manifest")
    bm.attachIndex(spark, "graft_bm25_att7", "graft_bm25_att7")
    assert(rows("graft_bm25_att7") == rows("graft_bm25_att"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try {
      val plan = spark.table("graft_bm25_att7_seg_postings")
        .join(spark.table("graft_bm25_att7_seg_vocab"), "term")
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"re-declared bucketing not used:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
    }
  }

  test("attachIndex survives a crashed process's manifest residue") {
    // a KILLED run leaves warehouse dirs with no catalog entry; the
    // alias's manifest CTAS used to fail LOCATION_ALREADY_EXISTS on
    // them (hit by an interrupted test run) — catalog-unknown manifest
    // residue is unreachable garbage and must be cleared, not fatal
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val p = new org.apache.hadoop.fs.Path(s"$wh/graft_bm25_att4_manifest")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.sql("DROP TABLE IF EXISTS graft_bm25_att4_manifest")
    fs.mkdirs(p)
    val junk = fs.create(new org.apache.hadoop.fs.Path(p, "part-junk.parquet"), true)
    junk.write("residue".getBytes("UTF-8")); junk.close()
    val bm = Bm25()
    bm.buildIndex(docs, "graft_bm25_att3")
    bm.attachIndex(spark, "graft_bm25_att3", "graft_bm25_att4")
    def rows(name: String) = bm.searchIndexed(spark, name, q, k = 5)
      .select("query_id", "doc_id", "score", "rnk")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(rows("graft_bm25_att4") == rows("graft_bm25_att3"))
  }
}
