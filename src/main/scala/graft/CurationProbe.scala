package graft

import graft.pipeline.{CurationCapstone, OperatorRegistry, Pipeline}
import graft.queries.CurationQueries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Capstone scale probe: the full FineWeb-style curation chain
  * ([[graft.pipeline.CurationCapstone]]) end to end, either on the sf
  * corpus (`mode=sf`) or the 1M replicated corpus (`mode=1m`,
  * [[ScaleProbe.docs1m]] plus the capstone's URL/re-crawl variants).
  *
  * {{{
  * SPARK_GRAFT_CPUS=32 tools/jrun.sh -JXmx48g graft.CurationProbe 1m
  * SPARK_GRAFT_CPUS=8  tools/jrun.sh -JXmx48g graft.CurationProbe 1m
  * }}}
  *
  * Prints one `STAGE` line per operator (rows in/out + the stage's own
  * wall seconds under staged execution) and one `CAPSTONE_FUSED` line:
  * the same chain run as ONE lazy DAG (a single count action) — the
  * production mode, where Catalyst fuses the map-only prefix and
  * per-stage wall time does not exist. Also prints plan-size PLANSTAT
  * lines so composition blowups surface here, not in a user's job. */
object CurationProbe {

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("sf")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs =
      if (mode == "1m" || mode == "skew") ScaleProbe.docs1m(spark, sfDir)
        .repartition(cpus.toInt)
        .withColumn("lang", lit("en"))
      // 10m (§5.12 addendum): 10× the 1m corpus with the SAME per-group
      // replication factor (reps=20, 100 salt-groups instead of 10), so
      // every dedup layer sees the same dup-rate structure and the
      // funnel shape is directly comparable one decade up.
      else if (mode == "10m") ScaleProbe.docs1m(spark, sfDir, groups = 100)
        .repartition(cpus.toInt * 4)
        .withColumn("lang", lit("en"))
      else Tables.load(spark, sfDir, "documents")

    // materialize the prepped corpus ONCE before any timed run: a real
    // crawl arrives as stored pages, but preppedInput DERIVES pages
    // with regexp chains — and Catalyst's filter pushdown substitutes
    // a derived column's full expression into every predicate
    // reference below it, so an un-materialized input makes every
    // fused-mode filter re-run the derivation per reference (measured:
    // the k=4 fused prefix went 47 s → 259 s on the raw expressions).
    // The checkpoint makes the probe measure the pipeline, not the
    // test-corpus synthesis.
    // `skew` mode (§5.15): the adversarial content-farm corpus — every
    // operator has a skew story alone; this is the CAPSTONE under skew.
    //   - ONE domain owns 50% of the corpus (source/url overridden to
    //     'farm'; ~5 pages share each canonical farm URL, so the URL
    //     keep-first sees fat groups AND the per-source stages see one
    //     giant group);
    //   - ONE near-dup cluster owns 10% (1e5 members at 1M): identical
    //     boilerplate pages salted with a per-doc token INSIDE a kept
    //     C4 line (a trailing salt would be line-stripped and the
    //     cluster would collapse at exact dedup instead of stressing
    //     the minhash machinery).
    val boiler = Seq(
      "the farm network covers a fresh market story today.",
      "every outlet in the group runs a syndicated copy.",
      "readers see the same nine words with a tweak.",
      "the page template repeats across a thousand domains daily.",
      "advertising fills the rest of a long scrolling page.")
      .mkString("\n")
    val prepped0 = CurationQueries.preppedInput(docs)
    val prepped = if (mode != "skew") prepped0 else prepped0
      .withColumn("source",
        when(col("doc_id") % 2 === 0, lit("farm")).otherwise(col("source")))
      .withColumn("url",
        when(col("doc_id") % 2 === 0, concat(
          lit("https://www.farm.example.com/p/"),
          pmod(col("doc_id"), lit(100000L)))).otherwise(col("url")))
      .withColumn("text",
        when(col("doc_id") % 10 === 3, concat(lit(boiler),
          lit("\nuniq"), col("doc_id"),
          lit(" closes the syndicated farm story page.")))
          .otherwise(col("text")))
    val input = prepped.localCheckpoint(true)
    val benchDir = java.nio.file.Files
      .createTempDirectory("graft_capstone_bench").toString
    CurationQueries.benchmarkFrame(
      Tables.load(spark, sfDir, "documents")).write
      .mode("overwrite").parquet(benchDir)

    // --- staged run: per-stage wall + plan-size stats ---
    def exprSize(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Long =
      p.collect { case n =>
        n.expressions.map(e => e.collect { case _ => 1 }.size.toLong).sum
      }.sum
    var cur = input // already checkpointed above
    var rows = cur.count()
    val stash = scala.collection.mutable.Map[String, org.apache.spark.sql.DataFrame]()
    val t00 = System.nanoTime()
    CurationCapstone.ops(benchDir).foreach { case (name, params) =>
      val t0 = System.nanoTime()
      val next0 = Pipeline(Seq(OperatorRegistry.build(name, params)))(cur)
      val an = next0.queryExecution.analyzed
      println(f"PLANSTAT $name%-30s nodes=${an.collect { case _ => 1 }.size}%5d exprs=${exprSize(an)}%8d")
      val next = next0.localCheckpoint(true)
      val out = next.count()
      println(f"STAGE $name%-30s rows_in=$rows rows_out=$out ${(System.nanoTime() - t0) / 1e9}%.1f s")
      if (mode == "skew") stash(name) = next
      cur = next
      rows = out
    }
    println(f"CAPSTONE_STAGED total ${(System.nanoTime() - t00) / 1e9}%.1f s")

    // --- skew diagnostics: where the adversarial mass actually lands ---
    if (mode == "skew") {
      def timed[A](label: String)(f: => String): Unit = {
        val t0 = System.nanoTime()
        val r = f
        println(f"SKEW $label%-28s $r ${(System.nanoTime() - t0) / 1e9}%.1f s")
      }
      // URL keep-first group fan: the farm's shared canonical URLs
      timed("url_groups") {
        val g = input.select(
            graft.functions.UrlFns.canonicalizeUrl(col("url")).as("c"))
          .groupBy("c").count().agg(
            max("count").as("mx"),
            sum(when(col("count") > 1, lit(1)).otherwise(lit(0))).as("fat"))
          .head()
        s"max_group=${g.getLong(0)} groups_gt1=${g.getLong(1)}"
      }
      // minhash bucket mass entering the survivor dedup (stage-7 out)
      val lsh = graft.operators.dedup.MinHashLSH()
      val s7 = stash("text_exact_deduplicator")
      val sizes = lsh.buckets(s7).groupBy("band", "bucket")
        .agg(count(lit(1)).as("n")).localCheckpoint(true)
      timed("minhash_buckets") {
        val r = sizes.agg(max("n").as("mx"),
          sum(when(col("n") > lsh.maxBucketSize, lit(1)).otherwise(lit(0)))
            .as("over_cap"),
          sum(when(col("n") > lsh.maxBucketSize,
            (col("n") * (col("n") - 1) / 2).cast("long")).otherwise(lit(0L)))
            .as("pairs_averted")).head()
        s"max_bucket=${r.getLong(0)} over_cap=${r.getLong(1)} " +
          s"pairs_averted=${r.getLong(2)}"
      }
      timed("capped_pairs") {
        s"pairs=${lsh.candidatePairsFromBuckets(lsh.buckets(s7)).count()}"
      }
      // the per-source mass entering the top-fraction percentile gate
      timed("source_groups") {
        val g = stash("decontaminator").groupBy("source").count()
          .orderBy(col("count").desc).limit(3).collect()
          .map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(",")
        s"top3[$g]"
      }
      timed("farm_survivors") {
        val g = stash("top_fraction_by_group")
          .groupBy(col("source") === "farm").count().collect()
          .map(r => s"farm=${r.getBoolean(0)}:${r.getLong(1)}").mkString(",")
        g
      }
    }

    // --- fused-prefix breakdown: count() of the first k ops as one
    // lazy DAG — localizes which composed segment pays recompute ---
    if (sys.env.get("SPARK_GRAFT_FUSED_STEPS").contains("1")) {
      val allOps = CurationCapstone.ops(benchDir)
      for (k <- 1 to allOps.size) {
        val tk = System.nanoTime()
        val nk = Pipeline(allOps.take(k)
          .map { case (nm, p) => OperatorRegistry.build(nm, p) })(input).count()
        println(f"FUSED_PREFIX k=$k%2d through=${allOps(k - 1)._1}%-30s rows=$nk ${(System.nanoTime() - tk) / 1e9}%.1f s")
      }
    }

    // --- fused run: one lazy DAG, single action ---
    val t1 = System.nanoTime()
    val n = CurationCapstone.pipeline(benchDir)(input).count()
    println(f"CAPSTONE_FUSED rows_out=$n ${(System.nanoTime() - t1) / 1e9}%.1f s cores=$cpus")

    // --- per-doc rejection audit: the provenance pass (staged run +
    // one narrow id anti-join per stage; no driver-side ids) ---
    if (args.contains("audit")) {
      val t2 = System.nanoTime()
      val byStage = CurationCapstone.pipeline(benchDir)
        .rejectionAudit(input)
        .groupBy("stage_idx", "rejected_by").count()
        .orderBy("stage_idx").collect()
      println(f"CAPSTONE_AUDIT total ${(System.nanoTime() - t2) / 1e9}%.1f s cores=$cpus")
      byStage.foreach(r => println(s"AUDIT ${r.getInt(0)} ${r.getString(1)} ${r.getLong(2)}"))
    }
    spark.stop()
  }
}
