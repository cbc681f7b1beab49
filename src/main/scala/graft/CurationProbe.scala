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
      if (mode == "1m") ScaleProbe.docs1m(spark, sfDir)
        .repartition(cpus.toInt)
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
    val input = CurationQueries.preppedInput(docs).localCheckpoint(true)
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
    val t00 = System.nanoTime()
    CurationCapstone.ops(benchDir).foreach { case (name, params) =>
      val t0 = System.nanoTime()
      val next0 = Pipeline(Seq(OperatorRegistry.build(name, params)))(cur)
      val an = next0.queryExecution.analyzed
      println(f"PLANSTAT $name%-30s nodes=${an.collect { case _ => 1 }.size}%5d exprs=${exprSize(an)}%8d")
      val next = next0.localCheckpoint(true)
      val out = next.count()
      println(f"STAGE $name%-30s rows_in=$rows rows_out=$out ${(System.nanoTime() - t0) / 1e9}%.1f s")
      cur = next
      rows = out
    }
    println(f"CAPSTONE_STAGED total ${(System.nanoTime() - t00) / 1e9}%.1f s")

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
