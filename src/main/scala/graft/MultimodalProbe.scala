package graft

import graft.pipeline.{MultimodalCapstone, OperatorRegistry, Pipeline}
import graft.queries.MultimodalQueries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Multimodal capstone scale probe: the image/audio/video curation
  * chain ([[graft.pipeline.MultimodalCapstone]]) end to end on the sf
  * corpus (`mode=sf`) or the 1M replicated corpus (`mode=1m`:
  * [[ScaleProbe.docs1m]] plus the capstone's three twin families —
  * 1.75M prepped rows).
  *
  * {{{
  * SPARK_GRAFT_CPUS=32 tools/jrun.sh -JXmx48g graft.MultimodalProbe 1m
  * SPARK_GRAFT_CPUS=8  tools/jrun.sh -JXmx48g graft.MultimodalProbe 1m
  * }}}
  *
  * Prints one `STAGE` line per operator (staged execution: per-stage
  * checkpoint + count) and one `MULTIMODAL_FUSED` line (the same chain
  * as ONE lazy DAG, single count — the production mode; the
  * self-referencing dedup ops carry their own internal lineage cuts,
  * so fusion stays linear). */
object MultimodalProbe {

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("sf")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    // 10m only: a materialized wide snapshot is ~45 GB raw (17.5M rows
    // × ~2.5 KB of text+video_src) and the box has ~80 GB free — lz4
    // block compression (~3-4× on this text) keeps input + two live
    // stage persists inside the budget. Left OFF for sf/1m so §5.13's
    // numbers stay comparable.
    val spark = (if (mode == "10m") builder.config("spark.rdd.compress", "true")
      else builder).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs =
      if (mode == "1m") ScaleProbe.docs1m(spark, sfDir).repartition(cpus.toInt)
      // 10m (§5.13 one decade up, the §5.12b protocol): 10× the 1m
      // corpus with the SAME per-group replication factor (reps=20,
      // 100 salt-groups instead of 10) so every dedup layer sees the
      // same dup-rate structure — 17.5M prepped rows after the twins
      else if (mode == "10m")
        ScaleProbe.docs1m(spark, sfDir, groups = 100).repartition(cpus.toInt)
      else Tables.load(spark, sfDir, "documents")

    // materialize the prepped corpus once before any timed run (same
    // reasoning as CurationProbe: measure the pipeline, not the
    // test-corpus synthesis)
    val input = MultimodalQueries.preppedInput(docs).localCheckpoint(true)
    println(s"INPUT rows=${input.count()}")

    // --- fused run first: one lazy DAG, single action (the headline;
    // at 10m the staged run's storage footprint is the risk, so the
    // fused number lands before it). NOTE: the 1m/§5.13 protocol ran
    // staged-first, so cross-scale fused-vs-staged comparisons mix
    // cache orderings — recorded in SURVEY §5.13c's protocol note ---
    val t1 = System.nanoTime()
    val fused = MultimodalCapstone.pipeline(input).count()
    println(f"MULTIMODAL_FUSED rows=$fused ${(System.nanoTime() - t1) / 1e9}%.1f s")

    // --- staged run: per-stage wall. At 10m the 1m protocol's eager
    // localCheckpoint per stage ACCUMULATES ~13 × a 17.5M-row wide
    // snapshot (old checkpoints free only at GC/ContextCleaner pace)
    // and filled the disk; DISK_ONLY persist + explicit unpersist of
    // the parent bounds live storage to two stages. Same
    // materialization-per-stage timing semantics. ---
    var cur = input
    var rows = cur.count()
    val t00 = System.nanoTime()
    MultimodalCapstone.ops.foreach { case (name, params) =>
      val t0 = System.nanoTime()
      val next = Pipeline(Seq(OperatorRegistry.build(name, params)))(cur)
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      val out = next.count()
      println(f"STAGE $name%-32s rows_in=$rows rows_out=$out ${(System.nanoTime() - t0) / 1e9}%.1f s")
      if (cur ne input) cur.unpersist()
      cur = next
      rows = out
    }
    println(f"MULTIMODAL_STAGED total ${(System.nanoTime() - t00) / 1e9}%.1f s")
    spark.stop()
  }
}
