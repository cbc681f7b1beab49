package graft

import graft.operators.text.TokenBudgetSampler
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** `sampleSharded` probe at its design point (SURVEY §5): a corpus
  * where ONE source holds ~half the documents, so the per-source
  * running-sum window of [[TokenBudgetSampler.sample]] sorts that
  * source on a single task. Reports wall time AND the longest single
  * task of each run — the straggler metric sharding exists to shrink:
  * on a 32-thread local box the wall moves little (other cores stay
  * busy), but on a 1000-executor cluster the job ends when the last
  * window-sort task does, so max-task IS the cluster-scale wall.
  *
  * `sampleSharded(_, _, _, 1)` selects the identical document set as
  * the unsharded `sample`, so shards=1 doubles as the baseline.
  *
  * {{{ graft.ShardProbe <docsDir> <shards>... }}}
  */
object ShardProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ShardProbe <docsDir> <shards>...")
    val dir = args(0)
    val spark = GraftSession.local("graft-shard-probe")
    // per-stage max task duration: the window-sort straggler must not
    // hide behind a similarly-sized scan or join stage
    val stageMax = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        stageMax.merge(t.stageId, t.taskInfo.duration, math.max(_, _))
    })
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source", "text")
    val bySource = docs.groupBy("source").count().orderBy(desc("count"))
      .collect().map(r => s"${r.getString(0)}=${r.getLong(1)}")
    println(s"SHARD_PROBE corpus rows=${docs.count()} ${bySource.mkString(" ")}")
    // warmup: shared JVM paths (scan, codegen, shuffle, window)
    TokenBudgetSampler().sampleSharded(docs.limit(2000),
      graft.functions.TextFns.wsTokenCount(col("text")),
      Map.empty, shards = 2, defaultBudget = 10000L).count()
    args.drop(1).foreach { arg =>
      val shards = arg.toInt
      stageMax.clear()
      System.gc()
      val t0 = System.nanoTime()
      // budget doesn't change the sort cost (the running sum covers the
      // whole partition before the filter); it only sizes the output
      val kept = TokenBudgetSampler().sampleSharded(docs,
        graft.functions.TextFns.wsTokenCount(col("text")),
        Map.empty, shards = shards, defaultBudget = 2000000L).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // SparkListener events arrive on an async bus: the straggler
      // task's TaskEnd (the headline metric) can land AFTER count()
      // returns. Poll until the map is stable across two 150 ms
      // snapshots (bounded at ~3 s) before reading it; wall above is
      // unaffected (timed before the settle).
      import scala.jdk.CollectionConverters._
      var settle = 0
      var prev = Map.empty[Int, Long]
      while (settle < 20 && { val cur = stageMax.asScala.toMap
        val same = cur == prev && cur.nonEmpty; prev = cur; !same }) {
        Thread.sleep(150); settle += 1
      }
      val stages = stageMax.asScala.toSeq.sortBy(-_._2).take(4)
        .map { case (sid, ms) => f"stage$sid=${ms / 1000.0}%.2f" }
      println(f"SHARD_PROBE shards=$shards kept=$kept wall=$wall%.1f s " +
        s"max_task_by_stage_s: ${stages.mkString(" ")}")
    }
    spark.stop()
  }
}
