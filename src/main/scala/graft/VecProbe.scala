package graft

import graft.operators.vector.{IvfIndex, SemanticDedup}
import org.apache.spark.sql.functions._

/** Vector-family scale probe: time nearest-centroid assignment and
  * cluster-scoped semantic dedup over a [[ScaleData.vectors]] corpus at
  * several cluster counts k. SemDeDup's costs pull in opposite
  * directions in k — brute-force assignment is Θ(n·k) while the
  * in-cluster candidate pairs are Θ(n²/k) — so the right k at a given
  * corpus size is an empirical crossover, and this main measures it
  * instead of guessing. Centroids are the corpus's first k vectors
  * (the oracle convention; training them with MLlib changes the
  * centroid QUALITY, not the probed plan costs).
  *
  * The corpus plants one near-dup per 5 ids (20% of rows), so the
  * reported kept-count doubles as a recall check: kept ≈ 0.8·n when
  * clustering places each planted pair together.
  *
  * Each k arg is `k` (uncapped semantics at the default cap) or
  * `k:cap` to probe a `maxClusterSize` lever setting — the salted
  * sub-split cap that bounds an oversized cluster's quadratic pair
  * stream.
  *
  * {{{ graft.VecProbe <dir> <threshold> <k[:cap]>... }}}
  */
object VecProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: VecProbe <dir> <threshold> <k[:cap]>...")
    val dir = args(0)
    val threshold = args(1).toDouble
    val ks = args.drop(2).map { a =>
      a.split(":") match {
        case Array(k) => (k.toInt, 1 << 16)
        case Array(k, cap) => (k.toInt, cap.toInt)
      }
    }.toSeq
    val spark = GraftSession.local("graft-vecprobe")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    emb.selectExpr("max(vec_id)").collect() // warm the scan path
    def timed(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      System.gc()
      val t0 = System.nanoTime()
      val rows = df.queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val mx = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      println(f"$label,$sec%.1f,$rows,load=${mx.getSystemLoadAverage}%.1f")
    }
    ks.foreach { case (k, cap) =>
      val cents = emb.filter(col("vec_id") < k)
        .select(col("vec_id").cast("int").as("centroid_id"),
          transform(col("embedding"), x => x.cast("double")).as("cvec"))
      timed(s"assign_k$k")(IvfIndex().assign(emb, cents))
      timed(s"semdedup_k${k}_cap$cap")(
        SemanticDedup(threshold, maxClusterSize = cap).kept(emb, cents))
    }
    spark.stop()
  }
}
