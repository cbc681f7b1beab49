package graft

import graft.operators.dedup.ConnectedComponents
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the r14 pointer-jumping components (B21):
  *
  * {{{ SPARK_GRAFT_CPUS=32 tools/jrun.sh -JXmx16g graft.ComponentsProbe [n] }}}
  *
  * Two 1M-node graphs at the two extremes of near-dup shape:
  *
  *   - `cliquish`: 100k 10-node clusters (diameter 9) — the shape real
  *     near-dup corpora produce, where neighbor-min alone was already
  *     fine; measures the overhead the pointer jump adds per round.
  *   - `chain`: ONE 1M-link path (diameter = corpus) — the adversarial
  *     drifting-re-post shape where neighbor-min alone needs 10^6
  *     iterations (pre-r14: silently wrong labels at maxIter=20);
  *     pointer jumping must close it in ~log2(n) rounds.
  *
  * Both runs assert the labeling, not just the wall: every node must
  * reach the true component min. */
object ComponentsProbe {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    def probe(name: String)(f: => Long): Long = {
      val t0 = System.nanoTime()
      val out = f
      println(f"PROBE $name n=$n correct_labels=$out ${(System.nanoTime() - t0) / 1e9}%.1f s")
      out
    }
    val nodes = spark.range(0, n).select(col("id").as("doc_id"))
      .repartition(cpus.toInt).localCheckpoint()

    // 10-node path clusters: component of id must be (id / 10) * 10
    val cliq = spark.range(0, n).filter(col("id") % 10 =!= 9)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    val okCliq = probe("components_cliquish") {
      ConnectedComponents(cliq, nodes)
        .filter(col("component") === (col("doc_id") - pmod(col("doc_id"), lit(10L))))
        .count()
    }
    require(okCliq == n, s"cliquish labeling wrong: $okCliq of $n")

    // one chain over the whole corpus: every component must be 0.
    // maxIter 25 ~ diameter 2^24; neighbor-min alone would need n.
    val chain = spark.range(0, n - 1)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    val okChain = probe("components_chain") {
      ConnectedComponents(chain, nodes, maxIter = 25)
        .filter(col("component") === 0).count()
    }
    require(okChain == n, s"chain labeling wrong: $okChain of $n")
    spark.stop()
  }
}
