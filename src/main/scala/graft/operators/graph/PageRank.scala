package graft.operators.graph

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** PageRank over a link graph — the URL quality prior web-corpus
  * pipelines rank crawl frontiers and weight domains with (Common
  * Crawl publishes harmonic/PageRank centrality per host; RefinedWeb
  * seeds its quality sources from link-authority lists). Fixed
  * iteration count (rank_0 = 1/N; rank' = (1−d)/N + d·Σ_in rank/out°)
  * so any engine replaying the formula converges to identical values —
  * no convergence-threshold nondeterminism across engines.
  *
  * Scale shape: per iteration ONE hash join of the (src, dst) edge
  * table against the (node, rank) table on src — both sides keyed the
  * same way every iteration, so Spark reuses the hash partitioning —
  * and one map-side-combinable sum by dst; out-degrees compute once
  * and ride the edge table. State is |V| rows, lineage truncated per
  * iteration (localCheckpoint), exactly the ConnectedComponents loop
  * discipline. No driver-side graph, no windows.
  *
  * Dangling nodes (no out-links) are kept as rank SINKS (their mass
  * leaks, the "remove dangling mass" convention): engine-portable
  * without a per-iteration global aggregate; pass a dangling-free
  * graph (or add self-loops) when conservation matters. */
case class PageRank(
    iterations: Int = 5,
    damping: Double = 0.85,
    srcCol: String = "src",
    dstCol: String = "dst") {

  /** @param edges directed (src, dst) links
    * @param nodes one row per node id (isolated nodes keep base rank)
    * @return (node, rank) — rank rounded to `roundDp` at OUTPUT only
    *         (iterations run full double) */
  def apply(edges: DataFrame, nodes: DataFrame, idCol: String = "doc_id",
      roundDp: Int = 6): DataFrame = {
    val n = nodes.count().toDouble
    val tele = nodes.select(col(idCol).as("__node"), lit(1.0 / n).as("__t"))
    run(edges, tele, idCol, roundDp)
  }

  /** Personalized PageRank / TrustRank (Gyöngyi 2004): teleport mass
    * restricted to a SEED set — the actual quality-source propagation
    * pipelines use (seed trusted domains, let authority flow outward;
    * RefinedWeb's quality-source lists are exactly such seeds). Same
    * loop, teleport vector 1/|S| on seeds and 0 elsewhere; non-seed
    * pages earn rank only through links from trusted neighborhoods. */
  def personalized(edges: DataFrame, nodes: DataFrame, seeds: DataFrame,
      idCol: String = "doc_id", roundDp: Int = 6): DataFrame = {
    val nS = seeds.count().toDouble
    val tele = nodes.select(col(idCol).as("__node"))
      .join(seeds.select(col(idCol).as("__node"))
          .withColumn("__s", lit(1.0 / nS)),
        Seq("__node"), "left_outer")
      .select(col("__node"), coalesce(col("__s"), lit(0.0)).as("__t"))
    run(edges, tele, idCol, roundDp)
  }

  /** Shared loop: rank' = (1−d)·teleport + d·Σ_in rank/out°;
    * rank_0 = teleport. */
  private def run(edges: DataFrame, tele: DataFrame, idCol: String,
      roundDp: Int): DataFrame = {
    val withDeg = edges.select(col(srcCol), col(dstCol))
      .join(edges.groupBy(srcCol).agg(count(lit(1)).as("__deg")), Seq(srcCol))
      .localCheckpoint(eager = true)
    val teleC = tele.localCheckpoint(eager = true)
    var ranks = teleC.select(col("__node"), col("__t").as("__r"))
    var i = 0
    while (i < iterations) {
      val contribs = withDeg
        .join(ranks, withDeg(srcCol) === ranks("__node"))
        .select(col(dstCol).as("__node"), (col("__r") / col("__deg")).as("__c"))
        .groupBy("__node").agg(sum("__c").as("__in"))
      ranks = teleC
        .join(contribs, Seq("__node"), "left_outer")
        .select(col("__node"),
          (lit(1.0 - damping) * col("__t") +
            lit(damping) * coalesce(col("__in"), lit(0.0))).as("__r"))
        .localCheckpoint(eager = false)
      i += 1
    }
    ranks.select(col("__node").as(idCol), round(col("__r"), roundDp).as("rank"))
  }
}
