package graft.operators.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS hubs & authorities (Kleinberg 1999, JACM 46(5)) — the second
  * classic link-centrality prior next to [[PageRank]]: an AUTHORITY is
  * a page pointed to by good hubs (the quality-content signal a crawl
  * frontier wants), a HUB is a page pointing at good authorities (the
  * link-list/directory signal — useful for seed discovery, near-spam
  * when excessive). Fixed iteration count with MAX-normalization each
  * half-step: a' = (Σ_in h)/max, h' = (Σ_out a')/max. Normalizing by
  * the max rather than the L2 norm keeps the scaling decision a pure
  * comparison — no engine-ordered float summation over the whole
  * vector — so any engine replaying the formula reproduces the values
  * (the PageRank fixed-iteration determinism argument; per-node Σ_in
  * sums are degree-bounded, the same tolerance page_rank's oracle
  * already proves at 6 dp).
  *
  * Scale shape: per half-step ONE hash join of the edge table against
  * the |V|-row score table (keyed src then dst — each side reuses its
  * partitioning across iterations) + one map-side-combinable sum; the
  * max is a 1-row aggregate attached back as a broadcast (the
  * Winsorizer bounds shape). State is |V| rows, lineage truncated per
  * iteration — the ConnectedComponents loop discipline. No driver-side
  * graph. Nodes with no in-links score authority 0 (no out-links → hub
  * 0); a graph with NO edges at all returns all zeros. */
case class Hits(
    iterations: Int = 5,
    srcCol: String = "src",
    dstCol: String = "dst") {
  require(iterations >= 1, "iterations must be >= 1")

  /** @param edges directed (src, dst) links
    * @param nodes one row per node id (isolated nodes score 0/0)
    * @return (node, hub, authority) rounded to `roundDp` at OUTPUT only */
  def apply(edges: DataFrame, nodes: DataFrame, idCol: String = "doc_id",
      roundDp: Int = 6): DataFrame = {
    val e = edges.select(col(srcCol), col(dstCol)).localCheckpoint(eager = true)
    // h_0 = 1 on every node that has an out-link (isolated nodes can
    // never earn score; seeding them just adds join rows)
    var h = e.select(col(srcCol).as("__node")).distinct()
      .withColumn("__h", lit(1.0))
    var a: DataFrame = null
    var i = 0
    while (i < iterations) {
      // each raw-sum table is referenced twice (the max aggregate and
      // the normalized scores) — checkpoint it so the |E|⋈|V| join
      // runs once per half-step, not once per reference (and the final
      // authority join reads the checkpointed last `a` rather than
      // re-deriving the whole chain)
      val aRaw = e.join(h, e(srcCol) === h("__node"))
        .select(col(dstCol).as("__node"), col("__h"))
        .groupBy("__node").agg(sum("__h").as("__raw"))
        .localCheckpoint(eager = false)
      val aMax = aRaw.agg(max("__raw").as("__m"))
      a = aRaw.crossJoin(broadcast(aMax))
        .select(col("__node"), (col("__raw") / col("__m")).as("__a"))
        .localCheckpoint(eager = false)
      val hRaw = e.join(a, e(dstCol) === a("__node"))
        .select(col(srcCol).as("__node"), col("__a"))
        .groupBy("__node").agg(sum("__a").as("__raw"))
        .localCheckpoint(eager = false)
      val hMax = hRaw.agg(max("__raw").as("__m"))
      h = hRaw.crossJoin(broadcast(hMax))
        .select(col("__node"), (col("__raw") / col("__m")).as("__h"))
        .localCheckpoint(eager = false)
      i += 1
    }
    nodes.select(col(idCol))
      .join(h.withColumnRenamed("__node", idCol), Seq(idCol), "left_outer")
      .join(a.withColumnRenamed("__node", idCol), Seq(idCol), "left_outer")
      .select(col(idCol),
        round(coalesce(col("__h"), lit(0.0)), roundDp).as("hub"),
        round(coalesce(col("__a"), lit(0.0)), roundDp).as("authority"))
  }
}
