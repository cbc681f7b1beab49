package graft.operators.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate candidate graph by
  * min-label propagation: every node ends up labeled with the smallest
  * id reachable from it, so "keep one doc per component" dedup is a
  * `component === id` filter afterwards.
  *
  * Greedy keep-first (drop any doc bucketed with a smaller id) removes
  * too much when similarity is non-transitive; components are the
  * standard fix (the MinHash pipelines in RefinedWeb/SlimPajama cluster
  * candidates before choosing survivors).
  *
  * Scale shape: each iteration is one neighbor-min join + one POINTER
  * JUMP (adopt your label's label — path halving) + one
  * map-side-combined groupBy over the narrow (node, label) table — no
  * driver-side graph, state bounded by the node count. Neighbor-min
  * alone needs O(graph diameter) iterations, which is fine for the
  * cliquish graphs real near-dup corpora produce (2–4) but silently
  * WRONG past maxIter on an adversarial CHAIN — a crawl of gradually
  * drifting re-posts where each doc near-dups only its neighbor builds
  * a path graph whose diameter is the corpus. The pointer jump
  * contracts label paths geometrically (the large-star idea from the
  * MapReduce-CC literature, r14), so convergence is O(log diameter):
  * 20 iterations cover a diameter of ~2^20 instead of 20. Failure to
  * converge now THROWS instead of returning wrong labels. The
  * convergence check is an aggregate (sum of label changes), the
  * only driver-visible value per iteration.
  */
object ConnectedComponents {

  /** @param edges (srcCol, dstCol) undirected candidate pairs
    * @param nodes one row per node id (isolated nodes keep their own id)
    * @return (id, component) — component = min reachable node id */
  def apply(edges: DataFrame, nodes: DataFrame, idCol: String = "doc_id",
      srcCol: String = "id_a", dstCol: String = "id_b",
      maxIter: Int = 20): DataFrame = {
    // materialize the candidate edges once — the upstream pipeline
    // (MinHash signatures etc.) must not recompute on every iteration.
    // localCheckpoint stores on executor disks; swap for a reliable
    // checkpoint dir if executor loss matters mid-job.
    // HASH-PARTITIONED BY `v` before the checkpoint: the neighbor-min
    // join below keys on v every iteration and the checkpointed RDD
    // keeps its partitioning, so the (largest) edge table is shuffled
    // ONCE here instead of once per iteration — only the narrow labels
    // side moves after that.
    val sym = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .union(edges.select(col(dstCol).as("u"), col(srcCol).as("v")))
      .repartition(col("v"))
      .localCheckpoint(eager = true)
    var labels = nodes.select(col(idCol).as("u"), col(idCol).as("lbl"))
    var iter = 0
    var converged = false
    // labels only ever decrease, so the total label sum is strictly
    // monotone until the fixpoint — equality of consecutive sums IS the
    // convergence test (one aggregate per iteration, no compare join).
    // Detection needs one extra no-change round, which runs OUTSIDE the
    // maxIter budget (`<= maxIter`): a graph reaching its fixpoint
    // exactly at iteration maxIter still confirms and returns instead
    // of throwing on a correct labeling.
    var prevSum: java.math.BigDecimal = null
    while (iter <= maxIter && !converged) {
      // each node takes the min of its own label and its neighbors'
      val viaNeighbors = sym.join(labels.withColumnRenamed("u", "v"), "v")
        .select(col("u"), col("lbl"))
      val afterNeighbors = labels.union(viaNeighbors)
        .groupBy("u").agg(min("lbl").as("lbl"))
      // pointer jump: adopt your label's label (every label IS a node
      // id, so the self-join always hits). lbl(u) stays reachable from
      // u — lbl(u) is reachable and lbl(lbl(u)) is reachable from it —
      // so the fixpoint is unchanged; label paths halve per round,
      // turning O(diameter) neighbor propagation into O(log diameter)
      val byLabel = afterNeighbors
        .select(col("u").as("__ju"), col("lbl").as("__jlbl"))
      val jumped = afterNeighbors.join(byLabel, col("lbl") === col("__ju"))
        .select(col("u"), least(col("lbl"), col("__jlbl")).as("lbl"))
      // lazy checkpoint: the convergence aggregate below materializes it,
      // so each iteration is ONE job (checkpoint + sum together) while
      // still truncating the growing lineage for the next round
      val next = jumped.localCheckpoint(eager = false)
      // cast BEFORE aggregating: a Long sum over 64-bit hash ids can
      // wrap at billion-row scale (silently with ANSI off), and a wrap
      // collision between two differing consecutive sums would fake
      // convergence — the exact silent-wrong-labels failure the throw
      // below exists to eliminate. decimal(38,0) addition is exact.
      val s = next.agg(sum(col("lbl").cast("decimal(38,0)"))).head().getDecimal(0)
      labels = next
      converged = s == prevSum || (prevSum != null && s.compareTo(prevSum) == 0)
      prevSum = s
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter iterations " +
          "(plus the confirming round) — diameter > ~2^maxIter is not a " +
          "realistic near-dup graph; raise maxIter if yours genuinely is")
    labels.select(col("u").as(idCol), col("lbl").as("component"))
  }

  /** One survivor per component (the component's min id). */
  def survivors(df: DataFrame, edges: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val comp = apply(edges, df.select(idCol), idCol)
    df.join(comp.filter(col(idCol) === col("component")).select(idCol),
      Seq(idCol), "left_semi")
  }

  /** One survivor per component chosen by QUALITY: the member
    * maximizing `score` (ties: smallest id) — the RefinedWeb/FineWeb
    * "keep the best copy" rule instead of keep-first min-id, so a
    * boilerplate stub never shadows the full article it near-matches.
    *
    * Scale shape: `score` evaluates map-side on the corpus, the
    * component labels join on the narrow id, and the selection is one
    * `max_by` aggregate per component (lexicographic (score, −id)
    * struct — deterministic without a window over the corpus); the
    * full rows return via LEFT SEMI, so the wide payload never sorts
    * or shuffles beyond the id join. */
  def survivorsBy(df: DataFrame, edges: DataFrame,
      score: org.apache.spark.sql.Column,
      idCol: String = "doc_id"): DataFrame = {
    val comp = apply(edges, df.select(idCol), idCol)
    val scored = df.select(col(idCol), score.as("__q")).join(comp, Seq(idCol))
    val best = scored.groupBy("component")
      .agg(max_by(col(idCol),
        struct(col("__q"), (-col(idCol)).as("__nid"))).as(idCol))
    df.join(best.select(idCol), Seq(idCol), "left_semi")
  }

  /** Dedup audit report: the cluster-SIZE histogram of a component
    * labeling — (cluster_size, n_clusters, n_docs, min_component) —
    * the first thing to eyeball after a near-dup pass (a fat tail of
    * giant clusters usually means boilerplate, not real duplication;
    * SlimPajama/FineWeb both publish exactly this table). Two chained
    * map-side-combinable aggregates over the narrow (id, component)
    * labels; output rows are bounded by the largest cluster size. */
  def clusterStats(labels: DataFrame): DataFrame =
    labels.groupBy("component").agg(count(lit(1)).as("cluster_size"))
      .groupBy("cluster_size")
      .agg(count(lit(1)).as("n_clusters"),
        (count(lit(1)) * col("cluster_size")).as("n_docs"),
        min("component").as("min_component"))
}
