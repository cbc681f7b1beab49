package graft.operators.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Margin-based parallel-corpus (bitext) mining (Artetxe & Schwenk
  * 2019, arXiv:1811.01136 "Margin-based Parallel Corpus Mining with
  * Multilingual Sentence Embeddings" — the CCMatrix/NLLB recipe): given
  * two embedded monolingual sides X and Y, a raw cosine threshold
  * over-mines hub vectors (some embeddings are close to EVERYTHING),
  * so candidates are scored by the cosine RELATIVE to each side's
  * local neighborhood density:
  *
  *   margin(x, y) = cos(x, y) /
  *     ( Σ_{z∈NN_k(x,Y)} cos(x, z) / 2k + Σ_{z∈NN_k(y,X)} cos(y, z) / 2k )
  *
  * (the paper's "ratio" margin; a hub's large denominator suppresses
  * its spurious pairs). Mining strategies: `forward` keeps each x's
  * best-margin y above the threshold; `mutual` (the default — the
  * paper's "intersection") keeps pairs that are BEST FOR BOTH sides,
  * the highest-precision recipe NLLB ships.
  *
  * Composition over the existing exactness baseline: both direction's
  * top-k come from [[BruteForceKnn]] (rounded-cosine, id-tiebroken —
  * engine-exact), candidate pairs are the UNION of the two top-k sets
  * (a pair outside both top-k lists can never be mutual-best), and the
  * margin/argmax layer is two narrow aggregates + one window over
  * ≤ 2k·|X∪Y| candidate rows. At 100 TB the brute-force leg swaps for
  * the banded candidate generators (LSH buckets / IVF probed cells —
  * B7/B8) with THIS margin layer unchanged: margin is a reranker over
  * whatever candidate set the index returns. */
case class MarginBitextMiner(
    k: Int = 4,
    threshold: Double = 1.0,
    strategy: String = "mutual",
    idCol: String = "vec_id",
    vecCol: String = "embedding") {
  require(k >= 1, "k must be >= 1")
  require(Set("mutual", "forward")(strategy), "strategy: mutual|forward")

  /** (x_id, y_id, cos, margin 6dp) for every candidate pair (union of
    * both directions' top-k). Uses [[BruteForceKnn.topKCross]] — the
    * form WITHOUT the self-id guard: the two sides are separate
    * corpora numbered independently, so equal ids are legitimate pairs
    * (a true translation pair sharing an id would otherwise silently
    * vanish from the candidates AND the neighborhood means). */
  def margins(xs: DataFrame, ys: DataFrame): DataFrame = {
    val knn = BruteForceKnn(k, idCol, vecCol)
    val fwd = knn.topKCross(xs, ys) // (qid=x, cid=y, cos, rn)
    val bwd = knn.topKCross(ys, xs) // (qid=y, cid=x, cos, rn)
    val ax = fwd.groupBy(col("qid").as("x_id"))
      .agg(avg(col("cos")).as("__ax"))
    val ay = bwd.groupBy(col("qid").as("y_id"))
      .agg(avg(col("cos")).as("__ay"))
    val pairs = fwd.select(col("qid").as("x_id"), col("cid").as("y_id"),
        col("cos"))
      .unionByName(bwd.select(col("cid").as("x_id"), col("qid").as("y_id"),
        col("cos")))
      .distinct()
    pairs.join(ax, Seq("x_id")).join(ay, Seq("y_id"))
      .select(col("x_id"), col("y_id"), col("cos"),
        round(col("cos") / ((col("__ax") + col("__ay")) / 2.0), 6)
          .as("margin"))
  }

  /** The margin layer over an ARBITRARY candidate set — the 100 TB
    * path made executable: `cands` = (x_id, y_id, cos 6dp) pairs from
    * whatever generator fits the corpus (LSH bucket equi-join, IVF
    * probed cells, a previous crawl's index), never the cross product.
    * Each side's neighborhood mean uses its top-k WITHIN the candidate
    * set (the paper itself scores margins over approximate-kNN
    * neighborhoods); the per-side top-k runs through the salted
    * [[graft.operators.TopK]] rank, so a hub landing in millions of
    * candidate pairs never drags them into one sort partition. When
    * `cands` is the full cross product this is exactly [[margins]]
    * (BitextSpec pins the equivalence). */
  def marginsFromCandidates(candsRaw: DataFrame): DataFrame = {
    // multi-band LSH and IVF multi-probe (the generators named above)
    // emit the same (x_id, y_id) pair once per colliding band/cell; a
    // repeated pair would double-count in the neighborhood means and
    // occupy two top-k slots, skewing margins vs [[margins]] (r16
    // advice). cos is a pure function of the pair, so keep-any is safe.
    val cands = candsRaw.dropDuplicates("x_id", "y_id")
    val fwd = graft.operators.TopK.perGroup(cands,
      group = Seq(col("x_id")),
      order = Seq(col("cos").desc, col("y_id").asc),
      saltOn = col("y_id"), k = k)
    val bwd = graft.operators.TopK.perGroup(cands,
      group = Seq(col("y_id")),
      order = Seq(col("cos").desc, col("x_id").asc),
      saltOn = col("x_id"), k = k)
    val ax = fwd.groupBy("x_id").agg(avg(col("cos")).as("__ax"))
    val ay = bwd.groupBy("y_id").agg(avg(col("cos")).as("__ay"))
    val pairs = fwd.select("x_id", "y_id", "cos")
      .unionByName(bwd.select("x_id", "y_id", "cos"))
      .distinct()
    pairs.join(ax, Seq("x_id")).join(ay, Seq("y_id"))
      .select(col("x_id"), col("y_id"), col("cos"),
        round(col("cos") / ((col("__ax") + col("__ay")) / 2.0), 6)
          .as("margin"))
  }

  /** [[mine]]'s argmax/threshold layer over [[marginsFromCandidates]]. */
  def mineFromCandidates(cands: DataFrame): DataFrame =
    best(marginsFromCandidates(cands))

  /** Mined pairs (x_id, y_id, cos, margin): per-strategy argmax over
    * [[margins]], margin ≥ threshold. Ties break to the smaller
    * partner id (the BruteForceKnn discipline). */
  def mine(xs: DataFrame, ys: DataFrame): DataFrame =
    best(margins(xs, ys))

  private def best(m: DataFrame): DataFrame = {
    val wx = Window.partitionBy("x_id")
      .orderBy(col("margin").desc, col("y_id").asc)
    val fwdBest = m.withColumn("__rx", row_number().over(wx))
      .filter(col("__rx") === 1).drop("__rx")
    val chosen = strategy match {
      case "forward" => fwdBest
      case _ =>
        val wy = Window.partitionBy("y_id")
          .orderBy(col("margin").desc, col("x_id").asc)
        // mutual: x's best y AND y's best x — computed over the SAME
        // candidate margin table, so both argmaxes see identical scores
        val bwdBest = m.withColumn("__ry", row_number().over(wy))
          .filter(col("__ry") === 1)
          .select(col("x_id").as("__bx"), col("y_id").as("__by"))
        fwdBest.join(bwdBest,
          col("x_id") === col("__bx") && col("y_id") === col("__by"))
          .drop("__bx", "__by")
    }
    chosen.filter(col("margin") >= threshold)
      .select("x_id", "y_id", "cos", "margin")
  }
}
