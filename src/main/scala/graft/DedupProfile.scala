package graft

import graft.operators.dedup.NgramJaccard
import org.apache.spark.sql.functions._

/** Candidate-funnel profile for the low-τ jaccard recipe — the numbers
  * behind `dedup_ngram_jaccard`'s bench cost (SURVEY §5: the toy
  * corpus's shared vocabulary produces a high background similarity,
  * so the funnel, not the wall clock, is what says whether the
  * operator is doing avoidable work).
  *
  * Prints one line per stage: docs → LSH band-bucket candidate pairs →
  * pairs surviving the (lossless) size-ratio prefilter → exact-verified
  * pairs ≥ τ.
  *
  * {{{ graft.DedupProfile <tableDir> [tau=0.2] [n=3] }}}
  */
object DedupProfile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: DedupProfile <tableDir> [tau] [n] [numHashes bands]")
    val dir = args(0)
    val tau = if (args.length > 1) args(1).toDouble else 0.2
    val n = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.local("graft-dedup-profile")
    val docs = Tables.load(spark, dir, "documents")
    val nj = NgramJaccard(n, tau)
    val lsh =
      if (args.length > 4)
        graft.operators.dedup.MinHashLSH(args(3).toInt, args(4).toInt, n)
      else nj.lowTauLsh
    val tWall0 = System.nanoTime()
    val ex = lsh.shingleHashes(docs).localCheckpoint()
    val nDocs = ex.select(nj.idCol).distinct().count()
    val cand = lsh.candidatePairsFromHashes(ex).localCheckpoint()
    val nCand = cand.count()
    val sizes = ex.groupBy(nj.idCol).agg(count(lit(1)).as("sz"))
    val nSized = cand
      .join(sizes.select(col(nj.idCol).as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(sizes.select(col(nj.idCol).as("id_b"), col("sz").as("sz_b")), "id_b")
      .filter(least(col("sz_a"), col("sz_b")).cast("double") >=
        lit(tau) * greatest(col("sz_a"), col("sz_b")).cast("double"))
      .count()
    val nVerified = nj.minhashVerifiedPairs(docs, lsh).count()
    val wall = (System.nanoTime() - tWall0) / 1e9
    println(f"DEDUP_PROFILE wall=$wall%.1f dir=$dir tau=$tau n=$n " +
      f"numHashes=${lsh.numHashes} rows_per_band=${lsh.numHashes / lsh.bands} " +
      f"bands=${lsh.bands} " +
      f"docs=$nDocs candidates=$nCand size_prefiltered=$nSized " +
      f"verified=$nVerified cand_per_doc=${nCand.toDouble / nDocs}%.1f " +
      f"prefilter_kill=${100.0 * (nCand - nSized) / math.max(nCand, 1)}%.1f%% " +
      f"verify_yield=${100.0 * nVerified / math.max(nSized, 1)}%.1f%%")
    spark.stop()
  }
}
