package graft

import graft.operators.dedup.SoftDedup
import org.apache.spark.sql.functions._

/** Soft (reweighting) dedup: commonness = mean trigram df, weight =
  * commonness^(−α), Gumbel-top-k sampling ∝ weight. */
class SoftDedupSpec extends SparkSpec {
  import spark.implicits._

  private val uniqueTexts = Seq(
    "alpha beta gamma delta epsilon zeta",
    "one two three four five six seven",
    "red orange yellow green blue indigo violet")

  test("k-plicates weigh k^(-alpha); unique docs keep weight 1") {
    // doc 0 unique; docs 1-3 verbatim triplicate; doc 4/5 duplicate
    val docs = Seq(
      (0L, uniqueTexts(0)),
      (1L, uniqueTexts(1)), (2L, uniqueTexts(1)), (3L, uniqueTexts(1)),
      (4L, uniqueTexts(2)), (5L, uniqueTexts(2))
    ).toDF("doc_id", "text")
    val w = SoftDedup(n = 3).weights(docs)
      .as[(Long, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(w(0L) == ((1.0, 1.0)))
    for (id <- Seq(1L, 2L, 3L)) assert(w(id) == ((3.0, BigDecimal(1.0 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    for (id <- Seq(4L, 5L)) assert(w(id) == ((2.0, 0.5)))
    // alpha = 0.5 softens: weight = k^(-1/2)
    val w05 = SoftDedup(n = 3, alpha = 0.5).weights(docs)
      .as[(Long, Double, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(math.abs(w05(1L) - BigDecimal(math.pow(3.0, -0.5))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("partial overlap lands between the pure cases; short docs floor at 1") {
    val docs = Seq(
      (0L, "alpha beta gamma delta"),              // shares "alpha beta gamma"
      (1L, "alpha beta gamma omega psi"),          // with doc 0
      (2L, "totally different words here now"),
      (3L, "xy")                                   // < 3 tokens: no trigrams
    ).toDF("doc_id", "text")
    val w = SoftDedup(n = 3).weights(docs)
      .as[(Long, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // doc 0: trigrams {a b g (df 2), b g d (df 1)} -> commonness 1.5
    assert(w(0L)._1 == 1.5)
    assert(w(2L) == ((1.0, 1.0)))
    assert(w(3L) == ((1.0, 1.0)))
    assert(w(1L)._1 > 1.0 && w(1L)._1 < 2.0)
    // weight strictly decreases with commonness
    assert(w(2L)._2 > w(0L)._2)
  }

  test("sample: deterministic, ranked by the replayable Gumbel-perturbed weight") {
    val docs = (0L until 60L).map { i =>
      // 20 docs of fully doc-specific trigrams (a shared template would
      // leak df across the "unique" side) + one 40-plicate family
      if (i < 20) (i, s"u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f")
      else (i, "the same repeated boilerplate text appears again and again")
    }.toDF("doc_id", "text")
    val sd = SoftDedup(n = 3)
    val s1 = sd.sample(docs, k = 15).as[(Long, Double, Double, Int)].collect()
    val s2 = sd.sample(docs, k = 15).as[(Long, Double, Double, Int)].collect()
    assert(s1.toSeq == s2.toSeq) // rerun-stable
    assert(s1.length == 15 && s1.map(_._4).sorted.toSeq == (1 to 15))
    // reference draw computed independently from collected weights
    val w = sd.weights(docs).as[(Long, Double, Double)].collect()
    def gum(id: Long): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:graft:soft".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(6)
      val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / 16777216.0
      BigDecimal(-math.log(-math.log(u)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val want = w.map { case (id, _, wt) =>
      (id, BigDecimal(math.log(wt) + gum(id))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy { case (id, adj) => (-adj, id) }.take(15).map(_._1).toSeq
    assert(s1.sortBy(_._4).map(_._1).toSeq == want)
    // the unique fifth of the corpus dominates the draw (weights 1.0
    // vs 0.025): boilerplate survivors should be the clear minority
    val boilerplate = s1.count(_._1 >= 20L)
    assert(boilerplate < 5, s"boilerplate over-sampled: $boilerplate of 15")
  }
}
