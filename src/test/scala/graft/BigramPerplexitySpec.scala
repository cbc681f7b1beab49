package graft

import graft.operators.text.BigramPerplexityScorer
import org.apache.spark.sql.functions._

/** [[BigramPerplexityScorer]] against a HAND-COMPUTED corpus — every
  * probability derived on paper, not replayed through the same code.
  *
  * Corpus: d1 = "a b a b", d2 = "a c". Tokens: a×3, b×2, c×1, T = 6
  * ⇒ P_uni(a) = 1/2, P_uni(b) = 1/3, P_uni(c) = 1/6.
  * Bigrams: (a,b)×2, (b,a)×1, (a,c)×1.
  * Histories: a: c(a)=3, N1+=2 ⇒ λ(a) = 0.75·2/3 = 1/2;
  *            b: c(b)=1, N1+=1 ⇒ λ(b) = 0.75.
  *
  * d1 positions: P(a)=1/2; P(b|a)=(2−.75)/3+½·⅓ = 7/12;
  * P(a|b)=(1−.75)/1+.75·½ = 5/8; P(b|a)=7/12
  * ⇒ pp = (½·(7/12)²·⅝)^(−¼) = (245/2304)^(−¼) = 1.7512.
  * d2: P(a)=1/2; P(c|a)=(1−.75)/3+½·⅙ = 1/6
  * ⇒ pp = (1/12)^(−½) = √12 = 3.4641. */
class BigramPerplexitySpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")

  private def ppOf(sc: BigramPerplexityScorer) =
    sc.scores(docs).as[(Long, Double)].collect().toMap

  test("backoff perplexities match the hand computation") {
    val pp = ppOf(BigramPerplexityScorer())
    assert(pp == Map(1L -> 1.7512, 2L -> 3.4641), pp)
  }

  test("capped ≡ uncapped when the true model fits under the caps") {
    assert(ppOf(BigramPerplexityScorer(maxVocab = 3, maxBigrams = 3)) ==
      ppOf(BigramPerplexityScorer()))
  }

  test("pruned bigrams degrade to the λ(h)·P_uni backoff term (hand-computed)") {
    // maxBigrams = 1 keeps only (a,b)×2. Then
    // d1: P(a|b) = max(0−.75,0)/1 + .75·½ = 3/8 (the backoff term alone)
    //   ⇒ pp = (½·(7/12)²·⅜)^(−¼) = 1.9897
    // d2: P(c|a) = ½·⅙ = 1/12 ⇒ pp = (1/24)^(−½) = √24 = 4.899
    val pp = ppOf(BigramPerplexityScorer(maxVocab = 3, maxBigrams = 1))
    assert(pp == Map(1L -> 1.9897, 2L -> 4.899), pp)
  }

  test("a pruned-away history backs off to pure unigram; blank docs drop") {
    // maxVocab = 1 keeps only unigram 'a' and history 'a' (c(a)=3 > c(b)=1).
    // OOV unigrams floor at 1/T = 1/6.
    // d1: P(a)=½; P(b|a)=(2−.75)/3+½·⅙ = 1/2; P(a|b)=P_uni(a)=½ (history
    //     b pruned); P(b|a)=1/2 ⇒ pp = (1/16)^(−¼) = 2.0
    // d2: P(a)=½; P(c|a)=(1−.75)/3+½·⅙ = 1/6 ⇒ pp = √12 = 3.4641
    val pp = ppOf(BigramPerplexityScorer(maxVocab = 1))
    assert(pp == Map(1L -> 2.0, 2L -> 3.4641), pp)
    val withBlank = docs.unionByName(Seq((3L, "   ")).toDF("doc_id", "text"))
    assert(BigramPerplexityScorer().scores(withBlank)
      .filter(col("doc_id") === 3L).count() == 0)
  }

  test("the pruned filter keeps the fluent side of the corpus") {
    // apply() is the semi-join gate: d1 (pp 1.7512) survives a 2.0
    // ceiling, d2 (pp 3.4641) does not
    val kept = BigramPerplexityScorer()(docs, 2.0)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L))
  }
}
