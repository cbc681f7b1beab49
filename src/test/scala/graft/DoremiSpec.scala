package graft

import graft.operators.text.DoremiMixer

/** [[DoremiMixer]] against a hand-derived update: 2 domains, domain a
  * all excess 1.0, domain b all ≤ 0 (clipped to 0), full-batch
  * sampling ⇒ λ = (1, 0) every round and the multiplicative-weights
  * step has the closed form α''_a = e/(e+1) = 0.73105858…,
  * α1 = 0.99·α'' + 0.005 = (0.728748, 0.271252) at 6 dp. */
class DoremiSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ex = (
    (1 to 4).map(i => (i.toLong, "a", 1.0)) ++
    (5 to 8).map(i => (i.toLong, "b", -1.0))) // negative excess clips to 0
    .toDF("doc_id", "source", "excess_loss")

  private def wmap(df: org.apache.spark.sql.DataFrame) =
    df.as[(String, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("one full-batch round matches the hand-derived update") {
    // B=100 ≥ n ⇒ p=1 everywhere, the sampler is a no-op
    val w = wmap(DoremiMixer(rounds = 1, batchPerRound = 100L).weights(ex))
    assert(w("a") == ((0.728748, 4L)), w)
    assert(w("b") == ((0.271252, 4L)), w)
  }

  test("trajectory mean keeps moving toward the high-excess domain, " +
      "stays a distribution, and replays deterministically") {
    val m = DoremiMixer(rounds = 4, batchPerRound = 100L)
    val w = wmap(m.weights(ex))
    // α_a rises monotonically under a constant positive λ_a, so the
    // 4-round mean exceeds the round-1 value
    assert(w("a")._1 > 0.728748 && w("b")._1 < 0.271252, w)
    assert(math.abs(w("a")._1 + w("b")._1 - 1.0) < 1e-5, w)
    assert(wmap(m.weights(ex)) == w)
  }

  test("trajectory is invariant to loss-table partitioning, including " +
      "a minibatch mean that sits exactly on the 6-dp rounding boundary") {
    // domain a's mean is EXACTLY 0.0000015 (ties at the 6th decimal):
    // a float avg() resolves the tie by summation order; the exact
    // integer-micro-unit mean must round HALF_UP to 0.000002 in every
    // partitioning of the input
    val tied = (
      Seq((1L, "a", 0.000001), (2L, "a", 0.000002)) ++
      (3 to 66).map(i => (i.toLong, "b", 0.1 + (i % 7) * 0.000001)))
      .toDF("doc_id", "source", "excess_loss")
    val m = DoremiMixer(rounds = 4, batchPerRound = 100L)
    val ref = wmap(m.weights(tied))
    for (n <- Seq(1, 8, 64))
      assert(wmap(m.weights(tied.repartition(n))) == ref, s"parts=$n")
  }

  test("weight-proportional sampling (p < 1) gates on the md5 uniform " +
      "and still learns the mixture") {
    val big = (
      (1 to 40).map(i => (i.toLong, "a", 1.0)) ++
      (41 to 80).map(i => (i.toLong, "b", 0.0)))
      .toDF("doc_id", "source", "excess_loss")
    // p_a = min(1, α·20/40) ≈ α/2 < 1: minibataches are real subsets
    val w = wmap(DoremiMixer(rounds = 3, batchPerRound = 20L).weights(big))
    assert(w("a")._1 > w("b")._1, w)
    assert(w("a")._2 == 40L && w("b")._2 == 40L)
  }
}
