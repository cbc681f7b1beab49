package graft

import graft.operators.text.DsirSelector
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  // two disjoint vocabularies: "in-domain" A vs "out-of-domain" B
  private def corpus = {
    val a = (1L to 40L).map(i => (i, s"alpha beta gamma delta epsilon alpha beta seq$i"))
    val b = (41L to 80L).map(i => (i, s"zeta eta theta iota kappa zeta eta seq$i"))
    (a ++ b).toDF("doc_id", "text")
  }

  test("in-domain documents outscore out-of-domain ones") {
    val raw = corpus
    val target = raw.filter($"doc_id" <= 40)
    val scores = DsirSelector().scored(raw, target)
      .as[(Long, Double)].collect().toMap
    val aMean = (1L to 40L).map(scores).sum / 40
    val bMean = (41L to 80L).map(scores).sum / 40
    assert(aMean > 0 && bMean < 0 && aMean > bMean + 1.0,
      s"aMean=$aMean bMean=$bMean")
  }

  test("resample is deterministic and partition-invariant") {
    val raw = corpus
    val target = raw.filter($"doc_id" <= 40)
    val r1 = DsirSelector().resample(raw, target, k = 20)
      .as[(Long, Double, Int)].collect().toSet
    val r2 = DsirSelector().resample(raw.repartition(7), target.repartition(3), k = 20)
      .as[(Long, Double, Int)].collect().toSet
    assert(r1 == r2 && r1.size == 20)
  }

  test("the Gumbel draw is importance-biased toward the target domain") {
    val raw = corpus
    val target = raw.filter($"doc_id" <= 40)
    val drawn = DsirSelector().resample(raw, target, k = 20)
      .select("doc_id").as[Long].collect()
    val inDomain = drawn.count(_ <= 40)
    assert(inDomain >= 15, s"only $inDomain/20 drawn from the target domain")
  }

  test("select returns full rows; λ join broadcasts; blank docs score 0") {
    val raw = corpus.union(Seq((81L, "   ")).toDF("doc_id", "text"))
    val target = raw.filter($"doc_id" <= 40)
    val sel = DsirSelector().select(raw, target, k = 10)
    assert(sel.columns.toSeq == Seq("doc_id", "text") && sel.count() == 10)
    val plan = DsirSelector().scored(raw, target)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "λ-table join must broadcast")
    val blank = DsirSelector().scored(raw, target)
      .filter($"doc_id" === 81L).as[(Long, Double)].collect().head
    assert(blank._2 == 0.0)
  }

  test("fastHash lever: same selection semantics, same domain bias") {
    val raw = corpus
    val target = raw.filter($"doc_id" <= 40)
    val sel = DsirSelector(fastHash = true)
    val drawn = sel.resample(raw, target, k = 20)
    assert(drawn.count() == 20)
    // partition-invariant and rerun-stable like the md5 path
    val ids1 = drawn.select("doc_id").as[Long].collect().toSet
    val ids2 = sel.resample(raw.repartition(7), target, k = 20)
      .select("doc_id").as[Long].collect().toSet
    assert(ids1 == ids2)
    // the hashed n-gram model works under any uniform hash: in-domain
    // docs still outscore out-of-domain ones
    val scores = sel.scored(raw, target).as[(Long, Double)].collect().toMap
    val aMean = (1L to 40L).map(scores).sum / 40
    val bMean = (41L to 80L).map(scores).sum / 40
    assert(aMean > bMean + 1.0, s"aMean=$aMean bMean=$bMean")
  }
}
