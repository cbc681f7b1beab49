package graft

import graft.operators.text.DuplicatedSpanRemover
import org.apache.spark.sql.functions._

class SpanRemovalSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], n: Int = 3) =
    DuplicatedSpanRemover(n = n)(rows.toDF("doc_id", "text"))
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("cross-doc duplicated span is cut from the copy, kept in the canonical doc") {
    val out = run(Seq(
      1L -> "a b c d e",
      2L -> "x y a b c z",
      3L -> "u v w q r"))
    assert(out(1L) == (("a b c d e", 5L, 0L)), "canonical occurrence survives whole")
    assert(out(2L) == (("x y z", 6L, 3L)), "the copied span is cut, unique text kept")
    assert(out(3L) == (("u v w q r", 5L, 0L)), "unique doc untouched")
  }

  test("within-doc repetition: later copies cut, first kept") {
    val out = run(Seq(1L -> "p q r s p q r s"))
    assert(out(1L) == (("p q r s", 8L, 4L)))
  }

  test("overlapping duplicated grams merge into one removed run") {
    // docs share a 4-token span → two overlapping dup trigrams in doc 2;
    // covered positions union to one contiguous run of 4
    val out = run(Seq(1L -> "m n o p tail1", 2L -> "head m n o p"))
    assert(out(1L)._1 == "m n o p tail1" && out(1L)._3 == 0L)
    assert(out(2L) == (("head", 5L, 4L)))
  }

  test("deterministic and partition-invariant; normalization applies") {
    val rows = (1L to 50L).map(i =>
      i -> (s"alpha  beta\tgamma doc$i " + (if (i % 2 == 0) "shared span here three" else "")))
    val a = DuplicatedSpanRemover()(rows.toDF("doc_id", "text"))
      .as[(Long, String, Long, Long)].collect().toSet
    val b = DuplicatedSpanRemover()(rows.toDF("doc_id", "text").repartition(13))
      .as[(Long, String, Long, Long)].collect().toSet
    assert(a == b)
    // whitespace collapsed by normalization before tokenizing
    assert(a.find(_._1 == 1L).get._2.startsWith("alpha beta gamma"))
  }

  test("no cartesian or nested-loop join in the plan") {
    val df = (1L to 20L).map(i => i -> s"w$i x y z").toDF("doc_id", "text")
    val plan = DuplicatedSpanRemover()(df).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(500))
  }
}
