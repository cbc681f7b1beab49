package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin matches plain join results") {
    val left = ((1 to 500).map(i => ("hot", i.toLong)) ++
      (1 to 50).map(i => ("cold", i.toLong))).toDF("k", "v")
    val right = Seq(("hot", 10.0), ("cold", 20.0)).toDF("k", "w")
    val plain = left.join(right, "k").agg(sum($"v" * $"w")).as[Double].head()
    val salted = Skew.saltedJoin(left, right, "k", factor = 8)
      .agg(sum($"v" * $"w")).as[Double].head()
    assert(plain == salted)
  }

  test("saltedAgg two-phase equals direct aggregation") {
    val df = ((1 to 1000).map(i => ("hot", i.toLong)) ++
      (1 to 10).map(i => ("cold", i.toLong))).toDF("k", "v")
    val direct = df.groupBy("k").agg(sum("v").as("v"))
      .as[(String, Long)].collect().toMap
    val salted = Skew.saltedAgg(df, "k", 8,
      Seq(("v", (c: org.apache.spark.sql.Column) => sum(c),
        (c: org.apache.spark.sql.Column) => sum(c))))
      .as[(String, Long)].collect().toMap
    assert(direct == salted)
  }

  test("formatReport renders the funnel") {
    val p = graft.pipeline.Pipeline(Nil)
    val rpt = p.formatReport(Seq("input" -> 1000L, "filter" -> 800L, "dedup" -> 700L), 2.0)
    assert(rpt.contains("Input: 1,000 -> Output: 700 (70.0% pass)"))
    assert(rpt.contains("filter"))
    assert(rpt.contains("80.0% pass"))
  }
}
