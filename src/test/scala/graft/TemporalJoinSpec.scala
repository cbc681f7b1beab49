package graft

import graft.operators.join.{AsOfJoin, RangeJoin}
import org.apache.spark.sql.functions._

class TemporalJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asof join picks latest right row at-or-before each left ts") {
    val trades = Seq((1L, 10L, "t1"), (1L, 25L, "t2"), (2L, 5L, "t3"))
      .toDF("key", "ts", "trade")
    val quotes = Seq((1L, 10L, 100.0), (1L, 20L, 200.0), (2L, 30L, 300.0))
      .toDF("key", "ts", "px")

    val out = AsOfJoin(Seq("key"), "ts")(trades, quotes, Seq("px"))
      .orderBy("trade")
      .select("trade", "asof_ts", "px").as[(String, Option[Long], Option[Double])]
      .collect()
    assert(out === Array(
      ("t1", Some(10L), Some(100.0)),   // tie at equal ts matches
      ("t2", Some(20L), Some(200.0)),   // latest preceding quote
      ("t3", None, None)))              // no quote at-or-before ts=5
  }

  test("asof join tolerance nulls out stale matches") {
    val l = Seq((1L, 100L, "a")).toDF("key", "ts", "tag")
    val r = Seq((1L, 10L, 1.0)).toDF("key", "ts", "v")
    val out = AsOfJoin(Seq("key"), "ts", toleranceMicros = Some(50L))(l, r, Seq("v"))
    assert(out.select("v").as[Option[Double]].head() === None)
    val ok = AsOfJoin(Seq("key"), "ts", toleranceMicros = Some(90L))(l, r, Seq("v"))
    assert(ok.select("v").as[Option[Double]].head() === Some(1.0))
  }

  test("range join matches points inside intervals only, across buckets") {
    val points = Seq((1L, 5L, "p1"), (1L, 14L, "p2"), (1L, 25L, "p3"), (2L, 5L, "p4"))
      .toDF("key", "pt", "pname")
    val ivals = Seq((1L, 4L, 15L, "i1"), (1L, 20L, 21L, "i2"), (2L, 6L, 9L, "i3"))
      .toDF("key", "t0", "t1", "iname")
    val out = RangeJoin(Seq("key"), bucketWidth = 10L)(points, "pt", ivals, "t0", "t1")
      .select("pname", "iname").as[(String, String)].collect().toSet
    // i1 spans buckets 0 and 1 → catches p1 and p2; p3 outside all; p4 key-2 before i3
    assert(out === Set(("p1", "i1"), ("p2", "i1")))
  }

  test("range join plan is an equi-join, not a nested loop") {
    val points = Seq((1L, 5L)).toDF("key", "pt")
    val ivals = Seq((1L, 4L, 15L)).toDF("key", "t0", "t1")
    val plan = RangeJoin(Seq("key"), 10L)(points, "pt", ivals, "t0", "t1")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }
}
