package graft

import graft.operators.graph.PageRank

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pagerank: star graph concentrates rank on the hub") {
    // 1..4 all link to 0; 0 links back to 1 (so 0 is not dangling)
    val edges = (Seq((0L, 1L)) ++ (1L to 4L).map(i => (i, 0L)))
      .toDF("src", "dst")
    val nodes = (0L to 4L).toDF("doc_id")
    val ranks = PageRank(iterations = 20)(edges, nodes)
      .as[(Long, Double)].collect().toMap
    assert(ranks(0L) > ranks(1L) && ranks(1L) > ranks(2L))
    // 2,3,4 are symmetric: only base rank + nothing in-bound but base
    assert(ranks(2L) == ranks(3L) && ranks(3L) == ranks(4L))
  }

  test("pagerank: symmetric cycle converges to uniform 1/N") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("src", "dst")
    val nodes = (0L to 2L).toDF("doc_id")
    val ranks = PageRank(iterations = 30)(edges, nodes)
      .as[(Long, Double)].collect().toMap
    for ((_, r) <- ranks) assert(math.abs(r - 1.0 / 3) < 1e-6)
  }

  test("personalized pagerank: authority flows only from the seed set") {
    // 0 (seed) → 1 → 2; 3 is disconnected from the seed, linked from 4
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (4L, 3L), (3L, 4L))
      .toDF("src", "dst")
    val nodes = (0L to 4L).toDF("doc_id")
    val seeds = Seq(0L).toDF("doc_id")
    val ranks = PageRank(iterations = 20)
      .personalized(edges, nodes, seeds)
      .as[(Long, Double)].collect().toMap
    // seed neighborhood holds all the mass, ordered by distance
    assert(ranks(0L) > ranks(1L) && ranks(1L) > ranks(2L) && ranks(2L) > 0)
    // the component unreachable from any seed gets exactly zero
    assert(ranks(3L) == 0.0 && ranks(4L) == 0.0)
  }

  test("pagerank: out-degree splits contribution; isolates keep base rank") {
    // 0 links to both 1 and 2 (each gets r0/2); 3 is isolated
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 0L), (2L, 0L)).toDF("src", "dst")
    val nodes = (0L to 3L).toDF("doc_id")
    val ranks = PageRank(iterations = 1)(edges, nodes)
      .as[(Long, Double)].collect().toMap
    val base = 0.15 / 4
    // after one iteration: node 3 gets only the base term
    assert(math.abs(ranks(3L) - BigDecimal(base).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    // 1 and 2 each receive half of 0's initial 1/4
    assert(ranks(1L) == ranks(2L))
    assert(math.abs(ranks(1L) - (base + 0.85 * 0.25 / 2)) < 1e-6)
  }
}

class HitsSpec extends SparkSpec {
  import graft.operators.graph.Hits
  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("hits: a bipartite hub/authority split scores each side on one axis") {
    // hubs 1..3 each link to authorities 10..12 (complete bipartite):
    // hubs get hub=1/authority=0, authorities the reverse
    val edges = (for (h <- 1L to 3L; a <- 10L to 12L) yield (h, a))
      .toDF("src", "dst")
    val nodes = ((1L to 3L) ++ (10L to 12L)).toDF("doc_id")
    val out = Hits(iterations = 5)(edges, nodes)
      .as[(Long, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    for (h <- 1L to 3L) assert(out(h) == (1.0, 0.0), s"hub $h")
    for (a <- 10L to 12L) assert(out(a) == (0.0, 1.0), s"authority $a")
  }

  test("hits: the best-pointed-at node takes max authority; isolates score 0/0") {
    // 1,2,3 -> 10 ; 1,2 -> 11 ; 1 -> 12 ; 99 isolated
    val edges = Seq((1L, 10L), (2L, 10L), (3L, 10L), (1L, 11L), (2L, 11L),
      (1L, 12L)).toDF("src", "dst")
    val nodes = (Seq(1L, 2L, 3L, 10L, 11L, 12L, 99L)).toDF("doc_id")
    val out = Hits(iterations = 5)(edges, nodes)
      .as[(Long, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(10L)._2 == 1.0)               // most in-links from best hubs
    assert(out(11L)._2 > out(12L)._2)        // 2 hubs beat 1
    assert(out(1L)._1 == 1.0)                // the widest hub normalizes to 1
    assert(out(1L)._1 > out(3L)._1)
    assert(out(99L) == (0.0, 0.0))           // isolated
  }

  test("hits: deterministic across reruns; edgeless graph is all zeros") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("src", "dst")
    val nodes = (1L to 3L).toDF("doc_id")
    val a = Hits()(edges, nodes).collect().toSet
    val b = Hits()(edges, nodes).collect().toSet
    assert(a == b)
    val none = Hits()(edges.limit(0), nodes)
      .agg(sum(abs(col("hub")) + abs(col("authority")))).head().getDouble(0)
    assert(none == 0.0)
  }
}

class ExpectationsSpec extends SparkSpec {
  import graft.operators.Expectations._
  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("every expectation type counts its planted violations exactly") {
    val df = Seq(
      (1L, "a", 10.0, "ok@x.com"),
      (2L, "b", 20.0, "bad"),
      (3L, null.asInstanceOf[String], -5.0, "ok2@x.com"),
      (3L, "d", 200.0, null.asInstanceOf[String]), // dup id, over-range
      (4L, "zz", 30.0, "ok3@x.com")                // not in set
    ).toDF("id", "cat", "v", "email")
    val dim = Seq("a", "b", "d").toDF("k") // "zz" is an orphan
    val byName = report(df, Seq(
      NotNull("cat"),
      Unique(Seq("id")),
      InRange("v", 0.0, 100.0),
      InSet("cat", Seq("a", "b", "d")),
      MatchesRegex("email", "^[^@]+@[^@]+$"),
      RefersTo("cat", dim, "k")))
      .select("expectation", "violations", "pass", "n_rows")
      .as[(String, Long, Boolean, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(byName("not_null")._2 == 1)          // the null cat
    assert(byName("unique")._2 == 1)            // one surplus id-3 row
    assert(byName("in_range")._2 == 2)          // -5 and 200
    assert(byName("in_set")._2 == 1)            // zz (null cat not counted)
    assert(byName("matches_regex")._2 == 1)     // "bad" (null email not counted)
    assert(byName("refers_to")._2 == 1)         // zz orphan (null not counted)
    assert(byName.values.forall(r => r._4 == 5 && !r._3))
  }

  test("unique treats null keys as absent — the count(DISTINCT) convention") {
    // keys [1, null, null]: count(*) − count(DISTINCT key) = 3 − 1 = 2
    // violations (DuckDB's count(DISTINCT o_orderkey) agrees); a
    // struct-wrapped distinct would count null as a value and report 1
    val df = Seq(Some(1L), None, None).toDF("id")
    val rep = report(df, Seq(Unique(Seq("id"))))
      .select("violations").as[Long].head()
    assert(rep == 2L)
    // multi-column: any-null tuples are absent from the distinct count
    val df2 = Seq((Some(1L), "a"), (None, "a"), (Some(1L), "a"))
      .toDF("id", "k")
    assert(report(df2, Seq(Unique(Seq("id", "k"))))
      .select("violations").as[Long].head() == 2L) // 3 − |{(1,a)}| = 2
  }

  test("a clean table passes; the report is one row per expectation") {
    val df = (1L to 50L).map(i => (i, s"u$i")).toDF("id", "name")
    val rep = report(df, Seq(NotNull("id"), Unique(Seq("id", "name")),
      InRange("id", 0.0, 100.0)))
    assert(rep.count() == 3)
    assert(rep.filter(!col("pass")).count() == 0)
  }
}
