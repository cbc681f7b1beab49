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
