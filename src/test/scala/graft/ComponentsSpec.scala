package graft

import graft.operators.dedup.ConnectedComponents

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("min-label propagation finds components incl. chains and isolates") {
    // chain 1-2-3 (non-transitive similarity), pair 10-11, isolate 99
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val nodes = Seq(1L, 2L, 3L, 10L, 11L, 99L).toDF("doc_id")
    val comp = ConnectedComponents(edges, nodes)
      .as[(Long, Long)].collect().toMap
    assert(comp === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 99L -> 99L))
  }

  test("survivors keeps exactly one doc per component") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c"), (7L, "d")).toDF("doc_id", "text")
    val kept = ConnectedComponents.survivors(docs, edges)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 7L))
  }

  test("survivorsBy keeps the best-quality member per component") {
    import org.apache.spark.sql.functions.length
    // component {1,2,3}: 2 is longest → survives over min-id 1;
    // component {10,11}: tie on length → min id 10; isolate 7 passes
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val docs = Seq((1L, "aa"), (2L, "bbbb"), (3L, "c"),
      (10L, "xx"), (11L, "yy"), (7L, "d")).toDF("doc_id", "text")
    val kept = ConnectedComponents.survivorsBy(docs, edges, length($"text"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(2L, 10L, 7L))
    // degenerate: empty edge set → everything is its own component
    val none = spark.emptyDataset[(Long, Long)].toDF("id_a", "id_b")
    assert(ConnectedComponents.survivorsBy(docs, none, length($"text"))
      .count() == 6L)
  }

  test("clusterStats histograms component sizes") {
    // components: {1,2,3} size 3, {10,11} size 2, {20,21} size 2, {99} size 1
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L)).toDF("id_a", "id_b")
    val nodes = Seq(1L, 2L, 3L, 10L, 11L, 20L, 21L, 99L).toDF("doc_id")
    val stats = ConnectedComponents.clusterStats(ConnectedComponents(edges, nodes))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(stats == Map(
      3L -> ((1L, 3L, 1L)),   // one 3-cluster holding 3 docs, min component 1
      2L -> ((2L, 4L, 10L)),  // two 2-clusters holding 4 docs
      1L -> ((1L, 1L, 99L))))
  }

  test("adversarial chain: pointer jumping converges in O(log diameter)") {
    // a 5000-link path graph — the crawl-of-drifting-re-posts shape,
    // where each doc near-dups only its neighbor. Diameter = corpus:
    // neighbor-min alone would need 5000 iterations (and before r14,
    // maxIter=20 returned WRONG labels silently); path halving covers
    // 2^k reach in k rounds, so the default budget is ample.
    val n = 5000
    val edges = spark.range(1, n).select(
      $"id".as("id_a"), ($"id" + 1).as("id_b"))
    val nodes = spark.range(1, n + 1).select($"id".as("doc_id"))
    val comp = ConnectedComponents(edges, nodes)
      .as[(Long, Long)].collect()
    assert(comp.length == n)
    assert(comp.forall(_._2 == 1L), "every node must label to the chain min")
    // and the speedup is real, not slack in the budget: a 200-link
    // chain resolves within 12 rounds (neighbor-min alone needs 199)
    val small = ConnectedComponents(
      spark.range(1, 200).select($"id".as("id_a"), ($"id" + 1).as("id_b")),
      spark.range(1, 201).select($"id".as("doc_id")), maxIter = 12)
      .as[(Long, Long)].collect()
    assert(small.forall(_._2 == 1L))
    // non-convergence is LOUD now, never silently-wrong labels
    intercept[IllegalStateException] {
      ConnectedComponents(
        spark.range(1, 200).select($"id".as("id_a"), ($"id" + 1).as("id_b")),
        spark.range(1, 201).select($"id".as("doc_id")), maxIter = 3).count()
    }
  }
}
