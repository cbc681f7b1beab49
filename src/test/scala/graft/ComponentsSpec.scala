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
}
