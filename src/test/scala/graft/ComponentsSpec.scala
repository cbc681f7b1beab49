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
}
