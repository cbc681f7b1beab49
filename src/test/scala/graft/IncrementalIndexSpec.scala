package graft

import graft.operators.dedup.{IncrementalMinHashDedup, MinHashLSH}
import org.apache.spark.sql.functions._

/** The persisted BUCKETED band index for incremental near-dup dedup:
  * result parity with the plain-DataFrame probe, the roll-forward
  * (append) equality with the batch operator across batches, and the
  * layout claim itself — the batch probe joins the index with NO
  * Exchange above the index scan (only the batch side shuffles), so
  * ingest cost stops growing with corpus size. */
class IncrementalIndexSpec extends SparkSpec {
  import spark.implicits._

  private val lsh = MinHashLSH(shingleSize = 2)
  private val inc = IncrementalMinHashDedup(lsh)

  private def corpus = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta"),
    (2L, "alpha beta gamma delta epsilon zeta eta iota"), // near-dup of 1
    (3L, "completely different text about boats on rivers"),
    (4L, "yet another unrelated document mentioning mountains"),
    (5L, "alpha beta gamma delta epsilon zeta eta theta now"), // near-dup of 1
    (6L, "fresh content nothing shares a shingle with at all"),
    (7L, "completely different text about boats on rivers again")
  ).toDF("doc_id", "text")

  test("survivorsIndexed ≡ survivors (same collisions, same cap semantics)") {
    val old = corpus.filter($"doc_id" <= 3)
    val batch = corpus.filter($"doc_id" > 3)
    inc.persistIndex(lsh.buckets(old), "graft_inc_spec_idx", buckets = 4)
    val direct = inc.survivors(lsh.buckets(old), batch)
      .select("doc_id").as[Long].collect().toSet
    val indexed = inc.survivorsIndexed(spark, "graft_inc_spec_idx", batch)
      .select("doc_id").as[Long].collect().toSet
    assert(indexed == direct)
    // 5 collides with indexed 1, 7 with indexed 3; 4 and 6 survive
    assert(indexed == Set(4L, 6L))
  }

  test("appendIndex roll-forward: two batches ≡ the batch operator on the union") {
    val day0 = corpus.filter($"doc_id" <= 2)
    val b1 = corpus.filter($"doc_id" > 2 && $"doc_id" <= 5)
    val b2 = corpus.filter($"doc_id" > 5)
    inc.persistIndex(lsh.buckets(day0), "graft_inc_roll_idx", buckets = 4)
    // collect BEFORE the append — the probe is lazy over the live table
    val s1 = inc.survivorsIndexed(spark, "graft_inc_roll_idx", b1)
      .select("doc_id").as[Long].collect().toSet
    // indexRowsAll discipline: the index carries EVERY reaching doc's
    // buckets, so a later doc colliding with a dropped doc still drops
    inc.appendIndex(inc.indexRowsAll(b1), "graft_inc_roll_idx")
    val s2 = inc.survivorsIndexed(spark, "graft_inc_roll_idx", b2)
      .select("doc_id").as[Long].collect().toSet
    val streamed = s1 ++ s2
    // batch reference: keep-first over everything after day0's keeps
    val batchAll = lsh(corpus).select("doc_id").as[Long].collect().toSet
    val day0Kept = lsh(day0).select("doc_id").as[Long].collect().toSet
    assert(streamed == batchAll -- day0Kept)
  }

  test("the batch probe never shuffles the index side (bucketed scan)") {
    inc.persistIndex(lsh.buckets(corpus.filter($"doc_id" <= 3)),
      "graft_inc_plan_idx", buckets = 4)
    val batch = corpus.filter($"doc_id" > 3)
    val bb = lsh.buckets(batch).localCheckpoint()
    val hit = spark.table("graft_inc_plan_idx").select("band", "bucket")
      .join(bb.hint("shuffle_hash"), Seq("band", "bucket"))
    hit.collect() // materialize so AQE settles the final plan
    // the adaptive plan string appends an "== Initial Plan ==" section
    // that repeats every node — audit only the final plan
    val plan = hit.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // exactly ONE Exchange (the batch side); the index reads bucketed
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected only the batch-side Exchange:\n$plan")
    assert(plan.contains("Bucketed: true"), s"index scan not bucketed:\n$plan")
    // the hint lands the hash build on the batch side, not the corpus
    assert(plan.contains("ShuffledHashJoin"), plan)
  }
}
