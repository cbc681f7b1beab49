package graft

import graft.operators.image.{PhashHammingDedup, VideoFrameDedup}
import org.apache.spark.sql.functions._

/** Incremental signature probes for the multimodal dedup triad:
  * survivorsIndexed(day-1 index, day-2 batch) ≡ the batch operator over
  * the concatenated corpus restricted to the batch — the unit-level
  * face of the `recrawl_multimodal_corpus` rebuild-equality oracle. */
class MultimodalRecrawlSpec extends SparkSpec {
  import spark.implicits._

  test("PhashHammingDedup.survivorsIndexed ≡ batch operator over the union") {
    val d = PhashHammingDedup(radius = 2, bands = 6, nbits = 60)
    // day-1: three hashes; day-2 batch: one exact copy, one at hamming 1,
    // one at hamming 3 (outside radius), one null, one intra-batch pair
    val old = Seq((1L, 100L), (2L, 2048L), (3L, 999999L))
      .toDF("doc_id", "phash")
    val batch = Seq(
      (10L, Some(100L)),            // distance 0 to indexed -> drop
      (11L, Some(2049L)),           // distance 1 to indexed -> drop
      (12L, Some(999999L ^ 7L)),    // distance 3 -> survives
      (13L, Option.empty[Long]),    // null hash -> passes
      (14L, Some(5000L)), (15L, Some(5001L))) // intra-batch: 15 drops
      .toDF("doc_id", "phash")
    val inc = d.survivorsIndexed(d.indexRows(old), batch)
      .select("doc_id").as[Long].collect().toSet
    val full = d(old.unionByName(batch.select(col("doc_id"),
        col("phash"))))
      .filter(col("doc_id") >= 10L)
      .select("doc_id").as[Long].collect().toSet
    assert(inc == full)
    assert(inc == Set(12L, 13L, 14L))
  }

  test("VideoFrameDedup.survivorsIndexed ≡ batch operator over the union") {
    val d = VideoFrameDedup(n = 8, frameBytes = 16, minMatches = 5,
      maxFrameGroup = 1000)
    def doc(id: Long, base: String) = (id, base * 30)
    val old = Seq(
      doc(1L, "the quick brown fox jumps high "),
      doc(2L, "completely different material here ")).toDF("doc_id", "video")
    val batch = Seq(
      doc(10L, "the quick brown fox jumps high "),   // re-serve of 1 -> drop
      doc(11L, "fresh content nothing matches this "),
      doc(12L, "fresh content nothing matches this ")) // intra-batch dup of 11
      .toDF("doc_id", "video")
    val inc = d.survivorsIndexed(d.indexRows(old), batch)
      .select("doc_id").as[Long].collect().toSet
    val full = d(old.unionByName(batch))
      .filter(col("doc_id") >= 10L)
      .select("doc_id").as[Long].collect().toSet
    assert(inc == full)
    assert(inc == Set(11L))
  }
}
