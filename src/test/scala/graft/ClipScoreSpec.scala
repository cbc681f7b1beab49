package graft

import graft.operators.image.BatchInference
import graft.operators.ml.{CrossModalAlignment, TrainedEmbedding}
import org.apache.spark.sql.functions._

class ClipScoreSpec extends SparkSpec {
  import spark.implicits._

  private def pairs = Seq(
    // aligned: caption is the image payload's own text
    (1L, "the quick brown fox jumps over the lazy dog", "the quick brown fox jumps over the lazy dog"),
    (2L, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa", "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),
    // misaligned: caption statistics are nothing like the payload's
    (3L, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa", "Zq9!kP#x7@Wm&2Rv$TgH%8cJ^4bN*6dF(1sL)3yU"),
    (4L, "the quick brown fox jumps over the lazy dog", "zzzz!!!! 0101 ZZZZ ????"))
    .toDF("doc_id", "text", "caption")
    .withColumn("image", col("text").cast("binary"))

  test("identical towers score 1.0; misaligned pairs score lower and are cut") {
    val scores = CrossModalAlignment(threshold = 0.9)
      .scored(pairs).select("doc_id", "clip_score", "clip_keep")
      .as[(Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(scores(1L)._1 == 1.0 && scores(2L)._1 == 1.0)
    assert(scores(3L)._1 < 0.9 && !scores(3L)._2,
      s"misaligned pair scored ${scores(3L)._1}")
    assert(scores(1L)._2 && scores(2L)._2)
    val kept = CrossModalAlignment(threshold = 0.9)(pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(1L) && kept.contains(2L) && !kept.contains(3L))
  }

  test("embedPair equals two single-tower passes, paired by row") {
    val df = pairs.withColumn("cap_bin", col("caption").cast("binary"))
    val both = BatchInference.embedPair(df, TrainedEmbedding.kernel,
        batchSize = 2, aCol = "image", bCol = "cap_bin")
      .select("doc_id", "a_embedding", "b_embedding")
      .as[(Long, Seq[Float], Seq[Float])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val a = BatchInference.embed(df, TrainedEmbedding.kernel, 64, "doc_id", "image")
      .as[(Long, Seq[Float])].collect().toMap
    val b = BatchInference.embed(df, TrainedEmbedding.kernel, 64, "doc_id", "cap_bin")
      .as[(Long, Seq[Float])].collect().toMap
    both.foreach { case (id, (ea, eb)) =>
      assert(ea == a(id) && eb == b(id), s"tower mismatch for $id")
    }
  }

  test("scoring is map-only: no Exchange in the scored plan") {
    val plan = CrossModalAlignment().scored(pairs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(400))
  }
}
