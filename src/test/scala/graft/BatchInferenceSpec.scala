package graft

import graft.operators.image.{BatchInference, ClipEmbeddingStub, VideoOps}
import org.apache.spark.sql.functions._

class BatchInferenceSpec extends SparkSpec {
  import spark.implicits._

  test("embed batches rows and matches the column-stub embedding") {
    val df = (1L to 100L).map(i => (i, s"payload-$i".getBytes("UTF-8")))
      .toDF("doc_id", "image")
    val viaBatch = BatchInference.embed(df, batchSize = 7)
      .select($"doc_id", $"embedding").as[(Long, Seq[Float])].collect().toMap
    assert(viaBatch.size == 100)
    // same math as the ClipEmbeddingStub column expression (float vs
    // double rounding aside)
    val viaColumn = ClipEmbeddingStub()(df)
      .select($"doc_id", $"clip_embedding").as[(Long, Seq[Double])].collect().toMap
    viaBatch.foreach { case (id, emb) =>
      assert(emb.length == 8)
      emb.zip(viaColumn(id)).foreach { case (f, d) =>
        assert(math.abs(f - d) < 1e-4, s"doc $id: $f vs $d")
      }
    }
  }

  test("embed and score keep non-numeric ids intact") {
    val df = Seq(("url:a b", "x".getBytes("UTF-8")), ("url:c/d", "y".getBytes("UTF-8")))
      .toDF("doc_id", "image")
    val emb = BatchInference.embed(df).select($"doc_id").as[String].collect().toSet
    assert(emb == Set("url:a b", "url:c/d")) // no silent cast-to-long nulling
    val scored = BatchInference.score(df, b => b.map(_ => Array(1.0)), Seq("s"))
      .select($"doc_id", $"s").as[(String, Double)].collect().toSet
    assert(scored == Set(("url:a b", 1.0), ("url:c/d", 1.0)))
  }

  test("kernel batch-size contract is enforced") {
    val df = Seq((1L, "x".getBytes("UTF-8"))).toDF("doc_id", "image")
    val bad: BatchInference.Kernel = _ => Seq.empty
    val e = intercept[org.apache.spark.SparkException] {
      BatchInference.embed(df, bad).collect()
    }
    assert(e.getMessage.contains("kernel returned") ||
      e.getCause.getMessage.contains("kernel returned"))
  }

  test("frameSample emits n frames with deterministic offsets") {
    val video = Array.tabulate(10000)(_.toByte)
    val df = Seq((1L, video)).toDF("id", "video")
    val frames = df.select(explode(VideoOps.frameSample($"video", 4, 256)).as("f"))
      .select($"f.frame_idx", $"f.frame").as[(Int, Array[Byte])].collect()
    assert(frames.map(_._1).toSeq == Seq(0, 1, 2, 3))
    assert(frames.forall(_._2.length == 256))
    assert(frames(0)._2(0) == video(0))
  }
}
