package graft

import graft.operators.image.BatchInference
import graft.operators.ml._

/** The trained degradation model must actually separate degraded images
  * — these tests score REAL rendered images (not the synthetic parquet
  * corpus) through the BatchInference slot. */
class DegradationModelSpec extends SparkSpec {
  import spark.implicits._

  // fresh corpus with a seed the trainer never saw
  private lazy val heldOut = DegradationTrainer.corpus(40, seed = 99L)

  private def accuracy(head: LinearHead, positiveClass: Int): Double = {
    val hits = heldOut.count { case (bytes, cls) =>
      val p = head.score(DegradationFeatures.fromAny(bytes)) > 0.5
      p == (cls == positiveClass)
    }
    hits.toDouble / heldOut.size
  }

  test("frozen blur head separates blurred images (held-out acc >= 0.9)") {
    assert(accuracy(DegradationModel.blur, DegradationTrainer.Blurred) >= 0.9)
  }

  test("frozen noise head separates noisy images (held-out acc >= 0.9)") {
    assert(accuracy(DegradationModel.noise, DegradationTrainer.Noisy) >= 0.9)
  }

  test("train path refits heads that separate a fresh corpus") {
    val (blur, noise) = DegradationTrainer.train(spark, n = 40, seed = 3L)
    def acc(h: LinearHead, cls: Int): Double = {
      val hits = heldOut.count { case (b, c) =>
        (h.score(DegradationFeatures.fromAny(b)) > 0.5) == (c == cls)
      }
      hits.toDouble / heldOut.size
    }
    assert(acc(blur, DegradationTrainer.Blurred) >= 0.9)
    assert(acc(noise, DegradationTrainer.Noisy) >= 0.9)
  }

  test("frozen AIGC head separates pristine renders from camera-pipeline images") {
    val held = AigcTrainer.corpus(40, seed = 101L)
    val hits = held.count { case (bytes, cls) =>
      (AigcModel.head.score(DegradationFeatures.fromAny(bytes)) > 0.5) ==
        (cls == AigcTrainer.Generated)
    }
    assert(hits.toDouble / held.size >= 0.9)
  }

  test("AIGC train path refits a separating head") {
    val head = AigcTrainer.train(spark, n = 40, seed = 5L)
    val held = AigcTrainer.corpus(40, seed = 101L)
    val hits = held.count { case (bytes, cls) =>
      (head.score(DegradationFeatures.fromAny(bytes)) > 0.5) ==
        (cls == AigcTrainer.Generated)
    }
    assert(hits.toDouble / held.size >= 0.9)
  }

  test("inference flows through the BatchInference batch slot") {
    val df = heldOut.zipWithIndex
      .map { case ((bytes, cls), i) => (i.toLong, bytes, cls) }
      .toDF("doc_id", "image", "cls")
    val scored = DegradationModel(df)
    assert(scored.columns.toSeq ==
      Seq("doc_id", "vd_blur", "vd_noise", "vd_overall_quality"))
    val rows = scored.join(df.select("doc_id", "cls"), "doc_id")
      .select("cls", "vd_blur", "vd_noise").as[(Int, Double, Double)].collect()
    assert(rows.length == heldOut.size)
    // scores out of the distributed path match local kernel semantics
    val blurMeanByCls = rows.groupBy(_._1).view.mapValues(r => r.map(_._2).sum / r.length).toMap
    assert(blurMeanByCls(DegradationTrainer.Blurred) > blurMeanByCls(DegradationTrainer.Clean))
    val noiseMeanByCls = rows.groupBy(_._1).view.mapValues(r => r.map(_._3).sum / r.length).toMap
    assert(noiseMeanByCls(DegradationTrainer.Noisy) > noiseMeanByCls(DegradationTrainer.Clean))
  }
}
