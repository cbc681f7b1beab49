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

  // 5-class held-out corpus for the extended heads (seed unseen in training)
  private lazy val heldOut5 = DegradationTrainer.corpus5(40, seed = 99L)

  private def accuracyExt(head: LinearHead, positiveClass: Int): Double = {
    val hits = heldOut5.count { case (bytes, cls) =>
      val p = head.score(DegradationFeatures.fromAnyExt(bytes)) > 0.5
      p == (cls == positiveClass)
    }
    hits.toDouble / heldOut5.size
  }

  test("frozen color-cast head separates cast images (held-out acc >= 0.9)") {
    assert(accuracyExt(DegradationModel.colorCast, DegradationTrainer.Cast) >= 0.9)
  }

  test("frozen watermark head separates watermarked images (held-out acc >= 0.9)") {
    assert(accuracyExt(DegradationModel.watermark, DegradationTrainer.Marked) >= 0.9)
  }

  test("extended train path refits cast/watermark heads on a fresh corpus") {
    val (cast, mark) = DegradationTrainer.trainExt(spark, n = 40, seed = 3L)
    def acc(h: LinearHead, cls: Int): Double = {
      val hits = heldOut5.count { case (b, c) =>
        (h.score(DegradationFeatures.fromAnyExt(b)) > 0.5) == (c == cls)
      }
      hits.toDouble / heldOut5.size
    }
    assert(acc(cast, DegradationTrainer.Cast) >= 0.9)
    assert(acc(mark, DegradationTrainer.Marked) >= 0.9)
  }

  test("extended features extend the base vector, identically") {
    heldOut.take(6).foreach { case (bytes, _) =>
      val base = DegradationFeatures.fromAny(bytes)
      val ext = DegradationFeatures.fromAnyExt(bytes)
      assert(ext.length == DegradationFeatures.dimExt)
      assert(ext.take(DegradationFeatures.dim).sameElements(base))
    }
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

  test("frozen aesthetic head ranks visually rich renders above sparse ones") {
    val held = AestheticTrainer.corpus(78, seed = 23L) // richness spread 2..62
    val scored = held.map { case (bytes, richness) =>
      (richness, AestheticModel.score(DegradationFeatures.fromAny(bytes)))
    }
    val rich = scored.filter(_._1 > 0.7).map(_._2)
    val sparse = scored.filter(_._1 < 0.2).map(_._2)
    assert(rich.nonEmpty && sparse.nonEmpty)
    assert(rich.sum / rich.size > sparse.sum / sparse.size + 1.0)
    assert(scored.forall { case (_, s) => s >= 1.0 && s <= 10.0 })
  }

  test("aesthetic train path recovers the richness signal") {
    val head = AestheticTrainer.train(spark, n = 130, seed = 29L)
    val held = AestheticTrainer.corpus(78, seed = 23L)
    // Pearson correlation between label and raw prediction
    val pairs = held.map { case (b, r) =>
      val f = DegradationFeatures.fromAny(b)
      (r, head.weights.zip(f).map { case (w, x) => w * x }.sum + head.bias)
    }
    val n = pairs.size.toDouble
    val (mx, my) = (pairs.map(_._1).sum / n, pairs.map(_._2).sum / n)
    val cov = pairs.map { case (x, y) => (x - mx) * (y - my) }.sum
    val sx = math.sqrt(pairs.map(p => math.pow(p._1 - mx, 2)).sum)
    val sy = math.sqrt(pairs.map(p => math.pow(p._2 - my, 2)).sum)
    assert(cov / (sx * sy) > 0.8, s"correlation ${cov / (sx * sy)}")
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
