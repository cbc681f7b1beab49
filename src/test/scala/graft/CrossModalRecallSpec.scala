package graft

import graft.operators.ml.CrossModalRecall
import org.apache.spark.sql.functions._

/** Cross-modal recall@k: identical pairs retrieve perfectly, shuffled
  * pairs don't, recall is monotone in k, and both directions score. */
class CrossModalRecallSpec extends SparkSpec {
  import spark.implicits._

  private def docs(capOf: String => String) =
    (0 until 12).map { i =>
      val t = s"document number $i with its own distinctive words w$i x$i y$i z$i " +
        ("filler " * (i + 3))
      (i.toLong, t, capOf(t))
    }.toDF("doc_id", "text", "caption")
      .withColumn("image", col("text").cast("binary"))

  test("identical captions: recall@1 == 1.0 both directions") {
    val out = CrossModalRecall(ks = Seq(1, 3))(docs(identity))
      .as[(String, Int, Double, Long)].collect()
    assert(out.length == 4)
    out.foreach { case (d, k, r, n) =>
      assert(r == 1.0, s"$d@$k")
      assert(n == 12)
    }
  }

  test("recall is monotone in k and both directions report") {
    // reversed captions: related but not identical
    val out = CrossModalRecall(ks = Seq(1, 3, 10))(docs(_.reverse))
      .as[(String, Int, Double, Long)].collect()
      .groupBy(_._1).map { case (d, rows) =>
        d -> rows.sortBy(_._2).map(_._3).toSeq
      }
    assert(out.keySet == Set("i2t", "t2i"))
    out.values.foreach { rs =>
      assert(rs == rs.sorted, s"recall not monotone in k: $rs")
      assert(rs.last <= 1.0 && rs.head >= 0.0)
    }
  }

  test("recall@k matches a hand-computed rank reference") {
    val d = docs(_.reverse)
    val out = CrossModalRecall(ks = Seq(2))(d)
      .as[(String, Int, Double, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    // reference: embed both towers through the same kernel, rank by
    // rounded cosine with id tiebreak, score hit within 2
    import graft.operators.ml.{EmbeddingFeatures, TrainedEmbedding}
    val rows = d.select("doc_id", "text", "caption")
      .as[(Long, String, String)].collect()
    def emb(s: String) = TrainedEmbedding.projection
      .embed(EmbeddingFeatures.fromAny(s.getBytes("UTF-8")))
    val img = rows.map(r => r._1 -> emb(r._2))
    val cap = rows.map(r => r._1 -> emb(r._3))
    def cos(a: Array[Float], b: Array[Float]) = {
      val dd = a.zip(b).map { case (p, q) => p.toDouble * q }.sum
      val na = math.sqrt(a.map(p => p.toDouble * p).sum)
      val nb = math.sqrt(b.map(p => p.toDouble * p).sum)
      BigDecimal(dd / (na * nb)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }
    def recall(qs: Seq[(Long, Array[Float])], cs: Seq[(Long, Array[Float])]) = {
      val hits = qs.count { case (qid, qv) =>
        cs.map { case (cid, cv) => (cid, cos(qv, cv)) }
          .sortBy { case (cid, c) => (-c, cid) }.take(2).exists(_._1 == qid)
      }
      BigDecimal(hits.toDouble / qs.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(out("i2t") == recall(img.toSeq, cap.toSeq))
    assert(out("t2i") == recall(cap.toSeq, img.toSeq))
  }
}
