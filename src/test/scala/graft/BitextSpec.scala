package graft

import graft.operators.vector.MarginBitextMiner
import org.apache.spark.sql.functions._

/** Margin-based bitext mining: ratio margin vs raw cosine, hub
  * suppression, mutual-vs-forward strategies. */
class BitextSpec extends SparkSpec {
  import spark.implicits._

  /** Near-orthogonal side X (axis vectors) and Y = noisy translations
    * of x0..x3 (same axis, slightly rotated), plus a HUB y that sits
    * moderately close to EVERY x. */
  private def vec(parts: (Int, Double)*): Array[Float] = {
    val v = Array.fill(8)(0.0f)
    parts.foreach { case (i, x) => v(i) = x.toFloat }
    v
  }

  private def xs = (0 until 4).map(a => (a.toLong * 2, vec(a -> 1.0)))
    .toDF("vec_id", "embedding")

  // y for axis a: 0.95 on its axis + 0.05 leakage onto the next —
  // clearly best for its own x. The hub (id 99) is 0.5 on every axis.
  private def ys = ((0 until 4).map { a =>
    (a.toLong * 2 + 1, vec(a -> 0.95, ((a + 1) % 8) -> 0.05))
  } :+ (99L, vec((0 to 3).map(_ -> 0.5): _*)))
    .toDF("vec_id", "embedding")

  test("mutual mining recovers the planted alignment and rejects the hub") {
    val mined = MarginBitextMiner(k = 3, threshold = 1.0)
      .mine(xs, ys)
      .as[(Long, Long, Double, Double)].collect()
    val pairs = mined.map(r => r._1 -> r._2).toMap
    // every x pairs with ITS translation, never the hub
    assert(pairs == Map(0L -> 1L, 2L -> 3L, 4L -> 5L, 6L -> 7L))
    assert(mined.forall(_._4 >= 1.0))
    // while on RAW cosine the hub is competitive for every x (0.5·1.0
    // over norms), margin normalization pushed it out: assert the hub
    // is nobody's mined partner even though it IS in every candidate set
    val m = MarginBitextMiner(k = 3).margins(xs, ys)
      .as[(Long, Long, Double, Double)].collect()
    assert(m.count(_._1 == 99L) == 0) // hub is on the Y side
    assert(m.exists(_._2 == 99L))     // ...and appears as a candidate
  }

  test("sides numbered independently: a pair SHARING an id is still mined") {
    // the r16 review finding: BruteForceKnn's qid =!= cid self-guard
    // silently dropped same-id cross-corpus pairs — two monolingual
    // corpora each numbered from 0 collide on every id
    val xi = Seq((0L, vec(0 -> 1.0)), (1L, vec(1 -> 1.0)))
      .toDF("vec_id", "embedding")
    val yi = Seq((0L, vec(0 -> 0.95, 2 -> 0.05)), (1L, vec(1 -> 0.95, 3 -> 0.05)))
      .toDF("vec_id", "embedding")
    val mined = MarginBitextMiner(k = 2, threshold = 1.0)
      .mine(xi, yi).as[(Long, Long, Double, Double)].collect()
    assert(mined.map(r => r._1 -> r._2).toMap == Map(0L -> 0L, 1L -> 1L))
  }

  test("forward strategy keeps per-x best even when y prefers another x") {
    // two xs close to the SAME y: mutual keeps only y's best x,
    // forward keeps both x->y rows (above threshold)
    val x2 = Seq((0L, vec(0 -> 1.0)), (2L, vec(0 -> 0.9, 1 -> 0.1)))
      .toDF("vec_id", "embedding")
    val y2 = Seq((1L, vec(0 -> 1.0)), (3L, vec(5 -> 1.0)))
      .toDF("vec_id", "embedding")
    val fwd = MarginBitextMiner(k = 2, threshold = 0.0, strategy = "forward")
      .mine(x2, y2).as[(Long, Long, Double, Double)].collect()
    assert(fwd.map(_._1).toSet == Set(0L, 2L))
    assert(fwd.filter(_._1 == 0L).head._2 == 1L)
    assert(fwd.filter(_._1 == 2L).head._2 == 1L)
    val mut = MarginBitextMiner(k = 2, threshold = 0.0, strategy = "mutual")
      .mine(x2, y2).as[(Long, Long, Double, Double)].collect()
    // y1's best x is x0 — so mutual drops (2, 1)
    assert(mut.map(r => (r._1, r._2)).toSet.contains((0L, 1L)))
    assert(!mut.map(r => (r._1, r._2)).toSet.contains((2L, 1L)))
  }

  test("marginsFromCandidates over the full cross == margins (and mined sets agree)") {
    import graft.operators.vector.BruteForceKnn
    val miner = MarginBitextMiner(k = 3, threshold = 0.0)
    // full cross as a candidate table (k >= |corpus| makes topKCross
    // the complete cosine table)
    val cands = BruteForceKnn(100).topKCross(xs, ys)
      .select(col("qid").as("x_id"), col("cid").as("y_id"), col("cos"))
    val a = miner.margins(xs, ys)
      .as[(Long, Long, Double, Double)].collect().toSet
    val b = miner.marginsFromCandidates(cands)
      .as[(Long, Long, Double, Double)].collect().toSet
    assert(a == b && a.nonEmpty)
    val ma = miner.mine(xs, ys)
      .as[(Long, Long, Double, Double)].collect().toSet
    val mb = miner.mineFromCandidates(cands)
      .as[(Long, Long, Double, Double)].collect().toSet
    assert(ma == mb)
  }

  test("margin formula matches the paper's ratio on a hand computation") {
    // 2 xs, 2 ys, k=1: margin(x,y) = cos(x,y) / ((bestcos(x)+bestcos(y))/2)
    val xa = Seq((0L, vec(0 -> 1.0)), (2L, vec(1 -> 1.0)))
      .toDF("vec_id", "embedding")
    val ya = Seq((1L, vec(0 -> 0.8, 1 -> 0.2)), (3L, vec(1 -> 0.9)))
      .toDF("vec_id", "embedding")
    val m = MarginBitextMiner(k = 1).margins(xa, ya)
      .as[(Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).map { case (p, q) => p.toDouble * q }.sum
      val na = math.sqrt(a.map(p => p.toDouble * p).sum)
      val nb = math.sqrt(b.map(p => p.toDouble * p).sum)
      BigDecimal(d / (na * nb)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }
    val c01 = cos(vec(0 -> 1.0), vec(0 -> 0.8, 1 -> 0.2))
    // k=1: x0's neighborhood = its best y (y1); y1's = its best x (x0)
    val want = BigDecimal(c01 / ((c01 + c01) / 2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(m((0L, 1L))._2 == want) // = 1.0: best-pair margin is exactly 1
  }
}
