package graft

import graft.functions.VecFns
import graft.operators.vector._
import org.apache.spark.sql.functions._

class VectorSpec extends SparkSpec {
  import spark.implicits._

  test("dot / cosine / l2 on known vectors") {
    val df = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
    val (d, c, l) = df.select(VecFns.dot($"a", $"b"),
      round(VecFns.cosine($"a", $"b"), 6), VecFns.l2Dist($"a", $"b"))
      .as[(Double, Double, Double)].head()
    assert(d == 11.0)
    assert(c == 0.98387)
    assert(math.abs(l - math.sqrt(8.0)) < 1e-12)
  }

  test("SemanticDecontaminator: exact flags the right rows; LSH path agrees") {
    // benchmark = 2 eval vectors; corpus carries a verbatim copy of
    // each (true leakage), a near copy (cos > 0.95), and orthogonal
    // noise rows that must pass
    def v(seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      Array.fill(64)(r.nextFloat() * 2 - 1)
    }
    val b1 = v(1); val b2 = v(2)
    val near = b1.clone(); near(0) = near(0) + 0.01f
    val bench = Seq((100L, b1), (101L, b2)).toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, b1), (2L, b2), (3L, near), (4L, v(7)), (5L, v(8)), (6L, v(9)))
      .toDF("vec_id", "embedding")
    val sd = SemanticDecontaminator(threshold = 0.95)
    val exact = sd.contaminatedIds(corpus, bench)
      .as[Long].collect().toSet
    assert(exact == Set(1L, 2L, 3L))
    val lsh = sd.contaminatedIdsLsh(corpus, bench).as[Long].collect().toSet
    // verbatim copies share every band; the perturbed copy flips at
    // most the planes it grazes — on this data the candidate sets
    // verify to the same contaminated ids
    assert(lsh == exact)
    val flagged = sd.flag(corpus, bench)
      .select($"vec_id", $"is_contaminated").as[(Long, Boolean)]
      .collect().toMap
    assert(flagged.size == 6 && flagged.filter(_._2).keySet == Set(1L, 2L, 3L))
    assert(sd(corpus, bench).select("vec_id").as[Long].collect().toSet ==
      Set(4L, 5L, 6L))
  }

  test("fused native cosine is bit-identical to the composed form") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val pairs = emb.as("x").join(emb.as("y"), col("x.vec_id") < col("y.vec_id"))
      .limit(500)
      .select(VecFns.cosine(col("x.embedding"), col("y.embedding")).as("fused"),
        VecFns.cosineComposed(col("x.embedding"), col("y.embedding")).as("composed"))
    assert(pairs.filter(col("fused") =!= col("composed")).count() == 0)
    val z = Seq((Array(0.0f, 0.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    assert(z.select(VecFns.cosine($"a", $"b")).as[Double].head() == 0.0)
  }

  test("l2Normalize produces unit vectors; zero vector unchanged") {
    val df = Seq(Array(3.0f, 4.0f), Array(0.0f, 0.0f)).toDF("v")
    val out = df.select(VecFns.l2Normalize($"v")).as[Seq[Double]].collect()
    assert(out(0) == Seq(0.6, 0.8))
    assert(out(1) == Seq(0.0, 0.0))
  }

  test("BruteForceKnn ranks by cosine with deterministic tiebreak") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(1.0f, 0.01f))
    ).toDF("vec_id", "embedding")
    val top = BruteForceKnn(k = 2).topK(vecs.filter($"vec_id" === 0), vecs)
      .orderBy("rn").select("cid").as[Long].collect().toSeq
    assert(top == Seq(3L, 1L))
  }

  test("LshAnn buckets are reproducible and topK ⊆ same-bucket") {
    val vecs = (0L until 20L).map(i =>
      (i, Array.tabulate(8)(d => math.sin(i * 7 + d).toFloat))).toDF("vec_id", "embedding")
    val ann = LshAnn(dim = 8, nbits = 4)
    val b1 = ann.withBuckets(vecs).select("vec_id", "bucket").as[(Long, String)].collect().toMap
    val b2 = ann.withBuckets(vecs).select("vec_id", "bucket").as[(Long, String)].collect().toMap
    assert(b1 == b2)
    val top = ann.topK(vecs, k = 3, $"vec_id" < 2).collect()
    top.foreach(r => assert(b1(r.getAs[Long]("qid")) == b1(r.getAs[Long]("cid"))))
  }

  test("IvfIndex.assign picks nearest centroid") {
    val vecs = Seq((10L, Array(0.1f, 0.0f)), (11L, Array(0.0f, 0.9f)))
      .toDF("vec_id", "embedding")
    val cents = Seq((0, Array(0.0, 0.0)), (1, Array(0.0, 1.0)))
      .toDF("centroid_id", "cvec")
    val got = IvfIndex().assign(vecs, cents)
      .select("vec_id", "centroid_id").as[(Long, Int)].collect().toMap
    assert(got == Map(10L -> 0, 11L -> 1))
  }

  test("SemanticDedup keeps min id per in-cluster near-dup, never collapses across clusters") {
    // cluster 0 (near (1,0)): ids 10/11 are near-identical -> keep 10;
    // id 12 is in the same cluster but dissimilar enough -> kept.
    // cluster 1 (near (0,1)): id 20 duplicates 10's DIRECTION but sits
    // in the other cluster -> must survive (cluster-scoped, not global).
    val vecs = Seq(
      (10L, Array(1.0f, 0.0f)), (11L, Array(0.999f, 0.01f)),
      (12L, Array(0.6f, 0.55f)), (20L, Array(0.05f, 1.0f)))
      .toDF("vec_id", "embedding")
    val cents = Seq((0, Array(1.0, 0.0)), (1, Array(0.0, 1.0)))
      .toDF("centroid_id", "cvec")
    val kept = SemanticDedup(threshold = 0.99).kept(vecs, cents)
      .select("vec_id", "centroid_id").as[(Long, Int)].collect().toMap
    assert(kept == Map(10L -> 0, 12L -> 0, 20L -> 1))
    // kept-set invariant: no two survivors in one cluster within threshold
    val p = kept.keys.toSeq.sorted
    assert(!p.contains(11L))
  }

  test("SemanticDedup maxClusterSize bounds candidates on a planted mega-cluster") {
    // one cluster of 2000 near-identical vectors (the boilerplate
    // mega-cluster failure mode) + a small second cluster as control
    val mega = (0L until 2000L).map(i =>
      (i, Array(1.0f, (i % 7).toFloat * 1e-5f)))
    val ctrl = (5000L until 5004L).map(i => (i, Array(0.0f, 1.0f + (i % 3) * 1e-5f)))
    val vecs = (mega ++ ctrl).toDF("vec_id", "embedding")
    val cents = Seq((0, Array(1.0, 0.0)), (1, Array(0.0, 1.0)))
      .toDF("centroid_id", "cvec")

    val capped = SemanticDedup(threshold = 0.999, maxClusterSize = 100, dim = 2)
    // bounded candidate volume: the identical-core tier salts the one
    // giant sign bucket into ceil(2000/100) = 20 sub-splits — within
    // pairs ≈ 20·C(100,2) plus the linear member×rep stream, far below
    // the uncapped C(2000,2) ≈ 2.0M pair stream one task would serialize
    val nCand = capped.candidatePairs(vecs, cents).count()
    assert(nCand < 450000, s"candidate stream not bounded: $nCand")

    // semantics: the all-near-identical mega-cluster still collapses to
    // its global min id, exactly as the uncapped operator computes it
    val keptCapped = capped.kept(vecs, cents)
      .select("vec_id").as[Long].collect().toSet
    val keptUncapped = SemanticDedup(threshold = 0.999).kept(vecs, cents)
      .select("vec_id").as[Long].collect().toSet
    assert(keptCapped(0L) && !keptCapped(1L) && !keptCapped(1999L))
    assert(keptCapped == keptUncapped)
  }

  test("IncrementalSemanticDedup ≡ from-scratch SemanticDedup on id-ordered batches") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("centroid_id"),
        transform(col("embedding"), x => x.cast("double")).as("cvec"))
    val b1 = emb.filter(col("vec_id") < 300)
    val b2 = emb.filter(col("vec_id") >= 300)
    val inc = IncrementalSemanticDedup(threshold = 0.35)
    val idx = inc.indexRows(b1, cents)
    val s2 = inc.survivors(idx, b2, cents).select("vec_id").as[Long].collect().toSet
    val s1 = SemanticDedup(threshold = 0.35).kept(b1, cents)
      .select("vec_id").as[Long].collect().toSet
    val scratch = SemanticDedup(threshold = 0.35).kept(emb, cents)
      .select("vec_id").as[Long].collect().toSet
    assert(s1.union(s2) == scratch) // stream-order == id-order here
    assert(s2.nonEmpty && (s1 ++ s2).size < 500) // real drops happened
    // pruning the index to the batch's clusters changes nothing
    val s2p = inc.survivors(inc.prunedIndex(idx, b2, cents), b2, cents)
      .select("vec_id").as[Long].collect().toSet
    assert(s2p == s2)
  }

  test("KMeansOps.fit converges to MLlib-comparable WSSSE and stops on tol") {
    // four well-separated blobs with small in-blob jitter; the salted
    // md5 init draws ids {139, 44, 69, 118} — one per blob (blobs
    // 3,0,1,2), the spread the salted draw exists to deliver — so the
    // loop must reach the global optimum and match MLlib essentially
    // exactly (means round to 6 dp)
    val vecs = (0L until 200L).map { i =>
      val c = (i % 4).toInt
      (i, Array.tabulate(4)(d => (c * 10 + d).toFloat + (i % 7).toFloat * 0.01f))
    }.toDF("vec_id", "embedding")
    val cents = KMeansOps.fit(vecs, k = 4, tol = 1e-6, maxIter = 20)
    assert(cents.count() == 4)
    def wssse(c: org.apache.spark.sql.DataFrame): Double =
      IvfIndex().assign(vecs, c)
        .agg(sum(col("dist") * col("dist"))).collect()(0).getDouble(0)
    val ours = wssse(cents)
    val mllib = wssse(KMeansOps.train(vecs, k = 4))
    assert(ours <= mllib * 1.001 + 1e-9,
      s"Lloyd-loop WSSSE $ours worse than MLlib $mllib")
    // convergence: one more iteration from the fitted centroids is a
    // fixed point (trajectory is rounded, so equality is exact)
    val again = KMeansOps.fit(vecs, k = 4, tol = 1e-6, maxIter = 20)
    assert(again.collect().toSet == cents.collect().toSet)
  }

  test("KMeansOps.fit keeps empty clusters at their previous centroid") {
    // k=3: the salted init draws ids [11, 2, 0] (md5 order); 2 and 11
    // carry IDENTICAL vectors, so every point near 100 ties to the
    // lower centroid id and the id-2 centroid captures nothing from
    // the first iteration on — the empty-cluster keep-previous rule
    // must hold its row (and its init vector) in place
    val vecs = Seq(
      (0L, Array(0.0f, 0.0f)), (1L, Array(0.01f, 0.0f)), (2L, Array(100.01f, 0.0f)),
      (10L, Array(100.0f, 0.0f)), (11L, Array(100.01f, 0.0f)))
      .toDF("vec_id", "embedding")
    // after ONE iteration the starved centroid (cid 1, seeded from id
    // 2) still sits at its raw init vector — kept, not dropped (in
    // later iterations cid 0's mean drifts toward 100.0037 and cid 1
    // legitimately reclaims the 100.01 points)
    val one = KMeansOps.fit(vecs, k = 3, tol = 0.0, maxIter = 1)
    assert(one.filter(col("centroid_id") === 1)
      .select($"cvec").as[Seq[Double]].head() == Seq(100.01f.toDouble, 0.0))
    val cents = KMeansOps.fit(vecs, k = 3, tol = 0.0, maxIter = 3)
    assert(cents.count() == 3) // no vanished rows
  }

  test("KMeansOps.train + lloydStep run and keep k centroids") {
    val vecs = (0L until 40L).map(i =>
      (i, Array.tabulate(4)(d => ((i % 4) * 10 + d).toFloat))).toDF("vec_id", "embedding")
    val cents = KMeansOps.train(vecs, k = 4)
    assert(cents.count() == 4)
    val next = KMeansOps.lloydStep(vecs, cents)
    assert(next.count() <= 4 && next.count() > 0)
    assert(next.select($"cvec").as[Seq[Double]].head().size == 4)
  }

  test("hard-negative miner: near-dups excluded, in-band ranked, k-bounded") {
    // anchor 10; 11 is a verbatim duplicate (cos 1.0 -> NOT a negative);
    // 12/13 are in-band hard negatives at decreasing similarity; 14 is
    // orthogonal (cos 0 stays in [0, 0.95) and may rank last)
    def v(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    val rows = Seq(
      (0L, v(1, 0, 0, 0)),              // centroid row
      (10L, v(1, 0.2, 0, 0)),
      (11L, v(1, 0.2, 0, 0)),           // duplicate of 10
      (12L, v(1, 0.5, 0, 0)),           // cos 0.965 -> above hi, excluded
      (13L, v(1, 1.2, 0, 0)),           // cos 0.778 -> the hard negative
      (14L, v(0, 0, 1, 0))              // cos ~0.2 -> weak negative
    ).toDF("vec_id", "embedding")
    val cents = Seq((0, Seq(1.0, 0.0, 0.0, 0.0))).toDF("centroid_id", "cvec")
    val out = HardNegativeMiner(lo = 0.0, hi = 0.95, k = 2)
      .mine(rows, cents, nprobe = 1, anchorPred = $"vec_id" === 10L)
      .collect().map(r => (r.getAs[Long]("negative_id"), r.getAs[Int]("rnk")))
    // 11 (cos 1.0) and 12 (cos 0.965) excluded by the hi bound — the
    // near-dup/near-positive guard; the two in-band rows survive
    assert(!out.map(_._1).contains(11L) && !out.map(_._1).contains(12L))
    assert(out.length == 2)
    // ranking is by similarity desc: 13 (0.778) outranks 14 (~0.2)
    val ranks = out.toMap.map(_.swap)
    assert(ranks(1) == 13L && ranks(2) == 14L)
  }

  test("AnnEval recall@k: per-query hit counting against exact top-k") {
    import graft.operators.vector.AnnEval
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L), (2L, 21L))
      .toDF("qid", "cid")
    val approx = Seq((1L, 11L), (1L, 12L), (1L, 99L), (2L, 30L))
      .toDF("qid", "cid")
    val got = AnnEval.recallAtK(exact, approx)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((3L, 2L, 0.666667)))  // 11, 12 found; 10 missed
    assert(got(2L) == ((2L, 0L, 0.0)))       // approx found nothing real
  }

  test("int8 quantizer: endpoints, constant dims, bounded reconstruction") {
    import graft.operators.vector.VectorQuantizer
    val rows = Seq(
      (1L, Seq(0.0f, 5.0f, 2.0f)),
      (2L, Seq(10.0f, 5.0f, 4.0f)),
      (3L, Seq(5.0f, 5.0f, 3.0f))
    ).toDF("vec_id", "embedding")
    val vq = VectorQuantizer()
    val (mins, maxes) = vq.collectStats(rows)
    assert(mins.toSeq == Seq(0.0, 5.0, 2.0) && maxes.toSeq == Seq(10.0, 5.0, 4.0))
    val q = vq.quantize(rows, mins, maxes)
      .select("vec_id", "qvec").as[(Long, Seq[Int])].collect().toMap
    // min → -128, max → 127, midpoint → round(0.5*255)-128 = 0;
    // constant dim (all 5.0) → 0
    assert(q(1L) == Seq(-128, 0, -128))
    assert(q(2L) == Seq(127, 0, 127))
    assert(q(3L) == Seq(0, 0, 0))
    // dequantized reconstruction error is bounded by half a step
    val rec = vq.quantize(rows, mins, maxes)
      .select($"vec_id", vq.dequantize($"qvec", mins, maxes).as("d"),
        $"embedding")
      .as[(Long, Seq[Double], Seq[Float])].collect()
    for ((_, d, orig) <- rec; (dv, ov) <- d.zip(orig)) {
      val span = 10.0 // widest dim range
      assert(math.abs(dv - ov) <= span / 255.0 / 2.0 + 1e-9,
        s"recon $dv vs $ov")
    }
  }

  test("quantized knn ranks like exact knn on well-separated vectors") {
    import graft.operators.vector.VectorQuantizer
    val rows = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Seq(0.0f, 0.0f, 1.0f, 0.5f))
    ).toDF("vec_id", "embedding")
    val c = VectorQuantizer().compressed(rows)
    val got = BruteForceKnn(k = 1).topK(c.filter($"vec_id" === 0L), c)
      .select("cid").as[Long].collect().toSeq
    assert(got == Seq(1L))
  }
}
