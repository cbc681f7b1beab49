package graft

import graft.operators.dedup._
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  val docs = Seq(
    (1L, "The quick brown fox jumps over the lazy dog again and again"),
    (2L, "the  QUICK brown fox jumps over the lazy dog again and again"), // exact dup of 1 after normalize
    (3L, "The quick brown fox jumps over the lazy cat again and again"), // near dup of 1
    (4L, "completely different content about spark query engines at scale"),
    (5L, "tiny")
  ).toDF("doc_id", "text")

  test("ExactDedup keeps first occurrence per normalized hash") {
    val kept = ExactDedup()(docs).select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L, 4L, 5L))
    val groups = ExactDedup().groups(docs).collect()
    val dupGroup = groups.find(_.getAs[Long]("dup_count") == 2L).get
    assert(dupGroup.getAs[Long]("keep_id") == 1L)
  }

  test("MinHashLSH finds near-duplicate pair, skips short docs") {
    val pairs = MinHashLSH(numHashes = 12, bands = 6, shingleSize = 3)
      .candidatePairs(docs)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L))) // identical after normalize → all bands match
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L))) // near dup
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    val deduped = MinHashLSH(numHashes = 12, bands = 6)(docs)
      .select("doc_id").as[Long].collect().toSet
    assert(deduped.contains(1L) && !deduped.contains(2L) && deduped.contains(5L))
  }

  test("SimHash: identical docs share signature; signature is stable") {
    val sh = SimHash(nbits = 16)
    val sigs = docs.select($"doc_id", sh.signature($"text").as("s"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs.values.forall(s => s >= 0 && s < (1L << 16)))
    // 16-bit signatures may also absorb the near-dup doc 3; the group
    // keeping doc 1 must contain at least the exact dup (doc 2)
    val groups = sh.groups(docs).collect()
    assert(groups.find(_.getAs[Long]("keep_id") == 1L)
      .exists(_.getAs[Long]("dup_count") >= 2L))
  }

  test("NgramJaccard scores overlap correctly") {
    val pairs = NgramJaccard(3, 0.5).pairs(docs)
      .select($"id_a", $"id_b", $"jaccard").as[(Long, Long, Double)].collect()
    val p12 = pairs.find(p => p._1 == 1L && p._2 == 2L).get
    assert(p12._3 == 1.0) // identical shingle sets after normalization
    assert(pairs.find(p => p._1 == 1L && p._2 == 3L).exists(p => p._3 > 0.5 && p._3 < 1.0))
  }

  test("minhashVerifiedPairs == direct jaccard pairs at τ=0.5 (sf0.001)") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val nj = NgramJaccard(3, 0.5)
    val direct = nj.pairs(docs)
      .select($"id_a", $"id_b", $"jaccard").as[(Long, Long, Double)].collect().toSet
    val recipe = nj.minhashVerifiedPairs(docs, MinHashLSH(12, 4, 3))
      .select($"id_a", $"id_b", $"jaccard").as[(Long, Long, Double)].collect().toSet
    assert(recipe == direct) // full recall on the test corpus at τ=0.5
  }

  test("simhash radius-2 probes guard their fan-out and subsume radius 1") {
    val sh = SimHash(nbits = 16)
    intercept[IllegalArgumentException] {
      sh.candidatePairs(docs, radius = 2, maxProbes = 100) // 137 > 100
    }
    intercept[IllegalArgumentException] { sh.candidatePairs(docs, radius = 3) }
    val r1 = sh.candidatePairs(docs).select("id_a", "id_b")
      .as[(Long, Long)].collect().toSet
    val r2 = sh.candidatePairs(docs, radius = 2).select("id_a", "id_b")
      .as[(Long, Long)].collect().toSet
    assert(r1.subsetOf(r2))
  }

  test("low-τ pairs (MinHash-verified) ≡ exact count-join at τ=0.2 (sf0.001)") {
    val corpus = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val nj = NgramJaccard(3, 0.2)
    // default banding is r=2 since r11: ⌈ln(10⁻³)/ln(1−0.04)⌉ bands
    assert(nj.lowTauLsh.bands == 170 && nj.lowTauLsh.numHashes == 340)
    assert(nj.lowTauBanding(1).bands == 31) // ⌈ln(0.001)/ln(0.8)⌉, Broder curve
    val exact = nj.countJoinPairs(corpus)
      .select($"id_a", $"id_b", $"jaccard").as[(Long, Long, Double)].collect().toSet
    val fast = nj.pairs(corpus)
      .select($"id_a", $"id_b", $"jaccard").as[(Long, Long, Double)].collect().toSet
    assert(fast == exact) // full recall on the test corpus at τ=0.2
  }

  test("r=2 banding ≡ r=1 banding ≡ exact pair set at τ=0.2 (sf0.001)") {
    // the measured scale default (SURVEY §5.11: r=2 wins 3.1× at 50k
    // docs): sizing per the recall floor, identical VERIFIED pairs
    val corpus = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val nj = NgramJaccard(3, 0.2)
    val r2 = nj.lowTauBanding(2)
    assert(r2.bands == 170 && r2.numHashes == 340) // ⌈ln(10⁻³)/ln(1−0.04)⌉
    val r1pairs = nj.minhashVerifiedPairs(corpus, nj.lowTauBanding(1))
      .select($"id_a", $"id_b", $"jaccard").as[(Long, Long, Double)].collect().toSet
    val r2pairs = nj.minhashVerifiedPairs(corpus, r2)
      .select($"id_a", $"id_b", $"jaccard").as[(Long, Long, Double)].collect().toSet
    val exact = nj.countJoinPairs(corpus)
      .select($"id_a", $"id_b", $"jaccard").as[(Long, Long, Double)].collect().toSet
    assert(r2pairs == exact && r1pairs == exact)
  }

  test("MinHashSignature agg ≡ declarative n-column min formulation") {
    // the TypedImperativeAggregate behind bucketsFromHashes: identical
    // values to the n separate min((x*a+b)%p) aggregate columns it
    // replaced (the declarative form loses codegen past 100 fields),
    // and an all-null group evaluates to null
    val mh = MinHashLSH(numHashes = 12, bands = 4)
    val rows = Seq((1L, Some(77L)), (1L, Some(123456789L)), (1L, Some(5L)),
      (2L, Some(999L)), (3L, None))
      .toDF("doc_id", "__x")
    val agg = rows.groupBy($"doc_id")
      .agg(graft.plans.MinHashAgg.minhashSig($"__x",
        (0 until 12).map(mh.coefA), (0 until 12).map(mh.coefB),
        mh.prime).as("sig"))
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[Long](1))).toMap
    val decl = rows.groupBy($"doc_id")
      .agg(array((0 until 12).map(i =>
        min(($"__x" * mh.coefA(i) + mh.coefB(i)) % mh.prime)): _*).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    assert(agg(1L).get == decl(1L) && agg(2L).get == decl(2L))
    assert(agg(3L).isEmpty && decl(3L).forall(_ == null))
  }

  test("collapsedLshPairs collapses bit-identical vectors before LSH") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f, 0.0f)), // exact copy of 1
      (5L, Array(1.0f, 0.0f, 0.0f, 0.0f)), // another copy
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val nd = EmbeddingNearDup(threshold = 0.99, dim = 4, bands = 2, bitsPerBand = 2)
    val (repPairs, members) = nd.collapsedLshPairs(vecs)
    assert(members.count() == 4) // every copy stays addressable
    assert(repPairs.count() == 0) // reps {1, 3} share no near-dup pair
    val classSizes = members.groupBy("__k").count()
      .select("count").as[Long].collect().sorted.toSeq
    assert(classSizes == Seq(1L, 3L)) // the 3 copies collapsed to one rep
  }

  test("EmbeddingNearDup lshPairs ≡ exactPairs on colliding vectors") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.999f, 0.01f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val nd = EmbeddingNearDup(threshold = 0.99, dim = 4, bands = 2, bitsPerBand = 2)
    val exact = nd.exactPairs(vecs).select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact == Set((1L, 2L)))
    val lsh = nd.lshPairs(vecs).select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact))
  }

  test("IncrementalMinHashDedup: index hits reject, novel and short docs pass") {
    val lsh = MinHashLSH(numHashes = 12, bands = 6, shingleSize = 3)
    val inc = IncrementalMinHashDedup(lsh)
    // corpus = docs 1..3 (2 is an exact dup, 3 a near dup of 1); the
    // persisted index carries their buckets, never their text
    val index = lsh.buckets(docs.filter($"doc_id" <= 3))
    val batch = Seq(
      (11L, "the QUICK brown fox jumps over the lazy dog again and again"), // dup of indexed 1
      (12L, "entirely novel sentence mentioning structured streaming watermarks"),
      (13L, "entirely novel sentence mentioning structured streaming watermarks"), // intra-batch dup of 12
      (14L, "ok") // too short to shingle → passes through
    ).toDF("doc_id", "text")
    val out = inc.survivors(index, batch).select("doc_id").as[Long].collect().toSet
    assert(out == Set(12L, 14L))
    // rolling the index forward indexes only the survivors
    val rolled = inc.indexRows(index, batch).select("doc_id").distinct()
      .as[Long].collect().toSet
    assert(rolled == Set(12L))
    // batch 2 against the rolled index: a dup of batch-1 survivor 12 is
    // now rejected without ever re-reading batch 1
    val batch2 = Seq(
      (21L, "entirely novel sentence mentioning structured streaming watermarks"))
      .toDF("doc_id", "text")
    val out2 = inc.survivors(index.union(inc.indexRows(index, batch)), batch2)
      .select("doc_id").as[Long].collect().toSet
    assert(out2.isEmpty)
  }

  test("IncrementalMinHashDedup drops over-cap intra-batch buckets like the batch op") {
    // three identical docs share every band bucket; with maxBucketSize=2
    // those buckets are over cap, so they yield NO intra candidates —
    // same drop-the-bucket semantics as MinHashLSH.apply, not a quadratic
    // self-join through the degenerate bucket
    val batch = (1L to 3L).map(i =>
      (i, "boilerplate footer repeated verbatim across the entire crawl"))
      .toDF("doc_id", "text")
    val emptyIndex = spark.emptyDataFrame
      .select(lit(0L).as("doc_id"), lit(0).as("band"), lit("").as("bucket"))
      .filter(lit(false))
    val capped = IncrementalMinHashDedup(MinHashLSH(numHashes = 12, bands = 6, maxBucketSize = 2))
    assert(capped.survivors(emptyIndex, batch).count() == 3)
    val uncapped = IncrementalMinHashDedup(MinHashLSH(numHashes = 12, bands = 6))
    assert(uncapped.survivors(emptyIndex, batch).select("doc_id")
      .as[Long].collect().toSet == Set(1L))
  }

  test("DedupEval: confusion counts, orientation-normalized, dedup'd pairs") {
    import graft.operators.dedup.DedupEval
    // candidates: (1,2) hit, (2,3) reversed hit, (4,5) false positive,
    // (1,2) duplicated — must count once
    val cand = Seq((1L, 2L), (3L, 2L), (4L, 5L), (2L, 1L))
      .toDF("id_a", "id_b")
    val truth = Seq((1L, 2L), (2L, 3L), (6L, 7L)).toDF("id_a", "id_b")
    val r = DedupEval.prf(cand, truth).head()
    assert(r.getAs[Long]("n_candidates") == 3L)
    assert(r.getAs[Long]("n_truth") == 3L)
    assert(r.getAs[Long]("n_hits") == 2L)
    assert(r.getAs[Double]("precision") == 0.666667)
    assert(r.getAs[Double]("recall") == 0.666667)
  }

  test("DedupEval: empty pair tables yield 0 counts and 0.0 metrics, not null") {
    import graft.operators.dedup.DedupEval
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val truth = Seq((1L, 2L)).toDF("id_a", "id_b")
    // over-tight banding: zero candidates — the case a tuning sweep
    // reads, so precision must be 0.0 (getDouble-safe), not null
    val r1 = DedupEval.prf(empty, truth).head()
    assert(r1.getAs[Long]("n_candidates") == 0L)
    assert(r1.getAs[Double]("precision") == 0.0)
    assert(r1.getAs[Double]("recall") == 0.0)
    // both sides empty: the full-outer join aggregates zero rows
    val r2 = DedupEval.prf(empty, empty).head()
    assert(r2.getAs[Long]("n_truth") == 0L &&
      r2.getAs[Double]("recall") == 0.0)
  }
}
