package graft

import graft.operators.text.{CcnetBucketer, PackingReporter, UniMaxSampler}
import graft.operators.vector.PrototypePruner
import org.apache.spark.sql.functions._

/** The r15 selection/mixing family: UniMax waterfill allocation, CCNet
  * perplexity terciles, D4 prototype pruning, packing-efficiency audit. */
class SelectionOpsSpec extends SparkSpec {
  import spark.implicits._

  /** The paper's sequential waterfill loop — the reference the closed
    * form must reproduce: ascending by size, each source takes
    * min(cap, remaining div left) with the integer remainder spread +1
    * over the first `rem` uncapped sources (the closed form's tie
    * rule; a plain `remaining div left` loop leaves the last tokens
    * unassigned). */
  private def referenceWaterfill(tokens: Seq[(String, Long)], budget: Long,
      epochs: Int): Map[String, Long] = {
    val asc = tokens.sortBy { case (s, n) => (n, s) }
    val k = asc.size
    // longest capped prefix, then one even split of the remainder
    // (BigInt throughout — the overflow test below feeds ~2^61 caps)
    var m = 0
    var sPrev = BigInt(0)
    while (m < k && BigInt(asc(m)._2) * epochs * (k - m) <= BigInt(budget) - sPrev) {
      sPrev += BigInt(asc(m)._2) * epochs
      m += 1
    }
    val capped = asc.take(m).map { case (s, n) => s -> n * epochs }
    val left = (BigInt(budget) - sPrev).toLong
    val unc = asc.drop(m)
    val share = if (unc.isEmpty) 0L else left / unc.size
    val extra = if (unc.isEmpty) 0L else left % unc.size
    val uncapped = unc.zipWithIndex.map { case ((s, _), i) =>
      s -> (share + (if (i < extra) 1L else 0L))
    }
    (capped ++ uncapped).toMap
  }

  test("unimax budgets match the sequential waterfill; caps and total hold") {
    val docs = (1L to 300L).map { i =>
      (i, s"src${i % 6}", ("w " * (5 + (i % 11)).toInt).trim)
    }.toDF("doc_id", "source", "text")
    val tokenCount = size(split(col("text"), " ")).cast("long")
    val perSource = docs.groupBy("source").agg(sum(tokenCount).as("n"))
      .as[(String, Long)].collect().toSeq
    val total = perSource.map(_._2).sum
    for (budget <- Seq(total / 3, total, 2 * total, 7L, total * 5)) {
      val got = UniMaxSampler(epochCap = 2)
        .budgets(docs, tokenCount, budget)
        .select($"source", $"budget").as[(String, Long)].collect().toMap
      val want = referenceWaterfill(perSource, budget, epochs = 2)
      assert(got == want, s"budget=$budget")
      // hard repetition bound + budget conservation
      val caps = perSource.toMap
      got.foreach { case (s, b) => assert(b <= 2 * caps(s)) }
      assert(got.values.sum == math.min(budget, 2 * total))
    }
  }

  test("unimax survives Long-overflowing cumulative caps (decimal prefix sums)") {
    // 4 tiny capped sources + 4 × ~2.9e18-token giants: the CUMULATIVE
    // cap sum blows past 2^63 ≈ 9.2e18 inside the giant tail — a Long
    // cumsum wraps (silently, ANSI off) or crashes (ANSI on); the
    // decimal(38,0) prefix sums must reproduce the BigInt reference
    // exactly, capped prefix AND waterfilled remainder
    val big = 2900000000000000000L // 2.9e18
    val perSource = (0 until 4).map(i => (s"t$i", 1000000L + i)) ++
      (0 until 4).map(i => (s"g$i", big + i))
    val docs = perSource.zipWithIndex.map { case ((s, n), i) =>
      (i.toLong, s, n)
    }.toDF("doc_id", "source", "toks")
    val budget = 8000000000000000000L // 8e18 < Σ caps ≈ 1.16e19
    val got = UniMaxSampler(epochCap = 1)
      .budgets(docs, col("toks"), budget)
      .select($"source", $"budget").as[(String, Long)].collect().toMap
    assert(got == referenceWaterfill(perSource, budget, epochs = 1))
    assert(got.values.sum == budget) // conserved (budget < Σ caps)
    (0 until 4).foreach(i => assert(got(s"t$i") == 1000000L + i)) // capped whole
  }

  test("unimax sample: capped sources survive whole, uncapped fill to budget (+<=1 doc)") {
    // one tiny source (caps at epochCap·n) + two big ones (waterfilled)
    val docs = ((1L to 5L).map(i => (i, "tiny", "a b c")) ++
      (10L to 200L).map(i => (i, "big1", ("w " * 20).trim)) ++
      (300L to 500L).map(i => (i, "big2", ("w " * 25).trim)))
      .toDF("doc_id", "source", "text")
    val tokenCount = size(split(col("text"), " ")).cast("long")
    val um = UniMaxSampler(epochCap = 1)
    val budget = 2000L
    val budgets = um.budgets(docs, tokenCount, budget)
      .select($"source", $"budget").as[(String, Long)].collect().toMap
    assert(budgets("tiny") == 15L) // 5 docs × 3 tokens, capped at 1 epoch
    val got = um.sample(docs, tokenCount, budget)
    val bySource = got.groupBy("source").agg(
        count(lit(1)).as("n"), sum(tokenCount).as("tok"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(bySource("tiny")._1 == 5L) // capped → taken whole
    for (s <- Seq("big1", "big2")) {
      val (_, tok) = bySource(s)
      val docTok = if (s == "big1") 20L else 25L
      assert(tok < budgets(s) + docTok, s"$s overshoot bound")
      assert(tok >= budgets(s), s"$s fills its allocation")
    }
    // deterministic
    val again = um.sample(docs, tokenCount, budget)
      .select("doc_id").as[Long].collect().toSet
    assert(again == got.select("doc_id").as[Long].collect().toSet)
  }

  test("ccnet buckets: per-language terciles, ties share a bucket, empty docs drop") {
    // lang A: 9 docs in 3 tie-blocks of 3 ("a" / "a b" / "a b c" — token
    // frequencies 9/6/3 give three DISTINCT perplexities, identical
    // within each block); lang B: 30 docs with distinct lengths; one
    // empty doc drops out
    val aTexts = Seq("a", "a b", "a b c")
    val docs = ((1L to 9L).map(i => (i, "A", aTexts(((i - 1) / 3).toInt))) ++
      (11L to 40L).map(i => (i, "B", ("x " * (i - 9).toInt).trim + " unique" + i)) :+
      ((99L, "A", "")))
      .toDF("doc_id", "lang", "text")
    val out = CcnetBucketer()(docs).cache()
    assert(out.count() == 39) // the empty doc has no tokens, no bucket
    val byLangBucket = out.groupBy("lang", "bucket").count()
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // B: 30 distinct scores → exact 10/10/10
    assert(byLangBucket(("B", "head")) == 10)
    assert(byLangBucket(("B", "middle")) == 10)
    assert(byLangBucket(("B", "tail")) == 10)
    // A: ties — each 3-doc tie block lands in ONE bucket
    val aBuckets = out.filter($"lang" === "A")
      .select($"perplexity", $"bucket").as[(Double, String)].collect()
    aBuckets.groupBy(_._1).foreach { case (_, grp) =>
      assert(grp.map(_._2).distinct.size == 1, "tied scores split a bucket")
    }
    // ordering: head ≤ middle ≤ tail by perplexity within each language
    for (l <- Seq("A", "B")) {
      val maxHead = out.filter($"lang" === l && $"bucket" === "head")
        .agg(max("perplexity")).as[Double].head()
      val minTail = out.filter($"lang" === l && $"bucket" === "tail")
        .agg(min("perplexity")).as[Double].head()
      assert(maxHead <= minTail)
    }
    out.unpersist()
  }

  test("prototype pruner keeps the least-prototypical ceil(n*frac) per cluster") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val centroids = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").cast("int").as("centroid_id"),
        transform(col("embedding"), x => x.cast("double")).as("cvec"))
    val pruner = PrototypePruner(keepFrac = 0.5)
    val scored = pruner.scored(emb, centroids).cache()
    val kept = pruner(emb, centroids)
    // quota per cluster
    val sizes = scored.groupBy("centroid_id").count()
      .as[(Int, Long)].collect().toMap
    val keptSizes = kept.groupBy("centroid_id").count()
      .as[(Int, Long)].collect().toMap
    sizes.foreach { case (c, n) =>
      assert(keptSizes(c) == math.ceil(n * 0.5).toLong, s"cluster $c")
    }
    // kept = rank-selection reference (proto asc, id asc)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("centroid_id").orderBy($"proto".asc, $"vec_id".asc)
    val want = scored.withColumn("rn", row_number().over(w))
      .join(scored.groupBy("centroid_id").agg(count(lit(1)).as("n")), Seq("centroid_id"))
      .filter($"rn" <= ceil($"n" * 0.5))
      .select("vec_id").as[Long].collect().toSet
    assert(kept.select("vec_id").as[Long].collect().toSet == want)
    // keepFrac = 1 keeps everything
    assert(PrototypePruner(keepFrac = 1.0)(emb, centroids).count() == emb.count())
    scored.unpersist()
  }

  test("packing report matches a hand-computed layout") {
    // budget 10: docs of 4,5,3,7,6 tokens → cum 4,9,12,19,25
    // seq boundaries at 10, 20: doc3 (off 9, len 3) crosses, doc5
    // (off 9, len 6) crosses; 3 seqs (ceil 25/10), tail = 5
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c d e"), (3L, "a b c"),
      (4L, "a b c d e f g"), (5L, "a b c d e f")).toDF("doc_id", "text")
    val r = PackingReporter(budget = 10)(docs).collect().head
    assert(r.getAs[Long]("n_docs") == 5)
    assert(r.getAs[Long]("n_seqs") == 3)
    assert(r.getAs[Long]("total_tokens") == 25)
    assert(r.getAs[Long]("crossing_docs") == 2)
    assert(r.getAs[Double]("crossing_frac") == 0.4)
    assert(r.getAs[Long]("tail_tokens") == 5)
  }

  test("vocab coverage: exact boundary-group arithmetic on a hand corpus") {
    // counts: a=5, b=3, c=3, d=1 -> total 12
    val docs = Seq((1L, "a a a b b"), (2L, "a a b c c"), (3L, "c d"))
      .toDF("doc_id", "text")
    val out = graft.operators.VocabCoverage(Seq(1L, 2L, 3L, 10L))(docs)
      .select($"vocab_size", $"covered_occurrences", $"total_occurrences",
        $"coverage")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 == 5)   // top type only
    assert(out(2L)._2 == 8)   // 5 + one of the tied count-3 types
    assert(out(3L)._2 == 11)  // 5 + both count-3 types
    assert(out(10L)._2 == 12) // K beyond the vocabulary covers everything
    assert(out.values.forall(_._3 == 12))
    assert(out(10L)._4 == 1.0)
    assert(out(1L)._4 == math.rint(5.0 / 12.0 * 1e6) / 1e6)
  }

  test("curriculum shards: hash shard membership, perplexity-ascending positions") {
    import graft.operators.text.{CurriculumShardLayout, TrainingShardLayout}
    val docs = (1L to 200L).map(i => (i, i % 37 + 0.25)).toDF("doc_id", "pp")
    val out = CurriculumShardLayout(nShards = 4)
      .assign(docs, col("pp")).cache()
    // same membership as the shuffled layout (the hash is shared)
    val want = TrainingShardLayout(nShards = 4).assign(docs)
      .select($"doc_id", $"shard").as[(Long, Int)].collect().toMap
    val got = out.select($"doc_id", $"shard").as[(Long, Int)].collect().toMap
    assert(got == want)
    // within every shard, pos order == (pp, id) order
    out.select($"shard", $"pos", $"pp", $"doc_id")
      .as[(Int, Long, Double, Long)].collect()
      .groupBy(_._1).foreach { case (_, rows) =>
        val byPos = rows.sortBy(_._2).map(r => (r._3, r._4)).toSeq
        assert(byPos == byPos.sorted, "curriculum order broken")
      }
    out.unpersist()
  }
}
