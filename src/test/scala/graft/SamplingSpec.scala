package graft

import graft.operators.text.{CreditCardRedactor, GroupCap, HashSampler, LeakageSafeSplit, PiiRedactor, TokenBudgetSampler, TopFractionByGroup, TrainingShardLayout}
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("hash split is deterministic, exhaustive, and roughly proportional") {
    val ids = (1L to 1000L).toDF("doc_id")
    val hs = HashSampler()
    val split1 = hs.split(ids, 80, 10).groupBy("split").count()
      .as[(String, Long)].collect().toMap
    val split2 = hs.split(ids, 80, 10).groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(split1 == split2)
    assert(split1.values.sum == 1000L)
    assert(split1("train") > 700 && split1("train") < 900)
    assert(split1("val") > 50 && split1("val") < 160)
  }

  test("different seeds give decorrelated samples; sample is a filter (no shuffle)") {
    val ids = (1L to 500L).toDF("doc_id")
    val a = HashSampler(seed = "a").sample(ids, 50).as[Long].collect().toSet
    val b = HashSampler(seed = "b").sample(ids, 50).as[Long].collect().toSet
    assert(a != b && a.nonEmpty && b.nonEmpty)
    val plan = HashSampler().sample(ids, 10).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("mixture sampler hits target proportions within budget; rates capped at 1") {
    val sq = spark
    import sq.implicits._
    // 1000 docs in A, 100 in B, 10 in C
    val docs = ((1 to 1000).map(i => (i.toLong, "A")) ++
      (1001 to 1100).map(i => (i.toLong, "B")) ++
      (1101 to 1110).map(i => (i.toLong, "C"))).toDF("doc_id", "source")
    val ms = graft.operators.text.MixtureSampler()
    val weights = Map("A" -> 0.5, "B" -> 0.3, "C" -> 0.2)
    val rates = ms.rates(docs, weights, budget = 200)
      .select($"source", $"rate").as[(String, Double)].collect().toMap
    assert(rates("A") == 0.1)   // 200*0.5/1000
    assert(rates("B") == 0.6)   // 200*0.3/100
    assert(rates("C") == 1.0)   // 200*0.2/10 capped — short source taken whole
    val got = ms.sample(docs, weights, budget = 200)
    val bySource = got.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(bySource("C") == 10) // rate 1.0 keeps everything
    assert(math.abs(bySource("A") - 100L) < 30) // hash noise around n*rate
    assert(math.abs(bySource("B") - 60L) < 25)
    // deterministic: same sample on rerun
    val again = ms.sample(docs, weights, budget = 200)
      .select("doc_id").as[Long].collect().toSet
    assert(again == got.select("doc_id").as[Long].collect().toSet)
  }

  test("token-budget sampler fills each source to its budget plus at most one doc") {
    val docs = (1L to 200L).map { i =>
      (i, s"src${i % 4}", ("w " * (10 + (i % 7)).toInt).trim)
    }.toDF("doc_id", "source", "text")
    val tbs = TokenBudgetSampler()
    val out = tbs.sample(docs, graft.functions.TextFns.wsTokenCount(col("text")),
      Map("src0" -> 100L, "src1" -> 40L), defaultBudget = 0L)
    val taken = out
      .withColumn("tok", graft.functions.TextFns.wsTokenCount(col("text")).cast("long"))
      .groupBy("source").agg(sum("tok").as("toks"), max("tok").as("maxTok"),
        count(lit(1)).as("n"))
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // unlisted sources dropped entirely
    assert(!taken.contains("src2") && !taken.contains("src3"))
    // budget reached but overshoot bounded by the last doc taken
    val (_, t0, m0, _) = taken("src0")
    assert(t0 >= 100L && t0 < 100L + m0)
    val (_, t1, m1, _) = taken("src1")
    assert(t1 >= 40L && t1 < 40L + m1)
    // deterministic across runs
    val again = tbs.sample(docs, graft.functions.TextFns.wsTokenCount(col("text")),
      Map("src0" -> 100L, "src1" -> 40L), defaultBudget = 0L)
      .select("doc_id").as[Long].collect().toSet
    assert(again == out.select("doc_id").as[Long].collect().toSet)
  }

  test("sharded token-budget sampler: exact budget split, bounded overshoot, 1-shard = unsharded") {
    val docs = (1L to 400L).map { i =>
      (i, s"src${i % 3}", ("w " * (5 + (i % 9)).toInt).trim)
    }.toDF("doc_id", "source", "text")
    val toks = graft.functions.TextFns.wsTokenCount(col("text"))
    val budgets = Map("src0" -> 203L, "src1" -> 80L) // 203 = 4*50+3: exercises the remainder split
    val tbs = TokenBudgetSampler()
    // shards=1 must pick the identical set as the unsharded sampler
    val plain = tbs.sample(docs, toks, budgets).select("doc_id")
      .as[Long].collect().toSet
    val oneShard = tbs.sampleSharded(docs, toks, budgets, shards = 1)
      .select("doc_id").as[Long].collect().toSet
    assert(oneShard == plain)
    // 4 shards: per-source total still reaches the budget, overshoot now
    // bounded by one doc per SHARD (shards × max token count)
    val out = tbs.sampleSharded(docs, toks, budgets, shards = 4)
    val taken = out.withColumn("tok", toks.cast("long"))
      .groupBy("source").agg(sum("tok").as("t"), max("tok").as("m"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    Seq("src0" -> 203L, "src1" -> 80L).foreach { case (src, b) =>
      val (_, t, m) = taken(src)
      assert(t >= b - 4 * m && t < b + 4 * m,
        s"$src: took $t tokens vs budget $b (maxTok $m)")
    }
    assert(!taken.contains("src2")) // defaultBudget 0 drops unlisted sources
    // rerun-stable
    val again = tbs.sampleSharded(docs, toks, budgets, shards = 4)
      .select("doc_id").as[Long].collect().toSet
    assert(again == out.select("doc_id").as[Long].collect().toSet)
  }

  test("token-budget sampler passes null-token docs through at zero cost") {
    // a null text yields a null token count; it must count as 0 (ride
    // along free), not null out the running sum and silently drop docs —
    // in particular, budget > 0 must still yield at least one document
    // even when the first-ordered doc has a null count
    val docs = Seq(
      (1L, "src0", null.asInstanceOf[String]),
      (2L, "src0", null.asInstanceOf[String])
    ).toDF("doc_id", "source", "text")
    val out = TokenBudgetSampler()
      .sample(docs, graft.functions.TextFns.wsTokenCount(col("text")),
        Map("src0" -> 1L))
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L, 2L)) // zero-cost docs never exhaust the budget
  }

  test("sequence packer: global cumsum correct across partitions, no single-partition window") {
    val docs = (1L to 200L).map(i => (i, ("tok " * ((i % 7).toInt + 1)).trim))
      .toDF("doc_id", "text")
    val packed = graft.operators.text.SequencePacker(budget = 10)(docs.repartition(8))
      .orderBy("doc_id").collect()
    var cum = 0L
    for (r <- packed) {
      val n = r.getAs[Long]("n_tokens")
      assert(r.getAs[Long]("seq_id") == cum / 10, s"doc ${r.getLong(0)}")
      assert(r.getAs[Long]("seq_offset") == cum % 10)
      cum += n
      assert(r.getAs[Long]("cum_tokens") == cum)
    }
  }

  test("document chunker: overlap windows cover every token") {
    val docs = Seq((1L, (1 to 150).map("t" + _).mkString(" ")), (2L, "short doc"))
      .toDF("doc_id", "text")
    val chunks = graft.operators.text.DocumentChunker(maxTokens = 64, overlap = 8)(docs)
      .as[(Long, Int, String, Long)].collect().groupBy(_._1)
    assert(chunks(2L).length == 1 && chunks(2L).head._3 == "short doc")
    val c1 = chunks(1L).sortBy(_._2)
    assert(c1.length == 3) // 150 tokens, stride 56: chunks at 0,56,112
    assert(c1(0)._3.startsWith("t1 ") && c1(1)._3.startsWith("t57 ") && c1(2)._3.startsWith("t113 "))
    assert(c1(2)._4 == 38) // 150 - 112
  }

  test("pii redactor masks and counts each kind") {
    val df = Seq((1L, "mail me at a.b@x.io or 555-123-4567; ssn 123-45-6789 host 192.168.0.1"))
      .toDF("doc_id", "text")
    val out = PiiRedactor()(df).select("text", "n_emails", "n_phones", "n_ssns", "n_ips")
      .as[(String, Int, Int, Int, Int)].head()
    assert(out._1 == "mail me at <EMAIL> or <PHONE>; ssn <SSN> host <IP>")
    assert((out._2, out._3, out._4, out._5) == (1, 1, 1, 1))
  }

  test("training-shard layout: partition-invariant, exhaustive, ordered on disk") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val tsl = TrainingShardLayout(nShards = 4)
    val a = tsl.assign(docs).select("doc_id", "shard", "pos")
      .as[(Long, Int, Long)].collect().toSet
    // layout must not depend on the input's physical partitioning
    val b = tsl.assign(docs.repartition(7)).select("doc_id", "shard", "pos")
      .as[(Long, Int, Long)].collect().toSet
    assert(a == b)
    // exhaustive permutation: every doc exactly once, per-shard pos is
    // a gapless 0..n_k-1 range
    assert(a.size == docs.count())
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3) == (0L until rows.size).toSet)
    }
    // written shards are parquet dirs sorted by pos with a manifest
    // that matches them
    val out = java.nio.file.Files.createTempDirectory("graft_shards").toString
    val manifest = tsl.write(docs, out,
      tokenCount = Some(size(split(col("text"), " "))))
      .as[(Int, Long, Long)].collect().map { case (s, r, t) => s -> (r, t) }.toMap
    (0 until 4).foreach { k =>
      val rows = spark.read.parquet(s"$out/shard=$k")
        .select("pos").as[Long].collect()
      assert(rows.toSeq == rows.sorted.toSeq, s"shard $k not pos-ordered")
      assert(manifest(k)._1 == rows.length)
    }
    assert(manifest.values.map(_._1).sum == docs.count())
  }

  test("TopFractionByGroup == per-group rank by (score desc, id)") {
    // mixed tie structure: scores i % 7 force boundary tie admission
    val rows = (0L until 200L).map(i =>
      (i, s"src${i % 3}", (i % 7).toDouble)).toDF("doc_id", "source", "score")
    val got = TopFractionByGroup(frac = 0.3)(rows)
      .select("doc_id").as[Long].collect().toSet
    val naive = (0L until 200L).map(i => (i, s"src${i % 3}", (i % 7).toDouble))
      .groupBy(_._2).flatMap { case (_, g) =>
        val k = math.ceil(g.size * 0.3).toInt
        g.sortBy(r => (-r._3, r._1)).take(k)
      }.map(_._1).toSet
    assert(got == naive)
  }

  test("TopFractionByGroup: degenerate single-score group, ceil quota") {
    val rows = Seq((1L, "a", 5.0), (2L, "a", 5.0), (3L, "a", 5.0),
      (4L, "b", 1.0)).toDF("doc_id", "source", "score")
    val got = TopFractionByGroup(frac = 0.5)(rows)
      .select("doc_id").as[Long].collect().toSet
    // a: ceil(3*0.5)=2 smallest ids of the tie block; b: ceil(0.5)=1
    assert(got == Set(1L, 2L, 4L))
  }

  test("TopFractionByGroup: null scores neither survive nor inflate the quota") {
    // group a: 4 scored + 4 unscored rows. The quota must be
    // ceil(4 * 0.5) = 2 over SCORED rows only — were the nulls counted,
    // __k would be ceil(8 * 0.5) = 4 and all scored rows would survive.
    val rows = Seq(
      (1L, "a", java.lang.Double.valueOf(4.0)),
      (2L, "a", java.lang.Double.valueOf(3.0)),
      (3L, "a", java.lang.Double.valueOf(2.0)),
      (4L, "a", java.lang.Double.valueOf(1.0)),
      (5L, "a", null.asInstanceOf[java.lang.Double]),
      (6L, "a", null.asInstanceOf[java.lang.Double]),
      (7L, "a", null.asInstanceOf[java.lang.Double]),
      (8L, "a", null.asInstanceOf[java.lang.Double])
    ).toDF("doc_id", "source", "score")
    val got = TopFractionByGroup(frac = 0.5)(rows)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 2L))
  }

  test("TopFractionByGroup keeps all rows at frac=1 and output schema is input's") {
    val rows = Seq((1L, "a", 2.0), (2L, "a", 1.0)).toDF("doc_id", "source", "score")
    val out = TopFractionByGroup(frac = 1.0)(rows)
    assert(out.columns.toSeq == rows.columns.toSeq)
    assert(out.count() == 2)
  }

  test("credit-card redactor: Luhn separates cards from card-shaped noise") {
    val df = Seq(
      (1L, "pay 4111 1111 1111 1111 now"),        // Visa test number: valid
      (2L, "pay 4111-1111-1111-1112 now"),        // same shape, bad checksum
      (3L, "amex 378282246310005 ok"),            // 15-digit valid
      (4L, "order 1234567890123456 shipped"),     // invalid
      (5L, "totally clean"),
      (6L, "two: 4111111111111111 and 5555555555554444 !") // both valid
    ).toDF("doc_id", "text")
    val out = CreditCardRedactor()(df)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("text"), r.getAs[Int]("n_cards"))).toMap
    assert(out(1L) == ("pay <CC> now", 1))
    assert(out(2L) == ("pay 4111-1111-1111-1112 now", 0))
    assert(out(3L) == ("amex <CC> ok", 1))
    assert(out(4L) == ("order 1234567890123456 shipped", 0))
    assert(out(5L) == ("totally clean", 0))
    assert(out(6L) == ("two: <CC> and <CC> !", 2))
  }

  test("GroupCap: fixed per-group quota, boundary ties by id, small groups intact") {
    // group a: 5 rows scores 5,4,3,3,3 — cap 3 keeps 5,4 and the
    // SMALLEST-id member of the tied 3s; group b: 2 rows < cap → all kept
    val rows = Seq[(Long, String, Option[Double])](
      (1L, "a", Some(5.0)), (2L, "a", Some(4.0)), (3L, "a", Some(3.0)),
      (4L, "a", Some(3.0)), (5L, "a", Some(3.0)), (6L, "b", Some(1.0)),
      (7L, "b", Some(9.0)), (8L, "a", None)
    ).toDF("doc_id", "source", "score")
    val kept = GroupCap(n = 3)(rows).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L, 6L, 7L))
    intercept[IllegalArgumentException] { GroupCap(0) }
  }

  test("LeakageSafeSplit: components never straddle splits; audit catches per-doc leaks") {
    // a 3-member near-dup chain (1~2, 2~3), a pair (10~11), and
    // isolated docs — edges as any near-dup operator would emit them
    val docs = (Seq(1L, 2L, 3L, 10L, 11L) ++ (20L to 80L)).toDF("doc_id")
      .withColumn("text", concat(lit("doc "), col("doc_id")))
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val out = LeakageSafeSplit(docs, edges)
      .select("doc_id", "component", "split")
      .as[(Long, Long, String)].collect()
    assert(out.length == docs.count())
    // every component maps to exactly ONE split, under any seed
    val byComp = out.groupBy(_._2).view.mapValues(_.map(_._3).distinct)
    byComp.foreach { case (c, splits) =>
      assert(splits.length == 1, s"component $c straddles: $splits")
    }
    assert(out.find(_._1 == 1L).get._2 == 1L) // min-label component
    assert(Set(1L, 2L, 3L).map(id => out.find(_._1 == id).get._3).size == 1)
    // isolated docs are their own component → split keyed by own id,
    // i.e. identical to the per-doc hash split
    val perDoc = HashSampler().split(docs, 80, 10)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    out.filter(r => r._1 >= 20L).foreach { r =>
      assert(r._3 == perDoc(r._1), s"isolated doc ${r._1}")
    }
    // the audit: the per-doc split leaks iff a component's members drew
    // different buckets; verify the audit reports exactly those
    val audited = LeakageSafeSplit
      .audit(HashSampler().split(docs, 80, 10), edges)
      .select("component", "n_splits").as[(Long, Long)].collect().toMap
    val straddling = Seq(Seq(1L, 2L, 3L), Seq(10L, 11L)).flatMap { comp =>
      val ss = comp.map(perDoc).distinct
      if (ss.size > 1) Some(comp.min -> ss.size.toLong) else None
    }.toMap
    assert(audited == straddling)
    // a leakage-safe split audits clean against its own edges
    assert(LeakageSafeSplit.audit(
      LeakageSafeSplit(docs, edges), edges).isEmpty)
  }
}
