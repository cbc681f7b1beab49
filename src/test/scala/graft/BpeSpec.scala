package graft

import graft.operators.text.BpeTokenizer

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    "low lower lowest", "low low low", "new newer newest", "wider wide wide")

  test("training learns the most frequent pair first, deterministically") {
    val merges = BpeTokenizer.train(corpus, 10)
    assert(merges.nonEmpty)
    // (l,o) and (o,w) tie at 7 occurrences; the documented tiebreak
    // (lexicographically largest) picks (o,w)
    assert(merges.head == ("o", "w"))
    assert(BpeTokenizer.train(corpus, 10) == merges) // rerun-stable
  }

  test("encoding is lossless over pre-tokens and compresses frequent words") {
    val merges = BpeTokenizer.train(corpus, 30)
    val toks = BpeTokenizer.encode("low lowest", merges)
    // concatenation restores the pre-token stream (with word markers)
    assert(toks.mkString("") == "low</w>lowest</w>")
    // the frequent word collapses to a single learned token
    assert(toks.head == "low</w>")
    // unseen words still encode (fall back toward characters)
    val unseen = BpeTokenizer.encode("zebra", merges)
    assert(unseen.mkString("") == "zebra</w>")
  }

  test("distributed token counting matches local encoding") {
    val merges = BpeTokenizer.train(corpus, 30)
    val df = Seq((1L, "low lower"), (2L, "completely new words here"), (3L, ""))
      .toDF("doc_id", "text")
    val got = BpeTokenizer.countTokens(df, merges)
      .select("doc_id", "bpe_token_count").as[(Long, Long)].collect().toMap
    def local(t: String) = BpeTokenizer.encode(t, merges).length.toLong
    assert(got(1L) == local("low lower"))
    assert(got(2L) == local("completely new words here"))
    assert(got(3L) == 0L)
  }

  test("distributed trainer matches the driver trainer merge for merge") {
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val driver = graft.operators.text.BpeTokenizer.train(corpus, 8)
    val dist = graft.operators.text.DistributedBpeTrainer.fitMerges(df, 8)
    assert(dist == driver, s"dist=$dist driver=$driver")
    // partition layout must not change the learned merges
    val distP = graft.operators.text.DistributedBpeTrainer
      .fitMerges(df.repartition(5), 8)
    assert(distP == driver)
  }

  test("driver/distributed parity holds beyond the BMP (UTF-8 tiebreak)") {
    // The divergent case: a high-BMP letter vs a supplementary-plane
    // letter. UTF-16 code units sort ａ (U+FF41, 0xFF41) ABOVE
    // 𝕒 (U+1D552, surrogates 0xD835 0xDD52); UTF-8 bytes sort
    // 𝕒 (F0 9D 95 92) ABOVE ａ (EF BD 81). All four candidate pairs
    // tie at count 2, so the tiebreak alone decides merge #1 — Java
    // compareTo would pick (ａ,b); Spark's binary collation (and the
    // driver's utf8Order) picks (𝕒,c). The two trainers must agree.
    val texts = Seq("ａb ａb 𝕒c 𝕒c")
    val driver = graft.operators.text.BpeTokenizer.train(texts, 1)
    val df = Seq((1L, texts.head)).toDF("doc_id", "text")
    val dist = graft.operators.text.DistributedBpeTrainer.fitMerges(df, 1)
    assert(dist == driver, s"dist=$dist driver=$driver")
    // and the winner is the UTF-8-larger pair (the supplementary char)
    assert(driver.head == (("𝕒", "c")), driver.toString)
  }

  test("distributed trainer stops when every word is a single symbol") {
    val df = Seq((1L, "ab")).toDF("doc_id", "text")
    val m = graft.operators.text.DistributedBpeTrainer.fit(df, 10).collect()
    assert(m.length == 2, m.mkString(";")) // two merges exhaust 'ab</w>'
  }

  test("learned tokenizer runs over the test corpus end to end") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val sample = docs.select("text").limit(200).as[String].collect()
    val merges = BpeTokenizer.train(sample, 100)
    assert(merges.size == 100)
    val counted = BpeTokenizer.countTokens(docs, merges)
    val rows = counted.selectExpr("count(*)", "sum(bpe_token_count)")
      .as[(Long, Long)].head()
    assert(rows._1 > 0 && rows._2 > 0)
  }
}
