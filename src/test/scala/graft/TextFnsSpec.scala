package graft

import graft.functions.{TextFns, UrlFns}
import org.apache.spark.sql.functions._

class TextFnsSpec extends SparkSpec {
  import spark.implicits._

  test("normalizeText collapses whitespace and lowercases") {
    val out = Seq("  Hello\t  World\nFOO  ").toDF("t")
      .select(TextFns.normalizeText($"t")).as[String].head()
    assert(out == "hello world foo")
  }

  test("token counts: whitespace and bpe-ish") {
    val df = Seq("Hello, world! It's 42.", "", "  one  two  ").toDF("t")
    val got = df.select(TextFns.wsTokenCount($"t"), TextFns.bpeTokenCount($"t"))
      .as[(Int, Int)].collect().toSeq
    // "Hello, world! It's 42." → ws: 4; bpe: Hello , world ! It ' s 42 . = 9
    assert(got == Seq((4, 9), (0, 0), (2, 2)))
  }

  test("word shingles") {
    val got = Seq("a b c d").toDF("t")
      .select(TextFns.wordShingles($"t", 3)).as[Seq[String]].head()
    assert(got == Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("t")
      .select(TextFns.wordShingles($"t", 3)).as[Seq[String]].head()
    assert(short.isEmpty)
  }

  test("htmlExtractText strips scripts, styles, tags, entities") {
    val html = """<html><head><style>p{color:red}</style>
      |<script type="text/javascript">var x = "<p>not text</p>";</script>
      |</head><body><h1>Title</h1><p>Hello &amp; welcome to <b>graft</b>!</p>
      |<!-- a comment --></body></html>""".stripMargin
    val out = Seq(html).toDF("t")
      .select(TextFns.htmlExtractText($"t")).as[String].head()
    assert(out == "Title Hello & welcome to graft !")
  }

  test("url domain extraction and subdomain matching") {
    val df = Seq("https://sub.evil.com/x?q=1", "evil.com/plain",
      "http://good.org:8080/", "ftp://files.example.net/a").toDF("u")
    val got = df.select(UrlFns.extractDomain($"u")).as[String].collect().toSeq
    assert(got == Seq("sub.evil.com", "evil.com", "good.org:8080", "files.example.net"))
    val matched = df.select(
      UrlFns.domainInSet(UrlFns.extractDomain($"u"), Seq("evil.com")))
      .as[Boolean].collect().toSeq
    assert(matched == Seq(true, true, false, false))
  }

  test("urlScore follows the reference combine formula") {
    val w = Map("porn" -> 1.0, "poker" -> 0.7)
    val got = Seq("https://x.com/clean", "https://poker-porn.com/pp")
      .toDF("u").select(round(UrlFns.urlScore($"u", w), 6)).as[Double].collect().toSeq
    // second: max=1.0, total=1.7 → 0.8*1.0 + min(1.7/3, 0.2) = 1.0 → capped 1.0
    assert(got == Seq(0.0, 1.0))
  }

  test("fingerprint: min md5 over 8-gram windows") {
    import graft.operators.text.Fingerprinter
    val df = Seq((1L, "abcdefghij"), (2L, "short")).toDF("doc_id", "text")
    val got = Fingerprinter(8)(df).select($"fingerprint").as[String].collect()
    assert(got.forall(_.length == 32))
  }
}
