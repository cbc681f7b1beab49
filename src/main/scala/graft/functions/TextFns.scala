package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-processing column functions.
  *
  * Everything here is built from `org.apache.spark.sql.functions` so the
  * expressions stay inside whole-stage codegen — the Spark-native
  * replacement for the reference's Rust batch kernels
  * (reference: src/lib.rs, operators/dedup/text_exact_dedup.py).
  */
object TextFns {

  /** Whitespace-collapse + trim + lowercase.
    * Mirrors text_exact_dedup.py:99 `_normalize_text` (normalize_whitespace
    * + lowercase defaults).
    */
  def normalizeText(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  /** Content fingerprint of normalized text — md5 hex (portable across
    * engines). reference: text_exact_dedup.py:109 `_compute_hash`. */
  def contentHashMd5(c: Column): Column = md5(normalizeText(c))

  /** 64-bit xxHash of normalized text — the fast in-engine variant
    * (reference prefers xxhash64 when available). */
  def contentHashXx(c: Column): Column = xxhash64(normalizeText(c))

  /** URL+content composite key, FineWeb-style
    * (text_exact_dedup.py:140 `include_url`). */
  def urlContentHash(url: Column, text: Column): Column =
    md5(concat(url, lit("|"), normalizeText(text)))

  /** Whitespace token array. */
  def wsTokens(c: Column): Column = split(trim(c), "\\s+")

  /** Whitespace token count; 0 for empty/blank strings. */
  def wsTokenCount(c: Column): Column =
    when(length(trim(c)) === 0, lit(0)).otherwise(size(wsTokens(c)))

  /** BPE-ish tokens: word pieces and single punctuation marks. */
  def bpeTokens(c: Column): Column =
    regexp_extract_all(c, lit("[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"), lit(0))

  def bpeTokenCount(c: Column): Column = size(bpeTokens(c))

  /** Number of ASCII-punctuation chars. */
  def punctCount(c: Column): Column =
    length(c) - length(regexp_replace(c, "[\\p{Punct}]", ""))

  /** Punctuation chars / total chars (0 for empty). */
  def punctRatio(c: Column): Column =
    when(length(c) === 0, lit(0.0))
      .otherwise(punctCount(c).cast("double") / length(c).cast("double"))

  /** Alphabetic chars / total chars. */
  def alphaRatio(c: Column): Column =
    when(length(c) === 0, lit(0.0))
      .otherwise((length(c) - length(regexp_replace(c, "[A-Za-z]", "")))
        .cast("double") / length(c).cast("double"))

  val defaultStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "be", "this")

  /** Fraction of whitespace tokens that are stopwords. */
  def stopwordRatio(c: Column, stops: Seq[String] = defaultStopwords): Column = {
    val toks = wsTokens(c)
    val hits = size(filter(toks, t => t.isInCollection(stops)))
    when(length(trim(c)) === 0, lit(0.0))
      .otherwise(hits.cast("double") / size(toks).cast("double"))
  }

  /** Mean word length over whitespace tokens. */
  def meanWordLength(c: Column): Column = {
    val toks = wsTokens(c)
    when(length(trim(c)) === 0, lit(0.0))
      .otherwise(
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
          size(toks).cast("double"))
  }

  /** Word n-gram shingles of the normalized text (empty array when the
    * document has fewer than n words). The token array is let-bound
    * ([[Cols.bind]]) so the normalize+split tree runs once per row, not
    * once per shingle inside the transform lambda. */
  def wordShingles(c: Column, n: Int): Column =
    Cols.bind(wsTokens(normalizeText(c))) { toks =>
      when(size(toks) < n, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n)))))
    }

  /** Character n-gram shingles (normalized text let-bound, one regex
    * pass per row). */
  def charShingles(c: Column, n: Int): Column =
    Cols.bind(normalizeText(c)) { s =>
      when(length(s) < n, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), length(s) - (n - 1)),
          i => s.substr(i, lit(n))))
    }

  /** HTML → readable text: drop script/style subtrees, strip tags,
    * decode the common entities, collapse whitespace.
    * Spark-native equivalent of the reference's Rust
    * `html_extract_text` (src/lib.rs:10, text_ops). Pure regexp chain →
    * whole-stage codegen, no UDF.
    */
  def htmlExtractText(c: Column): Column = {
    // two passes without backreferences: \1-style patterns force the
    // regex engine into backtracking mode (and RE2-based engines reject
    // them outright)
    val noScript0 = regexp_replace(c, "(?is)<script[^>]*>.*?</script>", " ")
    val noScript = regexp_replace(noScript0, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noScript, "(?s)<!--.*?-->", " ")
    val noTag = regexp_replace(noComment, "(?s)<[^>]+>", " ")
    val ent = Seq("&nbsp;" -> " ", "&amp;" -> "&", "&lt;" -> "<",
      "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'")
      .foldLeft(noTag) { case (col, (e, r)) => regexp_replace(col, e, r) }
    trim(regexp_replace(ent, "\\s+", " "))
  }
}
