package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer learned in-repo (Sennrich et al. 2016 —
  * the construction under GPT-style tokenizers). Training is NOT a
  * big-data problem (vocabularies are learned from a bounded sample;
  * GPT-2's was ~40 GB against a fixed 50k budget), so `train` runs
  * driver-side over a sampled word-frequency dictionary; *application*
  * is the distributed part — `countTokens` ships the merge ranks to
  * executors once and encodes each document in a scalar UDF (encode is
  * an iterative greedy loop, inexpressible as a Column tree).
  *
  * Word pre-segmentation: lowercase word characters with a trailing
  * end-of-word marker, matching the whitespace/punct split of
  * [[graft.functions.TextFns]] token counting — the learned tokenizer
  * refines B11's regex approximation, not replaces its contract.
  */
object BpeTokenizer {

  val EndOfWord = "</w>"

  /** Split to pre-tokens: lowercased word runs; punctuation dropped
    * (mirrors the `\w+` half of the B11 regex tokenizer). */
  def preTokens(text: String): Seq[String] =
    "[\\p{L}\\p{N}]+".r.findAllIn(text.toLowerCase).toSeq

  private def symbolize(word: String): Vector[String] =
    word.map(_.toString).toVector :+ EndOfWord

  /** Greedy merge learning over a word-frequency dict. Deterministic:
    * ties on pair count break lexicographically. */
  def train(texts: Iterable[String], numMerges: Int): Vector[(String, String)] = {
    val freq = scala.collection.mutable.Map.empty[Vector[String], Long]
    for (t <- texts; w <- preTokens(t))
      freq.updateWith(symbolize(w))(c => Some(c.getOrElse(0L) + 1L))
    var words = freq.toVector
    val merges = Vector.newBuilder[(String, String)]
    var k = 0
    while (k < numMerges) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, n) <- words; i <- 0 until syms.length - 1)
        pairCounts.updateWith((syms(i), syms(i + 1)))(c => Some(c.getOrElse(0L) + n))
      if (pairCounts.isEmpty) k = numMerges
      else {
        val best = pairCounts.toVector
          .maxBy { case ((a, b), n) => (n, a, b) } // count, then lexicographic
          ._1
        merges += best
        val merged = best._1 + best._2
        words = words.map { case (syms, n) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
              out += merged; i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.result(), n)
        }
        k += 1
      }
    }
    merges.result()
  }

  /** Encode one word by applying merges in learned-rank order. */
  def encodeWord(word: String, rank: Map[(String, String), Int]): Vector[String] = {
    var syms = symbolize(word)
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) done = true
      else syms = (syms.take(bestIdx) :+ (syms(bestIdx) + syms(bestIdx + 1))) ++
        syms.drop(bestIdx + 2)
    }
    syms
  }

  def encode(text: String, merges: Seq[(String, String)]): Seq[String] = {
    val rank = merges.zipWithIndex.toMap
    preTokens(text).flatMap(w => encodeWord(w, rank))
  }

  /** Distributed application: adds `bpe_token_count` using the learned
    * merge table (captured once per executor by the UDF closure). */
  def countTokens(df: DataFrame, merges: Seq[(String, String)],
      textCol: String = "text"): DataFrame = {
    val rank = merges.zipWithIndex.toMap
    val countUdf = udf { (t: String) =>
      if (t == null) 0L
      else preTokens(t).map(w => encodeWord(w, rank).length.toLong).sum
    }
    df.withColumn("bpe_token_count", countUdf(col(textCol)))
  }
}
