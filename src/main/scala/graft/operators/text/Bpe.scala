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
    * (mirrors the `\w+` half of the B11 regex tokenizer). Lowercasing
    * is Locale.ROOT — locale-INdependent, like Spark's `lower()` — so
    * a Turkish default locale can't diverge the driver trainer from
    * [[DistributedBpeTrainer.wordFreq]] (dotless-ı vs i). */
  def preTokens(text: String): Seq[String] =
    "[\\p{L}\\p{N}]+".r.findAllIn(
      text.toLowerCase(java.util.Locale.ROOT)).toSeq

  /** UTF-8 binary string order (= codepoint order) — Spark's default
    * string collation. The driver trainer tiebreaks with THIS ordering
    * rather than Java's UTF-16 code-unit compareTo, so merge sequences
    * agree with [[DistributedBpeTrainer]] even when candidate pairs
    * contain supplementary-plane symbols (emoji, rare CJK), where the
    * two orders genuinely differ. */
  private[text] val utf8Order: Ordering[String] = (x: String, y: String) => {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(a.length, b.length)
    var i = 0
    var r = 0
    while (i < n && r == 0) { r = (a(i) & 0xff) - (b(i) & 0xff); i += 1 }
    if (r != 0) r else a.length - b.length
  }

  /** One symbol per CODE POINT (not UTF-16 code unit) — a surrogate
    * pair like 𝕒 stays one symbol, matching Spark's `split(w, "")`
    * in [[DistributedBpeTrainer.wordFreq]] (Java regex splits between
    * code points); `word.map(_.toString)` would shear supplementary
    * chars into two unpaired surrogates and diverge the two trainers. */
  private def symbolize(word: String): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      b += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    (b += EndOfWord).result()
  }

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
          // count, then UTF-8-binary lexicographic — the exact
          // ordering of the distributed trainer's orderBy
          .maxBy { case ((a, b), n) => (n, a, b) }(
            Ordering.Tuple3(Ordering.Long, utf8Order, utf8Order))
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

/** [[BpeTokenizer.train]]'s scale-out sibling: the same greedy merge
  * learning with the word-frequency dictionary kept DISTRIBUTED — for
  * corpora whose distinct-word table itself outgrows the driver
  * (multilingual web crawls: hundreds of millions of distinct
  * "words" once typos/URLs/code identifiers flood the long tail).
  *
  * Per merge iteration: one weighted pair-count aggregate over the
  * word table (map-side combined; pairs explode from adjacent symbol
  * positions), ONE collected row (the argmax pair — count then
  * lexicographic, the driver trainer's exact tiebreak), and a map-only
  * greedy re-segmentation fold (left-to-right non-overlapping, the
  * classic BPE application) with a localCheckpoint so lineage stays
  * flat across iterations. The corpus is read once — everything after
  * `wordFreq` touches only the distinct-word table, which shrinks as
  * merges land. Spec'd merge-for-merge equal to the driver-side
  * [[BpeTokenizer.train]]: both paths lowercase locale-independently
  * and tiebreak in UTF-8 binary order, so the parity holds beyond the
  * BMP and under any JVM default locale. */
object DistributedBpeTrainer {

  /** (syms array<string>, n): the word-frequency dictionary,
    * symbolized as chars + the end-of-word marker — identical
    * pre-segmentation to [[BpeTokenizer.preTokens]]/`symbolize`. */
  def wordFreq(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(explode(regexp_extract_all(lower(col(textCol)),
        lit("[\\p{L}\\p{N}]+"), lit(0))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      // Spark's split("") appends a trailing "" (Pattern.split limit -1)
      // that DuckDB's string_split does not — drop empties explicitly
      .select(concat(filter(split(col("w"), ""), x => length(x) > 0),
        array(lit(BpeTokenizer.EndOfWord))).as("syms"), col("n"))

  /** Weighted adjacent-pair counts over a symbolized word table. A
    * fully-merged single-symbol word contributes nothing (guarded:
    * Spark's sequence(1, 0) is the DESCENDING [1, 0], not empty). */
  def pairCounts(words: DataFrame): DataFrame =
    words.filter(size(col("syms")) >= 2)
      .select(col("n"), explode(transform(
        sequence(lit(1), size(col("syms")) - 1),
        i => struct(element_at(col("syms"), i).as("left"),
          element_at(col("syms"), i + 1).as("right")))).as("p"))
      .groupBy(col("p.left").as("left"), col("p.right").as("right"))
      .agg(sum(col("n")).as("cnt"))

  /** One greedy left-to-right merge of (a,b) inside each word — the
    * fold replaces a trailing `a` with `a+b` when `b` arrives, which
    * is exactly the non-overlapping left-to-right rule ("aaa" under
    * (a,a) → ["aa","a"]); a merged symbol can never re-trigger within
    * the same iteration because a+b ≠ a. */
  private def mergeExpr(a: String, b: String): Column =
    aggregate(col("syms"), array().cast("array<string>"),
      (acc, x) => when(size(acc) > 0 &&
          element_at(acc, -1) === a && x === b,
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Learn `numMerges` merges; returns (rank int, left, right,
    * cnt long) in learned order. Each iteration's argmax is one
    * bounded driver action (a single row), the same family as the
    * k-row cluster-size action SemanticDedup documents. */
  def fit(df: DataFrame, numMerges: Int,
      textCol: String = "text"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    var words = wordFreq(df, textCol).localCheckpoint()
    val out = Vector.newBuilder[(Int, String, String, Long)]
    var k = 0
    var exhausted = false
    while (k < numMerges && !exhausted) {
      // ties on count break to the lexicographically LARGEST pair —
      // maxBy((n, a, b)), the driver trainer's exact rule
      val top = pairCounts(words)
        .orderBy(col("cnt").desc, col("left").desc, col("right").desc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        out += ((k + 1, a, b, c))
        words = words.select(mergeExpr(a, b).as("syms"), col("n"))
          .localCheckpoint()
        k += 1
      }
    }
    out.result().toDF("rank", "left", "right", "cnt")
  }

  /** The learned merges as the (left, right) sequence
    * [[BpeTokenizer.encode]]/`countTokens` consume. */
  def fitMerges(df: DataFrame, numMerges: Int,
      textCol: String = "text"): Vector[(String, String)] =
    fit(df, numMerges, textCol).orderBy("rank")
      .collect().map(r => (r.getString(1), r.getString(2))).toVector
}
