package graft

import graft.operators.text.{CcnetBucketer, PerplexityScorer}
import org.apache.spark.sql.functions._

/** Pruned-LM semantics (the r15 verdict's one scale-killer fix): LM
  * capped at top-k tokens, OOV scored at the ln(oovAlpha/total) floor,
  * and the broadcast hint present ONLY on the bounded (pruned) table.
  * The invariant the whole design rests on: capping never changes a
  * result unless it actually prunes. */
class PerplexityPruneSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "en", "the cat sat on the mat"),
    (2L, "en", "the dog sat on the rug"),
    (3L, "en", "a rare zyzzyva specimen"),
    (4L, "fr", "le chat le chien le chat"),
    (5L, "fr", "un mot unique ici"),
    (6L, "en", "the the the the")
  ).toDF("doc_id", "lang", "text")

  test("PerplexityScorer: capped == uncapped when the vocab fits") {
    val base = PerplexityScorer()
    val capped = PerplexityScorer(maxVocab = 100000)
    val a = base.scores(docs, base.model(docs))
      .as[(Long, Double)].collect().toMap
    val b = capped.scores(docs, capped.model(docs))
      .as[(Long, Double)].collect().toMap
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("PerplexityScorer: pruning floors OOV tokens at ln(oovAlpha/total)") {
    val p = PerplexityScorer(maxVocab = 3)
    val lm = p.model(docs)
    // counts: the=9, le=3, sat/on/chat=2... top-3 by (n desc, t asc):
    // the(9), le(3), chat(2) beats others at n=2? ties at n=2 break by
    // token asc — compute the reference instead of hand-listing
    val counts = docs
      .select(explode(split(lower(trim(regexp_replace(col("text"), "\\s+", " "))), " ")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect()
    val total = counts.map(_._2).sum.toDouble
    val kept = counts.sortBy { case (t, n) => (-n, t) }.take(3).toMap
    val floor = math.log(1.0 / total)
    // model rows: exactly the kept tokens + one null floor row
    val dict = lm.filter(col("t").isNotNull)
      .as[(String, Double)].collect().toMap
    assert(dict.keySet == kept.keySet)
    dict.foreach { case (t, lp) =>
      assert(math.abs(lp - math.log(kept(t) / total)) < 1e-12, t)
    }
    val floorRows = lm.filter(col("t").isNull).select("logp").as[Double].collect()
    assert(floorRows.toSeq == Seq(floor))
    // a doc of entirely OOV tokens scores exp(-floor) exactly
    val scored = p.scores(docs, lm).as[(Long, Double)].collect().toMap
    val allOov = docs.filter(col("doc_id") === 3L) // "a rare zyzzyva specimen"
      .select(explode(split(col("text"), " ")).as("t"))
      .as[String].collect().forall(t => !kept.contains(t))
    assert(allOov)
    assert(math.abs(scored(3L) - BigDecimal(math.exp(-floor))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    // every doc still present (left join keeps all-OOV docs)
    assert(scored.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
  }

  test("CcnetBucketer: capped == uncapped when every language's vocab fits") {
    val a = CcnetBucketer()(docs)
      .as[(Long, String, Double, String)].collect().toSet
    val b = CcnetBucketer(maxVocabPerLang = 100000)(docs)
      .as[(Long, String, Double, String)].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("CcnetBucketer: salted two-level prune == single-level top-k per language") {
    // enough tokens that the 64 salts actually split the vocab
    val big = (1L to 400L).map { i =>
      (i, s"l${i % 3}", (1 to 20).map(j => s"w${(i * 7 + j * 13) % 97}").mkString(" "))
    }.toDF("doc_id", "lang", "text")
    val k = 10
    val prunedScores = CcnetBucketer(maxVocabPerLang = k).scores(big)
      .as[(Long, String, Double)].collect().toSet
    // reference: plain per-lang row_number top-k + left join + floor
    big.createOrReplaceTempView("__ccnet_big")
    val ref = spark.sql(s"""
      WITH toks AS (
        SELECT doc_id, lang,
          explode(split(lower(trim(regexp_replace(text, '\\\\s+', ' '))), ' ')) AS t
        FROM __ccnet_big WHERE length(trim(text)) > 0),
      counts AS (SELECT lang, t, count(*) AS n FROM toks GROUP BY 1, 2),
      tot AS (SELECT lang, sum(n) AS total FROM counts GROUP BY lang),
      kept AS (
        SELECT lang, t, n FROM (
          SELECT lang, t, n,
            row_number() OVER (PARTITION BY lang ORDER BY n DESC, t ASC) AS r
          FROM counts) WHERE r <= $k),
      lm AS (SELECT kept.lang, t, ln(CAST(n AS DOUBLE) / total) AS logp
             FROM kept JOIN tot ON kept.lang <=> tot.lang),
      fl AS (SELECT lang, ln(1.0 / total) AS floor FROM tot)
      SELECT toks.doc_id, toks.lang,
        round(exp(-avg(coalesce(lm.logp, fl.floor))), 4) AS perplexity
      FROM toks
      LEFT JOIN lm ON toks.lang <=> lm.lang AND toks.t = lm.t
      JOIN fl ON toks.lang <=> fl.lang
      GROUP BY 1, 2""").as[(Long, String, Double)].collect().toSet
    assert(prunedScores == ref)
  }

  test("a legacy/external lm WITHOUT a floor row keeps inner-join semantics") {
    // the r16 review finding: an lm lacking the t-IS-NULL floor row
    // must not annihilate the output (the floor attaches as a 1-row
    // aggregate, null when absent); in-vocab tokens score as before,
    // OOV tokens drop from the mean — the pre-floor convention
    val p = PerplexityScorer()
    val full = p.model(docs)
    val legacy = full.filter(col("t").isNotNull) // strip the floor row
    val a = p.scores(docs, full).as[(Long, Double)].collect().toMap
    val b = p.scores(docs, legacy).as[(Long, Double)].collect().toMap
    assert(a == b && a.nonEmpty) // no OOV here, so identical
    // and with a PRUNED legacy lm, OOV tokens are simply excluded
    val prunedLegacy = PerplexityScorer(maxVocab = 3).model(docs)
      .filter(col("t").isNotNull)
    val c = p.scores(docs, prunedLegacy).as[(Long, Double)].collect()
    assert(c.nonEmpty) // rows survive; nothing annihilated
  }

  test("broadcast hint: present iff the LM is pruned (bounded)") {
    def lmJoinHints(df: org.apache.spark.sql.DataFrame): Seq[Boolean] = {
      import org.apache.spark.sql.catalyst.plans.logical.Join
      df.queryExecution.optimizedPlan.collect {
        case j: Join if j.joinType.sql == "LEFT OUTER" =>
          j.hint.rightHint.exists(_.strategy.isDefined)
      }
    }
    val base = PerplexityScorer()
    val pruned = PerplexityScorer(maxVocab = 3)
    assert(lmJoinHints(base.scores(docs, base.model(docs))) == Seq(false))
    assert(lmJoinHints(pruned.scores(docs, pruned.model(docs))) == Seq(true))
    assert(lmJoinHints(CcnetBucketer().scores(docs)) == Seq(false))
    assert(lmJoinHints(CcnetBucketer(maxVocabPerLang = 3).scores(docs)) == Seq(true))
  }
}
