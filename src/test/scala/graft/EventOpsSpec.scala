package graft

import graft.operators.events.{CohortRetention, FunnelAnalyzer, SnapshotCompactor, Winsorizer}
import java.sql.Timestamp
import org.apache.spark.sql.functions.{col, date_format}

class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("snapshot compactor keeps the latest version per key, id tiebreak") {
    val ev = Seq(
      (1L, 10L, "click", ts(100), 1.0),
      (2L, 10L, "click", ts(300), 2.0),   // latest click for user 10
      (3L, 10L, "view", ts(200), 3.0),
      (4L, 10L, "click", ts(250), 4.0),
      (5L, 20L, "click", ts(100), 5.0),
      (6L, 20L, "click", ts(100), 6.0)    // ts tie → larger event_id wins
    ).toDF("event_id", "user_id", "event_type", "ts", "value")
    val kept = SnapshotCompactor(Seq("user_id", "event_type"))(ev)
      .select("event_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L, 6L))
  }

  test("snapshot compactor is safe under ids that repeat across keys") {
    // event_id 1 appears under BOTH (10, click) and (20, view); it wins
    // only the second key — an id-only semi-join would also retain the
    // losing (10, click) copy. Null group keys form a real group.
    val ev = Seq(
      (1L, Some(10L), "click", ts(100), 1.0),
      (2L, Some(10L), "click", ts(300), 2.0),  // (10, click) winner
      (1L, Some(20L), "view", ts(500), 3.0),   // (20, view) winner, same id
      (5L, None, "click", ts(100), 4.0),
      (6L, None, "click", ts(200), 5.0)        // (null, click) winner
    ).toDF("event_id", "user_id", "event_type", "ts", "value")
    val kept = SnapshotCompactor(Seq("user_id", "event_type"))(ev)
      .select("event_id", "user_id").as[(Long, Option[Long])].collect().toSet
    assert(kept == Set((2L, Some(10L)), (1L, Some(20L)), (6L, None)))
  }

  test("funnel counts users completing stages in order only") {
    val ev = Seq(
      // u1 completes view → click → buy in order
      (1L, 1L, "view", ts(10), 0.0), (2L, 1L, "click", ts(20), 0.0),
      (3L, 1L, "buy", ts(30), 0.0),
      // u2 clicks BEFORE viewing: stops at stage 1
      (4L, 2L, "click", ts(5), 0.0), (5L, 2L, "view", ts(10), 0.0),
      // u3 views and clicks, never buys
      (6L, 3L, "view", ts(10), 0.0), (7L, 3L, "click", ts(15), 0.0),
      // u4 only buys: counted nowhere
      (8L, 4L, "buy", ts(10), 0.0)
    ).toDF("event_id", "user_id", "event_type", "ts", "value")
    val got = FunnelAnalyzer(Seq("view", "click", "buy"))(ev)
      .select("stage_idx", "n_users", "conversion")
      .as[(Int, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1, 3L, 1.0), (2, 2L, 0.666667), (3, 1L, 0.333333)))
  }

  test("funnel: a second qualifying event later still counts the stage") {
    // u1's first click precedes the view, but a later click follows it
    val ev = Seq(
      (1L, 1L, "click", ts(5), 0.0), (2L, 1L, "view", ts(10), 0.0),
      (3L, 1L, "click", ts(20), 0.0)
    ).toDF("event_id", "user_id", "event_type", "ts", "value")
    val got = FunnelAnalyzer(Seq("view", "click"))(ev)
      .select("stage_idx", "n_users").as[(Int, Long)].collect().toMap
    assert(got == Map(1 -> 1L, 2 -> 1L))
  }

  test("winsorizer clips to nearest-rank percentile bounds") {
    // 20 values 1..20: p10 bound = ceil(0.1*20)=2nd value = 2,
    // p90 bound = ceil(0.9*20)=18th value = 18
    val ev = (1L to 20L).map(i => (i, i.toDouble)).toDF("event_id", "value")
    val out = Winsorizer(pLo = 0.1, pHi = 0.9)(ev)
      .select("event_id", "value_clipped").as[(Long, Double)].collect().toMap
    assert(out(1L) == 2.0 && out(2L) == 2.0)
    assert(out(10L) == 10.0)
    assert(out(18L) == 18.0 && out(19L) == 18.0 && out(20L) == 18.0)
  }

  test("grouped percentiles: nearest-rank per group, one pass") {
    import graft.operators.events.GroupedPercentiles
    // group a: values 1..10 → p50 = 5th = 5, p90 = 9th = 9;
    // group b: constant 7 → every percentile is 7
    val ev = ((1L to 10L).map(i => ("a", i.toDouble)) ++
      (1L to 4L).map(_ => ("b", 7.0))).zipWithIndex
      .map { case ((g, v), i) => (i.toLong, g, v) }
      .toDF("event_id", "event_type", "value")
    val got = GroupedPercentiles(Seq(0.5, 0.9))(ev)
      .as[(String, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == Map(
      ("a", 0.5) -> 5.0, ("a", 0.9) -> 9.0,
      ("b", 0.5) -> 7.0, ("b", 0.9) -> 7.0))
  }

  test("winsorizer: null values don't shift thresholds, pass through null") {
    val ev = ((1L to 20L).map(i => (i, java.lang.Double.valueOf(i.toDouble))) ++
      Seq((21L, null.asInstanceOf[java.lang.Double]),
        (22L, null.asInstanceOf[java.lang.Double])))
      .toDF("event_id", "value")
    val out = Winsorizer(pLo = 0.1, pHi = 0.9)(ev)
      .select("event_id", "value_clipped").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    // thresholds computed over the 20 NON-NULL values (2 and 18, as in
    // the all-non-null test) — the nulls neither shrink nor grow n
    assert(out(1L) == Some(2.0) && out(20L) == Some(18.0))
    // nulls pass through unclipped (least/greatest would have silently
    // clipped them to the lower bound)
    assert(out(21L).isEmpty && out(22L).isEmpty)
  }

  test("grouped percentiles: null values excluded from the histogram") {
    import graft.operators.events.GroupedPercentiles
    val ev = ((1L to 10L).map(i => (i, "a", java.lang.Double.valueOf(i.toDouble))) ++
      Seq((11L, "a", null.asInstanceOf[java.lang.Double])))
      .toDF("event_id", "event_type", "value")
    val got = GroupedPercentiles(Seq(0.5))(ev)
      .as[(String, Double, Double)].collect().head
    // p50 of the 10 scored rows = 5; a null-counted n of 11 would
    // move the rank to ceil(5.5) = 6
    assert(got == (("a", 0.5, 5.0)))
  }

  test("winsorizer: duplicate-heavy domain and sub-precision values") {
    // histogram path must weight duplicates, and clipping compares the
    // RAW value against the rounded-domain bound
    val ev = Seq(1.004, 1.004, 1.004, 1.004, 1.004, 1.004, 1.004, 1.004,
      50.0, 999.0).zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("event_id", "value")
    val out = Winsorizer(pLo = 0.05, pHi = 0.9)(ev)
      .select("event_id", "value_clipped").as[(Long, Double)].collect().toMap
    // p90: ceil(0.9*10)=9th of sorted rounded values → 50.0; the 999 clips
    assert(out(9L) == 50.0)
    // p05: ceil(0.05*10)=1st → 1.0 (rounded bound); raw 1.004 > 1.0 stays
    assert(out(0L) == 1.004)
  }

  test("windowed funnel: out-of-gap conversions drop; greedy from earliest") {
    val ev = Seq(
      // u1 converts inside the 60 s gap
      (1L, 1L, "view", ts(0), 0.0), (2L, 1L, "click", ts(30), 0.0),
      // u2 clicks 100 s after viewing: outside the window
      (3L, 2L, "view", ts(0), 0.0), (4L, 2L, "click", ts(100), 0.0),
      // u3: earliest view at 0, click at 90 — greedy matches from the
      // EARLIEST view, so the later view at 50 (which would put the
      // click in-window) does not rescue the conversion
      (5L, 3L, "view", ts(0), 0.0), (6L, 3L, "view", ts(50), 0.0),
      (7L, 3L, "click", ts(90), 0.0)
    ).toDF("event_id", "user_id", "event_type", "ts", "value")
    val got = FunnelAnalyzer(Seq("view", "click"),
      maxGapSeconds = Some(60L))(ev)
      .select("stage_idx", "n_users").as[(Int, Long)].collect().toMap
    assert(got == Map(1 -> 3L, 2 -> 1L))
    intercept[IllegalArgumentException] {
      FunnelAnalyzer(Seq("view"), maxGapSeconds = Some(0L))
    }
  }

  test("cohort retention: cohorts by first event, offsets count returners") {
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    // u1 joins week of Jan 1 (Mon), active weeks 0 and 2; u2 joins
    // week 0, active week 0 only; u3 joins week 2 (new cohort)
    val ev = Seq(
      (1L, t("2024-01-02 10:00:00")), (1L, t("2024-01-03 10:00:00")),
      (1L, t("2024-01-16 10:00:00")),
      (2L, t("2024-01-04 10:00:00")),
      (3L, t("2024-01-17 10:00:00")))
      .toDF("user_id", "ts")
    val got = CohortRetention("week").matrix(ev)
      .select(date_format(col("cohort_start"), "yyyy-MM-dd"),
        col("period_offset"), col("n_users"))
      .as[(String, Int, Long)].collect().toSet
    assert(got == Set(("2024-01-01", 0, 2L), ("2024-01-01", 2, 1L),
      ("2024-01-15", 0, 1L)))
    intercept[IllegalArgumentException] { CohortRetention("month") }

    // null user ids form ONE real group (r13 ADVICE: the equi-join was
    // silently dropping their activity): one anonymous "user" first
    // seen week 0, returning week 1
    val withNull = Seq(
      (Some(1L), t("2024-01-02 10:00:00")),
      (Option.empty[Long], t("2024-01-02 11:00:00")),
      (Option.empty[Long], t("2024-01-09 11:00:00")))
      .toDF("user_id", "ts")
    val gotNull = CohortRetention("week").matrix(withNull)
      .select(date_format(col("cohort_start"), "yyyy-MM-dd"),
        col("period_offset"), col("n_users"))
      .as[(String, Int, Long)].collect().toSet
    assert(gotNull == Set(("2024-01-01", 0, 2L), ("2024-01-01", 1, 1L)))
  }
}
