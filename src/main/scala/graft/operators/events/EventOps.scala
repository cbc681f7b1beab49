package graft.operators.events

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CDC/recrawl snapshot compaction: keep the LATEST version of each
  * logical entity — the upsert-view step every continuously-recrawled
  * corpus needs before processing (CommonCrawl refetches, changelog
  * tables, event upserts). Mirrors the reference's writer-side upsert
  * (reference: mega_data_factory writers; our ParquetDataWriter.upsert
  * is the storage twin — this is the query-side operator form).
  *
  * Scale shape: ONE map-side-combinable `max_by` aggregate over the
  * narrow (key, version, id) projection — the winner per key is the
  * lexicographic max of struct(version, id) — then a LEFT SEMI join
  * back on the unique id, so the wide payload never shuffles and never
  * sorts (a window row_number would sort every group; max_by combines
  * partially on the map side). Deterministic: version ties break to
  * the larger id. */
case class SnapshotCompactor(
    keyCols: Seq[String],
    versionCol: String = "ts",
    idCol: String = "event_id") {

  def apply(df: DataFrame): DataFrame = {
    val winners = df
      .select((keyCols.map(col) :+ col(versionCol) :+ col(idCol)): _*)
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(col(idCol), struct(col(versionCol), col(idCol))).as(idCol))
    // semi-join on key AND id (not id alone): if idCol repeats across
    // different keys, an id-only join would retain every row sharing a
    // winner's id instead of one row per key. Keys use null-safe
    // equality — a null group key is a real group upstream and its
    // winner must survive the join.
    val cond = keyCols.map(k => df(k) <=> winners(k))
      .reduce(_ && _) && df(idCol) === winners(idCol)
    df.join(winners, cond, "left_semi")
  }
}

/** Ordered funnel conversion (view → click → purchase): how many users
  * reach each stage IN ORDER — the canonical product-analytics query
  * and the event-table twin of the curation funnel's metrics report.
  *
  * Stage k counts users with an event of type `stages(k)` strictly
  * after their earliest qualifying stage-(k−1) event. Computed as a
  * cascade of per-user min-timestamp aggregates over the narrow
  * (user, type, ts) projection: each step is one map-side-combinable
  * `min` groupBy on user_id, and consecutive steps join on user_id —
  * co-partitioned after the first shuffle, so Spark reuses the hash
  * partitioning instead of reshuffling (stage count is a constant;
  * data passes = stage count, each narrow). No windows, no sort of the
  * event table. */
case class FunnelAnalyzer(
    stages: Seq[String],
    userCol: String = "user_id",
    typeCol: String = "event_type",
    tsCol: String = "ts",
    maxGapSeconds: Option[Long] = None) {
  require(stages.nonEmpty, "at least one funnel stage")
  require(maxGapSeconds.forall(_ > 0), "maxGapSeconds must be positive")

  /** (stage_idx, stage, n_users, conversion — fraction of stage-1
    * users, 6 dp). With `maxGapSeconds`, stage k counts only when it
    * happens within the gap of the user's stage-(k-1) completion time —
    * the standard conversion-window form ("purchased within 7 days of
    * clicking"). Semantics are GREEDY EARLIEST-COMPLETION, the funnel
    * convention every windowed-funnel product uses: each stage advances
    * from the earliest qualifying time, so a user whose earliest path
    * misses the window is not re-matched against a later slower path
    * (an optimal re-matcher is a quadratic per-user scan — a different
    * operator). */
  def apply(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val narrow = df.select(col(userCol), col(typeCol), col(tsCol))
    // reached(k): per-user earliest time of completing stages 0..k in
    // order. Each step is localCheckpointed (eager) before its count —
    // without the cut, stage k's count() action re-runs the whole
    // cascade 1..k-1 and the event table is scanned O(stages²) times;
    // the checkpointed state is the narrow (user, ts) survivors only.
    var reached = narrow.filter(col(typeCol) === stages.head)
      .groupBy(userCol).agg(min(tsCol).as("__t"))
      .localCheckpoint(true)
    val counts = Vector.newBuilder[(Int, String, Long)]
    counts += ((1, stages.head, reached.count()))
    for ((st, i) <- stages.zipWithIndex.drop(1)) {
      val inWindow = maxGapSeconds match {
        case Some(g) => col(tsCol) > col("__prev") &&
          col(tsCol) <= col("__prev") + expr(s"INTERVAL $g SECOND")
        case None => col(tsCol) > col("__prev")
      }
      reached = narrow.filter(col(typeCol) === st)
        .join(reached.withColumnRenamed("__t", "__prev"), Seq(userCol))
        .filter(inWindow)
        .groupBy(userCol).agg(min(tsCol).as("__t"))
        .localCheckpoint(true)
      counts += ((i + 1, st, reached.count()))
    }
    val rows = counts.result()
    val base = rows.head._3.toDouble
    rows.map { case (i, st, n) =>
      (i, st, n, if (base == 0) 0.0
        else BigDecimal(n / base).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
    }.toDF("stage_idx", "stage", "n_users", "conversion")
  }
}

/** Winsorization (robust-stats outlier clipping): clip a value column
  * to its [pLo, pHi] percentile bounds — the standard guard before
  * training on heavy-tailed numeric features (spend, dwell time).
  *
  * Percentiles are NEAREST-RANK over the value domain rounded to
  * `precision` dp — an exact, engine-portable definition computed from
  * a histogram CDF (the TopFractionByGroup trick): one groupBy over
  * the ROUNDED values (distinct-bounded, map-side combined), the
  * [[HistCdf]] two-phase cumsum over that histogram (no
  * single-partition window even when a heavy tail pushes the distinct
  * domain to 10⁷+ values), and the bound is the smallest rounded value
  * whose cumulative count reaches ceil(p·n). No global sort of the
  * data, no interpolation (interpolated percentiles differ across
  * engines in last-ulp float ops; order statistics cannot). The two
  * bounds broadcast back as a 1-row cross join. */
/** Per-group percentile report (latency/spend quantiles per endpoint —
  * the p50/p95/p99 table every event pipeline publishes): NEAREST-RANK
  * percentiles over the `precision`-dp-rounded value domain, computed
  * from a per-group histogram CDF like [[Winsorizer]] — exact,
  * engine-portable (no interpolation), and never sorts the event
  * table: the only corpus-scale work is one map-side-combinable
  * (group, rounded value) count; the cumsum is the [[HistCdf]]
  * two-phase form, so even one group with a 10⁷-value domain never
  * funnels into a single window partition. All percentiles come out of
  * ONE aggregate pass (a min-per-threshold column each, then an
  * unpivot). */
case class GroupedPercentiles(
    ps: Seq[Double] = Seq(0.5, 0.95, 0.99),
    groupCol: String = "event_type",
    valueCol: String = "value",
    precision: Int = 2) {
  require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1), "ps in (0, 1]")

  /** (groupCol, pct, value). NULL values are excluded before the
    * histogram — an unmeasured row must not shift a rank threshold
    * (same rule as [[Winsorizer]]/TopFractionByGroup). */
  def apply(df: DataFrame): DataFrame = {
    val hist = df.where(col(valueCol).isNotNull)
      .select(col(groupCol), round(col(valueCol), precision).as("__v"))
      .groupBy(col(groupCol), col("__v")).agg(count(lit(1)).as("__c"))
    val cdf = HistCdf.withCdf(hist, Seq(groupCol), "__v", "__c")
    val aggs = ps.zipWithIndex.map { case (p, i) =>
      min(when(col("__cum") >= ceil(col("__n") * p), col("__v"))).as(s"__p$i")
    }
    cdf.groupBy(groupCol).agg(aggs.head, aggs.tail: _*)
      .select(col(groupCol), explode(array(ps.zipWithIndex.map { case (p, i) =>
        struct(lit(p).as("pct"), col(s"__p$i").as("value"))
      }: _*)).as("__e"))
      .select(col(groupCol), col("__e.pct").as("pct"), col("__e.value").as("value"))
  }
}

/** Distributed histogram-CDF: running count ordered by value (within
  * optional groups) with NO unpartitioned window — the two-phase
  * cumsum (the `pack_sequences` prefix-offset idiom, kept entirely in
  * DataFrame land). The naive `Window.orderBy(v)` cumsum funnels the
  * whole distinct-value histogram through ONE partition; bounded by
  * the value domain at `precision` dp, which a heavy-tailed double
  * column over 100 TB can push to 10⁷–10⁸ rows — that partition then
  * IS the job. Here:
  *
  *   1. range-partition the histogram by (group, value) — B contiguous
  *      spans, each sorted locally;
  *   2. per-(group, physical-partition) subtotals (one small agg);
  *   3. per-group offsets via a window over the subtotal table — its
  *      partitions hold ≤ B rows by construction (the bounded
  *      "driver-state" of the prefix-sum, kept distributed);
  *   4. local cumsum per (group, partition) + offset join.
  *
  * Every window is bounded (≤ B rows or ≤ one range-span), everything
  * shuffles at most |histogram| rows, and no row ever collects to the
  * driver. Physical partition ids only order the spans — the cumsum
  * result is exact wherever the range sampler drops the boundaries. */
private[graft] object HistCdf {
  def withCdf(hist0: DataFrame, groupCols: Seq[String],
      vCol: String, cCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grouped = groupCols.nonEmpty
    val gCols = if (grouped) groupCols else Seq("__cdf_g")
    val hist = if (grouped) hist0 else hist0.withColumn("__cdf_g", lit(1))
    val b = hist.sparkSession.sessionState.conf.numShufflePartitions
    val rp = hist
      .repartitionByRange(b, (gCols.map(col) :+ col(vCol)): _*)
      .withColumn("__pid", spark_partition_id())
    val cells = rp.groupBy((gCols :+ "__pid").map(col): _*)
      .agg(sum(cCol).as("__cell"))
    val wOff = Window.partitionBy(gCols.map(col): _*).orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy(gCols.map(col): _*)
    val offs = cells
      .withColumn("__off", coalesce(sum("__cell").over(wOff), lit(0L)))
      .withColumn("__n", sum("__cell").over(wTot))
      .drop("__cell")
    val wIn = Window.partitionBy((gCols :+ "__pid").map(col): _*)
      .orderBy(vCol).rowsBetween(Window.unboundedPreceding, 0)
    val out = rp.withColumn("__pcum", sum(cCol).over(wIn))
      .join(offs, gCols :+ "__pid")
      .withColumn("__cum", col("__pcum") + col("__off"))
      .drop("__pcum", "__off", "__pid")
    if (grouped) out else out.drop("__cdf_g")
  }
}

case class Winsorizer(
    pLo: Double = 0.05,
    pHi: Double = 0.95,
    valueCol: String = "value",
    precision: Int = 2) {
  require(pLo >= 0 && pHi <= 1 && pLo < pHi, "need 0 <= pLo < pHi <= 1")

  /** Adds `<valueCol>_clipped`. NULL values are excluded from the
    * histogram (they must not shift the rank thresholds) and pass
    * through with a null clipped value — the caller decides their
    * fate, the clipper never invents a number. */
  def apply(df: DataFrame): DataFrame = {
    val rv = round(col(valueCol), precision)
    val hist = df.where(col(valueCol).isNotNull)
      .select(rv.as("__v")).groupBy("__v")
      .agg(count(lit(1)).as("__c"))
    val cdf = HistCdf.withCdf(hist, Nil, "__v", "__c")
    val bounds = cdf.agg(
      min(when(col("__cum") >= ceil(col("__n") * pLo), col("__v"))).as("__lo"),
      min(when(col("__cum") >= ceil(col("__n") * pHi), col("__v"))).as("__hi"))
    df.crossJoin(broadcast(bounds))
      // explicit null branch: Spark's least/greatest SKIP nulls, so a
      // bare least(greatest(null, lo), hi) would silently clip a null
      // to the lower bound instead of passing it through
      .withColumn(s"${valueCol}_clipped",
        when(col(valueCol).isNull, lit(null))
          .otherwise(least(greatest(col(valueCol), col("__lo")), col("__hi"))))
      .drop("__lo", "__hi")
  }
}

/** Cohort retention matrix — the standard product-analytics view (and
  * a corpus-ops one: "of the users/sources first seen in period P, how
  * many were still active k periods later"): cohort = the period of a
  * user's FIRST event, one output row per (cohort, period offset) with
  * the distinct-user count still active at that offset.
  *
  * Scale shape: the corpus collapses IMMEDIATELY to two narrow tables —
  * per-user first-period (one map-side-combined min) and distinct
  * (user, period) activity pairs (bounded by users × periods, not
  * events) — joined on the user id; the matrix itself is a tiny
  * aggregate over that join. The event payload never shuffles. Periods
  * truncate with `date_trunc(period)` (Monday-start weeks in both
  * engines, session-UTC), and offsets divide exactly because both ends
  * are truncated to the same grain. */
case class CohortRetention(period: String = "week",
    userCol: String = "user_id", tsCol: String = "ts") {

  private val periodDays = period match {
    case "week" => 7
    case "day" => 1
    case other => throw new IllegalArgumentException(
      s"unsupported cohort period '$other' (use week or day)")
  }

  /** (cohort_start TIMESTAMP — the truncated period start, the
    * engine-portable form — period_offset INT, n_users BIGINT).
    * Rows with a null timestamp carry no activity evidence and are
    * excluded up front (a null week would otherwise produce a null
    * cohort/offset row, and `min` skipping nulls would silently cohort
    * a user by their first NON-null event anyway — this makes the
    * convention explicit). Null user ids form one real group, the
    * grouping convention everywhere else in the repo. */
  def matrix(events: DataFrame): DataFrame = {
    val ev = events.where(col(tsCol).isNotNull)
    val firsts = ev.groupBy(col(userCol))
      .agg(min(date_trunc(period, col(tsCol))).as("__cw"))
    val active = ev
      .select(col(userCol), date_trunc(period, col(tsCol)).as("__w"))
      .distinct()
    // null-safe equality: null user ids form ONE real group (the repo's
    // grouping convention, and what groupBy above already did) — a plain
    // equi-join would silently drop their activity from the matrix
    active.as("a").join(firsts.as("f"),
        col(s"a.$userCol") <=> col(s"f.$userCol"))
      .select(col("__cw").as("cohort_start"),
        (datediff(col("__w"), col("__cw")) / periodDays).cast("int")
          .as("period_offset"))
      .groupBy("cohort_start", "period_offset")
      .agg(count(lit(1)).as("n_users"))
  }
}
