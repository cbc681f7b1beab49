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
    df.join(winners.select(idCol), Seq(idCol), "left_semi")
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
    tsCol: String = "ts") {
  require(stages.nonEmpty, "at least one funnel stage")

  /** (stage_idx, stage, n_users, conversion — fraction of stage-1
    * users, 6 dp). */
  def apply(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val narrow = df.select(col(userCol), col(typeCol), col(tsCol))
    // reached(k): per-user earliest time of completing stages 0..k in order
    var reached = narrow.filter(col(typeCol) === stages.head)
      .groupBy(userCol).agg(min(tsCol).as("__t"))
    val counts = Vector.newBuilder[(Int, String, Long)]
    counts += ((1, stages.head, reached.count()))
    for ((st, i) <- stages.zipWithIndex.drop(1)) {
      reached = narrow.filter(col(typeCol) === st)
        .join(reached.withColumnRenamed("__t", "__prev"), Seq(userCol))
        .filter(col(tsCol) > col("__prev"))
        .groupBy(userCol).agg(min(tsCol).as("__t"))
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
  * the ROUNDED values (distinct-bounded, map-side combined), a cumsum
  * over that tiny histogram, and the bound is the smallest rounded
  * value whose cumulative count reaches ceil(p·n). No global sort of
  * the data, no interpolation (interpolated percentiles differ across
  * engines in last-ulp float ops; order statistics cannot). The two
  * bounds broadcast back as a 1-row cross join. */
/** Per-group percentile report (latency/spend quantiles per endpoint —
  * the p50/p95/p99 table every event pipeline publishes): NEAREST-RANK
  * percentiles over the `precision`-dp-rounded value domain, computed
  * from a per-group histogram CDF like [[Winsorizer]] — exact,
  * engine-portable (no interpolation), and never sorts the event
  * table: the only corpus-scale work is one map-side-combinable
  * (group, rounded value) count; the windows run over that bounded
  * histogram, partitioned by group. All percentiles come out of ONE
  * aggregate pass (a min-per-threshold column each, then an unpivot). */
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
    import org.apache.spark.sql.expressions.Window
    val hist = df.where(col(valueCol).isNotNull)
      .select(col(groupCol), round(col(valueCol), precision).as("__v"))
      .groupBy(col(groupCol), col("__v")).agg(count(lit(1)).as("__c"))
    val byV = Window.partitionBy(groupCol).orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val whole = Window.partitionBy(groupCol)
    val cdf = hist
      .withColumn("__cum", sum("__c").over(byV))
      .withColumn("__n", sum("__c").over(whole))
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
    import org.apache.spark.sql.expressions.Window
    val rv = round(col(valueCol), precision)
    val hist = df.where(col(valueCol).isNotNull)
      .select(rv.as("__v")).groupBy("__v")
      .agg(count(lit(1)).as("__c"))
    val w = Window.orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cdf = hist.withColumn("__cum", sum("__c").over(w))
      .withColumn("__n", sum("__c").over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
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
