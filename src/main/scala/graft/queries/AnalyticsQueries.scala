package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytics surface: TPC-H-style relational queries + event analytics.
  * These exercise the query-engine half of the capability set — grouped
  * aggregation, multi-way joins (broadcast where the dim is small),
  * window functions, sessionization, JSON extraction.
  *
  * All double aggregates are rounded identically on both sides; top-k is
  * always tie-broken on a key column (SURVEY §6).
  */
object AnalyticsQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      // Sums run in decimal so the 2-dp rounding cannot flip with
      // summation order (double sums are order-dependent and these
      // groups span ~1/4 of lineitem each). The source data is 2-dp, so
      // the narrow per-row casts are lossless — no rounding-mode
      // concerns — and the product precisions stay within 38 digits in
      // any engine. Averages = exact decimal sum → double ÷ count
      // (decimal AVG result types differ across engines).
      val price = col("l_extendedprice").cast("decimal(15,4)")
      val qty = col("l_quantity").cast("decimal(15,4)")
      val disc = col("l_discount").cast("decimal(9,4)")
      val discF = (lit(1.0) - col("l_discount")).cast("decimal(9,4)")
      val taxF = (lit(1.0) + col("l_tax")).cast("decimal(9,4)")
      val n = count(lit(1))
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum(qty), 2).cast("double").as("sum_qty"),
          round(sum(price), 2).cast("double").as("sum_base_price"),
          round(sum(price * discF), 2).cast("double").as("sum_disc_price"),
          round(sum(price * discF * taxF), 2).cast("double").as("sum_charge"),
          round(sum(qty).cast("double") / n, 4).as("avg_qty"),
          round(sum(price).cast("double") / n, 4).as("avg_price"),
          round(sum(disc).cast("double") / n, 4).as("avg_disc"),
          n.as("count_order"))
    }),

    "q3_shipping_priority" -> ((s, dir) => {
      val cust = Tables.load(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp"))
      val li = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
      // customer grows with SF — relative smallness does not make a
      // broadcast fit in memory, so the join is size-driven (cost
      // model / AQE broadcast while it fits, SMJ beyond that)
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(cust, ord("o_custkey") === cust("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
        .filter(col("revenue") > 0)
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    }),

    "q5_local_supplier_volume" -> ((s, dir) => {
      val region = broadcast(Tables.load(s, dir, "region")) // fixed 5 rows
      val nation = broadcast(Tables.load(s, dir, "nation")) // fixed 25 rows
      val supp = Tables.load(s, dir, "supplier") // SF-scaled: size-driven join
      val cust = Tables.load(s, dir, "customer")
      val ord = Tables.load(s, dir, "orders")
      val li = Tables.load(s, dir, "lineitem")
      li.join(supp, li("l_suppkey") === supp("s_suppkey"))
        .join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(cust, ord("o_custkey") === cust("c_custkey"))
        .join(nation, supp("s_nationkey") === nation("n_nationkey"))
        .join(region, nation("n_regionkey") === region("r_regionkey"))
        .filter(cust("c_nationkey") === supp("s_nationkey"))
        .groupBy(col("n_name"))
        // exact decimal sum — order-proof 2-dp rounding (see q1)
        .agg(round(sum(col("l_extendedprice").cast("decimal(15,4)") *
            (lit(1.0) - col("l_discount")).cast("decimal(9,4)")), 2)
          .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // fixed-width histogram of order totals (profiling family): one
    // map-only bucket projection + map-combined groupBy
    "value_histogram" -> ((s, dir) => {
      val ord = Tables.load(s, dir, "orders")
      val width = 25000.0
      ord.select((floor(col("o_totalprice") / width) * width).as("bucket_lo"))
        .groupBy("bucket_lo").agg(count(lit(1)).as("n"))
    }),

    // one-scan table profile (data-quality summary) of documents
    "table_profile" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      graft.operators.TableProfiler().profile(docs)
    }),

    // per-source datasheet + corpus-total row, one ROLLUP pass; every
    // 50th doc has its source nulled so the genuine-NULL group
    // ('UNKNOWN') stays distinguishable from the rollup total ('ALL')
    "corpus_datacard" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .withColumn("source", when(col("doc_id") % 50 === 0, lit(null))
          .otherwise(col("source")))
      graft.operators.CorpusDatacard()(docs)
    }),

    // TPC-H Q6 shape: scan-only predicate aggregate — everything pushes
    // to the parquet scan
    "q6_forecast_revenue" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      li.filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice").cast("decimal(15,4)") *
            col("l_discount").cast("decimal(9,4)")), 2)
          .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // correlated-subquery shape: orders priced above 1.2x their
    // customer's average (decorrelated to a window — no re-scan).
    // The average is exact-decimal-sum / count so the membership
    // comparison cannot flip with window evaluation order.
    "above_avg_orders" -> ((s, dir) => {
      // per-cust average via map-combined aggregate + equi-join back —
      // same result as the window form but no per-partition sort, and
      // the join/groupBy reuse one hash partitioning on o_custkey
      val ord = Tables.load(s, dir, "orders")
      val custAvg = ord.groupBy("o_custkey").agg(
        (sum(col("o_totalprice").cast("decimal(15,4)")).cast("double") /
          count(lit(1))).as("cust_avg"))
      ord.join(custAvg, "o_custkey")
        .filter(col("o_totalprice") > col("cust_avg") * 1.2)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_above"),
          round(max("o_totalprice"), 2).as("max_price"))
    }),

    "window_running_total" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem").filter(col("l_suppkey") <= 3)
      val w = Window.partitionBy("l_suppkey")
        .orderBy(col("l_shipdate").asc, col("l_orderkey").asc, col("l_linenumber").asc)
      li.select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          row_number().over(w).as("rn"),
          round(sum(col("l_quantity")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2).as("running_qty"),
          round(avg(col("l_extendedprice")).over(
            w.rowsBetween(-4, Window.currentRow)), 4).as("ma5_price"))
    }),

    "topk_customers" -> ((s, dir) => {
      val ord = Tables.load(s, dir, "orders")
      val cust = Tables.load(s, dir, "customer")
      val byCust = ord.groupBy("o_custkey")
        .agg(round(sum("o_totalprice"), 2).as("total_spend"),
          count(lit(1)).as("n_orders"))
      byCust.join(cust, byCust("o_custkey") === cust("c_custkey")) // SF-scaled: size-driven
        .select(col("o_custkey").as("custkey"), col("c_name"),
          col("total_spend"), col("n_orders"))
        .orderBy(col("total_spend").desc, col("custkey").asc)
        .limit(20)
    }),

    "events_sessionize" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val byUser = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      val gapMin = 30L * 60L
      val withGap = ev.withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapMin * 1000000L, 1L)
            .otherwise(0L))
      val sess = withGap.withColumn("session_idx",
        sum("new_session").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      sess.groupBy("user_id", "session_idx")
        .agg(count(lit(1)).as("n_events"),
          round(sum("value"), 2).as("session_value"),
          min("event_id").as("first_event"))
    }),

    "events_tumbling_agg" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      ev.groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(sum("value"), 2).as("total_value"),
          round(avg("value"), 4).as("avg_value"))
    }),

    "events_json_extract" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      ev.select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("n"), min("event_id").as("min_event"))
    }),

    // CDC/recrawl compaction: the latest event per (user, type) — one
    // max_by aggregate + semi-join, no window sort of the wide table
    "snapshot_compact" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      graft.operators.events.SnapshotCompactor(Seq("user_id", "event_type"))(ev)
        .select("event_id", "user_id", "event_type", "value")
    }),

    // ordered funnel: users reaching view → click → purchase IN ORDER
    "funnel_conversion" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      graft.operators.events.FunnelAnalyzer(Seq("view", "click", "purchase"))(ev)
    }),

    // the conversion-window form: each stage must follow within 6h of
    // the previous stage's completion (greedy earliest-completion
    // semantics — the windowed-funnel product convention)
    "funnel_conversion_windowed" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      graft.operators.events.FunnelAnalyzer(
        Seq("view", "click", "purchase"),
        maxGapSeconds = Some(6L * 3600))(ev)
    }),

    // robust-stats clipping to the [p05, p95] nearest-rank bounds over
    // the 2dp-rounded value domain (histogram CDF, no global sort);
    // every 97th value arrives NULL — excluded from the thresholds,
    // passed through unclipped
    "events_winsorize" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .withColumn("value", when(col("event_id") % 97 === 0, lit(null))
          .otherwise(col("value")))
      graft.operators.events.Winsorizer(pLo = 0.05, pHi = 0.95)(ev)
        .select("event_id", "value", "value_clipped")
    }),

    // per-type p50/p95/p99 (nearest-rank over the 2dp-rounded domain,
    // one histogram pass — the latency-quantile report shape)
    "events_percentiles" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      graft.operators.events.GroupedPercentiles(Seq(0.5, 0.95, 0.99))(ev)
    }),

    // tokenizer fit per language: corpus-level chars-per-token for the
    // whitespace and BPE-ish tokenizers
    "tokenizer_fertility" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      graft.operators.TokenizerFertility()(docs)
    }),

    // release-over-release drift report: snapshot B drops every 5th
    // doc, relabels every 7th lang to 'zz', and truncates every 3rd
    // text — lang and length drift, source stays stable. Every 11th
    // doc has a NULL lang in BOTH snapshots: one matched null bucket,
    // not two phantom eps-smoothed ones
    "corpus_drift" -> ((s, dir) => {
      val a = Tables.load(s, dir, "documents")
        .withColumn("lang", when(col("doc_id") % 11 === 0, lit(null))
          .otherwise(col("lang")))
      val b = a.filter(col("doc_id") % 5 =!= 0)
        .withColumn("lang",
          when(col("doc_id") % 7 === 0, lit("zz")).otherwise(col("lang")))
        .withColumn("text",
          when(col("doc_id") % 3 === 0, substring(col("text"), 1, 50))
            .otherwise(col("text")))
      graft.operators.CorpusDrift(threshold = 0.05).report(a, b)
    }),

    // cross-snapshot overlap WITHOUT the content join: bottom-k KMV
    // sketches of two overlapping snapshots (A = ids %3<2, B = %3>0 →
    // true overlap is the %3=1 third, plus every 50th B text rewritten
    // so content, not ids, drives the estimate). The estimator is
    // approximate vs true Jaccard (±1/√k) but a deterministic function
    // of the corpora, so the oracle gates its exact value
    "corpus_overlap_sketch" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val a = docs.filter(col("doc_id") % 3 < 2)
      val b = docs.filter(col("doc_id") % 3 > 0)
        .withColumn("text", when(col("doc_id") % 50 === 0,
          concat(col("text"), lit(" v2"))).otherwise(col("text")))
      graft.operators.CorpusOverlapSketch(k = 256).estimate(a, b)
    }),

    // snapshot changelog: per-id added/removed/changed/unchanged by
    // content hash over narrow (id, hash) projections — the ingest
    // decision input (re-process only added+changed)
    "corpus_diff" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val old = docs.filter(col("doc_id") % 7 =!= 0)
      val neu = docs.filter(col("doc_id") % 5 =!= 0)
        .withColumn("text", when(col("doc_id") % 4 === 0,
          concat(col("text"), lit(" edited"))).otherwise(col("text")))
      graft.operators.CorpusDiff().diff(old, neu)
    }),

    // weekly cohort retention matrix: of the users first seen in week
    // W, how many were active W+k — two narrow aggregates + one
    // user-keyed join; the event payload never shuffles
    "events_cohort_retention" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      graft.operators.events.CohortRetention("week").matrix(ev)
    }),

    // link-graph centrality (the crawl-frontier URL quality prior):
    // 5 PageRank iterations over a deterministic 2-out synthetic graph
    "page_rank" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents").select("doc_id")
      val edges = docs.select(col("doc_id").as("src"),
        explode(array(
          (col("doc_id") * 131 + 7919) % 500,
          (col("doc_id") * 137 + 104729) % 500)).as("dst"))
      graft.operators.graph.PageRank(iterations = 5)(edges, docs)
    }),

    // TrustRank: same graph, teleport restricted to every 50th doc
    // (the seeded quality-source set) — authority flows outward
    "page_rank_personalized" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents").select("doc_id")
      val edges = docs.select(col("doc_id").as("src"),
        explode(array(
          (col("doc_id") * 131 + 7919) % 500,
          (col("doc_id") * 137 + 104729) % 500)).as("dst"))
      graft.operators.graph.PageRank(iterations = 5)
        .personalized(edges, docs, docs.filter(col("doc_id") % 50 === 0))
    }),

    // HITS hubs & authorities over the same deterministic 2-out graph:
    // 5 max-normalized iterations (no L2 norm — keeps the scaling a
    // pure comparison both engines replay)
    "hits_centrality" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents").select("doc_id")
      val edges = docs.select(col("doc_id").as("src"),
        explode(array(
          (col("doc_id") * 131 + 7919) % 500,
          (col("doc_id") * 137 + 104729) % 500)).as("dst"))
      graft.operators.graph.Hits(iterations = 5)(edges, docs)
    }),

    // declarative expectation suite over the orders fact: two clean
    // keys, three planted-violation constraints (6033 over-range
    // prices, 5088 'P' statuses, 6016 low-priority rows) and a
    // referential check against a dimension with every 97th customer
    // removed (158 orphans) — the anti-join leg
    "data_expectations" -> ((s, dir) => {
      import graft.operators.Expectations._
      val orders = Tables.load(s, dir, "orders")
      val dim = Tables.load(s, dir, "customer")
        .filter(col("c_custkey") % 97 =!= 0)
      report(orders, Seq(
        NotNull("o_orderkey"),
        Unique(Seq("o_orderkey")),
        InRange("o_totalprice", 0.0, 300000.0),
        InSet("o_orderstatus", Seq("F", "O")),
        MatchesRegex("o_orderpriority", "^[1-3]-"),
        RefersTo("o_custkey", dim, "c_custkey")))
    })
  )

  /** 5 unrolled PageRank iterations over the deterministic 2-out
    * graph, parameterized on the teleport CTE (`tele(node, t)`):
    * rank_0 = t, rank' = (1 − d)·t + d·Σ_in rank/out° — the exact
    * float op sequence of PageRank.run, so rounding at 6 dp agrees. */
  private def pageRankSql(teleCte: String): String = {
    val iters = 5
    val d = "CAST(0.85 AS DOUBLE)"
    val rs = (1 to iters).map { k =>
      s"""r$k AS (
         |  SELECT p.node, (1 - $d) * p.t + $d * coalesce(i.inr, 0.0) AS r,
         |    p.t
         |  FROM r${k - 1} p
         |  LEFT JOIN (
         |    SELECT e.dst AS node, sum(p2.r / e.deg) AS inr
         |    FROM e JOIN r${k - 1} p2 ON e.src = p2.node GROUP BY 1) i
         |  ON p.node = i.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH cnt AS (SELECT count(*) AS n FROM documents),
       |e0 AS (
       |  SELECT doc_id AS src, (doc_id * 131 + 7919) % 500 AS dst FROM documents
       |  UNION ALL
       |  SELECT doc_id, (doc_id * 137 + 104729) % 500 FROM documents),
       |deg AS (SELECT src, count(*) AS deg FROM e0 GROUP BY 1),
       |e AS (SELECT e0.src, e0.dst, deg.deg FROM e0 JOIN deg USING (src)),
       |$teleCte,
       |r0 AS (SELECT node, t AS r, t FROM tele),
       |$rs
       |SELECT node AS doc_id, round(r, 6) AS rank FROM r$iters""".stripMargin
  }

  /** 5 unrolled HITS iterations over the same 2-out graph: a_k =
    * max-normalized Σ_in h_{k−1}, h_k = max-normalized Σ_out a_k — the
    * exact float op sequence of Hits.apply. Every CTE is MATERIALIZED:
    * DuckDB inlines CTEs by default, and each half-step references the
    * previous one ~4× (the sum join + the scalar max), so the inlined
    * tree re-evaluates the chain 4^5× and never finishes. */
  private def hitsSql: String = {
    val steps = (1 to 5).map { k =>
      val hp = if (k == 1) "h0" else s"h${k - 1}"
      s"""a${k}r AS MATERIALIZED (
         |  SELECT e.dst AS node, sum(h.h) AS raw
         |  FROM e JOIN $hp h ON e.src = h.node GROUP BY 1),
         |a$k AS MATERIALIZED (
         |  SELECT node, raw / (SELECT max(raw) FROM a${k}r) AS a FROM a${k}r),
         |h${k}r AS MATERIALIZED (
         |  SELECT e.src AS node, sum(a$k.a) AS raw
         |  FROM e JOIN a$k ON e.dst = a$k.node GROUP BY 1),
         |h$k AS MATERIALIZED (
         |  SELECT node, raw / (SELECT max(raw) FROM h${k}r) AS h FROM h${k}r)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (
       |  SELECT doc_id AS src, (doc_id * 131 + 7919) % 500 AS dst FROM documents
       |  UNION ALL
       |  SELECT doc_id, (doc_id * 137 + 104729) % 500 FROM documents),
       |h0 AS MATERIALIZED (SELECT DISTINCT src AS node, CAST(1.0 AS DOUBLE) AS h FROM e),
       |$steps
       |SELECT d.doc_id,
       |  round(coalesce(h5.h, 0.0), 6) AS hub,
       |  round(coalesce(a5.a, 0.0), 6) AS authority
       |FROM documents d
       |LEFT JOIN h5 ON d.doc_id = h5.node
       |LEFT JOIN a5 ON d.doc_id = a5.node""".stripMargin
  }

  def oracles: Map[String, String] = Map(
    "hits_centrality" -> hitsSql,

    "data_expectations" ->
      """WITH base AS (SELECT
        |    CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_notnull,
        |    CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS v_unique,
        |    CAST(sum(CASE WHEN o_totalprice IS NOT NULL
        |      AND (o_totalprice < 0 OR o_totalprice > 300000) THEN 1 ELSE 0 END) AS BIGINT) AS v_range,
        |    CAST(sum(CASE WHEN o_orderstatus IS NOT NULL
        |      AND o_orderstatus NOT IN ('F', 'O') THEN 1 ELSE 0 END) AS BIGINT) AS v_set,
        |    CAST(sum(CASE WHEN o_orderpriority IS NOT NULL
        |      AND NOT regexp_matches(o_orderpriority, '^[1-3]-') THEN 1 ELSE 0 END) AS BIGINT) AS v_re
        |  FROM orders),
        |ref AS (SELECT CAST(count(*) AS BIGINT) AS v FROM orders o
        |  WHERE o.o_custkey IS NOT NULL AND NOT EXISTS (
        |    SELECT 1 FROM customer c
        |    WHERE c.c_custkey = o.o_custkey AND c.c_custkey % 97 <> 0))
        |SELECT expectation, col_name, violations, n_rows,
        |  violations = 0 AS pass FROM (
        |  SELECT 'not_null' AS expectation, 'o_orderkey' AS col_name,
        |    v_notnull AS violations, n_rows FROM base
        |  UNION ALL SELECT 'unique', 'o_orderkey', v_unique, n_rows FROM base
        |  UNION ALL SELECT 'in_range', 'o_totalprice', v_range, n_rows FROM base
        |  UNION ALL SELECT 'in_set', 'o_orderstatus', v_set, n_rows FROM base
        |  UNION ALL SELECT 'matches_regex', 'o_orderpriority', v_re, n_rows FROM base
        |  UNION ALL SELECT 'refers_to', 'o_custkey', ref.v, base.n_rows FROM base, ref)""".stripMargin,

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(round(sum(CAST(l_quantity AS DECIMAL(15,4))), 2) AS DOUBLE) AS sum_qty,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(15,4))), 2) AS DOUBLE) AS sum_base_price,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(15,4)) *
        |    CAST(1.0 - l_discount AS DECIMAL(9,4))), 2) AS DOUBLE) AS sum_disc_price,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(15,4)) *
        |    CAST(1.0 - l_discount AS DECIMAL(9,4)) *
        |    CAST(1.0 + l_tax AS DECIMAL(9,4))), 2) AS DOUBLE) AS sum_charge,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(15,4))) AS DOUBLE) / count(*), 4) AS avg_qty,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(15,4))) AS DOUBLE) / count(*), 4) AS avg_price,
        |  round(CAST(sum(CAST(l_discount AS DECIMAL(9,4))) AS DOUBLE) / count(*), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, revenue FROM (
        |  SELECT l.l_orderkey, o.o_orderdate,
        |    round(sum(l.l_extendedprice * (1.0 - l.l_discount)), 2) AS revenue
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  WHERE c.c_mktsegment = 'BUILDING'
        |    AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
        |    AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        |  GROUP BY 1, 2) t
        |WHERE revenue > 0
        |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin,

    "q5_local_supplier_volume" ->
      """SELECT n.n_name,
        |  CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(15,4)) *
        |    CAST(1.0 - l.l_discount AS DECIMAL(9,4))), 2) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem l
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE c.c_nationkey = s.s_nationkey
        |GROUP BY n.n_name""".stripMargin,

    "value_histogram" ->
      """SELECT floor(o_totalprice / 25000.0) * 25000.0 AS bucket_lo,
        |  count(*) AS n
        |FROM orders GROUP BY 1""".stripMargin,

    "corpus_datacard" -> {
      val toks = """CASE WHEN length(trim(text)) = 0 THEN 0
                   | ELSE len(string_split_regex(trim(text), '\s+')) END""".stripMargin
      s"""WITH d AS (
         |  SELECT CASE WHEN doc_id % 50 = 0 THEN NULL ELSE source END AS source,
         |    text, lang
         |  FROM documents)
         |SELECT CASE WHEN GROUPING(source) = 1 THEN 'ALL'
         |            ELSE coalesce(source, 'UNKNOWN') END AS source,
         |  count(*) AS n_docs,
         |  CAST(sum($toks) AS BIGINT) AS n_tokens,
         |  round(avg($toks), 4) AS avg_tokens,
         |  round(avg(length(text)), 4) AS avg_chars,
         |  round(avg(CASE WHEN length(trim(text)) = 0 THEN 1.0 ELSE 0.0 END), 6)
         |    AS blank_frac,
         |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
         |FROM d GROUP BY ROLLUP(source)""".stripMargin
    },

    "table_profile" -> {
      val cols = Seq("doc_id" -> true, "text" -> false, "lang" -> false,
        "source" -> false, "n_chars" -> true)
      cols.map { case (c, num) =>
        val mn = if (num) s"round(CAST(min($c) AS DOUBLE), 6)" else "CAST(NULL AS DOUBLE)"
        val mx = if (num) s"round(CAST(max($c) AS DOUBLE), 6)" else "CAST(NULL AS DOUBLE)"
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           |  count(DISTINCT $c) AS n_distinct, $mn AS min_val, $mx AS max_val
           |FROM documents""".stripMargin
      }.mkString("\nUNION ALL\n")
    },

    "q6_forecast_revenue" ->
      """SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(15,4)) *
        |    CAST(l_discount AS DECIMAL(9,4))), 2) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,

    "above_avg_orders" ->
      """SELECT o_custkey, count(*) AS n_above,
        |  round(max(o_totalprice), 2) AS max_price
        |FROM (
        |  SELECT o_custkey, o_totalprice,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(15,4))) OVER (PARTITION BY o_custkey) AS DOUBLE)
        |      / count(*) OVER (PARTITION BY o_custkey) AS cust_avg
        |  FROM orders) t
        |WHERE o_totalprice > cust_avg * 1.2
        |GROUP BY 1""".stripMargin,

    "window_running_total" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  row_number() OVER w AS rn,
        |  round(sum(l_quantity) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty,
        |  round(avg(l_extendedprice) OVER (w ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS ma5_price
        |FROM lineitem WHERE l_suppkey <= 3
        |WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC)""".stripMargin,

    "topk_customers" ->
      """SELECT o_custkey AS custkey, c_name, total_spend, n_orders FROM (
        |  SELECT o_custkey, round(sum(o_totalprice), 2) AS total_spend,
        |    count(*) AS n_orders
        |  FROM orders GROUP BY o_custkey) t
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_spend DESC, custkey ASC LIMIT 20""".stripMargin,

    "events_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
        |s AS (
        |  SELECT user_id, event_id, value,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
        |  FROM g)
        |SELECT user_id, session_idx, count(*) AS n_events,
        |  round(sum(value), 2) AS session_value,
        |  min(event_id) AS first_event
        |FROM s GROUP BY user_id, session_idx""".stripMargin,

    "events_tumbling_agg" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        |  count(*) AS n, round(sum(value), 2) AS total_value,
        |  round(avg(value), 4) AS avg_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "events_json_extract" ->
      """SELECT CAST(props->>'$.k' AS BIGINT) AS k, count(*) AS n,
        |  min(event_id) AS min_event
        |FROM events GROUP BY 1""".stripMargin,

    "snapshot_compact" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id, event_type
        |  ORDER BY ts DESC, event_id DESC) = 1""".stripMargin,

    "funnel_conversion" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |  JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |  JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1),
        |c AS (
        |  SELECT 1 AS stage_idx, 'view' AS stage, count(*) AS n_users FROM s1
        |  UNION ALL SELECT 2, 'click', count(*) FROM s2
        |  UNION ALL SELECT 3, 'purchase', count(*) FROM s3)
        |SELECT CAST(stage_idx AS INT) AS stage_idx, stage, n_users,
        |  round(CAST(n_users AS DOUBLE) /
        |    (SELECT n_users FROM c WHERE stage_idx = 1), 6) AS conversion
        |FROM c""".stripMargin,

    "funnel_conversion_windowed" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |  JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ts > s1.t
        |    AND e.ts <= s1.t + INTERVAL 21600 SECOND GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |  JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t
        |    AND e.ts <= s2.t + INTERVAL 21600 SECOND GROUP BY 1),
        |c AS (
        |  SELECT 1 AS stage_idx, 'view' AS stage, count(*) AS n_users FROM s1
        |  UNION ALL SELECT 2, 'click', count(*) FROM s2
        |  UNION ALL SELECT 3, 'purchase', count(*) FROM s3)
        |SELECT CAST(stage_idx AS INT) AS stage_idx, stage, n_users,
        |  round(CAST(n_users AS DOUBLE) /
        |    (SELECT n_users FROM c WHERE stage_idx = 1), 6) AS conversion
        |FROM c""".stripMargin,

    "events_winsorize" ->
      """WITH e AS (SELECT event_id,
        |  CASE WHEN event_id % 97 = 0 THEN NULL ELSE value END AS value
        |  FROM events),
        |h AS (SELECT round(value, 2) AS v, count(*) AS c
        |  FROM e WHERE value IS NOT NULL GROUP BY 1),
        |cdf AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum,
        |  sum(c) OVER () AS n FROM h),
        |b AS (SELECT
        |  min(CASE WHEN cum >= ceil(n * 0.05) THEN v END) AS lo,
        |  min(CASE WHEN cum >= ceil(n * 0.95) THEN v END) AS hi FROM cdf)
        |SELECT event_id, value,
        |  CASE WHEN value IS NULL THEN NULL
        |       ELSE least(greatest(value, lo), hi) END AS value_clipped
        |FROM e, b""".stripMargin,

    "events_percentiles" -> {
      val ps = Seq(0.5, 0.95, 0.99)
      val aggs = ps.zipWithIndex.map { case (p, i) =>
        s"min(CASE WHEN cum >= ceil(n * $p) THEN v END) AS p$i"
      }.mkString(", ")
      val rows = ps.zipWithIndex.map { case (p, i) =>
        s"SELECT event_type, CAST($p AS DOUBLE) AS pct, p$i AS value FROM a"
      }.mkString("\nUNION ALL\n")
      s"""WITH h AS (SELECT event_type, round(value, 2) AS v, count(*) AS c
         |  FROM events GROUP BY 1, 2),
         |cdf AS (SELECT event_type, v,
         |  sum(c) OVER (PARTITION BY event_type ORDER BY v) AS cum,
         |  sum(c) OVER (PARTITION BY event_type) AS n FROM h),
         |a AS (SELECT event_type, $aggs FROM cdf GROUP BY 1)
         |$rows""".stripMargin
    },

    "tokenizer_fertility" ->
      s"""WITH t AS (
         |  SELECT lang, CAST(length(text) AS BIGINT) AS chars,
         |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
         |      ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS ws,
         |    CAST(len(regexp_extract_all(text,
         |      '[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]')) AS BIGINT) AS bpe
         |  FROM documents)
         |SELECT lang, count(*) AS n_docs,
         |  CAST(sum(chars) AS BIGINT) AS n_chars,
         |  CAST(sum(ws) AS BIGINT) AS n_ws_tokens,
         |  CAST(sum(bpe) AS BIGINT) AS n_bpe_tokens,
         |  round(CAST(sum(chars) AS DOUBLE) / sum(ws), 4) AS chars_per_ws_token,
         |  round(CAST(sum(chars) AS DOUBLE) / sum(bpe), 4) AS chars_per_bpe_token
         |FROM t GROUP BY 1""".stripMargin,

    "corpus_drift" -> {
      def psiSql(bucketA: String, bucketB: String, feature: String) =
        s"""SELECT '$feature' AS feature,
           |  round(sum((pa - pb) * ln(pa / pb)), 6) AS psi,
           |  round(sum((pa - pb) * ln(pa / pb)), 6) > 0.05 AS drifted
           |FROM (
           |  SELECT greatest(coalesce(sa.p, 0.0), 1e-6) AS pa,
           |    greatest(coalesce(sb.p, 0.0), 1e-6) AS pb
           |  FROM (
           |    SELECT coalesce(CAST($bucketA AS VARCHAR), '__null__') AS b,
           |      CAST(count(*) AS DOUBLE) / sum(count(*)) OVER () AS p
           |    FROM (SELECT doc_id, source, text,
           |        CASE WHEN doc_id % 11 = 0 THEN NULL ELSE lang END AS lang
           |      FROM documents) GROUP BY 1) sa
           |  FULL OUTER JOIN (
           |    SELECT coalesce(CAST($bucketB AS VARCHAR), '__null__') AS b,
           |      CAST(count(*) AS DOUBLE) / sum(count(*)) OVER () AS p
           |    FROM (SELECT doc_id,
           |        CASE WHEN doc_id % 7 = 0 THEN 'zz'
           |             WHEN doc_id % 11 = 0 THEN NULL ELSE lang END AS lang,
           |        source,
           |        CASE WHEN doc_id % 3 = 0 THEN substr(text, 1, 50)
           |             ELSE text END AS text
           |      FROM documents WHERE doc_id % 5 != 0) GROUP BY 1) sb
           |  USING (b))""".stripMargin
      Seq(psiSql("lang", "lang", "lang"),
        psiSql("source", "source", "source"),
        psiSql("floor(length(text) / 100)", "floor(length(text) / 100)",
          "length_x100")).mkString("\nUNION ALL\n")
    },

    "events_cohort_retention" ->
      """WITH f AS (
        |  SELECT user_id, date_trunc('week', min(ts)) AS cw
        |  FROM events GROUP BY 1),
        |w AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events)
        |SELECT f.cw AS cohort_start,
        |  CAST(datediff('day', f.cw, w.w) // 7 AS INT) AS period_offset,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM w JOIN f ON w.user_id IS NOT DISTINCT FROM f.user_id
        |GROUP BY 1, 2""".stripMargin,

    "corpus_overlap_sketch" ->
      """WITH a AS (SELECT text FROM documents WHERE doc_id % 3 < 2),
        |b AS (SELECT CASE WHEN doc_id % 50 = 0 THEN text || ' v2' ELSE text END AS text
        |      FROM documents WHERE doc_id % 3 > 0),
        |sa AS (SELECT DISTINCT CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS h
        |       FROM a ORDER BY h ASC LIMIT 256),
        |sb AS (SELECT DISTINCT CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS h
        |       FROM b ORDER BY h ASC LIMIT 256),
        |merged AS (
        |  SELECT h, ina, inb FROM (
        |    SELECT coalesce(sa.h, sb.h) AS h,
        |      sa.h IS NOT NULL AS ina, sb.h IS NOT NULL AS inb
        |    FROM sa FULL OUTER JOIN sb ON sa.h = sb.h)
        |  ORDER BY h ASC LIMIT 256)
        |SELECT 256 AS k,
        |  CAST(sum(CASE WHEN ina THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |  CAST(sum(CASE WHEN inb THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |  round(sum(CASE WHEN ina AND inb THEN 1 ELSE 0 END) /
        |    CAST(count(*) AS DOUBLE), 6) AS jaccard_est,
        |  round(sum(CASE WHEN ina AND inb THEN 1 ELSE 0 END) /
        |    CAST(sum(CASE WHEN ina THEN 1 ELSE 0 END) AS DOUBLE), 6) AS containment_a,
        |  round(sum(CASE WHEN ina AND inb THEN 1 ELSE 0 END) /
        |    CAST(sum(CASE WHEN inb THEN 1 ELSE 0 END) AS DOUBLE), 6) AS containment_b
        |FROM merged""".stripMargin,

    "corpus_diff" ->
      """WITH o AS (SELECT doc_id, md5(text) AS h, TRUE AS p
        |  FROM documents WHERE doc_id % 7 != 0),
        |n AS (SELECT doc_id,
        |    md5(CASE WHEN doc_id % 4 = 0 THEN text || ' edited' ELSE text END) AS h,
        |    TRUE AS p
        |  FROM documents WHERE doc_id % 5 != 0)
        |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN o.p IS NULL THEN 'added'
        |       WHEN n.p IS NULL THEN 'removed'
        |       WHEN o.h IS NOT DISTINCT FROM n.h THEN 'unchanged'
        |       ELSE 'changed' END AS status
        |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id""".stripMargin,

    "page_rank" -> pageRankSql(
      """tele AS (SELECT doc_id AS node, CAST(1.0 AS DOUBLE) / c.n AS t
        |  FROM documents CROSS JOIN cnt c)""".stripMargin),

    "page_rank_personalized" -> pageRankSql(
      """seeds AS (SELECT doc_id FROM documents WHERE doc_id % 50 = 0),
        |ns AS (SELECT count(*) AS n FROM seeds),
        |tele AS (
        |  SELECT d.doc_id AS node,
        |    CASE WHEN s.doc_id IS NOT NULL
        |      THEN CAST(1.0 AS DOUBLE) / ns.n ELSE 0.0 END AS t
        |  FROM documents d LEFT JOIN seeds s USING (doc_id)
        |  CROSS JOIN ns)""".stripMargin)
  )
}
