package graft.queries

import graft.Tables
import graft.operators.join.{AsOfJoin, RangeJoin}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join-shape coverage beyond the basic equi-joins: as-of (temporal),
  * range (point-in-interval), semi, anti, outer-distribution, rollup.
  * The as-of and range joins are the operators Spark lacks natively —
  * see graft.operators.join.TemporalJoins for the scalable shapes. */
object JoinQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // each click picks up the user's most recent purchase at-or-before it
    "events_asof_join" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id", "ts")
        .agg(max_by(col("value"), col("event_id")).as("p_value"))
      AsOfJoin(Seq("user_id"), "ts")(clicks, purchases, Seq("p_value"))
    }),

    // clicks within 10 minutes after each error, same user — bucketized
    // interval join, never a nested-loop
    "events_range_join" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("error_id"), col("user_id"),
          unix_micros(col("ts")).as("t0"))
        .withColumn("t1", col("t0") + 600000000L)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          unix_micros(col("ts")).as("pt"))
      RangeJoin(Seq("user_id"), 600000000L)(clicks, "pt", errors, "t0", "t1")
        .groupBy("error_id")
        .agg(count(lit(1)).as("n_clicks"), min("click_id").as("first_click"))
    }),

    // TPC-H Q7 shape: same dim table joined twice under different
    // aliases (supplier nation x customer nation), both broadcast
    "q7_nation_volume" -> ((s, dir) => {
      val nation = Tables.load(s, dir, "nation").select("n_nationkey", "n_name")
      val li = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      val supp = Tables.load(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val ord = Tables.load(s, dir, "orders").select("o_orderkey", "o_custkey")
      val cust = Tables.load(s, dir, "customer").select("c_custkey", "c_nationkey")
      // supplier grows with SF — no broadcast hint; the cost model /
      // AQE broadcasts it while it fits and falls back to SMJ when it
      // doesn't. Hints stay only on nation (fixed 25 rows).
      li.join(supp, li("l_suppkey") === supp("s_suppkey"))
        .join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(cust, ord("o_custkey") === cust("c_custkey"))
        .join(broadcast(nation.as("sn")), col("s_nationkey") === col("sn.n_nationkey"))
        .join(broadcast(nation.as("cn")), col("c_nationkey") === col("cn.n_nationkey"))
        .filter(col("sn.n_name") < col("cn.n_name"))
        .groupBy(col("sn.n_name").as("supp_nation"), col("cn.n_name").as("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        // decimal per-row casts + exact decimal sum: summation order can
        // no longer flip the 2-dp rounding (double sums are
        // order-dependent and this group is wide enough to hit it)
        .agg(round(sum(col("l_extendedprice").cast("decimal(18,4)") *
            (lit(1.0) - col("l_discount")).cast("decimal(18,4)")), 2)
          .cast("double").as("revenue"), count(lit(1)).as("n_items"))
    }),

    // TPC-H Q10 shape: returned-item revenue per customer, top 20
    "q10_returned_items" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      val ord = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
      val cust = Tables.load(s, dir, "customer")
      val nation = broadcast(Tables.load(s, dir, "nation"))
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(cust, ord("o_custkey") === cust("c_custkey")) // SF-scaled: size-driven join
        .join(nation, cust("c_nationkey") === nation("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(round(sum(col("l_extendedprice").cast("decimal(15,4)") *
            (lit(1.0) - col("l_discount")).cast("decimal(9,4)")), 2)
          .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    }),

    // TPC-H Q18 shape: large-volume orders (HAVING over a grouped fact,
    // semi-joined back to the enriched rows)
    "q18_large_orders" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val ord = Tables.load(s, dir, "orders")
      val cust = Tables.load(s, dir, "customer")
      val big = li.groupBy("l_orderkey")
        .agg(round(sum(col("l_quantity").cast("decimal(15,4)")), 2)
          .cast("double").as("total_qty"))
        .filter(col("total_qty") > 150)
      ord.join(big, ord("o_orderkey") === big("l_orderkey"))
        .join(cust, ord("o_custkey") === cust("c_custkey")) // SF-scaled: size-driven join
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("total_qty"))
    }),

    // TPC-H Q14 shape: conditional aggregation over a fact-dim join
    // (promo revenue share); decimal sums → order-proof ratio
    "q14_promo_share" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      val part = Tables.load(s, dir, "part").select("p_partkey", "p_type")
      val disc = col("l_extendedprice").cast("decimal(15,4)") *
        (lit(1.0) - col("l_discount")).cast("decimal(9,4)")
      li.join(part, li("l_partkey") === part("p_partkey")) // SF-scaled: size-driven join
        .agg(
          round(lit(100.0) *
            sum(when(col("p_type") === "PROMO", disc).otherwise(lit(0).cast("decimal(25,8)")))
              .cast("double") /
            sum(disc).cast("double"), 4).as("promo_share"),
          count(lit(1)).as("n_items"))
    }),

    "q4_priority_semi" -> ((s, dir) => {
      val ord = Tables.load(s, dir, "orders")
      val li = Tables.load(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R").select("l_orderkey")
      ord.join(li, ord("o_orderkey") === li("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n_orders"))
    }),

    // customers with no orders in 1995 (anti join; the date filter keeps
    // the predicate selective so the anti join actually removes rows)
    "q22_no_orders_anti" -> ((s, dir) => {
      val cust = Tables.load(s, dir, "customer")
      val ord = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
        .select("o_custkey")
      cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_custs"),
          round(sum("c_acctbal"), 2).as("acctbal_sum"))
    }),

    // TPC-H Q13 shape: per-customer order count (0 for order-less
    // customers via left outer), then the count distribution
    "q13_order_counts" -> ((s, dir) => {
      val cust = Tables.load(s, dir, "customer")
      val ord = Tables.load(s, dir, "orders")
      cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count").agg(count(lit(1)).as("custdist"))
    }),

    "events_rollup" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .withColumn("day", date_trunc("day", col("ts")))
      ev.rollup("event_type", "day")
        .agg(grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
    })
  )

  def oracles: Map[String, String] = Map(
    "events_asof_join" ->
      """WITH p AS (
        |  SELECT user_id, ts, arg_max(value, event_id) AS p_value
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
        |SELECT c.event_id, c.user_id, c.ts, p.ts AS asof_ts, p.p_value
        |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin,

    "events_range_join" ->
      """WITH e AS (
        |  SELECT event_id AS error_id, user_id, epoch_us(ts) AS t0
        |  FROM events WHERE event_type = 'error'),
        |c AS (
        |  SELECT event_id AS click_id, user_id, epoch_us(ts) AS pt
        |  FROM events WHERE event_type = 'click')
        |SELECT error_id, count(*) AS n_clicks, min(click_id) AS first_click
        |FROM e JOIN c ON e.user_id = c.user_id
        |  AND c.pt >= e.t0 AND c.pt <= e.t0 + 600000000
        |GROUP BY 1""".stripMargin,

    "q7_nation_volume" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS INT) AS l_year,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |    CAST(1.0 - l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem l
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        |JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        |WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND sn.n_name < cn.n_name
        |GROUP BY 1, 2, 3""".stripMargin,

    "q10_returned_items" ->
      """SELECT c.c_custkey, c.c_name, n.n_name,
        |  CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(15,4)) *
        |    CAST(1.0 - l.l_discount AS DECIMAL(9,4))), 2) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE l.l_returnflag = 'R'
        |  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, c_custkey ASC LIMIT 20""".stripMargin,

    "q18_large_orders" ->
      """SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
        |  o.o_totalprice, t.total_qty
        |FROM (
        |  SELECT l_orderkey,
        |    CAST(round(sum(CAST(l_quantity AS DECIMAL(15,4))), 2) AS DOUBLE) AS total_qty
        |  FROM lineitem GROUP BY 1 HAVING
        |    CAST(round(sum(CAST(l_quantity AS DECIMAL(15,4))), 2) AS DOUBLE) > 150) t
        |JOIN orders o ON o.o_orderkey = t.l_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey""".stripMargin,

    "q14_promo_share" ->
      """SELECT round(100.0 *
        |    CAST(sum(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(l_extendedprice AS DECIMAL(15,4)) * CAST(1.0 - l_discount AS DECIMAL(9,4))
        |      ELSE CAST(0 AS DECIMAL(25,8)) END) AS DOUBLE) /
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(15,4)) * CAST(1.0 - l_discount AS DECIMAL(9,4))) AS DOUBLE),
        |  4) AS promo_share,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'""".stripMargin,

    "q4_priority_semi" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders WHERE EXISTS (
        |  SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY 1""".stripMargin,

    "q22_no_orders_anti" ->
      """SELECT c_mktsegment, count(*) AS n_custs,
        |  round(sum(c_acctbal), 2) AS acctbal_sum
        |FROM customer WHERE NOT EXISTS (
        |  SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |    AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00')
        |GROUP BY 1""".stripMargin,

    "q13_order_counts" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        |  FROM customer c LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
        |  GROUP BY 1) t
        |GROUP BY 1""".stripMargin,

    "events_rollup" ->
      """SELECT event_type, day, CAST(GROUPING(event_type, day) AS BIGINT) AS gid,
        |  count(*) AS n, round(sum(value), 2) AS total_value
        |FROM (SELECT event_type, date_trunc('day', ts) AS day, value FROM events)
        |GROUP BY ROLLUP(event_type, day)""".stripMargin
  )
}
