package graft

import graft.sources.Sinks
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe for the bucketed-layout answer to the fact-fact SMJ cost
  * (SURVEY §5.11): writes orders/lineitem as co-bucketed catalog tables
  * (`Sinks.bucketedTable`, hash(o_orderkey/l_orderkey), one file per
  * bucket) and times the q5/q21 join shapes over the plain-parquet vs
  * the bucketed layout in the same JVM, printing wall seconds,
  * Exchange/Sort counts from the executed plan, and a result-equality
  * check between the two layouts.
  *
  * The point at 100 TB: the pay-once ingest shuffle replaces the
  * per-query shuffle+sort of BOTH fact sides — every downstream
  * orderkey equi-join or orderkey-prefixed aggregation reads
  * pre-partitioned, pre-sorted buckets (Spark elides Exchange when
  * HashPartitioning(orderkey) satisfies the join/agg distribution, and
  * the sort when each bucket is a single sorted file).
  *
  * {{{ BucketProbe <srcDir> <warehouseDir> write|probe [buckets] [reps] }}}
  */
object BucketProbe {

  /** q5-shaped: lineitem⋈supplier⋈orders⋈customer⋈nation⋈region with
    * the revenue aggregate — the un-filtered fact-fact SMJ that is the
    * 100× wall. Identical column expressions for both layouts. */
  private def q5(load: String => DataFrame): DataFrame = {
    val region = broadcast(load("region"))
    val nation = broadcast(load("nation"))
    val supp = load("supplier")
    val cust = load("customer")
    val ord = load("orders")
    val li = load("lineitem")
    li.join(supp, li("l_suppkey") === supp("s_suppkey"))
      .join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(nation, supp("s_nationkey") === nation("n_nationkey"))
      .join(region, nation("n_regionkey") === region("r_regionkey"))
      .filter(cust("c_nationkey") === supp("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice").cast("decimal(15,4)") *
          (lit(1.0) - col("l_discount")).cast("decimal(9,4)")), 2)
        .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** q21-shaped: the per-(orderkey, suppkey) then per-orderkey
    * aggregation chain over lineitem⋈orders — bucketing on orderkey
    * makes the join AND both aggregations exchange-free (orderkey is a
    * prefix of every grouping key). */
  private def q21(load: String => DataFrame): DataFrame = {
    val nation = load("nation")
      .filter(col("n_name") === "NATION_5").select("n_nationkey")
    val supp = load("supplier")
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name")
    load("lineitem")
      .join(load("orders").select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
          .as("late"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("late")).as("late"))
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_supp"),
        count(when(col("late"), lit(1))).as("n_late"),
        min(when(col("late"), col("l_suppkey"))).as("late_supp"))
      .filter(col("n_supp") >= 2 && col("n_late") === 1)
      .join(supp, col("late_supp") === col("s_suppkey"))
      .groupBy("s_name").agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name").asc)
  }

  /** The default session catalog is in-memory, so a fresh JVM has lost
    * the saveAsTable metadata — re-register the bucketed files as
    * external tables (bucket ids ride in the file names, which is what
    * the bucketed reader keys on). */
  private def registerBucketed(spark: SparkSession, wh: String,
      buckets: Int): Unit = {
    def register(name: String, key: String): Unit =
      if (!spark.catalog.tableExists(name)) {
        val loc = s"$wh/$name"
        val schema = spark.read.parquet(loc).schema.toDDL
        spark.sql(s"CREATE TABLE $name ($schema) USING parquet " +
          s"CLUSTERED BY ($key) SORTED BY ($key) INTO $buckets BUCKETS " +
          s"LOCATION '$loc'")
      }
    register("orders_bkt", "o_orderkey")
    register("lineitem_bkt", "l_orderkey")
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: BucketProbe <srcDir> <warehouseDir> write|probe|explain " +
        "[buckets=64] [reps=3] [plain|bucketed]")
    val Array(srcDir, wh, cmd) = args.take(3)
    val buckets = if (args.length > 3) args(3).toInt else 64
    val reps = if (args.length > 4) args(4).toInt else 3
    val spark = GraftSession.builder("graft-bucket-probe")
      .master(s"local[${GraftSession.configuredCpus.getOrElse(32)}]")
      .config("spark.sql.warehouse.dir", wh)
      // report the per-bucket sort order from the scan: Spark 3+ turned
      // this off by default (multi-file buckets would need a merge);
      // our writer guarantees ONE sorted file per bucket (repartition
      // on the bucket key before bucketBy+sortBy), which is the layout
      // the flag exists for — with it the orderkey SMJ elides BOTH
      // sorts, not just both exchanges
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def plain(n: String): DataFrame = Tables.load(spark, srcDir, n)
    def bucketed(n: String): DataFrame = n match {
      case "orders" => spark.table("orders_bkt")
      case "lineitem" => spark.table("lineitem_bkt")
      case other => Tables.load(spark, srcDir, other)
    }

    cmd match {
      case "write" =>
        // repartition on the bucket column first: repartition() and
        // bucketBy() share Murmur3 hash partitioning, so each write
        // task holds exactly one bucket -> one file per bucket, the
        // layout that lets the scan report sorted output and Spark
        // elide the SMJ sort (multi-file buckets are merged unsorted
        // and would re-sort)
        val t0 = System.nanoTime()
        Sinks.bucketedTable(
          plain("orders").repartition(buckets, col("o_orderkey")),
          "orders_bkt", Seq("o_orderkey"), buckets, Seq("o_orderkey"))
        Sinks.bucketedTable(
          plain("lineitem").repartition(buckets, col("l_orderkey")),
          "lineitem_bkt", Seq("l_orderkey"), buckets, Seq("l_orderkey"))
        println(f"BUCKET_PROBE write buckets=$buckets " +
          f"sec=${(System.nanoTime() - t0) / 1e9}%.1f")

      case "explain" =>
        registerBucketed(spark, wh, buckets)
        // formatted plan of the core fact-fact join + agg over each
        // layout — the artifact that shows WHERE the exchanges/sorts
        // sit (bucketed scan output is hash(orderkey)-partitioned and,
        // with one sorted file per bucket, already orderkey-sorted)
        for ((label, load) <- Seq(("plain", plain _), ("bucketed", bucketed _))) {
          println(s"=== $label: lineitem JOIN orders ON orderkey, GROUP BY (orderkey, suppkey) ===")
          load("lineitem").join(load("orders"),
              col("l_orderkey") === col("o_orderkey"))
            .groupBy(col("l_orderkey"), col("l_suppkey"))
            .agg(count(lit(1)).as("n"))
            .explain("formatted")
        }

      case "probe" =>
        registerBucketed(spark, wh, buckets)
        // warmup: shared JVM paths only
        spark.range(1000000L).selectExpr("sum(id)").collect()
        // layout filter: "probe plain" / "probe bucketed" time one
        // layout per JVM (the 100× runs are minutes each — one layout
        // keeps a session inside an external watchdog window); bare
        // "probe" keeps the result-equality cross-check (run it at the
        // scale where a full extra evaluation of each query is cheap)
        if (args.length > 5)
          require(Set("plain", "bucketed")(args(5)),
            s"layout must be 'plain' or 'bucketed', got '${args(5)}'")
        val layouts = Seq(("plain", plain _), ("bucketed", bucketed _))
          .filter { case (l, _) => args.length <= 5 || l == args(5) }
        for ((qname, q) <- Seq(("q5", q5 _), ("q21", q21 _))) {
          // both layouts must compute the same answer — the layout is
          // an optimization, not a semantics change
          if (layouts.length == 2) {
            val pRows = q(plain).collect().map(_.toSeq).toSet
            val bRows = q(bucketed).collect().map(_.toSeq).toSet
            require(pRows == bRows,
              s"$qname: bucketed result differs from plain (${pRows.size} vs ${bRows.size} rows)")
          }
          for ((label, load) <- layouts) {
            var lastQe: org.apache.spark.sql.execution.QueryExecution = null
            val times = (1 to reps).map { _ =>
              System.gc()
              val t0 = System.nanoTime()
              val qe = q(load).queryExecution
              qe.toRdd.count()
              lastQe = qe
              (System.nanoTime() - t0) / 1e9
            }
            // executedPlan AFTER toRdd.count(): the FINAL adaptive plan
            // (an unexecuted qe would show AQE's initial plan, hiding
            // runtime broadcast conversions and coalesces)
            val plan = lastQe.executedPlan.toString
            val nEx = "Exchange hashpartitioning".r.findAllIn(plan).size
            val nSort = "\\bSort \\[".r.findAllIn(plan).size
            println(f"BUCKET_PROBE $qname $label best=${times.min}%.1f " +
              f"runs=${times.map(t => f"$t%.1f").mkString("/")} " +
              s"exchanges=$nEx sorts=$nSort")
          }
        }

      case other => sys.error(s"unknown command $other")
    }
    spark.stop()
  }
}
