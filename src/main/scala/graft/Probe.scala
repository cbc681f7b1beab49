package graft

/** Scale-probe timer: run named [[SparkEntry.queries]] entries against
  * an arbitrary table dir (usually a /tmp corpus written by
  * [[ScaleData]]) and print one `name,seconds,rows` line each. The same
  * warmup as [[Bench]] (shared JVM paths only — parquet scan setup,
  * codegen, shuffle, broadcast, window), so first-query JIT cost
  * doesn't masquerade as scaling behavior.
  *
  * {{{ graft.Probe <dir> <queryName>... }}}
  */
object Probe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Probe <dir> <queryName>...")
    val dir = args(0)
    val names = args.drop(1).toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark = GraftSession.local("graft-probe")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    spark.range(1000000L).selectExpr("sum(id)").collect()
    scala.util.Try { // docs-only corpora carry no nation table; skip
      // (the read itself must sit inside the Try — spark.read.parquet
      // throws PATH_NOT_FOUND eagerly at analysis, not at execution)
      val nation = spark.read.parquet(s"$dir/nation.parquet")
      nation.selectExpr("n_nationkey", "n_regionkey", "md5(n_name) AS h",
          "transform(sequence(1, 8), i -> i * n_nationkey) AS arr")
        .withColumn("x", explode(col("arr")))
        .groupBy("h").agg(sum("x").as("sx"), min("n_regionkey").as("rk"))
        .join(broadcast(nation), col("rk") === col("n_regionkey"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("n_regionkey").orderBy("n_nationkey")))
        .selectExpr("count(distinct h)", "max(rn)").collect()
    }
    names.foreach { name =>
      System.gc()
      val t0 = System.nanoTime()
      // Full materialization, not count(): under count() Catalyst
      // prunes every column, so a refiner-shaped query (model scoring,
      // kernels) would be timed as a bare scan. toRdd.count() runs the
      // exact physical plan the query declares, all columns produced.
      val qe = SparkEntry.queries(name)(spark, dir).queryExecution
      val rows = qe.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$name,$sec%.1f,$rows")
    }
    spark.stop()
  }
}
