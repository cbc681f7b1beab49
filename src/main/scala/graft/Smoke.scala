package graft

import org.apache.spark.sql.SparkSession

/** Mirrors the driver's t1 smoke: run SparkEntry.entry and assert rows>0. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-smoke", 8)
    val df = SparkEntry.entry(spark)
    df.show(5, truncate = false)
    val n = df.count()
    println(s"[smoke] entry rows=$n")
    assert(n > 0, "entry returned no rows")
    spark.stop()
  }
}
