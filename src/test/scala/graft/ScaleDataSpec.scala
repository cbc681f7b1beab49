package graft

import org.apache.spark.sql.functions._

/** The probe-corpus builders must preserve referential integrity and
  * group structure, or every number measured on them is meaningless.
  * Built at 3× from sf0.001 into a temp dir. */
class ScaleDataSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("tpchfull replicas form closed universes: no orphans, group shape preserved") {
    val out = java.nio.file.Files.createTempDirectory("graft_scale_spec").toString
    ScaleData.tpch(spark, sfDir, out, copies = 3, growDims = true)
    val li = spark.read.parquet(s"$out/lineitem.parquet")
    val ord = spark.read.parquet(s"$out/orders.parquet")
    val cust = spark.read.parquet(s"$out/customer.parquet")
    val supp = spark.read.parquet(s"$out/supplier.parquet")
    val part = spark.read.parquet(s"$out/part.parquet")

    // counts scale exactly
    val baseLi = Tables.load(spark, sfDir, "lineitem").count()
    assert(li.count() === baseLi * 3)
    assert(cust.count() === Tables.load(spark, sfDir, "customer").count() * 3)

    // referential integrity: every foreign key resolves (no orphans)
    assert(li.join(ord, li("l_orderkey") === ord("o_orderkey"), "left_anti").count() === 0)
    assert(li.join(supp, li("l_suppkey") === supp("s_suppkey"), "left_anti").count() === 0)
    assert(li.join(part, li("l_partkey") === part("p_partkey"), "left_anti").count() === 0)
    assert(ord.join(cust, ord("o_custkey") === cust("c_custkey"), "left_anti").count() === 0)

    // closed universes: per-order lineitem count distribution is the
    // base corpus's, just 3× the orders
    val baseDist = Tables.load(spark, sfDir, "lineitem")
      .groupBy("l_orderkey").count().groupBy("count").count()
      .as[(Long, Long)](org.apache.spark.sql.Encoders.product[(Long, Long)])
      .collect().toMap
    val repDist = li.groupBy("l_orderkey").count().groupBy("count").count()
      .as[(Long, Long)](org.apache.spark.sql.Encoders.product[(Long, Long)])
      .collect().toMap
    assert(repDist === baseDist.map { case (k, v) => k -> v * 3 })

    // keys unique after remapping
    assert(cust.select("c_custkey").distinct().count() === cust.count())
    assert(ord.select("o_orderkey").distinct().count() === ord.count())
  }
}
