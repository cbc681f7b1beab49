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

  test("vectors corpus plants exactly one near-dup per 5 ids, nothing else") {
    val out = java.nio.file.Files.createTempDirectory("graft_vec_spec").toString
    assert(ScaleData.vectors(spark, out, n = 200L) === 200L)
    val emb = spark.read.parquet(s"$out/embeddings.parquet")
    val a = emb.select(col("vec_id").as("ia"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("ib"), col("embedding").as("vb"))
    val cos = a.join(b, col("ia") < col("ib"))
      .select(col("ia"), col("ib"),
        round(graft.functions.VecFns.cosine(col("va"), col("vb")), 6).as("cos"))
    // the planted pairs (g, g+4) are near-identical; every other pair
    // of 64-dim hash vectors sits far below any sane threshold
    val planted = cos.filter(col("cos") >= 0.95)
      .select("ia", "ib").as[(Long, Long)](
        org.apache.spark.sql.Encoders.product[(Long, Long)])
      .collect().toSet
    assert(planted === (0L until 200L by 5).map(g => (g, g + 4)).toSet)
    assert(cos.filter(col("cos") >= 0.95 || col("cos") <= -0.95).count() === 40)
  }
}
