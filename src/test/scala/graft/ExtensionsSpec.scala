package graft

class ExtensionsSpec extends SparkSpec {

  test("graft functions are callable from pure SQL once registered") {
    graft.plans.GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       graft_l2sq(array(0.0D, 0.0D), array(3.0D, 4.0D)) AS l2,
        |       graft_byte_entropy(cast('aabb' AS BINARY)) AS h
        |""".stripMargin).head()
    assert(row.getDouble(0) === 11.0)
    assert(row.getDouble(1) === 25.0)
    assert(row.getDouble(2) === 1.0) // two symbols, equal frequency → 1 bit
  }

  test("FuseCosine rewrites the composed dot/sqrt pattern into one pass") {
    import graft.plans.VectorExpressions.dotNative
    import org.apache.spark.sql.functions._
    import spark.implicits._
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.FuseCosine
    val prevAnsi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false") // rule targets LEGACY divides
    try {
      val df = Seq((Array(1.0, 2.0), Array(3.0, 4.0)),
        (Array(0.0, 0.0), Array(1.0, 1.0))).toDF("a", "b").repartition(1)
      val composed = df.select(
        (dotNative($"a", $"b") /
          (sqrt(dotNative($"a", $"a")) * sqrt(dotNative($"b", $"b")))).as("cos"))
      assert(composed.queryExecution.optimizedPlan.toString
        .contains("cosine_similarity"))
      val vals = composed.as[Option[Double]].collect()
      assert(math.abs(vals(0).get - 11.0 / (math.sqrt(5) * math.sqrt(25))) < 1e-15)
      assert(vals(1).isEmpty) // zero denominator → NULL, identical to legacy divide
    } finally {
      spark.conf.set("spark.sql.ansi.enabled", prevAnsi)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == graft.plans.FuseCosine)
    }
  }
}
