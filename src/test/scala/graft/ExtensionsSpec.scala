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
}
