package graft

/** The round-8 broadcast policy's other half: removing the hints is
  * only safe if the plans DEGRADE GRACEFULLY when the build side stops
  * fitting. The probe corpora can't show that (ScaleData grows facts,
  * not dimensions), so this spec simulates outgrowing the threshold
  * directly: with autoBroadcastJoinThreshold = -1 the cost model may
  * broadcast nothing, which is exactly the planner's view of an
  * SF-scaled dimension at 100 TB. Every formerly hint-forced query
  * must then (a) plan its dimension joins as shuffle joins — only the
  * explicitly hinted bounded sides (nation/region, 1-row scalars) may
  * still broadcast — and (b) return bit-identical results. A forced
  * broadcast() hint would make (a) impossible; a plan that only works
  * because of broadcast locality would fail (b). */
class BroadcastDegradationSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // the queries the r7 verdict flagged for hint-forced SF-scaled
  // broadcasts (customer/supplier/part build sides)
  private val flagged = Seq("q5_local_supplier_volume", "q7_nation_volume",
    "q8_market_share", "q9_product_profit", "q10_returned_items",
    "q14_promo_share", "q15_top_supplier", "q18_large_orders",
    "topk_customers", "q3_shipping_priority", "q21_waiting_supplier")

  test("SF-scaled dim joins degrade to shuffle joins with identical results") {
    val threshold = "spark.sql.autoBroadcastJoinThreshold"
    val aqeThreshold = "spark.sql.adaptive.autoBroadcastJoinThreshold"
    val old = spark.conf.getOption(threshold)
    val oldAqe = spark.conf.getOption(aqeThreshold)
    def restore(): Unit = {
      old.fold(spark.conf.unset(threshold))(spark.conf.set(threshold, _))
      oldAqe.fold(spark.conf.unset(aqeThreshold))(spark.conf.set(aqeThreshold, _))
    }
    try {
      for (q <- flagged) {
        restore()
        val expected = rowsOf(SparkEntry.queries(q)(spark, dir))
          .map(_.mkString("|")).sorted
        spark.conf.set(threshold, "-1")
        spark.conf.set(aqeThreshold, "-1")
        val df = SparkEntry.queries(q)(spark, dir)
        val plan = df.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
          s"$q: no shuffle join appeared with broadcasts disabled — a " +
            "hint must be forcing a broadcast on an SF-scaled side")
        val degraded = rowsOf(df).map(_.mkString("|")).sorted
        assert(degraded === expected, s"$q: degraded plan changed the result")
      }
    } finally restore()
  }
}
