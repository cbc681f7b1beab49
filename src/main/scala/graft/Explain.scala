package graft

/** Plan auditor: prints the formatted physical plan for selected queries
  * so pushdown/broadcast/codegen can be inspected (SURVEY §5 checks).
  * Usage: graft.Explain <sfDir> [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q1_pricing_summary", "q3_shipping_priority", "dedup_exact",
        "knn_bruteforce", "text_length_filter")
    val spark = GraftSession.local("graft-explain", 4)
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
