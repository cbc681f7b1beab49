package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY §5).
  *
  * AQE's skew-join split handles most cases at runtime; explicit salting
  * remains the tool when one side must aggregate first or when a single
  * key dominates an entire stage (the "viral document" / null-key
  * problem at 100 TB). The left (large, skewed) side gets a random salt
  * in [0, factor); the right side is replicated across all salt values —
  * so the join key becomes (key, salt) and the hot key spreads over
  * `factor` reducers.
  */
object Skew {

  /** Inner equi-join with a salted key. `right` must be the smaller
    * side (it is replicated `factor`×). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      factor: Int = 16): DataFrame = {
    val salted = left.withColumn("__salt",
      (rand(42) * factor).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase skew-safe aggregation: partial aggregate on (key, salt),
    * then final aggregate on key. Use when a handful of keys carry most
    * rows and map-side combine alone can't keep reducers balanced.
    * `partial` must be decomposable (sum/count/min/max style). */
  def saltedAgg(df: DataFrame, key: String, factor: Int,
      partial: Seq[(String, Column => Column, Column => Column)]): DataFrame = {
    // partial: (outName, phase1 agg of value col, phase2 re-agg)
    val salted = df.withColumn("__salt", (rand(42) * factor).cast("int"))
    val p1 = salted.groupBy(col(key), col("__salt")).agg(
      partial.head match { case (n, f, _) => f(col(n)).as(s"__p_$n") },
      partial.tail.map { case (n, f, _) => f(col(n)).as(s"__p_$n") }: _*)
    p1.groupBy(col(key)).agg(
      partial.head match { case (n, _, g) => g(col(s"__p_$n")).as(n) },
      partial.tail.map { case (n, _, g) => g(col(s"__p_$n")).as(n) }: _*)
  }
}
