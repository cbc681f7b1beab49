package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT per-group top-k without a one-task-per-group sort — THE
  * implementation of the salted two-level rank both
  * [[graft.operators.vector.HardNegativeMiner]] (hot-IVF-cell
  * straggler, SURVEY B43) and [[graft.operators.text.CcnetBucketer]]
  * (per-language vocabulary pruning, B67) rely on, factored once (the
  * same drift argument as the r16 SegmentedManifest consolidation):
  *
  * stage 1 ranks inside (group, salt-of-`saltOn`) sub-partitions and
  * keeps each bucket's top k — any global top-k row is top-k within
  * its own salt slice, so nothing true is lost — stage 2 re-ranks the
  * ≤ salts·k survivors per group. Results are identical to a single
  * per-group window, but no sort partition ever exceeds ~1/salts of a
  * group's rows. */
object TopK {

  /** Top-`k` rows per `group` by `order` (a deterministic total order —
    * include a tiebreak column). `saltOn` must be non-constant within
    * hot groups (any high-cardinality column serves). When `rankCol`
    * is set the final 1..k rank is kept under that name. */
  def perGroup(df: DataFrame, group: Seq[Column], order: Seq[Column],
      saltOn: Column, k: Int, salts: Int = 16,
      rankCol: Option[String] = None): DataFrame = {
    require(k >= 1 && salts >= 1, "k and salts must be >= 1")
    val w1 = Window.partitionBy((group :+ col("__tk_salt")): _*)
      .orderBy(order: _*)
    val w2 = Window.partitionBy(group: _*).orderBy(order: _*)
    val staged = df
      .withColumn("__tk_salt", pmod(xxhash64(saltOn), lit(salts.toLong)))
      .withColumn("__tk_r1", row_number().over(w1))
      .filter(col("__tk_r1") <= k)
      .drop("__tk_salt", "__tk_r1")
      .withColumn("__tk_r2", row_number().over(w2))
      .filter(col("__tk_r2") <= k)
    rankCol match {
      case Some(name) => staged.withColumnRenamed("__tk_r2", name)
      case None => staged.drop("__tk_r2")
    }
  }
}
