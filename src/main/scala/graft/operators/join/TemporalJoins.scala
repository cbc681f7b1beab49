package graft.operators.join

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Backward as-of join: every left row picks up the latest right row with
  * `right.ts <= left.ts` within the same key group (the time-series
  * "most recent quote for each trade" join).
  *
  * Spark has no as-of join operator; the naive formulations are a range
  * theta-join (broadcast-nested-loop — quadratic) or a per-key
  * `collect_list` + search (memory-sized state). This is the scalable
  * shape: union both sides, ONE shuffle on the key, and a running
  * `last(payload, ignoreNulls)` window fills each left row from the
  * nearest preceding right row. Cost is sort-based, linear per key, and
  * each payload rides the single shuffle once.
  *
  * Right rows must be unique per (keys, ts) — pre-aggregate with
  * `max_by` if not; a right row at exactly left.ts matches (right sorts
  * before left at equal ts).
  */
case class AsOfJoin(keys: Seq[String], tsCol: String,
    toleranceMicros: Option[Long] = None) {

  private def ord(df: DataFrame, c: Column): Column =
    if (df.schema(tsCol).dataType == TimestampType) unix_micros(c) else c.cast("long")

  /** @param payloadCols right-side columns carried onto matching left
    *                    rows (emitted as-is, plus `asofTsCol` = the
    *                    matched right-row ts; all null when no match or
    *                    match older than the tolerance). */
  def apply(left: DataFrame, right: DataFrame, payloadCols: Seq[String],
      asofTsCol: String = "asof_ts"): DataFrame = {
    val r = right.select(
      keys.map(col) ++ Seq(ord(right, col(tsCol)).as("__ord"), lit(0).as("__side"),
        struct(col(tsCol).as("__rts") +: payloadCols.map(col): _*).as("__p")): _*)
    val l = left.select(
      keys.map(col) ++ Seq(ord(left, col(tsCol)).as("__ord"), lit(1).as("__side"),
        struct(left.columns.map(col): _*).as("__l")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ord").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = r.unionByName(l, allowMissingColumns = true)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val withinTol = toleranceMicros match {
      case Some(tol) =>
        filled.withColumn("__m",
          when(col("__ord") - ord(right, col("__m.__rts")) <= tol, col("__m")))
      case None => filled
    }
    val leftCols = left.columns.map(c => col(s"__l.$c").as(c))
    val matchCols = col("__m.__rts").as(asofTsCol) +:
      payloadCols.map(c => col(s"__m.$c").as(c))
    withinTol.select(leftCols ++ matchCols: _*)
  }
}

/** Point-in-interval range join: pairs each point with every interval
  * containing it, sharing optional equi-keys.
  *
  * Spark executes a bare `p.ts BETWEEN i.start AND i.end` join as a
  * broadcast-nested-loop (all pairs). The scale shape bucketizes the
  * range dimension: intervals explode to the buckets they cover, points
  * map to one bucket, and the join becomes a hash-partitioned equi-join
  * on (keys..., bucket) with an exact residual filter. Choose
  * `bucketWidth` ≈ the typical interval length so intervals explode to
  * O(1) buckets.
  *
  * Point and interval columns (other than `equiKeys`) must not collide.
  */
case class RangeJoin(equiKeys: Seq[String], bucketWidth: Long) {
  require(bucketWidth > 0, "bucketWidth must be positive")

  def apply(points: DataFrame, ptCol: String,
      intervals: DataFrame, startCol: String, endCol: String): DataFrame = {
    val pb = points.withColumn("__bucket", floor(col(ptCol) / bucketWidth))
    val ib = intervals.withColumn("__bucket",
      explode(sequence(floor(col(startCol) / bucketWidth),
        floor(col(endCol) / bucketWidth))))
    pb.join(ib, equiKeys :+ "__bucket")
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__bucket")
  }
}
