package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the unit tests a table ships
  * with (the Deequ design, Schelter et al. 2018 VLDB "Automating
  * Large-Scale Data Quality Verification"; Great Expectations is the
  * same idea): a suite of named constraints evaluated against a frame,
  * returning one row per expectation with its violation count. The
  * check a pipeline runs between "the writer committed" and "downstream
  * may read" — a corpus datacard says what the data looks like, an
  * expectation suite says whether it's ADMISSIBLE.
  *
  * Scale shape: every row-local expectation (not-null, range, set,
  * regex) and every uniqueness expectation folds into ONE aggregate
  * pass over the frame — row-local ones as `sum(violation ? 1 : 0)`,
  * uniqueness as `count(*) − count(distinct key)` (surplus rows beyond
  * one per key) — then unpivots to the report shape with a bounded
  * `stack`. Referential expectations are one LEFT ANTI join each
  * against the dimension (size-driven join strategy — a small dim
  * broadcasts via the cost model, no hint). Nothing collects; the
  * report is #expectations rows. */
object Expectations {

  sealed trait Expectation {
    /** Stable report key. */
    def name: String
    /** Human column label for the report. */
    def column: String
  }
  /** `col` must be non-null. */
  case class NotNull(col: String) extends Expectation {
    val name = "not_null"; val column = col
  }
  /** The tuple of `cols` must be unique across rows (null-safe:
    * count(distinct) treats nulls as absent — pair with [[NotNull]] on
    * key columns, the Deequ convention). */
  case class Unique(cols: Seq[String]) extends Expectation {
    val name = "unique"; val column = cols.mkString(",")
  }
  /** `lo ≤ col ≤ hi` (violations count non-null out-of-range values;
    * nulls are [[NotNull]]'s job). */
  case class InRange(col: String, lo: Double, hi: Double) extends Expectation {
    require(lo <= hi, "lo must be <= hi")
    val name = "in_range"; val column = col
  }
  /** Non-null `col` must be one of `values`. */
  case class InSet(col: String, values: Seq[String]) extends Expectation {
    require(values.nonEmpty, "values must be non-empty")
    val name = "in_set"; val column = col
  }
  /** Non-null `col` must match `regex` (unanchored find, rlike
    * semantics in both engines — anchor with ^…$ for a full match;
    * keep to the RE2-safe subset so both engines agree). */
  case class MatchesRegex(col: String, regex: String) extends Expectation {
    val name = "matches_regex"; val column = col
  }
  /** Every non-null `col` value must exist in `dim`'s `dimCol`
    * (referential integrity, fact → dimension). */
  case class RefersTo(col: String, dim: DataFrame, dimCol: String)
      extends Expectation {
    val name = "refers_to"; val column = col
  }

  /** One report row per expectation:
    * (expectation, column, violations, n_rows, pass). */
  def report(df: DataFrame, suite: Seq[Expectation]): DataFrame = {
    require(suite.nonEmpty, "suite must be non-empty")
    val refs = suite.collect { case r: RefersTo => r }
    val aggd = suite.filterNot(_.isInstanceOf[RefersTo])
    // one violation-count column per non-referential expectation, all
    // in a single aggregate pass
    val aggCols = aggd.zipWithIndex.map { case (e, i) =>
      val c = e match {
        case NotNull(col0) =>
          sum(when(col(col0).isNull, 1L).otherwise(0L))
        case Unique(cols) =>
          // bare multi-column countDistinct (NOT over a struct): SQL
          // count(DISTINCT a, b) skips any-null tuples, matching both
          // the scaladoc convention and the oracle's count(DISTINCT …)
          // — a struct() wrapper would count null keys as distinct
          // values and disagree on any table with null keys
          count(lit(1)) - countDistinct(col(cols.head), cols.tail.map(col): _*)
        case InRange(col0, lo, hi) =>
          sum(when(col(col0).isNotNull &&
            (col(col0) < lo || col(col0) > hi), 1L).otherwise(0L))
        case InSet(col0, values) =>
          sum(when(col(col0).isNotNull &&
            !col(col0).isin(values: _*), 1L).otherwise(0L))
        case MatchesRegex(col0, re) =>
          sum(when(col(col0).isNotNull &&
            !regexp_like(col(col0), lit(re)), 1L).otherwise(0L))
        case _: RefersTo => lit(0L) // unreachable (filtered)
      }
      coalesce(c, lit(0L)).as(s"__v$i")
    }
    val aggReport = if (aggd.isEmpty) None else Some {
      val row = df.agg(count(lit(1)).as("__n"), aggCols: _*)
      // label values are SQL string literals inside the stack() —
      // escape them (a column name containing a quote would otherwise
      // break parsing or corrupt the report labels; r15 ADVICE)
      def sqlLit(s: String) =
        "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
      val stacked = aggd.zipWithIndex.map { case (e, i) =>
        s"${sqlLit(e.name)}, ${sqlLit(e.column)}, __v$i"
      }.mkString(", ")
      row.selectExpr("__n",
          s"stack(${aggd.size}, $stacked) AS (expectation, col_name, violations)")
        .select(col("expectation"), col("col_name"),
          col("violations").cast("long").as("violations"),
          col("__n").cast("long").as("n_rows"))
    }
    // referential checks: one anti-join count each (size-driven
    // strategy; the dim side is usually the broadcastable one). The
    // row total is computed ONCE and shared — per-check recounts would
    // add a full corpus scan per referential expectation
    val nRow = if (refs.isEmpty) None
      else Some(df.agg(count(lit(1)).as("n_rows")).localCheckpoint())
    val refReports = refs.map { r =>
      val orphans = df.select(col(r.col)).where(col(r.col).isNotNull)
        .join(r.dim.select(col(r.dimCol).as(r.col)), Seq(r.col), "left_anti")
        .agg(count(lit(1)).as("violations"))
      orphans.crossJoin(nRow.get).select(
        lit(r.name).as("expectation"), lit(r.column).as("col_name"),
        col("violations").cast("long"), col("n_rows").cast("long"))
    }
    (aggReport.toSeq ++ refReports).reduce(_ unionByName _)
      .withColumn("pass", col("violations") === 0L)
  }
}
