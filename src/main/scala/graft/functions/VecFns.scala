package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float|double>` embedding columns.
  *
  * Built on higher-order functions (`zip_with` / `aggregate`) which fold
  * sequentially inside codegen — deterministic summation order, no UDF.
  * Elements are cast to double before arithmetic so results are engine-
  * portable (float32 values are exactly representable as doubles).
  */
object VecFns {

  private def d(c: Column): Column = transform(c, x => x.cast("double"))

  /** Native codegen'd dot product (graft.plans.DotProduct) — identical
    * sequential summation order to the higher-order-function fold, so
    * results are bit-for-bit the same, just compiled. */
  def dot(a: Column, b: Column): Column =
    graft.plans.VectorExpressions.dotNative(a, b)

  /** The HOF formulation, kept for reference/fallback. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** Fused native cosine (graft.plans.CosineSimilarity): one array pass
    * instead of three, bit-identical to the composed form. */
  def cosine(a: Column, b: Column): Column =
    graft.plans.VectorExpressions.cosineNative(a, b)

  /** The composed formulation, kept for reference/spec cross-checks. */
  def cosineComposed(a: Column, b: Column): Column = {
    val den = norm2(a) * norm2(b)
    when(den === 0.0, lit(0.0)).otherwise(dot(a, b) / den)
  }

  def l2Dist(a: Column, b: Column): Column =
    sqrt(graft.plans.VectorExpressions.l2SquaredNative(a, b))

  /** L2-normalize a vector (zero vector maps to itself). The norm is
    * let-bound ([[Cols.bind]]) — referencing `norm2(a)` directly inside
    * the transform lambda would recompute the full dot product per
    * element, O(dim²) per row. */
  def l2Normalize(a: Column): Column =
    Cols.bind(norm2(a)) { n =>
      when(n === 0.0, d(a)).otherwise(transform(d(a), x => x / n))
    }

}
