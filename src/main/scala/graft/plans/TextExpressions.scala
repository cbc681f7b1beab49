package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Shannon entropy over the byte-value histogram of a binary column —
  * single pass, no shuffle.
  *
  * The composed-operator formulation (explode bytes → two groupBys) is
  * correct but shuffles twice per call; this runs as a map-only
  * projection inside whole-stage codegen, which is the shape that
  * matters when the column is 100 TB of image bytes. Mirrors the
  * reference's Rust `image_assess_quality_batch` entropy half
  * (src/lib.rs, image_ops).
  */
case class ByteEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"byte_entropy expects binary input, got ${t.catalogString}")
    }

  override protected def nullSafeEval(v: Any): Any =
    ByteEntropy.entropyOf(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.plans.ByteEntropy.entropyOf($b)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "byte_entropy"
}

object ByteEntropy {
  /** Shared by interpreted eval and generated code. */
  def entropyOf(bytes: Array[Byte]): Double = {
    if (bytes.length == 0) return 0.0
    val counts = new Array[Int](256)
    var i = 0
    while (i < bytes.length) { counts(bytes(i) & 0xff) += 1; i += 1 }
    val n = bytes.length.toDouble
    var acc = 0.0
    var c = 0
    while (c < 256) {
      if (counts(c) > 0) {
        val p = counts(c) / n
        acc -= p * (math.log(p) / math.log(2.0))
      }
      c += 1
    }
    acc
  }
}

object TextExpressions {
  def byteEntropy(c: Column): Column =
    GraftColumnBridge.column(ByteEntropy(GraftColumnBridge.expression(c)))
}
