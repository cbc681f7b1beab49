package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** MinHash signature as ONE aggregate function: per group, the
  * elementwise minimum of `(x·aᵢ + bᵢ) mod prime` over the group's
  * 28-bit base hashes, returned as `array<long>` of length n.
  *
  * Why this exists: the declarative formulation is n separate
  * `min((x*aᵢ+bᵢ) % p)` aggregate columns, and at the r=2 banding
  * sizing (n = 340, `NgramJaccard.lowTauBanding(2)`) that aggregate is
  * ~3.4× past `spark.sql.codegen.maxFields` (100) — whole-stage
  * codegen refuses the stage and every row pays 340 interpreted
  * expression-tree walks. This operator updates a reused `Array[Long]`
  * buffer in one tight JVM loop per row (no per-row allocation, exact
  * same 64-bit arithmetic — products stay < 2^62), so the signature
  * cost is flat in n for any banding the recall math asks for.
  *
  * Runs under `ObjectHashAggregateExec` (the TypedImperativeAggregate
  * host), which keeps map-side partial aggregation and degrades to
  * sort-based aggregation past the in-memory group threshold — the
  * right shape at 100 TB where distinct doc counts per task are
  * unbounded. Buffer is n longs (2.7 KB at n=340); spill
  * serialization is a flat little-endian byte image.
  *
  * Empty groups cannot reach [[eval]] from the dedup pipeline (groups
  * exist only for exploded non-null shingle hashes), but a group whose
  * inputs were all null evaluates to null for parity with
  * `array(min(...)...)`'s all-null array being detectable. */
case class MinHashSignature(
    child: Expression,
    coefA: Seq[Long],
    coefB: Seq[Long],
    prime: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(coefA.length == coefB.length && coefA.nonEmpty,
    "coefA/coefB must be same non-zero length")
  private val n = coefA.length
  @transient private lazy val as: Array[Long] = coefA.toArray
  @transient private lazy val bs: Array[Long] = coefB.toArray

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(n)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      var i = 0
      while (i < n) {
        val h = (x * as(i) + bs(i)) % prime
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < n) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any =
    if (buf(0) == Long.MaxValue) null else new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(n * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](n)
    java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSignature =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSignature =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def prettyName: String = "minhash_signature"
}

object MinHashAgg {
  /** Column-level entry: `minhashSig(baseHash, a, b, p)` aggregates to
    * the full n-wide signature array. */
  def minhashSig(c: Column, coefA: Seq[Long], coefB: Seq[Long],
      prime: Long): Column =
    GraftColumnBridge.column(
      MinHashSignature(GraftColumnBridge.expression(c), coefA, coefB, prime)
        .toAggregateExpression())
}
