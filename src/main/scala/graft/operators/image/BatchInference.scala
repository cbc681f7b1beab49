package graft.operators.image

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batched model-inference slot — the Scala analog of the reference's
  * GPU stages (image_clip_embedding.py: batch collect → model forward →
  * emit), and of a PySpark `mapInPandas` Pandas-UDF.
  *
  * The plumbing is real and is what matters at scale: rows flow through
  * `mapPartitions`, are grouped into fixed-size batches (GPU-friendly
  * shape — one forward pass per batch, bounded device memory), and the
  * kernel sees `Seq[Array[Byte]] => Seq[Array[Float]]`. Swap
  * [[BatchInference.stubKernel]] for an ONNX/Torch JNI call (or run the
  * same operator as a Pandas UDF on PySpark) without touching the
  * operator. Partitioning guidance: `repartition(nGpus × k)` upstream so
  * each device slot drains a similar row count.
  */
object BatchInference {

  type Kernel = Seq[Array[Byte]] => Seq[Array[Float]]

  /** Model-score kernel: one double score vector per payload (double so
    * downstream rounding matches a SQL oracle bit-for-bit). */
  type ScoreKernel = Seq[Array[Byte]] => Seq[Array[Double]]

  /** Batched mapPartitions over (id, payload) rows. The id column rides
    * through UNTYPED (Row-encoded, whatever its DataFrame type is) so
    * string/decimal ids join back losslessly — a silent cast-to-long
    * would null non-numeric ids and drop every row at the join. */
  private def batchedOver(df: DataFrame, idCol: String, imageCol: String,
      batchSize: Int, outField: org.apache.spark.sql.types.StructField)(
      kernel: Seq[Array[Byte]] => Seq[Any]): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.StructType
    val in = df.select(col(idCol), col(imageCol))
    val outSchema = StructType(Seq(in.schema.head, outField))
    in.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val out = kernel(batch.map(_.getAs[Array[Byte]](1)))
        require(out.length == batch.length,
          s"kernel returned ${out.length} results for ${batch.length} inputs")
        batch.zip(out).map { case (r, o) => Row(r.get(0), o) }
      }
    }(Encoders.row(outSchema))
  }

  /** Run a score kernel over (id, payload) rows in batches, producing
    * one named double column per head. Same batched mapPartitions shape
    * as [[embed]] — this is the slot the trained
    * [[graft.operators.ml.DegradationModel]] runs through. */
  def score(df: DataFrame, kernel: ScoreKernel, heads: Seq[String],
      batchSize: Int = 64, idCol: String = "doc_id",
      imageCol: String = "image"): DataFrame = {
    import org.apache.spark.sql.types._
    val scored = batchedOver(df, idCol, imageCol, batchSize,
      StructField("__scores", ArrayType(DoubleType)))(
      batch => kernel(batch))
    heads.zipWithIndex.foldLeft(scored) { case (d, (name, i)) =>
      d.withColumn(name, col("__scores")(i))
    }.drop("__scores")
  }

  /** Deterministic stub standing in for a model forward pass: 8-dim
    * pseudo-embedding from the md5 of the payload (matches
    * [[ClipEmbeddingStub]] semantics). */
  val stubKernel: Kernel = { batch =>
    val md = java.security.MessageDigest.getInstance("MD5")
    batch.map { bytes =>
      val h = md.digest(bytes)
      val raw = Array.tabulate(8) { i =>
        val v = ((h(2 * i) & 0xff) << 8) | (h(2 * i + 1) & 0xff)
        v.toFloat / 65536.0f
      }
      val n = math.sqrt(raw.map(x => x.toDouble * x).sum).toFloat
      if (n == 0f) raw else raw.map(_ / n)
    }
  }

  /** Run `kernel` over (id, payload) rows in batches of `batchSize`,
    * producing (id, embedding). */
  def embed(df: DataFrame, kernel: Kernel = stubKernel, batchSize: Int = 64,
      idCol: String = "doc_id", imageCol: String = "image"): DataFrame = {
    import org.apache.spark.sql.types._
    batchedOver(df, idCol, imageCol, batchSize,
      StructField("embedding", ArrayType(FloatType)))(
      batch => kernel(batch))
  }

  /** TWO payload columns embedded in ONE batched mapPartitions pass —
    * the dual-tower shape of image-text alignment scoring: both towers
    * run over the same batch, so pairing needs no second scan and no
    * join. Output: (id, `aOut`, `bOut`). */
  def embedPair(df: DataFrame, kernel: Kernel = stubKernel,
      batchSize: Int = 64, idCol: String = "doc_id",
      aCol: String = "image", bCol: String = "caption",
      aOut: String = "a_embedding", bOut: String = "b_embedding"): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val in = df.select(col(idCol), col(aCol), col(bCol))
    val outSchema = StructType(Seq(in.schema.head,
      StructField(aOut, ArrayType(FloatType)),
      StructField(bOut, ArrayType(FloatType))))
    in.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val ea = kernel(batch.map(_.getAs[Array[Byte]](1)))
        val eb = kernel(batch.map(_.getAs[Array[Byte]](2)))
        require(ea.length == batch.length && eb.length == batch.length,
          s"kernel returned ${ea.length}/${eb.length} results for ${batch.length} inputs")
        batch.indices.map(i => Row(batch(i).get(0), ea(i), eb(i)))
      }
    }(Encoders.row(outSchema))
  }
}

/** Frame/clip handling stubs for video binary columns — decode needs a
  * codec; the sampling/layout plumbing (offsets, schema, one row per
  * frame) is real. */
object VideoOps {
  import org.apache.spark.sql.Column

  /** Deterministically sample `n` equally-spaced byte windows of
    * `frameBytes` from the payload — the shape of frame sampling
    * (replace the slice with a real decoder's frame fetch). Output:
    * array<struct<frame_idx:int, frame:binary>>.
    *
    * The stride is an INTEGER (floor of the even spacing, min 1) so an
    * oracle can replay offsets with plain integer division — a
    * fractional stride truncated per-frame diverges from `//`-style
    * replay whenever (len - frameBytes) is not a multiple of n-1. */
  def frameSample(video: Column, n: Int, frameBytes: Int = 256): Column = {
    val len = octet_length(video)
    val stride = greatest(
      floor((len - frameBytes) / math.max(n - 1, 1).toDouble).cast("int"), lit(1))
    transform(sequence(lit(0), lit(n - 1)), i => struct(
      i.cast("int").as("frame_idx"),
      substring(video, (i * stride + 1).cast("int"), lit(frameBytes)).as("frame")))
  }

  /** Stub resize: real implementation decodes + scales; the stub keeps
    * the contract (binary in, binary out, bounded size). */
  def resizeStub(image: Column, maxBytes: Int): Column =
    substring(image, 1, maxBytes)
}
