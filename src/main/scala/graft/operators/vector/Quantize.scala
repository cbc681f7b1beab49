package graft.operators.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar int8 quantization of an embedding column — the standard 4×
  * memory/IO reduction for billion-vector ANN indexes (FAISS `SQ8`):
  * per-dimension min/max over the corpus, then each component maps to
  * round((v − min)/(max − min) · 255) − 128 ∈ [−128, 127].
  *
  * Scale shape: the stats pass is ONE posexplode + (dim)-group
  * aggregate (map-side combined; the result is `dim` rows — bounded by
  * the embedding width, 64–4096, never by corpus size), collected once
  * and re-entering the plan as literal arrays, so quantize/dequantize
  * are MAP-ONLY column transforms — no join against a stats table, no
  * shuffle of the vectors. Quantized search then runs the existing
  * [[BruteForceKnn]]/[[IvfIndex]] machinery over dequantized doubles:
  * at 100 TB the quantized index is what fits in executor memory, and
  * the exact float pass reranks only the survivors.
  *
  * All arithmetic is double (floats widened first), so any engine
  * replaying the same formula reproduces the codes bit-exactly. */
case class VectorQuantizer(
    idCol: String = "vec_id",
    vecCol: String = "embedding") {

  /** Per-dimension (dim, mn, mx) — `dim` rows. */
  def fitStats(df: DataFrame): DataFrame =
    df.select(posexplode(col(vecCol)).as(Seq("dim", "__v")))
      .groupBy("dim")
      .agg(min(col("__v").cast("double")).as("mn"),
        max(col("__v").cast("double")).as("mx"))

  /** Collected stats as (mins, maxes) ordered by dim. */
  def collectStats(df: DataFrame): (Array[Double], Array[Double]) = {
    val rows = fitStats(df).orderBy("dim").collect()
    (rows.map(_.getDouble(1)), rows.map(_.getDouble(2)))
  }

  /** Map-only quantize: adds `qvec` (array<int> with int8 range).
    * Constant dimensions (mx == mn) map to 0. */
  def quantize(df: DataFrame, mins: Array[Double], maxes: Array[Double]): DataFrame = {
    val mnA = array(mins.map(lit(_)).toIndexedSeq: _*)
    val mxA = array(maxes.map(lit(_)).toIndexedSeq: _*)
    val q = transform(col(vecCol), (v, i) => {
      val mn = element_at(mnA, i + 1)
      val mx = element_at(mxA, i + 1)
      when(mx === mn, lit(0)).otherwise(
        greatest(lit(-128.0), least(lit(127.0),
          floor((v.cast("double") - mn) / (mx - mn) * 255.0 + 0.5) - 128.0))
          .cast("int"))
    })
    df.withColumn("qvec", q)
  }

  /** Map-only dequantize of `qvec` back to doubles (midpoint decode):
    * v̂ = (q + 128)/255 · (mx − mn) + mn. */
  def dequantize(qvec: Column, mins: Array[Double], maxes: Array[Double]): Column = {
    val mnA = array(mins.map(lit(_)).toIndexedSeq: _*)
    val mxA = array(maxes.map(lit(_)).toIndexedSeq: _*)
    transform(qvec, (q, i) => {
      val mn = element_at(mnA, i + 1)
      val mx = element_at(mxA, i + 1)
      (q.cast("double") + 128.0) / 255.0 * (mx - mn) + mn
    })
  }

  /** Fit + quantize + replace the vector column with its dequantized
    * reconstruction — the corpus [[BruteForceKnn]]/[[IvfIndex]] search
    * over int8-compressed storage. */
  def compressed(df: DataFrame): DataFrame = {
    val (mins, maxes) = collectStats(df)
    quantize(df, mins, maxes)
      .withColumn(vecCol, dequantize(col("qvec"), mins, maxes))
  }
}

/** ANN-recipe evaluation: recall@k of an approximate top-k against the
  * exact one — how nbits/nprobe tune before an index build over the
  * full corpus (the vector twin of the dedup-banding harness,
  * [[graft.operators.dedup.DedupEval]]). Both lists are (query, id,
  * rank) tables already bounded by k·|queries|; they meet in one
  * left-outer hash join and a per-query count — never the corpus. */
object AnnEval {

  /** Per query: (qid, n_exact, n_hit, recall 6dp). `exact` and
    * `approx` are top-k tables keyed (qidCol, idCol). */
  def recallAtK(exact: DataFrame, approx: DataFrame,
      qidCol: String = "qid", idCol: String = "cid"): DataFrame = {
    val hit = approx.select(col(qidCol), col(idCol))
      .withColumn("__hit", lit(1L))
    exact.select(col(qidCol), col(idCol))
      .join(hit, Seq(qidCol, idCol), "left_outer")
      .groupBy(qidCol)
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hit"))
      .withColumn("recall",
        round(col("n_hit") / col("n_exact"), 6))
  }
}
