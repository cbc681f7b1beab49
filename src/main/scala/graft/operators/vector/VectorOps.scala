package graft.operators.vector

import graft.functions.VecFns._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic pseudo-random hyperplanes derived from md5 — every
  * coefficient is a dyadic rational (24-bit int / 2^24 − 0.5), so any
  * engine that evaluates the same formula reproduces the plane bits
  * exactly. Used for engine-portable LSH signatures. */
object DeterministicPlanes {
  def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** coefficient for (plane i, dim d) in [-0.5, 0.5). */
  def coeff(i: Int, d: Int): Double =
    java.lang.Long.parseLong(md5Hex(s"${i}_$d").substring(0, 6), 16) / 16777216.0 - 0.5

  def plane(i: Int, dim: Int): Array[Double] =
    Array.tabulate(dim)(d => coeff(i, d))
}

/** Brute-force cosine top-k: the exactness baseline for similarity
  * search. Queries side is broadcast (it is the small side by
  * construction); ranking is deterministic — similarity rounded before
  * ranking, ties broken by corpus id. */
case class BruteForceKnn(
    k: Int = 5,
    idCol: String = "vec_id",
    vecCol: String = "embedding") {

  def topK(queries: DataFrame, corpus: DataFrame): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("cid"), col(vecCol).as("cv"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid").asc)
    c.join(broadcast(q), col("qid") =!= col("cid"))
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("qid", "cid", "cos", "rn")
  }
}

/** Random-hyperplane LSH bucketing (Charikar 2002): sign bits of the
  * dot product with `nbits` deterministic planes. Bucket key is an
  * equi-join key — ANN candidate generation is a hash-partitioned join,
  * never a cross join (SURVEY §5). */
case class LshAnn(
    dim: Int = 64,
    nbits: Int = 8,
    idCol: String = "vec_id",
    vecCol: String = "embedding") {

  def signature(v: Column): Column = {
    val bits = (0 until nbits).map { i =>
      val p = array(DeterministicPlanes.plane(i, dim).map(lit(_)).toIndexedSeq: _*)
      when(dot(v, p) >= 0.0, lit("1")).otherwise(lit("0"))
    }
    concat(bits: _*)
  }

  def withBuckets(df: DataFrame): DataFrame =
    df.withColumn("bucket", signature(col(vecCol)))

  /** Per-query top-k restricted to the query's bucket, exact rerank
    * inside. */
  def topK(df: DataFrame, k: Int, queryPred: Column): DataFrame = {
    val b = withBuckets(df)
    val q = b.filter(queryPred).select(col(idCol).as("qid"),
      col(vecCol).as("qv"), col("bucket"))
    val c = b.select(col(idCol).as("cid"), col(vecCol).as("cv"), col("bucket"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid").asc)
    c.join(q, Seq("bucket")).filter(col("qid") =!= col("cid"))
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("qid", "cid", "cos", "rn")
  }
}

/** IVF-style ANN and k-means assignment. The centroid table is always
  * broadcast (k ≪ n); assignment is an argmin over the broadcast side
  * with deterministic tiebreak, so no shuffle of the corpus at all.
  * Training path: [[KMeansOps.train]] (MLlib Lloyd's) or
  * [[KMeansOps.lloydStep]] (pure DataFrame iteration). */
case class IvfIndex(
    idCol: String = "vec_id",
    vecCol: String = "embedding") {

  /** Nearest-centroid assignment: (idCol, centroid_id, dist).
    *
    * Truly map-only: the centroid table collapses to ONE broadcast row
    * holding an array<struct(cid,cvec)>, and each corpus row folds an
    * argmin over it — no per-centroid row expansion, no window, zero
    * shuffle of the corpus. Distances are rounded to 6 dp before
    * comparison with a smaller-cid tiebreak, so the result is identical
    * to ranking by (dist, cid). */
  def assign(df: DataFrame, centroids: DataFrame,
      cidCol: String = "centroid_id", cvecCol: String = "cvec"): DataFrame = {
    val cents = centroids.agg(array_sort(collect_list(
      struct(col(cidCol).as("cid"), col(cvecCol).as("cvec")))).as("__cents"))
    def bestOf(c: Column): Column = struct(
      round(l2Dist(col(vecCol), c.getField("cvec")), 6).as("dist"),
      c.getField("cid").as("cid"))
    val folded = aggregate(
      slice(col("__cents"), lit(2), greatest(size(col("__cents")) - 1, lit(0))),
      bestOf(element_at(col("__cents"), 1)),
      (acc, c) => graft.functions.Cols.bind(bestOf(c)) { cand =>
        // struct comparison = lexicographic (dist, cid): min of the two
        when(cand < acc, cand).otherwise(acc)
      })
    df.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(cents))
      .select(col(idCol), folded.getField("cid").as(cidCol),
        folded.getField("dist").as("dist"))
  }

  /** Probe the `nprobe` nearest cells for each query, exact rerank
    * within those cells only. */
  def topK(df: DataFrame, centroids: DataFrame, k: Int, nprobe: Int,
      queryPred: Column): DataFrame = {
    // top-nprobe cells, map-only (mirrors [[assign]]'s shape): attach
    // the ONE collapsed centroid-array row, rank by sorting the tiny
    // per-row array of (dist, cid) structs, explode the first nprobe.
    // The previous formulation (crossJoin against centroid ROWS + a
    // row_number window) shuffled the query side and paid a whole
    // window stage for a k-element ranking; lexicographic struct sort
    // = orderBy(dist asc, cid asc) exactly, so results are identical.
    val cellsOf = { (in: DataFrame, n: Int) =>
      val cents = centroids.agg(array_sort(collect_list(
        struct(col("centroid_id").as("cid"), col("cvec")))).as("__cents"))
      in.select(col(idCol).as("__id"), col(vecCol).as("__v"))
        .crossJoin(broadcast(cents))
        .select(col("__id"), explode(slice(array_sort(transform(col("__cents"),
            c => struct(round(l2Dist(col("__v"), c.getField("cvec")), 6).as("dist"),
              c.getField("cid").as("cid")))), 1, n)).as("__cell"))
        .select(col("__id"), col("__cell").getField("cid").as("centroid_id"))
    }
    // corpus side (the big one) assigns map-only via [[assign]]; the
    // query side ranks map-only too — zero shuffles before the
    // candidate join
    val corpusCells = assign(df, centroids)
      .select(col(idCol).as("cid"), col("centroid_id"))
    val queryCells = cellsOf(df.filter(queryPred), nprobe)
      .select(col("__id").as("qid"), col("centroid_id"))
    val corpus = df.select(col(idCol).as("cid"), col(vecCol).as("cv"))
    val queries = df.filter(queryPred).select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid").asc)
    queryCells.join(corpusCells, Seq("centroid_id"))
      .filter(col("qid") =!= col("cid")).select("qid", "cid").distinct()
      .join(broadcast(queries), Seq("qid")).join(corpus, Seq("cid"))
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("qid", "cid", "cos", "rn")
  }
}

/** SemDeDup-style semantic deduplication (Abbas et al. 2023,
  * arXiv:2303.09540): assign every embedding to its nearest centroid,
  * then near-dedup WITHIN each cluster only. The cluster assignment
  * bounds the quadratic pair space exactly like an LSH bucket — but
  * with semantic locality, so paraphrase-level duplicates that share no
  * hyperplane band still land in the same candidate set. The
  * reference's LAION-5B lineage row (README:26) names CLIP-embedding
  * dedup as this family; the embedding-LSH twin is
  * [[graft.operators.dedup.EmbeddingNearDup]].
  *
  * Scale shape: assignment is the map-only [[IvfIndex.assign]] (one
  * broadcast centroid row, zero corpus shuffle); candidates come from a
  * hash equi-join on `centroid_id`; the drop set enters the corpus as a
  * LEFT ANTI join. Nothing is ever all-pairs. At 100 TB the per-cluster
  * pair count is held down by k (SemDeDup's own lever: k ~ 10⁵ at
  * web scale keeps clusters in the thousands); a skewed giant cluster
  * is an AQE skew-join case, not a plan change.
  *
  * The self-join repeats the assign subtree in the LOGICAL plan;
  * at runtime Spark's exchange reuse collapses the duplicates
  * (verified: 2 ReusedExchange nodes in the executed adaptive plan —
  * the 250k/1M probe walls in SURVEY §5.11 include this plan shape).
  * If the raw corpus scan ever dominates at extreme scale, persist the
  * assigned frame before [[kept]]; the operator itself stays pure.
  *
  * Keep rule: a row is dropped iff some SMALLER id in the SAME cluster
  * is within the cosine threshold (keep-first, matching the exact-dedup
  * family's min-id collapse). This is deterministic and one-pass where
  * the paper's variant (drop all but the member least similar to the
  * centroid of each ε-group) needs the group structure; the kept set
  * differs only inside multi-member ε-groups, the dedup RATE does not.
  * Cosine is rounded to 6 dp before the threshold compare so any
  * engine evaluating the same formula reproduces the drop set. */
case class SemanticDedup(
    threshold: Double = 0.35,
    idCol: String = "vec_id",
    vecCol: String = "embedding") {

  /** (idCol, centroid_id) rows that SURVIVE cluster-scoped keep-first
    * collapse. */
  def kept(df: DataFrame, centroids: DataFrame): DataFrame = {
    val assigned = IvfIndex(idCol, vecCol).assign(df, centroids)
      .select(col(idCol), col("centroid_id"))
    val withCluster = df.select(col(idCol), col(vecCol)).join(assigned, Seq(idCol))
    val a = withCluster.select(col("centroid_id"),
      col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = withCluster.select(col("centroid_id"),
      col(idCol).as("id_b"), col(vecCol).as("vb"))
    val drops = a.join(b, Seq("centroid_id"))
      .filter(col("id_a") < col("id_b") &&
        round(cosine(col("va"), col("vb")), 6) >= threshold)
      .select(col("id_b").as(idCol)).distinct()
    assigned.join(drops, Seq(idCol), "left_anti")
  }

  /** Pipeline form: train k centroids on the corpus itself (MLlib
    * Lloyd's — the production path; the oracle query uses deterministic
    * first-k centroids instead) and return the surviving rows with ALL
    * their columns via a semi join on the kept ids. */
  def dedup(df: DataFrame, k: Int = 64, seed: Long = 42L): DataFrame = {
    // k cannot exceed the corpus size (MLlib refuses more clusters than
    // points); a tiny corpus under the default k=64 should degrade to
    // per-point clusters, not throw. limit(k).count() IS min(k, n) and
    // stops after k rows — no full pass over the upstream pipeline in
    // the common n ≫ k case.
    val kEff = math.max(1L, df.limit(k).count()).toInt
    val cents = KMeansOps.train(df, kEff, seed, vecCol)
    df.join(kept(df, cents).select(idCol), Seq(idCol), "left_semi")
  }
}

/** K-means: MLlib train path + a pure-DataFrame Lloyd iteration for
  * environments where the model must stay a DataFrame (reference:
  * models/kmeans). */
object KMeansOps {
  import org.apache.spark.ml.clustering.KMeans
  import org.apache.spark.ml.functions.array_to_vector
  import org.apache.spark.sql.SparkSession

  /** Train MLlib k-means on an array<float> column; returns centroids
    * as (centroid_id, cvec array<double>). */
  def train(df: DataFrame, k: Int, seed: Long = 42L,
      vecCol: String = "embedding"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val feats = df.select(array_to_vector(
      transform(col(vecCol), x => x.cast("double"))).as("features"))
    val model = new KMeans().setK(k).setSeed(seed).setFeaturesCol("features").fit(feats)
    model.clusterCenters.zipWithIndex
      .map { case (v, i) => (i, v.toArray) }.toSeq
      .toDF("centroid_id", "cvec")
  }

  /** One Lloyd step expressed as DataFrame ops: assign + recompute
    * means. Demonstrates the scale shape (posexplode + groupBy —
    * map-side combine on (cluster, dim)). */
  def lloydStep(df: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val assigned = IvfIndex(idCol, vecCol).assign(df, centroids)
    assigned.join(df.select(col(idCol), col(vecCol)), Seq(idCol))
      .select(col("centroid_id"), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy("centroid_id", "pos").agg(avg("x").as("m"))
      .groupBy("centroid_id").agg(array_sort(collect_list(struct(col("pos"), col("m"))))
        .as("pairs"))
      .select(col("centroid_id"), transform(col("pairs"), p => p.getField("m")).as("cvec"))
  }
}
