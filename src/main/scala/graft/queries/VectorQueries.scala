package graft.queries

import graft.Tables
import graft.operators.dedup.EmbeddingNearDup
import graft.operators.vector._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity-search / vector correctness queries over `embeddings`.
  * LSH planes are md5-derived dyadic rationals (DeterministicPlanes) so
  * the oracle rebuilds bit-identical planes in SQL. */
object VectorQueries {

  private val dim = 64

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_bruteforce" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      BruteForceKnn(k = 5).topK(emb.filter(col("vec_id") < 16), emb)
    }),

    // margin-based bitext mining (Artetxe & Schwenk 2019 — the
    // CCMatrix/NLLB recipe): even-id vectors = side X, odd-id = side Y,
    // k=4 neighborhoods, mutual-best pairs with ratio-margin ≥ 1.0 —
    // cosine relative to local density, so hub vectors can't over-mine
    "bitext_margin_mining" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      graft.operators.vector.MarginBitextMiner(k = 4, threshold = 1.0)
        .mine(emb.filter(col("vec_id") % 2 === 0),
          emb.filter(col("vec_id") % 2 === 1))
    }),

    // int8 scalar quantization (FAISS SQ8): per-dim min/max fit, then
    // map-only encode; exploded to scalars for the oracle hash
    "embedding_quantize_int8" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val vq = VectorQuantizer()
      val (mins, maxes) = vq.collectStats(emb)
      vq.quantize(emb, mins, maxes)
        .select(col("vec_id"), posexplode(col("qvec")).as(Seq("dim", "q")))
    }),

    // the compressed-index search path: same brute-force top-k but over
    // int8-dequantized vectors (what a 100 TB corpus actually keeps in
    // executor memory; exact float rerank happens on survivors only)
    "knn_int8" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val c = VectorQuantizer().compressed(emb)
      BruteForceKnn(k = 5).topK(c.filter(col("vec_id") < 16), c)
    }),

    "ann_lsh" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      LshAnn(dim, nbits = 8).topK(emb, k = 3, col("vec_id") < 16)
    }),

    // recall@3 of the LSH index against exact brute force — the
    // nbits-tuning harness (the ANN twin of dedup_eval_minhash)
    "ann_eval_recall" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      AnnEval.recallAtK(
        BruteForceKnn(k = 3).topK(emb.filter(col("vec_id") < 16), emb),
        LshAnn(dim, nbits = 8).topK(emb, k = 3, col("vec_id") < 16))
    }),

    "ann_ivf" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("centroid_id"),
          transform(col("embedding"), x => x.cast("double")).as("cvec"))
      IvfIndex().topK(emb, centroids, k = 3, nprobe = 2, col("vec_id") < 8)
    }),

    "ann_ivf_indexed" -> ((s, dir) => {
      // the persisted-index twin of ann_ivf (same oracle — results must
      // be identical): buildIndex pays the corpus argmin once into
      // bucketed catalog tables, searchIndexed serves the batch from
      // the probed cells' buckets only
      val emb = Tables.load(s, dir, "embeddings")
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("centroid_id"),
          transform(col("embedding"), x => x.cast("double")).as("cvec"))
      val ivf = IvfIndex()
      ivf.buildIndex(emb, centroids, "graft_ivf_idx")
      ivf.searchIndexed(s, "graft_ivf_idx",
        emb.filter(col("vec_id") < 8), k = 3, nprobe = 2)
    }),

    "ann_ivf_refreshed" -> ((s, dir) => {
      // incremental-ingest twin: build on the even half, roll forward
      // with the odd half, serve — results must equal a full build
      // (same oracle as ann_ivf_indexed)
      val emb = Tables.load(s, dir, "embeddings")
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("centroid_id"),
          transform(col("embedding"), x => x.cast("double")).as("cvec"))
      val ivf = IvfIndex()
      ivf.buildIndex(emb.filter(col("vec_id") % 2 === 0), centroids,
        "graft_ivf_r0")
      ivf.refreshIndex(emb.filter(col("vec_id") % 2 =!= 0),
        "graft_ivf_r0", "graft_ivf_r1")
      ivf.searchIndexed(s, "graft_ivf_r1",
        emb.filter(col("vec_id") < 8), k = 3, nprobe = 2)
    }),

    "ann_ivf_compacted" -> ((s, dir) => {
      // the segment-fold path: build on the even half, roll forward
      // with the odd half (two segments), COMPACT to one segment, then
      // serve — results must still equal a full build (same oracle as
      // ann_ivf_indexed: one oracle, four execution strategies)
      val emb = Tables.load(s, dir, "embeddings")
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("centroid_id"),
          transform(col("embedding"), x => x.cast("double")).as("cvec"))
      val ivf = IvfIndex()
      ivf.buildIndex(emb.filter(col("vec_id") % 2 === 0), centroids,
        "graft_ivf_w0")
      ivf.refreshIndex(emb.filter(col("vec_id") % 2 =!= 0),
        "graft_ivf_w0", "graft_ivf_w1")
      ivf.compactIndex(s, "graft_ivf_w1", "graft_ivf_wz")
      ivf.searchIndexed(s, "graft_ivf_wz",
        emb.filter(col("vec_id") < 8), k = 3, nprobe = 2)
    }),

    "ann_ivf_int8" -> ((s, dir) => {
      // the QUANTIZED-segment strategy (B50 × B8): cells stored as int8
      // codes, probed-cell scan on dequantized codes cuts each query to
      // k·refine survivors, exact float rerank off the cold bucketed
      // vecs store — same oracle as ann_ivf (one oracle, FIVE execution
      // strategies), so the refine window provably covers the
      // quantization error on this corpus
      val emb = Tables.load(s, dir, "embeddings")
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("centroid_id"),
          transform(col("embedding"), x => x.cast("double")).as("cvec"))
      val ivf = IvfIndex()
      ivf.buildIndexInt8(emb, centroids, "graft_ivf_q8")
      ivf.searchIndexedInt8(s, "graft_ivf_q8",
        emb.filter(col("vec_id") < 8), k = 3, nprobe = 2)
    }),

    "ann_ivf_staleness" -> ((s, dir) => {
      // the roll-forward drift monitor: per cell, build-time vs
      // refreshed row counts, growth, and each group's mean cosine to
      // its (frozen) centroid — the report behind the rebuild trigger
      val emb = Tables.load(s, dir, "embeddings")
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("centroid_id"),
          transform(col("embedding"), x => x.cast("double")).as("cvec"))
      val ivf = IvfIndex()
      ivf.buildIndex(emb.filter(col("vec_id") % 2 === 0), centroids,
        "graft_ivf_sr0")
      ivf.refreshIndex(emb.filter(col("vec_id") % 2 =!= 0),
        "graft_ivf_sr0", "graft_ivf_sr1")
      ivf.stalenessReport(s, "graft_ivf_sr1")
    }),

    "hard_negatives" -> ((s, dir) => {
      // contrastive-training negative mining: per anchor the 2 most
      // similar in-band (< 0.95, so near-dups never become negatives)
      // rows from its 2 probed IVF cells
      val emb = Tables.load(s, dir, "embeddings")
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("centroid_id"),
          transform(col("embedding"), x => x.cast("double")).as("cvec"))
      HardNegativeMiner(lo = 0.0, hi = 0.95, k = 2)
        .mine(emb, centroids, nprobe = 2, anchorPred = col("vec_id") < 200)
    }),

    "kmeans_assign" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("centroid_id"),
          transform(col("embedding"), x => x.cast("double")).as("cvec"))
      IvfIndex().assign(emb, centroids)
    }),

    "dedup_semantic_inc" -> ((s, dir) => {
      // delta-ingest SemDeDup: the 40% batch deduped against the
      // persisted index of the first 60% (same split convention as
      // dedup_incremental), stream-order keep-first.
      val emb = Tables.load(s, dir, "embeddings")
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("centroid_id"),
          transform(col("embedding"), x => x.cast("double")).as("cvec"))
      val inc = IncrementalSemanticDedup(threshold = 0.35)
      val index = inc.indexRows(emb.filter(col("vec_id") % 5 < 3), centroids)
      inc.survivors(index, emb.filter(col("vec_id") % 5 >= 3), centroids)
        .select("vec_id")
    }),

    "kmeans_lloyd_assign" -> ((s, dir) => {
      // the CONVERGENCE-loop path (KMeansOps.fit): two deterministic
      // Lloyd iterations from the salted-md5 spread init, then
      // assignment. tol=0 pins the iteration count so the SQL oracle
      // can replay the identical trajectory (init draw, round-6 means,
      // id tiebreaks).
      val emb = Tables.load(s, dir, "embeddings")
      val cents = KMeansOps.fit(emb, k = 4, tol = 0.0, maxIter = 2)
      IvfIndex().assign(emb, cents)
    }),

    "dedup_embedding" -> ((s, dir) => {
      // Scale path: LSH bucket join (no nested loop). exactPairs is the
      // spec-only exactness baseline (DedupSpec).
      val emb = Tables.load(s, dir, "embeddings").filter(col("vec_id") < 300)
      EmbeddingNearDup(threshold = 0.35).lshPairs(emb)
    }),

    "dedup_semantic" -> ((s, dir) => {
      // SemDeDup: cluster-scoped near-dedup — candidates bounded by the
      // nearest-centroid assignment instead of hyperplane bands.
      // Centroids are the first 8 embeddings (deterministic, so the
      // oracle reproduces the assignment; kmeans_assign uses the same
      // convention — MLlib-trained centroids are the production path).
      // threshold=0.35, NOT the operator/registry default 0.95: the
      // synthetic corpus's independent hash-vectors cluster around
      // cosine ≈ 0.3–0.5, so 0.95 would drop nothing and the oracle
      // would only prove the identity; 0.35 exercises real drops.
      val emb = Tables.load(s, dir, "embeddings")
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("centroid_id"),
          transform(col("embedding"), x => x.cast("double")).as("cvec"))
      SemanticDedup(threshold = 0.35).kept(emb, centroids)
    }),

    // D4 (SemDeDup → prototype pruning): semantic near-dups collapse
    // first, then each cluster drops its most-prototypical 40% — the
    // redundant "template" mass nearest the centroid. keepFrac 0.6 and
    // threshold 0.35 for the same corpus-geometry reason dedup_semantic
    // documents (hash-vectors cluster around cosine 0.3-0.5)
    "semantic_prune_d4" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("centroid_id"),
          transform(col("embedding"), x => x.cast("double")).as("cvec"))
      val survivors = emb.join(
        SemanticDedup(threshold = 0.35).kept(emb, centroids).select("vec_id"),
        Seq("vec_id"), "left_semi")
      PrototypePruner(keepFrac = 0.6)(survivors, centroids)
    }),

    "decontaminate_semantic" -> ((s, dir) => {
      // embedding-space decontamination: benchmark = first 20 vectors
      // (deterministic eval-suite stand-in), corpus = the rest; 0.35
      // for the same reason dedup_semantic uses it (the hash-derived
      // corpus clusters around cosine 0.3-0.5, so the production-ish
      // 0.95 would flag nothing and prove only the identity)
      val emb = Tables.load(s, dir, "embeddings")
      val bench = emb.filter(col("vec_id") < 20)
      val corpus = emb.filter(col("vec_id") >= 20)
      SemanticDecontaminator(threshold = 0.35)
        .flag(corpus, bench)
        .select("vec_id", "is_contaminated")
    })
  )

  /** DuckDB literal for plane i (same dyadic rationals as the Scala
    * side). */
  private def planeSql(i: Int): String =
    DeterministicPlanes.plane(i, dim)
      .map(v => f"$v%.17g").mkString("[", ", ", "]::DOUBLE[]")

  private val cosSql =
    "round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6)"

  private lazy val annIvfSql: String =
    s"""WITH cent AS (
           |  SELECT CAST(vec_id AS INT) AS centroid_id, CAST(embedding AS DOUBLE[]) AS cvec
           |  FROM embeddings WHERE vec_id < 8),
           |corpus_cells AS (
           |  SELECT cid, centroid_id FROM (
           |    SELECT v.vec_id AS cid, cent.centroid_id,
           |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
           |        round(list_distance(CAST(v.embedding AS DOUBLE[]), cent.cvec), 6) ASC,
           |        cent.centroid_id ASC) AS rn
           |    FROM embeddings v, cent) t WHERE rn = 1),
           |query_cells AS (
           |  SELECT qid, centroid_id FROM (
           |    SELECT v.vec_id AS qid, cent.centroid_id,
           |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
           |        round(list_distance(CAST(v.embedding AS DOUBLE[]), cent.cvec), 6) ASC,
           |        cent.centroid_id ASC) AS rn
           |    FROM embeddings v, cent WHERE v.vec_id < 8) t WHERE rn <= 2),
           |cand AS (
           |  SELECT DISTINCT q.qid, c.cid FROM query_cells q
           |  JOIN corpus_cells c ON q.centroid_id = c.centroid_id
           |  WHERE q.qid != c.cid),
           |scored AS (
           |  SELECT cand.qid, cand.cid, $cosSql AS cos
           |  FROM cand JOIN embeddings q ON cand.qid = q.vec_id
           |            JOIN embeddings c ON cand.cid = c.vec_id),
           |r AS (SELECT qid, cid, cos,
           |  CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS INT) AS rn
           |  FROM scored)
           |SELECT qid, cid, cos, rn FROM r WHERE rn <= 3""".stripMargin

  def oracles: Map[String, String] = Map(
    "bitext_margin_mining" ->
      s"""WITH x AS (SELECT * FROM embeddings WHERE vec_id % 2 = 0),
         |y AS (SELECT * FROM embeddings WHERE vec_id % 2 = 1),
         |sims AS (
         |  SELECT q.vec_id AS x_id, c.vec_id AS y_id, $cosSql AS cos
         |  FROM x q, y c),
         |fwd AS (SELECT x_id, y_id, cos FROM (
         |  SELECT x_id, y_id, cos,
         |    row_number() OVER (PARTITION BY x_id ORDER BY cos DESC, y_id ASC) AS rn
         |  FROM sims) WHERE rn <= 4),
         |bwd AS (SELECT x_id, y_id, cos FROM (
         |  SELECT x_id, y_id, cos,
         |    row_number() OVER (PARTITION BY y_id ORDER BY cos DESC, x_id ASC) AS rn
         |  FROM sims) WHERE rn <= 4),
         |ax AS (SELECT x_id, avg(cos) AS ax FROM fwd GROUP BY x_id),
         |ay AS (SELECT y_id, avg(cos) AS ay FROM bwd GROUP BY y_id),
         |cand AS (SELECT DISTINCT x_id, y_id, cos FROM
         |  (SELECT * FROM fwd UNION ALL SELECT * FROM bwd)),
         |m AS (
         |  SELECT cand.x_id, cand.y_id, cand.cos,
         |    round(cand.cos / ((ax.ax + ay.ay) / 2.0), 6) AS margin
         |  FROM cand JOIN ax USING (x_id) JOIN ay USING (y_id)),
         |rx AS (SELECT x_id, y_id, cos, margin,
         |  row_number() OVER (PARTITION BY x_id ORDER BY margin DESC, y_id ASC) AS r1
         |  FROM m),
         |ry AS (SELECT x_id, y_id FROM (
         |  SELECT x_id, y_id,
         |    row_number() OVER (PARTITION BY y_id ORDER BY margin DESC, x_id ASC) AS r2
         |  FROM m) WHERE r2 = 1)
         |SELECT rx.x_id, rx.y_id, rx.cos, rx.margin
         |FROM rx JOIN ry ON rx.x_id = ry.x_id AND rx.y_id = ry.y_id
         |WHERE rx.r1 = 1 AND rx.margin >= 1.0""".stripMargin,

    "knn_bruteforce" ->
      s"""WITH sims AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS cid, $cosSql AS cos
         |  FROM embeddings q, embeddings c
         |  WHERE q.vec_id < 16 AND q.vec_id != c.vec_id),
         |r AS (SELECT qid, cid, cos,
         |  CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS INT) AS rn
         |  FROM sims)
         |SELECT qid, cid, cos, rn FROM r WHERE rn <= 5""".stripMargin,

    "ann_eval_recall" -> {
      val sig = (0 until 8).map(i =>
        s"CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), ${planeSql(i)}) >= 0.0 THEN '1' ELSE '0' END")
        .mkString(" || ")
      s"""WITH sims AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS cid, $cosSql AS cos
         |  FROM embeddings q, embeddings c
         |  WHERE q.vec_id < 16 AND q.vec_id != c.vec_id),
         |exact AS (
         |  SELECT qid, cid FROM (
         |    SELECT qid, cid,
         |      row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS rn
         |    FROM sims) t WHERE rn <= 3),
         |b AS (SELECT vec_id, embedding, $sig AS bucket FROM embeddings),
         |lsims AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS cid, $cosSql AS cos
         |  FROM b q JOIN b c ON q.bucket = c.bucket
         |  WHERE q.vec_id < 16 AND q.vec_id != c.vec_id),
         |approx AS (
         |  SELECT qid, cid FROM (
         |    SELECT qid, cid,
         |      row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS rn
         |    FROM lsims) t WHERE rn <= 3)
         |SELECT e.qid, count(*) AS n_exact,
         |  CAST(sum(CASE WHEN a.cid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_hit,
         |  round(CAST(sum(CASE WHEN a.cid IS NOT NULL THEN 1 ELSE 0 END)
         |    AS DOUBLE) / count(*), 6) AS recall
         |FROM exact e LEFT JOIN approx a ON e.qid = a.qid AND e.cid = a.cid
         |GROUP BY 1""".stripMargin
    },

    "embedding_quantize_int8" ->
      s"""WITH e AS (
         |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         |    unnest(range(len(embedding))) AS dim
         |  FROM embeddings),
         |s AS (SELECT dim, min(v) AS mn, max(v) AS mx FROM e GROUP BY 1)
         |SELECT e.vec_id, CAST(e.dim AS INT) AS dim,
         |  CAST(CASE WHEN mx = mn THEN 0
         |    ELSE greatest(-128.0, least(127.0,
         |      floor((v - mn) / (mx - mn) * 255.0 + 0.5) - 128.0))
         |  END AS INT) AS q
         |FROM e JOIN s USING (dim)""".stripMargin,

    "knn_int8" ->
      s"""WITH e AS (
         |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         |    unnest(range(len(embedding))) AS dim
         |  FROM embeddings),
         |s AS (SELECT dim, min(v) AS mn, max(v) AS mx FROM e GROUP BY 1),
         |d AS (
         |  SELECT e.vec_id, e.dim,
         |    (CAST(CASE WHEN mx = mn THEN 0
         |      ELSE greatest(-128.0, least(127.0,
         |        floor((v - mn) / (mx - mn) * 255.0 + 0.5) - 128.0))
         |     END AS INT) + 128.0) / 255.0 * (mx - mn) + mn AS dv
         |  FROM e JOIN s USING (dim)),
         |dq AS (SELECT vec_id, list(dv ORDER BY dim) AS embedding FROM d GROUP BY 1),
         |sims AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS cid,
         |    round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
         |      CAST(c.embedding AS DOUBLE[])), 6) AS cos
         |  FROM dq q, dq c
         |  WHERE q.vec_id < 16 AND q.vec_id != c.vec_id),
         |r AS (SELECT qid, cid, cos,
         |  CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS INT) AS rn
         |  FROM sims)
         |SELECT qid, cid, cos, rn FROM r WHERE rn <= 5""".stripMargin,

    "ann_lsh" -> {
      val sig = (0 until 8).map(i =>
        s"CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), ${planeSql(i)}) >= 0.0 THEN '1' ELSE '0' END")
        .mkString(" || ")
      s"""WITH b AS (SELECT vec_id, embedding, $sig AS bucket FROM embeddings),
         |joined AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS cid, $cosSql AS cos
         |  FROM b q JOIN b c ON q.bucket = c.bucket
         |  WHERE q.vec_id < 16 AND q.vec_id != c.vec_id),
         |r AS (SELECT qid, cid, cos,
         |  CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS INT) AS rn
         |  FROM joined)
         |SELECT qid, cid, cos, rn FROM r WHERE rn <= 3""".stripMargin
    },

    "hard_negatives" ->
      s"""WITH cent AS (
         |  SELECT CAST(vec_id AS INT) AS centroid_id, CAST(embedding AS DOUBLE[]) AS cvec
         |  FROM embeddings WHERE vec_id < 8),
         |corpus_cells AS (
         |  SELECT cid, centroid_id FROM (
         |    SELECT v.vec_id AS cid, cent.centroid_id,
         |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |        round(list_distance(CAST(v.embedding AS DOUBLE[]), cent.cvec), 6) ASC,
         |        cent.centroid_id ASC) AS rn
         |    FROM embeddings v, cent) t WHERE rn = 1),
         |query_cells AS (
         |  SELECT qid, centroid_id FROM (
         |    SELECT v.vec_id AS qid, cent.centroid_id,
         |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |        round(list_distance(CAST(v.embedding AS DOUBLE[]), cent.cvec), 6) ASC,
         |        cent.centroid_id ASC) AS rn
         |    FROM embeddings v, cent WHERE v.vec_id < 200) t WHERE rn <= 2),
         |cand AS (
         |  SELECT DISTINCT q.qid, c.cid FROM query_cells q
         |  JOIN corpus_cells c ON q.centroid_id = c.centroid_id
         |  WHERE q.qid != c.cid),
         |scored AS (
         |  SELECT cand.qid, cand.cid, $cosSql AS cos
         |  FROM cand JOIN embeddings q ON cand.qid = q.vec_id
         |            JOIN embeddings c ON cand.cid = c.vec_id),
         |banded AS (SELECT qid, cid, cos FROM scored WHERE cos >= 0.0 AND cos < 0.95),
         |r AS (SELECT qid AS anchor_id, cid AS negative_id, cos,
         |  CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS INT) AS rnk
         |  FROM banded)
         |SELECT anchor_id, negative_id, cos, rnk FROM r WHERE rnk <= 2""".stripMargin,

    // the indexed/refreshed/compacted serve paths must return
    // BYTE-IDENTICAL rankings to the direct ann_ivf plan — ONE oracle,
    // four execution strategies (direct / persisted / rolled-forward /
    // segment-folded)
    "ann_ivf" -> annIvfSql,
    "ann_ivf_indexed" -> annIvfSql,
    "ann_ivf_refreshed" -> annIvfSql,
    "ann_ivf_compacted" -> annIvfSql,
    "ann_ivf_int8" -> annIvfSql,

    // the staleness report replays exactly: assignment is the same
    // rounded-distance argmin, build = even ids, refreshed = odd
    "ann_ivf_staleness" ->
      s"""WITH cent AS (
         |  SELECT CAST(vec_id AS INT) AS centroid_id, CAST(embedding AS DOUBLE[]) AS cvec
         |  FROM embeddings WHERE vec_id < 8),
         |cells AS (
         |  SELECT vec_id, centroid_id, cvec, embedding,
         |    (vec_id % 2 = 0) AS is_build FROM (
         |    SELECT v.vec_id, c.centroid_id, c.cvec, v.embedding,
         |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |        round(list_distance(CAST(v.embedding AS DOUBLE[]), c.cvec), 6) ASC,
         |        c.centroid_id ASC) AS rn
         |    FROM embeddings v, cent c) t WHERE rn = 1)
         |SELECT centroid_id,
         |  CAST(sum(CASE WHEN is_build THEN 1 ELSE 0 END) AS BIGINT) AS n_build,
         |  CAST(sum(CASE WHEN is_build THEN 0 ELSE 1 END) AS BIGINT) AS n_refreshed,
         |  round(CAST(sum(CASE WHEN is_build THEN 0 ELSE 1 END) AS DOUBLE) /
         |    greatest(CAST(sum(CASE WHEN is_build THEN 1 ELSE 0 END) AS DOUBLE), 1.0), 4)
         |    AS growth,
         |  round(avg(CASE WHEN is_build THEN
         |    round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), cvec), 6) END), 4)
         |    AS mean_cos_build,
         |  round(avg(CASE WHEN NOT is_build THEN
         |    round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), cvec), 6) END), 4)
         |    AS mean_cos_refreshed
         |FROM cells GROUP BY 1""".stripMargin,


    "dedup_semantic_inc" ->
      """WITH cent AS (
        |  SELECT CAST(vec_id AS INT) AS cid, CAST(embedding AS DOUBLE[]) AS cvec
        |  FROM embeddings WHERE vec_id < 8),
        |a AS (
        |  SELECT vec_id, cid AS centroid_id, embedding FROM (
        |    SELECT v.vec_id, c.cid, v.embedding,
        |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
        |        round(list_distance(CAST(v.embedding AS DOUBLE[]), c.cvec), 6) ASC,
        |        c.cid ASC) AS rn
        |    FROM embeddings v, cent c) t WHERE rn = 1),
        |old AS (SELECT * FROM a WHERE vec_id % 5 < 3),
        |new AS (SELECT * FROM a WHERE vec_id % 5 >= 3),
        |rej AS (
        |  SELECT DISTINCT n.vec_id FROM new n JOIN old o
        |    ON n.centroid_id = o.centroid_id
        |    AND round(list_cosine_similarity(CAST(n.embedding AS DOUBLE[]),
        |          CAST(o.embedding AS DOUBLE[])), 6) >= 0.35
        |  UNION
        |  SELECT DISTINCT b.vec_id FROM new x JOIN new b
        |    ON x.centroid_id = b.centroid_id AND x.vec_id < b.vec_id
        |    AND round(list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
        |          CAST(b.embedding AS DOUBLE[])), 6) >= 0.35)
        |SELECT vec_id FROM new
        |WHERE vec_id NOT IN (SELECT vec_id FROM rej)""".stripMargin,

    "kmeans_lloyd_assign" ->
      """WITH c0 AS (
        |  SELECT CAST(rn - 1 AS INT) AS cid, cvec FROM (
        |    SELECT row_number() OVER (ORDER BY
        |        md5(CAST(vec_id AS VARCHAR) || ':kmeans_init'), vec_id) AS rn,
        |      CAST(embedding AS DOUBLE[]) AS cvec
        |    FROM embeddings) t WHERE rn <= 4),
        |a1 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT v.vec_id, c.cid,
        |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
        |        round(list_distance(CAST(v.embedding AS DOUBLE[]), c.cvec), 6) ASC,
        |        c.cid ASC) AS rn
        |    FROM embeddings v, c0 c) t WHERE rn = 1),
        |m1 AS (
        |  SELECT cid, pos, round(avg(x), 6) AS m FROM (
        |    SELECT a1.cid, unnest(CAST(v.embedding AS DOUBLE[])) AS x,
        |           unnest(range(1, len(v.embedding) + 1)) AS pos
        |    FROM a1 JOIN embeddings v ON a1.vec_id = v.vec_id) GROUP BY 1, 2),
        |c1 AS (
        |  SELECT c0.cid, coalesce(m.cvec, c0.cvec) AS cvec
        |  FROM c0 LEFT JOIN (
        |    SELECT cid, list(m ORDER BY pos) AS cvec FROM m1 GROUP BY cid) m
        |    ON c0.cid = m.cid),
        |a2 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT v.vec_id, c.cid,
        |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
        |        round(list_distance(CAST(v.embedding AS DOUBLE[]), c.cvec), 6) ASC,
        |        c.cid ASC) AS rn
        |    FROM embeddings v, c1 c) t WHERE rn = 1),
        |m2 AS (
        |  SELECT cid, pos, round(avg(x), 6) AS m FROM (
        |    SELECT a2.cid, unnest(CAST(v.embedding AS DOUBLE[])) AS x,
        |           unnest(range(1, len(v.embedding) + 1)) AS pos
        |    FROM a2 JOIN embeddings v ON a2.vec_id = v.vec_id) GROUP BY 1, 2),
        |c2 AS (
        |  SELECT c1.cid, coalesce(m.cvec, c1.cvec) AS cvec
        |  FROM c1 LEFT JOIN (
        |    SELECT cid, list(m ORDER BY pos) AS cvec FROM m2 GROUP BY cid) m
        |    ON c1.cid = m.cid)
        |SELECT vec_id, centroid_id, dist FROM (
        |  SELECT v.vec_id, c.cid AS centroid_id,
        |    round(list_distance(CAST(v.embedding AS DOUBLE[]), c.cvec), 6) AS dist,
        |    row_number() OVER (PARTITION BY v.vec_id ORDER BY
        |      round(list_distance(CAST(v.embedding AS DOUBLE[]), c.cvec), 6) ASC,
        |      c.cid ASC) AS rn
        |  FROM embeddings v, c2 c) t WHERE rn = 1""".stripMargin,

    "kmeans_assign" ->
      """WITH cent AS (
        |  SELECT CAST(vec_id AS INT) AS centroid_id, CAST(embedding AS DOUBLE[]) AS cvec
        |  FROM embeddings WHERE vec_id < 8),
        |d AS (
        |  SELECT v.vec_id, cent.centroid_id,
        |    round(list_distance(CAST(v.embedding AS DOUBLE[]), cent.cvec), 6) AS dist,
        |    row_number() OVER (PARTITION BY v.vec_id ORDER BY
        |      round(list_distance(CAST(v.embedding AS DOUBLE[]), cent.cvec), 6) ASC,
        |      cent.centroid_id ASC) AS rn
        |  FROM embeddings v, cent)
        |SELECT vec_id, centroid_id, dist FROM d WHERE rn = 1""".stripMargin,

    "dedup_embedding" -> {
      // 8 bands × 4 sign bits = 32 deterministic planes; identical band
      // slicing to EmbeddingNearDup.lshPairs.
      val sig = (0 until 32).map(i =>
        s"CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), ${planeSql(i)}) >= 0.0 THEN '1' ELSE '0' END")
        .mkString(" || ")
      s"""WITH b AS (
         |  SELECT vec_id, embedding, $sig AS sig
         |  FROM embeddings WHERE vec_id < 300),
         |banded AS (
         |  SELECT vec_id, band, substring(sig, band * 4 + 1, 4) AS digest
         |  FROM b, (SELECT unnest(range(8)) AS band)),
         |cand AS (
         |  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
         |  FROM banded x JOIN banded y ON x.band = y.band AND x.digest = y.digest
         |  WHERE x.vec_id < y.vec_id),
         |p AS (
         |  SELECT cand.id_a, cand.id_b, $cosSql AS cos
         |  FROM cand JOIN b q ON cand.id_a = q.vec_id
         |            JOIN b c ON cand.id_b = c.vec_id)
         |SELECT id_a, id_b, cos FROM p WHERE cos >= 0.35""".stripMargin
    },

    "dedup_semantic" ->
      """WITH cent AS (
        |  SELECT CAST(vec_id AS INT) AS centroid_id, CAST(embedding AS DOUBLE[]) AS cvec
        |  FROM embeddings WHERE vec_id < 8),
        |d AS (
        |  SELECT v.vec_id, cent.centroid_id, v.embedding,
        |    row_number() OVER (PARTITION BY v.vec_id ORDER BY
        |      round(list_distance(CAST(v.embedding AS DOUBLE[]), cent.cvec), 6) ASC,
        |      cent.centroid_id ASC) AS rn
        |  FROM embeddings v, cent),
        |asg AS (SELECT vec_id, centroid_id, embedding FROM d WHERE rn = 1),
        |drops AS (
        |  SELECT DISTINCT y.vec_id
        |  FROM asg x JOIN asg y ON x.centroid_id = y.centroid_id
        |  WHERE x.vec_id < y.vec_id
        |    AND round(list_cosine_similarity(
        |      CAST(x.embedding AS DOUBLE[]), CAST(y.embedding AS DOUBLE[])), 6) >= 0.35)
        |SELECT a.vec_id, a.centroid_id FROM asg a
        |WHERE a.vec_id NOT IN (SELECT vec_id FROM drops)""".stripMargin,

    "semantic_prune_d4" ->
      """WITH cent AS (
        |  SELECT CAST(vec_id AS INT) AS centroid_id, CAST(embedding AS DOUBLE[]) AS cvec
        |  FROM embeddings WHERE vec_id < 8),
        |d AS (
        |  SELECT v.vec_id, cent.centroid_id, v.embedding,
        |    row_number() OVER (PARTITION BY v.vec_id ORDER BY
        |      round(list_distance(CAST(v.embedding AS DOUBLE[]), cent.cvec), 6) ASC,
        |      cent.centroid_id ASC) AS rn
        |  FROM embeddings v, cent),
        |asg AS (SELECT vec_id, centroid_id, embedding FROM d WHERE rn = 1),
        |drops AS (
        |  SELECT DISTINCT y.vec_id
        |  FROM asg x JOIN asg y ON x.centroid_id = y.centroid_id
        |  WHERE x.vec_id < y.vec_id
        |    AND round(list_cosine_similarity(
        |      CAST(x.embedding AS DOUBLE[]), CAST(y.embedding AS DOUBLE[])), 6) >= 0.35),
        |surv AS (
        |  SELECT a.vec_id, a.centroid_id, a.embedding FROM asg a
        |  WHERE a.vec_id NOT IN (SELECT vec_id FROM drops)),
        |sc AS (
        |  SELECT s.vec_id, s.centroid_id,
        |    round(list_cosine_similarity(CAST(s.embedding AS DOUBLE[]), c.cvec), 6)
        |      AS proto
        |  FROM surv s JOIN cent c ON s.centroid_id = c.centroid_id),
        |r AS (
        |  SELECT vec_id, centroid_id, proto,
        |    row_number() OVER (PARTITION BY centroid_id
        |      ORDER BY proto ASC, vec_id ASC) AS rn,
        |    count(*) OVER (PARTITION BY centroid_id) AS n
        |  FROM sc)
        |SELECT vec_id, centroid_id, proto FROM r
        |WHERE rn <= ceil(n * 0.6)""".stripMargin,

    "decontaminate_semantic" ->
      """SELECT c.vec_id,
        |  EXISTS(SELECT 1 FROM embeddings b WHERE b.vec_id < 20
        |    AND round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
        |          CAST(b.embedding AS DOUBLE[])), 6) >= 0.35)
        |    AS is_contaminated
        |FROM embeddings c WHERE c.vec_id >= 20""".stripMargin
  )
}
