package graft.queries

import graft.Tables
import graft.operators.dedup.{ConnectedComponents, DedupEval, IncrementalMinHashDedup, MinHashLSH, NgramJaccard, SimHash}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-dup dedup queries whose oracles are generated from the same
  * operator parameters (numHashes/bands/shingle size), so Spark and
  * DuckDB compute the identical md5-keyed signatures. */
object DedupQueries {

  private[queries] val mh = MinHashLSH(numHashes = 12, bands = 4, shingleSize = 3)
  private val sh = SimHash(nbits = 16)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_minhash_lsh" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      mh.candidatePairs(docs)
    }),

    "dedup_minhash_buckets" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      mh.buckets(docs)
        .groupBy("band", "bucket")
        .agg(count(lit(1)).as("n_docs"), min("doc_id").as("min_doc"))
        .filter(col("n_docs") > 1)
    }),

    "dedup_simhash" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .filter(length(trim(col("text"))) > 0)
      sh.groups(docs)
    }),

    // hamming<=1 simhash pairs via 1-bit-flip probe join (equi-join,
    // no pairwise scan); oracle verifies with brute-force bit_count
    "dedup_simhash_probes" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .filter(length(trim(col("text"))) > 0)
      sh.candidatePairs(docs)
    }),

    // radius-2 probe tables: C(16,2)+16+1 = 137 probes per doc, still a
    // pure equi-join (oracle = brute-force bit_count(xor) <= 2)
    "dedup_simhash_probes2" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .filter(length(trim(col("text"))) > 0)
      sh.candidatePairs(docs, radius = 2)
    }),

    // near-dup clustering: connected components over the MinHash
    // candidate graph (min-label propagation; oracle = recursive CTE)
    "dedup_components" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      ConnectedComponents(mh.candidatePairs(docs), docs.select("doc_id"))
    }),

    // quality-aware survivor selection: per near-dup component keep
    // the LONGEST member (ties: smallest id) — the RefinedWeb "best
    // copy" rule; oracle = the components CTE + a per-component
    // ORDER BY quality DESC, doc_id window
    "dedup_quality_survivors" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      ConnectedComponents
        .survivorsBy(docs, mh.candidatePairs(docs), length(col("text")))
        .select(col("doc_id"), length(col("text")).as("quality"))
    }),

    // SOFT dedup (SoftDedup, ACL 2024): duplication-aware REWEIGHTING
    // instead of hard drops — commonness = mean trigram df, weight =
    // commonness^(-1) — over the dedup_jaccard_collapsed twin corpus
    // (every 3rd doc triplicated, every 6th quadruplicated), so the
    // weight spectrum is genuinely exercised (1.0 / ~1/3 / ~1/4)
    "soft_dedup_weights" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      graft.operators.dedup.SoftDedup(n = 3).weights(softCorpus(docs))
    }),

    // the Gumbel-top-k draw over those weights: 200 ids without
    // replacement with P ∝ weight — deterministic salted-md5 noise,
    // so the oracle replays the full draw
    "soft_dedup_sample" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      graft.operators.dedup.SoftDedup(n = 3).sample(softCorpus(docs), k = 200)
    }),

    // delta-ingest dedup: the new 40% of the corpus deduped against the
    // persisted band-bucket index of the first 60% — corpus text is
    // never re-shingled, only its narrow index joins
    "dedup_incremental" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val index = mh.buckets(docs.filter(col("doc_id") % 5 < 3))
      val batch = docs.filter(col("doc_id") % 5 >= 3)
      IncrementalMinHashDedup(mh).survivors(index, batch)
        .select("doc_id", "lang", "source")
    }),

    // the 100 TB jaccard recipe: MinHash candidates -> exact verify
    // (linear candidate generation, one array_intersect per candidate)
    "dedup_minhash_verified" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      NgramJaccard(n = 3, threshold = 0.5).minhashVerifiedPairs(docs, mh)
    }),

    // dedup audit: cluster-size histogram of the component labeling
    // (fat-tailed giant clusters = boilerplate, not duplication)
    "dedup_cluster_stats" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      ConnectedComponents.clusterStats(
        ConnectedComponents(mh.candidatePairs(docs), docs.select("doc_id")))
    }),

    // recipe evaluation: plant one suffix-perturbed twin per doc and
    // score MinHash candidate generation against the known pairs —
    // the banding-tuning harness (recall < 1 is the S-curve showing)
    "dedup_eval_minhash" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents").select("doc_id", "text")
      val twins = docs.select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" planted twin suffix")).as("text"))
      val truth = docs.select(col("doc_id").as("id_a"),
        (col("doc_id") + 1000000L).as("id_b"))
      DedupEval.prf(mh.candidatePairs(docs.unionByName(twins)), truth)
    }),

    // the persisted-index twin of dedup_incremental (same oracle —
    // results must be identical): the band index is a BUCKETED catalog
    // table and the batch probe is Exchange-free on the index side
    "dedup_incremental_indexed" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val inc = IncrementalMinHashDedup(mh)
      inc.persistIndex(mh.buckets(docs.filter(col("doc_id") % 5 < 3)),
        "graft_inc_band_idx")
      inc.survivorsIndexed(s, "graft_inc_band_idx",
          docs.filter(col("doc_id") % 5 >= 3))
        .select("doc_id", "lang", "source")
    }),

    // leakage-safe splitting: train/val/test assigned per near-dup
    // COMPONENT (min-label), so near-copies never straddle train and
    // test — the eval-contamination guard a per-doc hash split lacks
    "leakage_safe_split" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      graft.operators.text.LeakageSafeSplit(docs, mh.candidatePairs(docs))
        .select("doc_id", "component", "split")
    }),

    // the audit twin: a PER-DOC hash split of the same corpus leaks —
    // every component whose members straddle splits, with the straddled
    // split set (empty output would mean the split was already safe)
    "split_leakage_audit" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val perDoc = graft.operators.text.HashSampler()
        .split(docs, trainBuckets = 80, valBuckets = 10)
      graft.operators.text.LeakageSafeSplit
        .audit(perDoc, mh.candidatePairs(docs))
        .select(col("component"), col("n_docs"), col("n_splits"),
          array_join(col("splits"), ",").as("splits"))
    })
  )

  private[queries] val normSql = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"

  /** The twin-planted soft-dedup corpus (the dedup_jaccard_collapsed
    * shape): base ∪ every-3rd at +1e6 ∪ every-6th at +2e6. */
  private def softCorpus(docs: org.apache.spark.sql.DataFrame) =
    docs.select(col("doc_id"), col("text"))
      .unionByName(docs.filter(col("doc_id") % 3 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      .unionByName(docs.filter(col("doc_id") % 6 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"), col("text")))

  private val softCorpusSql =
    """SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, text FROM documents
      |  WHERE doc_id % 3 = 0
      |  UNION ALL
      |  SELECT doc_id + 2000000 AS doc_id, text FROM documents
      |  WHERE doc_id % 6 = 0""".stripMargin

  private def dedupIncrementalSql: String =
    s"""WITH $mhSigSql,
       |$bandsSql,
       |old_b AS (SELECT * FROM buckets WHERE doc_id % 5 < 3),
       |new_b AS (SELECT * FROM buckets WHERE doc_id % 5 >= 3),
       |new_over_cap AS (
       |  SELECT band, bucket FROM new_b
       |  GROUP BY 1, 2 HAVING count(*) > ${mh.maxBucketSize}),
       |rejected AS (
       |  SELECT DISTINCT n.doc_id
       |  FROM new_b n JOIN old_b o ON n.band = o.band AND n.bucket = o.bucket
       |  UNION
       |  SELECT DISTINCT b.doc_id
       |  FROM new_b a JOIN new_b b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
       |  WHERE NOT EXISTS (SELECT 1 FROM new_over_cap g
       |                    WHERE g.band = a.band AND g.bucket = a.bucket))
       |SELECT doc_id, lang, source FROM documents
       |WHERE doc_id % 5 >= 3
       |  AND doc_id NOT IN (SELECT doc_id FROM rejected)""".stripMargin

  /** Shared CTE: minhash signatures per doc (docs with ≥ shingleSize
    * words). Base hash = 28-bit md5 prefix; permutations a·x+b mod
    * 2^31−1 with the same coefficients as the Scala side.
    * `src` = the table/CTE the corpus reads from. */
  private def mhSigSql: String = mhSigSqlFrom("documents")

  private[queries] def mhSigSqlFrom(src: String): String = {
    val sigCols = (0 until mh.numHashes).map(i =>
      s"list_min(list_transform(base, x -> (x * ${mh.coefA(i)} + ${mh.coefB(i)}) % ${mh.prime})) AS sig_$i")
      .mkString(",\n    ")
    s"""shing AS (
       |  SELECT doc_id, list_transform(range(1, len(ws) - 1),
       |    i -> ws[CAST(i AS INT)] || ' ' || ws[CAST(i AS INT) + 1] || ' ' || ws[CAST(i AS INT) + 2]) AS sh
       |  FROM (SELECT doc_id, string_split($normSql, ' ') AS ws FROM $src)
       |  WHERE len(ws) >= 3),
       |based AS (
       |  SELECT doc_id,
       |    list_transform(sh, s -> CAST(('0x' || substr(md5(s), 1, 7)) AS BIGINT)) AS base
       |  FROM shing),
       |sigs AS (
       |  SELECT doc_id,
       |    $sigCols
       |  FROM based)""".stripMargin
  }

  /** Band digests from the signature CTE, matching
    * MinHashLSH.bandDigests (md5 over comma-joined slice + ":band"). */
  private[queries] def bandsSql: String = {
    val rows = mh.numHashes / mh.bands
    val bandSelects = (0 until mh.bands).map { b =>
      val cols = (b * rows until (b + 1) * rows)
        .map(i => s"CAST(sig_$i AS VARCHAR)").mkString(" || ',' || ")
      s"SELECT doc_id, $b AS band, md5($cols || ':$b') AS bucket FROM sigs"
    }
    bandSelects.mkString("buckets AS (\n", "\n  UNION ALL\n", ")")
  }

  /** Per-doc mean trigram df over the soft corpus — the commonness/
    * weight CTEs shared by both soft-dedup oracles. Trigram
    * construction matches the dedup_jaccard shingle replay; docs with
    * < 3 tokens carry no trigrams and floor at commonness 1.0. */
  private val softWeightsCtes = {
    val norm = normSql
    s"""corpus AS ($softCorpusSql),
       |ssh AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    range(1, greatest(len(string_split($norm, ' ')) - 1, 1)),
       |    i -> string_split($norm, ' ')[CAST(i AS INT)] || ' ' ||
       |         string_split($norm, ' ')[CAST(i AS INT) + 1] || ' ' ||
       |         string_split($norm, ' ')[CAST(i AS INT) + 2]))) AS g
       |  FROM corpus WHERE len(string_split($norm, ' ')) >= 3),
       |dfs AS (SELECT g, count(*) AS df FROM ssh GROUP BY g),
       |com AS (
       |  SELECT doc_id, round(avg(df), 6) AS commonness
       |  FROM ssh JOIN dfs USING (g) GROUP BY doc_id),
       |wts AS (
       |  SELECT corpus.doc_id,
       |    coalesce(com.commonness, 1.0) AS commonness,
       |    greatest(round(pow(coalesce(com.commonness, 1.0), -1.0), 6),
       |      0.000001) AS weight
       |  FROM corpus LEFT JOIN com ON corpus.doc_id = com.doc_id)""".stripMargin
  }

  def oracles: Map[String, String] = Map(
    "soft_dedup_weights" ->
      s"""WITH $softWeightsCtes
         |SELECT doc_id, commonness, weight FROM wts""".stripMargin,

    "soft_dedup_sample" ->
      s"""WITH $softWeightsCtes,
         |adj AS (
         |  SELECT doc_id, commonness, weight,
         |    round(ln(weight) +
         |      round(-ln(-ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
         |        || ':graft:soft'), 1, 6)) AS BIGINT) + 0.5) / 16777216.0)), 6),
         |      6) AS a
         |  FROM wts),
         |ranked AS (
         |  SELECT doc_id, commonness, weight,
         |    CAST(row_number() OVER (ORDER BY a DESC, doc_id ASC) AS INT) AS rnk
         |  FROM adj)
         |SELECT doc_id, commonness, weight, rnk FROM ranked
         |WHERE rnk <= 200""".stripMargin,
    "dedup_minhash_lsh" ->
      s"""WITH $mhSigSql,
         |$bandsSql
         |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |FROM buckets a JOIN buckets b
         |  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id""".stripMargin,

    "dedup_minhash_buckets" ->
      s"""WITH $mhSigSql,
         |$bandsSql
         |SELECT CAST(band AS INT) AS band, bucket, count(*) AS n_docs,
         |  min(doc_id) AS min_doc
         |FROM buckets GROUP BY 1, 2 HAVING count(*) > 1""".stripMargin,

    "dedup_components" ->
      s"""WITH RECURSIVE $mhSigSql,
         |$bandsSql,
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM buckets a JOIN buckets b
         |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
         |edges AS (SELECT id_a AS u, id_b AS v FROM pairs
         |          UNION ALL SELECT id_b, id_a FROM pairs),
         |reach(src, dst) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u)
         |SELECT src AS doc_id, min(dst) AS component FROM reach GROUP BY 1""".stripMargin,

    "dedup_quality_survivors" ->
      s"""WITH RECURSIVE $mhSigSql,
         |$bandsSql,
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM buckets a JOIN buckets b
         |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
         |edges AS (SELECT id_a AS u, id_b AS v FROM pairs
         |          UNION ALL SELECT id_b, id_a FROM pairs),
         |reach(src, dst) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u),
         |comp AS (SELECT src AS doc_id, min(dst) AS component FROM reach GROUP BY 1),
         |scored AS (
         |  SELECT c.component, d.doc_id, length(d.text) AS quality
         |  FROM comp c JOIN documents d ON c.doc_id = d.doc_id),
         |best AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id, row_number() OVER (PARTITION BY component
         |      ORDER BY quality DESC, doc_id ASC) AS rn
         |    FROM scored) t WHERE rn = 1)
         |SELECT s.doc_id, s.quality FROM scored s
         |JOIN best b ON s.doc_id = b.doc_id""".stripMargin,

    // one oracle, two execution strategies (plain-DataFrame probe /
    // bucketed-catalog-index probe — results must be identical)
    "dedup_incremental" -> dedupIncrementalSql,
    "dedup_incremental_indexed" -> dedupIncrementalSql,

    "dedup_minhash_verified" ->
      s"""WITH $mhSigSql,
         |$bandsSql,
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM buckets a JOIN buckets b
         |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
         |shd AS (
         |  SELECT doc_id, unnest(list_distinct(sh)) AS s FROM shing),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM shd GROUP BY doc_id),
         |inter AS (
         |  SELECT c.id_a, c.id_b, count(*) AS inter
         |  FROM cand c JOIN shd a ON a.doc_id = c.id_a
         |              JOIN shd b ON b.doc_id = c.id_b AND a.s = b.s
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b,
         |  round(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6) AS jaccard
         |FROM inter JOIN sizes sa ON inter.id_a = sa.doc_id
         |           JOIN sizes sb ON inter.id_b = sb.doc_id
         |WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.5""".stripMargin,

    "dedup_simhash" ->
      s"""WITH $shSigSql
         |SELECT simhash, min(doc_id) AS keep_id, count(*) AS dup_count
         |FROM sig GROUP BY 1""".stripMargin,

    "dedup_simhash_probes" ->
      s"""WITH $shSigSql
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |FROM sig a JOIN sig b
         |  ON a.doc_id < b.doc_id AND bit_count(xor(a.simhash, b.simhash)) <= 1""".stripMargin,

    "dedup_simhash_probes2" ->
      s"""WITH $shSigSql
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |FROM sig a JOIN sig b
         |  ON a.doc_id < b.doc_id AND bit_count(xor(a.simhash, b.simhash)) <= 2""".stripMargin,

    "dedup_cluster_stats" ->
      s"""WITH RECURSIVE $mhSigSql,
         |$bandsSql,
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM buckets a JOIN buckets b
         |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
         |edges AS (SELECT id_a AS u, id_b AS v FROM pairs
         |          UNION ALL SELECT id_b, id_a FROM pairs),
         |reach(src, dst) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u),
         |comp AS (SELECT src AS doc_id, min(dst) AS component FROM reach GROUP BY 1),
         |sizes AS (SELECT component, count(*) AS cluster_size FROM comp GROUP BY 1)
         |SELECT cluster_size, count(*) AS n_clusters,
         |  CAST(count(*) * cluster_size AS BIGINT) AS n_docs,
         |  min(component) AS min_component
         |FROM sizes GROUP BY 1""".stripMargin,

    "dedup_eval_minhash" ->
      s"""WITH u AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000 AS doc_id,
         |    text || ' planted twin suffix' AS text
         |  FROM documents),
         |${mhSigSqlFrom("u")},
         |$bandsSql,
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS lo, b.doc_id AS hi
         |  FROM buckets a JOIN buckets b
         |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
         |truth AS (SELECT doc_id AS lo, doc_id + 1000000 AS hi FROM documents),
         |j AS (
         |  SELECT CASE WHEN c.lo IS NOT NULL THEN 1 ELSE 0 END AS is_c,
         |    CASE WHEN t.lo IS NOT NULL THEN 1 ELSE 0 END AS is_t
         |  FROM cand c FULL OUTER JOIN truth t
         |    ON c.lo = t.lo AND c.hi = t.hi),
         |agg AS (
         |  SELECT CAST(sum(is_c) AS BIGINT) AS n_candidates,
         |    CAST(sum(is_t) AS BIGINT) AS n_truth,
         |    CAST(sum(is_c * is_t) AS BIGINT) AS n_hits
         |  FROM j)
         |SELECT n_candidates, n_truth, n_hits,
         |  round(CAST(n_hits AS DOUBLE) / n_candidates, 6) AS precision,
         |  round(CAST(n_hits AS DOUBLE) / n_truth, 6) AS recall
         |FROM agg""".stripMargin,

    "leakage_safe_split" ->
      s"""WITH RECURSIVE $mhSigSql,
         |$bandsSql,
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM buckets a JOIN buckets b
         |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
         |edges AS (SELECT id_a AS u, id_b AS v FROM pairs
         |          UNION ALL SELECT id_b, id_a FROM pairs),
         |reach(src, dst) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u),
         |comp AS (SELECT src AS doc_id, min(dst) AS component FROM reach GROUP BY 1),
         |b AS (
         |  SELECT doc_id, component,
         |    CAST(('0x' || substr(md5(CAST(component AS VARCHAR) || ':graft'), 1, 7)) AS BIGINT) % 100 AS bucket
         |  FROM comp)
         |SELECT doc_id, component,
         |  CASE WHEN bucket < 80 THEN 'train'
         |       WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
         |FROM b""".stripMargin,

    "split_leakage_audit" ->
      s"""WITH RECURSIVE $mhSigSql,
         |$bandsSql,
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM buckets a JOIN buckets b
         |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
         |edges AS (SELECT id_a AS u, id_b AS v FROM pairs
         |          UNION ALL SELECT id_b, id_a FROM pairs),
         |reach(src, dst) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u),
         |comp AS (SELECT src AS doc_id, min(dst) AS component FROM reach GROUP BY 1),
         |perdoc AS (
         |  SELECT doc_id,
         |    CASE WHEN bucket < 80 THEN 'train'
         |         WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
         |  FROM (SELECT doc_id,
         |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':graft'), 1, 7)) AS BIGINT) % 100 AS bucket
         |    FROM documents))
         |SELECT c.component, count(*) AS n_docs,
         |  count(DISTINCT p.split) AS n_splits,
         |  array_to_string(list_sort(list(DISTINCT p.split)), ',') AS splits
         |FROM perdoc p JOIN comp c ON p.doc_id = c.doc_id
         |GROUP BY 1 HAVING count(DISTINCT p.split) > 1""".stripMargin
  )

  /** Shared CTE chain ending in `sig(doc_id, simhash)` — the 16-bit
    * simhash signatures, same values as SimHash.signatures. */
  private def shSigSql: String =
    s"""toks AS (
       |  SELECT doc_id, unnest(string_split($normSql, ' ')) AS t
       |  FROM documents WHERE length(trim(text)) > 0),
       |vals AS (
       |  SELECT doc_id, CAST(('0x' || substr(md5(t), 1, 4)) AS BIGINT) AS v FROM toks),
       |bits AS (
       |  SELECT doc_id, j, sum(CASE WHEN (v >> CAST(j AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS s
       |  FROM vals, range(0, 16) r(j) GROUP BY doc_id, j),
       |sig AS (
       |  SELECT doc_id, CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE 0 END) AS BIGINT) AS simhash
       |  FROM bits GROUP BY doc_id)""".stripMargin
}
