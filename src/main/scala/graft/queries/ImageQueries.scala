package graft.queries

import graft.Tables
import graft.operators.image._
import graft.operators.ml.{CrossModalAlignment, QualityClassifier}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal binary-column correctness queries. The binary "image"
  * column is derived in-query from documents.text (cast to binary) — an
  * honest stand-in given this environment ships no image codecs; the
  * operators' plumbing (binary columns, schema, dedup, filters) is what
  * these verify. Stub kernels are md5-derived, so DuckDB re-derives the
  * identical values.
  */
object ImageQueries {

  private def withImage(df: DataFrame): DataFrame =
    df.withColumn("image", col("text").cast("binary"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "image_metadata" -> ((s, dir) => {
      val docs = withImage(Tables.load(s, dir, "documents"))
      ImageMetadata()(docs).select("doc_id", "image_file_size_bytes",
        "image_format", "image_width", "image_height")
    }),

    "image_entropy" -> ((s, dir) => {
      val docs = withImage(Tables.load(s, dir, "documents"))
      ImageTechnicalQuality().entropy(docs)
    }),

    "image_quality_filter" -> ((s, dir) => {
      val docs = withImage(Tables.load(s, dir, "documents"))
      val refined = ImageTechnicalQuality()(docs)
      refined.select(col("doc_id"), col("image_width"), col("image_height"),
        col("image_compression_artifacts"), col("image_information_entropy"),
        ImageQualityFilter(minWidth = 1024, minHeight = 1024,
          maxCompressionArtifacts = 0.8, minInformationEntropy = 3.0)
          .predicate.as("keep"))
    }),

    "dedup_phash" -> ((s, dir) => {
      val docs = withImage(Tables.load(s, dir, "documents"))
      ImagePhashDedup().groups(docs)
    }),

    "dedup_phash_hamming" -> ((s, dir) => {
      // hamming-radius pHash near-dup on a planted re-encode table:
      // every doc emits its base 60-bit content phash plus a twin
      // (id + 1e6) with doc_id % 4 bits flipped at deterministic
      // positions — so radius 2 drops the distance-{0,1,2} twins and
      // keeps the distance-3 ones, and the oracle rebuilds the exact
      // same table and brute-forces the keep rule
      val docs = withImage(Tables.load(s, dir, "documents"))
      val base = docs.select(col("doc_id"),
        ImagePhashDedup().phash(col("image")).as("phash"))
      val nf = pmod(col("doc_id"), lit(4L))
      val mask = (0 until 3).map { i =>
        val pos = pmod(pmod(col("doc_id"), lit(47L)) + lit(i * 13), lit(60L))
        when(nf >= i + 1, pow(lit(2.0), pos).cast("long")).otherwise(lit(0L))
      }.reduce(_ bitwiseOR _)
      val copies = base.select((col("doc_id") + 1000000L).as("doc_id"),
        col("phash").bitwiseXOR(mask).as("phash"))
      PhashHammingDedup(radius = 2).flagged(base.unionByName(copies))
        .select("doc_id", "phash", "keep")
    }),

    "audio_metadata" -> ((s, dir) => {
      // real WAV container derived in-query (AudioKernels.wavFromText:
      // 8-bit mono 8 kHz PCM, samples = the text's byte codes), decoded
      // back through javax.sound — the oracle recomputes the expected
      // values from the construction formula.
      val docs = Tables.load(s, dir, "documents")
        .withColumn("audio", AudioKernels.textWav(col("text")))
      AudioKernels.withAudioMetadata(docs)
        .select(col("doc_id"), col("sample_rate"), col("channels"),
          col("bits_per_sample"), col("n_frames"),
          round(col("duration_s"), 6).as("duration_s"),
          round(col("rms"), 6).as("rms"))
    }),

    "audio_fingerprint_dedup" -> ((s, dir) => {
      // energy-contour fingerprint (16 delta-sign bits over 17 integer
      // energy windows, through the REAL WAV decode path) + hamming
      // dedup via the B38 banded machinery; planted exact copies for
      // even doc_ids, natural 16-bit contour collisions handled
      // identically by the brute-force oracle
      val docs = Tables.load(s, dir, "documents")
        .withColumn("audio", AudioKernels.textWav(col("text")))
      // the decode UDF is the expensive leg and the dedup references
      // its input three times (rep groupBy + two back joins) — pin the
      // NARROW (id, fp) table once so the corpus decodes exactly once
      val base = docs.select(col("doc_id"),
        AudioKernels.audioFingerprint(col("audio")).as("audio_fp"))
        .localCheckpoint()
      val copies = base.filter(col("doc_id") % 2 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("audio_fp"))
      val all = base.unionByName(copies)
      // flagged() passes null-fingerprint rows through kept
      PhashHammingDedup(radius = 1, bands = 4, nbits = 16,
          phashCol = "audio_fp")
        .flagged(all)
        .select("doc_id", "audio_fp", "keep")
    }),

    "audio_fingerprint_wide" -> ((s, dir) => {
      // the corpus-scale contour width (33 windows -> 32 delta bits,
      // 8x4-bit bands at radius 1): same derivation and planted copies
      // as audio_fingerprint_dedup, 2^16 more hash space — §5.13's
      // natural-collision false merges stop here (the 16-bit key's
      // saturation past ~10^4 distinct clips is the documented ceiling)
      val docs = Tables.load(s, dir, "documents")
        .withColumn("audio", AudioKernels.textWav(col("text")))
      val base = docs.select(col("doc_id"),
        AudioKernels.audioFingerprint(col("audio"), windows = 33)
          .as("audio_fp"))
        .localCheckpoint()
      val copies = base.filter(col("doc_id") % 2 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("audio_fp"))
      PhashHammingDedup(radius = 1, bands = 8, nbits = 32,
          phashCol = "audio_fp")
        .flagged(base.unionByName(copies))
        .select("doc_id", "audio_fp", "keep")
    }),

    "dedup_video_frames" -> ((s, dir) => {
      // aligned frame-pHash video near-dup over the REAL quantized-DCT
      // kernel (DctKernels), two planted re-encode families:
      //   - noise twins (+1e6, even ids): ONE byte overwritten
      //     mid-stream — the affected sampled frames drift a few
      //     hamming bits, the untouched ones match at distance 0, and
      //     ≥5 aligned matches still group the pair;
      //   - brightness twins (+2e6, odd ids): EVERY byte shifted +1
      //     (uniform re-encode brightness shift) — zero bytes in
      //     common, the md5 stub matched nothing, the DCT hash is
      //     EXACTLY invariant (quantized cosine columns cancel).
      // The oracle rebuilds the videos and replays frame sampling, the
      // integer DCT, median bits and the brute-force hamming keep rule.
      val docs = Tables.load(s, dir, "documents")
      val base = docs.select(col("doc_id"),
        repeat(col("text"), 4).cast("binary").as("video"))
      val noisy = base.filter(col("doc_id") % 2 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(substring(col("video"), 1, 40), lit("X").cast("binary"),
            substring(col("video"), 42, 1000000000)).as("video"))
      val bright = docs.filter(col("doc_id") % 2 === 1)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          repeat(translate(col("text"),
            " abcdefghijklmnopqrstuvwxyz",
            "!bcdefghijklmnopqrstuvwxyz{"), 4).cast("binary").as("video"))
      VideoFrameDedup().flagged(
        base.unionByName(noisy).unionByName(bright))
        .select(col("doc_id"), col("keep"))
    }),

    "visual_degradations" -> ((s, dir) => {
      val docs = withImage(Tables.load(s, dir, "documents"))
      VisualDegradations()(docs).select("doc_id", "img_vd_color_cast",
        "img_vd_blurriness", "img_vd_watermark", "img_vd_noise",
        "img_vd_overall_quality")
    }),

    "aesthetic_aigc" -> ((s, dir) => {
      val docs = withImage(Tables.load(s, dir, "documents"))
      AestheticAigc()(docs).select("doc_id", "aesthetic_score", "aigc_score", "is_aigc")
    }),

    "clip_embedding_stub" -> ((s, dir) => {
      val docs = withImage(Tables.load(s, dir, "documents"))
      ClipEmbeddingStub()(docs)
        .select(col("doc_id"), posexplode(col("clip_embedding")).as(Seq("pos", "v")))
        .select(col("doc_id"), col("pos"), round(col("v"), 6).as("v"))
    }),

    "quality_classifier" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      QualityClassifier()(docs).select("doc_id", "clf_score", "clf_label")
    }),

    "visual_degradations_model" -> ((s, dir) => {
      // TRAINED model (MLlib fit by DegradationTrainer, frozen weights)
      // running through the BatchInference mapPartitions slot. Synthetic
      // payloads are not decodable, so the kernel takes its raw-byte
      // feature path — which the oracle reproduces exactly.
      val docs = withImage(Tables.load(s, dir, "documents"))
      graft.operators.ml.DegradationModel(docs).select(
        col("doc_id"),
        round(col("vd_blur"), 6).as("vd_blur"),
        round(col("vd_noise"), 6).as("vd_noise"),
        round(col("vd_overall_quality"), 6).as("vd_overall_quality"))
    }),

    "visual_degradations_model4" -> ((s, dir) => {
      // FULL reference head set (image_visual_degradations.py emits
      // color_cast / blur / watermark / noise / overall): the two new
      // heads are trained on the extended 7-dim features
      // (DegradationTrainer.trainExt), frozen, and scored in the same
      // batched mapPartitions pass as the base heads.
      val docs = withImage(Tables.load(s, dir, "documents"))
      graft.operators.ml.DegradationModel.apply4(docs).select(
        col("doc_id"),
        round(col("vd_color_cast"), 6).as("vd_color_cast"),
        round(col("vd_blur"), 6).as("vd_blur"),
        round(col("vd_watermark"), 6).as("vd_watermark"),
        round(col("vd_noise"), 6).as("vd_noise"),
        round(col("vd_overall_quality"), 6).as("vd_overall_quality"))
    }),

    "aesthetic_model" -> ((s, dir) => {
      // TRAINED aesthetic regressor (AestheticTrainer: MLlib
      // LinearRegression on a controlled visual-richness label),
      // scaled to the reference's 1-10 range.
      val docs = withImage(Tables.load(s, dir, "documents"))
      graft.operators.ml.AestheticModel(docs).select(
        col("doc_id"),
        round(col("aesthetic_model_score"), 6).as("aesthetic_model_score"))
    }),

    "aigc_model" -> ((s, dir) => {
      // TRAINED AIGC head (AigcTrainer: camera-pipeline vs pristine
      // renders) through the BatchInference slot; byte feature path on
      // the synthetic corpus, reproduced exactly by the oracle.
      val docs = withImage(Tables.load(s, dir, "documents"))
      graft.operators.ml.AigcModel(docs).select(
        col("doc_id"),
        round(col("aigc_score"), 6).as("aigc_score"),
        (col("aigc_score") > 0.5).as("is_aigc"))
    }),

    "clip_score_filter" -> ((s, dir) => {
      // image-text alignment: image tower = the derived binary payload,
      // caption tower = reverse(text) (a deterministic "related but not
      // identical" caption both engines rebuild — same global byte
      // statistics, permuted positional quarters, so scores land high
      // but below 1 and the 0.99 threshold splits the corpus ~50/50)
      val docs = withImage(Tables.load(s, dir, "documents"))
        .withColumn("caption", reverse(col("text")))
      CrossModalAlignment(threshold = 0.99).scored(docs)
    }),

    // cross-modal retrieval eval: recall@{1,5} in both directions over
    // the same dual-tower pairs as clip_score_filter — the benchmark a
    // CLIP-gate threshold choice answers to. Instructive negative on
    // the stand-in encoder: pairs score ~0.99 ABSOLUTE cosine yet
    // recall@1 is only ~4% against 500 distractors (reversed captions
    // share global byte statistics with every doc) — i.e. the 0.99
    // gate passes pairs that are not retrievably aligned, which is
    // exactly what this report exists to expose
    "crossmodal_recall" -> ((s, dir) => {
      val docs = withImage(Tables.load(s, dir, "documents"))
        .withColumn("caption", reverse(col("text")))
      // query sample = every 17th doc (the eval-set discipline: recall
      // estimated from a sample of queries against ALL distractors)
      graft.operators.ml.CrossModalRecall(ks = Seq(1, 5))(
        docs, col("vec_id") % 17 === 0)
    }),

    "trained_embedding" -> ((s, dir) => {
      // TRAINED encoder (EmbeddingTrainer: MLlib PCA over standardized
      // content features, frozen projection) through the BatchInference
      // slot — the non-stub sibling of clip_embedding_stub. Synthetic
      // payloads take the raw-byte feature path the oracle reproduces.
      // Both sides round the SAME float32 value (cast to float before
      // widening back) so float-vs-double rounding can't diverge.
      val docs = withImage(Tables.load(s, dir, "documents"))
      graft.operators.ml.TrainedEmbedding(docs)
        .select(col("doc_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .select(col("doc_id"), col("pos"),
          round(col("v").cast("double"), 6).as("v"))
    })
  )

  /** `CAST(('0x' || substr(md5(text || tag), 1, n)) AS BIGINT)` */
  private[queries] def hexInt(expr: String, n: Int): String =
    s"CAST(('0x' || substr(md5($expr), 1, $n)) AS BIGINT)"

  private[queries] def u01(tag: String): String =
    s"(CAST(${hexInt(s"text || '$tag'", 6)} AS DOUBLE) / 16777216.0)"

  def oracles: Map[String, String] = Map(
    "dedup_phash_hamming" ->
      s"""WITH base AS (
         |  SELECT doc_id, ${hexInt("text", 15)} AS phash FROM documents),
         |copies AS (
         |  SELECT doc_id + 1000000 AS new_id,
         |    xor(phash,
         |      (CASE WHEN doc_id % 4 >= 1
         |         THEN CAST(pow(2, (doc_id % 47) % 60) AS BIGINT) ELSE 0 END) |
         |      (CASE WHEN doc_id % 4 >= 2
         |         THEN CAST(pow(2, ((doc_id % 47) + 13) % 60) AS BIGINT) ELSE 0 END) |
         |      (CASE WHEN doc_id % 4 >= 3
         |         THEN CAST(pow(2, ((doc_id % 47) + 26) % 60) AS BIGINT) ELSE 0 END)
         |    ) AS phash
         |  FROM base),
         |h AS (
         |  SELECT doc_id, phash FROM base
         |  UNION ALL SELECT new_id AS doc_id, phash FROM copies)
         |SELECT a.doc_id, a.phash,
         |  NOT EXISTS (SELECT 1 FROM h b WHERE b.doc_id < a.doc_id
         |    AND bit_count(xor(a.phash, b.phash)) <= 2) AS keep
         |FROM h a""".stripMargin,

    "audio_fingerprint_dedup" ->
      """WITH chars AS (
        |  SELECT doc_id, length(text) AS n, CAST(i - 1 AS BIGINT) AS i0,
        |    ascii(substr(text, CAST(i AS INT), 1)) AS c
        |  FROM (SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i
        |        FROM documents)),
        |e AS (
        |  SELECT doc_id, (i0 * 17) // n AS w,
        |    sum(CAST((c - 128) * (c - 128) AS BIGINT)) AS s
        |  FROM chars GROUP BY doc_id, (i0 * 17) // n),
        |fp0 AS (
        |  SELECT a.doc_id,
        |    CAST(sum(CASE WHEN b.s > a.s
        |        THEN (CAST(1 AS BIGINT) << CAST(a.w AS INT)) ELSE 0 END)
        |      AS BIGINT) AS fp
        |  FROM e a JOIN e b ON a.doc_id = b.doc_id AND b.w = a.w + 1
        |  GROUP BY a.doc_id),
        |base AS (
        |  SELECT d.doc_id,
        |    CASE WHEN length(d.text) >= 17 THEN fp0.fp ELSE NULL END AS fp
        |  FROM documents d LEFT JOIN fp0 ON d.doc_id = fp0.doc_id),
        |copies AS (
        |  SELECT doc_id + 1000000 AS doc_id, fp FROM base WHERE doc_id % 2 = 0),
        |h AS (SELECT doc_id, fp FROM base UNION ALL SELECT doc_id, fp FROM copies)
        |SELECT a.doc_id, a.fp AS audio_fp,
        |  CASE WHEN a.fp IS NULL THEN TRUE ELSE
        |    NOT EXISTS (SELECT 1 FROM h b WHERE b.fp IS NOT NULL
        |      AND b.doc_id < a.doc_id AND bit_count(xor(a.fp, b.fp)) <= 1)
        |  END AS keep
        |FROM h a""".stripMargin,

    "audio_fingerprint_wide" ->
      """WITH chars AS (
        |  SELECT doc_id, length(text) AS n, CAST(i - 1 AS BIGINT) AS i0,
        |    ascii(substr(text, CAST(i AS INT), 1)) AS c
        |  FROM (SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i
        |        FROM documents)),
        |e AS (
        |  SELECT doc_id, (i0 * 33) // n AS w,
        |    sum(CAST((c - 128) * (c - 128) AS BIGINT)) AS s
        |  FROM chars GROUP BY doc_id, (i0 * 33) // n),
        |fp0 AS (
        |  SELECT a.doc_id,
        |    CAST(sum(CASE WHEN b.s > a.s
        |        THEN (CAST(1 AS BIGINT) << CAST(a.w AS INT)) ELSE 0 END)
        |      AS BIGINT) AS fp
        |  FROM e a JOIN e b ON a.doc_id = b.doc_id AND b.w = a.w + 1
        |  GROUP BY a.doc_id),
        |base AS (
        |  SELECT d.doc_id,
        |    CASE WHEN length(d.text) >= 33 THEN fp0.fp ELSE NULL END AS fp
        |  FROM documents d LEFT JOIN fp0 ON d.doc_id = fp0.doc_id),
        |copies AS (
        |  SELECT doc_id + 1000000 AS doc_id, fp FROM base WHERE doc_id % 2 = 0),
        |h AS (SELECT doc_id, fp FROM base UNION ALL SELECT doc_id, fp FROM copies)
        |SELECT a.doc_id, a.fp AS audio_fp,
        |  CASE WHEN a.fp IS NULL THEN TRUE ELSE
        |    NOT EXISTS (SELECT 1 FROM h b WHERE b.fp IS NOT NULL
        |      AND b.doc_id < a.doc_id AND bit_count(xor(a.fp, b.fp)) <= 1)
        |  END AS keep
        |FROM h a""".stripMargin,

    "dedup_video_frames" -> {
      // the quantized-DCT pHash, replayed coefficient by coefficient:
      // coef_i = Σ_j px[j] · W_i[j] with the SAME integer weight rows
      // the Scala kernel uses (DctKernels.weights16), bit_i set iff
      // 2·coef_i exceeds the doubled median of the 16 coefs
      val ws = graft.operators.image.DctKernels.weights16
      val coefExprs = ws.map(row =>
        row.zipWithIndex.filter(_._1 != 0L)
          .map { case (w, j) => s"p[${j + 1}]*($w)" }.mkString(" + "))
        .mkString("[", ",\n      ", "]")
      val bitSum = (0 until 16).map(i =>
        s"CASE WHEN 2*c[${i + 1}] > m2 THEN ${1L << i} ELSE 0 END")
        .mkString(" + ")
      s"""WITH base AS (SELECT doc_id, repeat(text, 4) AS video FROM documents),
         |noisy AS (
         |  SELECT doc_id + 1000000 AS doc_id,
         |    substr(video, 1, 40) || 'X' || substr(video, 42, 1000000000) AS video
         |  FROM base WHERE doc_id % 2 = 0),
         |bright AS (
         |  SELECT doc_id + 2000000 AS doc_id,
         |    repeat(translate(text, ' abcdefghijklmnopqrstuvwxyz',
         |      '!bcdefghijklmnopqrstuvwxyz{'), 4) AS video
         |  FROM documents WHERE doc_id % 2 = 1),
         |v AS MATERIALIZED (SELECT doc_id, video FROM base
         |      UNION ALL SELECT doc_id, video FROM noisy
         |      UNION ALL SELECT doc_id, video FROM bright),
         |fr AS (
         |  SELECT doc_id, CAST(i AS INT) AS frame_idx,
         |    substr(video,
         |      CAST(i * greatest((length(video) - 64) // 7, 1) + 1 AS INT),
         |      64) AS f
         |  FROM v, range(0, 8) r(i)),
         |px AS (
         |  SELECT doc_id, frame_idx,
         |    list_transform(range(1, 65), j -> CASE WHEN j <= length(f)
         |      THEN CAST(ascii(substr(f, CAST(j AS INT), 1)) AS BIGINT)
         |      ELSE 0 END) AS p
         |  FROM fr),
         |cf AS (
         |  SELECT doc_id, frame_idx, $coefExprs AS c
         |  FROM px),
         |fh AS MATERIALIZED (
         |  SELECT doc_id, frame_idx, CAST($bitSum AS BIGINT) AS fh
         |  FROM (SELECT doc_id, frame_idx, c,
         |          list_sort(c)[8] + list_sort(c)[9] AS m2 FROM cf)),
         |pairs AS (
         |  SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS m
         |  FROM fh a JOIN fh b
         |    ON a.frame_idx = b.frame_idx AND a.doc_id < b.doc_id
         |    AND bit_count(xor(a.fh, b.fh)) <= 2
         |  GROUP BY 1, 2 HAVING count(*) >= 5)
         |SELECT v.doc_id,
         |  NOT EXISTS (SELECT 1 FROM pairs p WHERE p.ib = v.doc_id) AS keep
         |FROM v""".stripMargin
    },

    "audio_metadata" ->
      """WITH chars AS (
        |  SELECT doc_id, ascii(substr(text, CAST(i AS INT), 1)) AS c
        |  FROM (SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i
        |        FROM documents)),
        |r AS (
        |  SELECT doc_id,
        |    round(sqrt(avg(((c - 128.0) / 128.0) * ((c - 128.0) / 128.0))), 6) AS rms
        |  FROM chars GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(8000 AS INT) AS sample_rate,
        |  CAST(1 AS INT) AS channels,
        |  CAST(8 AS INT) AS bits_per_sample,
        |  CAST(length(d.text) AS BIGINT) AS n_frames,
        |  round(length(d.text) / 8000.0, 6) AS duration_s,
        |  r.rms AS rms
        |FROM documents d LEFT JOIN r ON d.doc_id = r.doc_id""".stripMargin,

    "image_metadata" ->
      s"""SELECT doc_id, CAST(strlen(text) AS BIGINT) AS image_file_size_bytes,
         |  'UNKNOWN' AS image_format,
         |  CAST(${hexInt("text || ':w'", 6)} % 4096 + 1 AS INT) AS image_width,
         |  CAST(${hexInt("text || ':h'", 6)} % 4096 + 1 AS INT) AS image_height
         |FROM documents""".stripMargin,

    "image_entropy" ->
      """WITH chars AS (
        |  SELECT doc_id, substr(text, CAST(i AS INT), 1) AS c
        |  FROM (SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i FROM documents)),
        |counts AS (SELECT doc_id, c, count(*) AS n FROM chars GROUP BY 1, 2),
        |tot AS (SELECT doc_id, sum(n) AS total FROM counts GROUP BY 1)
        |SELECT counts.doc_id,
        |  round(-sum((CAST(n AS DOUBLE) / total) * log2(CAST(n AS DOUBLE) / total)), 6)
        |    AS image_information_entropy
        |FROM counts JOIN tot ON counts.doc_id = tot.doc_id
        |GROUP BY counts.doc_id""".stripMargin,

    "image_quality_filter" ->
      s"""WITH meta AS (
         |  SELECT doc_id, text,
         |    CAST(${hexInt("text || ':w'", 6)} % 4096 + 1 AS INT) AS image_width,
         |    CAST(${hexInt("text || ':h'", 6)} % 4096 + 1 AS INT) AS image_height
         |  FROM documents),
         |chars AS (
         |  SELECT doc_id, substr(text, CAST(i AS INT), 1) AS c
         |  FROM (SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i FROM documents)),
         |counts AS (SELECT doc_id, c, count(*) AS n FROM chars GROUP BY 1, 2),
         |tot AS (SELECT doc_id, sum(n) AS total FROM counts GROUP BY 1),
         |ent AS (
         |  SELECT counts.doc_id,
         |    round(-sum((CAST(n AS DOUBLE) / total) * log2(CAST(n AS DOUBLE) / total)), 6) AS e
         |  FROM counts JOIN tot ON counts.doc_id = tot.doc_id GROUP BY counts.doc_id),
         |art AS (
         |  SELECT doc_id, image_width, image_height,
         |    round(least(greatest(
         |      ${u01(":block")} * 0.6 +
         |      (1.0 - least(CAST(strlen(text) AS DOUBLE) /
         |        (CAST(image_width AS DOUBLE) * image_height * 3.0) * 2.0, 1.0)) * 0.4,
         |      0.0), 1.0), 6) AS a
         |  FROM meta)
         |SELECT art.doc_id, image_width, image_height,
         |  a AS image_compression_artifacts, e AS image_information_entropy,
         |  (image_width >= 1024 AND image_height >= 1024 AND a <= 0.8 AND e >= 3.0) AS keep
         |FROM art JOIN ent ON art.doc_id = ent.doc_id""".stripMargin,

    "dedup_phash" ->
      s"""SELECT ${hexInt("text", 15)} AS phash, min(doc_id) AS keep_id,
         |  count(*) AS dup_count
         |FROM documents GROUP BY 1""".stripMargin,

    "visual_degradations" ->
      s"""SELECT doc_id,
         |  round(${u01(":cc")}, 6) AS img_vd_color_cast,
         |  round(${u01(":blur")}, 6) AS img_vd_blurriness,
         |  round(${u01(":wm")}, 6) AS img_vd_watermark,
         |  round(${u01(":noise")}, 6) AS img_vd_noise,
         |  round(1.0 - (${u01(":blur")} + ${u01(":noise")}) / 2.0, 6) AS img_vd_overall_quality
         |FROM documents""".stripMargin,

    "aesthetic_aigc" ->
      s"""SELECT doc_id,
         |  round(${u01(":aes")} * 10.0, 6) AS aesthetic_score,
         |  round(${u01(":aigc")}, 6) AS aigc_score,
         |  ${u01(":aigc")} > 0.5 AS is_aigc
         |FROM documents""".stripMargin,

    "clip_embedding_stub" -> {
      val comps = (0 until 8).map(i =>
        s"CAST(${hexInt("text", 4).replace("1, 4", s"${4 * i + 1}, 4")} AS DOUBLE) / 65536.0")
      val sumSq = comps.map(c => s"($c) * ($c)").mkString(" + ")
      val arr = comps.mkString("[", ", ", "]")
      s"""WITH raw AS (
         |  SELECT doc_id, $arr AS v, sqrt($sumSq) AS nrm FROM documents)
         |SELECT doc_id, CAST(i - 1 AS INT) AS pos,
         |  round(CASE WHEN nrm = 0 THEN v[CAST(i AS INT)]
         |             ELSE v[CAST(i AS INT)] / nrm END, 6) AS v
         |FROM raw, range(1, 9) r(i)""".stripMargin
    },

    "visual_degradations_model" -> {
      // Frozen DegradationModel literals (e0 forces DOUBLE, not DECIMAL).
      // Features per doc over the raw payload: f0 entropy, f2 max-bin
      // concentration, f3 mean adjacent |Δ| / 255 (f1 weight is 0).
      val (bw0, bw2, bw3, bb) = ("3.968314738099e0", "87.068250739264e0",
        "-65.810381762838e0", "-24.345681871329e0")
      val (nw0, nw2, nw3, nb) = ("3.334949272463e0", "-87.257819573567e0",
        "35.358368249793e0", "-19.221955574168e0")
      s"""WITH chars AS (
         |  SELECT doc_id, i, ord(substr(text, CAST(i AS INT), 1)) AS v
         |  FROM (SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i FROM documents)),
         |grad AS (
         |  -- rows here are the len-1 adjacent diffs, so count(*) IS the
         |  -- gradient denominator
         |  SELECT doc_id, sum(CAST(abs(v - pv) AS DOUBLE)) / (count(*) * 255.0) AS g
         |  FROM (SELECT doc_id, v, lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
         |        FROM chars)
         |  WHERE pv IS NOT NULL GROUP BY doc_id),
         |counts AS (SELECT doc_id, v, count(*) AS n FROM chars GROUP BY 1, 2),
         |tot AS (SELECT doc_id, sum(n) AS total FROM counts GROUP BY 1),
         |feat AS (
         |  SELECT counts.doc_id,
         |    -sum((CAST(n AS DOUBLE) / total) * log2(CAST(n AS DOUBLE) / total)) AS ent,
         |    CAST(max(n) AS DOUBLE) / max(total) AS mx
         |  FROM counts JOIN tot ON counts.doc_id = tot.doc_id
         |  GROUP BY counts.doc_id),
         |z AS (
         |  SELECT feat.doc_id,
         |    1.0 / (1.0 + exp(-($bb + $bw0 * ent + $bw2 * mx + $bw3 * g))) AS b,
         |    1.0 / (1.0 + exp(-($nb + $nw0 * ent + $nw2 * mx + $nw3 * g))) AS nn
         |  FROM feat JOIN grad ON feat.doc_id = grad.doc_id)
         |SELECT doc_id, round(b, 6) AS vd_blur, round(nn, 6) AS vd_noise,
         |  round(1.0 - (b + nn) / 2.0, 6) AS vd_overall_quality
         |FROM z""".stripMargin
    },

    "visual_degradations_model4" -> {
      // Frozen 4-head literals. Extended features over the raw payload
      // (channel = byte position mod 3, bright = byte >= 192): exact
      // integer sums divided in DOUBLE, so Spark's Long-sum/count and
      // DuckDB's sum/count produce bit-identical means. The z
      // expressions add terms in LinearHead.score's fold order.
      val (bw0, bw2, bw3, bb) = ("3.968314738099e0", "87.068250739264e0",
        "-65.810381762838e0", "-24.345681871329e0")
      val (nw0, nw2, nw3, nb) = ("3.334949272463e0", "-87.257819573567e0",
        "35.358368249793e0", "-19.221955574168e0")
      val (cw0, cw2, cw3, cw4, cw5, cw6, cb) = ("-2.489407697757e0",
        "99.317779152040e0", "0.683312401859e0", "17.960377692471e0",
        "8.096287626977e0", "-1.201873238026e0", "1.472931060870e0")
      val (ww0, ww2, ww3, ww4, ww5, ww6, wb) = ("-0.090185007253e0",
        "-27.658972798286e0", "-7.234551509359e0", "-2.781098508723e0",
        "-2.842240094542e0", "18.790626064846e0", "-1.624767577290e0")
      s"""WITH chars AS (
         |  SELECT doc_id, i, ord(substr(text, CAST(i AS INT), 1)) AS v
         |  FROM (SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i FROM documents)),
         |grad AS (
         |  SELECT doc_id, sum(CAST(abs(v - pv) AS DOUBLE)) / (count(*) * 255.0) AS g
         |  FROM (SELECT doc_id, v, lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
         |        FROM chars)
         |  WHERE pv IS NOT NULL GROUP BY doc_id),
         |counts AS (SELECT doc_id, v, count(*) AS n FROM chars GROUP BY 1, 2),
         |tot AS (SELECT doc_id, sum(n) AS total FROM counts GROUP BY 1),
         |feat AS (
         |  SELECT counts.doc_id,
         |    -sum((CAST(n AS DOUBLE) / total) * log2(CAST(n AS DOUBLE) / total)) AS ent,
         |    CAST(max(n) AS DOUBLE) / max(total) AS mx
         |  FROM counts JOIN tot ON counts.doc_id = tot.doc_id
         |  GROUP BY counts.doc_id),
         |ch AS (
         |  -- COALESCE mirrors the kernel's ns(k)==0 -> mean 0.0 guard
         |  -- (DegradationFeatures.fromBytesExt): a payload under 3
         |  -- bytes has an empty channel, and NULL here would poison
         |  -- every downstream score where Scala emits a finite one
         |  SELECT doc_id,
         |    COALESCE(CAST(sum(CASE WHEN (i - 1) % 3 = 0 THEN v END) AS DOUBLE) /
         |      count(CASE WHEN (i - 1) % 3 = 0 THEN 1 END), 0.0) AS m0,
         |    COALESCE(CAST(sum(CASE WHEN (i - 1) % 3 = 1 THEN v END) AS DOUBLE) /
         |      count(CASE WHEN (i - 1) % 3 = 1 THEN 1 END), 0.0) AS m1,
         |    COALESCE(CAST(sum(CASE WHEN (i - 1) % 3 = 2 THEN v END) AS DOUBLE) /
         |      count(CASE WHEN (i - 1) % 3 = 2 THEN 1 END), 0.0) AS m2,
         |    CAST(sum(CASE WHEN v >= 192 THEN 1 ELSE 0 END) AS DOUBLE) /
         |      count(*) AS hi
         |  FROM chars GROUP BY doc_id),
         |ext AS (
         |  SELECT doc_id, abs(m0 - m2) / 255.0 AS c1,
         |    abs(2.0 * m1 - m0 - m2) / 510.0 AS c2, hi
         |  FROM ch),
         |z AS (
         |  SELECT feat.doc_id,
         |    1.0 / (1.0 + exp(-($cb + $cw0 * ent + $cw2 * mx + $cw3 * g + $cw4 * c1 + $cw5 * c2 + $cw6 * hi))) AS cc,
         |    1.0 / (1.0 + exp(-($bb + $bw0 * ent + $bw2 * mx + $bw3 * g))) AS b,
         |    1.0 / (1.0 + exp(-($wb + $ww0 * ent + $ww2 * mx + $ww3 * g + $ww4 * c1 + $ww5 * c2 + $ww6 * hi))) AS wm,
         |    1.0 / (1.0 + exp(-($nb + $nw0 * ent + $nw2 * mx + $nw3 * g))) AS nn
         |  FROM feat JOIN grad ON feat.doc_id = grad.doc_id
         |            JOIN ext ON feat.doc_id = ext.doc_id)
         |SELECT doc_id, round(cc, 6) AS vd_color_cast, round(b, 6) AS vd_blur,
         |  round(wm, 6) AS vd_watermark, round(nn, 6) AS vd_noise,
         |  round(1.0 - (cc + b + wm + nn) / 4.0, 6) AS vd_overall_quality
         |FROM z""".stripMargin
    },

    "aesthetic_model" -> {
      // Frozen AestheticModel literals (e0 forces DOUBLE, not DECIMAL).
      val (w0, w2, w3, b) = ("0.890283633421e0", "3.300127956354e0",
        "1.558579626861e0", "-4.225720882871e0")
      s"""WITH chars AS (
         |  SELECT doc_id, i, ord(substr(text, CAST(i AS INT), 1)) AS v
         |  FROM (SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i FROM documents)),
         |grad AS (
         |  SELECT doc_id, sum(CAST(abs(v - pv) AS DOUBLE)) / (count(*) * 255.0) AS g
         |  FROM (SELECT doc_id, v, lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
         |        FROM chars)
         |  WHERE pv IS NOT NULL GROUP BY doc_id),
         |counts AS (SELECT doc_id, v, count(*) AS n FROM chars GROUP BY 1, 2),
         |tot AS (SELECT doc_id, sum(n) AS total FROM counts GROUP BY 1),
         |feat AS (
         |  SELECT counts.doc_id,
         |    -sum((CAST(n AS DOUBLE) / total) * log2(CAST(n AS DOUBLE) / total)) AS ent,
         |    CAST(max(n) AS DOUBLE) / max(total) AS mx
         |  FROM counts JOIN tot ON counts.doc_id = tot.doc_id
         |  GROUP BY counts.doc_id),
         |z AS (
         |  SELECT feat.doc_id, $b + $w0 * ent + $w2 * mx + $w3 * g AS zz
         |  FROM feat JOIN grad ON feat.doc_id = grad.doc_id)
         |SELECT doc_id,
         |  round(least(10.0, greatest(1.0, 1.0 + 9.0 * zz)), 6) AS aesthetic_model_score
         |FROM z""".stripMargin
    },

    "aigc_model" -> {
      // Frozen AigcModel literals (e0 forces DOUBLE, not DECIMAL).
      val (w0, w2, w3, b) = ("-9.199317769838e0", "283.894886292268e0",
        "-2.301330268906e0", "44.391805860583e0")
      s"""WITH chars AS (
         |  SELECT doc_id, i, ord(substr(text, CAST(i AS INT), 1)) AS v
         |  FROM (SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i FROM documents)),
         |grad AS (
         |  SELECT doc_id, sum(CAST(abs(v - pv) AS DOUBLE)) / (count(*) * 255.0) AS g
         |  FROM (SELECT doc_id, v, lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
         |        FROM chars)
         |  WHERE pv IS NOT NULL GROUP BY doc_id),
         |counts AS (SELECT doc_id, v, count(*) AS n FROM chars GROUP BY 1, 2),
         |tot AS (SELECT doc_id, sum(n) AS total FROM counts GROUP BY 1),
         |feat AS (
         |  SELECT counts.doc_id,
         |    -sum((CAST(n AS DOUBLE) / total) * log2(CAST(n AS DOUBLE) / total)) AS ent,
         |    CAST(max(n) AS DOUBLE) / max(total) AS mx
         |  FROM counts JOIN tot ON counts.doc_id = tot.doc_id
         |  GROUP BY counts.doc_id),
         |z AS (
         |  SELECT feat.doc_id,
         |    1.0 / (1.0 + exp(-($b + $w0 * ent + $w2 * mx + $w3 * g))) AS sc
         |  FROM feat JOIN grad ON feat.doc_id = grad.doc_id)
         |SELECT doc_id, round(sc, 6) AS aigc_score, sc > 0.5 AS is_aigc FROM z""".stripMargin
    },

    "quality_classifier" -> {
      val stops = graft.functions.TextFns.defaultStopwords
        .map(w => s"'$w'").mkString(", ")
      val toks = "string_split_regex(trim(text), '\\s+')"
      s"""WITH f AS (
         |  SELECT doc_id,
         |    least(CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len($toks) END AS DOUBLE) / 100.0, 1.0) AS f1,
         |    CASE WHEN length(trim(text)) = 0 THEN 0.0 ELSE
         |      CAST(len(list_filter($toks, t -> t IN ($stops))) AS DOUBLE) / len($toks) END AS f2,
         |    CASE WHEN length(text) = 0 THEN 0.0 ELSE
         |      CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) / length(text) END AS f3,
         |    CASE WHEN length(text) = 0 THEN 0.0 ELSE
         |      CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS DOUBLE) / length(text) END AS f4,
         |    least((CASE WHEN length(trim(text)) = 0 THEN 0.0 ELSE
         |      CAST(list_aggregate(list_transform($toks, t -> length(t)), 'sum') AS DOUBLE) / len($toks) END) / 10.0, 1.0) AS f5
         |  FROM documents),
         |z AS (SELECT doc_id,
         |  f1 * 2.0 + f2 * 3.0 + f3 * -4.0 + f4 * 1.5 + f5 * 0.5 + -2.0 AS z FROM f)
         |SELECT doc_id, round(1.0 / (1.0 + exp(-z)), 4) AS clf_score,
         |  1.0 / (1.0 + exp(-z)) > 0.5 AS clf_label
         |FROM z""".stripMargin
    },

    "trained_embedding" ->
      s"""WITH ${embArrCtes("documents", "t")}
         |SELECT doc_id, CAST(i AS INT) AS pos,
         |  round(arr[CAST(i + 1 AS INT)], 6) AS v
         |FROM tarr, range(0, 8) r(i)""".stripMargin,

    "clip_score_filter" ->
      s"""WITH caps AS (SELECT doc_id, reverse(text) AS text FROM documents),
         |${embArrCtes("documents", "i")},
         |${embArrCtes("caps", "c")}
         |SELECT i.doc_id,
         |  round(list_cosine_similarity(i.arr, c.arr), 6) AS clip_score,
         |  round(list_cosine_similarity(i.arr, c.arr), 6) >= 0.99 AS clip_keep
         |FROM iarr i JOIN carr c ON i.doc_id = c.doc_id""".stripMargin,

    // dual towers replayed, full cross cosines, rank per direction
    // (ties to the smaller candidate id), hit-within-k averaged
    "crossmodal_recall" -> {
      val legs = for (d <- Seq("i2t", "t2i"); k <- Seq(1, 5)) yield
        s"""SELECT '$d' AS direction, $k AS k,
           |  round(avg(h), 6) AS recall, count(*) AS n_queries FROM (
           |  SELECT qid, max(CASE WHEN cid = qid AND rn <= $k
           |    THEN 1 ELSE 0 END) AS h
           |  FROM $d GROUP BY qid)""".stripMargin
      s"""WITH caps AS (SELECT doc_id, reverse(text) AS text FROM documents),
         |${embArrCtes("documents", "i")},
         |${embArrCtes("caps", "c")},
         |i2t AS (
         |  SELECT qid, cid, row_number() OVER (
         |    PARTITION BY qid ORDER BY cos DESC, cid ASC) AS rn FROM (
         |    SELECT i.doc_id AS qid, c.doc_id AS cid,
         |      round(list_cosine_similarity(i.arr, c.arr), 6) AS cos
         |    FROM iarr i, carr c WHERE i.doc_id % 17 = 0)),
         |t2i AS (
         |  SELECT qid, cid, row_number() OVER (
         |    PARTITION BY qid ORDER BY cos DESC, cid ASC) AS rn FROM (
         |    SELECT c.doc_id AS qid, i.doc_id AS cid,
         |      round(list_cosine_similarity(i.arr, c.arr), 6) AS cos
         |    FROM iarr i, carr c WHERE c.doc_id % 17 = 0))
         |${legs.mkString("", "\nUNION ALL\n", "")}""".stripMargin
    }
  )

  /** SQL twin of the frozen TrainedEmbedding projection as a chain of
    * `pfx`-prefixed CTE definitions over `src` (any relation providing
    * (doc_id, text)); the final CTE `${pfx}arr` is (doc_id,
    * arr DOUBLE[8]) holding the FLOAT-cast normalized embedding —
    * exactly the float32 values the Scala kernel emits, widened back to
    * double. Literals interpolate straight from the Scala constants
    * (single source of truth; e0 forces DOUBLE, not DECIMAL).
    * Features: global entropy / log1p(len) / max-bin / gradient +
    * per-quarter entropy & gradient, quarter = ((i-1)*4)//len;
    * boundary-straddling pairs count only for the global gradient,
    * matching EmbeddingFeatures.fromValues. */
  private[queries] def embArrCtes(src: String, pfx: String): String = {
    val p = graft.operators.ml.TrainedEmbedding.projection
    def lit(v: Double): String = f"($v%.12fe0)"
    val zs = (0 until 12).map(j => s"((f$j - ${lit(p.mean(j))}) / ${lit(p.std(j))})")
    val es = p.components.zipWithIndex.map { case (c, ci) =>
      c.zip(zs).map { case (w, z) => s"${lit(w)} * $z" }
        .mkString("(", " + ", s") AS e$ci")
    }
    val eNames = (0 until 8).map(i => s"e$i")
    val sumSq = eNames.map(e => s"$e * $e").mkString(" + ")
    val arr = eNames.map(e => s"$e / nrm").mkString("[", ", ", "]")
    val segEnt = (0 until 4).map(s =>
      s"coalesce(max(CASE WHEN se.seg = $s THEN se.es END), 0.0) AS f${4 + s}")
    val segGrad = (0 until 4).map(s =>
      s"coalesce(max(CASE WHEN sg.seg = $s THEN sg.gs END), 0.0) AS f${8 + s}")
    s"""${pfx}chars AS (
       |  SELECT doc_id, i, ord(substr(text, CAST(i AS INT), 1)) AS v,
       |    CAST(((i - 1) * 4) // length(text) AS INT) AS seg
       |  FROM (SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i FROM $src)),
       |${pfx}lagd AS (
       |  SELECT doc_id, v, seg,
       |    lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv,
       |    lag(seg) OVER (PARTITION BY doc_id ORDER BY i) AS pseg
       |  FROM ${pfx}chars),
       |${pfx}grad AS (
       |  SELECT doc_id, sum(CAST(abs(v - pv) AS DOUBLE)) / (count(*) * 255.0) AS g
       |  FROM ${pfx}lagd WHERE pv IS NOT NULL GROUP BY doc_id),
       |${pfx}seggrad AS (
       |  SELECT doc_id, seg, sum(CAST(abs(v - pv) AS DOUBLE)) / (count(*) * 255.0) AS gs
       |  FROM ${pfx}lagd WHERE pv IS NOT NULL AND seg = pseg GROUP BY doc_id, seg),
       |${pfx}counts AS (SELECT doc_id, v, count(*) AS n FROM ${pfx}chars GROUP BY 1, 2),
       |${pfx}tot AS (SELECT doc_id, sum(n) AS total FROM ${pfx}counts GROUP BY 1),
       |${pfx}gfeat AS (
       |  SELECT ${pfx}counts.doc_id,
       |    -sum((CAST(n AS DOUBLE) / total) * log2(CAST(n AS DOUBLE) / total)) AS f0,
       |    ln(1.0 + max(total)) AS f1,
       |    CAST(max(n) AS DOUBLE) / max(total) AS f2
       |  FROM ${pfx}counts JOIN ${pfx}tot ON ${pfx}counts.doc_id = ${pfx}tot.doc_id
       |  GROUP BY ${pfx}counts.doc_id),
       |${pfx}segcounts AS (
       |  SELECT doc_id, seg, v, count(*) AS n FROM ${pfx}chars GROUP BY 1, 2, 3),
       |${pfx}segtot AS (
       |  SELECT doc_id, seg, sum(n) AS stot FROM ${pfx}segcounts GROUP BY 1, 2),
       |${pfx}segent AS (
       |  SELECT sc.doc_id, sc.seg,
       |    -sum((CAST(n AS DOUBLE) / stot) * log2(CAST(n AS DOUBLE) / stot)) AS es
       |  FROM ${pfx}segcounts sc JOIN ${pfx}segtot st
       |    ON sc.doc_id = st.doc_id AND sc.seg = st.seg
       |  GROUP BY sc.doc_id, sc.seg),
       |${pfx}feat AS (
       |  SELECT ${pfx}gfeat.doc_id, ${pfx}gfeat.f0, ${pfx}gfeat.f1, ${pfx}gfeat.f2,
       |    ${pfx}grad.g AS f3,
       |    ${segEnt.mkString(",\n    ")},
       |    ${segGrad.mkString(",\n    ")}
       |  FROM ${pfx}gfeat
       |  JOIN ${pfx}grad ON ${pfx}gfeat.doc_id = ${pfx}grad.doc_id
       |  LEFT JOIN ${pfx}segent se ON ${pfx}gfeat.doc_id = se.doc_id
       |  LEFT JOIN ${pfx}seggrad sg ON ${pfx}gfeat.doc_id = sg.doc_id
       |  GROUP BY ${pfx}gfeat.doc_id, ${pfx}gfeat.f0, ${pfx}gfeat.f1, ${pfx}gfeat.f2,
       |    ${pfx}grad.g),
       |${pfx}proj AS (SELECT doc_id, ${es.mkString(",\n  ")} FROM ${pfx}feat),
       |${pfx}nrmed AS (
       |  SELECT doc_id, sqrt($sumSq) AS nrm, ${eNames.mkString(", ")} FROM ${pfx}proj),
       |${pfx}arr AS (
       |  SELECT doc_id, list_transform(
       |    CASE WHEN nrm = 0 THEN [${eNames.mkString(", ")}] ELSE $arr END,
       |    x -> CAST(CAST(x AS FLOAT) AS DOUBLE)) AS arr
       |  FROM ${pfx}nrmed)""".stripMargin
  }
}
