package graft.operators.image

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal binary-column operators.
  *
  * The image/audio codecs the reference uses (PIL, imagehash, torch —
  * reference operators/refiners) are not present in this
  * environment, so the *decode* kernels here are deterministic stubs
  * (md5-derived), clearly marked below. Everything around them — binary
  * column handling, output schema, filter semantics, keep-first dedup,
  * partitioning behavior — is the real production shape: swap
  * [[StubKernels]] for a real decoder (an Arrow-batched `mapPartitions`
  * / Pandas-UDF slot) and the operators are unchanged.
  */
object StubKernels {
  /** 24-bit uniform U[0,1) derived from md5(bytes || tag) — the stand-in
    * for any model-based scalar score (aesthetic, AIGC, degradations). */
  def u01(bytes: Column, tag: String): Column =
    conv(substring(md5(concat(bytes, lit(tag))), 1, 6), 16, 10)
      .cast("double") / 16777216.0

  /** Stub dimension decode: deterministic pseudo-dimensions from the
    * content hash. REAL decoders replace exactly this expression. */
  def dim(bytes: Column, tag: String, max: Int): Column =
    (conv(substring(md5(concat(bytes, lit(tag))), 1, 6), 16, 10)
      .cast("long") % max + 1).cast("int")
}

/** Image format sniffing from magic bytes — this kernel is REAL (no
  * codec needed): JPEG/PNG/GIF/BMP/WEBP/TIFF prefixes, else UNKNOWN.
  * reference: operators/refiners/image_metadata.py (PIL `img.format`). */
object ImageFormat {
  def sniff(bytes: Column): Column = {
    val h8 = upper(hex(substring(bytes, 1, 8)))
    when(h8.startsWith("FFD8FF"), "JPEG")
      .when(h8.startsWith("89504E47"), "PNG")
      .when(h8.startsWith("47494638"), "GIF")
      .when(h8.startsWith("424D"), "BMP")
      .when(h8.startsWith("52494646"), "WEBP")
      .when(h8.startsWith("49492A00") || h8.startsWith("4D4D002A"), "TIFF")
      .otherwise("UNKNOWN")
  }
}

/** reference: operators/refiners/image_metadata.py — width, height,
  * file size, format. */
case class ImageMetadata(imageCol: String = "image") {
  def apply(df: DataFrame): DataFrame = {
    val b = col(imageCol)
    df.withColumn("image_file_size_bytes", octet_length(b).cast("long"))
      .withColumn("image_format", ImageFormat.sniff(b))
      .withColumn("image_width", StubKernels.dim(b, ":w", 4096))
      .withColumn("image_height", StubKernels.dim(b, ":h", 4096))
  }
}

/** reference: operators/refiners/image_technical_quality.py —
  * compression-artifact score + information entropy.
  *
  * Entropy here is REAL Shannon entropy over the byte-value histogram
  * (the reference computes it over pixel channels post-decode; without a
  * codec the byte stream is the honest equivalent). Computed with
  * explode + two-level aggregation — both aggregations get map-side
  * partial combine; at 100 TB prefer the single-pass histogram
  * `Expression` (TODO noted in SURVEY §7).
  */
case class ImageTechnicalQuality(imageCol: String = "image",
    idCol: String = "doc_id") {

  /** Byte-histogram Shannon entropy as a map-only projection (native
    * [[graft.plans.ByteEntropy]] expression — no shuffle; the composed
    * explode/groupBy formulation shuffles the byte stream twice). */
  def entropy(df: DataFrame): DataFrame =
    df.select(col(idCol),
      round(graft.plans.TextExpressions.byteEntropy(col(imageCol)), 6)
        .as("image_information_entropy"))

  /** Artifact score: stub blockiness blended with the REAL
    * compression-ratio term (file bytes / expected raw size), mirroring
    * image_technical_quality.py:175 `_detect_compression_artifacts`. */
  def artifactScore(bytes: Column, w: Column, h: Column): Column = {
    val ratio = octet_length(bytes).cast("double") /
      (w.cast("double") * h.cast("double") * 3.0)
    val compressionScore = lit(1.0) - least(ratio * 2.0, lit(1.0))
    val blockiness = StubKernels.u01(bytes, ":block")
    round(least(greatest(blockiness * 0.6 + compressionScore * 0.4, lit(0.0)), lit(1.0)), 6)
  }

  def apply(df: DataFrame): DataFrame = {
    val withMeta =
      if (df.columns.contains("image_width")) df else ImageMetadata(imageCol)(df)
    withMeta
      .withColumn("image_compression_artifacts",
        artifactScore(col(imageCol), col("image_width"), col("image_height")))
      .withColumn("image_information_entropy",
        round(graft.plans.TextExpressions.byteEntropy(col(imageCol)), 6))
  }
}

/** reference: operators/filters/image_quality_filter.py — conjunction
  * over refined metrics. */
case class ImageQualityFilter(
    minWidth: Int = 256,
    minHeight: Int = 256,
    maxCompressionArtifacts: Double = 0.8,
    minInformationEntropy: Double = 3.0) {

  def predicate: Column =
    col("image_width") >= minWidth &&
      col("image_height") >= minHeight &&
      col("image_compression_artifacts") <= maxCompressionArtifacts &&
      col("image_information_entropy") >= minInformationEntropy

  def apply(df: DataFrame): DataFrame = df.filter(predicate)
}

/** reference: operators/dedup/image_phash_dedup.py — perceptual-hash
  * keep-first dedup. The DCT phash needs a decoder; the stub key is a
  * 60-bit content hash with identical dedup semantics. */
case class ImagePhashDedup(imageCol: String = "image", idCol: String = "doc_id") {
  def phash(bytes: Column): Column =
    conv(substring(md5(bytes), 1, 15), 16, 10).cast("long")

  def apply(df: DataFrame): DataFrame =
    graft.operators.dedup.KeepFirst(df, phash(col(imageCol)), idCol)

  def groups(df: DataFrame): DataFrame =
    df.select(phash(col(imageCol)).as("phash"), col(idCol))
      .groupBy("phash").agg(min(idCol).as("keep_id"), count(lit(1)).as("dup_count"))
}

/** Hamming-radius pHash near-dup — the scale extension of
  * [[ImagePhashDedup]]'s exact-key collapse (reference
  * operators/dedup/image_phash_dedup.py dedups on the exact hash
  * string only). A re-encoded / recompressed / resized copy of an
  * image flips a handful of pHash bits, so exact-key dedup misses
  * exactly the duplicates a perceptual hash exists to catch; the
  * standard acceptance test is hamming distance ≤ r on the 64-bit
  * hash.
  *
  * Scale shape — never pairwise over the corpus:
  *   1. EXACT COLLAPSE FIRST: group by full phash → (phash, min id,
  *      count). Identical bytes / identical hashes (the dup-heavy web
  *      shape, hamming 0) collapse before any join, and this is also
  *      the skew cap: the hottest possible key (a flood of blank
  *      images sharing one phash) becomes ONE rep row.
  *   2. BANDED EQUI-JOIN on the DISTINCT hashes only: the hash splits
  *      into `bands` disjoint bit-bands; by pigeonhole a pair within
  *      hamming radius r < bands agrees EXACTLY on some band, so a
  *      per-band equi-join on (band, bits) finds every candidate —
  *      this is EXACT recall, not the LSH S-curve (the simhash probe
  *      tables get the same guarantee from C(n,≤r) XOR probes, which
  *      at 60 bits × r=3 would be 36k probes/row; 6 bands is 6
  *      rows/rep).
  *   3. Verify candidates with one codegen'd `bit_count(a XOR b) ≤ r`.
  *
  * Keep rule matches the family: doc d survives iff NO doc with a
  * smaller id is within hamming r. Computable entirely at rep level:
  * non-min members of a hash group drop (distance 0 to their rep);
  * rep m_p drops iff some neighboring hash q (d(p,q) ≤ r) has
  * m_q < m_p. */
case class PhashHammingDedup(
    radius: Int = 2,
    bands: Int = 6,
    nbits: Int = 60,
    phashCol: String = "phash",
    idCol: String = "doc_id") {
  require(radius >= 0 && radius < bands,
    s"pigeonhole exactness needs radius < bands (got $radius >= $bands)")
  require(nbits % bands == 0, "bands must divide nbits")

  private val width = nbits / bands

  /** (phash, keep_id, dup_count): one row per distinct hash. */
  def reps(df: DataFrame): DataFrame =
    df.select(col(phashCol), col(idCol))
      .groupBy(phashCol)
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Distinct-hash neighbor pairs within the radius (pa < pb). */
  def repPairs(reps: DataFrame): DataFrame = {
    val banded = reps.select(col(phashCol),
      posexplode(array((0 until bands).map(j =>
        shiftrightunsigned(col(phashCol), j * width)
          .bitwiseAND(lit((1L << width) - 1))): _*)).as(Seq("__band", "__key")))
    banded.select(col(phashCol).as("pa"), col("__band"), col("__key"))
      .join(banded.select(col(phashCol).as("pb"), col("__band"), col("__key")),
        Seq("__band", "__key"))
      .filter(col("pa") < col("pb"))
      .select("pa", "pb").distinct()
      .filter(bit_count(col("pa").bitwiseXOR(col("pb"))) <= radius)
  }

  /** Every input row + `keep` flag (keep-first within hamming radius).
    * Rows with a NULL hash (an undecodable payload, a too-short audio
    * clip) pass through kept — a null key would otherwise silently
    * vanish through the rep join, and "no signature" must never mean
    * "dropped". The input is lineage-cut first ([[graft.operators.Lineage]]):
    * this operator references it four times (null split + reps + back
    * join), which composed lazily after expression-deriving stages
    * re-runs the whole upstream per reference. */
  def flagged(df0: DataFrame): DataFrame = {
    val df = graft.operators.Lineage.cut(df0)
    val nulls = df.filter(col(phashCol).isNull).withColumn("keep", lit(true))
    val nn = df.filter(col(phashCol).isNotNull)
    flaggedNonNull(nn).unionByName(nulls)
  }

  private def flaggedNonNull(df: DataFrame): DataFrame = {
    val r = reps(df)
    val pairs = repPairs(r)
    val m = r.select(col(phashCol), col("keep_id"))
    // neighbor rep with the smaller min id kills the other side's rep
    val dropped = pairs
      .join(m.select(col(phashCol).as("pa"), col("keep_id").as("ma")), Seq("pa"))
      .join(m.select(col(phashCol).as("pb"), col("keep_id").as("mb")), Seq("pb"))
      .select(when(col("ma") < col("mb"), col("mb")).otherwise(col("ma"))
        .as("__dropped_rep"))
      .distinct()
    df.join(m, Seq(phashCol))
      .join(dropped, col("keep_id") === col("__dropped_rep"), "left_outer")
      .withColumn("keep",
        col(idCol) === col("keep_id") && col("__dropped_rep").isNull)
      .drop("keep_id", "__dropped_rep")
  }

  /** Surviving rows only. */
  def apply(df: DataFrame): DataFrame =
    flagged(df).filter(col("keep")).drop("keep")

  /** The persisted incremental-probe state: DISTINCT non-null hashes of
    * every row REACHING this stage (the B26 `indexRowsAll` convention
    * applied to signatures — reaching, not surviving, because the keep
    * rule drops on collision with ANY smaller-id doc whether or not
    * that doc itself survived). One narrow column; band-explode happens
    * at probe time. */
  def indexRows(df: DataFrame): DataFrame =
    df.filter(col(phashCol).isNotNull).select(col(phashCol)).distinct()

  private def bandedOf(hashes: DataFrame, as: String): DataFrame =
    hashes.select(col(phashCol).as(as),
      posexplode(array((0 until bands).map(j =>
        shiftrightunsigned(col(phashCol), j * width)
          .bitwiseAND(lit((1L << width) - 1))): _*)).as(Seq("__band", "__key")))

  /** Batch rows surviving against a persisted [[indexRows]] state PLUS
    * batch-internal keep-first — equal to the batch operator over the
    * concatenated corpus whenever every batch id sorts above every
    * indexed id (the incremental-ingest contract): a batch doc then
    * drops iff an INDEX hash sits within the radius (any indexed doc is
    * smaller) or a smaller-id batch doc does ([[flagged]]). The index
    * never re-reads its media — the probe is a banded equi-join on the
    * narrow hash column, bounded by distinct hashes, with one codegen'd
    * hamming verify. Null-hash batch rows pass, matching the batch op. */
  def survivorsIndexed(index: DataFrame, batch: DataFrame): DataFrame = {
    val hit = bandedOf(batch.filter(col(phashCol).isNotNull)
        .select(col(phashCol)).distinct(), "__bh")
      .join(bandedOf(index, "__ih"), Seq("__band", "__key"))
      .filter(bit_count(col("__bh").bitwiseXOR(col("__ih"))) <= radius)
      .select(col("__bh").as(phashCol)).distinct()
    flagged(batch).filter(col("keep")).drop("keep")
      .join(hit, Seq(phashCol), "left_anti")
  }
}

/** reference: operators/refiners/image_visual_degradations.py — model
  * scores (color cast / blur / watermark / noise / overall). Stub model. */
case class VisualDegradations(imageCol: String = "image") {
  def apply(df: DataFrame): DataFrame = {
    val b = col(imageCol)
    df.withColumn("img_vd_color_cast", round(StubKernels.u01(b, ":cc"), 6))
      .withColumn("img_vd_blurriness", round(StubKernels.u01(b, ":blur"), 6))
      .withColumn("img_vd_watermark", round(StubKernels.u01(b, ":wm"), 6))
      .withColumn("img_vd_noise", round(StubKernels.u01(b, ":noise"), 6))
      .withColumn("img_vd_overall_quality",
        round(lit(1.0) - (StubKernels.u01(b, ":blur") + StubKernels.u01(b, ":noise")) / 2.0, 6))
  }
}

/** reference: operators/refiners/image_aesthetic_quality.py +
  * image_aigc_detector.py — scalar model scores + threshold flag. */
case class AestheticAigc(imageCol: String = "image", aigcThreshold: Double = 0.5) {
  def apply(df: DataFrame): DataFrame = {
    val b = col(imageCol)
    df.withColumn("aesthetic_score", round(StubKernels.u01(b, ":aes") * 10.0, 6))
      .withColumn("aigc_score", round(StubKernels.u01(b, ":aigc"), 6))
      .withColumn("is_aigc", StubKernels.u01(b, ":aigc") > aigcThreshold)
  }
}

/** reference: operators/refiners/image_clip_embedding.py +
  * image_siglip_embedding.py — embedding column refiners (the reference
  * registers both; they differ only in model and output column). Stub
  * model: 8-dim md5-chunk vector, L2-normalized; the real model slots
  * into an Arrow-batched mapPartitions with the same (binary in,
  * array<double> out) contract. */
case class ClipEmbeddingStub(imageCol: String = "image", dim: Int = 8,
    outputCol: String = "clip_embedding") {
  require(dim <= 8, "md5 provides 8 16-bit chunks")

  def embedding(bytes: Column): Column = {
    val h = md5(bytes)
    val raw = array((0 until dim).map(i =>
      conv(substring(h, 4 * i + 1, 4), 16, 10).cast("double") / 65536.0): _*)
    graft.functions.VecFns.l2Normalize(raw)
  }

  def apply(df: DataFrame): DataFrame =
    df.withColumn(outputCol, embedding(col(imageCol)))
}
