package graft.operators.text

import graft.functions.TextFns.{normalizeText, wsTokens}
import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** BM25 full-text ranking (Robertson/Spärck Jones; the Lucene-variant
  * idf) — lexical retrieval over the corpus: the standard tool for
  * mining in-domain documents by keyword, building retrieval-eval
  * candidate sets, and the lexical leg of hybrid (BM25 + vector)
  * search next to [[graft.operators.vector.BruteForceKnn]].
  *
  *   score(q, d) = Σ_{t ∈ q} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
  *   idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)
  *
  * Scale shape: the inverted index ((term, doc, tf) postings + (term,
  * df) vocabulary + (doc, dl) lengths) is built with map-side-combined
  * aggregates and is the natural thing to PERSIST between query
  * batches (parquet bucketed by term at 100 TB). A query batch is
  * bounded (a request, not a corpus), so it broadcasts into the
  * postings hash join on term; scoring is one map-side-combinable sum
  * per (query, doc); ranking pays a per-query window with group-limit
  * pushdown — the BruteForceKnn discipline (round to 6 dp BEFORE
  * ranking, ties to the smaller doc id, so results are engine-exact).
  * The two corpus scalars (N, avgdl numerator) collect to the driver
  * once — bounded like KMeans' k-row action, avoiding a 1-row
  * nested-loop attach. */
case class Bm25(
    k1: Double = 1.2,
    b: Double = 0.75,
    idCol: String = "doc_id",
    textCol: String = "text") {

  private def terms(t: org.apache.spark.sql.Column) =
    wsTokens(normalizeText(t))

  /** (term, doc, tf) — one row per distinct term per doc. */
  def postings(docs: DataFrame): DataFrame =
    docs.select(col(idCol), explode(terms(col(textCol))).as("term"))
      .groupBy("term", idCol).agg(count(lit(1)).as("tf"))

  /** (doc, dl) token lengths — from the persisted postings (dl = Σ tf)
    * when the index is already materialized. */
  def docLens(post: DataFrame): DataFrame =
    post.groupBy(idCol).agg(sum("tf").cast("int").as("dl"))

  /** Top-k docs per query by BM25. `queries` = (query_id, text).
    *
    * tf and df are only ever consumed for QUERY terms, so the token
    * stream is pruned by a broadcast semi-join on the (tiny, distinct)
    * query-term set BEFORE the postings aggregate — the corpus-wide
    * (term, doc) shuffle collapses to matching-term tokens only, and
    * df per query term is unchanged (a term's df counts its own
    * postings, which pruning preserves). Doc lengths stay a map-only
    * `size` over the corpus, cached narrow so the stats action and the
    * scoring join share one tokenize pass. (The tempting alternative
    * measured WORSE at 1M docs: checkpointing the full postings table
    * to share it pays a 40M-row materialization, 66 → 76 s; the pruned
    * plan with the cached lengths runs 66 → 37.5 s, 1.76×.) */
  def search(docs: DataFrame, queries: DataFrame, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // eager localCheckpoint, not persist: the narrow (doc, dl) table is
    // consumed twice (stats action below + the scoring join) and must
    // be shared, but a persist() here would leak a cache entry per
    // search() call in a long-lived session (the returned frame is
    // lazy, so there is no safe in-operator unpersist point).
    // Checkpointed blocks are released by the ContextCleaner when the
    // returned plan is dropped.
    val dls = docs.select(col(idCol), size(terms(col(textCol))).as("dl"))
      .localCheckpoint(true)
    val stats = dls.agg(count(lit(1)), sum(col("dl"))).head()
    val n = stats.getLong(0)
    // empty corpus: sum is null and avgdl is moot (no postings → no
    // scored rows); 1.0 keeps the expression tree finite
    val avgdl = if (n == 0) 1.0 else stats.getLong(1).toDouble / n.toDouble
    val qt = queries.select(col("query_id"),
      explode(array_distinct(terms(col(textCol)))).as("term"))
    val post = docs.select(col(idCol), explode(terms(col(textCol))).as("term"))
      .join(broadcast(qt.select("term").distinct()), "term")
      .groupBy("term", idCol).agg(count(lit(1)).as("tf"))
    val dfT = post.groupBy("term").agg(count(lit(1)).as("df"))
    val perTerm = broadcast(qt)
      .join(post, "term")
      .join(dfT, "term")
      .join(dls, idCol)
      .withColumn("__idf",
        log((lit(n.toDouble) - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("__s", col("__idf") * (col("tf") * lit(k1 + 1.0)) /
        (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / avgdl)))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col(idCol).asc)
    perTerm.groupBy(col("query_id"), col(idCol))
      .agg(round(sum("__s"), 6).as("score"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** Persist the inverted index as the artifact the scale story
    * promises — a SEGMENTED (LSM-style) layout. A version `name` is a
    * tiny `<name>_manifest` table (seg, gen) naming its immutable
    * SEGMENTS; each segment `<seg>` holds a disjoint slice of the
    * corpus as catalog tables bucketed (and sorted) by `term` —
    * `<seg>_postings` (term, doc, tf), `<seg>_vocab` (term, df),
    * `<seg>_lens` (doc, dl), `<seg>_stats` (1 row: n, sum_dl).
    * [[buildIndex]] writes one segment; [[refreshIndex]] APPENDS a
    * batch-sized segment and a new manifest — cost ∝ batch, never the
    * corpus (the B26 `batch=<id>` discipline applied to search
    * indexes); [[compactIndex]] folds segments back to one. Readers
    * resolve segments through ONE manifest, so the r14 visibility
    * contract holds: versions are immutable (a refresh writes only
    * `newName`-prefixed files), and the manifest — written LAST — is
    * the version's commit record. Because segment doc sets are
    * disjoint, corpus df(term) = Σ per-segment df and (N, Σdl) add,
    * so serving computes exact global BM25 from segment tables. */
  private def segTables = Seq("postings", "vocab", "lens", "stats")

  /** The index's physical layout at `buckets` — recorded in every
    * manifest this index writes, so attach/refresh/compact read the
    * bucket count (and each table kind's cluster/sort cols) from the
    * ARTIFACT instead of trusting a flag (the r16 silent-mis-pruning
    * trap: attaching a 64-bucket build as `INTO 8 BUCKETS`). */
  private def indexLayout(buckets: Int): graft.sources.IndexLayout =
    graft.sources.IndexLayout(buckets, Seq(
      ("postings", Seq("term"), Seq("term")),
      ("vocab", Seq("term"), Seq("term")),
      ("lens", Seq(idCol), Nil),
      ("stats", Nil, Nil)))

  /** Drop a version of this name — its manifest and the segment this
    * version OWNS (`<name>_seg_*`); segments inherited from older
    * versions are shared and never touched. Crash-residue clearing and
    * all other commit-protocol semantics live in ONE place:
    * [[graft.sources.SegmentedManifest]]. */
  private def dropIndexTables(spark: org.apache.spark.sql.SparkSession,
      name: String): Unit =
    graft.sources.SegmentedManifest.dropTablesAndDirs(spark,
      segTables.map(t => s"${name}_seg_$t") :+ s"${name}_manifest")

  /** The version's (segment, gen) rows in generation order (hardened
    * read — [[graft.sources.SegmentedManifest.read]]). */
  private[graft] def manifestSegs(spark: org.apache.spark.sql.SparkSession,
      name: String): Seq[(String, Int)] =
    graft.sources.SegmentedManifest.read(spark, name)

  /** The version's segment prefixes in generation order. */
  private[graft] def segments(spark: org.apache.spark.sql.SparkSession,
      name: String): Seq[String] = manifestSegs(spark, name).map(_._1)

  /** The manifest IS the commit record — written last, single file,
    * carrying the version's physical layout. */
  private def writeManifest(spark: org.apache.spark.sql.SparkSession,
      name: String, segs: Seq[(String, Int)], buckets: Int): Unit =
    graft.sources.SegmentedManifest.write(spark, name, segs,
      Some(indexLayout(buckets)))

  /** One immutable segment from `docs` — the only tokenize pass those
    * documents ever pay: postings tokenize once, and vocab, lens AND
    * stats all re-derive from the PERSISTED postings (the previous form
    * re-tokenized the corpus for lens and a third time for stats —
    * guide §1.2 "don't compute things you throw away": dl ≡ Σ tf over
    * the doc's postings, because `wsTokens` never returns an empty
    * array for non-null text, so every tokenizable doc has ≥1 posting
    * row). Docs absent from postings (null text → null token array →
    * explode drops them) re-enter via the left join with dl = null —
    * exactly the dl `size(terms)` gave them — so stats' count(*) still
    * counts them and sum(dl) still skips them. */
  private def writeSegment(docs: DataFrame, seg: String, buckets: Int): Unit = {
    import graft.sources.Sinks.bucketedTable
    val spark = docs.sparkSession
    // repartition(buckets, term) before the bucketed save: Spark's
    // bucket hash IS HashPartitioning's, so each write task then holds
    // exactly one bucket and each bucket lands in ONE file — the
    // precondition for the scan to expose its sortBy ordering (multiple
    // files per bucket force a Sort back into every downstream merge
    // join; one file per bucket makes postings⋈vocab Exchange- AND
    // Sort-free, which BucketedSearchSpec audits).
    bucketedTable(postings(docs).repartition(buckets, col("term")),
      s"${seg}_postings", Seq("term"), buckets, Seq("term"))
    bucketedTable(
      spark.table(s"${seg}_postings").groupBy("term")
        .agg(count(lit(1)).as("df")).repartition(buckets, col("term")),
      s"${seg}_vocab", Seq("term"), buckets, Seq("term"))
    val dls = docs.select(col(idCol))
      .join(docLens(spark.table(s"${seg}_postings")), Seq(idCol), "left")
      .select(col(idCol), col("dl").cast("int").as("dl"))
    bucketedTable(dls.repartition(buckets, col(idCol)),
      s"${seg}_lens", Seq(idCol), buckets)
    // stats from the persisted lens (narrow, one scan — never a third
    // corpus pass); coalesce: an empty batch's sum is null
    spark.table(s"${seg}_lens")
      .agg(count(lit(1)).as("n"),
        coalesce(sum(col("dl")), lit(0L)).as("sum_dl"))
      .write.mode("overwrite").format("parquet")
      .saveAsTable(s"${seg}_stats")
  }

  /** Re-register a [[buildIndex]]-written index in a FRESH session's
    * catalog: the parquet files outlive the session, the (in-memory)
    * catalog entries do not — without re-attachment a new session
    * cannot `spark.table()` them at all, let alone recover the bucket
    * metadata the Exchange-/Sort-free merge join depends on. The
    * manifest parquet is read straight from the warehouse dir. With
    * `as == dirOfName` (the fresh-session case) every listed segment
    * re-attaches under its recorded name and the manifest attaches
    * location-backed; with an alias, segments attach as
    * `<as>_seg<i>_*` external tables over the SAME data files and a
    * new (tiny) manifest under `as` lists them — either way the
    * original index's files are never rewritten and dropping attached
    * tables never deletes them. */
  def attachIndex(spark: org.apache.spark.sql.SparkSession, dirOfName: String,
      as: String, buckets: Option[Int] = None): Unit = {
    import graft.sources.SegmentedManifest.{attachTable, attachVersionPre, readFilesAll, resolveBuckets}
    // the physical layout travels WITH the artifact: bucket count and
    // per-table cluster/sort cols come from the manifest the files were
    // committed with (ONE parquet read serves both the layout and the
    // segment list); an explicit `buckets` only cross-checks
    val (man, layout) = readFilesAll(spark, dirOfName)
    val b = resolveBuckets(layout, buckets, s"bm25 attach $dirOfName")
    def cols(suffix: String, cc: Seq[String], sc: Seq[String]) =
      layout.map(_.colsFor(suffix, cc, sc)).getOrElse((cc, sc))
    // alias-manifest resolvability (original segment prefixes, not
    // catalog-only alias names) is attachVersionPre's contract
    attachVersionPre(spark, dirOfName, as, man, layout) { seg =>
      for (t <- segTables; (cc, sc) = cols(t,
          if (t == "lens") Seq(idCol) else if (t == "stats") Nil else Seq("term"),
          if (t == "postings" || t == "vocab") Seq("term") else Nil))
        attachTable(spark, s"${seg}_$t", s"${seg}_$t", cc, sc, b)
    }
  }

  def buildIndex(docs: DataFrame, name: String, buckets: Int = 8): Unit = {
    val spark = docs.sparkSession
    dropIndexTables(spark, name)
    writeSegment(docs, s"${name}_seg", buckets)
    writeManifest(spark, name, Seq((s"${name}_seg", 0)), buckets)
  }

  /** Roll a persisted index forward with a NEW batch of documents (ids
    * disjoint from the indexed corpus — the incremental-ingest
    * contract, same as IncrementalMinHashDedup) at O(batch) cost: only
    * the batch tokenizes, into ONE new segment `<newName>_seg_*`, and
    * the new version's manifest = the old version's segments + that
    * one. Nothing corpus-sized is read or rewritten — the r14 design
    * rewrote all of postings+lens+vocab per refresh, which B64 paid
    * per micro-batch. The versioned-artifact convention holds: a
    * refresh writes only `newName`-prefixed files (old versions
    * byte-for-byte intact, IndexVisibilitySpec), the manifest is the
    * commit record (written last — a crash beforehand leaves `newName`
    * unreadable and the retry drops the torn segment first), and old
    * segments are SHARED by reference, not copied. Segment count grows
    * one per refresh; fold with [[compactIndex]] on the same schedule
    * as B26's `compact-index`. */
  def refreshIndex(newDocs: DataFrame, name: String, newName: String,
      buckets: Option[Int] = None): Unit = {
    require(newName != name,
      "refresh writes a new index version; flip readers after the write")
    val spark = newDocs.sparkSession
    // the new segment MUST be written at the old segments' bucket
    // count (mixed counts would break every merged bucketed read) —
    // read it from the artifact in the SAME driver read as the segment
    // list, cross-check any explicit flag
    val (old, layout) = graft.sources.SegmentedManifest.readAll(spark, name)
    val b = graft.sources.SegmentedManifest.resolveBuckets(layout, buckets,
      s"bm25 refresh $name")
    dropIndexTables(spark, newName)
    writeSegment(newDocs, s"${newName}_seg", b)
    writeManifest(spark, newName,
      old :+ ((s"${newName}_seg",
        graft.sources.SegmentedManifest.nextGen(old))), b)
  }

  /** Fold a version's segments into ONE segment under `newName` — the
    * scheduled O(index) cost that keeps serving-time segment counts
    * bounded (B26's `compact-index` for the search index). Reads only
    * the narrow persisted tables (no re-tokenize): postings union
    * re-buckets, vocab re-derives from the merged postings (disjoint
    * doc sets ⇒ Σ df is exact, but the groupBy form needs no driver
    * arithmetic), lens union, stats add. Old versions stay intact. */
  def compactIndex(spark: org.apache.spark.sql.SparkSession, name: String,
      newName: String, buckets: Option[Int] = None): Unit = {
    require(newName != name,
      "compaction writes a new index version; flip readers after the write")
    import graft.sources.Sinks.bucketedTable
    val (segPairs, layout) = graft.sources.SegmentedManifest.readAll(spark, name)
    val b = graft.sources.SegmentedManifest.resolveBuckets(layout, buckets,
      s"bm25 compact $name")
    val segs = segPairs.map(_._1)
    dropIndexTables(spark, newName)
    val seg = s"${newName}_seg"
    bucketedTable(
      segs.map(s => spark.table(s"${s}_postings")).reduce(_ unionByName _)
        .repartition(b, col("term")),
      s"${seg}_postings", Seq("term"), b, Seq("term"))
    bucketedTable(
      spark.table(s"${seg}_postings").groupBy("term")
        .agg(count(lit(1)).as("df")).repartition(b, col("term")),
      s"${seg}_vocab", Seq("term"), b, Seq("term"))
    bucketedTable(
      segs.map(s => spark.table(s"${s}_lens")).reduce(_ unionByName _)
        .repartition(b, col(idCol)),
      s"${seg}_lens", Seq(idCol), b)
    segs.map(s => spark.table(s"${s}_stats")).reduce(_ unionByName _)
      .agg(coalesce(sum("n"), lit(0L)).as("n"),
        coalesce(sum("sum_dl"), lit(0L)).as("sum_dl"))
      .write.mode("overwrite").format("parquet")
      .saveAsTable(s"${seg}_stats")
    writeManifest(spark, newName, Seq((seg, 0)), b)
  }

  /** [[search]] against a [[buildIndex]]-persisted index — identical
    * results (same formula, same rounding, same tiebreaks), none of
    * the per-batch corpus work: the corpus tokenize/aggregate passes
    * are replaced by reads of the segments' bucketed
    * postings/vocab/lens tables, the query-term set broadcasts into
    * every postings scan BEFORE the segment union (pushed through it
    * by Catalyst), and the only corpus-proportional cost left is the
    * pruned matching-term postings themselves. Global df is the sum of
    * per-segment dfs over the (tiny) query-term vocabulary rows; (N,
    * avgdl) come from the per-segment stats rows (one bounded driver
    * action over ≤ segment-count rows). */
  def searchIndexed(spark: org.apache.spark.sql.SparkSession, name: String,
      queries: DataFrame, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val segs = segments(spark, name)
    val stats = segs.map(s => spark.table(s"${s}_stats"))
      .reduce(_ unionByName _)
      .agg(coalesce(sum("n"), lit(0L)), coalesce(sum("sum_dl"), lit(0L)))
      .head()
    val n = stats.getLong(0)
    val avgdl = if (n == 0) 1.0 else stats.getLong(1).toDouble / n.toDouble
    val qt = queries.select(col("query_id"),
      explode(array_distinct(terms(col(textCol)))).as("term"))
    val qTerms = broadcast(qt.select("term").distinct())
    val post = segs.map(s => spark.table(s"${s}_postings"))
      .reduce(_ unionByName _)
      .join(qTerms, "term")
    // per-segment df rows pruned to query terms, then summed: exact
    // global df because segment doc sets are disjoint
    val dfT = segs.map(s => spark.table(s"${s}_vocab"))
      .reduce(_ unionByName _)
      .join(qTerms, "term")
      .groupBy("term").agg(sum("df").as("df"))
    val lens = segs.map(s => spark.table(s"${s}_lens"))
      .reduce(_ unionByName _)
    val perTerm = broadcast(qt)
      .join(post, "term")
      .join(dfT, "term")
      .join(lens, idCol)
      .withColumn("__idf",
        log((lit(n.toDouble) - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("__s", col("__idf") * (col("tf") * lit(k1 + 1.0)) /
        (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / avgdl)))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col(idCol).asc)
    perTerm.groupBy(col("query_id"), col(idCol))
      .agg(round(sum("__s"), 6).as("score"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }
}

/** Reciprocal-rank fusion (Cormack 2009) — the standard hybrid-search
  * combiner for a lexical ([[Bm25]]) and a semantic
  * ([[graft.operators.vector.BruteForceKnn]]/IVF/LSH) rank list:
  * rrf(q, d) = Σ_lists 1/(c + rank). Rank-based, so the two scores
  * never need calibrating against each other.
  *
  * Pure composition: a full-outer join of the two (query, doc, rank)
  * tables — each already top-k, so the join input is bounded by
  * k·|queries|, never the corpus — then one re-rank window per query
  * (tiny: ≤ 2k rows per query). Missing-from-one-list docs contribute
  * only their present list's term, the standard convention. */
case class RrfFusion(c: Int = 60, k: Int = 5) {
  def fuse(lex: DataFrame, sem: DataFrame,
      queryCol: String = "query_id", docCol: String = "doc_id",
      rankCol: String = "rnk"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def side(df: DataFrame, out: String) =
      df.select(col(queryCol), col(docCol),
        (lit(1.0) / (lit(c) + col(rankCol))).as(out))
    val joined = side(lex, "__lex").join(side(sem, "__sem"),
      Seq(queryCol, docCol), "full_outer")
      .select(col(queryCol), col(docCol),
        round(coalesce(col("__lex"), lit(0.0)) +
          coalesce(col("__sem"), lit(0.0)), 6).as("rrf"))
    val w = Window.partitionBy(queryCol)
      .orderBy(col("rrf").desc, col(docCol).asc)
    joined.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }
}
