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
    * promises: catalog tables bucketed (and sorted) by `term` —
    * `<name>_postings` (term, doc, tf), `<name>_vocab` (term, df),
    * `<name>_lens` (doc, dl — from the corpus, so zero-token docs keep
    * their row and N stays the corpus count), `<name>_stats` (1 row:
    * n, sum_dl). Pay the (term, doc) shuffle ONCE at build; every
    * query batch after that reads its matching-term postings without
    * re-tokenizing the corpus, and postings⋈vocab is a zero-Exchange,
    * zero-Sort merge join (same bucketing, sorted by term — the
    * BucketedSearchSpec plan audit). df is a build-time aggregate of
    * the bucketed postings (no shuffle). */
  /** Drop a prior index of this name, including a warehouse directory
    * left by ANOTHER session's build (the catalog entry dies with its
    * session, the files do not — saveAsTable then refuses the
    * location). */
  private def dropIndexTables(spark: org.apache.spark.sql.SparkSession,
      name: String): Unit = {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    for (t <- Seq("postings", "vocab", "lens", "stats")) {
      spark.sql(s"DROP TABLE IF EXISTS ${name}_$t")
      val p = new org.apache.hadoop.fs.Path(s"$wh/${name.toLowerCase}_$t")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
    }
  }

  /** Re-register a [[buildIndex]]-written index in a FRESH session's
    * catalog: the parquet files outlive the session, the (in-memory)
    * catalog entries do not — without re-attachment a new session
    * cannot `spark.table()` them at all, let alone recover the bucket
    * metadata the Exchange-/Sort-free merge join depends on. Schemas
    * come from the files themselves; bucket/sort specs are re-declared
    * per table (postings/vocab by term sorted, lens by the id). Works
    * under any target name, so one on-disk index can serve many
    * sessions. */
  def attachIndex(spark: org.apache.spark.sql.SparkSession, dirOfName: String,
      as: String, buckets: Int = 8): Unit = {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    def attach(suffix: String, bucketCol: String, sorted: Boolean): Unit = {
      val loc = s"$wh/${dirOfName.toLowerCase}_$suffix"
      val ddl = spark.read.parquet(loc).schema.toDDL
      val sortClause = if (sorted) s"SORTED BY ($bucketCol) " else ""
      spark.sql(s"""CREATE TABLE ${as}_$suffix ($ddl) USING parquet
        |CLUSTERED BY ($bucketCol) ${sortClause}INTO $buckets BUCKETS
        |LOCATION '$loc'""".stripMargin)
    }
    attach("postings", "term", sorted = true)
    attach("vocab", "term", sorted = true)
    attach("lens", idCol, sorted = false)
    val statsLoc = s"$wh/${dirOfName.toLowerCase}_stats"
    val statsDdl = spark.read.parquet(statsLoc).schema.toDDL
    spark.sql(
      s"CREATE TABLE ${as}_stats ($statsDdl) USING parquet LOCATION '$statsLoc'")
  }

  def buildIndex(docs: DataFrame, name: String, buckets: Int = 8): Unit = {
    import graft.sources.Sinks.bucketedTable
    dropIndexTables(docs.sparkSession, name)
    // repartition(buckets, term) before the bucketed save: Spark's
    // bucket hash IS HashPartitioning's, so each write task then holds
    // exactly one bucket and each bucket lands in ONE file — the
    // precondition for the scan to expose its sortBy ordering (multiple
    // files per bucket force a Sort back into every downstream merge
    // join; one file per bucket makes postings⋈vocab Exchange- AND
    // Sort-free, which BucketedSearchSpec audits).
    bucketedTable(postings(docs).repartition(buckets, col("term")),
      s"${name}_postings", Seq("term"), buckets, Seq("term"))
    val spark = docs.sparkSession
    bucketedTable(
      spark.table(s"${name}_postings").groupBy("term")
        .agg(count(lit(1)).as("df")).repartition(buckets, col("term")),
      s"${name}_vocab", Seq("term"), buckets, Seq("term"))
    val dls = docs.select(col(idCol), size(terms(col(textCol))).as("dl"))
    bucketedTable(dls.repartition(buckets, col(idCol)),
      s"${name}_lens", Seq(idCol), buckets)
    // coalesce: an empty corpus's sum is null, and the serving path
    // reads sum_dl as a long (refreshIndex already coalesces its side)
    dls.agg(count(lit(1)).as("n"),
        coalesce(sum(col("dl")), lit(0L)).as("sum_dl"))
      .write.mode("overwrite").format("parquet")
      .saveAsTable(s"${name}_stats")
  }

  /** Roll a persisted index forward with a NEW batch of documents (ids
    * disjoint from the indexed corpus — the incremental-ingest
    * contract, same as IncrementalMinHashDedup) WITHOUT re-tokenizing
    * the indexed corpus: the old side contributes its narrow
    * postings/lens tables (read back bucketed), only the batch pays
    * tokenize+aggregate, df per term re-derives from the merged
    * postings with a zero-shuffle bucketed aggregate, and stats add
    * one bounded row. The merged index writes under `newName` — the
    * versioned-artifact convention (readers flip to the new name after
    * the write completes; the old version stays intact, so a crashed
    * refresh never corrupts a live index — the Sinks snapshot-commit
    * pointer discipline applied to catalog tables). At 100 TB the
    * postings read+rewrite is the cost of a narrow (term, doc, tf)
    * table, not of the corpus text. */
  def refreshIndex(newDocs: DataFrame, name: String, newName: String,
      buckets: Int = 8): Unit = {
    require(newName != name,
      "refresh writes a new index version; flip readers after the write")
    import graft.sources.Sinks.bucketedTable
    val spark = newDocs.sparkSession
    dropIndexTables(spark, newName)
    bucketedTable(
      spark.table(s"${name}_postings").unionByName(postings(newDocs))
        .repartition(buckets, col("term")),
      s"${newName}_postings", Seq("term"), buckets, Seq("term"))
    bucketedTable(
      spark.table(s"${newName}_postings").groupBy("term")
        .agg(count(lit(1)).as("df")).repartition(buckets, col("term")),
      s"${newName}_vocab", Seq("term"), buckets, Seq("term"))
    val newLens = newDocs.select(col(idCol), size(terms(col(textCol))).as("dl"))
    bucketedTable(
      spark.table(s"${name}_lens").unionByName(newLens)
        .repartition(buckets, col(idCol)),
      s"${newName}_lens", Seq(idCol), buckets)
    spark.table(s"${name}_stats")
      .unionByName(newLens.agg(count(lit(1)).as("n"),
        coalesce(sum(col("dl")), lit(0L)).as("sum_dl")))
      .agg(sum("n").as("n"), sum("sum_dl").as("sum_dl"))
      .write.mode("overwrite").format("parquet")
      .saveAsTable(s"${newName}_stats")
  }

  /** [[search]] against a [[buildIndex]]-persisted index — identical
    * results (same formula, same rounding, same tiebreaks), none of
    * the per-batch corpus work: the corpus tokenize/aggregate passes
    * are replaced by reads of the bucketed postings/vocab/lens tables,
    * the query-term set broadcasts into the postings scan, and the only
    * corpus-proportional cost left is the pruned matching-term postings
    * themselves. */
  def searchIndexed(spark: org.apache.spark.sql.SparkSession, name: String,
      queries: DataFrame, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val stats = spark.table(s"${name}_stats").head()
    val n = stats.getLong(0)
    val avgdl = if (n == 0) 1.0 else stats.getLong(1).toDouble / n.toDouble
    val qt = queries.select(col("query_id"),
      explode(array_distinct(terms(col(textCol)))).as("term"))
    val post = spark.table(s"${name}_postings")
      .join(broadcast(qt.select("term").distinct()), "term")
    val dfT = spark.table(s"${name}_vocab")
    val perTerm = broadcast(qt)
      .join(post, "term")
      .join(dfT, "term")
      .join(spark.table(s"${name}_lens"), idCol)
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
