package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-probe corpus builder: replicates the driver's read-only
  * testdata into /tmp with offset keys, preserving per-group join
  * shape so a k× corpus answers "does the plan survive k× the data",
  * not "what does k× duplicate skew do". Map-only (lit-array explode):
  * no shuffle, no driver collect of data rows.
  *
  * {{{
  * graft.ScaleData docs  <sfDir> <outDir> <copies> [--skew <source> <extraCopies>]
  * graft.ScaleData tpch  <sfDir> <outDir> <copies>
  * }}}
  *
  * `docs` writes a `documents.parquet` whose replicas are textually
  * UNIQUE (a per-replica suffix rides at the end of `text`) and carry a
  * materialized `url` column — the CommonCrawl record shape the
  * reference's text pipeline benchmark reads (README §Performance: 1M
  * records, URL filter → length filter; each record has a distinct
  * url). `--skew` appends extra replicas of ONE source so a single
  * source holds most of the corpus — the design point of
  * [[graft.operators.text.TokenBudgetSampler.sampleSharded]].
  *
  * `tpch` replicates the fact tables (orders/lineitem on offset order
  * keys, events on offset user+event ids) and copies the dimensions
  * unchanged — k× facts over the same catalog, the way a warehouse
  * actually grows; per-user event streams stay user-sized.
  */
object ScaleData {

  /** Shard the SMALL base first, then explode: the k× multiplication is
    * map-side on 32 partitions — never a shuffle of the replicated
    * rows (a post-explode repartition of 60M wide rows is exactly the
    * kind of avoidable shuffle §5 bans). */
  private def replicate(df: DataFrame, copies: Int, parts: Int = 32): DataFrame =
    df.repartition(parts).withColumn("__c", explode(lit((0 until copies).toArray)))

  /** 1M-style text corpus: unique text + unique url per replica.
    * Written as `files` parquet files — the sharded layout a real
    * crawl corpus has (one 30 MB file would make the whole downstream
    * scan ONE task; CommonCrawl ships thousands of WARC shards). */
  def docs(spark: SparkSession, sfDir: String, outDir: String, copies: Int,
      skew: Option[(String, Int)] = None, files: Int = 32): Long = {
    val base = Tables.load(spark, sfDir, "documents")
    val rep = skew match {
      case None => replicate(base, copies, files)
      case Some((source, extra)) =>
        // the skewed source gets `extra` additional replicas, appended
        // with copy indices above the uniform range so doc_ids stay unique
        replicate(base, copies, files).union(
          replicate(base.filter(col("source") === source), extra, files)
            .withColumn("__c", col("__c") + lit(copies)))
    }
    val out = rep   // replicate() already sharded the base `files`-wide
      .withColumn("doc_id", col("doc_id") + col("__c").cast("long") * 100000000L)
      // suffix at the END: first-40-char url slugs stay stable, but
      // every replica is a distinct document to hashing/dedup — the
      // reference's 1M CommonCrawl records are likewise ~all distinct
      .withColumn("text", concat(col("text"), lit(" r"), col("__c")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("url",
        concat(lit("https://"), col("source"), lit(".example.com/r"),
          col("__c"), lit("/"),
          replace(substring(col("text"), 1, 40), lit(" "), lit("-"))))
      .drop("__c")
    out.write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    spark.read.parquet(s"$outDir/documents.parquet").count()
  }

  /** k× TPC-H facts + events over unchanged dimensions. Facts land as
    * 32 files each (same sharded-layout reasoning as [[docs]]).
    *
    * `growDims = true` (`tpchfull`) replicates customer/supplier/part
    * too, with CONSISTENT key remapping: fact copy c references dim
    * copy c (o_custkey, l_suppkey, l_partkey all offset by the same
    * copy index), so every copy is a closed universe — per-order
    * supplier counts, per-customer order profiles, and join
    * selectivities are exactly the base corpus's. This is the corpus
    * that stresses the r8 broadcast policy: at 100× the dimensions
    * outgrow autoBroadcastJoinThreshold and the size-driven joins must
    * flip to SMJ (a forced hint would instead OOM the driver at real
    * scale). nation/region stay fixed — they are bounded in TPC-H
    * itself, which is why THEIR hints are legitimate. */
  def tpch(spark: SparkSession, sfDir: String, outDir: String, copies: Int,
      growDims: Boolean = false): Unit = {
    val orderOff = 1000000L   // > max o_orderkey at any driver sf
    val userOff = 1000000L
    val eventOff = 100000000L
    val dimOff = 1000000L     // > max cust/supp/part key at any driver sf
    // The closed-universe invariant (copy c references dim copy c,
    // no cross-copy collisions) silently breaks if a base key ever
    // reaches the offset (part crosses 1M around sf5) — fail fast
    // instead of writing a corrupt probe corpus.
    def assertOff(table: String, keyCol: String, off: Long): Unit = {
      val mx = Tables.load(spark, sfDir, table)
        .agg(max(col(keyCol)).cast("long")).head.getLong(0)
      require(mx < off,
        s"$table.$keyCol max=$mx >= offset $off: replication would " +
          "collide keys across copies; raise the offset for this seed SF")
    }
    assertOff("orders", "o_orderkey", orderOff)
    assertOff("events", "user_id", userOff)
    assertOff("events", "event_id", eventOff)
    if (growDims) {
      assertOff("customer", "c_custkey", dimOff)
      assertOff("supplier", "s_suppkey", dimOff)
      assertOff("part", "p_partkey", dimOff)
    }
    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
    def off(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      c + col("__c").cast("long") * dimOff

    val ordersRep = replicate(Tables.load(spark, sfDir, "orders"), copies)
      .withColumn("o_orderkey", col("o_orderkey") + col("__c").cast("long") * orderOff)
    val lineitemRep = replicate(Tables.load(spark, sfDir, "lineitem"), copies)
      .withColumn("l_orderkey", col("l_orderkey") + col("__c").cast("long") * orderOff)
    if (growDims) {
      write(ordersRep.withColumn("o_custkey", off(col("o_custkey")))
        .drop("__c"), "orders")
      write(lineitemRep
        .withColumn("l_suppkey", off(col("l_suppkey")))
        .withColumn("l_partkey", off(col("l_partkey")))
        .drop("__c"), "lineitem")
      write(replicate(Tables.load(spark, sfDir, "customer"), copies)
        .withColumn("c_custkey", off(col("c_custkey"))).drop("__c"), "customer")
      write(replicate(Tables.load(spark, sfDir, "supplier"), copies)
        .withColumn("s_suppkey", off(col("s_suppkey"))).drop("__c"), "supplier")
      write(replicate(Tables.load(spark, sfDir, "part"), copies)
        .withColumn("p_partkey", off(col("p_partkey"))).drop("__c"), "part")
    } else {
      write(ordersRep.drop("__c"), "orders")
      write(lineitemRep.drop("__c"), "lineitem")
      Seq("customer", "supplier", "part").foreach { t =>
        write(Tables.load(spark, sfDir, t), t)
      }
    }
    // events scale by USERS (offset user ids): per-user session/asof/
    // range shape is preserved, the group count grows k×
    write(replicate(Tables.load(spark, sfDir, "events"), copies)
      .withColumn("user_id", col("user_id") + col("__c").cast("long") * userOff)
      .withColumn("event_id", col("event_id") + col("__c").cast("long") * eventOff)
      .drop("__c"), "events")
    Seq("region", "nation").foreach { t =>
      write(Tables.load(spark, sfDir, t), t)
    }
  }

  /** Synthetic embedding corpus with PLANTED near-dup structure, for
    * vector-family scale probes. Ids come in groups of 5: members 0–3
    * carry independent hash-derived vectors, member 4 is a perturbed
    * copy of member 0 (cos ≈ 0.9998 ≫ any sane threshold), so exactly
    * 20% of rows have one in-corpus near-dup and the expected semantic-
    * dedup drop rate is a known quantity, not a vibe. Components are
    * murmur3-derived rationals in [-1, 1) — any engine evaluating the
    * same formula reproduces the corpus bit-for-bit. Written sharded
    * (`files`) like [[docs]] so the scan parallelizes. */
  def vectors(spark: SparkSession, outDir: String, n: Long,
      dim: Int = 64, files: Int = 32): Long = {
    val baseId = when(col("id") % 5 === 4, col("id") - 3)
      .otherwise(col("id") + 1) // +1 keeps hash seeds off the trivial 0 row
    val vec = transform(sequence(lit(0), lit(dim - 1)), d =>
      (hash(baseId, d).cast("double") / 2147483648.0 +
        when(col("id") % 5 === 4,
          hash(col("id"), d, lit(7)).cast("double") / 2147483648.0 * 0.01)
          .otherwise(lit(0.0))).cast("float"))
    val out = spark.range(n).repartition(files)
      .select(col("id").as("vec_id"), vec.as("embedding"))
    out.write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    spark.read.parquet(s"$outDir/embeddings.parquet").count()
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: ScaleData docs|tpch|tpchfull|vectors <sfDir> <outDir> <copies|nRows> [--skew <source> <extraCopies>]")
    val Array(cmd, sfDir, outDir, copies) = args.take(4)
    val spark = GraftSession.local("graft-scaledata")
    try cmd match {
      case "docs" =>
        val skew = args.indexOf("--skew") match {
          case i if i >= 0 && i + 2 < args.length =>
            Some((args(i + 1), args(i + 2).toInt))
          case _ => None
        }
        val n = docs(spark, sfDir, outDir, copies.toInt, skew)
        println(s"[graft] wrote $n documents to $outDir")
      case "tpch" =>
        tpch(spark, sfDir, outDir, copies.toInt)
        println(s"[graft] wrote ${copies}x tpch facts + events to $outDir")
      case "tpchfull" =>
        tpch(spark, sfDir, outDir, copies.toInt, growDims = true)
        println(s"[graft] wrote ${copies}x tpch facts + dims + events to $outDir")
      case "vectors" =>
        val n = vectors(spark, outDir, copies.toLong)
        println(s"[graft] wrote $n vectors to $outDir")
      case other => sys.error(s"unknown subcommand $other")
    } finally spark.stop()
  }
}
