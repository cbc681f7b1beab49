package graft

import graft.streaming.StreamingOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming↔batch equivalence over the driver's real parquet tables:
  * each streaming twin (C6 tumbling agg, C5 sessionize, C15 exact
  * dedup) replays the SAME data the oracle-verified batch query reads —
  * chunked into time-ordered files, one micro-batch each — and its
  * final emitted result must equal the batch result as a set. This is
  * what upgrades the streaming surface from "spec'd in isolation" to
  * "computes the oracle-checked answer incrementally".
  *
  * `GRAFT_EQ_SF` overrides the table dir (default sf0.01, the
  * correctness-gate scale; run once with sf0.1 for the bench scale).
  */
class StreamingEquivalenceSpec extends SparkSpec {

  private val sfDir = sys.env.getOrElse("GRAFT_EQ_SF", "/root/testdata/sf0.01")

  /** Drop one DataFrame as the next file of a stream dir. Explicit,
    * strictly-increasing mtimes: the file source replays oldest-first,
    * so chunk order IS event-time order (sessionize state transitions
    * assume per-user time-ordered arrival across micro-batches). */
  private def appendChunk(streamDir: java.nio.file.Path, df: DataFrame, idx: Int): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_eq_chunk").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
      .toArray.map(_.toString).filter(_.endsWith(".parquet")).head
    val dst = streamDir.resolve(f"chunk_$idx%03d.parquet")
    java.nio.file.Files.move(java.nio.file.Paths.get(part), dst)
    assert(dst.toFile.setLastModified(1700000000000L + idx * 60000L))
  }

  /** Split events into `n` global time-range chunks (quantile-free:
    * equal spans of [min, max] — order matters, balance doesn't). */
  private def timeChunks(ev: DataFrame, n: Int): Seq[DataFrame] = {
    val Array(lo, hi) = ev.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
      .collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
    val step = (hi - lo) / n + 1
    (0 until n).map { i =>
      ev.filter(unix_micros(col("ts")) >= lo + i.toLong * step &&
        unix_micros(col("ts")) < lo + (i + 1).toLong * step)
    }
  }

  private def streamOf(dir: java.nio.file.Path): DataFrame = {
    val schema = spark.read.parquet(dir.toString).schema
    spark.readStream.option("maxFilesPerTrigger", 1)
      .schema(schema).parquet(dir.toString)
  }

  test("C6: streaming tumblingAgg replay equals the oracle-verified batch aggregate") {
    val dir = java.nio.file.Files.createTempDirectory("graft_eq_tumbling")
    val ev = Tables.load(spark, sfDir, "events")
      .select("event_id", "user_id", "ts", "event_type", "value")
    timeChunks(ev, 4).zipWithIndex.foreach { case (c, i) => appendChunk(dir, c, i) }
    val q = StreamingOps.tumblingAgg(streamOf(dir))
      .writeStream.format("memory").queryName("eq_tumbling")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("eq_tumbling")
        .select(col("window_start"), col("event_type"), col("n"),
          round(col("total_value"), 2).as("tv"))
        .collect().map(_.toSeq).toSet
      val want = SparkEntry.queries("events_tumbling_agg")(spark, sfDir)
        .select(col("hour"), col("event_type"), col("n"), col("total_value"))
        .collect().map(_.toSeq).toSet
      assert(got.size == want.size, s"row counts differ: ${got.size} vs ${want.size}")
      assert(got == want)
    } finally q.stop()
  }

  test("C5: streaming sessionize replay emits exactly the batch session set") {
    val dir = java.nio.file.Files.createTempDirectory("graft_eq_sess")
    val ev = Tables.load(spark, sfDir, "events")
      .select("event_id", "user_id", "ts", "event_type", "value")
    val chunks = timeChunks(ev, 4)
    chunks.zipWithIndex.foreach { case (c, i) => appendChunk(dir, c, i) }
    // one far-future "closer" event per user proves every real
    // session's gap, so the finite replay closes ALL of them; the
    // closer sessions themselves stay open and are never emitted —
    // emitted sessions == the batch query's full session set.
    val closers = ev.select("user_id").distinct()
      .withColumn("event_id", lit(-1L))
      .withColumn("ts", to_timestamp(lit("2099-01-01 00:00:00")))
      .withColumn("event_type", lit("closer"))
      .withColumn("value", lit(0.0))
      .select("event_id", "user_id", "ts", "event_type", "value")
    val q = StreamingOps.sessionize(streamOf(dir), gapMinutes = 30)
      .writeStream.format("memory").queryName("eq_sessionize")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      appendChunk(dir, closers, chunks.size)
      q.processAllAvailable()
      // multiset compare (duplicate (user, n, value) triples are real:
      // many 1-event sessions share values)
      def ms(rows: Array[Seq[Any]]): Map[Seq[Any], Int] =
        rows.toSeq.groupBy(identity).map { case (k, v) => k -> v.size }
      val got = ms(spark.table("eq_sessionize")
        .select(col("user_id"), col("n_events"), round(col("value"), 2))
        .collect().map(_.toSeq))
      val want = ms(SparkEntry.queries("events_sessionize")(spark, sfDir)
        .select(col("user_id"), col("n_events"), col("session_value"))
        .collect().map(_.toSeq))
      assert(got.values.sum == want.values.sum,
        s"session counts differ: ${got.values.sum} vs ${want.values.sum}")
      assert(got == want)
    } finally q.stop()
  }

  test("C19: stream-stream interval join replay equals the batch RangeJoin") {
    // Replays the real events table through clickPurchaseJoin (two file
    // streams over the SAME time-ordered chunk dir, one filtered to
    // clicks, one to purchases) and compares with the batch twin built
    // from RangeJoin — the operator behind the oracle-checked
    // events_range_join key. Chunks are global time ranges, so the
    // 30-min watermark never drops a row and inner-join state eviction
    // can never evict a click that a later purchase could still match
    // (evicted ⇒ click_ts + 10 min < watermark ≤ any future purchase_ts).
    val dir = java.nio.file.Files.createTempDirectory("graft_eq_ssjoin")
    val ev = Tables.load(spark, sfDir, "events")
      .select("event_id", "user_id", "ts", "event_type", "value")
    timeChunks(ev, 4).zipWithIndex.foreach { case (c, i) => appendChunk(dir, c, i) }
    val clicksS = streamOf(dir).filter(col("event_type") === "click")
    val purchS = streamOf(dir).filter(col("event_type") === "purchase")
    val q = StreamingOps.clickPurchaseJoin(clicksS, purchS, intervalMinutes = 10)
      .writeStream.format("memory").queryName("eq_ssjoin")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("eq_ssjoin")
        .select(col("click_id"), col("purchase_id"),
          round(col("purchase_value"), 2).as("pv"))
        .collect().map(_.toSeq).toSet
      // batch twin: purchases are points, clicks carry the trailing
      // [click_ts, click_ts + 10 min] interval — same predicate
      // clickPurchaseJoin declares, executed by the bucketized batch op
      val clicksB = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          unix_micros(col("ts")).as("t0"))
        .withColumn("t1", col("t0") + 600000000L)
      val purchB = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("value").as("purchase_value"), unix_micros(col("ts")).as("pt"))
      val want = graft.operators.join.RangeJoin(Seq("user_id"), 600000000L)(
          purchB, "pt", clicksB, "t0", "t1")
        .select(col("click_id"), col("purchase_id"),
          round(col("purchase_value"), 2).as("pv"))
        .collect().map(_.toSeq).toSet
      assert(want.nonEmpty, "batch twin produced no pairs — corpus too sparse to prove anything")
      assert(got.size == want.size, s"pair counts differ: ${got.size} vs ${want.size}")
      assert(got == want)
    } finally q.stop()
  }

  test("C15: streaming exact dedup keeps one survivor per batch content class") {
    // corpus = the real documents + one exact copy of every 10th doc
    // under a new id: the copies arrive in a LATER micro-batch, so the
    // keep-first stream must keep all originals and drop every copy.
    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    val copies = docs.filter(col("doc_id") % 10 === 0)
      .withColumn("doc_id", col("doc_id") + lit(100000000L))
    val base = docs.withColumn("ts", to_timestamp(lit("2024-01-01 00:00:00")))
    val later = copies.withColumn("ts", to_timestamp(lit("2024-01-01 01:00:00")))
    val dir = java.nio.file.Files.createTempDirectory("graft_eq_dedup")
    appendChunk(dir, base.select("doc_id", "ts", "text"), 0)
    appendChunk(dir, later.select("doc_id", "ts", "text"), 1)
    val q = StreamingOps.dedupStream(streamOf(dir), watermark = "10 hours")
      .writeStream.format("memory").queryName("eq_dedup")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val kept = spark.table("eq_dedup").select("doc_id", "content_hash")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      // batch truth over the SAME corpus (originals + copies)
      val batch = graft.operators.dedup.ExactDedup()
        .groups(docs.union(copies))
        .select(col("content_hash"), col("dup_count"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      // one survivor per batch content class, same class set
      assert(kept.length == batch.size,
        s"survivor count ${kept.length} != distinct content classes ${batch.size}")
      assert(kept.map(_._2).toSet == batch.keySet)
      // and no later-arriving copy ever displaces its original
      assert(kept.forall(_._1 < 100000000L), "a second-batch copy survived")
    } finally q.stop()
  }

  test("C5: a late-but-within-gap cross-batch event never regresses the session cursor") {
    // r16 review finding: s.copy(last = ts) on an out-of-order
    // CROSS-batch event pulled the cursor back, faking a gap later.
    // user 7: 10:00 (batch 1), 9:50 late (batch 2, within the 30-min
    // gap), 10:25 (batch 3 — 25 min after the TRUE last event, so the
    // session must stay open), closer at 12:00 (batch 4).
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Double)]
    val base = 1700000000000000L // us
    def m(min: Long) = base + min * 60000000L
    spark.catalog.dropTempView("eq_late_sess")
    val q = StreamingOps.sessionize(
        mem.toDF().toDF("user_id", "ts_us", "value")
          .withColumn("ts", org.apache.spark.sql.functions
            .timestamp_micros(org.apache.spark.sql.functions.col("ts_us"))),
        gapMinutes = 30)
      .writeStream.format("memory").queryName("eq_late_sess")
      .outputMode("append").start()
    try {
      mem.addData(Seq((7L, m(0), 1.0))); q.processAllAvailable()
      mem.addData(Seq((7L, m(-10), 1.0))); q.processAllAvailable() // late, within gap
      mem.addData(Seq((7L, m(25), 1.0))); q.processAllAvailable()  // 25 < 30 min after m(0)
      mem.addData(Seq((7L, m(120), 1.0))); q.processAllAvailable() // closes the session
      val out = spark.table("eq_late_sess")
        .select("user_id", "n_events", "duration_us")
        .as[(Long, Long, Long)].collect()
      // ONE closed session of all three merged events, spanning
      // m(-10)..m(25) — a regressed cursor split it at m(25)
      assert(out.toSeq == Seq((7L, 3L, 35L * 60000000L)), out.toSeq)
    } finally q.stop()
  }
}
