package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory tuned for the graft engine.
  *
  * The same conf set is intended for cluster deployment: AQE re-plans
  * undersized shuffles and skewed joins at runtime (LSH buckets and
  * dedup keys are the usual offenders), shuffle partitions are sized to
  * the executor core count rather than Spark's default 200.
  */
object GraftSession {
  /** Env knob as a validated positive int — `local[0]`/`local[-2]` are
    * silently invalid masters and a malformed value should name the
    * variable, not throw a bare NumberFormatException. */
  private def positiveEnvInt(name: String): Option[Int] =
    sys.env.get(name).map { v =>
      val n = scala.util.Try(v.trim.toInt).getOrElse(
        throw new IllegalArgumentException(
          s"$name must be a positive integer, got '$v'"))
      require(n > 0, s"$name must be a positive integer, got '$v'")
      n
    }

  /** `SPARK_GRAFT_CPUS`: both the `local[n]` core count and the
    * default shuffle-partition count — one knob keeps them consistent. */
  private[graft] def configuredCpus: Option[Int] =
    positiveEnvInt("SPARK_GRAFT_CPUS")

  def builder(appName: String = "graft"): SparkSession.Builder =
    SparkSession
      .builder()
      .appName(appName)
      // Defaults to the core count; SPARK_GRAFT_SHUFFLE_PARTITIONS
      // decouples it for scale probes. Partition count must grow with
      // the DATA, not the cores: a shuffle stage's per-task state
      // (hash-aggregate maps, join buffers) is partition-sized, and at
      // 100× data on fixed partitions each task's map outgrows cache —
      // measured on q21@100×: 32→256 partitions cuts the fused
      // SMJ+aggregate stage's per-task state 8× (see SURVEY §5.11).
      // AQE coalesces small partitions back, so oversizing is cheap.
      .config("spark.sql.shuffle.partitions",
        positiveEnvInt("SPARK_GRAFT_SHUFFLE_PARTITIONS")
          .orElse(configuredCpus).getOrElse(32).toString)
      // Scan-split sizing. The 128m default assumes web-scale records
      // (KBs each): a small-record corpus (~30 B/record compressed)
      // bin-packs into one or two scan tasks and serializes the whole
      // pipeline. At 100 TB you RAISE this; on a benchmark corpus of
      // tiny records you lower it so the scan parallelizes. Same knob,
      // opposite direction — see SURVEY §5.
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PARTITION_BYTES", "128m"))
      .config("spark.sql.files.openCostInBytes",
        sys.env.getOrElse("SPARK_GRAFT_OPEN_COST_BYTES", "4194304"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  /** Local session for tests / benches. `SPARK_GRAFT_CPUS` pins the
    * core count (it already sizes shuffle partitions in [[builder]] —
    * one knob keeps the two consistent, e.g. an 8-core like-for-like
    * run against the reference's published 8-core benchmark). */
  def local(appName: String = "graft",
      cores: Int = configuredCpus
        .getOrElse(Runtime.getRuntime.availableProcessors())): SparkSession = {
    val s = builder(appName).master(s"local[$cores]").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** Test-table access. All graft operators are plain DataFrame
  * transforms; these helpers only standardize the parquet layout used
  * by the driver's test data.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts has shipped as INT64 TIMESTAMP(NANOS) (vectorized
      // reader rejects it — read nanos as long, floor to micros) and as
      // tz-naive TIMESTAMP(MICROS) (reads as TIMESTAMP_NTZ, which
      // unix_micros/watermarks reject). Normalize both to TIMESTAMP;
      // the session timezone is UTC, so the NTZ cast preserves the
      // wall-clock values the DuckDB oracle sees.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts",
            org.apache.spark.sql.functions.timestamp_micros(
              org.apache.spark.sql.functions.expr("ts DIV 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          // cast to the CONCRETE type: "timestamp" resolves through the
          // spark.sql.timestampType session conf, and under
          // TIMESTAMP_NTZ it would be a no-op cast that leaves
          // unix_micros/watermark consumers rejecting the column
          raw.withColumn("ts",
            org.apache.spark.sql.functions.col("ts")
              .cast(org.apache.spark.sql.types.TimestampType))
        case _ => raw
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
  }
}
