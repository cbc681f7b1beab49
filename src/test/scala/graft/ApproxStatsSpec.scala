package graft

/** Quantitative gate for the sketch family: `events_approx_stats` is
  * the registry's one rows-only CORRECTNESS key (sketch internals are
  * engine-specific, so no hash oracle) — this spec bounds its error
  * against the oracle-verified exact twin instead.
  *
  * Tolerances follow the sketches' own guarantees: Spark's
  * approx_count_distinct is HyperLogLog++ with a 5% default relative
  * standard deviation (assert 3σ = 15%), and approx_percentile at
  * accuracy 10000 guarantees a rank error ≤ n/10000, which on this
  * corpus is a handful of ranks — assert the approx median sits between
  * the exact 45th and 55th percentiles. */
class ApproxStatsSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private val dir = "/root/testdata/sf0.01"

  test("approx sketches stay within their error bounds of the exact twin") {
    val exact = SparkEntry.queries("events_exact_stats")(spark, dir)
    val approx = SparkEntry.queries("events_approx_stats")(spark, dir)
    val bands = Tables.load(spark, dir, "events")
      .groupBy("event_type")
      .agg(round(expr("percentile(value, 0.45)"), 4).as("p45"),
        round(expr("percentile(value, 0.55)"), 4).as("p55"))
    val joined = exact.join(approx, "event_type").join(bands, "event_type")
      .select("event_type", "n_users", "approx_users", "approx_p50", "p45", "p55")
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (users, approxUsers) = (r.getLong(1), r.getLong(2))
      val relErr = math.abs(approxUsers - users).toDouble / users
      assert(relErr <= 0.15,
        s"${r.getString(0)}: approx_count_distinct off by ${relErr * 100}% " +
          s"($approxUsers vs $users)")
      val p50 = r.getDouble(3)
      assert(p50 >= r.getDouble(4) && p50 <= r.getDouble(5),
        s"${r.getString(0)}: approx p50 $p50 outside exact [p45, p55] = " +
          s"[${r.getDouble(4)}, ${r.getDouble(5)}]")
    }
  }
}
