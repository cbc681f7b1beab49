package graft

import org.apache.spark.sql.SaveMode

/** Degenerate-corpus sweep: EVERY registry key must run (not throw) on
  * an empty corpus and on a 1-row corpus. Null handling is spec'd
  * per-operator; this gates the empty-RELATION behaviors nothing else
  * systematically exercises — ANSI divides on empty aggregates,
  * TakeOrdered over nothing, index builds over zero docs, head() on
  * empty stats tables.
  *
  * Contract asserted: zero throws. Keys whose result is meaningless on
  * a degenerate corpus still return an (empty) frame — a 100 TB job's
  * first shard can genuinely be empty, and "the pipeline crashes" is
  * never the right answer to that. */
class DegenerateInputSpec extends SparkSpec {

  private def subset(n: Int): String = {
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft_degen_$n").toString
    Tables.names.foreach { t =>
      Tables.load(spark, "/root/testdata/sf0.001", t)
        .limit(n).write.mode(SaveMode.Overwrite).parquet(s"$dir/$t.parquet")
    }
    dir
  }

  private def sweep(dir: String): Seq[(String, String)] =
    SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (key, build) =>
      try {
        build(spark, dir).count()
        None
      } catch {
        case e: Throwable =>
          Some(key -> (e.getClass.getSimpleName + ": " +
            Option(e.getMessage).getOrElse("").linesIterator
              .take(1).mkString.take(160)))
      }
    }

  test("every registry key runs on an EMPTY corpus") {
    val failures = sweep(subset(0))
    assert(failures.isEmpty,
      s"${failures.size} keys throw on the empty corpus:\n" +
        failures.map { case (k, e) => s"  $k -> $e" }.mkString("\n"))
  }

  test("every registry key runs on a ONE-ROW corpus") {
    val failures = sweep(subset(1))
    assert(failures.isEmpty,
      s"${failures.size} keys throw on the 1-row corpus:\n" +
        failures.map { case (k, e) => s"  $k -> $e" }.mkString("\n"))
  }
}
