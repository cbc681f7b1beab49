package graft

import graft.operators.text.{HashSampler, PiiRedactor}
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("hash split is deterministic, exhaustive, and roughly proportional") {
    val ids = (1L to 1000L).toDF("doc_id")
    val hs = HashSampler()
    val split1 = hs.split(ids, 80, 10).groupBy("split").count()
      .as[(String, Long)].collect().toMap
    val split2 = hs.split(ids, 80, 10).groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(split1 == split2)
    assert(split1.values.sum == 1000L)
    assert(split1("train") > 700 && split1("train") < 900)
    assert(split1("val") > 50 && split1("val") < 160)
  }

  test("different seeds give decorrelated samples; sample is a filter (no shuffle)") {
    val ids = (1L to 500L).toDF("doc_id")
    val a = HashSampler(seed = "a").sample(ids, 50).as[Long].collect().toSet
    val b = HashSampler(seed = "b").sample(ids, 50).as[Long].collect().toSet
    assert(a != b && a.nonEmpty && b.nonEmpty)
    val plan = HashSampler().sample(ids, 10).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("pii redactor masks and counts each kind") {
    val df = Seq((1L, "mail me at a.b@x.io or 555-123-4567; ssn 123-45-6789 host 192.168.0.1"))
      .toDF("doc_id", "text")
    val out = PiiRedactor()(df).select("text", "n_emails", "n_phones", "n_ssns", "n_ips")
      .as[(String, Int, Int, Int, Int)].head()
    assert(out._1 == "mail me at <EMAIL> or <PHONE>; ssn <SSN> host <IP>")
    assert((out._2, out._3, out._4, out._5) == (1, 1, 1, 1))
  }
}
