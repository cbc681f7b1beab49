package graft

import graft.operators.ml.QualityClassifier
import org.apache.spark.sql.functions._

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("fixed-weight scoring is bounded and monotone in stopword signal") {
    val df = Seq(
      (1L, "the quick brown fox and the lazy dog in the yard with a bone"),
      (2L, "zxq vrblt kkpw wddt nnkr qqpl mmzt")
    ).toDF("doc_id", "text")
    val got = QualityClassifier()(df)
      .select("doc_id", "clf_score").as[(Long, Double)].collect().toMap
    assert(got.values.forall(s => s > 0.0 && s < 1.0))
    assert(got(1L) > got(2L)) // stopword-rich text scores higher
  }

  test("MLlib train path learns separable labels") {
    val good = (1 to 30).map(i =>
      (s"the and of to in is that for with a document number $i", 1.0))
    val bad = (1 to 30).map(i => (s"!!!! ???? $$$$ #### %%%% @@ $i", 0.0))
    val df = (good ++ bad).toDF("text", "label")
    val model = QualityClassifier.train(df, "label")
    val clf = QualityClassifier()
    val feats = df.withColumn("features",
      org.apache.spark.ml.functions.array_to_vector(array(clf.features(col("text")): _*)))
    val acc = model.transform(feats)
      .select(avg(when(col("prediction") === col("label"), 1.0).otherwise(0.0)))
      .as[Double].head()
    assert(acc > 0.9, s"train accuracy $acc")
  }
}
