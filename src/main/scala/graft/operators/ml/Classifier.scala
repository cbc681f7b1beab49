package graft.operators.ml

import graft.functions.TextFns._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rule-feature quality classifier (FineWeb-Edu style scoring slot;
  * reference: models/classifier/trainer.py). Inference is a fixed-weight
  * logistic over codegen'd text features — fully distributed, no model
  * server. [[QualityClassifier.train]] fits the same feature vector with
  * MLlib LogisticRegression when labels are available.
  */
case class QualityClassifier(textCol: String = "text") {

  def features(t: Column): Seq[Column] = Seq(
    least(wsTokenCount(t).cast("double") / 100.0, lit(1.0)),
    stopwordRatio(t),
    punctRatio(t),
    alphaRatio(t),
    least(meanWordLength(t) / 10.0, lit(1.0)))

  val weights: Seq[Double] = Seq(2.0, 3.0, -4.0, 1.5, 0.5)
  val bias: Double = -2.0

  def score(t: Column): Column = {
    val z = features(t).zip(weights)
      .map { case (f, w) => f * w }.reduce(_ + _) + bias
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  def apply(df: DataFrame): DataFrame =
    df.withColumn("clf_score", round(score(col(textCol)), 4))
      .withColumn("clf_label", score(col(textCol)) > 0.5)
}

object QualityClassifier {
  import org.apache.spark.ml.classification.LogisticRegression
  import org.apache.spark.ml.functions.array_to_vector

  /** Train path: same features, learned weights. `labelCol` must be a
    * 0/1 double column. */
  def train(df: DataFrame, labelCol: String, textCol: String = "text"):
      org.apache.spark.ml.classification.LogisticRegressionModel = {
    val clf = QualityClassifier(textCol)
    val feats = df.withColumn("features",
      array_to_vector(array(clf.features(col(textCol)): _*)))
    new LogisticRegression().setFeaturesCol("features").setLabelCol(labelCol)
      .setMaxIter(25).fit(feats)
  }
}
