package graft.llm

import org.apache.spark.sql.SparkSession
import graft.sources.SnapshotTable

/** Persisted quality-classifier models — the tokenizer-vocabulary
  * treatment ([[TokenizerStore]]) applied to trained coefficients: the
  * model lives as a graft-lake table, so time travel pins the exact model
  * a dataset was filtered with, privileges gate who can swap it, and a
  * branch stages a retrain before it serves. TRAIN → SAVE → score in a
  * fresh process round-trips bit-identically: the table stores the
  * binary64 weight values themselves (parquet DOUBLE — not the 6dp
  * display rows of [[QualityClassifier.modelRows]]), and scoring is a
  * fixed-order chain over those exact constants.
  *
  * Reference analog: dremio-oss persists engine-owned artifacts (scripts,
  * reflection goals) in its KV store; a trained model is the same class
  * of control-plane state, but it version-pins more naturally as lake
  * data than as registry JSON.
  */
object ModelStore {

  private val Kind = "lr_quality"

  /** One row per coefficient in feature order, then the summary scalars
    * (`__n` is exact in a double up to 2^53 — beyond any corpus). */
  def save(spark: SparkSession, dir: String, m: QualityClassifier.Model): Unit = {
    import spark.implicits._
    require(m.featureNames.size == m.weights.length,
      s"model has ${m.featureNames.size} names but ${m.weights.length} weights")
    val rows = m.featureNames.zip(m.weights.toSeq).zipWithIndex.map {
      case ((n, w), i) => (Kind, i, n, w)
    } ++ Seq(
      (Kind, m.featureNames.size, "__intercept", m.intercept),
      (Kind, m.featureNames.size + 1, "__train_accuracy", m.trainAccuracy),
      (Kind, m.featureNames.size + 2, "__n", m.n.toDouble))
    SnapshotTable.create(spark, dir, rows.toDF("kind", "rank", "feature", "value"))
  }

  def load(spark: SparkSession, dir: String): QualityClassifier.Model = {
    val got = SnapshotTable.forPath(spark, dir).read()
      .selectExpr("kind", "rank", "feature", "value")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getDouble(3)))
    require(got.nonEmpty && got.forall(_._1 == Kind),
      s"table at $dir does not hold a '$Kind' model")
    val ordered = got.sortBy(_._2)
    val (summary, coefs) = ordered.partition(_._3.startsWith("__"))
    val sm = summary.map(r => r._3 -> r._4).toMap
    require(sm.contains("__intercept") && sm.contains("__n"),
      s"model table at $dir lacks summary rows (have ${sm.keys.mkString(",")})")
    QualityClassifier.Model(
      featureNames = coefs.map(_._3).toSeq,
      weights = coefs.map(_._4),
      intercept = sm("__intercept"),
      trainAccuracy = sm.getOrElse("__train_accuracy", 0.0),
      n = sm("__n").toLong)
  }

  /** Score `docs` with the model persisted at `dir` — the serve path a
    * fresh coordinator takes after a restart. */
  def scoreWith(spark: SparkSession, dir: String,
                docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val m = load(spark, dir)
    QualityClassifier.score(docs, m.featureNames.zip(m.weights.toSeq), m.intercept)
  }
}
