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

  // ---- persisted linear-algebra artifacts: PCA models and k-means
  // centroid sets. Same treatment as the classifier: the trained matrix
  // is a lake table of binary64 values (kind, section, i, j, value), so
  // SAVE → restart → LOAD → project/assign is bit-identical, time travel
  // pins the exact matrix a dataset was projected with, and a branch
  // stages a refit before it serves. ----

  private val PcaKind = "pca"
  private val CentroidKind = "kmeans_centroids"

  def savePca(spark: SparkSession, dir: String, m: Projection.PcaModel): Unit = {
    import spark.implicits._
    require(m.components.forall(_.length == m.mean.length),
      "component rows must match the mean's dimension")
    val rows =
      m.mean.toSeq.zipWithIndex.map { case (v, i) => (PcaKind, "mean", i, 0, v) } ++
      m.eigenvalues.toSeq.zipWithIndex.map { case (v, i) => (PcaKind, "eigenvalue", i, 0, v) } ++
      m.components.toSeq.zipWithIndex.flatMap { case (row, i) =>
        row.toSeq.zipWithIndex.map { case (v, j) => (PcaKind, "component", i, j, v) } }
    SnapshotTable.create(spark, dir,
      rows.toDF("kind", "section", "i", "j", "value"))
  }

  def loadPca(spark: SparkSession, dir: String): Projection.PcaModel = {
    val got = SnapshotTable.forPath(spark, dir).read()
      .selectExpr("kind", "section", "i", "j", "value").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getInt(3), r.getDouble(4)))
    require(got.nonEmpty && got.forall(_._1 == PcaKind),
      s"table at $dir does not hold a '$PcaKind' model")
    def vec(section: String): Array[Double] =
      got.filter(_._2 == section).sortBy(_._3).map(_._5)
    val comps = got.filter(_._2 == "component").groupBy(_._3).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._4).map(_._5)).toArray
    val m = Projection.PcaModel(vec("mean"), vec("eigenvalue"), comps)
    require(m.mean.nonEmpty && m.components.nonEmpty,
      s"pca model at $dir lacks mean/component sections")
    m
  }

  /** Centroids persist as binary64 (a float widens exactly), so the
    * restart round-trip is bit-identical in either precision. */
  def saveCentroids(spark: SparkSession, dir: String, cents: Seq[Seq[Float]]): Unit = {
    import spark.implicits._
    require(cents.nonEmpty && cents.forall(_.length == cents.head.length),
      "centroids must be non-empty and rectangular")
    val rows = cents.zipWithIndex.flatMap { case (c, i) =>
      c.zipWithIndex.map { case (v, j) => (CentroidKind, "centroid", i, j, v.toDouble) } }
    SnapshotTable.create(spark, dir,
      rows.toDF("kind", "section", "i", "j", "value"))
  }

  def loadCentroids(spark: SparkSession, dir: String): Seq[Seq[Float]] = {
    val got = SnapshotTable.forPath(spark, dir).read()
      .selectExpr("kind", "section", "i", "j", "value").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getInt(3), r.getDouble(4)))
    require(got.nonEmpty && got.forall(g => g._1 == CentroidKind && g._2 == "centroid"),
      s"table at $dir does not hold a '$CentroidKind' set")
    got.groupBy(_._3).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._4).map(_._5.toFloat).toSeq)
  }
}
