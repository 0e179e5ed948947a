package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Logistic-regression quality classifier: recovers a planted separator,
  * trains bit-identically under different partitionings (the fixed-point
  * long-sum gradient), and separates the weak-labeled fixture corpus. */
class QualityClassifierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("recovers a planted linear separator with margin") {
    import spark.implicits._
    // y = 1 iff f1 > 0.5, planted with a wide margin
    val rows = (0 until 200).map { i =>
      val f1 = if (i % 2 == 0) 0.8 + (i % 7) * 0.02 else 0.2 - (i % 5) * 0.02
      val f2 = (i % 11) * 0.05 // noise, uncorrelated
      (i.toLong, f1, f2, if (i % 2 == 0) 1 else 0)
    }
    val df = rows.toDF("doc_id", "f1", "f2", "label")
    val m = QualityClassifier.train(df, Seq("f1", "f2"))
    assert(m.trainAccuracy == 1.0, s"accuracy ${m.trainAccuracy}")
    assert(m.weights(0) > 1.0, "separator weight should be large positive")
    assert(math.abs(m.weights(1)) < math.abs(m.weights(0)) / 2,
      "noise weight should stay small")
  }

  test("training is bit-deterministic under different partitionings") {
    import spark.implicits._
    val rows = (0 until 300).map { i =>
      (i.toLong, (i % 13) * 0.07, (i % 5) * 0.11, i % 3 min 1)
    }
    val df = rows.toDF("doc_id", "f1", "f2", "label")
    val m2 = QualityClassifier.train(df.repartition(2), Seq("f1", "f2"), iters = 25)
    val m7 = QualityClassifier.train(df.repartition(7), Seq("f1", "f2"), iters = 25)
    assert(m2.weights.toSeq == m7.weights.toSeq, "weights must match bitwise")
    assert(m2.intercept == m7.intercept)
    assert(m2.trainAccuracy == m7.trainAccuracy)
  }

  test("distills a word-count rule gate into a smooth scorer on the fixture corpus") {
    val docs = graft.engine.Tables.ensure(spark, TestSpark.sf).documents
    val sig = TextAnalysis.gopherRules(docs)
    // balanced rule threshold = the corpus median word count, so the
    // distillation target is non-degenerate at every fixture SF
    val medianN = sig.stat.approxQuantile("n_words", Array(0.5), 0.0)(0)
    val labels = sig.select(col("doc_id"),
      (col("n_words") >= medianN).cast("int").as("label"))
    val base = labels.agg(avg(col("label"))).head().getDouble(0)
    assert(base > 0.2 && base < 0.8, s"degenerate label base rate $base")
    val feats = QualityClassifier.featurize(docs).join(labels, "doc_id")
    val m = QualityClassifier.train(feats, QualityClassifier.defaultFeatures.map(_._1))
    assert(m.trainAccuracy >= 0.9, s"accuracy ${m.trainAccuracy} vs base $base")
  }

  test("TRAIN -> SAVE -> load in a fresh context scores bit-identically") {
    import spark.implicits._
    // train a real default-feature model on the fixture corpus (the only
    // feature set score() can serve real documents with), persist it
    // through the on-disk lake store, load it back: weights must
    // round-trip at full binary64 precision (not the 6dp display form),
    // so scores are bit-identical
    val corpus = graft.engine.Tables.ensure(spark, TestSpark.sf).documents
    val sig = TextAnalysis.gopherRules(corpus)
    val medianN = sig.stat.approxQuantile("n_words", Array(0.5), 0.0)(0)
    val labels = sig.select(col("doc_id"),
      (col("n_words") >= medianN).cast("int").as("label"))
    val feats = QualityClassifier.featurize(corpus).join(labels, "doc_id")
    val trained = QualityClassifier.train(feats,
      QualityClassifier.defaultFeatures.map(_._1))
    val dir = java.nio.file.Files.createTempDirectory("graft_lr_model").toString
    ModelStore.save(spark, dir + "/m", trained)
    val loaded = ModelStore.load(spark, dir + "/m")
    assert(loaded.featureNames == trained.featureNames)
    assert(loaded.weights.toSeq == trained.weights.toSeq,
      "weights must round-trip bitwise")
    assert(loaded.intercept == trained.intercept)
    assert(loaded.trainAccuracy == trained.trainAccuracy && loaded.n == trained.n)
    // the serve path: scoring real docs through the persisted model equals
    // scoring through the in-memory one, row for row
    val docs = graft.engine.Tables.ensure(spark, TestSpark.sf).documents.limit(50)
    val direct = QualityClassifier.score(docs,
        trained.featureNames.zip(trained.weights.toSeq), trained.intercept)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSeq
    val served = ModelStore.scoreWith(spark, dir + "/m", docs)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSeq
    assert(served == direct)
    // a non-model lake table refuses loudly
    val other = dir + "/other"
    graft.sources.SnapshotTable.create(spark, other,
      Seq(("x", 1)).toDF("a", "b"))
    intercept[Exception](ModelStore.load(spark, other))
  }

  test("score keep verdict is the logit sign; logit rounds to 6dp") {
    val docs = graft.engine.Tables.ensure(spark, TestSpark.sf).documents.limit(50)
    val scored = QualityClassifier.score(docs,
      Seq("stopword_ratio" -> 10.0, "digit_ratio" -> -1.0), intercept = -1.5)
    val rows = scored.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val logit = r.getDouble(1)
      assert(r.getBoolean(2) == (logit > 0) || math.abs(logit) < 1e-6)
      assert(logit == math.rint(logit * 1e6) / 1e6)
    }
  }
}
