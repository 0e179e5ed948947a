package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** PCA (one-pass covariance + Jacobi) and JL random projection. */
class ProjectionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("symEigen: known 2x2 eigensystem") {
    val (vals, vecs) = Projection.symEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(vals(0) - 3.0) < 1e-9 && math.abs(vals(1) - 1.0) < 1e-9)
    val inv = 1.0 / math.sqrt(2)
    assert(math.abs(math.abs(vecs(0)(0)) - inv) < 1e-9 &&
      math.abs(math.abs(vecs(0)(1)) - inv) < 1e-9)
    // eigenvector property: A v = λ v
    val av0 = 2.0 * vecs(0)(0) + 1.0 * vecs(0)(1)
    assert(math.abs(av0 - 3.0 * vecs(0)(0)) < 1e-9)
  }

  /** Deterministic pseudo-noise in [-amp, amp]. */
  private def noise(seed: Int, amp: Float): Float = {
    val m = (seed * 2654435761L) & 0xFFFF
    ((m / 65536.0f) - 0.5f) * 2 * amp
  }

  test("fitPca recovers a planted dominant axis; eigenvalues descend") {
    val d = 8
    val u = Array.tabulate(d)(i => math.cos(i * 0.7)) // planted axis
    val un = { val n = math.sqrt(u.map(x => x * x).sum); u.map(_ / n) }
    val rows = (0 until 300).map { r =>
      val a = (r % 21 - 10).toDouble // spread along the axis
      (r.toLong, Array.tabulate(d)(i => (a * un(i)).toFloat + noise(r * d + i, 0.05f)))
    }
    val df = rows.toDF("vec_id", "embedding")
    val model = Projection.fitPca(df)
    assert(model.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-9))
    val top = model.components(0)
    val cos = math.abs(top.zip(un).map { case (a, b) => a * b }.sum)
    assert(cos > 0.99, s"top axis alignment $cos")
    assert(model.varianceCaptured(1) > 0.9)
  }

  test("full-rank projection preserves pairwise distances (rotation only)") {
    val d = 6
    val rows = (0 until 50).map(r =>
      (r.toLong, Array.tabulate(d)(i => noise(r * d + i, 1.0f))))
    val df = rows.toDF("vec_id", "embedding")
    val (proj, _) = Projection.pca(df, k = d)
    val got = proj.select("vec_id", "pca").collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Float]](1).toArray).toMap
    def dist(a: Array[Float], b: Array[Float]): Double =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.map(_.toDouble).sum)
    val orig = rows.toMap
    for (i <- 0 until 10; j <- (i + 1) until 10) {
      val d0 = dist(orig(i.toLong), orig(j.toLong))
      val d1 = dist(got(i.toLong), got(j.toLong))
      assert(math.abs(d0 - d1) < 1e-3, s"pair ($i,$j): $d0 vs $d1")
    }
  }

  test("pcaProjectCol matches the driver-side arithmetic") {
    val d = 5
    val rows = (0 until 40).map(r =>
      (r.toLong, Array.tabulate(d)(i => noise(r * d + i, 1.0f))))
    val df = rows.toDF("vec_id", "embedding")
    val (proj, model) = Projection.pca(df, k = 3)
    val row0 = proj.filter(col("vec_id") === 7L)
      .select("pca").collect().head.getAs[scala.collection.Seq[Float]](0)
    val x = rows(7)._2
    val expected = model.components.take(3).map { w =>
      w.indices.map(i => (x(i) - model.mean(i)) * w(i)).sum.toFloat
    }
    row0.zip(expected).foreach { case (a, b) => assert(math.abs(a - b) < 1e-4) }
  }

  test("random projection: deterministic, norms preserved in expectation") {
    val d = 32; val k = 16
    val rows = (0 until 200).map(r =>
      (r.toLong, Array.tabulate(d)(i => noise(r * d + i, 1.0f))))
    val df = rows.toDF("vec_id", "embedding")
    val proj = df.withColumn("rp",
      Projection.randomProjectCol(col("embedding"), k, d))
    val a = proj.select("vec_id", "rp").collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Float]](1).toSeq).toMap
    val b = df.withColumn("rp", Projection.randomProjectCol(col("embedding"), k, d))
      .select("vec_id", "rp").collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Float]](1).toSeq).toMap
    assert(a == b, "same seed must reproduce identical projections")
    val ratios = rows.map { case (id, x) =>
      val n0 = x.map(v => v * v.toDouble).sum
      val n1 = a(id).map(v => v * v.toDouble).sum
      n1 / n0
    }
    val meanRatio = ratios.sum / ratios.size
    assert(meanRatio > 0.8 && meanRatio < 1.2, s"mean norm ratio $meanRatio")
  }

  test("PCA model persists through ModelStore bit-identically; serve equals in-memory") {
    val e = graft.engine.Tables(spark, graft.TestSpark.sf).embeddings
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding"))
    val fitted = Projection.fitPca(e)
    val dir = java.nio.file.Files.createTempDirectory("graft_pca_model").toString
    ModelStore.savePca(spark, dir + "/m", fitted)
    val loaded = ModelStore.loadPca(spark, dir + "/m")
    assert(loaded.mean.toSeq == fitted.mean.toSeq, "mean must round-trip bitwise")
    assert(loaded.eigenvalues.toSeq == fitted.eigenvalues.toSeq)
    assert(loaded.components.map(_.toSeq).toSeq ==
      fitted.components.map(_.toSeq).toSeq, "components must round-trip bitwise")
    // serve path: projecting through the loaded model equals the in-memory one
    import org.apache.spark.sql.functions._
    val direct = e.limit(20).select(col("vec_id"),
        Projection.pcaProjectCol(col("embedding"), fitted, 4).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val served = e.limit(20).select(col("vec_id"),
        Projection.pcaProjectCol(col("embedding"), loaded, 4).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(served == direct)
    // a non-PCA lake table refuses loudly
    intercept[Exception](ModelStore.loadPca(spark,
      java.nio.file.Files.createTempDirectory("graft_pca_none").toString))
  }

  test("k-means centroid sets persist through ModelStore bit-identically") {
    val e = graft.engine.Tables(spark, graft.TestSpark.sf).embeddings
    val cents = Similarity.kmeansCentroids(e, nClusters = 6, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft_cent").toString
    ModelStore.saveCentroids(spark, dir + "/c", cents)
    val loaded = ModelStore.loadCentroids(spark, dir + "/c")
    assert(loaded == cents.map(_.toSeq), "centroids must round-trip bitwise")
  }
}
