package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dimensionality reduction for embedding columns — the storage/compute
  * lever next to quantization (Similarity.quantizeInt8) and PQ
  * (Similarity.pqCodebook): a 100 TB embedding corpus at d=1024 that
  * serves ANN fine at d=128 is an 8× cut in every downstream shuffle,
  * scan, and index.
  *
  * PCA is fit with ONE distributed pass: each partition folds its vectors
  * into a local (count, sum[d], gram[d×d]) triple and `treeAggregate`
  * merges them — the only corpus-sized work is that single pass, the
  * d×d eigen-decomposition (cyclic Jacobi) is driver-side O(d³) on a
  * matrix that fits in a few MB for any realistic d. This is the same
  * shape every distributed PCA uses (covariance sketch + local solve);
  * RDD `treeAggregate` is used deliberately here — it IS the
  * per-partition imperative fold, and the declarative alternative
  * (explode to n·d² rows) is strictly worse.
  *
  * Projection is pure Column DSL (zip_with + aggregate lambdas over
  * literal component rows) so it rides whole-stage codegen with the
  * matrix broadcast inside the plan — no UDF, no second fit pass.
  *
  * Random projection (sparse-free JL) needs NO fit pass at all: plane
  * components come from the same hash-derived generator as `srp_sign64`
  * (graft.functions.SrpKernel), scaled 1/√k so expected norms are
  * preserved — the right tool when a fit pass over 100 TB isn't worth it.
  */
object Projection {

  /** (mean[d], eigenvalues desc, components as rows — components(i) is the
    * i-th principal axis, unit length). */
  final case class PcaModel(mean: Array[Double], eigenvalues: Array[Double],
                            components: Array[Array[Double]]) {
    /** Fraction of total variance captured by the top-k axes. */
    def varianceCaptured(k: Int): Double = {
      val t = eigenvalues.sum
      if (t <= 0) 0.0 else eigenvalues.take(k).sum / t
    }
  }

  /** Fit PCA from one `treeAggregate` pass over `vecCol`. */
  def fitPca(df: DataFrame, vecCol: String = "embedding"): PcaModel = {
    val rdd = df.select(col(vecCol)).na.drop()
      .rdd.map(_.getAs[scala.collection.Seq[Float]](0))
    val d = rdd.first().length
    // per-partition fold: count, sum, upper-triangular gram (packed)
    val zero = (0L, new Array[Double](d), new Array[Double](d * (d + 1) / 2))
    val (n, sum, gram) = rdd.treeAggregate(zero)(
      seqOp = { case ((c, s, g), v) =>
        var i = 0
        while (i < d) {
          val xi = v(i).toDouble
          s(i) += xi
          var j = i
          var base = i * d - i * (i - 1) / 2 - i // packed row offset
          while (j < d) { g(base + j) += xi * v(j); j += 1 }
          i += 1
        }
        (c + 1, s, g)
      },
      combOp = { case ((c1, s1, g1), (c2, s2, g2)) =>
        var i = 0
        while (i < s1.length) { s1(i) += s2(i); i += 1 }
        i = 0
        while (i < g1.length) { g1(i) += g2(i); i += 1 }
        (c1 + c2, s1, g1)
      })
    require(n > 1, s"PCA needs at least 2 vectors, got $n")
    val mean = sum.map(_ / n)
    // covariance = E[xxᵀ] − mean meanᵀ
    val cov = Array.ofDim[Double](d, d)
    var i = 0
    while (i < d) {
      var j = i
      val base = i * d - i * (i - 1) / 2 - i
      while (j < d) {
        val v = gram(base + j) / n - mean(i) * mean(j)
        cov(i)(j) = v; cov(j)(i) = v
        j += 1
      }
      i += 1
    }
    val (vals, vecs) = symEigen(cov)
    PcaModel(mean, vals, vecs)
  }

  /** Cyclic Jacobi eigen-decomposition of a symmetric matrix: eigenvalues
    * descending with matching unit eigenvector ROWS. Deterministic,
    * O(d³ · sweeps); d ≤ a few thousand is driver-trivial. */
  private[llm] def symEigen(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone)
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 64 && off > 1e-11) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          off += 2 * apq * apq
          if (math.abs(apq) > 1e-14) {
            val theta = (a(q)(q) - a(p)(p)) / (2 * apq)
            val t = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1)) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1))
              case x => x
            }
            val c = 1.0 / math.sqrt(t * t + 1)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    (order.map(i => a(i)(i)).toArray,
      order.map(i => (0 until d).map(j => v(j)(i)).toArray).toArray)
  }

  /** Projection column: top-k PCA coordinates of `vec` — pure zip_with +
    * aggregate lambdas over literal component rows, whole-stage codegen,
    * matrix rides the plan. */
  def pcaProjectCol(vec: Column, model: PcaModel, k: Int): Column =
    array(pcaCoordCols(vec, model, k).map(_.cast("float")): _*)

  /** The top-k PCA coordinates as DOUBLE columns — the exact fold
    * (`0.0 + (x₁−m₁)·w₁ + (x₂−m₂)·w₂ + …`, left-associated) an external
    * engine replays from the same literal mean/components, which is what
    * lets a persisted-matrix query carry a bit-exact oracle. */
  def pcaCoordCols(vec: Column, model: PcaModel, k: Int): Seq[Column] = {
    val meanLit = typedLit(model.mean.toSeq)
    val centered = zip_with(vec, meanLit, (x, m) => x.cast("double") - m)
    model.components.take(k).toSeq.map { row =>
      aggregate(zip_with(centered, typedLit(row.toSeq), (x, w) => x * w),
        lit(0.0), (acc, x) => acc + x)
    }
  }

  /** Fit + transform: adds `outCol` with the top-k PCA coordinates. */
  def pca(df: DataFrame, k: Int, vecCol: String = "embedding",
          outCol: String = "pca"): (DataFrame, PcaModel) = {
    val model = fitPca(df, vecCol)
    require(k <= model.mean.length, s"k=$k exceeds dimension ${model.mean.length}")
    (df.withColumn(outCol, pcaProjectCol(col(vecCol), model, k)), model)
  }

  /** The JL projection matrix: row j = scaled plane weights for output
    * coordinate j. Pure function of (seed, k, d) — the same doubles on
    * every engine, which is what lets the DuckDB oracle recompute the
    * projection bit-for-bit from literals. */
  def randomProjectWeights(k: Int, d: Int, seed: Long = 0L): Seq[Seq[Double]] = {
    val scale = math.sqrt(3.0 / k)
    (0 until k).map { j =>
      (0 until d).map(dim =>
        graft.functions.SrpKernel.component(seed, j, dim) * scale).toSeq
    }
  }

  /** Per-coordinate JL projections as DOUBLE columns (the exact sums —
    * left-to-right fold over dims, so an oracle writing the same
    * left-associated sum reproduces them bit-for-bit). */
  def randomProjectCoords(vec: Column, k: Int, d: Int, seed: Long = 0L): Seq[Column] =
    randomProjectWeights(k, d, seed).map { row =>
      aggregate(zip_with(vec, typedLit(row), (x, w) => x.cast("double") * w),
        lit(0.0), (acc, x) => acc + x)
    }

  /** Johnson–Lindenstrauss random projection to k dims with NO fit pass:
    * plane components from the SrpKernel hash generator (uniform [-1,1),
    * variance 1/3), scaled √(3/k) so E[‖proj‖²] = ‖x‖². Deterministic
    * across runs and engines — the matrix is a function of (seed, k). */
  def randomProjectCol(vec: Column, k: Int, d: Int, seed: Long = 0L): Column =
    array(randomProjectCoords(vec, k, d, seed).map(_.cast("float")): _*)
}
