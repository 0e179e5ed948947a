package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trainable document-quality classifier — logistic regression over the
  * [[TextAnalysis.qualitySignals]] features, the learned counterpart of the
  * hand-tuned C4/Gopher thresholds (CCNet and the GPT-3/LLaMA data
  * pipelines all train such a lightweight classifier on "reference corpus
  * vs raw crawl" and keep documents by thresholding its score).
  *
  * Scale design: each gradient-descent step is ONE distributed aggregate —
  * per-feature partial sums (codegen'd `sum()` columns, map-side combined)
  * over a cached feature projection; only the (features+1)-vector reaches
  * the driver per step. Nothing materializes the corpus: T steps = T
  * scans of a cached columnar projection (at 100 TB one would train on a
  * sampled slice — the trainer takes whatever DataFrame it is given).
  *
  * Determinism: float addition is not associative, so a naive `sum(double)`
  * gradient depends on partition order and retrains would drift across
  * cluster sizes. Instead every per-document contribution is quantized to
  * a fixed-point grid (×2^22, truncated toward zero) and summed as LONGS —
  * integer addition is associative, so the gradient, and therefore the
  * whole training trajectory, is bit-identical under any partitioning /
  * executor count (specs retrain under different partitionings and assert
  * equality). Contributions are bounded (|σ−y|·|x| ≤ ~2^6), so the long
  * sum holds >10^10 documents before overflow.
  */
object QualityClassifier {

  /** Fixed-point grid for gradient quantization (2^22 ≈ 4.2e6: ~7 decimal
    * digits of gradient precision, overflow headroom past 10^10 docs). */
  private val Scale = (1L << 22).toDouble

  /** Default feature set: the qualitySignals ratios, with the two
    * unbounded columns rescaled to O(1) so one learning rate fits all. */
  val defaultFeatures: Seq[(String, Column)] = Seq(
    "tokens_per_100" -> (col("n_tokens").cast("double") / lit(100.0)),
    "avg_token_span_per_10" -> (col("avg_token_span") / lit(10.0)),
    "punct_ratio" -> col("punct_ratio"),
    "digit_ratio" -> col("digit_ratio"),
    "stopword_ratio" -> col("stopword_ratio"),
    "distinct_token_ratio" -> col("distinct_token_ratio"))

  final case class Model(featureNames: Seq[String], weights: Array[Double],
                         intercept: Double, trainAccuracy: Double, n: Long)

  /** doc_id + the default feature columns (from qualitySignals). */
  def featurize(docs: DataFrame): DataFrame = {
    val sig = TextAnalysis.qualitySignals(docs)
    sig.select(col("doc_id") +: defaultFeatures.map { case (n, c) => c.as(n) }: _*)
  }

  /** Train on `features` (one column per name in `featureNames`, plus a
    * 0/1 `label` column) by Newton/IRLS — the solver real systems use for
    * logistic regression because it converges in ~10 rounds where
    * first-order descent needs thousands. One round = ONE distributed
    * aggregate producing the quantized gradient (d+1 longs) and the upper
    * triangle of the Hessian ((d+1)(d+2)/2 longs); the (d+1)×(d+1) solve
    * happens on the driver (d is the feature count, single digits).
    * Ridge keeps the Hessian nonsingular when a feature is constant
    * (zero row → λ on the diagonal), and steps are ∞-norm-damped so the
    * quadratic model can't catapult the weights while the data is still
    * separable. */
  def train(features: DataFrame, featureNames: Seq[String],
            iters: Int = 20, ridge: Double = 1e-5, maxStep: Double = 20.0,
            tol: Double = 1e-3): Model = {
    val d = featureNames.size
    val cached = features.select(
      (col("label").cast("double").as("y") +:
        featureNames.map(n => col(n).cast("double"))): _*).cache()
    try {
      val n = cached.count()
      require(n > 0, "empty training set")
      val k = d + 1 // intercept is x_0 = 1
      val xs: Seq[Column] = lit(1.0) +: featureNames.map(col)
      var w = new Array[Double](k)
      var it = 0
      while (it < iters) {
        // z = w_0 + Σ w_j x_j in fixed feature order (left-assoc adds)
        val z = featureNames.zipWithIndex.foldLeft(lit(w(0)): Column) {
          case (acc, (fn, j)) => acc + lit(w(j + 1)) * col(fn)
        }
        val p = lit(1.0) / (lit(1.0) + exp(-z))
        // Evaluate the shared σ subexpressions ONCE in a projection below
        // the aggregate: inlining err/s into all (k+1)(k+4)/2 sums
        // duplicated the z/p subtree ~36×, and the per-round driver
        // analysis+codegen of that tree dominated training wall time at
        // small scale (plans re-analyze every round — the weights are new
        // literals). Same IEEE ops in the same order, so the quantized
        // trajectory is unchanged bit for bit.
        val proj = cached.select(
          (featureNames.map(col) :+
            (p - col("y")).as("__e") :+
            greatest(p * (lit(1.0) - p), lit(1e-9)).as("__s")): _*)
        // gradient + Hessian upper triangle as associative LONG sums on
        // the 2^22 grid — bit-identical under any partitioning
        val gradCols = (0 until k).map(j =>
          sum((col("__e") * xs(j) * lit(Scale)).cast("long")).as(s"g_$j"))
        val hessCols = for { j <- 0 until k; l <- j until k } yield
          sum((col("__s") * xs(j) * xs(l) * lit(Scale)).cast("long")).as(s"h_${j}_$l")
        val aggs = gradCols ++ hessCols
        val row = proj.agg(aggs.head, aggs.tail: _*).head()
        val g = new Array[Double](k)
        var j = 0
        while (j < k) {
          g(j) = row.getLong(j) / Scale / n + (if (j > 0) ridge * w(j) else 0.0)
          j += 1
        }
        val h = Array.ofDim[Double](k, k)
        var idx = k
        j = 0
        while (j < k) {
          var l = j
          while (l < k) {
            val v = row.getLong(idx) / Scale / n
            h(j)(l) = v; h(l)(j) = v
            idx += 1; l += 1
          }
          j += 1
        }
        j = 1
        while (j < k) { h(j)(j) += ridge; j += 1 }
        h(0)(0) += 1e-6
        val delta = solve(h, g)
        val m = delta.map(math.abs).max
        val scaleStep = if (m > maxStep) maxStep / m else 1.0
        j = 0
        while (j < k) { w(j) -= scaleStep * delta(j); j += 1 }
        it += 1
        // deterministic early stop: the applied step is at the fixed-point
        // quantization floor — further rounds only re-buy the same answer
        // (δ is itself bit-deterministic, so every retrain stops at the
        // same round)
        if (scaleStep * m < tol) it = iters
      }
      val zFinal = featureNames.zipWithIndex.foldLeft(lit(w(0)): Column) {
        case (acc, (fn, j)) => acc + lit(w(j + 1)) * col(fn)
      }
      val acc = cached.agg(
        (sum(when((zFinal > 0).cast("int") === col("y").cast("int"), 1L).otherwise(0L))
          .cast("double") / count(lit(1))).as("acc")).head().getDouble(0)
      Model(featureNames, w.drop(1), w(0), acc, n)
    } finally { cached.unpersist(); () }
  }

  /** Gaussian elimination with partial pivoting — deterministic k×k solve
    * on the driver (k = features + 1, single digits). */
  private def solve(a0: Array[Array[Double]], b0: Array[Double]): Array[Double] = {
    val k = b0.length
    val a = a0.map(_.clone())
    val b = b0.clone()
    var col = 0
    while (col < k) {
      var piv = col
      var r = col + 1
      while (r < k) { if (math.abs(a(r)(col)) > math.abs(a(piv)(col))) piv = r; r += 1 }
      if (piv != col) {
        val t = a(col); a(col) = a(piv); a(piv) = t
        val tb = b(col); b(col) = b(piv); b(piv) = tb
      }
      val p = a(col)(col)
      require(math.abs(p) > 1e-300, "singular normal equations despite ridge")
      r = col + 1
      while (r < k) {
        val f = a(r)(col) / p
        if (f != 0.0) {
          var c = col
          while (c < k) { a(r)(c) -= f * a(col)(c); c += 1 }
          b(r) -= f * b(col)
        }
        r += 1
      }
      col += 1
    }
    val x = new Array[Double](k)
    var i = k - 1
    while (i >= 0) {
      var s = b(i)
      var c = i + 1
      while (c < k) { s -= a(i)(c) * x(c); c += 1 }
      x(i) = s / a(i)(i)
      i -= 1
    }
    x
  }

  /** Score `docs` with fixed weights: logit (6dp) + keep verdict. The logit
    * is a fixed-order chain of IEEE-exact ops (+ , ×, ÷ inside the
    * features), so a SQL oracle replaying the same expression hash-matches
    * bit for bit — no transcendentals on the oracle-visible path (the
    * sigmoid is monotone; thresholding the logit at 0 IS thresholding the
    * probability at 0.5). */
  def score(docs: DataFrame, weights: Seq[(String, Double)], intercept: Double): DataFrame = {
    val feats = featurize(docs)
    val z = weights.foldLeft(lit(intercept): Column) {
      case (acc, (fn, wj)) => acc + lit(wj) * col(fn)
    }
    feats.select(col("doc_id"), round(z, 6).as("lr_logit"), (z > 0).as("keep"))
  }

  /** Model rows for the registry/digest surface: one row per coefficient
    * (6dp) plus __intercept / __train_accuracy / __n summary rows. */
  def modelRows(spark: org.apache.spark.sql.SparkSession, m: Model): DataFrame = {
    import spark.implicits._
    val rows = m.featureNames.zip(m.weights.toSeq).map {
      case (n, wv) => (n, math.rint(wv * 1e6) / 1e6)
    } ++ Seq(
      ("__intercept", math.rint(m.intercept * 1e6) / 1e6),
      ("__train_accuracy", math.rint(m.trainAccuracy * 1e6) / 1e6),
      ("__n", m.n.toDouble))
    rows.toDF("feature", "value").orderBy("feature")
  }
}
