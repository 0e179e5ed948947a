package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, StructField, StructType}

/** Native vector-similarity kernels over `array<float>` embedding columns.
  *
  * The reference has no vector ops (dremio-oss is pure relational — SURVEY
  * §2); these are part of the LLM-pipeline extension surface. Implemented as
  * Catalyst expressions with `doGenCode` so they stay inside whole-stage
  * codegen (one fused loop per row, no boxing) — the hot path of a 100 TB
  * ANN sweep is exactly this inner product.
  */
trait VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
}

private[functions] object VectorExprChecks {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

  /** Analysis-time guard shared by the quantize kernels: only
    * array<float> / array<double> inputs are meaningful — getDouble over
    * an int-backed array would silently bit-reinterpret. */
  def requireFloatOrDoubleArray(name: String, dt: DataType): TypeCheckResult = dt match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name requires an array<float> or array<double> input; got ${other.simpleString}")
  }
}

/** cosine_sim(a, b) = dot(a,b) / (|a|*|b|); 0.0 when either norm is 0. */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toFloatArray()
    val y = b.asInstanceOf[ArrayData].toFloatArray()
    val n = math.min(x.length, y.length)
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    // float multiplies, matching this expression's codegen exactly
    while (i < n) { dot += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i); i += 1 }
    // clamp: accumulated float rounding can push |cos| past 1 by ulps,
    // which would NaN a downstream acos
    if (nx == 0.0 || ny == 0.0) 0.0
    else math.max(-1.0, math.min(1.0, dot / (math.sqrt(nx) * math.sqrt(ny))))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($l.numElements(), $r.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  float $xv = $l.getFloat($i); float $yv = $r.getFloat($i);
         |  $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |}
         |${ev.value} = ($nx == 0.0 || $ny == 0.0) ? 0.0
         |  : java.lang.Math.max(-1.0, java.lang.Math.min(1.0,
         |      $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny))));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** quantize_int8(vec) -> struct<q_min, q_scale, q_codes>: one-pass affine
  * int8 quantization, output-identical to the declarative
  * `Similarity.quantizeInt8` column chain (same shortest-repr BigDecimal
  * HALF_UP rounding + truncating int cast — see [[DequantizeInt8]] for
  * why, and for the O(dim²) projection-collapse cost this replaces).
  * Empty input mirrors the declarative nulls (array_min of [] is null). */
case class QuantizeInt8(child: Expression)
    extends UnaryExpression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def prettyName: String = "quantize_int8"
  override def dataType: DataType = StructType(Seq(
    StructField("q_min", DoubleType, nullable = true),
    StructField("q_scale", DoubleType, nullable = true),
    StructField("q_codes", ArrayType(IntegerType, containsNull = false), nullable = false)))
  override def nullable: Boolean = true

  // getDouble on an int/long-backed array bit-reinterprets into garbage
  // codes rather than erroring — reject anything but array<float|double>
  // at analysis time (same guard as CosineSimilarityD).
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    VectorExprChecks.requireFloatOrDoubleArray(prettyName, child.dataType)

  private lazy val elemIsFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any = {
    val in = v.asInstanceOf[ArrayData]
    val n = in.numElements()
    if (n == 0)
      return org.apache.spark.sql.catalyst.InternalRow(
        null, null, new GenericArrayData(Array.empty[Int]))
    val xs = new Array[Double](n)
    var mn = Double.PositiveInfinity; var mx = Double.NegativeInfinity
    var i = 0
    while (i < n) {
      if (in.isNullAt(i)) return null // null element: whole result is null
      val d = if (elemIsFloat) in.getFloat(i).toDouble else in.getDouble(i)
      xs(i) = d; if (d < mn) mn = d; if (d > mx) mx = d; i += 1
    }
    val codes = new Array[Int](n)
    val scale = if (mx == mn) 0.0 else (mx - mn) / 255.0
    if (mx != mn) {
      var j = 0
      while (j < n) {
        val rounded = scala.math.BigDecimal((xs(j) - mn) / scale)
          .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
        codes(j) = (rounded - 128.0).toInt
        j += 1
      }
    }
    org.apache.spark.sql.catalyst.InternalRow(mn, scale, new GenericArrayData(codes))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** dequantize_int8(vec) -> array<double>: affine int8 quantize +
  * reconstruct in ONE pass — output-identical to the declarative
  * `Similarity.dequantize(quantizeInt8(df))` chain. The declarative form
  * collapses into a single projection where `array_min`/`array_max` and
  * the double-cast transform are inlined into the per-element dequantize
  * lambda — O(dim²) interpreted HOF work per row (the dominant cost of
  * the quantized-ANN sweep). Parity details: rounding reproduces Spark's
  * `round()` exactly (shortest-repr BigDecimal, HALF_UP — NOT
  * Math.round/rint, which disagree on negative ties and float-boundary
  * cases), and the code passes through the same truncating int cast. */
case class DequantizeInt8(child: Expression)
    extends UnaryExpression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def prettyName: String = "dequantize_int8"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    VectorExprChecks.requireFloatOrDoubleArray(prettyName, child.dataType)

  private lazy val elemIsFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any = {
    val in = v.asInstanceOf[ArrayData]
    val n = in.numElements()
    val xs = new Array[Double](n)
    var mn = Double.PositiveInfinity; var mx = Double.NegativeInfinity
    var i = 0
    while (i < n) {
      if (in.isNullAt(i)) return null // null element: whole result is null
      val d = if (elemIsFloat) in.getFloat(i).toDouble else in.getDouble(i)
      xs(i) = d; if (d < mn) mn = d; if (d > mx) mx = d; i += 1
    }
    val out = new Array[Double](n)
    if (n > 0 && mx == mn) {
      java.util.Arrays.fill(out, mn) // codes 0, scale 0: (0+128)*0 + mn
    } else if (n > 0) {
      val scale = (mx - mn) / 255.0
      var j = 0
      while (j < n) {
        val rounded = scala.math.BigDecimal((xs(j) - mn) / scale)
          .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
        val code = (rounded - 128.0).toInt
        out(j) = (code + 128.0) * scale + mn
        j += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** cosine_sim_d(a, b) over `array<double>` — the double-precision twin of
  * [[CosineSimilarity]] for dequantized/reconstructed vectors whose oracle
  * parity requires staying in doubles end to end. Accumulates in the same
  * ascending order as a left fold, so it is bit-identical to the
  * declarative `aggregate(zip_with(...))` form it replaces — which, being
  * higher-order functions (CodegenFallback), evaluated interpreted at
  * ~50µs/pair; this stays inside whole-stage codegen. Unclamped (unlike
  * the float kernel) to mirror the declarative form exactly. */
case class CosineSimilarityD(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "cosine_sim_d"

  // getDouble on a float-backed array returns garbage, not an error —
  // and cosine_sim (float) has the identical signature, so an accidental
  // swap must fail analysis, not produce wrong numbers
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> inputs (use cosine_sim for array<float>); " +
        s"got ${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toDoubleArray()
    val y = b.asInstanceOf[ArrayData].toDoubleArray()
    val n = math.min(x.length, y.length)
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) { dot += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i); i += 1 }
    if (nx == 0.0 || ny == 0.0) 0.0
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($l.numElements(), $r.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $l.getDouble($i); double $yv = $r.getDouble($i);
         |  $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |}
         |${ev.value} = ($nx == 0.0 || $ny == 0.0) ? 0.0
         |  : $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** dot_product(a, b) over array<float>. */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toFloatArray()
    val y = b.asInstanceOf[ArrayData].toFloatArray()
    val n = math.min(x.length, y.length)
    var dot = 0.0; var i = 0
    // widen BEFORE multiplying: this expression's CODEGEN multiplies in
    // double ((double)getFloat * (double)getFloat) — a float multiply here
    // would make an interpreted/fallback plan disagree in the last ulps
    // with the codegen'd plan the oracles were gated on
    while (i < n) { dot += x(i).toDouble * y(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($l.numElements(), $r.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $dot += (double)$l.getFloat($i) * (double)$r.getFloat($i); }
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** l2_norm(a): Euclidean norm of an array<float>. */
case class L2Norm(child: Expression) extends UnaryExpression {
  override def prettyName: String = "l2_norm"
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toFloatArray()
    var s = 0.0; var i = 0
    // float multiply, matching this expression's codegen exactly
    while (i < x.length) { s += x(i) * x(i); i += 1 }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i"); val s = ctx.freshName("s"); val v = ctx.freshName("v")
      s"""
         |double $s = 0.0;
         |for (int $i = 0; $i < $c.numElements(); $i++) { float $v = $c.getFloat($i); $s += $v * $v; }
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** pq_adc_dot(codes, lut): asymmetric-distance lookup accumulation — the
  * PQ scoring kernel. `codes` is a vector's m sub-space centroid indices
  * (array<int>), `lut` an array of m lookup tables (array<array<double>>):
  * the result is Σ_b lut[b][codes[b]]. With a per-query table of
  * query·centroid dot products this scores a corpus row in m lookups+adds
  * instead of a dim-length dot product (Jégou et al. 2011, IEEE TPAMI
  * "Product quantization for nearest neighbor search", Eq. 13 — ADC);
  * with the codebook's per-centroid squared norms it reconstructs |x̂|²
  * from codes alone. Codegen'd: the inner loop is two array reads and an
  * add inside whole-stage codegen. */
case class PqAdcDot(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "pq_adc_dot"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (array<int>, array<array<double>>), got ($l, $r)")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData].toIntArray()
    val lut = b.asInstanceOf[ArrayData]
    val m = math.min(codes.length, lut.numElements())
    var s = 0.0; var i = 0
    while (i < m) { s += lut.getArray(i).getDouble(codes(i)); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val i = ctx.freshName("i"); val m = ctx.freshName("m"); val s = ctx.freshName("s")
      s"""
         |int $m = java.lang.Math.min($l.numElements(), $r.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $m; $i++) {
         |  $s += $r.getArray($i).getDouble($l.getInt($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** PQ encode/LUT loops shared by eval and codegen. Arithmetic is kept
  * EXACTLY equal to the declarative forms they replace
  * ([[graft.llm.Similarity.pqCodesCol]]'s per-block
  * `lit(|c|²) − 2·dot_product(slice(vec), c)` + first-min argmin, and the
  * per-query `dot_product(slice(vec), c)` LUT): float loads widened to
  * double, ascending-index accumulation, `cnorm − 2.0·dot`, strict `<`
  * first-min — so swapping the kernels in changes plan size, never a
  * value. */
object PqKernel {
  /** |c|² per (block, code), summed in ascending index order — the same
    * left fold as `c.map(_.toDouble * _).sum` in the declarative form. */
  def norms(cb: Array[Array[Array[Float]]]): Array[Array[Double]] =
    cb.map(_.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i).toDouble * c(i); i += 1 }
      s
    })

  /** dot(vec[b·dsub ..], cent) with slice semantics: reads stop at the
    * vector's end (slice-then-min(n) in the declarative form). */
  @inline private def blockDot(v: ArrayData, off: Int, cent: Array[Float]): Double = {
    val n = v.numElements()
    val end = math.min(cent.length, math.max(0, n - off))
    var dot = 0.0; var p = 0
    while (p < end) { dot += cent(p).toDouble * v.getFloat(off + p); p += 1 }
    dot
  }

  /** m codes: per block the first j minimizing |c|² − 2·x·c. */
  def encode(v: ArrayData, cb: Array[Array[Array[Float]]],
             cn: Array[Array[Double]]): ArrayData = {
    val m = cb.length
    val out = new Array[Int](m)
    var b = 0
    while (b < m) {
      val cents = cb(b); val dsub = if (cents.isEmpty) 0 else cents(0).length
      var best = 0; var bestD = Double.PositiveInfinity; var j = 0
      while (j < cents.length) {
        val d = cn(b)(j) - 2.0 * blockDot(v, b * dsub, cents(j))
        if (d < bestD) { bestD = d; best = j } // strict <: first min wins
        j += 1
      }
      out(b) = best
      b += 1
    }
    new GenericArrayData(out)
  }

  /** m×ksub LUT: lut[b][j] = x_block_b · cent_b[j]. */
  def lut(v: ArrayData, cb: Array[Array[Array[Float]]]): ArrayData = {
    val m = cb.length
    val out = new Array[Any](m)
    var b = 0
    while (b < m) {
      val cents = cb(b); val dsub = if (cents.isEmpty) 0 else cents(0).length
      val row = new Array[Double](cents.length)
      var j = 0
      while (j < cents.length) { row(j) = blockDot(v, b * dsub, cents(j)); j += 1 }
      out(b) = new GenericArrayData(row)
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** pq_encode(vec) under a plan-carried codebook -> array<int> of m codes.
  * Replaces the declarative m·ksub-subtree projection
  * ([[graft.llm.Similarity.pqCodesCol]]): the codebook rides as ONE
  * reference object, so the plan is m·ksub× smaller (analysis/codegen cost
  * was the dominant driver-side cost of every IVF-PQ query) and the
  * per-row loop is fused. Output-identical by construction (PqKernel). */
case class PqEncode(child: Expression,
                    codebook: Seq[Seq[Seq[Float]]]) extends UnaryExpression {
  override def prettyName: String = "pq_encode"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>; got ${other.simpleString}")
  }

  @transient private lazy val cb: Array[Array[Array[Float]]] =
    codebook.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val cn: Array[Array[Double]] = PqKernel.norms(cb)

  override def nullSafeEval(v: Any): Any =
    PqKernel.encode(v.asInstanceOf[ArrayData], cb, cn)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCb", cb, "float[][][]")
    val cnRef = ctx.addReferenceObj("pqCn", cn, "double[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.PqKernel.encode($v, $cbRef, $cnRef);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** pq_lut(vec) under a plan-carried codebook -> array<array<double>> of
  * per-block query·centroid dot products (the ADC lookup table). Same
  * plan-size rationale as [[PqEncode]]; values identical to the
  * declarative `array(array(dot_product(slice(vec), cent)...)...)`. */
case class PqLut(child: Expression,
                 codebook: Seq[Seq[Seq[Float]]]) extends UnaryExpression {
  override def prettyName: String = "pq_lut"
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>; got ${other.simpleString}")
  }

  @transient private lazy val cb: Array[Array[Array[Float]]] =
    codebook.map(_.map(_.toArray).toArray).toArray

  override def nullSafeEval(v: Any): Any =
    PqKernel.lut(v.asInstanceOf[ArrayData], cb)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCb", cb, "float[][][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.PqKernel.lut($v, $cbRef);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Signed-random-projection kernel: deterministic pseudo-random hyperplane
  * components from XXH64 of (bit, dimension) — no stored projection
  * matrix, so the "matrix" never ships with the plan and two engines (or
  * two years of runs) agree bit-for-bit. Uniform in [-1, 1): symmetric,
  * which is all SRP's collision bound needs (Charikar 2002,
  * sim(θ) = 1 - θ/π). */
object SrpKernel {
  /** Component of hyperplane `bit` at dimension `d`, in [-1, 1). */
  @inline def component(seed: Long, bit: Int, d: Int): Double = {
    val h = org.apache.spark.sql.catalyst.expressions.XXH64
      .hashLong((bit.toLong << 32) | (d.toLong & 0xFFFFFFFFL), seed)
    ((h >>> 11) * (1.0 / (1L << 53))) * 2.0 - 1.0
  }

  /** 64-bit SRP signature of a float vector: bit b = sign(v · plane_b). */
  def sign64(v: ArrayData, seed: Long): Long = {
    val n = v.numElements()
    val acc = new Array[Double](64)
    var d = 0
    while (d < n) {
      val x = v.getFloat(d)
      if (x != 0.0f) {
        var b = 0
        while (b < 64) { acc(b) += x * component(seed, b, d); b += 1 }
      }
      d += 1
    }
    var bits = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0.0) bits |= (1L << b); b += 1 }
    bits
  }
}

/** srp_sign64(vec) -> 64-bit signed-random-projection signature. Cosine
  * analog of SimHash for text: Hamming distance between signatures
  * estimates the angle (E[h] = 64·θ/π), so banded equality on signature
  * chunks is the LSH candidate stage for embedding near-dup at 100 TB —
  * no all-pairs, no stored matrix. Codegen calls the static kernel; the
  * loop is 64 fused multiply-adds per non-zero dimension. */
case class SrpSign64(child: Expression, seed: Long = 0L) extends UnaryExpression {
  override def prettyName: String = "srp_sign64"
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>; got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    SrpKernel.sign64(v.asInstanceOf[ArrayData], seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.SrpKernel.sign64($v, ${seed}L);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
