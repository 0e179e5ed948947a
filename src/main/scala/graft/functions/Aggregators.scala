package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregates (reference `@AggrFunction` templates /
  * `exec/expr/AggrFunction.java` — the internal UDAF extension mechanism;
  * SURVEY §2.9 maps them to `Aggregator[IN, BUF, OUT]`).
  *
  * Each has an associative, commutative merge — the property that makes the
  * reference's two-phase (partial+final) aggregation apply; Spark plans the
  * same partial/final split automatically, so these scale like built-ins.
  */
object Aggregators {

  /** Geometric mean via sum-of-logs (exp of the mean log). */
  object GeometricMean extends Aggregator[Double, (Double, Long), Double] {
    override def zero: (Double, Long) = (0.0, 0L)
    override def reduce(b: (Double, Long), a: Double): (Double, Long) =
      if (a > 0) (b._1 + math.log(a), b._2 + 1) else b
    override def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
      (x._1 + y._1, x._2 + y._2)
    override def finish(b: (Double, Long)): Double =
      if (b._2 == 0) Double.NaN else math.exp(b._1 / b._2)
    override def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Bounded top-k distinct sample: keeps the k smallest distinct longs —
    * a mergeable "exact sketch" useful for key diagnostics. */
  final case class BottomK(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
    override def zero: Seq[Long] = Vector.empty
    override def reduce(b: Seq[Long], a: Long): Seq[Long] = insert(b, a)
    override def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] = y.foldLeft(x)(insert)
    override def finish(b: Seq[Long]): Seq[Long] = b
    private def insert(b: Seq[Long], a: Long): Seq[Long] =
      if (b.contains(a)) b
      else {
        val nb = (b :+ a).sorted
        if (nb.size > k) nb.take(k) else nb
      }
    override def bufferEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Register SQL-callable forms (`udaf` bridges Aggregator into the
    * FunctionRegistry). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.udf.register("geomean", org.apache.spark.sql.functions.udaf(GeometricMean))
    spark.udf.register("bottom_k8", org.apache.spark.sql.functions.udaf(BottomK(8)))
  }
}
