package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.Functions

/** Round-16 optimization guards: the PqEncode/PqLut codegen kernels must be
  * value-identical to the declarative forms they replaced (the IVF-PQ
  * oracle family is EXACT-gated on these values), and Parallelism.spread
  * must be a pure re-partitioning (row-preserving, and a no-op when the
  * source is already split at least as wide as the session). */
class PqKernelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture(n: Int, dim: Int): Seq[(Long, Seq[Float])] =
    (0 until n).map { i =>
      // deterministic pseudo-random floats incl. negatives and repeats
      (i.toLong, (0 until dim).map(d =>
        (((i * 31 + d * 17) % 13) - 6) / 3.0f))
    }

  test("PqEncode/PqLut match the declarative dist/argmin and LUT forms") {
    val dim = 16; val m = 4; val ksub = 5
    val rows = fixture(40, dim)
    val cb: Seq[Seq[Seq[Float]]] = (0 until m).map(b =>
      (0 until ksub).map(j => rows(j)._2.slice(b * (dim / m), (b + 1) * (dim / m))))
    val df = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))

    // declarative reference: the exact expression pqCodesCol used before
    val dsub = dim / m
    val declCodes = array(cb.zipWithIndex.map { case (cents, b) =>
      val blk = slice(col("embedding"), b * dsub + 1, dsub)
      val dists = array(cents.map { c =>
        val cNorm = c.map(v => v.toDouble * v).sum
        lit(cNorm) - lit(2.0) * Functions.dot_product(blk, typedLit(c))
      }: _*)
      (array_position(dists, array_min(dists)) - 1).cast("int")
    }: _*)
    val declLut = array((0 until m).map { b =>
      val blk = slice(col("embedding"), b * dsub + 1, dsub)
      array(cb(b).map(cent => Functions.dot_product(blk, typedLit(cent))): _*)
    }: _*)

    val got = df.select(col("vec_id"),
        Functions.pq_encode(col("embedding"), cb).as("k_codes"),
        declCodes.as("d_codes"),
        Functions.pq_lut(col("embedding"), cb).as("k_lut"),
        declLut.as("d_lut"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Int](1) == r.getSeq[Int](2), s"codes diverge at ${r.get(0)}")
      val kl = r.getSeq[Seq[Double]](3); val dl = r.getSeq[Seq[Double]](4)
      assert(kl == dl, s"LUT diverges at ${r.get(0)}")
    }
  }

  test("spread: no-op at/above target parallelism, row-preserving below") {
    import graft.engine.Parallelism
    val target = spark.sparkContext.defaultParallelism
    val narrow = spark.range(0, 1000).toDF("id").coalesce(1)
    val spreadDf = Parallelism.spread(narrow)
    assert(spreadDf.rdd.getNumPartitions == target,
      "an under-split source must spread to the session's parallelism")
    assert(spreadDf.select(sum(col("id"))).head.getLong(0) ==
      narrow.select(sum(col("id"))).head.getLong(0), "rows must be preserved")
    val wide = spark.range(0, 1000).toDF("id").repartition(target)
    // already at target: spread must not add another exchange
    assert(Parallelism.spread(wide).queryExecution.optimizedPlan.toString ==
      wide.queryExecution.optimizedPlan.toString)
    // kill switch
    spark.conf.set("spark.graft.spreadSmallScans", "false")
    try assert(Parallelism.spread(narrow).rdd.getNumPartitions == 1)
    finally spark.conf.unset("spark.graft.spreadSmallScans")
  }
}
