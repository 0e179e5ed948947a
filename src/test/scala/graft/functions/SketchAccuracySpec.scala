package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.engine.Tables

/** Numeric error bounds for the approximate (rows-only) aggregates, so the
  * sketch queries are falsifiable against exact answers rather than only
  * shape-checked (VERDICT r1: make no-oracle entries falsifiable).
  * DataSketches HLL at default lgK=12 has ~1.6% standard error; Spark's
  * approx_count_distinct default rsd is 5%; percentile_approx at 10k
  * accuracy is within 1/10000 rank error. All deterministic on the fixed
  * fixture. */
class SketchAccuracySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("hll_sketch_estimate and approx_count_distinct within error bounds") {
    val t = Tables(spark, TestSpark.sf)
    val approx = t.lineitem.groupBy(col("l_returnflag"))
      .agg(
        hll_sketch_estimate(hll_sketch_agg(col("l_partkey"))).as("ndv_parts"),
        approx_count_distinct(col("l_suppkey")).as("ndv_supps"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = t.lineitem.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("p"), countDistinct(col("l_suppkey")).as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (flag, (p, s)) =>
      val (ap, as_) = approx(flag)
      assert(math.abs(ap - p).toDouble / p <= 0.05, s"HLL ndv off >5%: $flag $ap vs $p")
      assert(math.abs(as_ - s).toDouble / s <= 0.15, s"ACD ndv off >15%: $flag ${as_} vs $s")
    }
  }

  test("merged HLL total within 5% of exact global NDV") {
    val t = Tables(spark, TestSpark.sf)
    val merged = t.lineitem.groupBy(col("l_returnflag"))
      .agg(hll_sketch_agg(col("l_partkey")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("total"))
      .head().getLong(0)
    val exact = t.lineitem.select(countDistinct(col("l_partkey"))).head().getLong(0)
    assert(math.abs(merged - exact).toDouble / exact <= 0.05,
      s"merged HLL $merged vs exact $exact")
  }

  test("percentile_approx within tight rank error of exact percentile") {
    val t = Tables(spark, TestSpark.sf)
    val both = t.lineitem.groupBy(col("l_returnflag"))
      .agg(
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("ap"),
        expr("percentile(l_extendedprice, 0.5)").as("ex"))
      .collect()
    both.foreach { r =>
      val (ap, ex) = (r.getDouble(1), r.getDouble(2))
      assert(math.abs(ap - ex) / ex <= 0.01,
        s"approx median off >1%: ${r.getString(0)} $ap vs $ex")
    }
  }
}
