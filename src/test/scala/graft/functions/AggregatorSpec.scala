package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class AggregatorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("geometric mean matches closed form and is merge-consistent") {
    Aggregators.register(spark)
    val df = Seq(2.0, 8.0).toDF("x").repartition(2) // force a merge across partitions
    val g = df.agg(expr("geomean(x)")).head().getDouble(0)
    assert(math.abs(g - 4.0) < 1e-12)
  }

  test("bottom_k8 keeps the k smallest distinct keys across partitions") {
    Aggregators.register(spark)
    val df = (1L to 100L).toDF("k").union(Seq(3L, 3L, 7L).toDF("k")).repartition(4)
    val got = df.agg(expr("bottom_k8(k)")).head().getSeq[Long](0)
    assert(got == (1L to 8L))
  }

  test("typed aggregator works on the fixture tables in SQL") {
    Aggregators.register(spark)
    graft.engine.Tables.ensure(spark, TestSpark.sf)
    val r = spark.sql(
      "SELECT geomean(l_quantity) FROM lineitem WHERE l_quantity > 0").head().getDouble(0)
    assert(r > 1.0 && r < 50.0)
  }
}
