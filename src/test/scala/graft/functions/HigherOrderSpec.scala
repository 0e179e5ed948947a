package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Higher-order array functions (SURVEY §2.8 array family: the reference's
  * ~25 array fns map to Spark's transform/filter/aggregate/zip_with/
  * exists/forall). Includes the composed `zip_with`+`aggregate` dot
  * product cross-checked against the codegen'd DotProduct expression —
  * same semantics, two mechanisms.
  */
class HigherOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("zip_with + aggregate dot product matches the native expression") {
    val t = graft.engine.Tables(spark, TestSpark.sf)
    val pairs = t.embeddings.filter(col("vec_id") < 10).select(col("embedding").as("a"))
      .crossJoin(t.embeddings.filter(col("vec_id") === 10).select(col("embedding").as("b")))
    val composed = aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val rows = pairs.select(
      composed.as("hof"),
      Functions.dot_product(col("a"), col("b")).as("native")).collect()
    rows.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9))
  }

  test("transform / filter / exists / forall") {
    val r = Seq(Seq(1, 2, 3, 4)).toDF("xs").select(
      transform(col("xs"), x => x * 10).as("t"),
      filter(col("xs"), x => x % 2 === 0).as("f"),
      exists(col("xs"), x => x > 3).as("e"),
      forall(col("xs"), x => x > 0).as("fa")).head()
    assert(r.getSeq[Int](0) == Seq(10, 20, 30, 40))
    assert(r.getSeq[Int](1) == Seq(2, 4))
    assert(r.getBoolean(2) && r.getBoolean(3))
  }

  test("aggregate with finish lambda computes mean in one pass") {
    val mean = Seq(Seq(2.0, 4.0, 9.0)).toDF("xs").select(
      aggregate(col("xs"),
        struct(lit(0.0).as("s"), lit(0).as("c")),
        (acc, x) => struct((acc.getField("s") + x).as("s"), (acc.getField("c") + 1).as("c")),
        acc => acc.getField("s") / acc.getField("c"))).head().getDouble(0)
    assert(math.abs(mean - 5.0) < 1e-12)
  }

  test("map higher-order: transform_values / map_filter / map_zip_with") {
    val r = Seq(Map("a" -> 1, "b" -> 2)).toDF("m").select(
      transform_values(col("m"), (_, v) => v * 100).as("tv"),
      map_filter(col("m"), (_, v) => v > 1).as("mf")).head()
    assert(r.getMap[String, Int](0) == Map("a" -> 100, "b" -> 200))
    assert(r.getMap[String, Int](1) == Map("b" -> 2))
  }

  test("array set ops used by the dedup pipeline behave on edge cases") {
    val r = Seq((Seq(1L, 2L, 3L), Seq.empty[Long])).toDF("a", "b").select(
      size(array_intersect(col("a"), col("b"))).as("i"),
      size(array_union(col("a"), col("b"))).as("u"),
      size(array_except(col("a"), col("b"))).as("e")).head()
    assert(r.getInt(0) == 0 && r.getInt(1) == 3 && r.getInt(2) == 3)
  }
}
