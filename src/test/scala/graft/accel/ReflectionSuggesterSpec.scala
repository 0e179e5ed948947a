package graft.accel

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.engine.Tables

/** Stats-driven reflection suggestion (`ReflectionSuggester.java:57`,
  * `generate():296-337`): the single-pass profile, the dimension/measure
  * split with its cardinality and cartesian budgets, and the end-to-end
  * suggest → materialize → a matching query is served by the suggested
  * reflection. */
class ReflectionSuggesterSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private lazy val t = Tables.ensure(spark, TestSpark.sf)

  test("analyze profiles every simple column in one aggregate pass") {
    val (n, stats) = ReflectionSuggester.analyze(t.lineitem)
    n should be > 1000L
    val flag = stats.find(_.name == "l_returnflag").get
    flag.cardinality should (be >= 2L and be <= 4L) // A/N/R, HLL-approximate
    flag.maxLen shouldBe 1L
    val qty = stats.find(_.name == "l_quantity").get
    qty.numeric shouldBe true
    // key column cardinality tracks the table scale
    stats.find(_.name == "l_orderkey").get.cardinality should be > (n / 10)
  }

  test("suggest: RAW passes fields through; AGG splits dimensions from measures") {
    val suggestions = ReflectionSuggester.suggest(t.lineitem, "lineitem")
    val raw = suggestions.find(_.rtype == "RAW").get
    raw.displayFields shouldBe t.lineitem.schema.fieldNames.toSeq
    raw.name shouldBe "AUTO_lineitem_RAW_0"

    val agg = suggestions.find(_.rtype == "AGG").get
    // low-cardinality narrow strings are dimensions
    agg.dimensions should contain allOf ("l_returnflag", "l_linestatus")
    // fractional columns are never dimensions (DX-7524), always measures
    agg.dimensions should not contain "l_extendedprice"
    agg.measures should contain("l_extendedprice")
    // high-cardinality keys are excluded by the 1%-of-rows budget
    agg.dimensions should not contain "l_orderkey"
    // first dimension is the lowest-cardinality candidate
    val (_, stats) = ReflectionSuggester.analyze(t.lineitem)
    val dimStats = stats.filter(s => agg.dimensions.contains(s.name))
    agg.dimensions.head shouldBe dimStats.minBy(_.cardinality).name
    // dimensions never repeat as measures
    agg.dimensions.toSet.intersect(agg.measures.toSet) shouldBe empty
  }

  test("generate honors the cartesian-product budget") {
    import spark.implicits._
    val df = (0 until 2000)
      .map(i => (i.toString, (i / 2).toString, i % 3)).toDF("hi", "mid", "lo")
    val agg = ReflectionSuggester.suggest(df, "t").find(_.rtype == "AGG").get
    // lo (card 3) leads; hi/mid (card ≥ 1000 = 50% of rows) fail the 1% rule
    agg.dimensions shouldBe Seq("lo")
  }

  test("a suggested AGG reflection is materialized and serves a matching query") {
    Reflections.clear()
    Reflections.install(spark)
    val agg = ReflectionSuggester.suggest(t.lineitem, "lineitem")
      .find(_.rtype == "AGG").get
    val dir = Files.createTempDirectory("graft_suggest").toString
    val name = ReflectionSuggester.materialize(spark, t.lineitem, agg, s"$dir/mv")
    name shouldBe "AUTO_lineitem_AGG_0"

    // the canonical roll-up: coarser grouping + summable measures
    def q() = t.lineitem.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("qty"), count(lit(1)).as("n"))
    val served = q().queryExecution.sparkPlan.toString
    assert(served.contains(dir), s"query not served by the suggested reflection:\n$served")
    assert(!served.contains("lineitem.parquet"), "base table still scanned")

    Reflections.drop(name)
    val cold = q().orderBy("l_returnflag").collect()
    ReflectionSuggester.materialize(spark, t.lineitem, agg, s"$dir/mv")
    val hot = q().orderBy("l_returnflag").collect()
    hot shouldBe cold
    Reflections.clear()
  }

  test("suggest_reflections('<dir>') surfaces the proposals through SQL") {
    val rows = spark.sql(
      s"SELECT name, type, dimensions, measures " +
        s"FROM suggest_reflections('${TestSpark.sf}/part.parquet') ORDER BY type").collect()
    rows.map(_.getString(1)).toSeq shouldBe Seq("AGG", "RAW")
    val agg = rows(0)
    agg.getString(0) shouldBe "AUTO_part_AGG_0"
    // ~200 rows at sf0.001 → 1% budget ≈ 2: only the unconditional first
    // (lowest-cardinality) dimension survives
    agg.getSeq[String](2) shouldBe Seq("p_type")
    agg.getSeq[String](3) should contain("p_retailprice")
  }
}
