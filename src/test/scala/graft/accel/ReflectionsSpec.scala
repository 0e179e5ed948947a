package graft.accel

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.engine.Tables

class ReflectionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def aggQuery() = {
    val t = Tables(spark, TestSpark.sf)
    t.lineitem.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
  }

  test("matching query is answered from the materialization") {
    Reflections.clear()
    Reflections.install(spark)
    val dir = Files.createTempDirectory("graft_refl").toString
    Reflections.create("r_flag_agg", aggQuery(), s"$dir/r_flag_agg")

    val q = aggQuery()
    // the physical scan's Location reveals what is actually read
    val planStr = q.queryExecution.sparkPlan.toString
    assert(planStr.contains("r_flag_agg"), s"no substitution in:\n$planStr")
    assert(!planStr.contains("lineitem.parquet"), "base table still scanned")

    // results identical to the unaccelerated answer
    val expect = aggQuery().queryExecution.logical
    Reflections.drop("r_flag_agg")
    val cold = aggQuery().orderBy("l_returnflag", "l_linestatus").collect()
    Reflections.create("r_flag_agg", aggQuery(), s"$dir/r_flag_agg")
    val hot = aggQuery().orderBy("l_returnflag", "l_linestatus").collect()
    assert(cold.sameElements(hot))
    Reflections.clear()
  }

  test("substitution survives operators stacked on top") {
    Reflections.clear()
    Reflections.install(spark)
    val dir = Files.createTempDirectory("graft_refl2").toString
    Reflections.create("r2", aggQuery(), s"$dir/r2")
    val q = aggQuery().filter(col("n") > 0).orderBy(desc("qty")).limit(2)
    val planStr = q.queryExecution.sparkPlan.toString
    assert(planStr.contains("/r2"), s"no substitution in:\n$planStr")
    assert(q.collect().length == 2)
    Reflections.clear()
  }

  test("dropped reflection stops substituting") {
    Reflections.clear()
    Reflections.install(spark)
    val dir = Files.createTempDirectory("graft_refl3").toString
    Reflections.create("r3", aggQuery(), s"$dir/r3")
    Reflections.drop("r3")
    val planStr = aggQuery().queryExecution.sparkPlan.toString
    assert(!planStr.contains("/r3"))
    assert(planStr.contains("lineitem.parquet"))
  }

  test("roll-up subsumption: coarser grouping served by a superset reflection") {
    Reflections.clear()
    Reflections.install(spark)
    val t = Tables(spark, TestSpark.sf)
    def roll() = t.lineitem.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("qty"), count(lit(1)).as("n"))
    val cold = roll().orderBy("l_returnflag").collect()

    val dir = Files.createTempDirectory("graft_refl5").toString
    Reflections.create("r5", aggQuery(), s"$dir/r5")
    val q = roll()
    val planStr = q.queryExecution.sparkPlan.toString
    assert(planStr.contains("/r5"), s"no roll-up substitution in:\n$planStr")
    assert(!planStr.contains("lineitem.parquet"), "base table still scanned")
    val hot = q.orderBy("l_returnflag").collect()
    assert(cold.sameElements(hot), "roll-up answer differs from base answer")
    Reflections.clear()
  }

  test("projection subsumption: DISTINCT grouping-subset served by reflection") {
    Reflections.clear()
    Reflections.install(spark)
    val t = Tables(spark, TestSpark.sf)
    def distinctFlags() = t.lineitem.select(col("l_returnflag")).distinct()
    val cold = distinctFlags().orderBy("l_returnflag").collect()

    val dir = Files.createTempDirectory("graft_refl6").toString
    Reflections.create("r6", aggQuery(), s"$dir/r6")
    val q = distinctFlags()
    val planStr = q.queryExecution.sparkPlan.toString
    assert(planStr.contains("/r6"), s"no substitution in:\n$planStr")
    val hot = q.orderBy("l_returnflag").collect()
    assert(cold.sameElements(hot))
    Reflections.clear()
  }

  test("roll-up COUNT over an EMPTY reflection returns 0, not NULL") {
    Reflections.clear()
    Reflections.install(spark)
    val t = Tables(spark, TestSpark.sf)
    def noRows() = t.lineitem.filter(col("l_quantity") < -1) // matches nothing
    val dir = Files.createTempDirectory("graft_refl9").toString
    Reflections.create("r9",
      noRows().groupBy(col("l_returnflag")).agg(count(lit(1)).as("n")), s"$dir/r9")
    // global COUNT rolls up from the (empty) materialization: must be 0
    val q = noRows().agg(count(lit(1)).as("n"))
    val planStr = q.queryExecution.sparkPlan.toString
    assert(planStr.contains("/r9"), s"no roll-up substitution in:\n$planStr")
    val row = q.collect()(0)
    assert(!row.isNullAt(0) && row.getLong(0) == 0L,
      s"COUNT over empty reflection must be 0, got $row")
    Reflections.clear()
  }

  test("no subsumption when query groups outside the reflection's keys") {
    Reflections.clear()
    Reflections.install(spark)
    val t = Tables(spark, TestSpark.sf)
    val dir = Files.createTempDirectory("graft_refl7").toString
    Reflections.create("r7", aggQuery(), s"$dir/r7")
    val q = t.lineitem.groupBy(col("l_suppkey")).agg(count(lit(1)).as("n"))
    val planStr = q.queryExecution.sparkPlan.toString
    assert(!planStr.contains("/r7"), "substituted a non-subsumed grouping")
    assert(planStr.contains("lineitem"), "base table should be scanned")
    Reflections.clear()
  }

  test("no subsumption for non-roll-up aggregates (avg) or distinct aggs") {
    Reflections.clear()
    Reflections.install(spark)
    val t = Tables(spark, TestSpark.sf)
    val dir = Files.createTempDirectory("graft_refl8").toString
    Reflections.create("r8", aggQuery(), s"$dir/r8")
    // avg is not re-aggregable from sum-only outputs; count distinct never is
    val q1 = t.lineitem.groupBy(col("l_returnflag")).agg(avg(col("l_quantity")).as("a"))
    assert(!q1.queryExecution.sparkPlan.toString.contains("/r8"))
    val q2 = t.lineitem.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_linestatus")).as("nd"))
    assert(!q2.queryExecution.sparkPlan.toString.contains("/r8"))
    Reflections.clear()
  }

  test("incremental refresh rewrites only touched partitions") {
    import spark.implicits._
    Reflections.clear()
    Reflections.install(spark)
    val dir = Files.createTempDirectory("graft_refl4").toString
    val base = Seq(("2024-01-01", 1L), ("2024-01-02", 2L)).toDF("day", "v")
    Reflections.create("r4", base, s"$dir/r4")
    // partitioned materialization + delta for one day
    base.write.mode("overwrite").partitionBy("day").parquet(s"$dir/r4")
    spark.catalog.refreshByPath(s"$dir/r4")
    Reflections.refreshIncremental("r4",
      Seq(("2024-01-02", 20L)).toDF("day", "v"), "day")
    val rows = spark.read.parquet(s"$dir/r4")
      .orderBy("day").select("v").as[Long].collect().toSeq
    assert(rows == Seq(1L, 20L))
    Reflections.clear()
  }

  test("two eligible roll-up reflections: candidate order is deterministic (by name)") {
    Reflections.clear()
    Reflections.install(spark)
    val t = Tables(spark, TestSpark.sf)
    def roll() = t.lineitem.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("qty"))
    val dir = Files.createTempDirectory("graft_refl6").toString
    // both materializations can serve the roll-up; the name-ordered first
    // ("aa_refl") must win on every planning, not TrieMap iteration luck
    Reflections.create("zz_refl", aggQuery(), s"$dir/zz_refl")
    Reflections.create("aa_refl", aggQuery(), s"$dir/aa_refl")
    (1 to 3).foreach { _ =>
      val planStr = roll().queryExecution.sparkPlan.toString
      assert(planStr.contains("/aa_refl"),
        s"expected the name-ordered first reflection to serve the query:\n$planStr")
    }
    Reflections.clear()
  }

  test("one reflection substituted into two subtrees of one query keeps attributes distinct") {
    Reflections.clear()
    Reflections.install(spark)
    val dir = Files.createTempDirectory("graft_refl7").toString
    Reflections.create("r7", aggQuery(), s"$dir/r7")
    // self-join of the accelerated subtree: both sides resolve to the same
    // cached scan, which must be re-instanced (fresh exprIds) per use
    val a = aggQuery().as("a")
    val b = aggQuery().as("b")
    val q = a.join(b, Seq("l_returnflag", "l_linestatus"))
      .select(col("l_returnflag"), (col("a.n") + col("b.n")).as("n2"))
    val planStr = q.queryExecution.sparkPlan.toString
    assert(planStr.contains("/r7"), s"no substitution in:\n$planStr")
    assert(q.collect().nonEmpty)
    Reflections.clear()
  }
}
