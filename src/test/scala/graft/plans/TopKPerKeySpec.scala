package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.engine.Tables

class TopKPerKeySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("returns exactly the windowed top-k rows (equivalence oracle)") {
    val t = Tables(spark, TestSpark.sf)
    val base = t.orders.select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))

    val custom = TopKPerKey(base, col("o_custkey"), col("o_totalprice"), col("o_orderkey"), 3)
      .select("o_custkey", "o_orderkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val windowed = base.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(custom == windowed)
  }

  test("plans as TopKPerKeyExec above a hash exchange") {
    val t = Tables(spark, TestSpark.sf)
    val df = TopKPerKey(t.orders, col("o_custkey"), col("o_totalprice"), col("o_orderkey"), 2)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"strategy not applied:\n$plan")
    assert(plan.contains("Exchange hashpartitioning") || plan.contains("ShuffleQueryStage"),
      s"no clustering exchange:\n$plan")
  }

  test("k larger than group size returns whole groups") {
    val t = Tables(spark, TestSpark.sf)
    val nat = t.nation.select(col("n_regionkey"), col("n_nationkey"))
    val n = TopKPerKey(nat, col("n_regionkey"),
      col("n_nationkey"), col("n_nationkey"), 100).count()
    assert(n == 25)
  }

  test("high-cardinality keys under a tight memory budget spill and stay correct") {
    import spark.implicits._
    // ~50k distinct keys × 4 rows; a few-KB budget forces many sorted-run
    // flushes, exercising the external merge path end to end.
    val df = spark.range(200000)
      .select((col("id") % 50000).as("k"),
        (col("id") % 97).cast("double").as("s"), col("id").as("tie"))
    spark.conf.set("spark.graft.topKPerKey.memoryBytes", "65536")
    try {
      val topk = TopKPerKey(df.toDF(), col("k"), col("s"), col("tie"), 2)
      // collect from `topk` itself so the metric below reads the same
      // queryExecution that actually ran (a .select would re-plan)
      val got = topk.collect()
        .map(r => (r.getAs[Long]("k"), r.getAs[Long]("tie"))).toSet
      val w = Window.partitionBy(col("k")).orderBy(col("s").desc, col("tie"))
      val want = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
        .select("k", "tie").as[(Long, Long)].collect().toSet
      assert(got == want, s"spilled result diverged: ${got.diff(want).take(5)} / ${want.diff(got).take(5)}")
      // the spill path must actually have run; AQE hides the node inside
      // (leaf) query-stage wrappers, so unwrap them explicitly
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def findTopK(p: SparkPlan): Option[TopKPerKeyExec] = p match {
        case e: TopKPerKeyExec => Some(e)
        case a: AdaptiveSparkPlanExec => findTopK(a.executedPlan)
        case q: QueryStageExec => findTopK(q.plan)
        case other => other.children.iterator.map(findTopK).collectFirst { case Some(e) => e }
      }
      val execNode = findTopK(topk.queryExecution.executedPlan)
      assert(execNode.exists(_.metrics("spilledRuns").value > 0),
        s"expected spilled runs under a 64KB budget; got=${execNode.map(_.metrics("spilledRuns").value)}")
    } finally spark.conf.unset("spark.graft.topKPerKey.memoryBytes")
  }

  test("ties break deterministically on the tieBreak column") {
    import spark.implicits._
    val df = Seq((1L, 10.0, 5L), (1L, 10.0, 2L), (1L, 10.0, 9L)).toDF("k", "s", "id")
    val kept = TopKPerKey(df, col("k"), col("s"), col("id"), 2)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 5L))
  }
}
