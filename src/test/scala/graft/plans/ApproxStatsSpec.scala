package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.sources.SnapshotTable

/** ALTER LAKE ... ENABLE APPROXIMATE STATS (reference SqlSetApprox →
  * SetApproxHandler → CountDistinctConvertlet): opted-in tables plan
  * COUNT(DISTINCT col) as an HLL++ sketch — a fixed-size, map-side-merged
  * buffer instead of the Expand + value-keyed second shuffle the exact
  * plan needs. Pins: the rewrite fires only for flagged tables; only for
  * decidable column origins; the sketch's small-range answers are exact
  * for the oracle fixture's value sets; accuracy stays within the
  * configured rsd at real cardinality; DISABLE restores the exact plan. */
class ApproxStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark.newSession()

  private def lakeDir(): String =
    java.nio.file.Files.createTempDirectory("graft_approx").toString

  private def hasHll(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.toString.contains("approx_count_distinct")

  test("flagged table plans count(distinct) as HLL++; disable restores exact") {
    val dir = lakeDir()
    val cust = spark.read.parquet(s"${TestSpark.sf}/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey"))
    SnapshotTable.create(spark, dir, cust)

    // unflagged: exact plan
    val before = SnapshotTable.forPath(spark, dir).read()
      .agg(countDistinct(col("c_mktsegment")).as("ndv"))
    assert(!hasHll(before), "rewrite must not fire without the opt-in")

    spark.sql(s"ALTER LAKE '$dir' ENABLE APPROXIMATE STATS")
    val after = SnapshotTable.forPath(spark, dir).read()
      .agg(countDistinct(col("c_mktsegment")).as("ndv"))
    assert(hasHll(after), "opt-in table should plan the NDV sketch:\n" +
      after.queryExecution.optimizedPlan)
    // exact plan's Expand is gone — one ordinary aggregate
    assert(!after.queryExecution.executedPlan.toString.contains("Expand"))

    // small-range exactness: 5 fixed segment strings sit in the sketch's
    // linear-counting range, so the estimate IS the exact count — the
    // property lake_approx_ndv's DuckDB oracle relies on (value-set
    // dependent, not row-count dependent, so it holds at every SF)
    val exact = SnapshotTable.forPath(spark, dir).read()
      .agg(countDistinct(col("c_mktsegment"))).head.getLong(0)
    assert(after.head.getLong(0) == exact && exact == 5L)

    spark.sql(s"ALTER LAKE '$dir' DISABLE APPROXIMATE STATS")
    val off = SnapshotTable.forPath(spark, dir).read()
      .agg(countDistinct(col("c_mktsegment")).as("ndv"))
    assert(!hasHll(off), "DISABLE must restore the exact plan")
  }

  test("rewrite survives projections/filters/joins; refuses mixed and computed origins") {
    val dir = lakeDir()
    val cust = spark.read.parquet(s"${TestSpark.sf}/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey"))
    SnapshotTable.create(spark, dir, cust)
    spark.sql(s"ALTER LAKE '$dir' ENABLE APPROXIMATE STATS")
    val lake = SnapshotTable.forPath(spark, dir).read()

    // through alias + filter + self-join the origin is still the flagged
    // table → rewrite
    val t = lake.select(col("c_mktsegment").as("seg"), col("c_custkey"))
      .filter(col("c_custkey") > 0)
    val joined = t.join(lake, t("c_custkey") === lake("c_custkey"))
      .agg(countDistinct(col("seg")).as("ndv"))
    assert(hasHll(joined), "origin tracing through alias/filter/join failed:\n" +
      joined.queryExecution.optimizedPlan)

    // a column from a NON-flagged source (plain parquet) must stay exact,
    // even in the same query as a flagged one
    val plain = spark.read.parquet(s"${TestSpark.sf}/nation.parquet")
    val mixed = lake.join(plain, lake("c_nationkey") === plain("n_nationkey"))
      .agg(countDistinct(col("n_name")).as("ndv_nation"),
           countDistinct(col("c_mktsegment")).as("ndv_seg"))
    val opt = mixed.queryExecution.optimizedPlan.toString
    assert(opt.contains("approx_count_distinct"), "flagged side should rewrite")
    assert(opt.contains("count(distinct"), "unflagged side must stay exact:\n" + opt)

    // computed expression: origin undecidable → exact
    val computed = lake.agg(
      countDistinct(concat(col("c_mktsegment"), lit("x"))).as("ndv"))
    assert(!hasHll(computed), "computed-expression arg must stay exact")

    // multi-arg count(distinct a, b): the reference convertlet only
    // handles single columns → exact
    val multi = lake.agg(
      countDistinct(col("c_mktsegment"), col("c_nationkey")).as("ndv"))
    assert(!hasHll(multi), "multi-arg count distinct must stay exact")
  }

  test("accuracy at real cardinality stays within the sketch rsd envelope") {
    val dir = lakeDir()
    import spark.implicits._
    val n = 200000
    SnapshotTable.create(spark, dir,
      spark.range(n).select((col("id") * 7919L % 50021L).as("k")))
    spark.sql(s"ALTER LAKE '$dir' ENABLE APPROXIMATE STATS")
    val lake = SnapshotTable.forPath(spark, dir).read()
    val df = lake.agg(countDistinct(col("k")).as("ndv"))
    assert(hasHll(df))
    val approx = df.head.getLong(0)
    val exact = lake.select(col("k")).distinct().count()
    val err = math.abs(approx.toDouble - exact) / exact
    assert(err <= 0.10, s"approx $approx vs exact $exact: err $err")
  }

  test("session kill-switch disables the rewrite without touching the table") {
    val dir = lakeDir()
    SnapshotTable.create(spark, dir,
      spark.read.parquet(s"${TestSpark.sf}/customer.parquet")
        .select(col("c_custkey"), col("c_mktsegment")))
    spark.sql(s"ALTER LAKE '$dir' ENABLE APPROXIMATE STATS")
    spark.conf.set("spark.graft.approx.stats", "false")
    try {
      val df = SnapshotTable.forPath(spark, dir).read()
        .agg(countDistinct(col("c_mktsegment")).as("ndv"))
      assert(!hasHll(df), "kill-switch must suppress the rewrite")
    } finally spark.conf.unset("spark.graft.approx.stats")
  }
}
