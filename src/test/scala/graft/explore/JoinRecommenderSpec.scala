package graft.explore

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.catalog.QueryHistory
import graft.engine.Tables

/** Jobs-based join recommendations (`JobsBasedRecommender.java:74-160`):
  * completed actions feed per-join analysis (base tables + key pairs),
  * and recommendations for a dataset merge identical joins, rank by
  * (job count, recency), and orient keys to the queried side. */
class JoinRecommenderSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private def awaitObservations(n: Int): Unit = {
    val deadline = System.nanoTime() + 15e9.toLong
    while (QueryHistory.joinObservations.size < n && System.nanoTime() < deadline)
      Thread.sleep(50)
  }

  test("equi-joins resolve to base tables and feed ranked, oriented recommendations") {
    QueryHistory.install(spark)
    val t = Tables.ensure(spark, TestSpark.sf)
    val before = QueryHistory.joinObservations.size

    // two jobs join orders⋈lineitem, one joins customer⋈orders (orders on the RIGHT)
    t.orders.join(t.lineitem, t.orders("o_orderkey") === t.lineitem("l_orderkey"))
      .count()
    t.orders.join(t.lineitem, t.orders("o_orderkey") === t.lineitem("l_orderkey"))
      .select("o_orderstatus").limit(5).collect()
    t.customer.join(t.orders, t.customer("c_custkey") === t.orders("o_custkey"))
      .count()
    awaitObservations(before + 3)

    val obs = QueryHistory.joinObservations.take(3)
    obs.foreach(_.joinType.toUpperCase should include("INNER"))
    obs.map(o => (o.leftTable.split('/').last, o.rightTable.split('/').last)) should
      contain("customer.parquet" -> "orders.parquet")

    val recos = JoinRecommender.recommend("orders")
    recos should not be empty
    // lineitem reco merged across both jobs (other suites may share the ring,
    // so assert the merge floor, not the exact count)
    val li = recos.find(_.otherTable.endsWith("lineitem.parquet")).get
    li.jobCount should be >= 2L
    li.keys shouldBe Seq("o_orderkey" -> "l_orderkey")
    // customer reco exists and is ORIENTED: target key first, even though
    // orders sat on the right side of the observed join
    val cust = recos.find(_.otherTable.endsWith("customer.parquet")).get
    cust.keys shouldBe Seq("o_custkey" -> "c_custkey")
    recos.map(_.jobCount) shouldBe recos.map(_.jobCount).sorted.reverse
  }

  test("joins through projections and filters still resolve; non-equi joins do not") {
    QueryHistory.install(spark)
    val t = Tables.ensure(spark, TestSpark.sf)
    val before = QueryHistory.joinObservations.size

    // keys pass through select/filter/alias chains (ExprIds survive analysis)
    t.nation.select("n_nationkey", "n_name").where("n_nationkey >= 0")
      .join(t.region.select("r_regionkey", "r_name"),
        org.apache.spark.sql.functions.col("n_nationkey") ===
          org.apache.spark.sql.functions.col("r_regionkey"))
      .count()
    awaitObservations(before + 1)
    val obs = QueryHistory.joinObservations.head
    obs.leftKeys shouldBe Seq("n_nationkey")
    obs.rightKeys shouldBe Seq("r_regionkey")

    // a pure theta join yields no equi-key observation
    val before2 = QueryHistory.joinObservations.size
    t.nation.join(t.region,
      org.apache.spark.sql.functions.col("n_nationkey") >
        org.apache.spark.sql.functions.col("r_regionkey")).count()
    // give the listener a beat, then confirm nothing equi-shaped arrived
    Thread.sleep(500)
    QueryHistory.joinObservations.size shouldBe before2
  }

  test("join_recommendations('<table>') is a SQL table function over the same ranking") {
    QueryHistory.install(spark)
    val t = Tables.ensure(spark, TestSpark.sf)
    t.supplier.join(t.nation, t.supplier("s_nationkey") === t.nation("n_nationkey"))
      .count()
    awaitObservations(1)

    val rows = spark.sql(
      "SELECT other_table, target_keys, other_keys, job_count " +
        "FROM join_recommendations('supplier')").collect()
    rows should not be empty
    val top = rows.find(_.getString(0).endsWith("nation.parquet")).get
    top.getSeq[String](1) shouldBe Seq("s_nationkey")
    top.getSeq[String](2) shouldBe Seq("n_nationkey")

    // and the raw analysis is queryable as a sys view
    graft.catalog.InfoSchema.register(spark)
    spark.sql("SELECT count(*) FROM sys_join_analysis").collect()(0).getLong(0) should be >= 1L
  }
}
