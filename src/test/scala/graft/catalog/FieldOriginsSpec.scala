package graft.catalog

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.engine.Tables
import graft.catalog.FieldOrigins.{FieldOrigin, Origin}

/** Column lineage pinned against the reference's FieldOrigin semantics
  * (`QueryMetadata.java:374` FieldOriginExtractor): pass-through columns,
  * derived expressions, multi-origin arithmetic, joins with aliases,
  * aggregates, views, unions, literals. Analysis-only — no job runs. */
class FieldOriginsSpec extends AnyFunSuite with Matchers {
  private lazy val spark = { val s = TestSpark.spark; Tables.ensure(s, TestSpark.sf); s }

  private def of(sql: String): Map[String, FieldOrigin] =
    FieldOrigins.of(spark, sql).map(f => f.field -> f).toMap

  test("pass-through vs computed columns") {
    val m = of("SELECT l_orderkey, l_quantity * 2 AS q2 FROM lineitem")
    m("l_orderkey") shouldBe FieldOrigin("l_orderkey",
      Seq(Origin("lineitem", "l_orderkey")), derived = false)
    m("q2") shouldBe FieldOrigin("q2",
      Seq(Origin("lineitem", "l_quantity")), derived = true)
  }

  test("multi-origin expression collects every referenced base column") {
    val m = of("SELECT l_extendedprice * (1 - l_discount) AS rev FROM lineitem")
    m("rev").origins shouldBe Seq(
      Origin("lineitem", "l_discount"), Origin("lineitem", "l_extendedprice"))
    m("rev").derived shouldBe true
  }

  test("joins with table aliases resolve to the correct side") {
    val m = of("""SELECT o.o_custkey AS cust, c.c_name
                  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey""")
    m("cust").origins shouldBe Seq(Origin("orders", "o_custkey"))
    m("cust").derived shouldBe false
    m("c_name").origins shouldBe Seq(Origin("customer", "c_name"))
  }

  test("aggregates are derived; grouping keys pass through") {
    val m = of("""SELECT l_returnflag, sum(l_quantity) AS s
                  FROM lineitem GROUP BY l_returnflag""")
    m("l_returnflag").derived shouldBe false
    m("s") shouldBe FieldOrigin("s", Seq(Origin("lineitem", "l_quantity")), derived = true)
  }

  test("lineage traces THROUGH a view to the base table") {
    spark.sql("""CREATE OR REPLACE TEMP VIEW fo_view AS
                 SELECT o_custkey AS k, o_totalprice * 2 AS p2 FROM orders""")
    val m = of("SELECT k, p2 FROM fo_view WHERE p2 > 10")
    m("k") shouldBe FieldOrigin("k", Seq(Origin("orders", "o_custkey")), derived = false)
    m("p2") shouldBe FieldOrigin("p2", Seq(Origin("orders", "o_totalprice")), derived = true)
  }

  test("union merges origins positionally from every branch") {
    val m = of("""SELECT o_custkey AS k FROM orders
                  UNION ALL SELECT c_custkey AS k FROM customer""")
    m("k").origins shouldBe Seq(
      Origin("customer", "c_custkey"), Origin("orders", "o_custkey"))
  }

  test("literal-only fields have no origins; generators mark derived") {
    val m = of("SELECT 1 AS one, l_orderkey FROM lineitem")
    m("one") shouldBe FieldOrigin("one", Nil, derived = true)
    val g = of("SELECT tok FROM (SELECT explode(split(c_name, ' ')) AS tok FROM customer)")
    g("tok").origins shouldBe Seq(Origin("customer", "c_name"))
    g("tok").derived shouldBe true
  }

  test("a query-text alias does not mask a path relation's real identity") {
    // ADVICE r7: `FROM parquet.`/path` p` used to report table "p"; the
    // reference reports the dataset's namespace key (here: the root path)
    val p = Tables(spark, graft.TestSpark.sf).path("nation")
    val m = of(s"SELECT p.n_name FROM parquet.`$p` p")
    val o = m("n_name").origins.head
    o.table should not be "p"
    (o.table should include("nation"))
    o.column shouldBe "n_name"
  }

  test("column_origins TVF surfaces lineage from a FROM clause") {
    val rows = spark.sql(
      """SELECT * FROM column_origins(
           'SELECT l_orderkey, l_quantity * 2 AS q2 FROM lineitem')
         ORDER BY field""").collect()
    rows.map(r => (r.getString(0), r.getString(1), r.getString(2), r.getBoolean(3)))
      .toSeq shouldBe Seq(
        ("l_orderkey", "lineitem", "l_orderkey", false),
        ("q2", "lineitem", "l_quantity", true))
  }
}
