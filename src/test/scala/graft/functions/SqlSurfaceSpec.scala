package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SqlSurfaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("SQL UDF aliases expand at plan time") {
    Functions.registerAll(spark)
    val r = spark.sql("""
      SELECT charsubstring('hello world', 7, 5) AS a,
             strpos('hello', 'll') AS b,
             col_like('foobar', 'foo%') AS c,
             mask_hash('secret') AS d,
             mask_show_last_n('1234567890', 4) AS e""").head()
    assert(r.getString(0) == "world")
    assert(r.getInt(1) == 3)
    assert(r.getBoolean(2))
    assert(r.getString(3).length == 64)
    assert(r.getString(4).endsWith("7890"))
    assert(!r.getString(4).startsWith("123"))
  }

  test("geo SQL UDFs agree with the Column API implementation") {
    Functions.registerAll(spark)
    val viaSql = spark.sql(
      "SELECT geo_distance(48.8566, 2.3522, 51.5074, -0.1278) AS d").head().getDouble(0)
    assert(viaSql > 330000 && viaSql < 360000)
    assert(spark.sql(
      "SELECT geo_nearby(48.8566, 2.3522, 48.8570, 2.3530, 1000.0)").head().getBoolean(0))
  }

  test("joda pattern translation") {
    assert(JodaFormat.translate("YYYY-MM-dd") == "yyyy-MM-dd")
    assert(JodaFormat.translate("YYYY-MM-dd HH:mm:ss.SSS") == "yyyy-MM-dd HH:mm:ss.SSS")
    assert(JodaFormat.translate("'Year:' YYYY") == "'Year:' yyyy")
    assert(JodaFormat.translate("e YYYY") == "u yyyy")
  }

  test("to_date with joda pattern parses reference-style literals") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val d = Seq("2024/03/05").toDF("s")
      .select(JodaFormat.toDateJoda(col("s"), "YYYY/MM/dd")).head().getDate(0)
    assert(d.toString == "2024-03-05")
  }

  test("information_schema and sys views are queryable") {
    graft.engine.Tables.ensure(spark, TestSpark.sf)
    graft.catalog.InfoSchema.register(spark)
    val tables = spark.sql(
      "SELECT table_name FROM information_schema_tables ORDER BY table_name")
      .collect().map(_.getString(0)).toSet
    assert(tables.contains("lineitem") && tables.contains("documents"))
    val cols = spark.sql("""
      SELECT column_name FROM information_schema_columns
      WHERE table_name = 'lineitem'""").collect().map(_.getString(0)).toSet
    assert(cols.contains("l_orderkey"))
    assert(spark.sql("SELECT * FROM sys_options WHERE name LIKE 'spark.sql%'").count() > 0)
    assert(spark.sql("SELECT * FROM sys_nodes").count() >= 0)
  }
}
