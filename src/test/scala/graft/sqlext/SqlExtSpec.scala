package graft.sqlext

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.accel.Reflections

class SqlExtSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("CREATE/SHOW/DROP REFLECTION through SQL") {
    Reflections.clear()
    graft.engine.Tables.ensure(spark, TestSpark.sf)
    val dir = Files.createTempDirectory("graft_sqlrefl").toString
    spark.sql(s"CREATE REFLECTION rx USING PATH '$dir/rx' AS " +
      "SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY l_returnflag")
    val shown = spark.sql("SHOW REFLECTIONS").collect()
    assert(shown.map(_.getString(0)).contains("rx"))
    spark.sql("DROP REFLECTION rx")
    assert(spark.sql("SHOW REFLECTIONS").collect().isEmpty)
  }

  test("CREATE PIPE / TRIGGER PIPE / SHOW PIPES through SQL") {
    val root = Files.createTempDirectory("graft_sqlpipe").toString
    Files.createDirectories(Paths.get(s"$root/in"))
    Files.write(Paths.get(s"$root/in/a.json"),
      """{"id":1,"v":"x"}""".getBytes)
    spark.sql(s"CREATE PIPE psql FROM '$root/in' FORMAT json " +
      s"SCHEMA 'id BIGINT, v STRING' INTO '$root/out' CHECKPOINT '$root/chk'")
    assert(spark.sql("SHOW PIPES").collect().map(_.getString(0)).contains("psql"))
    val res = spark.sql("TRIGGER PIPE psql").collect()
    assert(res.head.getString(1) == "1")
    // second trigger: no new files → zero rows loaded by THIS trigger
    // (per-batch metric from stream progress, not an O(target) recount)
    assert(spark.sql("TRIGGER PIPE psql").collect().head.getString(1) == "0")
  }

  test("ALTER TABLE ... REFRESH METADATA parses and runs") {
    graft.engine.Tables.ensure(spark, TestSpark.sf)
    spark.sql("ALTER TABLE lineitem REFRESH METADATA")
  }

  test("unknown statements fall through to Spark's parser") {
    assert(spark.sql("SELECT 1 + 1").head().getInt(0) == 2)
    intercept[Exception] { spark.sql("CREATE GIBBERISH q") }
  }
}
