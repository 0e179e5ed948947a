package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftFacadeSpec extends AnyFunSuite {

  test("facade: session -> attach -> sql incl. custom DDL") {
    val spark = TestSpark.spark // same config path as Graft.session()
    Graft.attach(spark, TestSpark.sf)
    assert(Graft.sql(spark,
      "SELECT count(*) FROM lineitem").head().getLong(0) > 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_facade").toString
    Graft.sql(spark, s"CREATE REFLECTION facade_r USING PATH '$dir/r' AS " +
      "SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY l_returnflag")
    assert(Graft.sql(spark, "SHOW REFLECTIONS").collect()
      .map(_.getString(0)).contains("facade_r"))
    Graft.sql(spark, "DROP REFLECTION facade_r")
    assert(Graft.sql(spark,
      "SELECT table_name FROM information_schema_tables").count() > 0)
  }
}
