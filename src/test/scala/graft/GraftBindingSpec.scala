package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

/** Positional-parameter binding on the graft-grammar path
  * ([[Graft.sql(spark, query, args)]] → SQL-literal text substitution):
  * backslash-bearing values must round-trip (Spark's default literal
  * dialect treats backslash as an escape), values ending in a backslash
  * must not escape their own closing quote, and the `?`-marker scanner
  * must not lose state on escaped quotes inside statement literals. */
class GraftBindingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_bind").toString + "/t"

  test("backslash values round-trip through graft-grammar binding") {
    val dir = tmp()
    Graft.sql(spark, s"CREATE LAKE '$dir' AS SELECT 'seed' AS s")
    Graft.sql(spark, s"INSERT INTO LAKE '$dir' SELECT ? AS s",
      Array[Any]("C:\\tmp\\file"))
    Graft.sql(spark, s"INSERT INTO LAKE '$dir' SELECT ? AS s",
      Array[Any]("trailing\\"))
    val got = graft.sources.SnapshotTable.forPath(spark, dir).read()
      .select("s").collect().map(_.getString(0)).toSet
    assert(got == Set("seed", "C:\\tmp\\file", "trailing\\"), got.toString)
  }

  test("escaped quotes inside statement literals do not derail the marker scan") {
    val dir = tmp()
    Graft.sql(spark, s"CREATE LAKE '$dir' AS SELECT 'seed' AS s, 'x' AS t")
    // the \' inside the first literal must NOT flip the in-string state —
    // an off-by-one scanner would treat the later ? as quoted (arity
    // error) or substitute into the wrong place
    Graft.sql(spark,
      s"INSERT INTO LAKE '$dir' SELECT 'it\\'s' AS s, ? AS t",
      Array[Any]("bound"))
    val rows = graft.sources.SnapshotTable.forPath(spark, dir).read()
      .filter(col("t") === "bound").collect()
    assert(rows.length == 1 && rows.head.getAs[String]("s") == "it's",
      rows.mkString(","))
  }

  test("arity mismatches refuse loudly either way") {
    val dir = tmp()
    Graft.sql(spark, s"CREATE LAKE '$dir' AS SELECT 1 AS v")
    val more = intercept[Exception](Graft.sql(spark,
      s"INSERT INTO LAKE '$dir' SELECT ? AS v", Array[Any]()))
    assert(more.getMessage.contains("more `?` markers"), more.getMessage)
    val fewer = intercept[Exception](Graft.sql(spark,
      s"INSERT INTO LAKE '$dir' SELECT 1 AS v", Array[Any](5)))
    assert(fewer.getMessage.contains("markers"), fewer.getMessage)
  }
}
