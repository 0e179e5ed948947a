package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Pinned-literal coverage for the §2.8 long tail — reference functions
  * whose Spark builtins have no DuckDB oracle equivalent (semantics differ
  * or the function is absent there), so each is pinned against a known
  * value instead (reference: `exec/expr/fn/impl/StringFunctions.java:39`,
  * `DateTypeFunctions.java:41`, `DremioSqlOperatorTable.java:67`). */
class FunctionCoverageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def one(sql: String): Any = spark.sql(s"SELECT $sql").head().get(0)

  test("URL / formatting / list functions") {
    assert(one("parse_url('https://example.com/a/b?x=1', 'HOST')") == "example.com")
    assert(one("parse_url('https://example.com/a/b?x=1', 'QUERY', 'x')") == "1")
    assert(one("format_number(1234567.891, 2)") == "1,234,567.89")
    assert(one("find_in_set('b', 'a,b,c')") == 2)
    assert(one("elt(2, 'a', 'b', 'c')") == "b")
    assert(one("initcap('hello world')") == "Hello World")
    assert(one("translate('abcd', 'ab', 'xy')") == "xycd")
    assert(one("soundex('Robert')") == "R163")
    assert(one("crc32('abc')") == 891568578L)
    assert(one("split_part('a:b:c', ':', 2)") == "b")
  }

  test("datetime long tail: next_day, convert_timezone") {
    assert(one("CAST(next_day(DATE'2024-01-01', 'FR') AS STRING)") == "2024-01-05")
    assert(one("CAST(convert_timezone('UTC', 'America/Los_Angeles', " +
      "TIMESTAMP_NTZ'2024-01-01 12:00:00') AS STRING)") == "2024-01-01 04:00:00")
  }

  test("type introspection: typeof") {
    assert(one("typeof(1L)") == "bigint")
    assert(one("typeof(array('a'))") == "array<string>")
  }

  test("array_frequency returns value -> count (reference ArrayFrequency)") {
    Functions.registerAll(spark)
    val m = spark.sql("SELECT array_frequency(array('a','b','a','c','a'))")
      .head().getMap[String, Int](0)
    assert(m("a") == 3 && m("b") == 1 && m("c") == 1)
  }
}
