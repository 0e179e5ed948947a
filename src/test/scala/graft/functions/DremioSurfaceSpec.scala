package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Value pins for the reference operator-table surface
  * (`DremioSqlOperatorTable.java:67`) registered by DremioSurface +
  * SqlUdfs — every name callable from SQL text, semantics matched to the
  * reference impls cited in the scaladocs. */
class DremioSurfaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def one(sql: String): Any =
    spark.sql(s"SELECT $sql AS v").collect().head.get(0)
  private def arr(sql: String): Seq[Any] =
    one(sql).asInstanceOf[scala.collection.Seq[Any]].toSeq

  test("array composition family") {
    assert(arr("array_cat(array(1,2), array(3))") == Seq(1, 2, 3))
    assert(arr("array_concat(array(1), array(2), array(3))") == Seq(1, 2, 3))
    assert(arr("array_intersection(array(1,2,3), array(2,3,4))") == Seq(2, 3))
    assert(one("array_length(array(1,2,3))") == 3)
    assert(one("array_to_string(array(1,2,3), '-')") == "1-2-3")
    assert(one("list_to_delimited_string(array('a','b'), ',')") == "a,b")
    assert(arr("set_union(array(1,2), array(2,3))") == Seq(1, 2, 3))
    assert(arr("sublist(array('a','b','c','d'), 2, 2)") == Seq("b", "c"))
    assert(arr("empty_array()").isEmpty)
    assert(one("map_construct('a', 1, 'b', 2)")
      .asInstanceOf[scala.collection.Map[String, Int]] == Map("a" -> 1, "b" -> 2))
    val kv = arr("kvgen(map('k1', 10))")
    assert(kv.size == 1 &&
      kv.head.asInstanceOf[org.apache.spark.sql.Row].toSeq == Seq("k1", 10))
    assert(arr("mappify(map('k1', 10))") == kv)
  }

  test("array_sum / array_avg: nulls ignored in sum, avg = sum/length") {
    assert(one("array_sum(array(1, 2, NULL))") == 3.0)
    assert(one("array_sum(CAST(array(NULL, NULL) AS ARRAY<INT>))") == null)
    assert(one("array_avg(array(1, 2, 3, NULL))") == 1.5) // 6 / 4, length counts nulls
  }

  test("array_slice: 0-based from-inclusive to-exclusive, negatives from end, invalid → empty") {
    assert(arr("array_slice(array(10,11,12,13,14), 1, 3)") == Seq(11, 12))
    assert(arr("array_slice(array(10,11,12,13,14), -2)") == Seq(13, 14))
    assert(arr("array_slice(array(10,11,12), 0, 99)").isEmpty) // to > size → empty, not clamp
    assert(arr("array_slice(array(10,11,12), 2, 1)").isEmpty)
    assert(arr("array_slice(array(10,11,12), -9, 2)").isEmpty) // resolved from < 0
  }

  test("array_remove_at: resolved index dropped, out-of-range unchanged") {
    assert(arr("array_remove_at(array(1,2,3), 1)") == Seq(1, 3))
    assert(arr("array_remove_at(array(1,2,3), -1)") == Seq(1, 2))
    assert(arr("array_remove_at(array(1,2,3), 7)") == Seq(1, 2, 3))
    assert(arr("array_remove_at(array(1,2,3), -9)") == Seq(1, 2, 3))
  }

  test("array_generate_range: stop-exclusive, signed step, empty on degenerate") {
    assert(arr("array_generate_range(1, 5)") == Seq(1, 2, 3, 4))
    assert(arr("array_generate_range(5, 1, -1)") == Seq(5, 4, 3, 2))
    assert(arr("array_generate_range(0, 10, 3)") == Seq(0, 3, 6, 9))
    assert(arr("array_generate_range(1, 1)").isEmpty)
    assert(arr("array_generate_range(5, 1, 1)").isEmpty)
    assert(arr("array_generate_range(1, 5, 0)").isEmpty)
  }

  test("scalar odds and ends") {
    assert(one("bitwise_and(12, 10)") == 8)
    assert(one("hashsha256('abc')") ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    assert(one("truncate(3.7)") == 3.0)
    assert(one("truncate(-3.7)") == -3.0)
    assert(one("truncate(3.456, 2)") == 3.45)
    assert(one("truncate(1234.5, -2)") == 1200.0)
    assert(one("regexp_col_like('abc', '^a')") == true)
    assert(one("regexp_matches('abc', 'z')") == false)
  }

  test("regexp_split: FIRST/LAST/INDEX/ALL per the reference splitter") {
    assert(arr("regexp_split('a1b2c', '[0-9]', 'ALL', 10)") == Seq("a", "b", "c"))
    // ALL caps segment count and DROPS the remainder
    assert(arr("regexp_split('a1b2c', '[0-9]', 'ALL', 2)") == Seq("a", "b"))
    assert(arr("regexp_split('a1b2c', '[0-9]', 'FIRST', 0)") == Seq("a", "b2c"))
    assert(arr("regexp_split('a1b2c', '[0-9]', 'LAST', 0)") == Seq("a1b", "c"))
    assert(arr("regexp_split('a1b2c', '[0-9]', 'INDEX', 1)") == Seq("a1b", "c"))
    assert(arr("regexp_split('a1b2c', '[0-9]', 'INDEX', 5)") == Seq("a1b2c"))
    assert(arr("regexp_split('abc', 'z', 'ALL', 10)") == Seq("abc"))
    // empty segments are kept (range() allows start == end)
    assert(arr("regexp_split('xa', 'x', 'FIRST', 0)") == Seq("", "a"))
    assert(arr("regexp_split('a1', '[0-9]', 'ALL', 10)") == Seq("a", ""))
  }

  test("masking family") {
    assert(one("mask_first_n('Abcd', 2)") == "Xxcd")
    assert(one("mask_last_n('abcd', 2)") == "abxx")
    assert(one("mask_show_first_n('abcd', 2)") == "abxx")
    assert(one("mask_show_last_n('abcd', 2)") == "xxcd")
    assert(one("mask_last_n('ab', 5)") == "xx") // n > length
  }

  test("geo beyond/nearby agree with the haversine distance") {
    val d = one("geo_distance(0D, 0D, 0D, 1D)").asInstanceOf[Double]
    assert(math.abs(d - 111195) < 200) // one degree of longitude at equator
    assert(one("geo_beyond(0D, 0D, 0D, 1D, 100000D)") == true)
    assert(one("geo_beyond(0D, 0D, 0D, 1D, 200000D)") == false)
  }

  test("context functions: UTC family runs, is_member/last_query_id resolve at plan time") {
    assert(one("current_timestamp_utc()") != null)
    assert(one("current_date_utc()") != null)
    assert(one("current_time_utc()").toString.matches("\\d{2}:\\d{2}:\\d{2}"))
    assert(one("statement_timestamp()") != null)
    assert(one("transaction_timestamp()") != null)
    assert(one("timeofday()").toString.nonEmpty)
    assert(one("system_user()") == one("current_user()"))
    // unauthenticated session = root: admin member, arbitrary role not
    assert(one("is_member('admin')") == true)
    assert(one("is_member('marketing')") == false)
    val lq = one("last_query_id()")
    assert(lq == null || lq.isInstanceOf[Long])
  }
}
