package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class PackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("packGreedy assigns bins by running token total per stratum") {
    val docs = Seq(
      // stratum "a", budget 100: cum-before = 0, 60, 110, 160
      (1L, "a", 60), (2L, "a", 50), (3L, "a", 50), (4L, "a", 10),
      // stratum "b" restarts at bin 0
      (10L, "b", 250), (11L, "b", 10)
    ).toDF("doc_id", "lang", "n_tokens")
    val got = Packing.packGreedy(docs, "n_tokens", "doc_id", 100, Seq("lang"))
      .select("doc_id", "bin", "bin_offset")
      .as[(Long, Long, Long)].collect().map { case (k, b, o) => k -> ((b, o)) }.toMap
    assert(got(1L) == ((0L, 0L)))
    assert(got(2L) == ((0L, 60L)))  // straddles the 100 boundary, starts in bin 0
    assert(got(3L) == ((1L, 10L)))
    assert(got(4L) == ((1L, 60L)))
    assert(got(10L) == ((0L, 0L)))  // oversized doc still gets a slot
    assert(got(11L) == ((2L, 50L))) // 250 div 100 = bin 2, offset 50
  }

  test("packing is deterministic across runs") {
    val docs = graft.engine.Tables.ensure(spark, TestSpark.sf).documents
      .selectExpr("doc_id", "lang", "n_chars div 5 as n_tokens")
    val a = Packing.packGreedy(docs, "n_tokens", "doc_id", 2048, Seq("lang"))
      .select("doc_id", "bin", "bin_offset").collect().toSeq
    val b = Packing.packGreedy(docs, "n_tokens", "doc_id", 2048, Seq("lang"))
      .select("doc_id", "bin", "bin_offset").collect().toSeq
    assert(a.sortBy(_.getLong(0)) == b.sortBy(_.getLong(0)))
  }
}
