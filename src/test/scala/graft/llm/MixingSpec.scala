package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class MixingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("splitByHash carves md5 buckets into stable fractions") {
    val docs = graft.engine.Tables.ensure(spark, TestSpark.sf).documents
    val split = Mixing.splitByHash(docs, "doc_id",
      Seq("train" -> 0.90, "val" -> 0.05, "test" -> 0.05))
    val counts = split.groupBy("split").count().as[(String, Long)].collect().toMap
    val n = counts.values.sum.toDouble
    assert(counts.keySet == Set("train", "val", "test"))
    // md5 is uniform; at 500 docs the 90% split lands within a few points
    assert(counts("train") / n > 0.84 && counts("train") / n < 0.96)
    // assignment is per-row deterministic: rerun must be identical
    val again = Mixing.splitByHash(docs, "doc_id",
      Seq("train" -> 0.90, "val" -> 0.05, "test" -> 0.05))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(again == counts)
  }

  test("splitByHash rejects fractions that do not sum to 1") {
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Mixing.splitByHash(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.1))
    }
  }

  test("deterministicOrder is stable and id-complete") {
    val docs = graft.engine.Tables.ensure(spark, TestSpark.sf).documents
    val a = Mixing.deterministicOrder(docs, "doc_id", "s1")
      .select("doc_id").as[Long].collect().toSeq
    val b = Mixing.deterministicOrder(docs, "doc_id", "s1")
      .select("doc_id").as[Long].collect().toSeq
    assert(a == b)
    assert(a.sorted != a) // hash order actually shuffles
    assert(a.toSet == docs.select("doc_id").as[Long].collect().toSet)
    // different salt -> different order
    val c = Mixing.deterministicOrder(docs, "doc_id", "s2")
      .select("doc_id").as[Long].collect().toSeq
    assert(c != a)
  }
}
