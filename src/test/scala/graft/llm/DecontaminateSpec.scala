package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class DecontaminateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val evalSet = Seq(
    (100L, "the quick brown fox jumps over the lazy dog")
  ).toDF("doc_id", "text")

  private lazy val train = Seq(
    // verbatim leak: shares every eval 3-gram
    (1L, "the quick brown fox jumps over the lazy dog"),
    // partial leak: shares exactly the grams of "quick brown fox jumps"
    (2L, "she saw the quick brown fox jumps nearby"),
    // clean: no shared 3-gram
    (3L, "completely unrelated text about spark plans and shuffles")
  ).toDF("doc_id", "text")

  test("overlapCounts counts distinct shared n-grams per training doc") {
    val got = Decontaminate.overlapCounts(train, evalSet, n = 3)
      .as[(Long, Long)].collect().toMap
    assert(got(1L) == 7L) // 9 tokens -> 7 grams, all shared
    // "the quick brown", "quick brown fox", "brown fox jumps"
    assert(got(2L) == 3L)
    assert(!got.contains(3L))
  }

  test("clean drops only docs at or above the overlap threshold") {
    val kept1 = Decontaminate.clean(train, evalSet, n = 3, minShared = 1)
      .select("doc_id").as[Long].collect().toSet
    assert(kept1 == Set(3L))
    val kept4 = Decontaminate.clean(train, evalSet, n = 3, minShared = 4)
      .select("doc_id").as[Long].collect().toSet
    assert(kept4 == Set(2L, 3L)) // 3 shared grams < 4
  }

  test("short docs fall back to whole-text grams") {
    val ev = Seq((1L, "tiny doc")).toDF("doc_id", "text")
    val tr = Seq((2L, "tiny doc"), (3L, "tiny other")).toDF("doc_id", "text")
    val kept = Decontaminate.clean(tr, ev, n = 3, minShared = 1)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L))
  }

  test("hashed-gram variant matches the string-gram path on the fixture") {
    val docs = graft.engine.Tables.ensure(spark, TestSpark.sf).documents
    val ev = docs.filter(col("doc_id") % 97 === 0)
    val tr = docs.filter(col("doc_id") % 97 =!= 0)
    val viaStrings = Decontaminate.clean(tr, ev, n = 3, minShared = 5)
      .select("doc_id").as[Long].collect().toSet
    val viaHashes = Decontaminate.cleanHashed(tr, ev, n = 3, minShared = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(viaHashes == viaStrings)
    // crafted leaks agree too
    val keptH = Decontaminate.cleanHashed(train, evalSet, n = 3, minShared = 4)
      .select("doc_id").as[Long].collect().toSet
    assert(keptH == Set(2L, 3L))
    // and the probe side stays broadcast
    val plan = Decontaminate.cleanHashed(train, evalSet, n = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"))
  }

  test("eval gram set is broadcast (corpus never shuffles by gram)") {
    val plan = Decontaminate.overlapCounts(train, evalSet, n = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"))
  }
}
