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

  test("semantic decontamination flags paraphrase-level matches n-grams miss") {
    // 8-dim embeddings; eval doc 100 has a planted NEAR-COPY in the corpus
    // (vec 1, tiny perturbation → cosine ≈ 1) and the rest are axis-ish
    // vectors far from everything. Centroids = two separated anchors.
    def v(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    val corpus = Seq(
      (1L, v(1, 0.01, 0, 0)),   // paraphrase of eval 100
      (2L, v(0, 0, 0.5, 0.5)),  // cos ≈ 0.707 to eval 101: under 0.95, over 0.4
      (3L, v(-1, 0.5, 0.5, 0))) // unrelated
      .toDF("vec_id", "embedding")
    val evalSet = Seq(
      (100L, v(1, 0, 0, 0)),
      (101L, v(0, 0, 0, 1)))
      .toDF("vec_id", "embedding")
    val cents = Seq(v(1, 0, 0, 0), v(0, 0, 0, 1))
    val flagged = Decontaminate
      .semanticMatches(corpus, evalSet, cents, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(flagged == Set((1L, 100L)), flagged.toString)
    // clean keeps everything except the flagged doc
    val kept = Decontaminate
      .semanticClean(corpus, evalSet, cents, threshold = 0.95)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L), kept.toString)
    // eval-side multi-probe rescues a boundary-straddling pair: corpus
    // vec 2 assigns to bucket 1 (axis w), eval 101 also bucket 1 — at a
    // looser threshold it flags through the probed bucket
    val loose = Decontaminate
      .semanticMatches(corpus, evalSet, cents, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loose.contains((2L, 101L)), loose.toString)
  }
}
