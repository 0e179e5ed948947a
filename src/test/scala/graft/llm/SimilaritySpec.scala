package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("brute-force top-k returns neighbors in correct cosine order") {
    val corpus = Seq(
      (10L, Array(1.0f, 0.0f), 0),
      (11L, Array(0.9f, 0.1f), 0),
      (12L, Array(0.0f, 1.0f), 0),
      (13L, Array(-1.0f, 0.0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val queries = Seq((1L, Array(1.0f, 0.0f), 0)).toDF("vec_id", "embedding", "label")
    val got = Similarity.bruteForceTopK(corpus, queries, k = 3)
      .orderBy(col("rk")).select("c_id").as[Long].collect().toSeq
    assert(got == Seq(10L, 11L, 12L))
  }

  test("IVF restricts the search to the query's bucket") {
    val corpus = Seq(
      (10L, Array(1.0f, 0.0f), 0),
      (11L, Array(0.99f, 0.01f), 1), // best overall but wrong bucket
      (12L, Array(0.5f, 0.5f), 0)
    ).toDF("vec_id", "embedding", "label")
    val queries = Seq((1L, Array(1.0f, 0.0f), 0)).toDF("vec_id", "embedding", "label")
    val got = Similarity.ivfTopK(corpus, queries, k = 5)
      .select("c_id").as[Long].collect().toSet
    assert(got == Set(10L, 12L))
  }

  test("fixture ANN query returns k rows per query vector") {
    val e = graft.engine.Tables(spark, TestSpark.sf).embeddings
    val out = Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 3), k = 5)
    val counts = out.groupBy("q_id").count().select("count").as[Long].collect()
    assert(counts.length == 3 && counts.forall(_ == 5))
  }
}
