package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base = "large scale data processing engines shuffle partition join " +
    "aggregate window sort filter project scan the columns of a table quickly"

  private lazy val corpus = Seq(
    (0L, base),
    (1L, base), // exact duplicate of 0
    (2L, base.replace("quickly", "slowly")), // near duplicate of 0
    (3L, "gardening guide tulips roses daffodils watering schedule for a sunny spring garden bed"),
    (4L, "astrophysics overview stellar fusion galactic dynamics dark matter rotation curve lecture notes")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts") {
    val dups = Dedup.exact(corpus).filter(col("n_copies") > 1).collect()
    assert(dups.length == 1)
    assert(dups.head.getAs[Long]("keep_id") == 0L)
    assert(dups.head.getAs[Long]("n_copies") == 2L)
  }

  test("minhash LSH finds exact and near duplicates, not unrelated pairs") {
    val pairs = Dedup.minhashLsh(corpus, jaccardThreshold = 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 2L)) || pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => Set(a, b).contains(3L) && Set(a, b).contains(4L) })
  }

  test("simhash pairs flags near-duplicates within hamming budget") {
    val pairs = Dedup.simhashPairs(corpus, maxHamming = 6)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists { case (a, b) => Set(a, b) == Set(3L, 4L) })
  }

  test("embedding dups finds planted near-identical vectors") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.1f), 1),
      (1L, Array(0.99f, 0.01f, 0.0f, 0.1f), 1), // near-dup of 0
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f), 1),
      (3L, Array(0.0f, 0.0f, 1.0f, 0.0f), 2)
    ).toDF("vec_id", "embedding", "label")
    val pairs = Dedup.embeddingDups(vecs, threshold = 0.95)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }
}
