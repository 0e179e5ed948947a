package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Topic clustering: planted two-topic corpus (orthogonal embedding axes,
  * disjoint vocabularies) must come back as two clusters with the right
  * sizes and each topic's vocabulary in its top terms. */
class ClusteringSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vec(axis: Int, jitterSeed: Int): Array[Float] =
    Array.tabulate(8) { i =>
      val base = if (i == axis) 1.0f else 0.0f
      val m = (jitterSeed * 8 + i) * 2654435761L
      base + (((m & 0xFFFF) / 65536.0f) - 0.5f) * 0.05f
    }

  test("two planted topics: sizes and distinctive vocabulary recovered") {
    val rows = (0 until 60).map { i =>
      if (i < 40) // topic A: axis 0, cooking words
        (i.toLong, s"recipe flour butter sugar oven dish_$i", vec(0, i))
      else        // topic B: axis 3, astronomy words
        (i.toLong, s"telescope galaxy nebula orbit star_$i", vec(3, i))
    }
    val docs = rows.toDF("doc_id", "text", "embedding")
    val out = Clustering.documentClusters(docs, k = 2, topTerms = 4).collect()
    assert(out.length == 2)
    val bySize = out.sortBy(-_.getAs[Long]("n_docs"))
    assert(bySize(0).getAs[Long]("n_docs") == 40L)
    assert(bySize(1).getAs[Long]("n_docs") == 20L)
    val bigTerms = bySize(0).getAs[scala.collection.Seq[String]]("top_terms").toSet
    val smallTerms = bySize(1).getAs[scala.collection.Seq[String]]("top_terms").toSet
    // shared-vocabulary words score near ln(1)=0 via idf; topic words rank
    assert(bigTerms.intersect(Set("recipe", "flour", "butter", "sugar", "oven")).nonEmpty,
      s"cooking cluster terms: $bigTerms")
    assert(smallTerms.intersect(Set("telescope", "galaxy", "nebula", "orbit")).nonEmpty,
      s"astronomy cluster terms: $smallTerms")
    assert(bigTerms.intersect(smallTerms).isEmpty,
      "distinctive terms must not overlap across disjoint-vocabulary topics")
  }

  test("self-scaling k and determinism") {
    val rows = (0 until 50).map(i => (i.toLong, s"w_$i common words here", vec(i % 4, i)))
    val docs = rows.toDF("doc_id", "text", "embedding")
    val a = Clustering.documentClusters(docs, topTerms = 3)
      .orderBy("cluster").collect().toSeq
    val b = Clustering.documentClusters(docs, topTerms = 3)
      .orderBy("cluster").collect().toSeq
    assert(a == b, "same input must cluster identically")
    assert(a.map(_.getAs[Long]("n_docs")).sum == 50L)
  }
}
