package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** BM25 semantics pinned on a hand-computable corpus: tf monotonicity,
  * rare-term idf dominance, the Lucene idf constant, top-k bounding and
  * deterministic tiebreak. */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = Seq(
    (1L, "apple banana"),
    (2L, "apple apple banana"),
    (3L, "cherry cherry cherry"),
    (4L, "banana fig grape kiwi")).toDF("doc_id", "text")

  test("BM25: higher tf ranks higher; hand-computed score matches") {
    val got = Retrieval.bm25TopK(corpus, Seq(0 -> "apple"), k = 10)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq == Seq(2L, 1L), s"tf=2 doc first: ${got.toSeq}")
    // N=4, df(apple)=2 -> idf = ln(1 + 2.5/2.5) = ln 2; d2: tf=2, dl=3,
    // avgdl = (2+3+3+4)/4 = 3 -> ln2 * (2*2.2)/(2 + 1.2*(0.25+0.75)) =
    // ln2 * 4.4/3.2
    val expect = BigDecimal(math.log(2) * 4.4 / 3.2)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(got.head._2 - expect) < 1e-9, s"got ${got.head._2}, want $expect")
  }

  test("BM25: a rare term outweighs a common one at equal tf") {
    // "fig" appears in 1 doc, "banana" in 3 -> for a two-term query the
    // fig-bearing doc must outrank a banana-only doc of the same length
    val got = Retrieval.bm25TopK(corpus, Seq(0 -> "banana fig"), k = 10)
      .collect().map(_.getLong(1)).toSeq
    assert(got.head == 4L, s"doc with the rare term must rank first: $got")
  }

  test("BM25: k bounds each query's rows; ties break on doc_id ascending") {
    val tied = Seq((10L, "same text"), (11L, "same text"), (12L, "same text"))
      .toDF("doc_id", "text")
    val got = Retrieval.bm25TopK(tied, Seq(7 -> "same"), k = 2)
      .collect().map(_.getLong(1)).toSeq
    assert(got == Seq(10L, 11L), s"identical scores keep lowest doc_ids: $got")
  }

  /** Planted MMR fixture: the query sits at e0; candidate 10 is closest,
    * candidate 11 is a near-copy of 10 (redundant), candidate 12 points
    * along a different axis (diverse but less relevant). Pure relevance
    * ranks 10, 11, 12 — MMR must defer the near-copy: 10, 12, 11. */
  private def mmrFixture = {
    def v(x: Double, y: Double, z: Double) = Array(x.toFloat, y.toFloat, z.toFloat)
    Seq(
      (0L, v(1, 0, 0)),          // the query vector
      (10L, v(0.98, 0.20, 0)),   // most relevant
      (11L, v(0.97, 0.22, 0.01)),// near-copy of 10
      (12L, v(0.70, 0, 0.71))    // diverse, less relevant
    ).toDF("vec_id", "embedding")
  }

  test("MMR: the near-duplicate of a chosen doc is deferred behind a diverse doc") {
    val got = Retrieval.mmrDiversify(mmrFixture, Seq(0), k = 3, poolK = 10,
        lambda = 0.5)
      .orderBy("rk").collect().map(_.getLong(1)).toSeq
    assert(got == Seq(10L, 12L, 11L), s"MMR must break up the near-dups: $got")
    // and pure relevance (lambda=1) keeps the similarity order
    val rel = Retrieval.mmrDiversify(mmrFixture, Seq(0), k = 3, poolK = 10,
        lambda = 1.0)
      .orderBy("rk").collect().map(_.getLong(1)).toSeq
    assert(rel == Seq(10L, 11L, 12L), s"lambda=1 is pure relevance: $rel")
  }

  test("MMR: first pick is the relevance argmax; k and pool bound the output") {
    val got = Retrieval.mmrDiversify(mmrFixture, Seq(0), k = 2, poolK = 2,
        lambda = 0.7).orderBy("rk").collect()
    assert(got.length == 2)
    assert(got.head.getLong(1) == 10L, "first pick = top relevance")
    assert(got.map(_.getInt(2)).toSeq == Seq(1, 2), "ranks are 1..k")
  }

  test("MMR: deterministic across runs") {
    def run() = Retrieval.mmrDiversify(mmrFixture, Seq(0), k = 3, poolK = 10,
      lambda = 0.5).orderBy("rk").collect().map(r => (r.getLong(1), r.getInt(2))).toSeq
    assert(run() == run())
  }
}
