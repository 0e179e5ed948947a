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
}
