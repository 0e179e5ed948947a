package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("quality signals compute pinned values on a crafted doc") {
    val df = Seq((1L, "The cat sat, and the dog ran!")).toDF("doc_id", "text")
    val r = TextAnalysis.qualitySignals(df).head()
    assert(r.getAs[Int]("len_chars") == 29)
    assert(r.getAs[Int]("n_tokens") == 7)
    // "," and "!" -> 2 punct chars of 29
    assert(math.abs(r.getAs[Double]("punct_ratio") - 2.0 / 29) < 1e-12)
    // the, and, the -> 3 stopwords of 7 tokens ("cat," keeps the comma so
    // tokens are: the cat sat, and the dog ran!
    assert(math.abs(r.getAs[Double]("stopword_ratio") - 3.0 / 7) < 1e-12)
  }

  test("token counts: whitespace vs bpe-ish segmentation") {
    val df = Seq((1L, "hello world 42!")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenCounts(df).head()
    assert(r.getAs[Int]("ws_tokens") == 3)
    // hello | world | 42 | !
    assert(r.getAs[Int]("bpeish_tokens") == 4)
    assert(r.getAs[Int]("ws_chars") == 2)
  }

  test("fingerprint collapses token order and duplicates") {
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "gamma alpha beta alpha"),
      (3L, "delta epsilon zeta")
    ).toDF("doc_id", "text")
    val fps = TextAnalysis.fingerprint(df).select("fp").as[String].collect()
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("language id picks the profile with most stopword hits") {
    val df = Seq(
      (1L, "the cat is on the mat and it is warm", "en"),
      (2L, "el perro y la casa de los amigos en un dia", "es")
    ).toDF("doc_id", "text", "lang")
    val got = TextAnalysis.languageId(df)
      .select("doc_id", "predicted_lang").as[(Long, String)].collect().toMap
    assert(got(1L) == "en")
    assert(got(2L) == "es")
  }
}
