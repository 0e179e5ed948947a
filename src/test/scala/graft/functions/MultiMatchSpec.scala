package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Aho–Corasick multi-phrase matcher: classic-construction edge cases
  * (overlapping matches, nested phrases, failure-link transitions that
  * a naive trie walk misses), codegen + SQL surfaces, and the literal
  * contract. */
class MultiMatchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hitsOf(text: String, phrases: Seq[String]): Seq[String] =
    Seq(text).toDF("t")
      .select(Functions.phrase_hits(col("t"), phrases).as("h"))
      .head().getSeq[String](0)

  test("overlapping, nested and failure-link matches") {
    // "she" and "he" overlap; "hers" shares the 'he' prefix chain — the
    // textbook AC fixture (Aho & Corasick 1975 §3)
    assert(hitsOf("ushers", Seq("he", "she", "his", "hers")) ==
      Seq("he", "she", "hers"))
    // failure-link transition: after mismatching 'abcd' the automaton
    // must land in the 'bcd' suffix state, not restart at root
    assert(hitsOf("abcx bcd", Seq("abcd", "bcd")) == Seq("bcd"))
    assert(hitsOf("aaa", Seq("aa")) == Seq("aa"))
    // result order is PHRASE-LIST order, not match order; distinct
    assert(hitsOf("beta alpha beta", Seq("alpha", "beta")) == Seq("alpha", "beta"))
    assert(hitsOf("nothing here", Seq("xyz", "qqq")) == Seq.empty)
  }

  test("SQL surface, null text, literal contract") {
    Functions.registerAll(spark)
    val r = spark.sql(
      "SELECT phrase_hits('the quick brown fox', array('quick', 'ox', 'cat')) AS h")
      .head().getSeq[String](0)
    assert(r == Seq("quick", "ox"))
    // null text → null result (nullSafeEval contract)
    assert(Seq(Option.empty[String]).toDF("t")
      .select(Functions.phrase_hits(col("t"), Seq("x")).as("h"))
      .head().isNullAt(0))
    // non-literal phrase array refuses at analysis
    val e = intercept[Exception](spark.sql(
      "SELECT phrase_hits(t, array(t)) FROM VALUES ('a') v(t)").collect())
    assert(e.getMessage.toLowerCase.contains("literal"), e.getMessage)
    // a null ELEMENT refuses with a named error, not a raw NPE
    val e2 = intercept[Exception](spark.sql(
      "SELECT phrase_hits('abc', array('a', cast(null AS string)))").collect())
    assert(e2.getMessage.contains("null elements"), e2.getMessage)
    // scale sanity: 5k phrases compile once and match in one pass
    val many = (0 until 5000).map(i => s"tok$i phrase")
    val got = hitsOf("prefix tok4321 phrase suffix tok17 phrase", many)
    assert(got == Seq("tok17 phrase", "tok4321 phrase"))
  }
}
