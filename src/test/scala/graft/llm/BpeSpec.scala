package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.engine.Tables

/** BPE training + encoding pinned against a hand-derived merge sequence
  * (the Sennrich arXiv:1508.07909 worked example adapted to our marker
  * convention), round-trip and determinism properties on the fixture. */
class BpeSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  // classic dict: low×5 lower×2 newest×6 widest×3
  private val dict = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("merge loop reproduces the hand-derived sequence with deterministic ties") {
    // counts: (e,s)=9 ties (s,t</w>)=9 -> lexicographic left wins; then
    // est</w>; then (l,o)=7; then the 6-tie (e,w)<(n,e)<(w,est</w>); then
    // (ew,est</w>) vs (n,ew) -> ew < n
    val merges = Bpe.trainFromFreqs(dict, numMerges = 5)
    merges shouldBe Vector(
      ("e", "s"), ("es", "t</w>"), ("l", "o"), ("e", "w"), ("ew", "est</w>"))
  }

  test("encoding applies merges by rank; unseen words fall back to finer pieces") {
    val vocab = Bpe.BpeVocab(Bpe.trainFromFreqs(dict, numMerges = 5))
    Bpe.encodeWord("lowest", vocab.ranks).toSeq shouldBe Seq("lo", "w", "est</w>")
    Bpe.encodeWord("newest", vocab.ranks).toSeq shouldBe Seq("n", "ewest</w>")
    Bpe.encodeWord("low", vocab.ranks).toSeq shouldBe Seq("lo", "w</w>")
    // no trained merges apply -> code points + marker
    Bpe.encodeWord("zq", Map.empty).toSeq shouldBe Seq("z", "q</w>")
  }

  test("singleton pairs never merge (stop instead of memorizing one-off words)") {
    Bpe.trainFromFreqs(Seq(("abc", 1L)), numMerges = 10) shouldBe Vector.empty
  }

  test("distributed encode round-trips: concatenated tokens minus markers = text minus whitespace") {
    val docs = Tables.ensure(spark, TestSpark.sf).documents.limit(50)
    val vocab = Bpe.train(docs, numMerges = 50, maxWordTypes = 10000)
    assert(vocab.merges.nonEmpty)
    val bad = Bpe.encode(docs, vocab)
      .withColumn("rejoined",
        regexp_replace(concat_ws("", col("tokens")), lit("</w>"), lit("")))
      .withColumn("stripped", regexp_replace(col("text"), lit("\\s"), lit("")))
      .filter(col("rejoined") =!= col("stripped"))
      .count()
    assert(bad == 0L, "some document did not round-trip through BPE tokens")
  }

  test("training is deterministic across runs and row orders") {
    val docs = Tables.ensure(spark, TestSpark.sf).documents
    val a = Bpe.train(docs, numMerges = 80, maxWordTypes = 20000)
    val b = Bpe.train(docs.repartition(7), numMerges = 80, maxWordTypes = 20000)
    a.merges shouldBe b.merges
  }

  test("trained encoding compresses: fewer tokens than characters, more than words") {
    val docs = Tables.ensure(spark, TestSpark.sf).documents
    val vocab = Bpe.train(docs, numMerges = 200, maxWordTypes = 50000)
    val row = Bpe.encode(docs, vocab)
      .agg(sum("n_tokens").as("toks"),
        sum(org.apache.spark.sql.functions.length(regexp_replace(col("text"), lit("\\s"), lit("")))).as("chars"))
      .head()
    val (toks, chars) = (row.getLong(0), row.getLong(1))
    assert(toks > 0 && toks < chars,
      s"200 merges should compress below character count (toks=$toks chars=$chars)")
  }
}
