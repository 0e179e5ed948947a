package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Tokenizer persistence round trips ([[TokenizerStore]]): all three
  * families reload EXACTLY (order, pieces, weights), kind tagging
  * refuses cross-family loads, and an encode through the reloaded
  * vocabulary equals an encode through the in-memory one. */
class TokenizerStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString + "/v"

  private lazy val docs =
    (1 to 30).map(i => (i.toLong, "the quick brown fox foxes boxing"))
      .toDF("doc_id", "text")

  test("BPE merge table round-trips in rank order") {
    val v = Bpe.train(docs, numMerges = 20)
    val dir = tmp("tokstore_bpe")
    TokenizerStore.saveBpe(spark, dir, v)
    assert(TokenizerStore.kindOf(spark, dir) == "bpe")
    val back = TokenizerStore.loadBpe(spark, dir)
    assert(back.merges == v.merges)
    val a = Bpe.encode(docs, v).select("tokens").as[Seq[String]].head()
    val b = Bpe.encode(docs, back).select("tokens").as[Seq[String]].head()
    assert(a == b)
  }

  test("unigram vocabulary round-trips with exact log-probabilities") {
    val v = Unigram.train(docs, vocabSize = 40, seedSize = 100,
      emSubIters = 1, shrink = 0.5)
    val dir = tmp("tokstore_uni")
    TokenizerStore.saveUnigram(spark, dir, v)
    val back = TokenizerStore.loadUnigram(spark, dir)
    assert(back.pieces == v.pieces) // doubles bit-exact through parquet
  }

  test("wordpiece vocabulary round-trips; cross-family load refuses") {
    val v = WordPiece.train(docs, vocabSize = 60)
    val dir = tmp("tokstore_wp")
    TokenizerStore.saveWordPiece(spark, dir, v)
    val back = TokenizerStore.loadWordPiece(spark, dir)
    assert(back.pieces == v.pieces)
    val ex = intercept[Exception](TokenizerStore.loadBpe(spark, dir))
    assert(ex.getMessage.contains("'bpe'"), ex.getMessage)
    val ex2 = intercept[Exception](
      TokenizerStore.kindOf(spark, tmp("tokstore_missing")))
    assert(ex2 != null)
  }

  test("the stored vocabulary is an ordinary lake table (time travel pins it)") {
    val dir = tmp("tokstore_tt")
    TokenizerStore.saveWordPiece(spark, dir,
      WordPiece.WordPieceVocab(Vector("a", "##b")))
    val t = graft.sources.SnapshotTable.forPath(spark, dir)
    val v1 = t.latestVersion
    // a retrain overwrites; the old vocabulary stays reachable AS OF v1
    TokenizerStore.saveWordPiece(spark, dir,
      WordPiece.WordPieceVocab(Vector("x", "##y", "##z")))
    assert(TokenizerStore.loadWordPiece(spark, dir).pieces ==
      Vector("x", "##y", "##z"))
    val pinned = t.asOf(v1).orderBy("rank")
      .select("piece").collect().map(_.getString(0)).toVector
    assert(pinned == Vector("a", "##b"),
      s"time travel must pin the pre-retrain vocabulary: $pinned")
  }
}
