package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** WordPiece tokenizer semantics (Schuster & Nakajima 2012 / BERT):
  * hand-computed likelihood-scored merges, greedy longest-match-first
  * encoding with `##` continuations and whole-word `[UNK]`, alphabet
  * coverage, end-to-end corpus training, determinism. */
class WordPieceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("initial symbols: first char plain, rest ##-prefixed") {
    assert(WordPiece.initialSymbols("cat").toSeq == Seq("c", "##a", "##t"))
    assert(WordPiece.initialSymbols("x").toSeq == Seq("x"))
    assert(WordPiece.initialSymbols("").isEmpty)
    // non-BMP code point is ONE symbol, not two surrogate halves
    assert(WordPiece.initialSymbols("a😀").toSeq ==
      Seq("a", "##😀"))
  }

  test("training picks the likelihood-gain argmax, not the raw-count argmax") {
    // Corpus: "xy" ×3, "xz" ×3, "qy" ×2  (as word types with freqs).
    // Symbols: x:6, q:2, ##y:5, ##z:3.
    // Pairs:   (x,##y):3  score 3/(6·5)=0.100
    //          (x,##z):3  score 3/(6·3)=0.167  <- likelihood winner
    //          (q,##y):2  score 2/(2·5)=0.200  <- despite the LOWEST count
    // Raw-count BPE would merge (x,##y) or (x,##z) first; WordPiece must
    // take (q,##y) -> "qy".
    val freqs = Seq(("xy", 3L), ("xz", 3L), ("qy", 2L))
    val vocab = WordPiece.trainFromFreqs(freqs, vocabSize = 5)
    // alphabet (4 symbols) + first merge
    assert(vocab.length == 5, vocab.toString)
    assert(vocab.last == "qy", vocab.toString)
  }

  test("merged continuation pieces keep the ## prefix") {
    // "aabb" ×4: first merge is the within-word pair with the best score;
    // symbols a:4,##a:4,##b:8 -> pairs (a,##a):4 s=4/16=.25,
    // (##a,##b):4 s=4/32=.125, (##b,##b):4 s=4/64=.0625 -> merge (a,##a)
    // -> "aa" (word-initial). Next round symbols aa:4,##b:8, pairs
    // (aa,##b):4 s=4/32=.125,(##b,##b):4 s=.0625 -> "aab".
    val vocab = WordPiece.trainFromFreqs(Seq(("aabb", 4L)), vocabSize = 5)
    assert(vocab.contains("aa"), vocab.toString)
    assert(vocab.contains("aab"), vocab.toString)
    // a continuation-side merge keeps ## when the LEFT side is ##-prefixed
    val v2 = WordPiece.trainFromFreqs(Seq(("xbc", 2L), ("ybc", 2L)), vocabSize = 6)
    assert(v2.contains("##bc"), v2.toString) // (##b,##c) merged inside words
  }

  test("greedy encoding: longest match wins at every cursor") {
    val vocab = Set("un", "u", "n", "##able", "##a", "##b", "##l", "##e", "##n")
    assert(WordPiece.encodeWord("unable", vocab, 5).toSeq ==
      Seq("un", "##able"))
    // "una" -> un + ##a (not u + ##n + ##a)
    assert(WordPiece.encodeWord("una", vocab, 5).toSeq == Seq("un", "##a"))
  }

  test("uncovered character collapses the WHOLE word to [UNK]") {
    val vocab = Set("a", "##b")
    assert(WordPiece.encodeWord("ab", vocab, 1).toSeq == Seq("a", "##b"))
    assert(WordPiece.encodeWord("abz", vocab, 1).toSeq == Seq(WordPiece.Unk))
    // uncovered at position 0 too
    assert(WordPiece.encodeWord("za", vocab, 1).toSeq == Seq(WordPiece.Unk))
  }

  test("words past MaxWordChars go straight to [UNK]") {
    val vocab = Set("a", "##a")
    val long = "a" * (WordPiece.MaxWordChars + 1)
    assert(WordPiece.encodeWord(long, vocab, 1).toSeq == Seq(WordPiece.Unk))
    val exact = "a" * WordPiece.MaxWordChars
    assert(WordPiece.encodeWord(exact, vocab, 1).length == WordPiece.MaxWordChars)
  }

  test("corpus training end-to-end: dominant word becomes one piece, no " +
      "[UNK] on the training corpus, round-trip reconstructs pre-tokens") {
    val docs = (1 to 60).map(i => (i.toLong, "transformer attention is all"))
      .toDF("doc_id", "text")
    val v = WordPiece.train(docs, vocabSize = 120)
    assert(v.pieces.contains("transformer"), v.pieces.take(40).toString)
    val enc = WordPiece.encode(docs, v).select("tokens").as[Seq[String]].collect()
    assert(enc.forall(!_.contains(WordPiece.Unk)))
    // strip ## and re-join: must equal the concatenated pre-tokens
    val flat = enc.head.map(_.stripPrefix(WordPiece.Continuation)).mkString
    assert(flat == "transformerattentionisall", flat)
  }

  test("training is deterministic across runs") {
    val docs = (1 to 40)
      .map(i => (i.toLong, s"alpha beta gamma delta token${i % 7}"))
      .toDF("doc_id", "text")
    val v1 = WordPiece.train(docs, vocabSize = 80)
    val v2 = WordPiece.train(docs, vocabSize = 80)
    assert(v1.pieces == v2.pieces)
  }

  test("distributed encode matches the kernel word-by-word") {
    val vocab = WordPiece.WordPieceVocab(Vector("h", "i", "t", "##i", "##t",
      "hi", "##here", "##h", "##e", "##r"))
    val df = Seq((1L, "hi hit 42 there")).toDF("doc_id", "text")
    val got = WordPiece.encode(df, vocab)
      .select("tokens").as[Seq[String]].head()
    // "hi"->hi; "hit"->hi+##t; "42"->[UNK] (digits uncovered);
    // "there"->t+##here
    assert(got == Seq("hi", "hi", "##t", WordPiece.Unk, "t", "##here"), got)
  }
}
