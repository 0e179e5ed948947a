package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Unigram-LM tokenizer semantics (Kudo 2018): hand-computed
  * forward-backward expected counts, Viterbi segmentation with the
  * documented tie-break, char-coverage guarantee, corpus training
  * end-to-end (a dominant word becomes one piece), determinism. */
class UnigramSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val ln = (x: Double) => math.log(x)

  test("expected counts: hand-computed forward-backward on 'ab'") {
    // vocab p(a)=p(b)=0.5, p(ab)=0.25 -> two segmentations, equal prob:
    // a·b = 0.25, ab = 0.25; Z = 0.5 -> each path has posterior 0.5.
    val lp = Map("a" -> ln(0.5), "b" -> ln(0.5), "ab" -> ln(0.25))
    val got = Unigram.expectedCounts("ab", freq = 2, lp, maxLen = 2).toMap
    assert(math.abs(got("a") - 1.0) < 1e-12, got.toString)
    assert(math.abs(got("b") - 1.0) < 1e-12)
    assert(math.abs(got("ab") - 1.0) < 1e-12)
  }

  test("expected counts: uncoverable word contributes nothing") {
    val lp = Map("a" -> ln(0.5))
    assert(Unigram.expectedCounts("ax", 1, lp, 1).isEmpty)
  }

  test("viterbi: picks the max-probability segmentation") {
    val lp = Map("ab" -> ln(0.4), "a" -> ln(0.3), "b" -> ln(0.3))
    assert(Unigram.viterbiWord("ab", lp, 2).toSeq == Seq("ab")) // 0.4 > 0.09
    assert(Unigram.viterbiWord("aab", lp, 2).toSeq == Seq("a", "ab"))
  }

  test("viterbi: exact ties prefer the longer final piece") {
    // ab = 0.0625 and a·b = 0.0625 exactly -> one token wins
    val lp = Map("a" -> ln(0.25), "b" -> ln(0.25), "ab" -> ln(0.0625))
    assert(Unigram.viterbiWord("ab", lp, 2).toSeq == Seq("ab"))
  }

  test("viterbi: chars missing from the vocab fall back, never fail") {
    val lp = Map("a" -> ln(0.5))
    assert(Unigram.viterbiWord("axa", lp, 1).toSeq == Seq("a", "x", "a"))
  }

  test("training: a dominant repeated word becomes a single piece; round-trip holds") {
    val docs = Seq.fill(40)("hello hello hello world").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val v = Unigram.train(docs, vocabSize = 30, maxPieceLen = 8,
      seedSize = 200, emSubIters = 2, shrink = 0.5)
    assert(v.logp.contains("hello"), s"pieces: ${v.pieces.map(_._1)}")
    val enc = Unigram.encode(docs.limit(1), v).select("tokens")
      .as[Seq[String]].head()
    assert(enc.count(_ == "hello") == 3, enc.toString)
    assert(enc.mkString == "hellohellohelloworld", "concat == pre-token stream")
  }

  test("training and encoding are deterministic") {
    val docs = Seq.tabulate(30)(i => (i.toLong, s"red green blue word$i"))
      .toDF("doc_id", "text")
    def run() = Unigram.train(docs, vocabSize = 40, seedSize = 300,
      emSubIters = 1, shrink = 0.5).pieces
    val a = run(); val b = run()
    assert(a == b)
    // every single character of the corpus survives pruning
    val chars = "redgreenblueword0123456789".toSet
    assert(chars.forall(c => a.exists(_._1 == c.toString)),
      s"missing chars: ${chars.filterNot(c => a.exists(_._1 == c.toString))}")
  }
}
