package graft.llm

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WordPiece tokenizer (Schuster & Nakajima 2012; the BERT vocabulary
  * family) — the third major subword algorithm next to [[Bpe]] (merge by
  * raw pair frequency) and [[Unigram]] (EM-fitted piece LM). WordPiece
  * merges like BPE but scores candidate pairs by the LIKELIHOOD GAIN of a
  * unigram LM, `score(a,b) = freq(ab) / (freq(a) · freq(b))` — the pair
  * whose merge most increases corpus likelihood, which favors gluing
  * symbols that occur mostly TOGETHER over merely frequent ones (the
  * HuggingFace `WordPieceTrainer` implements exactly this rule). Word-
  * internal pieces carry the `##` continuation prefix and encoding is
  * greedy longest-match-first with whole-word `[UNK]` fallback — BERT's
  * runtime `WordpieceTokenizer` algorithm, NOT a merge replay.
  *
  * Spark-first shape (identical to the BPE trainer's): the corpus
  * contributes exactly ONE distributed aggregate — the word-type
  * frequency table ([[Bpe.wordFrequencies]], a two-phase hash aggregate
  * whose result is Heaps-law-bounded and capped at `maxWordTypes`) — and
  * the merge loop runs driver-side over that bounded dict with
  * incremental pair/symbol-count maintenance. Encoding is a native
  * map-only expression (WordPieceEncode): the vocabulary rides the
  * serialized plan, every pre-token encodes independently, and each
  * executor memoizes encodings per word TYPE — embarrassingly parallel
  * at any corpus size.
  *
  * Pre-tokenization matches the family convention
  * ([[graft.functions.BpeKernel.PreTokenPattern]]: letter runs, digit
  * runs, single punctuation). Determinism: pair selection orders by
  * (score desc, pair-frequency desc, (left, right) asc); the word table
  * is totally ordered by (freq desc, word asc) before the loop.
  */
object WordPiece {

  /** Continuation prefix on word-internal pieces (BERT convention). */
  val Continuation = "##"

  /** The whole-word fallback token when a pre-token cannot be covered. */
  val Unk = "[UNK]"

  /** BERT's `max_input_chars_per_word`: longer pre-tokens go straight to
    * `[UNK]` (pathological tokens — base64 blobs, minified JS — would
    * otherwise cost O(len²) match attempts). */
  val MaxWordChars = 100

  /** A trained vocabulary: alphabet + merged pieces, insertion order
    * (alphabet first, then merges in creation order). */
  final case class WordPieceVocab(pieces: Vector[String]) {
    @transient lazy val set: Set[String] = pieces.toSet
    /** Longest piece CONTENT length (chars covered, `##` excluded). */
    @transient lazy val maxContentLen: Int =
      if (pieces.isEmpty) 1
      else pieces.iterator
        .map(p => if (p.startsWith(Continuation)) p.length - 2 else p.length)
        .max
  }

  /** A word's initial symbols: first code point plain, the rest
    * `##`-prefixed (BERT's continuation convention — contrast BPE's
    * trailing `</w>` marker). */
  def initialSymbols(word: String): Array[String] = {
    val cps = word.codePoints().toArray
    val syms = new Array[String](cps.length)
    var i = 0
    while (i < cps.length) {
      val c = new String(Character.toChars(cps(i)))
      syms(i) = if (i == 0) c else Continuation + c
      i += 1
    }
    syms
  }

  /** Train a vocabulary of at most `vocabSize` pieces (alphabet included;
    * the alphabet is never evicted — coverage of seen characters is
    * guaranteed). ONE distributed corpus pass; driver loop over ≤
    * `maxWordTypes` word types. */
  def train(docs: DataFrame, textCol: String = "text", vocabSize: Int = 400,
            maxWordTypes: Int = 100000): WordPieceVocab = {
    val freqs = Bpe.wordFrequencies(docs, textCol)
      .orderBy(desc("freq"), asc("word"))
      .limit(maxWordTypes)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    WordPieceVocab(trainFromFreqs(freqs, vocabSize))
  }

  /** The likelihood-scored merge loop over a word-frequency dict.
    * Maintains pair counts AND symbol counts incrementally (posting lists
    * bound each round's work to the words containing the merged pair).
    * Stops when the vocabulary reaches `vocabSize` or the best pair
    * occurs only once. */
  private[llm] def trainFromFreqs(freqs: Seq[(String, Long)],
                                  vocabSize: Int): Vector[String] = {
    val words: Array[mutable.ArrayBuffer[String]] = freqs.map { case (w, _) =>
      mutable.ArrayBuffer(initialSymbols(w).toSeq: _*)
    }.toArray
    val wfreq: Array[Long] = freqs.map(_._2).toArray

    val pairCount = mutable.HashMap.empty[(String, String), Long]
    val symCount = mutable.HashMap.empty[String, Long]
    val posting = mutable.HashMap.empty[(String, String), mutable.BitSet]
    def addWord(i: Int, sign: Long): Unit = {
      val s = words(i)
      var j = 0
      while (j < s.length) {
        val c = symCount.getOrElse(s(j), 0L) + sign * wfreq(i)
        if (c <= 0L) symCount.remove(s(j)) else symCount.update(s(j), c)
        if (j < s.length - 1) {
          val p = (s(j), s(j + 1))
          val pc = pairCount.getOrElse(p, 0L) + sign * wfreq(i)
          if (pc <= 0L) pairCount.remove(p) else pairCount.update(p, pc)
          if (sign > 0) posting.getOrElseUpdate(p, mutable.BitSet.empty).add(i)
        }
        j += 1
      }
    }
    words.indices.foreach(addWord(_, 1L))

    // alphabet: every initial symbol, most frequent first (ties: asc)
    val alphabet = symCount.toSeq.sortBy { case (s, c) => (-c, s) }.map(_._1)
    val vocab = mutable.LinkedHashSet.empty[String]
    alphabet.foreach(vocab.add)

    var done = vocab.size >= vocabSize
    while (!done) {
      if (pairCount.isEmpty) done = true
      else {
        // argmax by likelihood score; ties: pair count desc, (l, r) asc
        var best: (String, String) = null
        var bestScore = 0.0
        var bestC = 0L
        pairCount.foreach { case (p, c) =>
          val sc = c.toDouble /
            (symCount.getOrElse(p._1, 1L).toDouble * symCount.getOrElse(p._2, 1L).toDouble)
          if (best == null || sc > bestScore ||
              (sc == bestScore && (c > bestC ||
                (c == bestC && (p._1 < best._1 ||
                  (p._1 == best._1 && p._2 < best._2)))))) {
            best = p; bestScore = sc; bestC = c
          }
        }
        if (bestC < 2L) done = true // a singleton merge never generalizes
        else {
          val joined = best._1 + best._2.stripPrefix(Continuation)
          val touched = posting.getOrElse(best, mutable.BitSet.empty).toArray
          touched.foreach { i =>
            val s = words(i)
            if (s.length > 1) {
              addWord(i, -1L)
              var j = 0
              while (j < s.length - 1) {
                if (s(j) == best._1 && s(j + 1) == best._2) {
                  s(j) = joined; s.remove(j + 1)
                } else j += 1
              }
              addWord(i, 1L)
            }
          }
          pairCount.remove(best)
          posting.remove(best)
          vocab.add(joined)
          if (vocab.size >= vocabSize) done = true
        }
      }
    }
    vocab.toVector
  }

  /** Greedy longest-match-first encoding of one pre-token (BERT's
    * `WordpieceTokenizer`): repeatedly take the longest vocabulary piece
    * matching at the cursor (`##`-prefixed past position 0); any position
    * with no match — or a word past [[MaxWordChars]] — collapses the
    * WHOLE word to `[UNK]`. */
  private[graft] def encodeWord(word: String, vocab: Set[String],
                                maxContentLen: Int): Array[String] = {
    val n = word.length
    if (n == 0) return Array.empty
    if (n > MaxWordChars) return Array(Unk)
    val out = mutable.ArrayBuffer.empty[String]
    var start = 0
    while (start < n) {
      var len = math.min(maxContentLen, n - start)
      var found: String = null
      while (len >= 1 && found == null) {
        val cand =
          if (start > 0) Continuation + word.substring(start, start + len)
          else word.substring(start, start + len)
        if (vocab.contains(cand)) found = cand
        else len -= 1
      }
      if (found == null) return Array(Unk)
      out += found
      start += len
    }
    out.toArray
  }

  /** Tokenize `textCol` under a trained vocabulary: adds `tokens`
    * (array<string>) and `n_tokens`. Map-only native expression; the
    * vocabulary rides the plan, per-word-type memoized per executor. */
  def encode(docs: DataFrame, vocab: WordPieceVocab,
             textCol: String = "text"): DataFrame =
    // spread: the per-row longest-match encode is the heavy map work
    graft.engine.Parallelism.spread(docs)
      .withColumn("tokens",
        graft.functions.Functions.wordpiece_encode(col(textCol), vocab.pieces))
      .withColumn("n_tokens", size(col("tokens")))
}
