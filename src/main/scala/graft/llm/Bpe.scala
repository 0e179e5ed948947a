package graft.llm

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: corpus-trained subword vocabulary plus
  * distributed encoding — the tokenizer-construction step of a training-
  * data pipeline (token budgets, context packing and dedup all count in
  * tokens of a corpus-specific vocabulary, not characters).
  *
  * Spark-first shape (the standard BPE training recipe — Sennrich et al.
  * 2016, arXiv:1508.07909; SentencePiece and the HF trainers do the same):
  * the corpus contributes exactly ONE distributed aggregate — the
  * word-type frequency table — and the merge loop runs driver-side over
  * that table. Word TYPES grow ~sublinearly with corpus size (Heaps' law)
  * and are capped by `maxWordTypes` (rarest types can't win a merge
  * anyway), so at 100 TB the driver holds a bounded dict while the cluster
  * does the only corpus-sized pass. Encoding is a native expression over a
  * broadcast-able merge table, embarrassingly parallel per document.
  *
  * Pre-tokenization matches [[TextAnalysis.tokenCounts]]'s "BPE-ish"
  * segmentation (`[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]`): letter runs, digit
  * runs, single punctuation. Each pre-token trains/encodes as its
  * character sequence with `</w>` appended to the final symbol, so merges
  * never cross word boundaries.
  */
object Bpe {

  /** Pre-token pattern (identical to the `bpeish_tokens` regex). */
  val PreTokenPattern: String = graft.functions.BpeKernel.PreTokenPattern

  /** End-of-word marker carried on a word's last symbol (Sennrich §3.2). */
  val EndOfWord: String = graft.functions.BpeKernel.EndOfWord

  /** An ordered merge table; rank = position (lower merges first). */
  final case class BpeVocab(merges: Vector[(String, String)]) {
    @transient lazy val ranks: Map[(String, String), Int] =
      merges.iterator.zipWithIndex.toMap
  }

  /** The corpus's word-type frequency table — the single distributed pass
    * of training. One two-phase hash aggregate; at any scale the result is
    * |types|, not |corpus|. */
  def wordFrequencies(docs: DataFrame, textCol: String = "text"): DataFrame =
    // spread: regex pre-tokenize + explode + map-side count combine fuse
    // into the scan stage; counts are integers — order-independent
    graft.engine.Parallelism.spread(docs.select(col(textCol)))
      .select(explode(
        regexp_extract_all(col(textCol), lit(PreTokenPattern), lit(0))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Train `numMerges` merges from the corpus. The driver materializes at
    * most `maxWordTypes` word types (highest frequency first; ties break
    * lexicographically so training is deterministic under any row order —
    * Spark and the merge loop agree on a total order). */
  def train(docs: DataFrame, textCol: String = "text", numMerges: Int = 200,
            maxWordTypes: Int = 100000): BpeVocab = {
    val freqs = wordFrequencies(docs, textCol)
      .orderBy(desc("freq"), asc("word"))
      .limit(maxWordTypes)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    BpeVocab(trainFromFreqs(freqs, numMerges))
  }

  /** The classic merge loop over a word-frequency dict, with incremental
    * pair-count maintenance: each round touches only the words containing
    * the merged pair (pair → word-index posting lists), not the whole
    * dict. Tie-break: highest count, then lexicographically smallest
    * (left, right) — fully deterministic. Stops early when the best pair
    * occurs only once (a merge that can never generalize). */
  private[llm] def trainFromFreqs(freqs: Seq[(String, Long)],
                                  numMerges: Int,
                                  initSyms: String => Array[String] =
                                    graft.functions.BpeKernel.initialSymbols)
      : Vector[(String, String)] = {
    // symbol sequences per word type (default: code-point split with the
    // marker on the last; ByteBpe passes its byte-remap split instead)
    val words: Array[mutable.ArrayBuffer[String]] = freqs.map { case (w, _) =>
      val syms = mutable.ArrayBuffer(initSyms(w).toSeq: _*)
      syms
    }.toArray
    val wfreq: Array[Long] = freqs.map(_._2).toArray

    val pairCount = mutable.HashMap.empty[(String, String), Long]
    val posting = mutable.HashMap.empty[(String, String), mutable.BitSet]
    def addWordPairs(i: Int, sign: Long): Unit = {
      val s = words(i)
      var j = 0
      while (j < s.length - 1) {
        val p = (s(j), s(j + 1))
        val c = pairCount.getOrElse(p, 0L) + sign * wfreq(i)
        if (c <= 0L) pairCount.remove(p) else pairCount.update(p, c)
        if (sign > 0) posting.getOrElseUpdate(p, mutable.BitSet.empty).add(i)
        j += 1
      }
    }
    words.indices.foreach(addWordPairs(_, 1L))

    val merges = Vector.newBuilder[(String, String)]
    var n = 0
    var done = false
    while (n < numMerges && !done) {
      if (pairCount.isEmpty) done = true
      else {
        // deterministic argmax: count desc, then (left, right) asc
        var best: (String, String) = null
        var bestC = 0L
        pairCount.foreach { case (p, c) =>
          if (best == null || c > bestC ||
              (c == bestC && (p._1 < best._1 ||
                (p._1 == best._1 && p._2 < best._2)))) { best = p; bestC = c }
        }
        if (bestC < 2L) done = true // singleton merges never generalize
        else {
          merges += best
          val joined = best._1 + best._2
          val touched = posting.getOrElse(best, mutable.BitSet.empty).toArray
          touched.foreach { i =>
            val s = words(i)
            if (s.length > 1) {
              addWordPairs(i, -1L) // retract this word's pair contributions
              var j = 0
              while (j < s.length - 1) {
                if (s(j) == best._1 && s(j + 1) == best._2) {
                  s(j) = joined; s.remove(j + 1)
                } else j += 1
              }
              addWordPairs(i, 1L) // re-add with the merge applied
            }
          }
          pairCount.remove(best)
          posting.remove(best)
          n += 1
        }
      }
    }
    merges.result()
  }

  /** Encode one word (a pre-token, WITHOUT the marker): delegates to the
    * executor-side kernel so training, testing, and the distributed
    * expression share one algorithm. */
  private[llm] def encodeWord(word: String,
                              ranks: Map[(String, String), Int]): Array[String] =
    graft.functions.BpeKernel.encodeWord(word, ranks)

  /** Tokenize `textCol` with a trained vocabulary: adds `tokens`
    * (array<string>) and `n_tokens`. Runs as a native expression — the
    * merge table rides the serialized plan to every task (a few KB), and
    * each executor memoizes encodings per word type, so common words cost
    * one hash probe. */
  def encode(docs: DataFrame, vocab: BpeVocab,
             textCol: String = "text"): DataFrame =
    // spread: the per-row merge-loop encode is the heavy map work
    graft.engine.Parallelism.spread(docs)
      .withColumn("tokens",
        graft.functions.Functions.bpe_encode(col(textCol), vocab.merges))
      .withColumn("n_tokens", size(col("tokens")))
}
