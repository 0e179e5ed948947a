package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-level BPE — the GPT-2/tiktoken tokenizer family (Radford et al.
  * 2019, "Language Models are Unsupervised Multitask Learners"), the
  * fourth family next to character BPE ([[Bpe]]), Unigram-LM
  * ([[Unigram]]) and WordPiece ([[WordPiece]]). Differences from
  * character BPE, all from the public GPT-2 encoder:
  *
  *  - the base alphabet is the 256 BYTES of UTF-8, remapped to printable
  *    unicode chars ([[byteToChar]] — `bytes_to_unicode`), so ANY input
  *    tokenizes with zero `[UNK]`s and merges operate on plain strings;
  *  - pre-tokenization is GPT-2's regex (contractions, space-PREFIXED
  *    letter/digit/punct runs, whitespace runs) — the leading-space
  *    convention ("Ġthe") replaces Sennrich's `</w>` marker, and
  *    whitespace itself tokenizes (byte-level BPE is lossless);
  *  - no end-of-word marker: merges stay within pre-tokens because the
  *    encoder segments first, exactly like the character family.
  *
  * Training reuses [[Bpe.trainFromFreqs]]'s incremental merge loop (the
  * algorithm is identical — only the initial symbol split differs), so
  * the corpus still contributes exactly ONE distributed aggregate (the
  * pre-token frequency table, Heaps-bounded on the driver) at any scale.
  * Encoding is the [[graft.functions.ByteBpeEncode]] native expression:
  * map-only, merge table rides the plan, per-word memoization.
  */
object ByteBpe {

  /** GPT-2 byte→printable-char remap (`bytes_to_unicode`): the printable
    * latin-1 bytes (`!`..`~`, `¡`..`¬`, `®`..`ÿ`) map to themselves, the
    * other 68 bytes to U+0100.. in byte order — so byte 0x20 is `Ġ`
    * (U+0120) and 0x0A is `Ċ` (U+010A), the marks GPT-2 vocabularies are
    * full of. Total function: every possible byte has a char. */
  val byteToChar: Array[Char] = {
    val keep = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    val out = new Array[Char](256)
    var n = 0
    var b = 0
    while (b < 256) {
      if (keep(b)) out(b) = b.toChar
      else { out(b) = (256 + n).toChar; n += 1 }
      b += 1
    }
    out
  }

  /** Exact inverse of [[byteToChar]] (all remapped chars are BMP). */
  val charToByte: Map[Char, Int] =
    byteToChar.iterator.zipWithIndex.map { case (c, b) => c -> b }.toMap

  /** GPT-2's pre-tokenization regex (encoder.py): English contractions,
    * optionally space-prefixed letter/digit/other runs, trailing-aware
    * whitespace runs. `(?U)` makes `\s`/`\p{L}`/`\p{N}` unicode-aware to
    * match Python's `re` semantics. The alternatives jointly cover EVERY
    * character, so pre-tokens partition the text — with zero merges the
    * token count per document is exactly its UTF-8 byte count (the
    * oracle-able invariant). */
  val PreTokenPattern: String =
    "(?U)'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+"

  /** A pre-token's initial symbols: one remapped char per UTF-8 byte
    * (a 4-byte emoji is FOUR symbols — merges may later rejoin them). */
  def toSymbols(word: String): Array[String] = {
    val bytes = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[String](bytes.length)
    var i = 0
    while (i < bytes.length) {
      out(i) = String.valueOf(byteToChar(bytes(i) & 0xff))
      i += 1
    }
    out
  }

  /** Lossless inverse of encoding: token chars → bytes → UTF-8 text.
    * (Byte-level BPE round-trips EXACTLY, including whitespace — the
    * property that distinguishes the family.) */
  def decode(tokens: Seq[String]): String = {
    val chars = tokens.mkString
    val bytes = new Array[Byte](chars.length)
    var i = 0
    while (i < chars.length) {
      bytes(i) = charToByte(chars.charAt(i)).toByte
      i += 1
    }
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** An ordered merge table over remapped-byte symbols. */
  final case class ByteBpeVocab(merges: Vector[(String, String)]) {
    @transient lazy val ranks: Map[(String, String), Int] =
      merges.iterator.zipWithIndex.toMap
  }

  /** The corpus's pre-token frequency table — the single distributed pass
    * of training (GPT-2 pre-tokens, raw text form; the byte remap happens
    * in the driver-side merge loop's symbol split). */
  def wordFrequencies(docs: DataFrame, textCol: String = "text"): DataFrame =
    // spread: regex pre-tokenize + explode + map-side count combine fuse
    // into the scan stage; counts are integers — order-independent
    graft.engine.Parallelism.spread(docs.select(col(textCol)))
      .select(explode(
        regexp_extract_all(col(textCol), lit(PreTokenPattern), lit(0))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Train `numMerges` byte-level merges (same determinism contract as
    * [[Bpe.train]]: frequency-then-lexicographic total order). */
  def train(docs: DataFrame, textCol: String = "text", numMerges: Int = 200,
            maxWordTypes: Int = 100000): ByteBpeVocab = {
    val freqs = wordFrequencies(docs, textCol)
      .orderBy(desc("freq"), asc("word"))
      .limit(maxWordTypes)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    ByteBpeVocab(Bpe.trainFromFreqs(freqs, numMerges, toSymbols))
  }

  /** Encode one pre-token (spec/test entry; the distributed path is the
    * native expression). */
  private[llm] def encodeWord(word: String,
                              ranks: Map[(String, String), Int]): Array[String] =
    graft.functions.BpeKernel.mergeGreedy(toSymbols(word), ranks)

  /** Tokenize `textCol`: adds `tokens` (array<string>, remapped-char
    * form) and `n_tokens`. Map-only native expression. */
  def encode(docs: DataFrame, vocab: ByteBpeVocab,
             textCol: String = "text"): DataFrame =
    // spread: the per-row merge-loop encode is the heavy map work
    graft.engine.Parallelism.spread(docs)
      .withColumn("tokens",
        graft.functions.Functions.bpe_byte_encode(col(textCol), vocab.merges))
      .withColumn("n_tokens", size(col("tokens")))
}
