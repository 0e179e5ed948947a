package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Text-fingerprinting kernels for the dedup pipeline (LLM-extras surface;
  * the reference engine has no document ops — SURVEY §2).
  *
  * All are single-pass over the input and allocation-light: at 100 TB the
  * dedup sweep hashes every document once, so the signature computation must
  * be O(tokens) with no per-token boxing. Hashing uses Spark's own XXH64
  * (same kernel behind `xxhash64()`), seeded per permutation.
  */
object TextHashing {
  /** MinHash signature via the two-hash scheme (Kirsch–Mitzenmacher:
    * h_i(s) = h1(s) + i*h2(s) preserves MinHash's collision-probability
    * contract): each shingle is hashed twice instead of numHashes times —
    * 32× less hashing for the standard 64-permutation signature, which is
    * the dominant cost of a corpus-wide dedup sweep. */
  def minHashSignature(shingles: Iterator[UTF8String], numHashes: Int): Array[Long] = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var any = false
    while (shingles.hasNext) {
      val s = shingles.next()
      any = true
      val h1 = XXH64.hashUTF8String(s, 0L)
      val h2 = XXH64.hashUTF8String(s, 1L) | 1L // odd => full-period stride
      var i = 0
      var h = h1
      while (i < numHashes) {
        if (h < sig(i)) sig(i) = h
        h += h2
        i += 1
      }
    }
    if (!any) Array.fill(numHashes)(0L) else sig
  }

  /** 64-bit SimHash over token hashes (unweighted). */
  def simHash64(tokens: Iterator[UTF8String]): Long = {
    val counts = new Array[Int](64)
    while (tokens.hasNext) {
      val h = XXH64.hashUTF8String(tokens.next(), 0L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Whitespace tokenizer over the lowercased UTF-8 bytes. Splitting on
    * ASCII whitespace byte-wise (multi-byte UTF-8 sequences never contain
    * ASCII bytes) avoids the String round-trip + regex of a naive
    * tokenizer — this runs once per document across a 100 TB corpus.
    */
  def tokenize(text: UTF8String): Array[UTF8String] = {
    val lower = text.toLowerCase
    val bytes = lower.getBytes
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      if (i > start) out += UTF8String.fromBytes(bytes, start, i - start)
    }
    out.toArray
  }

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\t' || b == '\r' || b == '\f' || b == 0x0b

  /** Word k-shingles of the lowercased token stream. */
  def shingles(text: UTF8String, k: Int): Iterator[UTF8String] = {
    val toks = tokenize(text)
    if (toks.length < k) Iterator.single(UTF8String.concatWs(UTF8String.fromString(" "), toks: _*))
    else toks.sliding(k).map(w => UTF8String.concatWs(UTF8String.fromString(" "), w: _*))
  }
}

/** minhash(text, numHashes, shingleSize) -> array<bigint> signature. */
case class MinHashSignature(child: Expression, numHashes: Int, shingleSize: Int)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "minhash"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val sig = TextHashing.minHashSignature(
      TextHashing.shingles(v.asInstanceOf[UTF8String], shingleSize), numHashes)
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** simhash64(text) -> bigint (64-bit SimHash of whitespace tokens). */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    TextHashing.simHash64(TextHashing.tokenize(v.asInstanceOf[UTF8String]).iterator)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** word_ngrams(text, n, distinct) -> array<string> of raw word n-grams of
  * the lowercased whitespace token stream (whole doc as one gram when
  * shorter than n tokens). Output-identical to the declarative form
  * `array_distinct(transform(sequence(1, size(toks)-n+1), i ->
  * concat_ws(' ', element_at(toks, i), …)))` over
  * `filter(split(lower(text), '\s+'), w -> length(w) > 0)` — Java regex
  * `\s` is exactly the six ASCII whitespace chars `tokenize` splits on —
  * but tokenizes ONCE per document: the lambda form re-evaluates the
  * split/filter chain inside every `element_at`, making gram construction
  * O(tokens²) regex work per doc. This is the hot path of every
  * decontamination / exact-Jaccard sweep, so it must be O(tokens).
  */
case class WordNgrams(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "word_ngrams"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val it = TextHashing.shingles(v.asInstanceOf[UTF8String], n)
    val arr: Array[AnyRef] =
      if (!distinct) it.toArray[UTF8String].asInstanceOf[Array[AnyRef]]
      else {
        // first-occurrence order, matching array_distinct
        val seen = new java.util.LinkedHashSet[UTF8String]()
        it.foreach(seen.add)
        seen.toArray(new Array[AnyRef](seen.size))
      }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** ngram_set_hashes(text, n) -> sorted distinct array<bigint> of word-ngram
  * hashes; Jaccard between documents is then a cheap array intersection
  * (`array_intersect`/`array_union` on 8-byte keys, not strings).
  */
case class NgramHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "ngram_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val hs = TextHashing.shingles(v.asInstanceOf[UTF8String], n)
      .map(XXH64.hashUTF8String(_, 0L)).toArray.distinct.sorted
    new GenericArrayData(hs)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Executor-side BPE kernel shared by [[graft.llm.Bpe]] training (driver)
  * and the [[BpeEncode]] expression (tasks): one algorithm, one marker
  * convention, so a word encodes to exactly the symbols training produced
  * for it. Symbols split on code points (a non-BMP char is one symbol, not
  * two surrogate halves). */
object BpeKernel {
  /** Pre-token pattern — letter runs, digit runs, single punctuation
    * (matches TextAnalysis's `bpeish_tokens` segmentation). */
  val PreTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  /** End-of-word marker on a word's final symbol (Sennrich arXiv:1508.07909). */
  val EndOfWord = "</w>"

  /** A word's initial symbol sequence: code points, marker appended to the
    * last. Empty input yields an empty array. */
  def initialSymbols(word: String): Array[String] = {
    val cps = word.codePoints().toArray
    val syms = new Array[String](cps.length)
    var i = 0
    while (i < cps.length) { syms(i) = new String(Character.toChars(cps(i))); i += 1 }
    if (syms.nonEmpty) syms(syms.length - 1) = syms(syms.length - 1) + EndOfWord
    syms
  }

  /** Greedy rank-order merging: repeatedly merge the adjacent pair with the
    * lowest merge rank until none applies — the canonical BPE encoder. */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Array[String] =
    mergeGreedy(initialSymbols(word), ranks)

  /** The merge loop alone, over caller-supplied initial symbols (shared by
    * the character-level encoder above and the byte-level GPT-2 family,
    * which differ only in how a pre-token becomes symbols). */
  def mergeGreedy(init: Array[String],
                  ranks: Map[(String, String), Int]): Array[String] = {
    var syms = init
    var continue = syms.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var j = 0
      while (j < syms.length - 1) {
        val r = ranks.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestAt = j }
        j += 1
      }
      if (bestAt < 0) continue = false
      else {
        val merged = new Array[String](syms.length - 1)
        System.arraycopy(syms, 0, merged, 0, bestAt)
        merged(bestAt) = syms(bestAt) + syms(bestAt + 1)
        System.arraycopy(syms, bestAt + 2, merged, bestAt + 1,
          syms.length - bestAt - 2)
        syms = merged
        continue = syms.length > 1
      }
    }
    syms
  }
}

/** unicode_normalize(text, form) -> string: java.text.Normalizer under
  * the standard forms (NFC/NFD/NFKC/NFKD) — the canonicalization step
  * BEFORE any hashing/dedup/tokenization of multi-source web text (the
  * same page crawled twice can differ only in composed vs combining
  * accents; every hash-keyed operator downstream would miss the dup).
  * Matches DuckDB's `nfc_normalize` for form=NFC (both implement UAX #15),
  * which is what makes the oracle exact. */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "unicode_normalize"
  override def dataType: DataType = StringType
  @transient private lazy val f = java.text.Normalizer.Form.valueOf(form.toUpperCase)
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(
      java.text.Normalizer.normalize(v.asInstanceOf[UTF8String].toString, f))
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** strip_accents(text) -> string: NFD-decompose, drop combining marks
  * (Unicode category Mn) — `Ünïçödé` → `Unicode`, the BERT-uncased /
  * fastText preprocessing convention. Semantics match DuckDB's
  * `strip_accents` (utf8proc) on Latin-script text. */
case class StripAccents(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "strip_accents"
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = {
    val d = java.text.Normalizer.normalize(
      v.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var i = 0
    // iterate CODE POINTS: Character.getType(char) on a surrogate half
    // reports SURROGATE, so supplementary-plane combining marks would
    // survive a code-unit loop (utf8proc strips them — oracle parity)
    while (i < d.length) {
      val cp = d.codePointAt(i)
      if (Character.getType(cp) != Character.NON_SPACING_MARK)
        sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Shared deployment shape of the tokenizer-encode expression family
  * (BPE / unigram-LM / WordPiece): the trained vocabulary rides the
  * serialized plan (a few KB — the broadcast-variable shape for
  * plan-embedded constants), pre-tokens segment independently, and each
  * executor memoizes encodings per word TYPE (Zipf: a handful of common
  * words dominate any corpus), so the per-token cost is one hash probe.
  * Subclasses supply only the per-word kernel — the segmentation regex,
  * cache policy, and emit loop exist ONCE. */
abstract class TokenizerEncode extends UnaryExpression with CodegenFallback {
  /** Encode one pre-token (the algorithm-specific kernel). */
  protected def encodeWord(word: String): Array[UTF8String]

  /** The segmentation regex (byte-level BPE overrides with GPT-2's). */
  protected def preTokenPattern: String = BpeKernel.PreTokenPattern

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val pattern =
    java.util.regex.Pattern.compile(preTokenPattern)
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[UTF8String]]()
  private val CacheCap = 100000 // word TYPES; reset beyond (no LRU bookkeeping)

  override def nullSafeEval(v: Any): Any = {
    val text = v.asInstanceOf[UTF8String].toString
    val out = new java.util.ArrayList[AnyRef]()
    val m = pattern.matcher(text)
    while (m.find()) {
      val word = m.group()
      if (cache.size() > CacheCap) cache.clear()
      val toks = cache.computeIfAbsent(word, w => encodeWord(w))
      var i = 0
      while (i < toks.length) { out.add(toks(i)); i += 1 }
    }
    new GenericArrayData(out.toArray)
  }
}

/** bpe_encode(text, merges) -> array<string>: the document's BPE token
  * stream under a trained merge table (see [[graft.llm.Bpe]]). */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends TokenizerEncode {
  override def prettyName: String = "bpe_encode"
  @transient private lazy val ranks: Map[(String, String), Int] =
    merges.iterator.zipWithIndex.toMap
  override protected def encodeWord(word: String): Array[UTF8String] =
    BpeKernel.encodeWord(word, ranks).map(UTF8String.fromString)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** bpe_byte_encode(text, merges) -> array<string>: byte-level BPE token
  * stream (the GPT-2/tiktoken family — Radford et al. 2019): GPT-2
  * pre-tokenization, each pre-token's UTF-8 bytes remapped to printable
  * chars, then the shared greedy merge loop. Tokens are remapped-char
  * strings ("Ġthe"-style); [[graft.llm.ByteBpe.decode]] inverts exactly. */
case class ByteBpeEncode(child: Expression, merges: Seq[(String, String)])
    extends TokenizerEncode {
  override def prettyName: String = "bpe_byte_encode"
  override protected def preTokenPattern: String =
    graft.llm.ByteBpe.PreTokenPattern
  @transient private lazy val ranks: Map[(String, String), Int] =
    merges.iterator.zipWithIndex.toMap
  override protected def encodeWord(word: String): Array[UTF8String] =
    BpeKernel.mergeGreedy(graft.llm.ByteBpe.toSymbols(word), ranks)
      .map(UTF8String.fromString)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** unigram_encode(text, vocab) -> array<string>: Viterbi (max-likelihood)
  * token stream under a trained unigram-LM vocabulary (see
  * [[graft.llm.Unigram]]). */
case class UnigramEncode(child: Expression, vocab: Seq[(String, Double)])
    extends TokenizerEncode {
  override def prettyName: String = "unigram_encode"
  @transient private lazy val logp: Map[String, Double] = vocab.toMap
  @transient private lazy val maxLen: Int =
    if (vocab.isEmpty) 1 else vocab.iterator.map(_._1.length).max
  override protected def encodeWord(word: String): Array[UTF8String] =
    graft.llm.Unigram.viterbiWord(word, logp, maxLen)
      .map(t => UTF8String.fromString(t))
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** wordpiece_encode(text, pieces) -> array<string>: greedy longest-match
  * (BERT `WordpieceTokenizer`) token stream under a trained WordPiece
  * vocabulary (see [[graft.llm.WordPiece]] — `##` continuations, whole-
  * word `[UNK]` fallback). */
case class WordPieceEncode(child: Expression, pieces: Seq[String])
    extends TokenizerEncode {
  override def prettyName: String = "wordpiece_encode"
  @transient private lazy val vocab: Set[String] = pieces.toSet
  @transient private lazy val maxContentLen: Int =
    if (pieces.isEmpty) 1
    else pieces.iterator
      .map(p => if (p.startsWith(graft.llm.WordPiece.Continuation)) p.length - 2
                else p.length)
      .max
  override protected def encodeWord(word: String): Array[UTF8String] =
    graft.llm.WordPiece.encodeWord(word, vocab, maxContentLen)
      .map(UTF8String.fromString)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
