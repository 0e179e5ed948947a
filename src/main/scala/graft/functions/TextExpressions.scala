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
