package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** Scala + SQL surface for graft's custom functions.
  *
  * The reference exposes its extension functions through a registry
  * (dremio-oss `exec/expr/fn/FunctionImplementationRegistry.java:48`, 352
  * `@FunctionTemplate` impls); here each custom capability is a native
  * Catalyst `Expression` registered into Spark's `FunctionRegistry`, so it
  * is callable from both the Column API and SQL text.
  */
object Functions {

  private def col(e: Expression): Column = Bridge.column(e)
  private def ex(c: Column): Expression = Bridge.expression(c)

  // ---- vector similarity (LLM extras; custom codegen'd expressions) ----
  def cosine_sim(a: Column, b: Column): Column = col(CosineSimilarity(ex(a), ex(b)))
  def cosine_sim_d(a: Column, b: Column): Column = col(CosineSimilarityD(ex(a), ex(b)))
  def dequantize_int8(v: Column): Column = col(DequantizeInt8(ex(v)))
  def quantize_int8(v: Column): Column = col(QuantizeInt8(ex(v)))
  def dot_product(a: Column, b: Column): Column = col(DotProduct(ex(a), ex(b)))
  def pq_adc_dot(codes: Column, lut: Column): Column = col(PqAdcDot(ex(codes), ex(lut)))
  def pq_encode(v: Column, codebook: Seq[Seq[Seq[Float]]]): Column =
    col(PqEncode(ex(v), codebook))
  def pq_lut(v: Column, codebook: Seq[Seq[Seq[Float]]]): Column =
    col(PqLut(ex(v), codebook))
  def l2_norm(a: Column): Column = col(L2Norm(ex(a)))

  // ---- text fingerprints (LLM extras) ----
  def minhash(text: Column, numHashes: Int = 64, shingleSize: Int = 3): Column =
    col(MinHashSignature(ex(text), numHashes, shingleSize))
  def simhash64(text: Column): Column = col(SimHash64(ex(text)))
  def srp_sign64(vec: Column, seed: Long = 0L): Column = col(SrpSign64(ex(vec), seed))
  def ngram_hashes(text: Column, n: Int = 3): Column = col(NgramHashes(ex(text), n))
  def word_ngrams(text: Column, n: Int = 3, distinct: Boolean = true): Column =
    col(WordNgrams(ex(text), n, distinct))
  def bpe_encode(text: Column, merges: Seq[(String, String)]): Column =
    col(BpeEncode(ex(text), merges))
  def bpe_byte_encode(text: Column, merges: Seq[(String, String)]): Column =
    col(ByteBpeEncode(ex(text), merges))
  def unigram_encode(text: Column, vocab: Seq[(String, Double)]): Column =
    col(UnigramEncode(ex(text), vocab))
  def wordpiece_encode(text: Column, pieces: Seq[String]): Column =
    col(WordPieceEncode(ex(text), pieces))
  /** Lucene query-string predicate (reference CONTAINS — SqlContains.java;
    * full syntax in [[Lucene]]'s scaladoc). Query must be a literal. */
  def lucene_match(text: Column, query: String): Column =
    col(LuceneMatch(ex(text), ex(lit(query))))
  /** Aho–Corasick multi-phrase scan: distinct phrases contained in the
    * text, in list order — O(text + hits) per row at ANY phrase count
    * (see [[AhoCorasick]]). */
  def phrase_hits(text: Column, phrases: Seq[String]): Column =
    col(PhraseHits(ex(text), ex(lit(phrases.toArray))))
  def unicode_normalize(text: Column, form: String = "NFC"): Column =
    col(UnicodeNormalize(ex(text), form))
  def strip_accents(text: Column): Column = col(StripAccents(ex(text)))

  /** Hamming distance between two 64-bit fingerprints (built-in composition:
    * stays in whole-stage codegen). */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  // ---- Dremio surface shims (SURVEY §2.8) ----
  /** KVGEN (dremio-oss `exec/expr/fn/impl/Mappify.java`): map -> list<struct<key,value>>. */
  def kvgen(m: Column): Column = map_entries(m)

  /** GEO_DISTANCE (dremio-oss `exec/expr/fn/impl/GeoFunctions.java`):
    * haversine distance in meters between two lat/lon points (degrees). */
  def geo_distance(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val r = lit(6371008.8) // mean earth radius, meters
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    val a = pow(sin(dLat), 2) + cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2)
    lit(2) * r * asin(sqrt(a))
  }

  /** NDV (dremio-oss `NdvAccumulators.java`): HLL estimate; Spark's
    * DataSketches HLL supplies mergeable sketch semantics (HLL / HLL_MERGE /
    * HLL_DECODE == hll_sketch_agg / hll_union_agg / hll_sketch_estimate). */
  def ndv(c: Column): Column = hll_sketch_estimate(hll_sketch_agg(c))

  /** Register SQL-callable forms of the custom expressions. Idempotent. */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def one(name: String, arity: Int)(b: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, es => {
        require(es.length == arity || arity < 0, s"$name expects $arity args")
        b(es)
      }, "built-in")
    one("cosine_sim", 2)(es => CosineSimilarity(es(0), es(1)))
    one("dot_product", 2)(es => DotProduct(es(0), es(1)))
    one("pq_adc_dot", 2)(es => PqAdcDot(es(0), es(1)))
    one("l2_norm", 1)(es => L2Norm(es(0)))
    one("simhash64", 1)(es => SimHash64(es(0)))
    one("srp_sign64", 1)(es => SrpSign64(es(0)))
    one("minhash", 1)(es => MinHashSignature(es(0), 64, 3))
    one("ngram_hashes", 1)(es => NgramHashes(es(0), 3))
    one("word_ngrams", 1)(es => WordNgrams(es(0), 3, distinct = true))
    one("strip_accents", 1)(es => StripAccents(es(0)))
    one("lucene_match", 2)(es => LuceneMatch(es(0), es(1)))
    one("phrase_hits", 2)(es => PhraseHits(es(0), es(1)))
    one("unicode_normalize", 2)(es => UnicodeNormalize(es(0),
      es(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(s, _)
            if s != null &&
              scala.util.Try(java.text.Normalizer.Form.valueOf(
                s.toString.toUpperCase)).isSuccess =>
          s.toString
        case other => throw new IllegalArgumentException(
          "unicode_normalize form must be a literal NFC/NFD/NFKC/NFKD, " +
            s"got $other")
      }))
    SqlUdfs.register(spark)
    Aggregators.register(spark)
    DremioSurface.register(spark)
  }
}
