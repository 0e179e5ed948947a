package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: drop training documents that share word
  * n-grams with an evaluation/benchmark set — the standard pre-training
  * hygiene step (cf. GPT-3/PaLM appendix decontamination: 8-13-gram
  * overlap; the fixture uses 3-grams so short synthetic docs can overlap).
  *
  * Scale design: the eval set is small (benchmarks are thousands of docs,
  * not billions), so its distinct gram set is broadcast; the training side
  * is a map-side explode feeding a broadcast hash semi-join — the corpus
  * is read ONCE, never shuffled by gram. Only matching (doc, gram) pairs
  * shuffle (by doc_id, partial-aggregated map-side) to count overlap per
  * document. Grams are kept as raw strings for oracle bit-exactness; at
  * 100 TB you'd hash them to 8 bytes before the join (xxhash64) — same
  * plan shape, ~10× narrower shuffle, collision odds ~n²/2⁶⁴.
  */
object Decontaminate {

  /** Distinct word n-grams of `text` (whole doc as one gram when shorter
    * than n tokens — same convention as the Jaccard dedup family). Native
    * tokenize-once expression: the declarative transform/element_at form
    * re-tokenizes per gram position, O(tokens²) per doc
    * (`functions.WordNgrams` scaladoc). */
  private[llm] def grams(n: Int): Column =
    graft.functions.Functions.word_ngrams(col("text"), n)

  /** Per-training-doc count of distinct n-grams shared with the eval set.
    * Docs sharing nothing are absent from the result. */
  def overlapCounts(train: DataFrame, evalSet: DataFrame, n: Int = 3): DataFrame = {
    val evalGrams = evalSet.select(explode(grams(n)).as("gram")).distinct()
    // spread: the gram explode over the training corpus is scan-fused map
    // work; shared-gram counts are integers — order-independent
    graft.engine.Parallelism.spread(train)
      .select(col("doc_id"), explode(grams(n)).as("gram"))
      .join(broadcast(evalGrams), Seq("gram"))
      // grams are distinct per doc, so count(*) == count(distinct gram)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
  }

  /** Training docs with fewer than `minShared` distinct n-grams in common
    * with the eval set (anti-join on the contaminated id set). */
  def clean(train: DataFrame, evalSet: DataFrame, n: Int = 3,
            minShared: Long = 1): DataFrame = {
    val contaminated = overlapCounts(train, evalSet, n)
      .filter(col("n_shared") >= minShared)
      .select(col("doc_id"))
    train.join(contaminated, Seq("doc_id"), "left_anti")
  }

  /** The 100 TB variant promised by the scaladoc above: grams are hashed
    * to 8-byte xxhash64 keys via the sorted-distinct `NgramHashes`
    * expression before the broadcast probe — ~10× narrower rows through
    * the join and a fixed-width broadcast set; collision odds are
    * ~|eval grams|·|train grams|/2⁶⁴. Same plan shape as [[clean]]
    * (broadcast eval set, corpus read once, only matches shuffle);
    * `DecontaminateSpec` pins result equality against the string-gram
    * path on the fixture. */
  def cleanHashed(train: DataFrame, evalSet: DataFrame, n: Int = 3,
                  minShared: Long = 1): DataFrame = {
    import graft.functions.Functions.ngram_hashes
    val evalGrams = evalSet
      .select(explode(ngram_hashes(col("text"), n)).as("gram")).distinct()
    val contaminated = graft.engine.Parallelism.spread(train)
      .select(col("doc_id"), explode(ngram_hashes(col("text"), n)).as("gram"))
      .join(broadcast(evalGrams), Seq("gram"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .select(col("doc_id"))
    train.join(contaminated, Seq("doc_id"), "left_anti")
  }

  /** Semantic (embedding-level) decontamination — the THIRD modality next
    * to n-gram overlap and URL identity: a training document whose
    * embedding sits within `threshold` cosine of an eval/benchmark
    * embedding is flagged even when a paraphrase or light rewrite leaves
    * no shared n-grams (the leakage n-gram decontamination provably
    * misses).
    *
    * Scale shape: eval embeddings are benchmark-sized (thousands), so the
    * eval side BROADCASTS; candidate generation goes through the shared
    * coarse-quantizer bucketing ([[Similarity.withProbedBuckets]]) — each
    * corpus vector compares only against eval vectors probing its bucket,
    * never all-pairs, and the corpus is read once with no shuffle (the
    * join key arrives broadcast). Probing `nProbe` buckets on the EVAL
    * side (not the corpus side, which stays single-assignment map-rate)
    * is the standard IVF recall lever for pairs straddling a bucket
    * boundary. With a SUPPLIED centroid set the whole pipeline computes
    * in double precision ([[Similarity.withProbedBuckets]] doublePrec) —
    * assignment, probing and scoring replay bit-exactly in an external
    * engine, the same oracle contract as [[Dedup.semDedup]].
    *
    * Returns flagged pairs (vec_id, eval_id, cos) — every corpus/eval
    * pair at or above the threshold that met in a probed bucket. */
  def semanticMatches(corpus: DataFrame, evalSet: DataFrame,
                      centroids: Seq[Seq[Float]], threshold: Double,
                      nProbe: Int = 2): DataFrame = {
    // NOT spread: the per-row work here is a handful of centroid cosines
    // (benchmark-sized quantizers) — bench A/B showed the exchange costs
    // more than the parallel assignment saves
    val c = Similarity.withProbedBuckets(
        corpus.select(col("vec_id"), col("embedding")),
        "embedding", "vec_id", centroids, nProbe = 1, doublePrec = true)
      .select(col("vec_id"), col("embedding").as("c_vec"), col("bucket"))
    val e = Similarity.withProbedBuckets(
        evalSet.select(col("vec_id").as("eval_id"), col("embedding")),
        "embedding", "eval_id", centroids, nProbe, doublePrec = true)
      .select(col("eval_id"), col("embedding").as("e_vec"), col("bucket"))
    c.join(broadcast(e), Seq("bucket"))
      .withColumn("cos", graft.functions.Functions.cosine_sim_d(
        col("c_vec").cast("array<double>"), col("e_vec").cast("array<double>")))
      .filter(col("cos") >= threshold)
      .select(col("vec_id"), col("eval_id"), col("cos"))
      .dropDuplicates("vec_id", "eval_id") // a pair can meet in ≤ nProbe buckets
  }

  /** Training set with semantically contaminated documents dropped
    * (anti-join on the flagged id set). */
  def semanticClean(corpus: DataFrame, evalSet: DataFrame,
                    centroids: Seq[Seq[Float]], threshold: Double,
                    nProbe: Int = 2): DataFrame =
    corpus.join(
      semanticMatches(corpus, evalSet, centroids, threshold, nProbe)
        .select(col("vec_id")).distinct(),
      Seq("vec_id"), "left_anti")
}
