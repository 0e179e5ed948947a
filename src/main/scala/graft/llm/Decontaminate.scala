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
    train.select(col("doc_id"), explode(grams(n)).as("gram"))
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
    val contaminated = train
      .select(col("doc_id"), explode(ngram_hashes(col("text"), n)).as("gram"))
      .join(broadcast(evalGrams), Seq("gram"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .select(col("doc_id"))
    train.join(contaminated, Seq("doc_id"), "left_anti")
  }
}
