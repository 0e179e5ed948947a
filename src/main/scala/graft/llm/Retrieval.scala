package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lexical retrieval over the corpus: Okapi BM25 (Robertson & Zaragoza
  * 2009, "The Probabilistic Relevance Framework"), the standard keyword
  * ranking a training-data pipeline needs next to the vector-ANN path —
  * seed-set expansion ("find more docs like these keywords"), targeted
  * decontamination probes, and the lexical half of hybrid search.
  *
  * The idf is the Lucene variant `ln(1 + (N − df + 0.5)/(df + 0.5))`, which
  * stays positive for terms present in more than half the corpus.
  *
  * Scale: one tokenize pass feeds (doc,term) tf and per-doc length
  * aggregates (both map-side partial); the tiny query-term table
  * broadcast-joins into tf so df counts and scoring touch ONLY rows for
  * query terms; per-doc lengths join on the doc key (plain shuffle join);
  * the 1-row (N, avgdl) totals broadcast; and top-k per query runs through
  * the bounded-heap TopKPerKey operator — no per-query global sort, no
  * driver-side ranking. Scores round to 6dp BEFORE ranking so accumulation
  * order can't flip a cross-engine rank compare (ties break on doc_id).
  */
object Retrieval {

  /** Top-`k` docs per query by BM25. Query terms are deduplicated (the
    * classic unweighted-query form). Zero-token docs can't score. */
  def bm25TopK(docs: DataFrame, queries: Seq[(Int, String)], k: Int = 10,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(col("doc_id"),
      explode(TextAnalysis.tokens(col("text"))).as("w"))
    val tf = toks.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val totals = dl.agg(count(lit(1)).cast("double").as("n"),
      avg(col("dl")).as("avgdl"))
    val q = queries.toDF("q_id", "q_text")
      .select(col("q_id"), explode(TextAnalysis.tokens(col("q_text"))).as("w"))
      .distinct()
    // df counts come from the per-TERM slice (distinct terms — a term
    // shared by two queries must not double its document frequency)
    val qTerms = q.select("w").distinct()
    val tfq = tf.join(broadcast(qTerms), "w") // only query-term rows survive
    val dfT = tfq.groupBy("w").agg(count(lit(1)).as("df"))
    val scored = tfq
      .join(broadcast(q), "w") // fan out per query
      .join(broadcast(dfT), "w")
      .join(dl, "doc_id")
      .crossJoin(broadcast(totals))
      .select(col("q_id"), col("doc_id"),
        (log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))).as("c"))
      .groupBy("q_id", "doc_id")
      .agg(round(sum(col("c")), 6).as("bm25"))
    graft.plans.TopKPerKey(scored, col("q_id"), col("bm25"), col("doc_id"), k)
      .orderBy(col("q_id"), col("bm25").desc, col("doc_id"))
  }
}
