package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.SnapshotTable

/** Persisted BM25 inverted index — build-once / serve-many lexical
  * retrieval, the text analog of [[VectorIndex]] (the FAISS-style
  * build/serve split re-expressed as graft-lake tables, so time travel,
  * OPTIMIZE, VACUUM and privileges all apply to the index for free).
  *
  * Layout at `dir`:
  *   - `postings`: (bucket, w, doc_id, tf, dl) PARTITIONED BY
  *     identity(bucket) where bucket = xxhash64(term) mod nBuckets and
  *     `dl` is DENORMALIZED into every posting (the classic impact-file
  *     trick) so serving never joins a per-doc length table;
  *   - `stats`: ONE row (n_docs, avgdl, n_buckets) — the corpus constants
  *     BM25 needs.
  *
  * Serve shape at 100 TB: the query's terms hash to a handful of
  * buckets; that bounded bucket set folds into a static IN-filter, so
  * the postings scan is PARTITION/manifest-pruned to the probed FILES
  * before any footer opens — cost O(query-term postings), independent of
  * corpus size ([[Retrieval.bm25TopK]] by contrast tokenizes the whole
  * corpus per query batch). df counts come exactly from the pruned slice
  * (every posting of a term lives in its one bucket). Scoring follows
  * bm25TopK to the letter — Lucene idf, 6dp rounding BEFORE ranking,
  * bounded TopKPerKey heaps, doc_id tie-break — so a serve from disk is
  * rank-identical to the in-memory operator.
  *
  * Incremental `append` indexes new docs against the SAME bucket count;
  * the build-time stats row keeps serving (N/avgdl drift slightly until
  * a rebuild — the same static-stats contract as VectorIndex's
  * add-vs-train split; rebuild when drift matters). */
object TextIndex {

  /** Build (or fully rebuild) the index at `dir`. Returns n_docs. */
  def build(corpus: DataFrame, dir: String, nBuckets: Int = 64): Long = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // spread evaluated AGAIN with the r17 sized fan-out and REVERTED again
    // (see Retrieval.bm25TopK — the exchange would carry the raw text
    // column, costing more than the distributed tokenize saves)
    val toks = corpus.select(col("doc_id"),
      explode(TextAnalysis.tokens(col("text"))).as("w"))
    val tf = toks.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    // dl from tf, not a second tokenize pass: Σ_w tf(doc, w) IS the doc's
    // token count (zero-token docs have no tf rows, same as the old
    // toks-based dl), and tf is orders of magnitude smaller than the raw
    // token stream. dl is NOT cached: tf's post-aggregate exchange feeds
    // both the join's tf side and the dl aggregate inside ONE plan
    // (exchange/stage reuse), so the corpus is tokenized exactly once —
    // the r16 `dl.cache()` looked free but its cache FILL ran a second
    // independent tokenize→tf pipeline concurrently with the join's
    // (profile: two ~0.5 s single-task jobs), which was the whole cost of
    // a second corpus pass at any scale.
    val dl = tf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
    val postings = tf.join(dl, "doc_id")
      .select(pmod(xxhash64(col("w")), lit(nBuckets.toLong)).cast("int").as("bucket"),
        col("w"), col("doc_id"), col("tf"), col("dl"))
    val t = SnapshotTable.forPath(spark, s"$dir/postings")
    t.overwritePartitioned(postings, Seq("identity(bucket)"))
    // Corpus constants from the JUST-WRITTEN postings (dl is denormalized
    // into every row): a 2-column columnar re-scan + doc-keyed partial
    // aggregate, instead of re-deriving dl from the raw corpus. max(dl)
    // is deterministic and per-doc constant; avg sums the same long
    // multiset either way. Zero-token docs have no postings, matching the
    // old n_docs. Empty corpus: avg() is null → 0.0 (r16 ADVICE guard).
    val statsRow = t.read().select(col("doc_id"), col("dl"))
      .groupBy("doc_id").agg(max(col("dl")).as("dl"))
      .agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl")).head()
    val nDocs = statsRow.getLong(0)
    val avgdl = if (statsRow.isNullAt(1)) 0.0 else statsRow.getDouble(1)
    val stats = Seq((nDocs, avgdl, nBuckets))
      .toDF("n_docs", "avgdl", "n_buckets")
    SnapshotTable.forPath(spark, s"$dir/stats").overwrite(stats)
    nDocs
  }

  /** Incremental maintenance: index NEW docs against the persisted bucket
    * count as one partitioned commit (idempotent under `tag`). Serving
    * keeps the build-time (n_docs, avgdl) until the next [[build]]. */
  def append(newDocs: DataFrame, dir: String, tag: String = ""): Long = {
    val spark = newDocs.sparkSession
    val nBuckets = SnapshotTable.forPath(spark, s"$dir/stats").read()
      .head().getInt(2)
    val toks = newDocs.select(col("doc_id"),
      explode(TextAnalysis.tokens(col("text"))).as("w"))
    val tf = toks.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
    val postings = tf.join(dl, "doc_id")
      .select(pmod(xxhash64(col("w")), lit(nBuckets.toLong)).cast("int").as("bucket"),
        col("w"), col("doc_id"), col("tf"), col("dl"))
    val t = SnapshotTable.forPath(spark, s"$dir/postings")
    if (tag.nonEmpty) t.appendTagged(postings, tag, Seq("identity(bucket)"), Nil)
    else t.appendPartitioned(postings, Seq("identity(bucket)"))
  }

  /** Top-`k` docs per query by BM25, served entirely from the on-disk
    * index. Output (q_id, doc_id, bm25, rk) — rank-identical to
    * [[Retrieval.bm25TopK]] over the same corpus. */
  def search(spark: SparkSession, dir: String, queries: Seq[(Int, String)],
             k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import spark.implicits._
    val statsRow = SnapshotTable.forPath(spark, s"$dir/stats").read().head()
    val (n, avgdl, nBuckets) =
      (statsRow.getLong(0).toDouble, statsRow.getDouble(1), statsRow.getInt(2))
    val q = queries.toDF("q_id", "q_text")
      .select(col("q_id"), explode(TextAnalysis.tokens(col("q_text"))).as("w"))
      .distinct()
    // the query's bucket set is metadata-sized (≤ #query terms): folding
    // it into a static IN-filter prunes postings PARTITIONS at plan time
    val probed = q.select(
        pmod(xxhash64(col("w")), lit(nBuckets.toLong)).cast("int").as("bucket"))
      .distinct().collect().map(_.getInt(0)).sorted
    val qTerms = q.select("w").distinct()
    val slice = SnapshotTable.forPath(spark, s"$dir/postings").read()
      .filter(col("bucket").isin(probed.map(Integer.valueOf).toSeq: _*))
      .join(broadcast(qTerms), "w") // only the query terms' postings
    val dfT = slice.groupBy("w").agg(count(lit(1)).as("df"))
    val scored = slice
      .join(broadcast(q), "w")
      .join(broadcast(dfT), "w")
      .select(col("q_id"), col("doc_id"),
        (log(lit(1.0) + (lit(n) - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl)))).as("c"))
      .groupBy("q_id", "doc_id")
      .agg(round(sum(col("c")), 6).as("bm25"))
    val top = graft.plans.TopKPerKey(scored, col("q_id"), col("bm25"), col("doc_id"), k)
    top.withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("q_id")).orderBy(col("bm25").desc, col("doc_id"))))
      .orderBy(col("q_id"), col("bm25").desc, col("doc_id"))
  }
}
