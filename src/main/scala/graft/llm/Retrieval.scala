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
    // spread evaluated AGAIN with the r17 sized fan-out and REVERTED again
    // (A/B: 32-core med 1.21 vs 1.19, 8-core 1.37 vs 1.23 — ON loses):
    // unlike the md5-heavy paths, the exchange here must carry the raw
    // TEXT column, which costs more than distributing the tokenize saves;
    // the un-spread plan ships only tf pairs (guide §2.3, shuffle fewer
    // bytes).
    val toks = docs.select(col("doc_id"),
      explode(TextAnalysis.tokens(col("text"))).as("w"))
    val tf = toks.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    // dl from tf (Σ_w tf IS the token count): one corpus tokenization
    // instead of two, and the dl aggregate shuffles vocabulary-sized rows
    // instead of the raw token stream
    val dl = tf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
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

  /** BM25 candidates with their per-query rank (1-based; ties break on
    * doc_id — the same deterministic convention the ANN family uses). */
  private def bm25Ranked(docs: DataFrame, queries: Seq[(Int, String)],
                         poolK: Int, k1: Double, b: Double): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("bm25").desc, col("doc_id"))
    bm25TopK(docs, queries, poolK, k1, b)
      .withColumn("lex_rk", row_number().over(w))
      .select(col("q_id"), col("doc_id"), col("lex_rk"))
  }

  /** Dense candidates: cosine top-`poolK` of each seed document's
    * embedding over the corpus (vec_id ≡ doc_id), ranked. */
  private def denseRanked(embeddings: DataFrame, queryIds: Seq[Int],
                          poolK: Int): DataFrame =
    Similarity.bruteForceTopK(
        embeddings, embeddings.filter(col("vec_id").isin(queryIds.map(_.toLong): _*)),
        poolK)
      .select(col("q_id").cast("int").as("q_id"), col("c_id").as("doc_id"),
        col("rk").as("dense_rk"))

  /** Hybrid retrieval by reciprocal-rank fusion (Cormack, Clarke &
    * Buettcher 2009): fuse the lexical (BM25) and dense (cosine) candidate
    * lists of each seed query as Σ 1/(kRrf + rank), the standard first
    * stage of a modern retrieval stack (seed-set expansion over a training
    * corpus: "more docs like these", robust to either ranker's blind
    * spots). A doc absent from one list contributes 0 from it.
    *
    * Scale: both candidate pools are already bounded (TopKPerKey heaps, no
    * global sort), so the fusion join touches O(|queries| · poolK) rows —
    * independent of corpus size; ranking is by the UNROUNDED fused score
    * (bit-identical across engines — it is built from integer ranks), the
    * reported score rounds to 6dp. */
  def hybridRrfTopK(docs: DataFrame, embeddings: DataFrame,
                    queries: Seq[(Int, String)], k: Int = 10, poolK: Int = 50,
                    kRrf: Int = 60, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val lex = bm25Ranked(docs, queries, poolK, k1, b)
    val dense = denseRanked(embeddings, queries.map(_._1), poolK)
    val fused = lex.join(dense, Seq("q_id", "doc_id"), "full_outer")
      .withColumn("rrf_raw",
        coalesce(lit(1.0) / (lit(kRrf) + col("lex_rk")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(kRrf) + col("dense_rk")), lit(0.0)))
    graft.plans.TopKPerKey(fused, col("q_id"), col("rrf_raw"), col("doc_id"), k)
      .select(col("q_id"), col("doc_id"), col("lex_rk"), col("dense_rk"),
        round(col("rrf_raw"), 6).as("rrf"), col("rrf_raw"))
      .orderBy(col("q_id"), col("rrf_raw").desc, col("doc_id"))
      .drop("rrf_raw")
  }

  /** Maximal-Marginal-Relevance diversified re-ranking (Carbonell &
    * Goldstein 1998): greedily pick `k` of each query's candidates,
    * maximizing `λ·rel(q,d) − (1−λ)·max_{s∈chosen} cos(d,s)` — the
    * standard redundancy-pruning stage between retrieval and a context
    * window, and the per-query form of diversity selection for training
    * batches (don't feed the model five near-copies of one document).
    *
    * Scale: the first stage (any retriever — exact cosine here; IVF/PQ
    * swap in) bounds each query's pool to `poolK`, so the greedy is
    * O(poolK²) per query, distributed one task per query through a typed
    * mapGroups — corpus size never enters the selection, and nothing
    * reaches the driver. Scores round to 6dp BEFORE each argmax (ties
    * break on c_id) so cross-engine float-accumulation divergence (~1e-8)
    * can't flip a pick; fixture winner-vs-runner-up margins are ≥5.6e-4. */
  def mmrDiversify(embeddings: DataFrame, queryIds: Seq[Int], k: Int = 8,
                   poolK: Int = 20, lambda: Double = 0.7): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val cands = Similarity.bruteForceTopK(
        embeddings,
        embeddings.filter(col("vec_id").isin(queryIds.map(_.toLong): _*)), poolK)
      .select(col("q_id"), col("c_id"), col("cos").as("rel"), col("rk"))
    val pool = cands.join(
        embeddings.select(col("vec_id").as("c_id"), col("embedding")), "c_id")
      .select(col("q_id"), col("c_id"), col("rel"), col("rk"), col("embedding"))
      .as[(Long, Long, Double, Int, Array[Float])]
    pool.groupByKey(_._1)
      .flatMapGroups { (qid: Long, it: Iterator[(Long, Long, Double, Int, Array[Float])]) =>
        val cs = it.toArray.sortBy(_._4) // first-stage rank order
        val vecs = cs.map(_._5.map(_.toDouble))
        val n = cs.length
        def cos(a: Array[Double], b: Array[Double]): Double = {
          var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
          while (i < a.length) {
            dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
          }
          dot / (math.sqrt(na) * math.sqrt(nb))
        }
        // round half-away-from-zero at 6dp — Spark's and DuckDB's round()
        def r6(x: Double): Double =
          BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        val taken = Array.fill(n)(false)
        val out = Seq.newBuilder[(Long, Long, Int)]
        if (n > 0) {
          taken(0) = true // rk=1 IS argmax(rel desc, c_id) — the first pick
          out += ((qid, cs(0)._2, 1))
          val chosen = scala.collection.mutable.ArrayBuffer(0)
          var step = 2
          while (step <= math.min(k, n)) {
            var bestIdx = -1; var bestScore = Double.NegativeInfinity
            var bestId = Long.MaxValue
            var i = 0
            while (i < n) {
              if (!taken(i)) {
                var ms = Double.NegativeInfinity
                chosen.foreach { j =>
                  val s = cos(vecs(i), vecs(j)); if (s > ms) ms = s
                }
                val score = r6(lambda * cs(i)._3 - (1.0 - lambda) * ms)
                if (score > bestScore ||
                    (score == bestScore && cs(i)._2 < bestId)) {
                  bestIdx = i; bestScore = score; bestId = cs(i)._2
                }
              }
              i += 1
            }
            taken(bestIdx) = true
            chosen += bestIdx
            out += ((qid, cs(bestIdx)._2, step))
            step += 1
          }
        }
        out.result()
      }
      .toDF("q_id", "c_id", "rk")
  }

  /** DPR-style hard-negative mining (Karpukhin et al. 2020): for each seed
    * query, the top lexically-retrieved docs the DENSE ranker does NOT
    * place in its own candidate pool — lexically plausible but semantically
    * far, the highest-value negatives for training a retriever. Anti-join
    * of two already-bounded candidate lists: O(|queries| · poolK). */
  def hardNegatives(docs: DataFrame, embeddings: DataFrame,
                    queries: Seq[(Int, String)], k: Int = 10,
                    poolK: Int = 50): DataFrame = {
    val lex = bm25Ranked(docs, queries, poolK, k1 = 1.2, b = 0.75)
    val dense = denseRanked(embeddings, queries.map(_._1), poolK)
    val neg = lex.join(dense, Seq("q_id", "doc_id"), "left_anti")
    graft.plans.TopKPerKey(neg, col("q_id"), -col("lex_rk"), col("doc_id"), k)
      .orderBy(col("q_id"), col("lex_rk"), col("doc_id"))
  }
}
