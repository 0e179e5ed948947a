package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus topic clustering: k-means over embeddings + a distinctive-term
  * summary per cluster — the "what is IN this 100 TB corpus" map that
  * drives mixture decisions (upsample code, downsample boilerplate) and
  * the cluster-level curation recipes (SemDeDup prunes within these same
  * clusters; DoReMi-style reweighting consumes exactly this table).
  *
  * Composition of existing scale-shaped pieces, no new distributed
  * machinery: the spherical k-means coarse quantizer
  * ([[Similarity.kmeansCentroids]] — bounded-sample training, broadcast
  * centroid assignment), distinct-term explode with two-phase counts, an
  * idf join (term document-frequency computed on the SAME pass's
  * output), and the bounded-heap TopKPerKey operator for the per-cluster
  * term ranking — no window sort, no driver-side text.
  */
object Clustering {

  /** One row per cluster: (cluster, n_docs, top_terms) where top_terms
    * are the `topTerms` highest tf-idf tokens (count in cluster ×
    * ln(N/df), df = docs containing the term corpus-wide). `docs` needs
    * (idCol, textCol, vecCol). `k <= 0` self-scales like SemDeDup.
    *
    * `centroids`: a SUPPLIED quantizer set replaces k-means training —
    * the oracle-able path ([[Dedup.semDedup]] contract): assignment runs
    * in double precision and every downstream number (sizes, tf-idf
    * scores, term ranking) is a pure replayable function of the data,
    * with term ties broken lexicographically (dialect-free). The trained
    * path keeps the bounded-heap ranking with a hashed tie. */
  def documentClusters(docs: DataFrame, k: Int = 0, topTerms: Int = 5,
                       idCol: String = "doc_id", textCol: String = "text",
                       vecCol: String = "embedding",
                       kmeansIters: Int = 3,
                       centroids: Option[Seq[Seq[Float]]] = None): DataFrame = {
    // NOT spread: the per-row assignment is a handful of centroid cosines
    // and the term explode feeds integer-count aggregates — bench A/B
    // showed the exchange costs more than the parallel map saves
    val corpus = docs.select(col(idCol).as("vec_id"), col(vecCol).as("embedding"),
      col(textCol).as("text"))
    val n = corpus.count()
    val cents = centroids.getOrElse {
      val nc = if (k > 0) k else Similarity.autoClusters(n)
      Similarity.kmeansCentroids(
        corpus.select(col("vec_id"), col("embedding")), nc, kmeansIters)
    }
    val assigned = Similarity.withProbedBuckets(
        corpus, "embedding", "vec_id", cents, nProbe = 1,
        doublePrec = centroids.isDefined)
      .select(col("vec_id"), col("bucket"), col("text"))
      .localCheckpoint(true) // sizes + terms + ranking all reuse this

    val sizes = assigned.groupBy(col("bucket")).agg(count(lit(1)).as("n_docs"))

    // distinct terms per doc (presence, not raw counts — tf-idf over
    // document frequency is robust to one spammy doc), two-phase combine
    val docTerms = assigned.select(col("bucket"),
      explode(array_distinct(TextAnalysis.tokens(col("text")))).as("term"))
    val perCluster = docTerms.groupBy(col("bucket"), col("term"))
      .agg(count(lit(1)).as("cnt"))
    val dfTerm = perCluster.groupBy(col("term")).agg(sum(col("cnt")).as("df"))
    val scored = perCluster.join(dfTerm, Seq("term"))
      .withColumn("score", col("cnt") * log(lit(n.toDouble) / col("df")))

    // Trained path: bounded-heap TopKPerKey (no per-bucket sort), hashed
    // numeric tie — deterministic within this engine. Fixed-centroid path:
    // rank with (score desc, term asc) — ties break on the term ITSELF so
    // any engine with binary string ordering replays the selection; the
    // per-bucket window sort is fine there because the oracle-able path
    // is about replayability, not the 100 TB ranking shape.
    val top =
      if (centroids.isDefined)
        scored.withColumn("__rk", org.apache.spark.sql.functions.row_number()
            .over(org.apache.spark.sql.expressions.Window
              .partitionBy(col("bucket"))
              .orderBy(col("score").desc, col("term"))))
          .filter(col("__rk") <= topTerms)
          .select(col("bucket"), col("term"), col("score"))
      else graft.plans.TopKPerKey(scored,
          col("bucket"), col("score"), xxhash64(col("term")), k = topTerms)
        .select(col("bucket"), col("term"), col("score"))
    val topAgg = top.groupBy(col("bucket"))
      .agg(transform(
        array_sort(collect_list(struct((-col("score")).as("nscore"), col("term")))),
        e => e("term")).as("top_terms"))

    sizes.join(topAgg, Seq("bucket"), "left")
      .select(col("bucket").as("cluster"), col("n_docs"), col("top_terms"))
  }
}
