package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bitext mining — margin-based parallel-text retrieval over two embedding
  * collections (Artetxe & Schwenk 2019, arXiv:1811.01136 §3.2 "ratio"
  * margin — the LASER / CCMatrix mining pipeline): raw cosine
  * over-retrieves hub vectors, so a candidate pair (x, y) scores its
  * cosine NORMALIZED by the mean similarity of both sides' top-k
  * neighborhoods,
  *
  *   margin(x, y) = cos(x, y) / ((avgF(x) + avgB(y)) / 2)
  *
  * and a pair is emitted when the forward top-1 by margin clears the
  * threshold (≈1.05-1.06 in the published pipelines).
  *
  * Scale shape: each direction is ONE corpus pass with the query side
  * broadcast and bounded per-key heaps (TopKPerKey) — no corpus×corpus
  * product; at corpus×corpus scale callers pre-bucket both sides (IVF /
  * SRP-LSH, as [[Dedup.semDedup]] does) and mine per bucket, with this
  * operator as the scoring kernel.
  *
  * Determinism / oracle: with `doublePrec` every cosine is an in-order
  * double fold, the neighborhood means fold the top-k cosines in SORTED
  * (descending) order — `sum(double)` over an unordered group is
  * partition-dependent in the last ulp, which a ratio then amplifies
  * across a threshold — and the margin is a ratio of those exact values,
  * so an external engine replays ids, cosines AND margins bit-for-bit. */
object Bitext {

  /** Mined pairs (src_id, tgt_id, cos, margin), forward top-1 per source
    * vector, margin ≥ `threshold`. Ids must be numeric and the two
    * collections' id spaces disjoint (callers offset one side). */
  def minePairs(src: DataFrame, tgt: DataFrame, k: Int = 4,
                threshold: Double = 1.05,
                doublePrec: Boolean = false): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")

    def cosC(a: Column, b: Column): Column =
      if (doublePrec)
        graft.functions.Functions.cosine_sim_d(
          a.cast("array<double>"), b.cast("array<double>"))
      else graft.functions.Functions.cosine_sim(a, b)

    def topkDir(queries: DataFrame, corpus: DataFrame): DataFrame = {
      val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val c = corpus.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
      val scored = c.crossJoin(broadcast(q))
        .withColumn("cos", cosC(col("q_vec"), col("c_vec")))
        .select(col("q_id"), col("c_id"), col("cos"))
      graft.plans.TopKPerKey(scored, col("q_id"), col("cos"), col("c_id"), k)
    }

    val fwd = topkDir(src, tgt) // (q_id = src, c_id = tgt, cos)
    val bwd = topkDir(tgt, src) // (q_id = tgt, c_id = src, cos)
    marginRank(fwd, bwd, k, threshold)
  }

  /** Bucketed mining — the corpus×corpus SCALE path: both sides assign to
    * coarse-quantizer buckets ([[Similarity.withProbedBuckets]] — the
    * semDedup clustering treatment), the source side probes `nProbe`
    * buckets for recall, and candidate pairs come from a bucket EQUI-JOIN
    * (never a cross product). The margin then scores each side against
    * its top-k within the probed candidates — the standard mined-locally
    * approximation (FAISS-backed LASER mining shards exactly this way).
    * `centroids` pins the quantizer for external replay, as everywhere. */
  def minePairsBucketed(src: DataFrame, tgt: DataFrame, k: Int = 4,
                        threshold: Double = 1.05, nClusters: Int = 0,
                        nProbe: Int = 2, iters: Int = 3,
                        centroids: Option[Seq[Seq[Float]]] = None,
                        doublePrec: Boolean = false): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val cents = centroids.getOrElse {
      val nc = if (nClusters > 0) nClusters
               else Similarity.autoClusters(src.count() + tgt.count())
      Similarity.kmeansCentroids(src.unionByName(tgt), nc, iters)
    }
    def cosC(a: Column, b: Column): Column =
      if (doublePrec)
        graft.functions.Functions.cosine_sim_d(
          a.cast("array<double>"), b.cast("array<double>"))
      else graft.functions.Functions.cosine_sim(a, b)
    // src probes nProbe buckets (the recall side); each tgt lives in its
    // ONE argmax bucket, so a pair can meet at most once — no dedup pass
    val sp = Similarity.withProbedBuckets(
        src.select(col("vec_id"), col("embedding")),
        "embedding", "vec_id", cents, nProbe, doublePrec = doublePrec)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"), col("bucket"))
    val tp = Similarity.withProbedBuckets(
        tgt.select(col("vec_id"), col("embedding")),
        "embedding", "vec_id", cents, nProbe = 1, doublePrec = doublePrec)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"), col("bucket"))
    val pairs = sp.join(tp, "bucket")
      .withColumn("cos", cosC(col("q_vec"), col("c_vec")))
      .select(col("q_id"), col("c_id"), col("cos"))
    // forward/backward neighborhoods over the SAME probed candidate set
    val fwd = graft.plans.TopKPerKey(pairs, col("q_id"), col("cos"), col("c_id"), k)
    val bwd = graft.plans.TopKPerKey(pairs, col("c_id"), col("cos"), col("q_id"), k)
      .select(col("c_id").as("q_id"), col("q_id").as("c_id"), col("cos"))
    marginRank(fwd, bwd, k, threshold, broadcastAvgB = false)
  }

  /** The margin kernel over pre-retrieved directional top-k sets:
    * neighborhood means fold the DESC-sorted cosines (deterministic under
    * any partitioning, replayable by list_sort + list_reduce), margins
    * divide by the two-sided mean, forward top-1 thresholds.
    *
    * `broadcastAvgB`: avgB has one row per DISTINCT target in any
    * candidate pair — bounded by the query side on the [[minePairs]]
    * path (whose contract already broadcasts that side), but CORPUS
    * cardinality on the [[minePairsBucketed]] corpus×corpus path. There
    * a broadcast would collect a corpus-sized table to the driver, so
    * the bucketed path joins it with a shuffled hash join instead: fwd
    * is |src|·k rows — one cheap exchange on c_id. */
  private def marginRank(fwd: DataFrame, bwd: DataFrame,
                         k: Int, threshold: Double,
                         broadcastAvgB: Boolean = true): DataFrame = {
    def neighborhoodMean(topk: DataFrame, avgName: String): DataFrame =
      topk.groupBy(col("q_id")).agg(
        (aggregate(sort_array(collect_list(col("cos")), asc = false),
          lit(0.0), (acc, x) => acc + x) / count(lit(1))).as(avgName))
    val avgF = neighborhoodMean(fwd, "avg_f")
    val avgB = neighborhoodMean(bwd, "avg_b").withColumnRenamed("q_id", "c_id")
    val avgBSide = if (broadcastAvgB) broadcast(avgB) else avgB.hint("shuffle_hash")
    val margined = fwd
      .join(avgF, "q_id")
      .join(avgBSide, "c_id")
      .withColumn("margin", col("cos") / ((col("avg_f") + col("avg_b")) / lit(2.0)))
    graft.plans.TopKPerKey(margined, col("q_id"), col("margin"), col("c_id"), 1)
      .filter(col("margin") >= threshold)
      .select(col("q_id").as("src_id"), col("c_id").as("tgt_id"),
        col("cos"), col("margin"))
  }
}
