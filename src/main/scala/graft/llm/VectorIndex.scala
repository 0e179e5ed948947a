package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Functions
import graft.sources.SnapshotTable

/** Persisted IVF-SQ8 vector index — the build-once / serve-many ANN path.
  * The in-query ANN operators ([[Similarity.ivfCentroidTopK]] etc.) train
  * their coarse quantizer inside the query; at serving scale that is
  * wrong twice over: the quantizer retrains on every query batch, and the
  * whole corpus rescans. This operator materializes the index as TWO
  * graft-lake tables under one root (the FAISS `IndexIVFScalarQuantizer`
  * layout re-expressed as lake tables, so time travel / OPTIMIZE /
  * VACUUM / privileges all apply to the index like any other table):
  *
  *  - `<dir>/centroids` — (bucket int, centroid array<float>): the coarse
  *    quantizer, tiny (k rows), read whole at search time.
  *  - `<dir>/postings` — (bucket, vec_id, q_min, q_scale, q_codes):
  *    the corpus int8-quantized ([[Similarity.quantizeInt8]], 4× smaller
  *    residency than fp32) and PARTITIONED BY bucket, so a search
  *    touches only its probed buckets' FILES — manifest-pruned before
  *    any parquet footer is opened, independent of corpus size.
  *
  * Search: read centroids (k rows), probe each query's `nProbe` nearest
  * buckets (broadcast expression arithmetic, same tie rules as the
  * in-query IVF paths), statically prune the postings scan to the probed
  * bucket set (a metadata-sized driver list — queries are the small
  * side by definition), score on the dequantized reconstruction
  * (bit-identical doubles in any engine), rank with bounded TopKPerKey
  * heaps. No training, no full-corpus pass, no driver data.
  *
  * At 100 TB: build is one assignment+quantize pass (map-only against
  * broadcast centroids) plus a partitioned write; serve cost is
  * O(probed-partition bytes), the layout every production vector store
  * (FAISS-on-object-store, Milvus segments, Lance) converges on. */
object VectorIndex {

  /** Build (or fully rebuild) the index at `dir`. `centroids` supplies a
    * fixed coarse quantizer (pre-assigned buckets, reproducible builds);
    * otherwise spherical k-means trains on a bounded hash-spread sample
    * ([[Similarity.kmeansCentroids]]).
    * Returns the number of buckets. */
  def build(corpus: DataFrame, dir: String, nClusters: Int = 0,
            kmeansIters: Int = 3,
            centroids: Option[Seq[Seq[Float]]] = None): Int = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents: Seq[Seq[Float]] = centroids.getOrElse {
      val nc = if (nClusters > 0) nClusters
               else Similarity.autoClusters(corpus.count())
      Similarity.kmeansCentroids(corpus, nc, kmeansIters)
    }
    val cdf = cents.zipWithIndex
      .map { case (c, i) => (i, c) }.toDF("bucket", "centroid")
    SnapshotTable.create(spark, s"$dir/centroids", cdf)
    SnapshotTable.forPath(spark, s"$dir/postings")
      .overwritePartitioned(postingsFor(corpus, cents), Seq("identity(bucket)"))
    cents.size
  }

  /** The persisted coarse quantizer, in bucket order (k rows). */
  private def readCentroids(spark: SparkSession, dir: String): Seq[Seq[Float]] =
    SnapshotTable.forPath(spark, s"$dir/centroids").read()
      .orderBy(col("bucket")).collect()
      .map(_.getSeq[Float](1).toSeq).toSeq

  /** SQ8 postings rows (bucket, vec_id, q_min, q_scale, q_codes) for a
    * vector batch, assigned against `cents` — shared by build and the
    * incremental append path. */
  private def postingsFor(vectors: DataFrame,
                          cents: Seq[Seq[Float]]): DataFrame =
    // spread: assignment cosines + int8 quantization are per-row work fused
    // into the scan stage otherwise (the partitioned write's own exchange
    // comes AFTER this projection, so it does not parallelize it)
    Similarity.quantizeInt8(
      Similarity.withProbedBuckets(
        graft.engine.Parallelism.spread(
          vectors.select(col("vec_id"), col("embedding"))),
        "embedding", "vec_id", cents, nProbe = 1))
      .select(col("bucket"), col("vec_id"), col("q_min"), col("q_scale"),
        col("q_codes"))

  /** Incremental maintenance: append a batch of NEW vectors against the
    * PERSISTED quantizer — no retraining, no rewrite of existing
    * postings; the batch lands as one partitioned commit (idempotent
    * under `tag` when non-empty, so a replayed micro-batch is absorbed).
    * Centroids drift as the corpus grows — rebuild with [[build]] when
    * recall decays; serving continues against the old quantizer
    * meanwhile (the FAISS add-vs-train split). Returns the postings
    * commit version. */
  def append(newVectors: DataFrame, dir: String, tag: String = ""): Long = {
    val spark = newVectors.sparkSession
    val cents = readCentroids(spark, dir)
    require(cents.nonEmpty, s"no index at $dir")
    val rows = postingsFor(newVectors, cents)
    val t = SnapshotTable.forPath(spark, s"$dir/postings")
    if (tag.nonEmpty) t.appendTagged(rows, tag, Seq("identity(bucket)"), Nil)
    else t.appendPartitioned(rows, Seq("identity(bucket)"))
  }

  /** Continuous indexing: every micro-batch of `stream` (schema must
    * include `vec_id`, `embedding`) appends to the index under an
    * idempotent per-batch tag — exactly-once postings under checkpoint
    * replay, same contract as the lake sink. */
  def startIndexing(stream: DataFrame, dir: String,
                    checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (data: DataFrame, batchId: Long) =>
        val spark = data.sparkSession
        val qid = org.apache.spark.sql.graft.Bridge.streamingQueryId(spark)
          .getOrElse(checkpointDir)
        val batch = org.apache.spark.sql.graft.Bridge.materializedCopy(data)
        append(batch, dir, s"vecidx:$qid:$batchId")
        ()
      }
      .start()

  // ---------- persisted IVF-PQ (the 64× residency tier) ------------------

  /** Build the PQ variant at `dir`: same `centroids` table, but postings
    * carry m sub-space CODES per vector (bucket, vec_id, codes) — dim·4
    * bytes shrink to m (the FAISS `IndexIVFPQ` persisted layout) — plus a
    * `codebook` table ((block, code) → sub-centroid). Codebook and coarse
    * quantizer train on ONE bounded hash-spread sample; at serve time the
    * codebook is a bounded driver read and scoring is m table lookups per
    * candidate via the codegen'd ADC kernel. */
  def buildPq(corpus: DataFrame, dir: String, nClusters: Int = 0,
              m: Int = 4, ksub: Int = 16, iters: Int = 3,
              centroids: Option[Seq[Seq[Float]]] = None,
              codebook: Option[Seq[Seq[Seq[Float]]]] = None): Int = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // the sample feeds whichever trainer still needs one; fully pinned
    // builds (fixed centroids AND codebook — the reproducible/oracle
    // path) skip the corpus pass entirely
    lazy val sample = Similarity.hashSample(corpus, 1 << 17)
    val cents: Seq[Seq[Float]] = centroids.getOrElse {
      val nc = if (nClusters > 0) nClusters
               else Similarity.autoClusters(corpus.count())
      Similarity.kmeansCentroids(corpus, nc, iters, presampled = Some(sample))
    }
    val cb = codebook.getOrElse(Similarity.pqCodebook(corpus, m, ksub, iters,
      presampled = Some(sample)))
    SnapshotTable.create(spark, s"$dir/centroids",
      cents.zipWithIndex.map { case (c, i) => (i, c) }.toDF("bucket", "centroid"))
    SnapshotTable.create(spark, s"$dir/codebook",
      cb.zipWithIndex.flatMap { case (cents0, b) =>
        cents0.zipWithIndex.map { case (sub, j) => (b, j, sub) }
      }.toDF("block", "code", "sub_centroid"))
    val postings = Similarity.withProbedBuckets(
        graft.engine.Parallelism.spread(
          corpus.select(col("vec_id"), col("embedding"))),
        "embedding", "vec_id", cents, nProbe = 1)
      .select(col("bucket"), col("vec_id"),
        Similarity.pqCodesCol(col("embedding"), cb).as("codes"))
    SnapshotTable.forPath(spark, s"$dir/postings")
      .overwritePartitioned(postings, Seq("identity(bucket)"))
    cents.size
  }

  /** Search a PQ index: ADC scoring against per-query lookup tables —
    * NO reconstruction, no fp32 vectors in the candidate stream; cosine
    * norms come from the codebook's per-centroid squared-norm table via
    * the same ADC kernel (mirrors [[Similarity.ivfPqTopK]], but every
    * trained artifact comes OFF DISK). Output: (q_id, c_id, cos, rk). */
  def searchPq(spark: SparkSession, dir: String, queries: DataFrame,
               k: Int = 10, nProbe: Int = 2): DataFrame = {
    val cents = readCentroids(spark, dir)
    require(cents.nonEmpty, s"no index at $dir")
    val cbRows = SnapshotTable.forPath(spark, s"$dir/codebook").read()
      .orderBy(col("block"), col("code")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2).toSeq))
    val m = cbRows.map(_._1).max + 1
    val cb: Seq[Seq[Seq[Float]]] = (0 until m).map(b =>
      cbRows.filter(_._1 == b).sortBy(_._2).map(_._3).toSeq)
    val normLut = typedLit(cb.map(_.map(_.map(v => v.toDouble * v).sum)))
    // per-query ADC LUT via the PqLut kernel — one plan node instead of
    // m·ksub dot-product subtrees (see Similarity.pqCodesCol)
    val lutCol = Functions.pq_lut(col("embedding"), cb)
    val q = Similarity.withProbedBuckets(
        queries.select(col("vec_id"), col("embedding")),
        "embedding", "vec_id", cents, nProbe)
      .select(col("vec_id").as("q_id"), col("bucket"), lutCol.as("lut"),
        sqrt(Functions.dot_product(col("embedding"), col("embedding"))).as("qnorm"))
    val probed = q.select(col("bucket")).distinct()
      .collect().map(_.getInt(0)).sorted
    val cand = SnapshotTable.forPath(spark, s"$dir/postings").read()
      .filter(col("bucket").isin(probed.map(Integer.valueOf).toSeq: _*))
      .select(col("bucket"), col("vec_id").as("c_id"), col("codes"))
      .withColumn("xnormsq", Functions.pq_adc_dot(col("codes"), normLut))
    val scored = cand.join(broadcast(q), Seq("bucket"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cos",
        when(col("qnorm") === 0.0 || col("xnormsq") <= 0.0, 0.0)
          .otherwise(Functions.pq_adc_dot(col("codes"), col("lut")) /
            (col("qnorm") * sqrt(col("xnormsq")))))
      .select(col("q_id"), col("c_id"), col("cos"))
      .dropDuplicates("q_id", "c_id")
    val top = graft.plans.TopKPerKey(scored, col("q_id"), col("cos"), col("c_id"), k)
    top.withColumn("rk", row_number().over(
      org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))))
  }

  /** Search a persisted index: top-`k` neighbors per query vector by
    * cosine over the dequantized reconstruction. Output:
    * (q_id, c_id, cos, rk). Queries whose id equals a candidate id are
    * excluded (self-match). */
  def search(spark: SparkSession, dir: String, queries: DataFrame,
             k: Int = 10, nProbe: Int = 2): DataFrame = {
    val cents: Seq[Seq[Float]] = readCentroids(spark, dir)
    require(cents.nonEmpty, s"no index at $dir")
    val q = Similarity.withProbedBuckets(
        queries.select(col("vec_id"), col("embedding")),
        "embedding", "vec_id", cents, nProbe)
      .select(col("vec_id").as("q_id"),
        col("embedding").cast("array<double>").as("q_vec"), col("bucket"))
    // the probed bucket set is metadata-sized (≤ |query batch| · nProbe):
    // folding it into a static IN-filter prunes postings FILES at plan time
    val probed = q.select(col("bucket")).distinct()
      .collect().map(_.getInt(0)).sorted
    val cand = SnapshotTable.forPath(spark, s"$dir/postings").read()
      .filter(col("bucket").isin(probed.map(Integer.valueOf).toSeq: _*))
      .select(col("bucket"), col("vec_id").as("c_id"),
        transform(col("q_codes"), c =>
          (c.cast("double") + 128.0) * col("q_scale") + col("q_min"))
          .as("c_vec"))
    val scored = cand.join(broadcast(q), Seq("bucket"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cos", Functions.cosine_sim_d(col("q_vec"), col("c_vec")))
      .select(col("q_id"), col("c_id"), col("cos"))
      .dropDuplicates("q_id", "c_id") // a pair can meet in ≤ nProbe buckets
    val top = graft.plans.TopKPerKey(scored, col("q_id"), col("cos"), col("c_id"), k)
    top.withColumn("rk", row_number().over(
      org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))))
  }
}
