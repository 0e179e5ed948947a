package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Functions

/** Approximate-nearest-neighbor search over embedding columns.
  *
  * Baseline: brute-force cosine top-k (exact, O(Q·N) — the codegen'd
  * CosineSimilarity expression keeps the inner loop fused). Scale path: IVF
  * partitioning — restrict each query to its coarse bucket(s), turning the
  * cross join into a bucket-local join; with C clusters the scan shrinks by
  * ~C× at the cost of recall on boundary vectors.
  */
object Similarity {

  /** Exact brute-force top-k neighbors for each query vector.
    * The query set is broadcast (small side); the corpus streams —
    * at 100 TB this is one pass over the corpus per batch of queries. */
  /** Shared ranking tail for the ANN family: bounded-heap top-k per q_id
    * through the custom TopKPerKey operator (O(n log k) instead of the
    * windowed row_number's full per-key sort) plus a deterministic rank
    * column (cos desc, c_id asc) — one tie-break convention, one
    * implementation, appended to whatever columns `scored` carries. */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val top = graft.plans.TopKPerKey(scored, col("q_id"), col("cos"), col("c_id"), k)
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    top.withColumn("rk", row_number().over(w))
  }

  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val c = corpus.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cos", Functions.cosine_sim(col("q_vec"), col("c_vec")))
      .select(col("q_id"), col("c_id"), col("cos"))
    rankTopK(scored, k)
  }

  /** ANN over int8-quantized vectors — the IVF-SQ8 *scoring* path: score
    * neighbors on the dequantized reconstruction instead of the fp32
    * original (4× less memory/shuffle for the corpus residency). Cosine
    * runs in pure double arithmetic over the reconstructed values, which
    * are bit-identical in any engine ([[quantizeInt8]]), so the neighbor
    * ids/ranks carry a DuckDB oracle: adjacent-rank cosine gaps on the
    * quantized fixture are ≥5.5e-5, three orders above cross-engine
    * float-accumulation divergence (~1e-13). Same plan shape as
    * [[bruteForceTopK]]: broadcast query batch, one corpus pass, bounded
    * per-key heaps. */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10): DataFrame = {
    // one-pass native reconstruct: the declarative quantize→dequantize
    // chain collapses into a projection that re-evaluates array_min/max
    // inside the per-element lambda — O(dim²) interpreted work per row
    // (DequantizeInt8 scaladoc); outputs are bit-identical
    def deq(df: DataFrame, idAs: String, vecAs: String): DataFrame =
      df.select(col("vec_id").as(idAs),
        Functions.dequantize_int8(col("embedding")).as(vecAs))
    val q = deq(queries, "q_id", "q_vec")
    val c = deq(corpus, "c_id", "c_vec")
    // codegen'd double-precision cosine: same left-fold accumulation order
    // as the declarative aggregate/zip_with form (bit-identical results),
    // but fused into whole-stage codegen instead of interpreted
    // CodegenFallback lambdas (~50µs/pair -> sub-µs)
    val scored = c.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cos", Functions.cosine_sim_d(col("q_vec"), col("c_vec")))
      .select(col("q_id"), col("c_id"), col("cos"))
    rankTopK(scored, k)
  }

  /** Spherical k-means (Lloyd) centroids, entirely in DataFrame ops: seed
    * with the first `nClusters` vectors (deterministic), then iterate
    * assign-by-cosine → per-dimension mean. Each iteration is one
    * aggregation pass over the corpus (posexplode → groupBy(bucket, pos) →
    * avg); only the nClusters×dim centroid matrix ever reaches the driver,
    * so the loop distributes at 100 TB like any other aggregation. */
  /** Cluster count from corpus size when the caller doesn't fix one:
    * k = max(√N, N / maxClusterRows), capped at 2^16. Bucket-local pair
    * generation downstream costs Σ cluster² — with √N clusters the
    * expected candidate space is O(N^1.5/√N)=O(N), and the row target
    * bounds the largest single bucket regardless of skew (the SemDeDup
    * paper scales k with N the same way, arXiv:2303.09540 §3). */
  private[llm] def autoClusters(n: Long, maxClusterRows: Long = 1L << 20): Int = {
    val bySqrt = math.ceil(math.sqrt(math.max(0L, n).toDouble)).toLong
    val byTarget = (n + maxClusterRows - 1) / maxClusterRows
    math.min(1L << 16, math.max(1L, math.max(bySqrt, byTarget))).toInt
  }

  private[llm] def kmeansCentroids(corpus: DataFrame, nClusters: Int,
                                   iters: Int): Seq[Seq[Float]] = {
    import org.apache.spark.sql.Row
    // Deterministic hash-spread seed pick: orderBy+limit plans as
    // TakeOrderedAndProject (per-partition bounded heap + driver merge of
    // k rows — no full sort/shuffle), and ordering by xxhash64 instead of
    // raw vec_id makes the seeds a pseudo-random spread rather than the k
    // lowest ids (which are often correlated rows: same source, same day).
    var centroids: Seq[Seq[Float]] = corpus
      .select(col("vec_id"), col("embedding"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(nClusters).collect()
      .map((r: Row) => r.getSeq[Float](1)).toSeq
    for (_ <- 1 to iters) {
      val sims = array(centroids.map(c =>
        Functions.cosine_sim(col("embedding"), typedLit(c))): _*)
      val means = corpus
        .withColumn("s", sims)
        .select((expr("array_position(s, array_max(s))") - 1).cast("int").as("bucket"),
          posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("bucket"), col("pos")).agg(avg(col("v")).as("m"))
        .collect() // nClusters × dim rows — centroid matrix only
        .groupBy(_.getInt(0))
      centroids = centroids.indices.map { b =>
        means.get(b) match {
          case Some(rows) => rows.sortBy(_.getInt(1)).map(_.getDouble(2).toFloat).toSeq
          case None       => centroids(b) // empty cluster keeps its seed
        }
      }
    }
    centroids
  }

  /** IVF with k-means coarse quantizer: corpus vectors go to their nearest
    * centroid, queries probe their `nProbe` nearest buckets. Recall@k
    * against brute force is asserted in SimilaritySpec, so the
    * approximation is falsifiable, not just non-empty.
    *
    * Scale: the centroid set is tiny and broadcast inside the assignment
    * expressions (all codegen'd); the join is bucket-local, shrinking each
    * query's scan by ~nClusters/nProbe×. */
  def ivfCentroidTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10,
                      nClusters: Int = 0, nProbe: Int = 2,
                      kmeansIters: Int = 3): DataFrame = {
    // nClusters <= 0 → size the quantizer from the corpus (one count pass;
    // callers that know their k pass it explicitly and skip the count)
    val nc = if (nClusters > 0) nClusters else autoClusters(corpus.count())
    val centroids: Seq[Seq[Float]] = kmeansCentroids(corpus, nc, kmeansIters)
    // per-centroid cosine columns (codegen'd custom expression)
    def sims(vecCol: Column): Column = array(centroids.map(c =>
      Functions.cosine_sim(vecCol, typedLit(c))): _*)
    val cCol = col("embedding")
    val corpusAssigned = corpus
      .withColumn("s", sims(cCol))
      .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"),
        (expr("array_position(s, array_max(s))") - 1).cast("int").as("bucket"))
    val queriesProbed = queries
      .withColumn("s", sims(cCol))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
        explode(expr(
          s"""slice(transform(array_sort(zip_with(s, sequence(0, ${nc - 1}),
             |(sc, i) -> struct(sc as c, i as b)),
             |(l, r) -> CASE WHEN l.c > r.c THEN -1 WHEN l.c < r.c THEN 1
             |               ELSE int(l.b - r.b) END), x -> x.b), 1, $nProbe)""".stripMargin))
          .as("bucket"))
    val scored = corpusAssigned.join(broadcast(queriesProbed), Seq("bucket"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cos", Functions.cosine_sim(col("q_vec"), col("c_vec")))
      .select(col("q_id"), col("c_id"), col("cos"))
      .dropDuplicates("q_id", "c_id") // a pair can meet in ≤ nProbe buckets
    rankTopK(scored, k)
  }

  /** IVF-style ANN: both sides partitioned by a coarse bucket (here the
    * fixture's label column; in production a k-means assignment), so each
    * query only scans its own bucket. Per-query top-k runs through the
    * bounded-heap TopKPerKey operator (O(n log k) heap instead of the
    * window's full per-key sort), same as the brute-force/centroid paths. */
  /** Per-vector affine int8 quantization: codes c = round((x-min)/scale)-128
    * with scale = (max-min)/255, plus the (q_min, q_scale) needed to
    * dequantize x' = (c+128)*scale + min. 4× less memory/shuffle than fp32
    * — the standard ANN compression step (IVF-SQ8); max reconstruction
    * error is scale/2 per component. All arithmetic in double (floats are
    * exact in double, IEEE ops are deterministic), so any engine
    * reproduces the codes bit-for-bit. Pure projection — no shuffle. */
  def quantizeInt8(df: DataFrame, vecCol: String = "embedding"): DataFrame = {
    // one-pass native kernel (functions.QuantizeInt8): the declarative
    // column chain (array_min/max + round transform) collapses into a
    // projection that re-evaluates min/max inside the per-element lambda,
    // O(dim²) interpreted work per row; outputs are bit-identical
    val q = Functions.quantize_int8(col(vecCol))
    df.withColumn("q_min", q.getField("q_min"))
      .withColumn("q_scale", q.getField("q_scale"))
      .withColumn("q_codes", q.getField("q_codes"))
  }

  /** Dequantize `quantizeInt8` output back to an approximate double
    * vector (for scoring without re-reading fp32). */
  def dequantize(df: DataFrame): DataFrame =
    df.withColumn("deq_vec",
      transform(col("q_codes"),
        c => (c.cast("double") + 128.0) * col("q_scale") + col("q_min")))

  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10): DataFrame = {
    val q = queries.select(col("label"), col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val c = corpus.select(col("label"), col("vec_id").as("c_id"), col("embedding").as("c_vec"))
    val scored = c.join(broadcast(q), Seq("label"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cos", Functions.cosine_sim(col("q_vec"), col("c_vec")))
      .select(col("q_id"), col("label"), col("c_id"), col("cos"))
    rankTopK(scored, k)
  }

  // ---------- Product quantization (PQ / IVF-PQ compression path) -------

  /** PQ codebook: `m` blocks × `ksub` centroids × (dim/m) values. Block b
    * quantizes dims [b·dsub, (b+1)·dsub).
    *
    * ALL m sub-space k-means runs train together — the corpus explodes
    * once into an (vec_id, block, block_vec) table and every Lloyd
    * iteration is ONE aggregation pass over it (assignment by
    * d(x,c) ∝ |c|² − 2·x·c, argmin-invariant in the row's own norm;
    * update = per-(block, bucket, pos) mean). Training m blocks
    * sequentially would pay m×iters job waves of fixed scheduling
    * overhead for tiny per-job work — measured 4× slower end to end.
    * Only the m·ksub·dsub codebook (a few KB) ever reaches the driver;
    * at 100 TB, train on a bounded sample (standard PQ practice — the
    * codebook needs ~100k vectors, not the corpus). */
  def pqCodebook(corpus: DataFrame, m: Int = 4, ksub: Int = 16,
                 iters: Int = 3): Seq[Seq[Seq[Float]]] = {
    import org.apache.spark.sql.Row
    val dim = corpus.select(size(col("embedding"))).head().getInt(0)
    require(dim % m == 0, s"embedding dim $dim must divide into $m blocks")
    val dsub = dim / m
    val blocks = corpus.select(col("vec_id"),
      posexplode(array((0 until m).map(b =>
        slice(col("embedding"), b * dsub + 1, dsub)): _*)).as(Seq("b", "bvec")))
      .localCheckpoint(true) // reused iters+1 times; same bytes as the corpus
    // seeds: a deterministic hash-spread of ksub vectors PER BLOCK, one
    // window pass (bounded per-partition sort over m×N compact rows)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("b"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
    val seedRows = blocks.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= ksub).select(col("b"), col("rk"), col("bvec")).collect()
    val cents: Array[Array[Seq[Float]]] = Array.tabulate(m) { b =>
      seedRows.filter(_.getInt(0) == b).sortBy(_.getInt(1))
        .map((r: Row) => r.getSeq[Float](2)).toArray
    }
    require(cents.forall(_.length == ksub),
      s"corpus has fewer than ksub=$ksub vectors")
    for (_ <- 1 to iters) {
      val centLit = typedLit(cents.map(_.toSeq).toSeq) // array<array<array<float>>>
      val means = blocks
        .withColumn("cents", element_at(centLit, col("b") + 1))
        .withColumn("d", expr(
          """transform(cents, c -> aggregate(
            |  zip_with(c, bvec, (x, y) -> CAST(x AS DOUBLE) * x - 2.0D * x * y),
            |  CAST(0.0 AS DOUBLE), (a, v) -> a + v))""".stripMargin))
        .withColumn("bucket", (expr("array_position(d, array_min(d))") - 1).cast("int"))
        .select(col("b"), col("bucket"), posexplode(col("bvec")).as(Seq("pos", "v")))
        .groupBy(col("b"), col("bucket"), col("pos")).agg(avg(col("v")).as("mn"))
        .collect() // m × ksub × dsub rows — the codebook only
      means.groupBy(r => (r.getInt(0), r.getInt(1))).foreach { case ((b, j), rows) =>
        cents(b)(j) = rows.sortBy(_.getInt(2)).map(_.getDouble(3).toFloat).toSeq
      } // buckets that attracted nothing keep their previous centroid
    }
    cents.map(_.toSeq).toSeq
  }

  /** Encode each vector as m sub-space centroid indices — m small codes
    * instead of dim floats (dim=64, m=4, ksub≤256: 4 bytes vs 256, a 64×
    * corpus-residency cut; the compression step of IVF-PQ, the standard
    * billion-scale ANN layout). Pure projection over broadcast codebook
    * literals — no shuffle, deterministic. */
  def pqEncode(corpus: DataFrame,
               codebook: Seq[Seq[Seq[Float]]]): DataFrame = {
    val dsub = codebook.head.head.size
    var df = corpus.select(col("vec_id"), col("embedding"))
    codebook.zipWithIndex.foreach { case (cents, b) =>
      val blk = slice(col("embedding"), b * dsub + 1, dsub)
      val dists = array(cents.map { c =>
        val cNorm = c.map(v => v.toDouble * v).sum
        lit(cNorm) - lit(2.0) * Functions.dot_product(blk, typedLit(c))
      }: _*)
      df = df.withColumn(s"__d$b", dists)
        .withColumn(s"__c$b",
          (expr(s"array_position(__d$b, array_min(__d$b))") - 1).cast("int"))
    }
    df.select(col("vec_id"),
      array(codebook.indices.map(b => col(s"__c$b")): _*).as("codes"))
  }

  /** Reconstruct the approximate vector from PQ codes: concatenate the
    * indexed centroid of each block (codebook rides along as a literal). */
  def pqReconstruct(codes: Column, codebook: Seq[Seq[Seq[Float]]]): Column =
    concat(codebook.zipWithIndex.map { case (cents, b) =>
      element_at(typedLit(cents), element_at(codes, b + 1) + 1)
    }: _*)

  /** ANN over PQ-reconstructed vectors — the PQ *scoring* path, same plan
    * shape as [[quantizedTopK]]: encode+reconstruct the corpus in one
    * projection, broadcast the raw query batch, one corpus pass, bounded
    * per-key heaps. Recall vs brute force is asserted in SimilaritySpec
    * (approximation falsifiable, not just non-empty). */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10,
             m: Int = 4, ksub: Int = 16, iters: Int = 3): DataFrame = {
    val cb = pqCodebook(corpus, m, ksub, iters)
    val c = pqEncode(corpus, cb)
      .select(col("vec_id").as("c_id"), pqReconstruct(col("codes"), cb).as("c_vec"))
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cos", Functions.cosine_sim(col("q_vec"), col("c_vec")))
      .select(col("q_id"), col("c_id"), col("cos"))
    rankTopK(scored, k)
  }
}
