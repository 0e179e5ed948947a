package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Persisted IVF-SQ8 index ([[VectorIndex]]): serve-from-disk neighbor
  * correctness, partition pruning on the postings scan (the 100 TB serve
  * path), recall vs brute force under a trained quantizer, rebuild
  * semantics. */
class VectorIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name)
    d.toFile.deleteOnExit()
    d.toString
  }

  /** Three well-separated clusters around axes e1/e2/e3 (dim 4), 20
    * vectors each with small deterministic jitter. */
  private def clusteredCorpus() = {
    val rows = for {
      c <- 0 until 3
      i <- 0 until 20
    } yield {
      val base = Array.fill(4)(0.01f * ((c * 20 + i) % 7))
      base(c) = 1.0f
      ((c * 20 + i).toLong, base.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("serve-from-disk: neighbors come from the query's own cluster") {
    val dir = tmp("vecidx_serve")
    val corpus = clusteredCorpus()
    val cents = Seq(
      Seq(1.0f, 0f, 0f, 0f), Seq(0f, 1.0f, 0f, 0f), Seq(0f, 0f, 1.0f, 0f))
    VectorIndex.build(corpus, dir, centroids = Some(cents))
    // query = a cluster-1 member; its top neighbors must all be ids 20-39
    val q = corpus.filter(col("vec_id") === 25L)
    val got = VectorIndex.search(spark, dir, q, k = 5, nProbe = 1)
      .orderBy(col("rk")).collect()
    assert(got.length == 5)
    assert(got.forall(r => { val id = r.getAs[Long]("c_id"); id >= 20 && id < 40 }),
      got.mkString(","))
    assert(got.map(_.getAs[Int]("rk")).toSeq == Seq(1, 2, 3, 4, 5))
  }

  test("postings scan is partition-pruned to the probed buckets") {
    val dir = tmp("vecidx_prune")
    val cents = Seq(
      Seq(1.0f, 0f, 0f, 0f), Seq(0f, 1.0f, 0f, 0f), Seq(0f, 0f, 1.0f, 0f))
    VectorIndex.build(clusteredCorpus(), dir, centroids = Some(cents))
    val all = graft.sources.SnapshotTable.forPath(spark, s"$dir/postings")
      .read().inputFiles.length
    assert(all >= 3, s"expected >=3 posting files (one per bucket), got $all")
    val q = clusteredCorpus().filter(col("vec_id") === 0L)
    val res = VectorIndex.search(spark, dir, q, k = 3, nProbe = 1)
    // the search must OPEN only bucket 0's files — manifest-pruned at
    // plan time (LakeFileIndex.listFiles), asserted via the executed
    // scan's numFiles metric
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def findScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => findScans(a.executedPlan)
      case s: QueryStageExec => findScans(s.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(findScans)
    }
    assert(res.count() == 3)
    val opened = findScans(res.queryExecution.executedPlan)
      .map(_.metrics("numFiles").value).sum
    assert(opened < all, s"pruning failed: opened $opened of $all files")
  }

  test("trained-quantizer recall@10 vs brute force on the fixture") {
    val e = graft.engine.Tables.ensure(spark, "/root/testdata/sf0.001").embeddings
    val dir = tmp("vecidx_recall")
    VectorIndex.build(e, dir, nClusters = 4, kmeansIters = 2)
    val queries = e.filter(col("vec_id") < 5)
    val got = VectorIndex.search(spark, dir, queries, k = 10, nProbe = 2)
      .select("q_id", "c_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val bf = Similarity.bruteForceTopK(e, queries, k = 10)
      .select("q_id", "c_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // SQ8 + 2-of-4 probes: demand real overlap with the exact answer
    val recalls = bf.keys.toSeq.map { q =>
      got.getOrElse(q, Set.empty).intersect(bf(q)).size.toDouble / bf(q).size
    }
    assert(recalls.nonEmpty && recalls.sum / recalls.size >= 0.5,
      s"mean recall ${recalls.sum / recalls.size} too low: $recalls")
  }

  test("incremental append: new vectors searchable, no retrain, replay absorbed") {
    val dir = tmp("vecidx_append")
    val cents = Seq(
      Seq(1.0f, 0f, 0f, 0f), Seq(0f, 1.0f, 0f, 0f), Seq(0f, 0f, 1.0f, 0f))
    VectorIndex.build(clusteredCorpus(), dir, centroids = Some(cents))
    // a new cluster-0 vector arrives after the build
    val fresh = Seq((100L, Seq(0.99f, 0.01f, 0f, 0f))).toDF("vec_id", "embedding")
    VectorIndex.append(fresh, dir, tag = "b:1")
    val q = clusteredCorpus().filter(col("vec_id") === 0L)
    val ids = VectorIndex.search(spark, dir, q, k = 25, nProbe = 1)
      .select("c_id").as[Long].collect().toSet
    assert(ids.contains(100L), s"appended vector must be served: $ids")
    // replaying the SAME tag is absorbed (exactly-once under recovery)
    val before = graft.sources.SnapshotTable.forPath(spark, s"$dir/postings")
      .read().count()
    VectorIndex.append(fresh, dir, tag = "b:1")
    val after = graft.sources.SnapshotTable.forPath(spark, s"$dir/postings")
      .read().count()
    assert(after == before, s"replayed tag must not double-index: $before -> $after")
  }

  test("continuous indexing: a streamed batch lands exactly once") {
    val dir = tmp("vecidx_stream")
    val chk = tmp("vecidx_stream_chk")
    VectorIndex.build(clusteredCorpus(), dir,
      centroids = Some(Seq(Seq(1.0f, 0f, 0f, 0f), Seq(0f, 1.0f, 0f, 0f))))
    val base = graft.sources.SnapshotTable.forPath(spark, s"$dir/postings")
      .read().count()
    val in = tmp("vecidx_stream_in")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(in, "b1.json"),
      """{"vec_id": 200, "embedding": [0.9, 0.1, 0.0, 0.0]}
        |{"vec_id": 201, "embedding": [0.1, 0.9, 0.0, 0.0]}""".stripMargin)
    val stream = spark.readStream
      .schema("vec_id LONG, embedding ARRAY<FLOAT>").json(in)
    val q = VectorIndex.startIndexing(stream, dir, chk)
    try q.processAllAvailable() finally q.stop()
    val postings = graft.sources.SnapshotTable.forPath(spark, s"$dir/postings").read()
    assert(postings.count() == base + 2, s"streamed vectors must index once")
    assert(postings.filter(col("vec_id") === 200L).count() == 1)
  }

  test("PQ index: serve-from-disk ADC recall@10 floor vs brute force, pruned scan") {
    val e = graft.engine.Tables.ensure(spark, "/root/testdata/sf0.001").embeddings
    val dir = tmp("vecidx_pq")
    VectorIndex.buildPq(e, dir, nClusters = 16, m = 8, ksub = 32, iters = 3)
    // postings carry CODES, never fp32 vectors
    val post = graft.sources.SnapshotTable.forPath(spark, s"$dir/postings").read()
    assert(post.columns.toSet == Set("bucket", "vec_id", "codes"), post.columns.toSeq)
    val queries = e.filter(col("vec_id") < 5)
    val res = VectorIndex.searchPq(spark, dir, queries, k = 10, nProbe = 4)
    val got = res.select("q_id", "c_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val bf = Similarity.bruteForceTopK(e, queries, k = 10)
      .select("q_id", "c_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // same floor SimilaritySpec pins for the in-memory IVF-PQ at these
    // parameters: the approximation is a real ANN, not noise
    val recalls = bf.keys.toSeq.map { q =>
      got.getOrElse(q, Set.empty).intersect(bf(q)).size.toDouble / bf(q).size
    }
    assert(recalls.sum / recalls.size >= 0.2,
      s"ADC recall floor failed: $recalls")
    // identical PQ scoring from the IN-MEMORY path: persisted artifacts
    // must not change a single neighbor or rank
    val mem = Similarity.ivfPqTopK(e, queries, k = 10, nClusters = 16,
      nProbe = 4, m = 8, ksub = 32, iters = 3)
      .select("q_id", "c_id", "rk").as[(Long, Long, Int)].collect().toSet
    val disk = res.select("q_id", "c_id", "rk")
      .as[(Long, Long, Int)].collect().toSet
    assert(disk == mem, "persisted-PQ results diverge from the in-memory IVF-PQ")
  }

  test("rebuild replaces the index wholesale") {
    val dir = tmp("vecidx_rebuild")
    val cents = Seq(Seq(1.0f, 0f, 0f, 0f), Seq(0f, 1.0f, 0f, 0f))
    VectorIndex.build(clusteredCorpus().filter(col("vec_id") < 40), dir,
      centroids = Some(cents))
    // rebuild over a DIFFERENT corpus slice: old postings must not leak
    VectorIndex.build(clusteredCorpus().filter(col("vec_id") >= 20), dir,
      centroids = Some(Seq(Seq(0f, 1.0f, 0f, 0f), Seq(0f, 0f, 1.0f, 0f))))
    val q = clusteredCorpus().filter(col("vec_id") === 21L)
    val ids = VectorIndex.search(spark, dir, q, k = 40, nProbe = 2)
      .select("c_id").as[Long].collect().toSet
    assert(ids.nonEmpty && ids.forall(_ >= 20), ids.toString)
  }
}
