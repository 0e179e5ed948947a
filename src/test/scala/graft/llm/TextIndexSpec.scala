package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import org.apache.spark.sql.functions._

/** Persisted BM25 inverted index: serve-from-disk parity with the
  * in-memory operator, partition-pruned postings scans, incremental
  * append. */
class TextIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_$name").toString + "/idx"

  private def corpus() =
    graft.engine.Tables.ensure(spark, "/root/testdata/sf0.001").documents

  test("serve from disk is rank- and score-identical to the in-memory bm25TopK") {
    val docs = corpus()
    val dir = tmp("txtidx")
    val n = TextIndex.build(docs, dir, nBuckets = 8)
    assert(n == docs.count())
    val queries = Seq(0 -> "hash join table", 1 -> "window agg batch")
    val fromDisk = TextIndex.search(spark, dir, queries, k = 10)
      .select("q_id", "doc_id", "bm25").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    val inMemory = Retrieval.bm25TopK(docs, queries, k = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(fromDisk == inMemory,
      s"disk=${fromDisk.take(4)} mem=${inMemory.take(4)}")
  }

  test("postings scan opens only the query terms' bucket partitions") {
    val docs = corpus()
    val dir = tmp("txtidx_prune")
    TextIndex.build(docs, dir, nBuckets = 16)
    val all = graft.sources.SnapshotTable.forPath(spark, s"$dir/postings")
      .snapshot()._1.size
    assert(all >= 8, s"fixture should spread across buckets, got $all files")
    val res = TextIndex.search(spark, dir, Seq(0 -> "zebra hash"), k = 5)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def findScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => findScans(a.executedPlan)
      case s: QueryStageExec => findScans(s.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(findScans)
    }
    res.collect()
    val opened = findScans(res.queryExecution.executedPlan)
      .map(_.metrics("numFiles").value).sum
    // two query terms → at most two bucket partitions (≤2 files each) open
    assert(opened <= 4 && opened < all,
      s"pruning failed: opened $opened of $all postings files")
  }

  test("append indexes new docs against the same buckets; tags absorb replays") {
    import spark.implicits._
    val docs = corpus()
    val dir = tmp("txtidx_append")
    TextIndex.build(docs, dir, nBuckets = 8)
    val newDoc = Seq((900001L, "zzzneedle zzzneedle unique zzzneedle"))
      .toDF("doc_id", "text")
    TextIndex.append(newDoc, dir, tag = "batch-1")
    val hit = TextIndex.search(spark, dir, Seq(0 -> "zzzneedle"), k = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(hit == Seq(900001L), hit.toString)
    // a replayed append with the same tag is absorbed — still ONE posting
    val before = graft.sources.SnapshotTable
      .forPath(spark, s"$dir/postings").latestVersion
    TextIndex.append(newDoc, dir, tag = "batch-1")
    assert(graft.sources.SnapshotTable
      .forPath(spark, s"$dir/postings").latestVersion == before)
    assert(TextIndex.search(spark, dir, Seq(0 -> "zzzneedle"), k = 3)
      .count() == 1L)
  }
}
