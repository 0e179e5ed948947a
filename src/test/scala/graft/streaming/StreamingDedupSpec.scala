package graft.streaming

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.SnapshotTable

/** Streaming near-dup admission: lake-backed LSH state, intra-batch and
  * vs-state duplicate dropping, exactly-once replay via tagged commits. */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(tag: String) = Files.createTempDirectory(s"graft_$tag").toString

  private val base =
    "the quick brown fox jumps over the lazy dog near the river bank today"
  private def nearCopy(seed: Int) =
    base.replace("today", s"tonight$seed") // high 3-gram overlap
  private val distinct1 =
    "completely different subject matter about spark distributed query engines and shuffles"
  private val distinct2 =
    "yet another unrelated document describing arrow flight protocols and ipc streams"

  test("admitBatch: intra-batch near-copy drops, distinct docs admit; state builds") {
    val state = tmp("sdd_state"); val out = tmp("sdd_out")
    val b1 = Seq((1L, base), (2L, nearCopy(7)), (3L, distinct1))
      .toDF("doc_id", "text")
    StreamingDedup.admitBatch(spark, b1, state, out, "t:1", jaccardThreshold = 0.5)
    val got = SnapshotTable.forPath(spark, out).read()
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 3L), s"near-copy 2 must drop intra-batch: $got")

    // second batch: a near-copy of an admitted doc drops VS STATE; a new
    // distinct doc admits
    val b2 = Seq((10L, nearCopy(9)), (11L, distinct2)).toDF("doc_id", "text")
    StreamingDedup.admitBatch(spark, b2, state, out, "t:2", jaccardThreshold = 0.5)
    val got2 = SnapshotTable.forPath(spark, out).read()
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(got2 == Seq(1L, 3L, 11L), s"10 is a near-dup of state doc 1: $got2")

    // state holds band rows ONLY for admitted docs
    val stateIds = SnapshotTable.forPath(spark, state).read()
      .select("doc_id").distinct().as[Long].collect().sorted.toSeq
    assert(stateIds == Seq(1L, 3L, 11L), stateIds.toString)
  }

  test("admitBatch: a replayed tag is absorbed on both tables (exactly-once)") {
    val state = tmp("sdd_rep_state"); val out = tmp("sdd_rep_out")
    val b = Seq((1L, base), (2L, distinct1)).toDF("doc_id", "text")
    StreamingDedup.admitBatch(spark, b, state, out, "t:1")
    val v1 = SnapshotTable.forPath(spark, out).latestVersion
    val s1 = SnapshotTable.forPath(spark, state).latestVersion
    StreamingDedup.admitBatch(spark, b, state, out, "t:1") // replay
    assert(SnapshotTable.forPath(spark, out).latestVersion == v1)
    assert(SnapshotTable.forPath(spark, state).latestVersion == s1)
    assert(SnapshotTable.forPath(spark, out).read().count() == 2)
  }

  test("streaming end-to-end: file stream lands only non-duplicates") {
    val state = tmp("sds_state"); val out = tmp("sds_out")
    val in = tmp("sds_in"); val ck = tmp("sds_ck")
    def writeDoc(name: String, id: Long, text: String): Unit =
      Files.write(Paths.get(in, name),
        s"""{"doc_id":$id,"text":"$text"}""".getBytes)
    writeDoc("a.json", 1L, base)
    writeDoc("b.json", 2L, distinct1)
    val stream = spark.readStream.schema("doc_id LONG, text STRING").json(in)
    val q = StreamingDedup.start(stream, state, out, ck, jaccardThreshold = 0.5)
    try {
      q.processAllAvailable()
      writeDoc("c.json", 3L, nearCopy(3)) // dup of state doc 1
      writeDoc("d.json", 4L, distinct2)
      q.processAllAvailable()
      val got = SnapshotTable.forPath(spark, out).read()
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(got == Seq(1L, 2L, 4L), s"3 must drop against the state: $got")
      val outT = SnapshotTable.forPath(spark, out)
      assert(outT.commits.forall(_.tag.startsWith("dedup:")), "tagged commits")
    } finally q.stop()
  }

  test("compactStateEvery re-clusters state mid-stream; admission stays exact") {
    val state = tmp("sdc_state"); val out = tmp("sdc_out")
    val in = tmp("sdc_in"); val ck = tmp("sdc_ck")
    def writeDoc(name: String, id: Long, text: String): Unit =
      Files.write(Paths.get(in, name),
        s"""{"doc_id":$id,"text":"$text"}""".getBytes)
    writeDoc("a.json", 1L, base)
    val stream = spark.readStream.schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", "1").json(in)
    val q = StreamingDedup.start(stream, state, out, ck,
      jaccardThreshold = 0.5, compactStateEvery = 2)
    try {
      q.processAllAvailable()
      writeDoc("b.json", 2L, distinct1)
      writeDoc("c.json", 3L, distinct2)
      writeDoc("d.json", 4L, nearCopy(4)) // dup of state doc 1 POST-compaction
      q.processAllAvailable()
      val got = SnapshotTable.forPath(spark, out).read()
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(got == Seq(1L, 2L, 3L), s"4 must drop against compacted state: $got")
      // a compaction commit (overwrite) landed between the tagged appends
      val st = SnapshotTable.forPath(spark, state)
      assert(st.commits.exists(c => c.action == "overwrite" && c.tag.isEmpty),
        st.commits.map(c => (c.action, c.tag)).mkString(","))
    } finally q.stop()
  }
}
