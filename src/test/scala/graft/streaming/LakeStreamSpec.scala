package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQueryException}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.SnapshotTable

/** Structured Streaming over the graft-lake format: version-offset source
  * micro-batches, idempotent tagged-commit sink, fail-loud vs
  * skipChangeCommits semantics, trigger bounding, and lake→lake continuous
  * replication end-to-end. */
class LakeStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(tag: String) = Files.createTempDirectory(s"graft_$tag").toString

  private def lakeWith(dir: String, batches: Seq[Int]*): SnapshotTable = {
    val t = SnapshotTable.forPath(spark, dir)
    batches.foreach(b => t.append(b.toDF("v")))
    t
  }

  private def memQuery(dir: String, name: String, extra: Map[String, String] = Map.empty) = {
    val r = spark.readStream.format("graft-lake")
    extra.foreach { case (k, v) => r.option(k, v) }
    r.load(dir).writeStream.format("memory").queryName(name)
      .option("checkpointLocation", tmp(s"ck_$name")).start()
  }

  test("source: initial snapshot then incremental appends, offsets advance by version") {
    val dir = tmp("lss_src")
    val t = lakeWith(dir, Seq(1, 2), Seq(3))
    val q = memQuery(dir, "lss_src")
    try {
      q.processAllAvailable()
      assert(spark.table("lss_src").as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
      t.append(Seq(4, 5).toDF("v"))
      q.processAllAvailable()
      assert(spark.table("lss_src").as[Int].collect().sorted.toSeq == Seq(1, 2, 3, 4, 5))
      // the stream's end offset is the table's head version — incremental
      // batches scanned only the appended files, never a re-snapshot
      val end = q.lastProgress.sources.head.endOffset
      assert(end.contains(s""""version":${t.latestVersion}"""))
    } finally q.stop()
  }

  test("source: startingVersion streams appends from that version, no initial snapshot") {
    val dir = tmp("lss_sv")
    val t = lakeWith(dir, Seq(1), Seq(2), Seq(3))
    val q = memQuery(dir, "lss_sv", Map("startingVersion" -> "2"))
    try {
      q.processAllAvailable()
      assert(spark.table("lss_sv").as[Int].collect().sorted.toSeq == Seq(2, 3))
      t.append(Seq(4).toDF("v"))
      q.processAllAvailable()
      assert(spark.table("lss_sv").as[Int].collect().sorted.toSeq == Seq(2, 3, 4))
    } finally q.stop()
  }

  test("source: maxVersionsPerTrigger bounds each micro-batch to one commit") {
    val dir = tmp("lss_max")
    lakeWith(dir, Seq(1), Seq(2), Seq(3), Seq(4))
    val q = memQuery(dir, "lss_max",
      Map("startingVersion" -> "1", "maxVersionsPerTrigger" -> "1"))
    try {
      q.processAllAvailable()
      assert(spark.table("lss_max").as[Int].collect().sorted.toSeq == Seq(1, 2, 3, 4))
      // four commits, one per batch (recentProgress keeps them all here)
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      assert(batches.length == 4, s"expected 4 bounded batches, saw ${batches.length}")
    } finally q.stop()
  }

  test("source: non-append commit fails the stream loudly by default") {
    val dir = tmp("lss_dml")
    val t = lakeWith(dir, Seq(1, 2, 3))
    val q = memQuery(dir, "lss_dml")
    try {
      q.processAllAvailable()
      t.deleteWhere(col("v") === 2) // overwrite-action commit
      t.append(Seq(4).toDF("v"))
      val e = intercept[StreamingQueryException] { q.processAllAvailable() }
      assert(e.getMessage.contains("non-append") ||
        Option(e.getCause).exists(_.getMessage.contains("non-append")))
    } finally q.stop()
  }

  test("source: skipChangeCommits passes over DML and keeps streaming appends") {
    val dir = tmp("lss_skip")
    val t = lakeWith(dir, Seq(1, 2, 3))
    val q = memQuery(dir, "lss_skip", Map("skipChangeCommits" -> "true"))
    try {
      q.processAllAvailable()
      t.deleteWhere(col("v") === 2)
      t.append(Seq(4).toDF("v"))
      t.append(Seq(5).toDF("v"))
      q.processAllAvailable()
      // the delete's rewrite is skipped (its survivors were already
      // delivered by the snapshot); the appends stream through
      assert(spark.table("lss_skip").as[Int].collect().sorted.toSeq == Seq(1, 2, 3, 4, 5))
    } finally q.stop()
  }

  test("sink: append mode lands each micro-batch as one tagged lake commit") {
    val src = tmp("lsk_in"); val dst = tmp("lsk_out")
    Files.createDirectories(java.nio.file.Paths.get(src))
    Files.write(java.nio.file.Paths.get(s"$src/a.json"), "{\"v\":1}\n{\"v\":2}".getBytes)
    val q = spark.readStream.schema("v BIGINT").json(src)
      .writeStream.format("graft-lake")
      .option("checkpointLocation", tmp("lsk_ck")).start(dst)
    try {
      q.processAllAvailable()
      val t = SnapshotTable.forPath(spark, dst)
      assert(t.read().as[Long].collect().sorted.toSeq == Seq(1L, 2L))
      // the commit is stream-tagged (exactly-once identity)
      assert(t.commits.last.tag.startsWith("stream:"))
      Files.write(java.nio.file.Paths.get(s"$src/b.json"), "{\"v\":3}".getBytes)
      q.processAllAvailable()
      assert(t.read().as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("sink: a replayed batch id is absorbed by the tag (exactly-once)") {
    val dst = tmp("lsk_replay")
    val sink = new LakeStreamSink(spark.sqlContext, dst, Map.empty, Nil, OutputMode.Append())
    sink.addBatch(7, Seq(1, 2).toDF("v"))
    sink.addBatch(7, Seq(1, 2).toDF("v")) // checkpoint-recovery replay
    val t = SnapshotTable.forPath(spark, dst)
    assert(t.read().count() == 2)
    assert(t.latestVersion == 1)
    sink.addBatch(8, Seq(3).toDF("v"))
    assert(t.read().count() == 3)
  }

  test("sink: complete mode overwrites with the latest aggregate state") {
    val src = tmp("lskc_in"); val dst = tmp("lskc_out")
    Files.createDirectories(java.nio.file.Paths.get(src))
    Files.write(java.nio.file.Paths.get(s"$src/a.json"),
      "{\"k\":\"a\",\"v\":1}\n{\"k\":\"a\",\"v\":2}\n{\"k\":\"b\",\"v\":5}".getBytes)
    val q = spark.readStream.schema("k STRING, v BIGINT").json(src)
      .groupBy("k").agg(sum("v").as("total"))
      .writeStream.format("graft-lake").outputMode(OutputMode.Complete())
      .option("checkpointLocation", tmp("lskc_ck")).start(dst)
    try {
      q.processAllAvailable()
      val t = SnapshotTable.forPath(spark, dst)
      assert(t.read().orderBy("k").as[(String, Long)].collect().toSeq ==
        Seq(("a", 3L), ("b", 5L)))
    } finally q.stop()
  }

  test("sink: partitioned streaming ingest records the layout and prunes") {
    val src = tmp("lskp_in"); val dst = tmp("lskp_out")
    Files.createDirectories(java.nio.file.Paths.get(src))
    Files.write(java.nio.file.Paths.get(s"$src/a.json"),
      "{\"region\":\"eu\",\"v\":1}\n{\"region\":\"us\",\"v\":2}".getBytes)
    val q = spark.readStream.schema("region STRING, v BIGINT").json(src)
      .writeStream.format("graft-lake")
      .option("partitionSpec", "region").option("statsCols", "v")
      .option("checkpointLocation", tmp("lskp_ck")).start(dst)
    try {
      q.processAllAvailable()
      val t = SnapshotTable.forPath(spark, dst)
      assert(t.effectiveLayout._1.exists(_.contains("region")))
      assert(t.read().where(col("region") === "eu").count() == 1)
    } finally q.stop()
  }

  test("lake→lake continuous replication is content-equal with the source") {
    val a = tmp("lrep_a"); val b = tmp("lrep_b")
    val src = lakeWith(a, Seq(1, 2), Seq(3))
    val q = spark.readStream.format("graft-lake").load(a)
      .writeStream.format("graft-lake")
      .option("checkpointLocation", tmp("lrep_ck")).start(b)
    try {
      q.processAllAvailable()
      src.append(Seq(4, 5).toDF("v"))
      src.append(Seq(6).toDF("v"))
      q.processAllAvailable()
      val got = SnapshotTable.forPath(spark, b).read().as[Int].collect().sorted.toSeq
      assert(got == Seq(1, 2, 3, 4, 5, 6))
    } finally q.stop()
  }

  test("restart from checkpoint resumes at the recovered version offset") {
    val dir = tmp("lss_restart"); val ck = tmp("lss_restart_ck")
    val dst = tmp("lss_restart_out")
    val t = lakeWith(dir, Seq(1, 2))
    def start() =
      spark.readStream.format("graft-lake").load(dir)
        .writeStream.format("graft-lake")
        .option("checkpointLocation", ck).start(dst)
    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    t.append(Seq(3, 4).toDF("v"))
    val q2 = start()
    try {
      q2.processAllAvailable()
      val out = SnapshotTable.forPath(spark, dst)
      // recovery resumed at the checkpointed version: the appends landed
      // exactly once, with NO re-snapshot replay of rows 1-2
      assert(out.read().as[Int].collect().sorted.toSeq == Seq(1, 2, 3, 4))
      assert(out.commits.forall(_.tag.startsWith("stream:")))
    } finally q2.stop()
  }

  test("clean-stop restart keeps the change-commit clamp and trigger bound") {
    // after a CLEAN stop (all batches committed) Spark never replays
    // getBatch, so the source must recover its high-water mark itself; an
    // amnesiac source would plan ONE giant unclamped recovery range in
    // which a compaction rewrote the backlog appends' files — losing them
    // under skipChangeCommits
    val dir = tmp("lss_amnesia"); val ck = tmp("lss_amnesia_ck")
    val dst = tmp("lss_amnesia_out")
    val t = lakeWith(dir, Seq(1, 2))
    def start() =
      spark.readStream.format("graft-lake")
        .option("skipChangeCommits", "true")
        .option("maxVersionsPerTrigger", "1")
        .load(dir).writeStream.format("graft-lake")
        .option("checkpointLocation", ck).start(dst)
    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    // backlog while the stream is down: appends, then a compaction that
    // rewrites their files
    t.append(Seq(3).toDF("v"))
    t.append(Seq(4).toDF("v"))
    t.compact(1)
    t.append(Seq(5).toDF("v"))
    val q2 = start()
    try {
      q2.processAllAvailable()
      // every backlog append delivered exactly once; the compaction was
      // passed over BETWEEN batches, never inside one
      assert(SnapshotTable.forPath(spark, dst).read()
        .as[Int].collect().sorted.toSeq == Seq(1, 2, 3, 4, 5))
    } finally q2.stop()
  }

  test("clean-stop restart with startingVersion never regresses the offset log") {
    val dir = tmp("lss_sv_restart"); val ck = tmp("lss_sv_restart_ck")
    val dst = tmp("lss_sv_restart_out")
    val t = lakeWith(dir, Seq(1), Seq(2), Seq(3))
    def start() =
      spark.readStream.format("graft-lake")
        .option("startingVersion", "2")
        .option("maxVersionsPerTrigger", "1")
        .load(dir).writeStream.format("graft-lake")
        .option("checkpointLocation", ck).start(dst)
    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    assert(SnapshotTable.forPath(spark, dst).read()
      .as[Int].collect().sorted.toSeq == Seq(2, 3))
    t.append(Seq(4).toDF("v"))
    val q2 = start()
    try {
      q2.processAllAvailable()
      // an amnesiac source would restart from startingVersion-1 and
      // re-deliver committed versions 2 and 3 under FRESH batch ids the
      // sink tag cannot absorb
      assert(SnapshotTable.forPath(spark, dst).read()
        .as[Int].collect().sorted.toSeq == Seq(2, 3, 4),
        "committed versions must not re-deliver")
    } finally q2.stop()
  }

  test("declared read schema that differs from the table is refused up front") {
    val dir = tmp("lss_schema")
    lakeWith(dir, Seq(1, 2))
    val ex = intercept[Exception] {
      spark.readStream.schema("v STRING").format("graft-lake").load(dir)
        .writeStream.format("memory").queryName("lss_schema_q")
        .option("checkpointLocation", tmp("lss_schema_ck")).start()
    }
    assert(ex.getMessage != null && ex.getMessage.contains("schema"), ex.toString)
  }

  test("readChangeFeed: snapshot as inserts, then DML arrives as row-level changes") {
    val dir = tmp("lss_cdc")
    val t = lakeWith(dir, Seq(1, 2, 3))
    val q = memQuery(dir, "lss_cdc", Map("readChangeFeed" -> "true"))
    try {
      q.processAllAvailable()
      val snap = spark.table("lss_cdc")
        .select("v", "_change_type", "_commit_version")
        .as[(Int, String, Long)].collect().sorted.toSeq
      // starting snapshot delivered as inserts pinned to the head version
      assert(snap == Seq((1, "insert", 1L), (2, "insert", 1L), (3, "insert", 1L)))
      t.deleteWhere(col("v") === 2) // version 2: rewrite commit
      t.append(Seq(4).toDF("v"))    // version 3: append commit
      q.processAllAvailable()
      val changes = spark.table("lss_cdc")
        .filter(col("_commit_version") > 1)
        .select("v", "_change_type", "_commit_version")
        .as[(Int, String, Long)].collect().sorted.toSeq
      // the delete surfaces ONLY the deleted row (rows carried verbatim by
      // the rewrite cancel out); the append surfaces its insert
      assert(changes == Seq((2, "delete", 2L), (4, "insert", 3L)))
    } finally q.stop()
  }

  test("readChangeFeed: an upsert arrives as delete(old)+insert(new) under one version") {
    val dir = tmp("lss_cdc_up")
    val t = SnapshotTable.forPath(spark, dir)
    t.append(Seq((1, "a"), (2, "b")).toDF("k", "s"))
    val q = memQuery(dir, "lss_cdc_up",
      Map("readChangeFeed" -> "true", "startingVersion" -> "2"))
    try {
      t.mergeByKey(Seq((2, "B"), (3, "c")).toDF("k", "s"), "k") // version 2
      q.processAllAvailable()
      val changes = spark.table("lss_cdc_up")
        .select("k", "s", "_change_type", "_commit_version")
        .as[(Int, String, String, Long)].collect().sortBy(r => (r._1, r._3)).toSeq
      assert(changes == Seq(
        (2, "b", "delete", 2L), (2, "B", "insert", 2L), (3, "c", "insert", 2L)))
    } finally q.stop()
  }

  test("readChangeFeed contradicts skipChangeCommits and is refused") {
    val dir = tmp("lss_cdc_bad")
    lakeWith(dir, Seq(1))
    val e = intercept[Exception] {
      val q = memQuery(dir, "lss_cdc_bad",
        Map("readChangeFeed" -> "true", "skipChangeCommits" -> "true"))
      try q.processAllAvailable() finally q.stop()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("contradicts")), e.toString.take(300))
  }

  test("source schema is pinned; update output mode is refused") {
    val dir = tmp("lss_refuse")
    lakeWith(dir, Seq(1))
    val e = intercept[Exception] {
      new LakeStreamSink(spark.sqlContext, dir, Map.empty, Nil, OutputMode.Update())
    }
    assert(e.getMessage.contains("Append and Complete"))
  }

  test("persistently unwritable restart mark fails the stream loudly, not silently") {
    val dir = tmp("lss_mark")
    lakeWith(dir, Seq(1, 2))
    // sabotage: the mark's metadata path nests under a plain FILE, so
    // every mkdirs/create in writeMark throws — the permanently-broken
    // checkpoint shape (unwritable dir behaves identically)
    val blocker = Files.createTempFile("graft_mark_blocker", ".f").toString
    val src = new LakeStreamSource(spark.sqlContext, dir, Map.empty,
      metadataPath = s"$blocker/sources/0")
    // transient failures only WARN (restart monotonicity degrades for that
    // window); the Nth consecutive failure must surface as an error naming
    // the mark, because a silent mark loss reintroduces restart amnesia
    src.writeMark(1L)
    src.writeMark(2L)
    val e = intercept[java.io.IOException](src.writeMark(3L))
    assert(e.getMessage.contains("restart mark") &&
      e.getMessage.contains("amnesia"), e.getMessage)
    // a recovered filesystem resets the failure budget
    val okPath = tmp("lss_mark_ok")
    val healthy = new LakeStreamSource(spark.sqlContext, dir, Map.empty,
      metadataPath = s"$okPath/sources/0")
    (1 to 5).foreach(i => healthy.writeMark(i.toLong))
  }
}
