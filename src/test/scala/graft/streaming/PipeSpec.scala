package graft.streaming

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.TestSpark

class PipeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  test("pipe drains available files exactly once across triggers") {
    val root = Files.createTempDirectory("graft_pipe").toString
    val src = s"$root/incoming"; Files.createDirectories(Paths.get(src))
    val pipe = Pipe("p1", src, "json", schema, s"$root/table", s"$root/_checkpoint")

    def drop(name: String, rows: Seq[String]): Unit =
      Files.write(Paths.get(s"$src/$name"), rows.mkString("\n").getBytes)

    drop("a.json", Seq("""{"event_id":1,"event_type":"x","value":1.5}""",
      """{"event_id":2,"event_type":"y","value":2.5}"""))
    drop("b.json", Seq("""{"event_id":3,"event_type":"x","value":3.5}"""))

    assert(Pipes.trigger(spark, pipe) == 3) // per-trigger count from stream progress
    assert(Pipes.table(spark, pipe).count() == 3)

    // re-trigger with no new files: nothing re-ingested (file-identity dedup)
    assert(Pipes.trigger(spark, pipe) == 0)
    assert(Pipes.table(spark, pipe).count() == 3)

    // late arrival: only the new file is ingested
    drop("c.json", Seq("""{"event_id":4,"event_type":"z","value":4.5}"""))
    assert(Pipes.trigger(spark, pipe) == 1)
    val rows = Pipes.table(spark, pipe)
    assert(rows.count() == 4)
    assert(rows.select("event_id").distinct().count() == 4)
  }

  test("notified pipe loads exactly the event-named files, with no source listing") {
    val root = Files.createTempDirectory("graft_pipe_notify").toString
    val spool = s"$root/spool"; Files.createDirectories(Paths.get(spool))
    val data = s"$root/data"; Files.createDirectories(Paths.get(data))
    // the pipe's FROM directory is never created: any listing-driven
    // trigger would find nothing (or fail) — loading can only come from
    // the event-named paths, which live elsewhere
    val ghost = s"$root/never-created"
    spark.sql(s"CREATE PIPE np FROM '$ghost' FORMAT json " +
      "SCHEMA 'event_id BIGINT, event_type STRING, value DOUBLE' " +
      s"INTO LAKE '$root/lake' CHECKPOINT '$root/_chk' " +
      s"NOTIFICATION_PROVIDER local_dir NOTIFICATION_QUEUE_REFERENCE '$spool'")
    def drop(name: String, rows: Seq[String]): String = {
      val p = Paths.get(s"$data/$name")
      Files.write(p, rows.mkString("\n").getBytes)
      p.toString
    }
    def notify(evt: String, path: String): Unit =
      Files.write(Paths.get(s"$spool/$evt"), path.getBytes)
    val f1 = drop("f1.json", Seq(
      """{"event_id":1,"event_type":"x","value":1.5}""",
      """{"event_id":2,"event_type":"y","value":2.5}"""))
    val f2 = drop("f2.json", Seq("""{"event_id":3,"event_type":"z","value":3.5}"""))

    // only f1 is notified: exactly its rows land, f2 is invisible
    notify("evt-001", f1)
    assert(spark.sql("TRIGGER PIPE np").collect().head.getString(1) == "2")
    val lake = graft.sources.SnapshotTable.forPath(spark, s"$root/lake")
    assert(lake.read().count() == 2L)
    assert(lake.read().filter(org.apache.spark.sql.functions.col("event_id") === 3L)
      .count() == 0L, "un-notified file must not load")
    // the event was acked (spool drained)
    assert(Pipes.get("np").isDefined)
    assert(!Files.exists(Paths.get(s"$spool/evt-001")))

    // duplicate/replayed event: the loaded-files log absorbs it
    notify("evt-002", f1)
    assert(spark.sql("TRIGGER PIPE np").collect().head.getString(1) == "0")
    assert(lake.read().count() == 2L)

    // a new event for f2 loads just f2
    notify("evt-003", f2)
    assert(spark.sql("TRIGGER PIPE np").collect().head.getString(1) == "1")
    assert(lake.read().count() == 3L)

    // no pending events → trigger is a no-op
    assert(spark.sql("TRIGGER PIPE np").collect().head.getString(1) == "0")

    // DESCRIBE PIPE surfaces the notification binding
    val desc = spark.sql("DESCRIBE PIPE np").collect().head
    assert(desc.getString(8) == s"LOCAL_DIR:$spool", desc.toString)

    // unknown provider refuses at CREATE, naming the valid set
    val ex = intercept[Exception](spark.sql(
      s"CREATE PIPE npbad FROM '$ghost' FORMAT json SCHEMA 'a BIGINT' " +
        s"INTO LAKE '$root/lake2' CHECKPOINT '$root/_chk2' " +
        s"NOTIFICATION_PROVIDER kafka NOTIFICATION_QUEUE_REFERENCE 'q'"))
    assert(ex.getMessage.contains("unknown NOTIFICATION_PROVIDER"), ex.getMessage)

    // cloud providers keep the grammar slot (reference AWS_SQS) but
    // refuse loudly at TRIGGER until an environment registers a client
    spark.sql(s"CREATE PIPE npsqs FROM '$ghost' FORMAT json SCHEMA 'a BIGINT' " +
      s"INTO LAKE '$root/lake3' CHECKPOINT '$root/_chk3' " +
      "NOTIFICATION_PROVIDER AWS_SQS " +
      "NOTIFICATION_QUEUE_REFERENCE 'https://sqs.example/queue'")
    val ex2 = intercept[Exception](spark.sql("TRIGGER PIPE npsqs"))
    assert(ex2.getMessage.contains("no client is registered"), ex2.getMessage)
    spark.sql("DROP PIPE np"); spark.sql("DROP PIPE npsqs")
  }

  test("TRIGGER PIPE FOR BATCH retries one recorded generation, absorbed when already landed") {
    val root = Files.createTempDirectory("graft_pipe_forbatch").toString
    val spool = s"$root/spool"; Files.createDirectories(Paths.get(spool))
    val data = s"$root/data"; Files.createDirectories(Paths.get(data))
    spark.sql(s"CREATE PIPE fbp FROM '$root/ghost' FORMAT json " +
      "SCHEMA 'event_id BIGINT, value DOUBLE' " +
      s"INTO LAKE '$root/lake' CHECKPOINT '$root/_chk' " +
      s"NOTIFICATION_PROVIDER local_dir NOTIFICATION_QUEUE_REFERENCE '$spool'")
    def drop(name: String, rows: Seq[String]): String = {
      val p = Paths.get(s"$data/$name")
      Files.write(p, rows.mkString("\n").getBytes); p.toString
    }
    // two generations: gen 0 loads f1 (2 rows), gen 1 loads f2 (1 row)
    Files.write(Paths.get(s"$spool/e1"),
      drop("f1.json", Seq("""{"event_id":1,"value":1.0}""",
        """{"event_id":2,"value":2.0}""")).getBytes)
    assert(spark.sql("TRIGGER PIPE fbp").collect().head.getString(1) == "2")
    Files.write(Paths.get(s"$spool/e2"),
      drop("f2.json", Seq("""{"event_id":3,"value":3.0}""")).getBytes)
    assert(spark.sql("TRIGGER PIPE fbp").collect().head.getString(1) == "1")
    val lake = graft.sources.SnapshotTable.forPath(spark, s"$root/lake")
    assert(lake.read().count() == 3L)
    // a retry of a LANDED batch is absorbed by its original tag: zero rows
    assert(spark.sql("TRIGGER PIPE fbp FOR BATCH 0").collect().head.getString(1) == "0")
    assert(spark.sql("TRIGGER PIPE fbp FOR BATCH 1").collect().head.getString(1) == "0")
    assert(lake.read().count() == 3L)
    // simulate THE crash this arm repairs: the loaded-files log advanced
    // (the file is recorded under generation 5) but its commit never
    // published — FOR BATCH 5 re-lands exactly that file, once
    val f3 = drop("f3.json", Seq("""{"event_id":9,"value":9.0}"""))
    val logFile = Paths.get(s"$root/_chk/notified-files.log")
    val old = new String(Files.readAllBytes(logFile), "UTF-8")
      .split("\n").filterNot(_.startsWith("#gen=")).mkString("\n")
    Files.write(logFile,
      (s"#gen=6\n$old\n${System.currentTimeMillis()}\t5\t$f3").getBytes)
    assert(spark.sql("TRIGGER PIPE fbp FOR BATCH 5").collect().head.getString(1) == "1")
    assert(lake.read().count() == 4L)
    // the retry is idempotent: a second FOR BATCH 5 is absorbed by the tag
    assert(spark.sql("TRIGGER PIPE fbp FOR BATCH 5").collect().head.getString(1) == "0")
    assert(lake.read().count() == 4L)
    // unknown batch ids refuse loudly; listing pipes refuse the arm
    val noBatch = intercept[Exception](spark.sql("TRIGGER PIPE fbp FOR BATCH 9"))
    assert(noBatch.getMessage.contains("no batch 9"), noBatch.getMessage.take(200))
    spark.sql(s"CREATE PIPE fbl FROM '$data' FORMAT json SCHEMA 'event_id BIGINT, value DOUBLE' " +
      s"INTO '$root/plain' CHECKPOINT '$root/_chk_plain'")
    val wrongKind = intercept[Exception](spark.sql("TRIGGER PIPE fbl FOR BATCH 0"))
    assert(wrongKind.getMessage.contains("notified"), wrongKind.getMessage.take(200))
    spark.sql("DROP PIPE fbp"); spark.sql("DROP PIPE fbl")
  }

  test("notified pipe crash-replay: pending intent pins the commit set, new events wait") {
    val root = Files.createTempDirectory("graft_pipe_pending").toString
    val spool = s"$root/spool"; Files.createDirectories(Paths.get(spool))
    val data = s"$root/data"; Files.createDirectories(Paths.get(data))
    spark.sql(s"CREATE PIPE npp FROM '$root/ghost' FORMAT json " +
      "SCHEMA 'event_id BIGINT, value DOUBLE' " +
      s"INTO LAKE '$root/lake' CHECKPOINT '$root/_chk' " +
      s"NOTIFICATION_PROVIDER LOCAL_DIR NOTIFICATION_QUEUE_REFERENCE '$spool'")
    def drop(name: String, id: Long): String = {
      val p = Paths.get(s"$data/$name")
      Files.write(p, s"""{"event_id":$id,"value":1.0}""".getBytes)
      p.toString
    }
    def notify(evt: String, path: String): Unit =
      Files.write(Paths.get(s"$spool/$evt"), path.getBytes)
    val f1 = drop("f1.json", 1L); val f2 = drop("f2.json", 2L)
    notify("e1", f1); notify("e2", f2)
    assert(spark.sql("TRIGGER PIPE npp").collect().head.getString(1) == "2")
    val lake = graft.sources.SnapshotTable.forPath(spark, s"$root/lake")
    assert(lake.read().count() == 2L)

    // simulate a crash BETWEEN the lake commit and the log advance/ack:
    // the loaded-files log never advanced (delete it) but the pending
    // intent from that trigger is on disk, and the un-acked events are
    // back in the queue — PLUS a new event for f3 arrived meanwhile.
    // Without the pinned intent, the replay would tag by the GROWN
    // polled set and re-land f1/f2 as duplicates.
    val ck = Paths.get(s"$root/_chk")
    Files.delete(ck.resolve("notified-files.log"))
    Files.write(ck.resolve("notified-pending"),
      s"#gen=0\n$f1\n$f2".getBytes("UTF-8"))
    val f3 = drop("f3.json", 3L)
    notify("e1", f1); notify("e2", f2); notify("e3", f3)
    assert(spark.sql("TRIGGER PIPE npp").collect().head.getString(1) == "0",
      "the replayed commit must be absorbed by the original generation tag")
    assert(lake.read().count() == 2L, "no duplicate rows from the replay")
    // the new event was NOT handled by the replay and must survive un-acked
    assert(Files.exists(Paths.get(s"$spool/e3")), "f3's event must stay queued")
    assert(!Files.exists(ck.resolve("notified-pending")), "intent cleared")
    // the next trigger drains f3 normally
    assert(spark.sql("TRIGGER PIPE npp").collect().head.getString(1) == "1")
    assert(lake.read().count() == 3L)
    spark.sql("DROP PIPE npp")
  }

  test("DEDUPE_LOOKBACK_PERIOD bounds the notified dedup memory; expiry re-ingests") {
    val root = Files.createTempDirectory("graft_pipe_lookback").toString
    val spool = s"$root/spool"; Files.createDirectories(Paths.get(spool))
    val data = s"$root/data"; Files.createDirectories(Paths.get(data))
    spark.sql(s"CREATE PIPE lbp DEDUPE_LOOKBACK_PERIOD 1 FROM '$root/ghost' " +
      "FORMAT json SCHEMA 'event_id BIGINT, value DOUBLE' " +
      s"INTO LAKE '$root/lake' CHECKPOINT '$root/_chk' " +
      s"NOTIFICATION_PROVIDER LOCAL_DIR NOTIFICATION_QUEUE_REFERENCE '$spool'")
    assert(spark.sql("DESCRIBE PIPE lbp").collect().head.getString(9) == "1")
    val f = Paths.get(s"$data/a.json")
    Files.write(f, """{"event_id":1,"value":1.5}""".getBytes)
    def notify(evt: String): Unit =
      Files.write(Paths.get(s"$spool/$evt"), f.toString.getBytes)
    notify("e1")
    assert(spark.sql("TRIGGER PIPE lbp").collect().head.getString(1) == "1")
    // inside the window: the duplicate event is absorbed
    notify("e2")
    assert(spark.sql("TRIGGER PIPE lbp").collect().head.getString(1) == "0")
    // age the log entry past the 1-day window (rewrite its timestamp —
    // the trim is pure arithmetic over the recorded epoch)
    val log = Paths.get(s"$root/_chk/notified-files.log")
    val aged = new String(Files.readAllBytes(log), "UTF-8").split("\n").map {
      case l if l.startsWith("#") => l
      case l =>
        val i = l.indexOf('\t')
        s"${l.substring(0, i).toLong - 2L * 86400000L}${l.substring(i)}"
    }.mkString("\n")
    Files.write(log, aged.getBytes("UTF-8"))
    // expired: the same file legitimately RE-ingests (the reference's
    // bounded-memory contract), under a NEW generation tag
    notify("e3")
    assert(spark.sql("TRIGGER PIPE lbp").collect().head.getString(1) == "1")
    val lake = graft.sources.SnapshotTable.forPath(spark, s"$root/lake")
    assert(lake.read().count() == 2L, "post-expiry re-ingest must land")
    // and the refreshed entry dedups again
    notify("e4")
    assert(spark.sql("TRIGGER PIPE lbp").collect().head.getString(1) == "0")
    spark.sql("DROP PIPE lbp")
  }

  test("pipe into a partitioned lake table: batches land clustered + pruned") {
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("graft_pipe_part").toString
    val src = s"$root/incoming"; Files.createDirectories(Paths.get(src))
    val pipe = Pipe("ppart", src, "json", schema, s"$root/lake", s"$root/_chk")
    def drop(name: String, rows: Seq[String]): Unit =
      Files.write(Paths.get(s"$src/$name"), rows.mkString("\n").getBytes)

    drop("a.json", (1 to 40).map(i =>
      s"""{"event_id":$i,"event_type":"t${i % 3}","value":$i.5}"""))
    val loaded = Pipes.triggerIntoLake(spark, pipe,
      Seq("identity(event_type)"), Seq("event_id"))
    assert(loaded == 40)
    val lake = graft.sources.SnapshotTable.forPath(spark, s"$root/lake")
    assert(lake.commits.last.partitionSpec == Seq("identity(event_type)"))
    assert(lake.commits.last.statsCols == Seq("event_id"))
    // one file per event_type partition value
    assert(lake.snapshot()._1.size == 3)
    // equality on the partition source column prunes to one file
    val one = lake.read().filter(col("event_type") === "t1")
    one.collect()
    assert(lake.read().count() == 40)
    assert(lake.scanRange("event_id", 5, 5).inputFiles.length <= 3)
    // a second batch appends three more partition files, exactly once
    drop("b.json", (41 to 46).map(i =>
      s"""{"event_id":$i,"event_type":"t${i % 3}","value":$i.5}"""))
    assert(Pipes.triggerIntoLake(spark, pipe,
      Seq("identity(event_type)"), Seq("event_id")) == 6)
    assert(lake.read().count() == 46)
    assert(lake.snapshot()._1.size == 6)
  }

  test("pipe into a lake table: one atomic commit per batch, exactly once") {
    val root = Files.createTempDirectory("graft_pipe_lake").toString
    val src = s"$root/incoming"; Files.createDirectories(Paths.get(src))
    val pipe = Pipe("pl", src, "json", schema, s"$root/lake", s"$root/_chk")
    def drop(name: String, rows: Seq[String]): Unit =
      Files.write(Paths.get(s"$src/$name"), rows.mkString("\n").getBytes)

    drop("a.json", Seq("""{"event_id":1,"event_type":"x","value":1.0}""",
      """{"event_id":2,"event_type":"y","value":2.0}"""))
    assert(Pipes.triggerIntoLake(spark, pipe) == 2)
    val lake = graft.sources.SnapshotTable.forPath(spark, s"$root/lake")
    assert(lake.read().count() == 2)
    val v1 = lake.latestVersion

    // no new files → no new commit (no empty-batch commit churn either way)
    assert(Pipes.triggerIntoLake(spark, pipe) == 0)
    assert(lake.read().count() == 2)

    // late file → exactly one more commit, atomically visible
    drop("b.json", Seq("""{"event_id":3,"event_type":"z","value":3.0}"""))
    assert(Pipes.triggerIntoLake(spark, pipe) == 1)
    assert(lake.read().count() == 3)
    assert(lake.latestVersion > v1)

    // a replayed batch id must not double-commit (idempotency tag)
    val before = lake.read().count()
    lake.appendTagged(lake.read().limit(1), "pipe:pl:batch:0")
    assert(lake.read().count() == before, "replayed batch was re-committed")
  }

  test("CDC merge pipe upserts by key, exactly once across replays") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("graft_pipe_merge").toString
    val src = s"$root/cdc"; Files.createDirectories(Paths.get(src))
    val pipe = Pipe("pm", src, "json", schema, s"$root/lake", s"$root/_chk")
    def drop(name: String, rows: Seq[String]): Unit =
      Files.write(Paths.get(s"$src/$name"), rows.mkString("\n").getBytes)

    // seed snapshot
    val lake = graft.sources.SnapshotTable.create(spark, s"$root/lake",
      Seq((1L, "x", 1.0), (2L, "y", 2.0), (3L, "z", 3.0))
        .toDF("event_id", "event_type", "value"))

    // batch 1: update key 2, insert key 4
    drop("c1.json", Seq("""{"event_id":2,"event_type":"y","value":20.0}""",
      """{"event_id":4,"event_type":"w","value":4.0}"""))
    assert(Pipes.triggerMergeIntoLake(spark, pipe, "event_id") == 2)
    val got = lake.read().orderBy("event_id")
      .select("event_id", "value").as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, 1.0), (2L, 20.0), (3L, 3.0), (4L, 4.0)))
    val v1 = lake.latestVersion

    // nothing new → no commit
    assert(Pipes.triggerMergeIntoLake(spark, pipe, "event_id") == 0)
    assert(lake.latestVersion == v1)

    // batch 2: update key 1
    drop("c2.json", Seq("""{"event_id":1,"event_type":"x","value":10.0}"""))
    assert(Pipes.triggerMergeIntoLake(spark, pipe, "event_id") == 1)
    assert(lake.read().filter(col("event_id") === 1L)
      .select("value").as[Double].head() == 10.0)

    // simulated checkpoint-recovery replay: the same batch tag applies
    // nothing and returns the original commit version
    val vNow = lake.latestVersion
    val replayed = lake.mergeByKeyTagged(
      Seq((1L, "x", 999.0)).toDF("event_id", "event_type", "value"),
      "event_id", s"merge:pm:batch:1")
    assert(replayed <= vNow)
    assert(lake.latestVersion == vNow, "replayed tag must not commit")
    assert(lake.read().filter(col("event_id") === 1L)
      .select("value").as[Double].head() == 10.0)
  }

  test("incremental rollup maintenance matches a full batch recompute") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_pipe_rollup").toString
    val src = s"$root/incoming"; Files.createDirectories(Paths.get(src))
    val pipe = Pipe("pr", src, "json", schema, s"$root/unused", s"$root/_chk")
    def drop(name: String, rows: Seq[String]): Unit =
      Files.write(Paths.get(s"$src/$name"), rows.mkString("\n").getBytes)

    drop("a.json", Seq(
      """{"event_id":1,"event_type":"x","value":1.0}""",
      """{"event_id":2,"event_type":"y","value":2.0}""",
      """{"event_id":3,"event_type":"x","value":3.0}"""))
    Pipes.triggerIncrementalRollup(spark, pipe,
      Seq("event_type"), Seq("value"), s"$root/mv")
    val lake = graft.sources.SnapshotTable.forPath(spark, s"$root/mv")
    assert(lake.read().orderBy("event_type").as[(String, Double)].collect().toSeq ==
      Seq(("x", 4.0), ("y", 2.0)))

    // second batch combines with the existing materialization
    drop("b.json", Seq(
      """{"event_id":4,"event_type":"x","value":10.0}""",
      """{"event_id":5,"event_type":"z","value":5.0}"""))
    Pipes.triggerIncrementalRollup(spark, pipe,
      Seq("event_type"), Seq("value"), s"$root/mv")
    val got = lake.read().orderBy("event_type").as[(String, Double)].collect().toSeq
    assert(got == Seq(("x", 14.0), ("y", 2.0), ("z", 5.0)),
      s"incremental result diverged from batch recompute: $got")

    // replayed batch tag → no double count
    val v = lake.latestVersion
    lake.overwriteTagged(lake.read(), "rollup:pr:batch:0")
    assert(lake.latestVersion == v, "replayed rollup batch re-committed")
  }

  test("pipe lifecycle DDL: ALTER status pauses, DESCRIBE reflects, DROP removes") {
    val root = Files.createTempDirectory("graft_pipe_ddl").toString
    val src = s"$root/in"; Files.createDirectories(Paths.get(src))
    Files.write(Paths.get(s"$src/a.json"),
      """{"event_id":1,"event_type":"x","value":1.0}""".getBytes)

    spark.sql(s"CREATE PIPE pddl FROM '$src' FORMAT json " +
      s"SCHEMA 'event_id BIGINT, event_type STRING, value DOUBLE' " +
      s"INTO '$root/out' CHECKPOINT '$root/_ck'")

    // pause → TRIGGER refuses; DESCRIBE shows running=false
    spark.sql("ALTER PIPE pddl SET PIPE_EXECUTION_RUNNING = FALSE")
    val paused = intercept[Exception](spark.sql("TRIGGER PIPE pddl"))
    assert(paused.getMessage.contains("paused"))
    val desc = spark.sql("DESCRIBE PIPE pddl").collect().head
    assert(desc.getString(0) == "pddl" && desc.getString(7) == "false")

    // resume → TRIGGER drains
    spark.sql("ALTER PIPE pddl SET PIPE_EXECUTION_RUNNING = TRUE")
    assert(spark.sql("TRIGGER PIPE pddl").collect().head.getString(1) == "1")

    // ALTER redefinition keeps the name but swaps the source; pipe must exist
    val src2 = s"$root/in2"; Files.createDirectories(Paths.get(src2))
    Files.write(Paths.get(s"$src2/b.json"),
      """{"event_id":2,"event_type":"y","value":2.0}""".getBytes)
    spark.sql(s"ALTER PIPE pddl FROM '$src2' FORMAT json " +
      s"SCHEMA 'event_id BIGINT, event_type STRING, value DOUBLE' " +
      s"INTO '$root/out' CHECKPOINT '$root/_ck2'")
    assert(Pipes.get("pddl").get.sourceDir == src2)
    val noSuch = intercept[Exception](
      spark.sql(s"ALTER PIPE ghost FROM '$src2' FORMAT json " +
        s"SCHEMA 'event_id BIGINT' INTO '$root/out' CHECKPOINT '$root/_ck3'"))
    assert(noSuch.getMessage.contains("unknown pipe"))

    // DROP: strict without IF EXISTS, quiet with
    spark.sql("DROP PIPE pddl")
    assert(Pipes.get("pddl").isEmpty)
    intercept[Exception](spark.sql("DROP PIPE pddl"))
    spark.sql("DROP PIPE IF EXISTS pddl") // no-op, no throw
  }

  test("FORMAT WARC pipe: notified web-archive ingestion, exactly-once into the lake") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_pipe_warc").toString
    val spool = s"$root/spool"; Files.createDirectories(Paths.get(spool))
    val drops = s"$root/drops"; Files.createDirectories(Paths.get(drops))
    // a listing WARC pipe refuses at CREATE; schema must be the WET shape
    val e1 = intercept[Exception] {
      spark.sql(s"CREATE PIPE wp_bad FROM '$root/x' FORMAT warc " +
        "SCHEMA 'target_uri STRING, warc_date STRING, text STRING' " +
        s"INTO LAKE '$root/lake0' CHECKPOINT '$root/_chk0'")
    }
    assert(e1.getMessage.contains("NOTIFICATION_PROVIDER"))
    val e2 = intercept[Exception] {
      spark.sql(s"CREATE PIPE wp_bad2 FROM '$root/x' FORMAT warc " +
        "SCHEMA 'a INT' " +
        s"INTO LAKE '$root/lake0' CHECKPOINT '$root/_chk0' " +
        s"NOTIFICATION_PROVIDER local_dir NOTIFICATION_QUEUE_REFERENCE '$spool'")
    }
    assert(e2.getMessage.contains("WET text shape"))
    spark.sql(s"CREATE PIPE wp FROM '$root/never-created' FORMAT warc " +
      "SCHEMA 'target_uri STRING, warc_date STRING, text STRING' " +
      s"INTO LAKE '$root/lake' CHECKPOINT '$root/_chk' " +
      s"NOTIFICATION_PROVIDER local_dir NOTIFICATION_QUEUE_REFERENCE '$spool'")
    // two archive drops; only the first is notified
    graft.sources.WarcFiles.write(Seq(
      ("https://w.example/1", "warc pipe doc one"),
      ("https://w.example/2", "warc pipe doc two")).toDF("target_uri", "text")
      .repartition(1), s"$drops/a")
    graft.sources.WarcFiles.write(Seq(
      ("https://w.example/3", "warc pipe doc three")).toDF("target_uri", "text")
      .repartition(1), s"$drops/b")
    val fa = new java.io.File(s"$drops/a").listFiles()
      .filter(_.getName.endsWith(".warc.gz")).head.getAbsolutePath
    val fb = new java.io.File(s"$drops/b").listFiles()
      .filter(_.getName.endsWith(".warc.gz")).head.getAbsolutePath
    Files.write(Paths.get(s"$spool/e1"), fa.getBytes)
    assert(spark.sql("TRIGGER PIPE wp").collect().head.getString(1) == "2")
    val lake = graft.sources.SnapshotTable.forPath(spark, s"$root/lake")
    assert(lake.read().count() == 2L)
    assert(lake.read().select("text").as[String].collect().toSet ==
      Set("warc pipe doc one", "warc pipe doc two"))
    // duplicate event absorbed by the loaded-files log
    Files.write(Paths.get(s"$spool/e2"), fa.getBytes)
    assert(spark.sql("TRIGGER PIPE wp").collect().head.getString(1) == "0")
    // the second archive lands exactly once
    Files.write(Paths.get(s"$spool/e3"), fb.getBytes)
    assert(spark.sql("TRIGGER PIPE wp").collect().head.getString(1) == "1")
    assert(lake.read().count() == 3L)
    spark.sql("DROP PIPE wp")
  }

  test("FORMAT WARC HTTP pipe: raw responses land charset-decoded; html_to_text extracts") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_pipe_warc_http").toString
    val spool = s"$root/spool"; Files.createDirectories(Paths.get(spool))
    val drops = s"$root/drops"
    // one UTF-8 page, one ISO-8859-1 page (the DECLARED charset must
    // drive the decode — its bytes are not valid UTF-8), one 404
    val pages = Seq(
      ("https://w.example/u8", "<html><body>héllo 中文</body></html>",
        "text/html; charset=UTF-8", 200),
      ("https://w.example/l1", "<html><body>café latin</body></html>",
        "text/html; charset=ISO-8859-1", 200),
      ("https://w.example/nf", "<html><body>gone</body></html>", "text/html", 404))
    val rows = pages.map { case (uri, html, ct, status) =>
      val cs = if (ct.contains("8859")) java.nio.charset.Charset.forName("ISO-8859-1")
               else java.nio.charset.StandardCharsets.UTF_8
      val head = s"HTTP/1.1 $status X\r\nContent-Type: $ct\r\n\r\n".getBytes("UTF-8")
      (uri, head ++ html.getBytes(cs))
    }
    graft.sources.WarcFiles.write(
      rows.toDF("target_uri", "payload").repartition(1), drops,
      warcType = "response")
    val f = new java.io.File(drops).listFiles()
      .filter(_.getName.endsWith(".warc.gz")).head.getAbsolutePath
    spark.sql(s"CREATE PIPE wph FROM '$root/never' FORMAT warc " +
      "SCHEMA 'target_uri STRING, warc_date STRING, http_status INT, " +
      "http_content_type STRING, html STRING' " +
      s"INTO LAKE '$root/lake' CHECKPOINT '$root/_chk' " +
      s"NOTIFICATION_PROVIDER local_dir NOTIFICATION_QUEUE_REFERENCE '$spool'")
    Files.write(Paths.get(s"$spool/e1"), f.getBytes)
    assert(spark.sql("TRIGGER PIPE wph").collect().head.getString(1) == "3")
    val lake = graft.sources.SnapshotTable.forPath(spark, s"$root/lake").read()
    val byUri = lake.collect().map(r => r.getAs[String]("target_uri") -> r).toMap
    assert(byUri("https://w.example/u8").getAs[String]("html")
      .contains("héllo 中文"))
    assert(byUri("https://w.example/l1").getAs[String]("html")
      .contains("café latin"), "declared ISO-8859-1 must drive the decode")
    assert(byUri("https://w.example/nf").getAs[Int]("http_status") == 404)
    // the raw-crawl pipeline's next stage: extract text from landed HTML
    val texts = graft.llm.TextAnalysis.htmlExtract(lake.select("html"))
      .select("text").as[String].collect().toSet
    assert(texts.exists(_.contains("café latin")), texts.toString)
    assert(texts.exists(_.contains("héllo 中文")))
    spark.sql("DROP PIPE wph")
  }

  test("EXPECT gates the pipe: drop quarantines with attribution, warn passes, fail aborts pre-commit") {
    val root = Files.createTempDirectory("graft_pipe_expect").toString
    val src = s"$root/incoming"; Files.createDirectories(Paths.get(src))
    def drop(name: String, rows: Seq[String]): Unit =
      Files.write(Paths.get(s"$src/$name"), rows.mkString("\n").getBytes)

    // full SQL surface: two-rule gate on a lake-sink pipe
    graft.sources.SnapshotTable.create(spark, s"$root/lake",
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema))
    spark.sql(s"""CREATE PIPE pexp FROM '$src' FORMAT json
      SCHEMA 'event_id BIGINT, event_type STRING, value DOUBLE'
      INTO LAKE '$root/lake' CHECKPOINT '$root/_chk'
      EXPECT positive_value AS (value > 0) ON VIOLATION DROP,
             known_type AS (event_type IN ('x','y')) ON VIOLATION WARN""")
    val desc = spark.sql("DESCRIBE PIPE pexp").head()
    assert(desc.getAs[String]("expectations").contains("positive_value"))

    drop("a.json", Seq(
      """{"event_id":1,"event_type":"x","value":1.5}""",
      """{"event_id":2,"event_type":"z","value":2.5}""", // warn only -> kept
      """{"event_id":3,"event_type":"x","value":-9.0}""")) // drop
    val loaded = spark.sql("TRIGGER PIPE pexp").head().getString(1).toLong
    assert(loaded == 2, s"drop violator must not land: $loaded")
    val lake = graft.sources.SnapshotTable.forPath(spark, s"$root/lake")
    assert(lake.read().select("event_id").collect().map(_.getLong(0)).sorted
      .toSeq == Seq(1L, 2L))
    // quarantine has the dropped row, attributed
    val pipe = Pipes.get("pexp").get
    val q = spark.read.parquet(Pipes.quarantineDir(pipe))
    val qr = q.selectExpr("event_id", "array_join(violated_rules, ',')",
      "pipe").collect()
    assert(qr.length == 1 && qr.head.getLong(0) == 3L)
    assert(qr.head.getString(1) == "positive_value" && qr.head.getString(2) == "pexp")

    // FAIL aborts the trigger BEFORE the batch commits; after the gate is
    // relaxed the SAME files retry and land (the checkpoint never advanced)
    spark.sql("DROP PIPE pexp")
    spark.sql(s"""CREATE PIPE pexp2 FROM '$src/f2' FORMAT json
      SCHEMA 'event_id BIGINT, event_type STRING, value DOUBLE'
      INTO LAKE '$root/lake2' CHECKPOINT '$root/_chk2'
      EXPECT no_nulls AS (event_id IS NOT NULL) ON VIOLATION FAIL""")
    Files.createDirectories(Paths.get(s"$src/f2"))
    graft.sources.SnapshotTable.create(spark, s"$root/lake2",
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema))
    Files.write(Paths.get(s"$src/f2/bad.json"),
      """{"event_type":"x","value":1.0}""".getBytes)
    val lake2 = graft.sources.SnapshotTable.forPath(spark, s"$root/lake2")
    val v0 = lake2.latestVersion
    val e = intercept[Exception](spark.sql("TRIGGER PIPE pexp2").collect())
    def rootMsg(t: Throwable): String = {
      var c: Throwable = t
      val b = new StringBuilder
      while (c != null) { b.append(Option(c.getMessage).getOrElse("")); c = c.getCause }
      b.toString
    }
    assert(rootMsg(e).contains("no_nulls"), s"fail must name the rule: $e")
    assert(lake2.latestVersion == v0, "a failed batch must not commit")
    spark.sql("DROP PIPE pexp2")

    // CREATE-time validation: a typo'd column refuses immediately
    val bad = intercept[Exception](spark.sql(
      s"""CREATE PIPE pbad FROM '$src' FORMAT json
        SCHEMA 'event_id BIGINT' INTO '$root/t3' CHECKPOINT '$root/_c3'
        EXPECT oops AS (no_such_col > 0) ON VIOLATION DROP"""))
    assert(bad.getMessage.contains("does not resolve"), bad.getMessage)

    // CDC pipes take EXPECT too, and the clause splitter honors quoted
    // literals containing parens/commas
    spark.sql(s"""CREATE PIPE pcdc FROM '$src' FORMAT json
      SCHEMA 'event_id BIGINT, event_type STRING, value DOUBLE'
      MERGE KEY event_id INTO LAKE '$root/lake' CHECKPOINT '$root/_c4'
      EXPECT no_paren AS (event_type NOT LIKE '%)%') ON VIOLATION DROP,
             pos AS (value > 0)""")
    val cdcDesc = spark.sql("DESCRIBE PIPE pcdc").head()
      .getAs[String]("expectations")
    assert(cdcDesc.contains("no_paren") && cdcDesc.contains("'%)%'") &&
      cdcDesc.contains("pos AS (value > 0) ON VIOLATION WARN"), cdcDesc)
    spark.sql("DROP PIPE pcdc")

    // a schema column colliding with the quarantine metadata refuses
    val clash = intercept[Exception](spark.sql(
      s"""CREATE PIPE pclash FROM '$src' FORMAT json
        SCHEMA 'pipe STRING, v INT' INTO '$root/t5' CHECKPOINT '$root/_c5'
        EXPECT r AS (v > 0) ON VIOLATION DROP"""))
    assert(clash.getMessage.contains("collide"), clash.getMessage)
  }
}
