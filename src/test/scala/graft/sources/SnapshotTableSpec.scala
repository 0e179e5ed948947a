package graft.sources

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SnapshotTableSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
  import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
  private def findScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => findScans(a.executedPlan)
    case s: QueryStageExec => findScans(s.plan)
    case f: FileSourceScanExec => Seq(f)
    case other => other.children.flatMap(findScans)
  }

  /** Execute and report how many data files the scan actually opened. */
  private def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    findScans(df.queryExecution.executedPlan).map(_.metrics("numFiles").value).sum
  }

  test("create + append + read roundtrip with schema from the log") {
    val dir = fresh("lake_rt")
    val t = SnapshotTable.create(spark, dir,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    t.append(Seq((3L, "c")).toDF("id", "v"))
    val got = t.read().orderBy("id").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    assert(t.latestVersion == 2L)
  }

  test("time travel: VERSION AS OF and TIMESTAMP AS OF") {
    val dir = fresh("lake_tt")
    val t = SnapshotTable.create(spark, dir, Seq((1L, "a")).toDF("id", "v"))
    val tsAfterV1 = System.currentTimeMillis()
    Thread.sleep(5)
    t.overwrite(Seq((9L, "z")).toDF("id", "v"))
    assert(t.asOf(1L).as[(Long, String)].collect().toSeq == Seq((1L, "a")))
    assert(t.read().as[(Long, String)].collect().toSeq == Seq((9L, "z")))
    assert(t.asOfTimestamp(tsAfterV1).as[(Long, String)].collect().toSeq == Seq((1L, "a")))
  }

  test("snapshot isolation: a reader pinned before a merge sees the old data") {
    val dir = fresh("lake_iso")
    val t = SnapshotTable.create(spark, dir,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val pinned = t.read() // file list resolved here
    t.mergeByKey(Seq((2L, "B"), (3L, "c")).toDF("id", "v"), "id")
    // post-merge view
    assert(t.read().orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "B"), (3L, "c")))
    // the in-flight reader still sees the pre-merge snapshot (old files are
    // never deleted by a commit)
    assert(pinned.orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b")))
    // and time travel to v1 agrees with it
    assert(t.asOf(1L).orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b")))
  }

  test("crash window: orphan data files without a commit are invisible") {
    val dir = fresh("lake_crash")
    val t = SnapshotTable.create(spark, dir, Seq((1L, "a")).toDF("id", "v"))
    // simulate a writer that died after writing data but before committing
    Seq((99L, "orphan")).toDF("id", "v").write.parquet(s"$dir/data-deadbeef")
    assert(t.read().as[(Long, String)].collect().toSeq == Seq((1L, "a")))
  }

  test("a dead writer's leftover commit.lock file does not block commits") {
    val dir = fresh("lake_race")
    val t = SnapshotTable.create(spark, dir, Seq((1L, "a")).toDF("id", "v"))
    // a crashed writer leaves the lock FILE behind, but the OS advisory
    // lock died with the process — acquisition must proceed immediately
    val lock = Paths.get(dir, SnapshotTable.LogDirName, "commit.lock")
    if (!Files.exists(lock)) Files.createFile(lock)
    val v = t.append(Seq((2L, "b")).toDF("id", "v"))
    assert(v == 2L, "leftover lock file must not block the commit")
    assert(t.read().count() == 2)
  }

  test("replayed tagged commits under concurrency land exactly once") {
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val dir = fresh("lake_tagrace")
    val t = SnapshotTable.create(spark, dir, Seq((1L, "a")).toDF("id", "v"))
    val dfs = (1 to 4).map(_ => Seq((9L, "dup")).toDF("id", "v"))
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      // four writers race the SAME idempotency tag — exactly one commits
      val versions = Await.result(
        Future.sequence(dfs.map(df => Future(t.appendTagged(df, "batch:7")))), 180.seconds)
      assert(versions.toSet.size == 1, s"same-tag writers double-committed: $versions")
    } finally pool.shutdown()
    assert(t.commits.count(_.tag == "batch:7") == 1)
    assert(t.read().filter(col("id") === 9L).count() == 1)
  }

  test("8 threads appending concurrently each get a distinct committed version") {
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val dir = fresh("lake_threads")
    val t = SnapshotTable.forPath(spark, dir)
    val dfs = (1 to 8).map(i => Seq((i.toLong, s"w$i")).toDF("id", "v"))
    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val versions = Await.result(
        Future.sequence(dfs.map(df => Future(t.append(df)))), 180.seconds)
      assert(versions.toSet.size == 8, s"version collision: $versions")
      assert(versions.toSet == (1L to 8L).toSet, s"non-contiguous versions: $versions")
    } finally pool.shutdown()
    assert(t.latestVersion == 8L)
    assert(t.read().orderBy("id").as[(Long, String)].collect().toSeq ==
      (1 to 8).map(i => (i.toLong, s"w$i")))
  }

  test("incremental scan returns only the requested commit range") {
    val dir = fresh("lake_inc")
    val t = SnapshotTable.forPath(spark, dir)
    t.append(Seq((1L, "a")).toDF("id", "v"))
    t.append(Seq((2L, "b")).toDF("id", "v"))
    t.append(Seq((3L, "c")).toDF("id", "v"))
    assert(t.changes(1L, 3L).orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((2L, "b"), (3L, "c")))
    // an overwrite inside the range is rejected (not add-only)
    t.overwrite(Seq((9L, "z")).toDF("id", "v"))
    intercept[IllegalArgumentException] { t.changes(1L, 4L) }
  }

  test("DELETE WHERE removes only matching rows, as one commit") {
    val dir = fresh("lake_del")
    val t = SnapshotTable.create(spark, dir,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
    t.deleteWhere(col("id") === 2)
    assert(t.read().orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (3L, "c")))
    assert(t.latestVersion == 2L)
    // pre-delete snapshot still time-travelable
    assert(t.asOf(1L).count() == 3)
  }

  test("UPDATE SET rewrites matching rows copy-on-write") {
    val dir = fresh("lake_upd")
    val t = SnapshotTable.create(spark, dir,
      Seq((1L, 10.0), (2L, 20.0)).toDF("id", "x"))
    t.updateWhere(col("id") === 2, Map("x" -> lit(99.0)))
    assert(t.read().orderBy("id").as[(Long, Double)].collect().toSeq ==
      Seq((1L, 10.0), (2L, 99.0)))
  }

  test("UPDATE SET resolves case-insensitively and fails on unknown columns") {
    val dir = fresh("lake_updres")
    val t = SnapshotTable.create(spark, dir, Seq((1L, 10.0)).toDF("id", "x"))
    // differently-cased SET key resolves (Spark's default resolver contract)
    t.updateWhere(col("id") === 1, Map("X" -> lit(5.0)))
    assert(t.read().as[(Long, Double)].collect().toSeq == Seq((1L, 5.0)))
    // unknown column must throw, not silently rewrite identical data
    intercept[IllegalArgumentException] {
      t.updateWhere(col("id") === 1, Map("nope" -> lit(1.0)))
    }
  }

  test("UPDATE SET reads pre-update values: a,b swap works (SQL semantics)") {
    val dir = fresh("lake_swap")
    val t = SnapshotTable.create(spark, dir,
      Seq((1L, 10.0, 20.0)).toDF("id", "a", "b"))
    t.updateWhere(col("id") === 1, Map("a" -> col("b"), "b" -> col("a")))
    assert(t.read().as[(Long, Double, Double)].collect().toSeq ==
      Seq((1L, 20.0, 10.0)), "SET a=b, b=a must swap, not chain")
  }

  test("schema evolution across commits: latest schema wins, old files read NULL") {
    val dir = fresh("lake_evo")
    val t = SnapshotTable.forPath(spark, dir)
    t.append(Seq((1L, "a")).toDF("id", "v"))
    t.append(Seq((2L, "b", 9.5)).toDF("id", "v", "score")) // column added
    val now = t.read().orderBy("id").collect()
    assert(now.map(_.schema.fieldNames.toSeq).head == Seq("id", "v", "score"))
    assert(now(0).isNullAt(2), "pre-evolution rows must read NULL for the new column")
    assert(now(1).getDouble(2) == 9.5)
    // time travel to v1 sees the ORIGINAL two-column schema
    assert(t.asOf(1L).schema.fieldNames.toSeq == Seq("id", "v"))
    // stats on the evolved column still prune (no stats on old file → kept)
    t.appendWithStats(Seq((3L, "c", 50.0)).toDF("id", "v", "score"), Seq("score"))
    assert(t.scanRange("score", 40, 60).count() == 1)
  }

  test("footer-exact commit stats equal the read-back job's, floats fall back") {
    // r17: commits whose requested stats are all integral/boolean take
    // min/max + row counts from the parquet footers (no Spark job); a
    // float/double stats column forces the distributed read-back job.
    // Both paths must record IDENTICAL manifest strings for shared data.
    val data = Seq[(java.lang.Long, java.lang.Double)](
      (-5L, 1.5), (100L, -2.25), (null, 3.5), (7L, null))
    val df = data.toDF("k", "x").coalesce(1)
    val tInt = SnapshotTable.forPath(spark, fresh("lake_fstats_int"))
    tInt.appendWithStats(df, Seq("k")) // integral only → footer path
    val tMix = SnapshotTable.forPath(spark, fresh("lake_fstats_mix"))
    tMix.appendWithStats(df, Seq("k", "x")) // double present → read-back job
    def statOf(t: SnapshotTable, c: String): Seq[(String, String)] =
      t.snapshotWithStats()._1.flatMap(_._2.get(c))
    assert(statOf(tInt, "k") == Seq(("-5", "100")),
      s"footer-path long stats: ${statOf(tInt, "k")}")
    assert(statOf(tInt, "k") == statOf(tMix, "k"),
      "footer stats must equal the read-back job's for the same data")
    assert(statOf(tMix, "x") == Seq(("-2.25", "3.5")))
    assert(tInt.manifestRowCount.contains(4L) && tMix.manifestRowCount.contains(4L))
    // all-null integral column records ("null","null"), exactly like the job
    val tN = SnapshotTable.forPath(spark, fresh("lake_fstats_null"))
    tN.appendWithStats(Seq[java.lang.Long](null, null).toDF("k").coalesce(1), Seq("k"))
    assert(statOf(tN, "k") == Seq(("null", "null")))
    assert(tN.manifestRowCount.contains(2L))
    // pruning serves off the footer-derived stats
    assert(tInt.scanRange("k", 0, 50).count() == 1)
  }

  test("column rename is id-stable: old files serve values under the new name") {
    val dir = fresh("lake_rename")
    val t = SnapshotTable.create(spark, dir, Seq((1L, "alpha"), (2L, "beta")).toDF("id", "v"))
    t.renameColumn("v", "label")
    // rows written BEFORE the rename must serve their values under the new
    // name (name-based evolution would NULL them: rename = drop+add)
    assert(t.read().schema.fieldNames.toSeq == Seq("id", "label"))
    assert(t.read().orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "alpha"), (2L, "beta")))
    // post-rename appends mix with pre-rename files transparently
    t.append(Seq((3L, "gamma")).toDF("id", "label"))
    assert(t.read().orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")))
    // time travel to the pre-rename version shows the OLD name + values
    assert(t.asOf(1L).schema.fieldNames.toSeq == Seq("id", "v"))
    assert(t.asOf(1L).orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "alpha"), (2L, "beta")))
    // filters on the renamed column work across old and new files
    assert(t.read().filter(col("label") === "alpha").count() == 1)
    // guard rails
    intercept[IllegalArgumentException] { t.renameColumn("nope", "x") }
    intercept[IllegalArgumentException] { t.renameColumn("id", "label") }
  }

  test("rename chains and copy-on-write DML over renamed history stay correct") {
    val dir = fresh("lake_rename2")
    val t = SnapshotTable.create(spark, dir, Seq((1L, 10.0), (2L, 20.0)).toDF("id", "amt"))
    t.renameColumn("amt", "value")
    t.renameColumn("value", "total") // chained rename: id survives twice
    assert(t.read().orderBy("id").as[(Long, Double)].collect().toSeq ==
      Seq((1L, 10.0), (2L, 20.0)))
    // copy-on-write UPDATE over the renamed table (reads old files by id)
    t.updateWhere(col("id") === 1, Map("total" -> lit(99.0)))
    assert(t.read().orderBy("id").as[(Long, Double)].collect().toSeq ==
      Seq((1L, 99.0), (2L, 20.0)))
    // a NEW column re-using the rename-freed name must NOT resurrect the
    // old column's data from pre-rename files (distinct field id)
    val t2dir = fresh("lake_rename3")
    val t2 = SnapshotTable.create(spark, t2dir, Seq((1L, "secret")).toDF("id", "v"))
    t2.renameColumn("v", "w")
    t2.append(Seq((2L, "x", "fresh")).toDF("id", "w", "v"))
    val rows = t2.read().orderBy("id").collect()
    assert(rows(0).getAs[String]("w") == "secret", "renamed column lost history")
    assert(rows(0).isNullAt(rows(0).fieldIndex("v")),
      s"re-added name 'v' must read NULL from pre-rename files, got ${rows(0)}")
    assert(rows(1).getAs[String]("v") == "fresh")
  }

  test("ANSI merge: first matching clause per row, delete/update/insert/no-op") {
    import SnapshotTable.{MatchedAction, WhenMatched, WhenNotMatched}
    val dir = fresh("lake_ansimerge")
    val t = SnapshotTable.create(spark, dir,
      (1L to 10L).map(i => (i, i.toDouble)).toDF("id", "bal"))
    val delta = Seq(
      (2L, -5.0),  // matched, s.bal < 0  -> DELETE
      (3L, 7.0),   // matched, s.bal > 0  -> UPDATE bal = t.bal + s.bal
      (4L, 0.0),   // matched, NO clause  -> row unchanged
      (11L, 11.0), // unmatched           -> INSERT
      (12L, 12.0)).toDF("id", "bal")
    t.merge(delta, "id",
      Seq(WhenMatched(Some("s.bal < 0"), MatchedAction.Delete),
        WhenMatched(Some("s.bal > 0"),
          MatchedAction.Update(Seq("bal" -> "t.bal + s.bal")))),
      Some(WhenNotMatched(None)))
    val got = t.read().orderBy("id").as[(Long, Double)].collect().toSeq
    val expected = Seq(1L -> 1.0, 3L -> 10.0, 4L -> 4.0, 5L -> 5.0, 6L -> 6.0,
      7L -> 7.0, 8L -> 8.0, 9L -> 9.0, 10L -> 10.0, 11L -> 11.0, 12L -> 12.0)
    assert(got == expected)
    // UPDATE SET * takes every column from the source
    t.merge(Seq((5L, 500.0)).toDF("id", "bal"), "id",
      Seq(WhenMatched(None, MatchedAction.UpdateAll)), None)
    assert(t.read().filter($"id" === 5L).head().getDouble(1) == 500.0)
    // a conditioned NOT MATCHED clause filters inserts
    t.merge(Seq((20L, -1.0), (21L, 1.0)).toDF("id", "bal"), "id",
      Nil, Some(WhenNotMatched(Some("s.bal > 0"))))
    assert(t.read().filter($"id" >= 20L).as[(Long, Double)].collect().toSeq ==
      Seq(21L -> 1.0))
    // duplicate source keys are rejected (ANSI: one source row per target)
    val err = intercept[IllegalArgumentException] {
      t.merge(Seq((1L, 1.0), (1L, 2.0)).toDF("id", "bal"), "id",
        Seq(WhenMatched(None, MatchedAction.UpdateAll)), None)
    }
    assert(err.getMessage.contains("duplicate"))
  }

  test("changesBetween: row-level CDC reads only the files the range touched") {
    val dir = fresh("lake_cdc")
    val t = SnapshotTable.forPath(spark, dir)
    // v1: 4 range-clustered files with stats, so DML rewrites stay partial
    t.appendWithStats(
      (0L until 400L).map(i => (i, i.toDouble)).toDF("id", "bal")
        .repartitionByRange(4, col("id")),
      Seq("id"))
    // v2: delete a narrow slice (one file's range)
    t.deleteWhere(col("id") >= 10 && col("id") <= 19)
    // v3: update another narrow slice
    t.updateWhere(col("id") === 250L, Map("bal" -> lit(9999.0)))
    val changes = t.changesBetween(1L, 3L)
    val got = changes.orderBy("id", "_change_type")
      .as[(Long, Double, String)].collect().toSeq
    val expected =
      ((10L to 19L).map(i => (i, i.toDouble, "delete")) ++
        Seq((250L, 250.0, "delete"), (250L, 9999.0, "insert"))).sortBy(r => (r._1, r._3))
    assert(got == expected)
    // O(changed files): the diff never opens files carried by reference
    val (allAtV3, _) = t.snapshot(Some(3L))
    val touched = changes.inputFiles.toSet
    assert(touched.size < allAtV3.size + t.snapshot(Some(1L))._1.size,
      "CDC should read only added+removed files, not both full snapshots")
    // changes across an overwrite stay exact (multiset diff, not add-only);
    // bal = -1 so no overwrite row coincides with a v3 row and cancels
    t.overwrite((0L until 5L).map(i => (i, -1.0)).toDF("id", "bal"))
    val afterOv = t.changesBetween(3L, 4L)
    assert(afterOv.filter($"_change_type" === "insert").count() == 5L)
    assert(afterOv.filter($"_change_type" === "delete").count() ==
      t.asOf(3L).count())
  }

  test("branches stage commits invisibly and fast-forward merge atomically (WAP)") {
    val dir = fresh("lake_wap")
    val t = SnapshotTable.create(spark, dir,
      (1L to 100L).map(i => (i, "base")).toDF("id", "src"))
    t.createBranch("etl")
    // stage two appends on the branch
    t.appendToBranch("etl", Seq((101L, "staged")).toDF("id", "src"))
    t.appendToBranch("etl", Seq((102L, "staged")).toDF("id", "src"))
    // audit: branch sees everything, main sees none of it
    assert(t.readRef("etl").count() == 102L)
    assert(t.read().count() == 100L)
    assert(t.latestVersion == 1L)
    // publish: one atomic overwrite commit lands the final state
    val v = t.mergeBranch("etl")
    assert(v == 2L)
    assert(t.read().count() == 102L)
    assert(t.read().filter($"src" === "staged").count() == 2L)
    assert(t.commits.size == 2)
    // the branch is gone after the merge
    intercept[IllegalArgumentException](t.readRef("etl"))
    // a branch whose base was overtaken three-way merges: the branch's
    // append and main's post-fork commits are disjoint diffs, so both
    // sides' rows land (concurrent ingest no longer forces a re-stage)
    t.createBranch("late", atVersion = Some(1L))
    t.appendToBranch("late", Seq((999L, "x")).toDF("id", "src"))
    t.mergeBranch("late")
    assert(t.read().count() == 103L)
    assert(t.read().filter($"id" === 999L).count() == 1L)
    // tags pin a version immutably and reject commits
    t.createTag("audit_v1", Some(1L))
    assert(t.readRef("audit_v1").count() == 100L)
    intercept[IllegalArgumentException](
      t.appendToBranch("audit_v1", Seq((1L, "y")).toDF("id", "src")))
    assert(t.listRefs.map(r => (r.name, r.refType, r.baseVersion)) ==
      Seq(("audit_v1", "tag", 1L)))
  }

  test("three-way MERGE BRANCH: commuting diffs merge, same-file rewrites conflict") {
    val dir = fresh("lake_merge3")
    // two range-clustered files so DML touches ONE of them provably
    val t = SnapshotTable.create(spark, dir,
      (1L to 100L).map(i => (i, "base")).toDF("id", "src")
        .repartitionByRange(2, $"id"))
    // re-land with stats so deleteWhere's touch-pruning is file-precise
    t.compactSorted(Seq("id"), numFiles = 2) // v2
    val fork = t.latestVersion

    // branch deletes low ids (rewrites the low file); main appends
    t.createBranch("dev")
    t.deleteFromBranch("dev", $"id" <= 10)
    t.append(Seq((500L, "main")).toDF("id", "src")) // main moves past fork
    assert(t.read().count() == 101L)
    assert(t.readRef("dev").count() == 90L)
    t.mergeBranch("dev")
    // merged: branch's delete applied AND main's append kept
    assert(t.read().count() == 91L)
    assert(t.read().filter($"id" <= 10).count() == 0L)
    assert(t.read().filter($"src" === "main").count() == 1L)

    // main DML + branch append to "different partitions" also commutes
    t.compactSorted(Seq("id"), numFiles = 2)
    t.createBranch("ingest")
    t.appendToBranch("ingest", Seq((600L, "staged")).toDF("id", "src"))
    t.deleteWhere($"id" === 500L) // main rewrites the high file
    t.mergeBranch("ingest")
    assert(t.read().filter($"id" === 600L).count() == 1L)
    assert(t.read().filter($"id" === 500L).count() == 0L)

    // CONFLICT: both sides rewrite the same file → refuse, naming it
    t.compactSorted(Seq("id"), numFiles = 2)
    t.createBranch("clash")
    t.deleteFromBranch("clash", $"id" === 20L)
    t.deleteWhere($"id" === 21L) // same low file on main
    val ex = intercept[java.util.ConcurrentModificationException](t.mergeBranch("clash"))
    assert(ex.getMessage.contains("content conflict"))
    assert(ex.getMessage.contains("data-"), "conflict message should name the file(s)")
    t.dropRef("clash")

    // SQL surface: USE BRANCH routes DELETE to the branch; tag pins refuse
    t.createBranch("sqlbr")
    spark.sql(s"USE BRANCH sqlbr IN LAKE '$dir'")
    try {
      spark.sql(s"DELETE FROM LAKE '$dir' WHERE id = 30")
      assert(t.readRef("sqlbr").filter($"id" === 30L).count() == 0L)
    } finally spark.sql(s"USE DEFAULT IN LAKE '$dir'")
    assert(t.read().filter($"id" === 30L).count() == 1L, "main untouched")
    // statement-level AT BRANCH form needs no session pin (and UPDATE too)
    spark.sql(s"UPDATE LAKE '$dir' AT BRANCH sqlbr SET src = 'branched' WHERE id = 31")
    assert(t.readRef("sqlbr").filter($"id" === 31L)
      .head().getAs[String]("src") == "branched")
    assert(t.read().filter($"src" === "branched").count() == 0L, "main untouched")
    spark.sql(s"DELETE FROM LAKE '$dir' AT BRANCH sqlbr WHERE id = 32")
    assert(t.readRef("sqlbr").filter($"id" === 32L).count() == 0L)
    assert(t.read().filter($"id" === 32L).count() == 1L, "main untouched")
    spark.sql(s"MERGE BRANCH sqlbr INTO LAKE '$dir'")
    assert(t.read().filter($"id" === 30L).count() == 0L)
    t.createTag("pin")
    spark.sql(s"USE TAG pin IN LAKE '$dir'")
    try assertThrows[IllegalStateException](
      spark.sql(s"DELETE FROM LAKE '$dir' WHERE id = 31"))
    finally spark.sql(s"USE DEFAULT IN LAKE '$dir'")
    t.dropRef("pin")

    // DRY RUN reports the outcome without publishing (Nessie dry-run)
    t.createBranch("dryb")
    t.appendToBranch("dryb", Seq((800L, "d")).toDF("id", "src"))
    val ffDry = spark.sql(s"MERGE BRANCH dryb INTO LAKE '$dir' DRY RUN").collect()
    assert(ffDry.map(_.getString(0)).toSeq == Seq("fast_forward"))
    t.append(Seq((801L, "m")).toDF("id", "src")) // diverge main
    val twDry = spark.sql(s"MERGE BRANCH dryb INTO LAKE '$dir' DRY RUN").collect()
    assert(twDry.map(_.getString(0)).toSeq == Seq("three_way"))
    val headBefore = t.latestVersion
    assert(t.latestVersion == headBefore, "dry run must not publish")
    t.dropRef("dryb")
    t.compactSorted(Seq("id"), numFiles = 2)
    t.createBranch("dryc")
    t.deleteFromBranch("dryc", $"id" === 40L)
    t.deleteWhere($"id" === 41L) // same low file → conflict
    val cfDry = spark.sql(s"MERGE BRANCH dryc INTO LAKE '$dir' DRY RUN").collect()
    assert(cfDry.forall(_.getString(0) == "conflict") &&
      cfDry.exists(_.getString(1).contains("content conflict")), cfDry.mkString)
    t.dropRef("dryc")

    // schema conflict: both sides evolve differently since the fork
    t.createBranch("schemad")
    t.appendToBranch("schemad",
      Seq((700L, "b", 1.0)).toDF("id", "src", "extra_b"))
    t.append(Seq((701L, "m", true)).toDF("id", "src", "extra_m"))
    val ex2 = intercept[java.util.ConcurrentModificationException](t.mergeBranch("schemad"))
    assert(ex2.getMessage.contains("schema conflict"))
    t.dropRef("schemad")
  }

  test("three-way MERGE BRANCH: one-sided ADD COLUMN merges; it is not a rename conflict") {
    val dir = fresh("lake_merge_addcol")
    val t = SnapshotTable.create(spark, dir,
      Seq((1L, "a"), (2L, "b")).toDF("id", "src"))
    // branch stages a same-schema append; MAIN adds a column via a
    // widened append — a benign one-sided id-map change that the schema
    // three-way rule lets win, and must not refuse as a "rename"
    t.createBranch("feed")
    t.appendToBranch("feed", Seq((10L, "staged")).toDF("id", "src"))
    t.append(Seq((3L, "m", 7.5)).toDF("id", "src", "extra"))
    t.mergeBranch("feed")
    val m = t.read()
    assert(m.count() == 4L)
    assert(m.columns.toSeq == Seq("id", "src", "extra"))
    assert(m.filter($"id" === 10L).head().isNullAt(2),
      "pre-add files must read NULL for the added column")
    assert(m.filter($"id" === 3L).head().getDouble(2) == 7.5)

    // mirror: the BRANCH adds a column, main appends current-schema rows
    t.createBranch("wide")
    t.appendToBranch("wide", Seq((20L, "w", 1.0, true)).toDF("id", "src", "extra", "flag"))
    t.append(Seq((4L, "m2", 2.0)).toDF("id", "src", "extra"))
    t.mergeBranch("wide")
    val m2 = t.read()
    assert(m2.columns.toSeq == Seq("id", "src", "extra", "flag"))
    assert(m2.count() == 6L)
    assert(m2.filter($"id" === 20L).head().getBoolean(3))
    assert(m2.filter($"id" === 4L).head().isNullAt(3),
      "main's post-fork file must read NULL for the branch-added column")
  }

  test("ALTER BRANCH|TAG ASSIGN repoints refs; branch staged commits are discarded") {
    val dir = fresh("lake_assign")
    val t = SnapshotTable.create(spark, dir,
      (1L to 50L).map(i => (i, "v1")).toDF("id", "src"))
    t.deleteWhere($"id" > 40) // v2
    t.createTag("rel", Some(1L))
    t.createBranch("wip", Some(2L))
    t.appendToBranch("wip", Seq((900L, "staged")).toDF("id", "src"))
    assert(t.readRef("wip").count() == 41L)

    // tag re-pins
    spark.sql(s"ALTER TAG rel ASSIGN VERSION 2 IN LAKE '$dir'")
    assert(t.getRef("rel").baseVersion == 2L)
    // branch assign resets the head and DROPS staged commits (Nessie assign)
    spark.sql(s"ALTER BRANCH wip ASSIGN VERSION 1 IN LAKE '$dir'")
    assert(t.getRef("wip").baseVersion == 1L)
    assert(t.readRef("wip").count() == 50L, "staged commit must be gone")
    // filtered SHOW forms (reference SqlShowBranches/SqlShowTags)
    val branches = spark.sql(s"SHOW BRANCHES FROM LAKE '$dir'").collect()
    val tags = spark.sql(s"SHOW TAGS FROM LAKE '$dir'").collect()
    assert(branches.map(_.getString(0)).toSeq == Seq("wip"))
    assert(tags.map(_.getString(0)).toSeq == Seq("rel"))
    // kind mismatch and out-of-range are refused
    assertThrows[Exception](spark.sql(s"ALTER BRANCH rel ASSIGN VERSION 1 IN LAKE '$dir'"))
    assertThrows[Exception](spark.sql(s"ALTER TAG rel ASSIGN VERSION 99 IN LAKE '$dir'"))
  }

  test("USE BRANCH pins the session's default read/insert; DML refuses; USE DEFAULT restores") {
    val dir = fresh("lake_useref")
    val t = SnapshotTable.create(spark, dir,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    t.createBranch("dev")
    t.createTag("pin")

    spark.sql(s"USE BRANCH dev IN LAKE '$dir'")
    // INSERT routes to the branch; main is untouched
    Seq((3L, "staged")).toDF("id", "v").createOrReplaceTempView("useref_delta")
    spark.sql(s"INSERT INTO LAKE '$dir' SELECT id, v FROM useref_delta")
    assert(t.read().count() == 2L, "session insert leaked to main")
    // default-head scan under the pin sees the branch
    assert(spark.sql(s"SELECT * FROM lake_scan('$dir')").count() == 3L)
    // SHOW LOGS under the pin shows the branch chain
    assert(spark.sql(s"SHOW LOGS IN LAKE '$dir'").count() == 2L)
    // row-level DML under a BRANCH pin stages on the branch (Nessie DML)
    spark.sql(s"DELETE FROM LAKE '$dir' WHERE id = 1")
    assert(t.read().count() == 2L, "branch DML leaked to main")
    assert(spark.sql(s"SELECT * FROM lake_scan('$dir')").count() == 2L)
    // statements with no branch-routed form are still refused loudly
    val dml = intercept[Exception](
      spark.sql(s"TRUNCATE LAKE '$dir'"))
    assert(dml.getMessage.contains("pinned"))

    spark.sql(s"USE DEFAULT IN LAKE '$dir'")
    assert(spark.sql(s"SELECT * FROM lake_scan('$dir')").count() == 2L)
    assert(spark.sql(s"SHOW LOGS IN LAKE '$dir'").count() == 1L)

    // tag pin: reads re-point, inserts refuse (immutable)
    spark.sql(s"USE TAG pin IN LAKE '$dir'")
    assert(spark.sql(s"SELECT * FROM lake_scan('$dir')").count() == 2L)
    val ins = intercept[Exception](
      spark.sql(s"INSERT INTO LAKE '$dir' SELECT id, v FROM useref_delta"))
    assert(ins.getMessage.contains("immutable"))
    // USE BRANCH main = back to trunk (Nessie's implicit default branch)
    spark.sql(s"USE BRANCH main IN LAKE '$dir'")
    assert(spark.sql(s"SELECT * FROM lake_scan('$dir')").count() == 2L)
    // kind mismatch refused
    assertThrows[Exception](spark.sql(s"USE BRANCH pin IN LAKE '$dir'"))

    // USE VERSION: immutable pin at a fixed version (reference USE COMMIT)
    t.append(Seq((9L, "late")).toDF("id", "v")) // main v2
    spark.sql(s"USE VERSION 1 IN LAKE '$dir'")
    assert(spark.sql(s"SELECT * FROM lake_scan('$dir')").count() == 2L)
    assert(spark.sql(s"SHOW LOGS IN LAKE '$dir'").count() == 1L)
    val insV = intercept[Exception](
      spark.sql(s"INSERT INTO LAKE '$dir' SELECT id, v FROM useref_delta"))
    assert(insV.getMessage.contains("immutable"))
    assertThrows[Exception](spark.sql(s"USE VERSION 99 IN LAKE '$dir'"))
    spark.sql(s"USE DEFAULT IN LAKE '$dir'")
    assert(spark.sql(s"SELECT * FROM lake_scan('$dir')").count() == 3L)
  }

  test("SHOW LOGS/FILES and TRUNCATE LAKE statement forms") {
    val dir = fresh("lake_stmts")
    val t = SnapshotTable.create(spark, dir,
      (1L to 10L).map(i => (i, s"r$i")).toDF("id", "v"))
    t.append(Seq((11L, "r11")).toDF("id", "v"))
    t.createBranch("b1", Some(1L))

    val logs = spark.sql(s"SHOW LOGS IN LAKE '$dir'").collect()
    assert(logs.map(_.getString(0)).toSeq == Seq("1", "2"))
    assert(logs.map(_.getString(1)).toSeq == Seq("overwrite", "append"))
    // AT BRANCH shows only the prefix visible to the branch
    assert(spark.sql(s"SHOW LOGS AT BRANCH b1 IN LAKE '$dir'").count() == 1L)
    assertThrows[Exception](spark.sql(s"SHOW LOGS AT TAG b1 IN LAKE '$dir'"))

    val files = spark.sql(s"SHOW FILES IN LAKE '$dir'").collect()
    assert(files.nonEmpty && files.forall(_.getString(0).endsWith(".parquet")))
    assert(files.map(_.getString(2).toLong).sum == 11L, "manifest row counts")
    // a version pin scopes the file listing to that snapshot
    spark.sql(s"USE VERSION 1 IN LAKE '$dir'")
    val pinned = spark.sql(s"SHOW FILES IN LAKE '$dir'").collect()
    assert(pinned.map(_.getString(2).toLong).sum == 10L, "v1 files only")
    spark.sql(s"USE DEFAULT IN LAKE '$dir'")

    // TRUNCATE: empty head, history intact, time travel still works
    spark.sql(s"TRUNCATE LAKE '$dir'")
    assert(t.read().count() == 0L)
    assert(t.asOf(2L).count() == 11L)
  }

  test("auto-compaction bounds ingest file counts; off by default; layout survives") {
    val dir = fresh("lake_autocompact")
    val t = SnapshotTable.create(spark, dir, Seq((0L, "seed")).toDF("id", "v"))
    // default off: small appends accumulate files unboundedly
    (1 to 5).foreach(i => t.append(Seq((i.toLong, s"r$i")).toDF("id", "v")))
    assert(t.snapshotWithStats()._1.size >= 6)

    spark.conf.set("spark.graft.lake.autocompact.files", "4")
    try {
      t.append(Seq((100L, "x")).toDF("id", "v"))
      val after = t.snapshotWithStats()._1.size
      assert(after <= 4, s"auto-compact must bound live files, got $after")
      assert(t.read().count() == 7L, "compaction must not change content")
      assert(t.commits.last.action == "overwrite", "history shows the upkeep commit")
      // steady state: counts oscillate in [compacted, threshold+1], never grow
      (1 to 4).foreach(i => t.append(Seq((200L + i, "y")).toDF("id", "v")))
      assert(t.snapshotWithStats()._1.size <= 5)
      assert(t.read().count() == 11L)

      // partitioned table: upkeep rewrites THROUGH the sticky layout
      val pd2 = fresh("lake_autocompact_part2")
      spark.sql(s"""CREATE LAKE '$pd2' PARTITION BY (bucket(4,id))
                   |AS SELECT id, CAST(id AS STRING) AS v FROM range(100)""".stripMargin)
      val pt2 = SnapshotTable.forPath(spark, pd2)
      (1 to 6).foreach(i =>
        pt2.appendPartitioned(Seq((1000L + i, s"p$i")).toDF("id", "v"),
          pt2.effectiveLayout._1))
      assert(pt2.snapshotWithStats()._1.size <= 8,
        "partitioned auto-compact must bound files per partition layout")
      assert(pt2.effectiveLayout._1.nonEmpty, "sticky partition spec must survive upkeep")
      assert(pt2.read().count() == 106L)
    } finally spark.conf.unset("spark.graft.lake.autocompact.files")
  }

  test("recreating a lake at a wiped path never serves the dead incarnation's log") {
    def wipe(dir: String): Unit = {
      import scala.jdk.CollectionConverters._
      Files.walk(java.nio.file.Paths.get(dir)).iterator.asScala.toSeq
        .reverse.foreach(Files.deleteIfExists(_))
      Files.createDirectories(java.nio.file.Paths.get(dir))
    }
    val dir = fresh("lake_reincarnate")
    val t1 = SnapshotTable.create(spark, dir, Seq((1L, "a")).toDF("id", "v"))
    assert(t1.read().count() == 1L)

    // same-path recreation through the API: create() invalidates the cache
    wipe(dir)
    Thread.sleep(5) // keep the incarnations' commit mtimes distinct
    val t2 = SnapshotTable.create(spark, dir,
      Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "v"))
    assert(t2.read().count() == 3L,
      "create() after an in-place wipe must not list the dead incarnation's files")

    // out-of-band recreation (no create() call): the version numbering
    // restarts, so the cached last-name matches — the stat-based
    // (size, mtime) identity must reject the dead cache entry
    t2.read().count() // warm the cache on incarnation 2
    wipe(dir)
    Thread.sleep(5)
    val t3 = SnapshotTable.forPath(spark, dir)
    t3.overwrite((1L to 4L).map(i => (i, s"r$i")).toDF("id", "v"))
    assert(t3.read().count() == 4L,
      "stat revalidation must reject a cache entry from a wiped incarnation")
  }

  test("vacuum keeps files pinned by tags and branches") {
    val dir = fresh("lake_refvac")
    val t = SnapshotTable.create(spark, dir, Seq((1L, "a")).toDF("id", "v"))
    t.createTag("keep_v1")
    t.createBranch("wip")
    t.appendToBranch("wip", Seq((2L, "b")).toDF("id", "v"))
    // overwrite main twice so v1 falls out of the retention window
    t.overwrite(Seq((9L, "z")).toDF("id", "v"))
    t.overwrite(Seq((10L, "zz")).toDF("id", "v"))
    val deleted = t.vacuum(retainLast = 1, graceMs = 0L)
    // v1's file is referenced by BOTH the tag and the branch prefix; the
    // branch's staged file is referenced by the branch — neither may go
    assert(t.readRef("keep_v1").as[(Long, String)].collect().toSeq == Seq((1L, "a")))
    assert(t.readRef("wip").orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b")))
    // v2's file (the first overwrite) was truly unreferenced and went
    assert(deleted.nonEmpty)
    intercept[Exception](t.asOf(2L).collect())
    // dropping the refs releases their files to the next vacuum
    t.dropRef("keep_v1"); t.dropRef("wip")
    val deleted2 = t.vacuum(retainLast = 1, graceMs = 0L)
    assert(deleted2.nonEmpty)
    assert(t.read().as[(Long, String)].collect().toSeq == Seq((10L, "zz")))
  }

  test("manifest stats prune files before any is opened") {
    val dir = fresh("lake_stats")
    val t = SnapshotTable.forPath(spark, dir)
    // range-cluster so the 4 files carry disjoint id ranges
    val df = spark.range(0, 400).select(col("id"), (col("id") * 2).as("x"))
      .repartitionByRange(4, col("id"))
    t.appendWithStats(df.toDF(), Seq("id"))
    val (files, _) = t.snapshot()
    assert(files.size == 4)
    val pruned = t.scanRange("id", 110, 120)
    // manifest pruning must reach the scan: only 1 of 4 files read
    assert(pruned.inputFiles.length == 1,
      s"expected 1 file after pruning, got ${pruned.inputFiles.length}")
    assert(pruned.orderBy("id").select("id").as[Long].collect().toSeq ==
      (110L to 120L))
    // files without stats are never pruned (correctness over pruning)
    t.append(Seq((1000L, 2000L)).toDF("id", "x"))
    assert(t.scanRange("id", 999, 1001).count() == 1)
    // the residual range predicate must ALSO reach the parquet reader
    // (row-group pruning inside the kept file), with native-typed literals
    val explained = t.scanRange("id", 110, 120).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(explained.contains("GreaterThanOrEqual(id,110)") &&
      explained.contains("LessThanOrEqual(id,120)"),
      s"range not pushed to parquet:\n$explained")
  }

  test("IN-list pruning binary-searches sorted keys: O(files·log keys) plan time, exact result") {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, In, Literal}
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    // 20k synthetic manifest entries with disjoint [lo, hi] ranges (the
    // post-re-clustering streaming-dedup state shape) — no real files
    // needed, listFiles is pure in-memory manifest filtering
    val nFiles = 20000
    val files = (0 until nFiles).map { i =>
      val lo = i * 100L
      (s"/graft-fake/data-$i.parquet", Map(
        "bh" -> (lo.toString, (lo + 99L).toString),
        SnapshotTable.BytesStatKey -> ("1000", "0")))
    }
    val idx = new LakeFileIndex(spark, "/graft-fake", files,
      StructType(Seq(StructField("bh", LongType))))
    // 8192-key IN filter; key k targets file 16k (keys past the last file
    // hit nothing), so exactly ceil(20000/16) = 1250 files survive
    val keys: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =
      (0 until 8192).map(k => Literal(k * 1600L + 5L))
    val filter = In(AttributeReference("bh", LongType)(), keys)
    val before = LakeFileIndex.inPruneComparisons.get()
    val kept = idx.listFiles(Nil, Seq(filter)).head.files
    val comparisons = LakeFileIndex.inPruneComparisons.get() - before
    assert(kept.length == 1250, s"kept ${kept.length} files")
    // naive walk = files·keys = 164M comparisons; sorted-probe fast path
    // = files·(log2(8192)+1) ≈ 300k (bound is generous: the counter is
    // shared, parallel suites may add noise)
    assert(comparisons < 2000000L,
      s"IN prune walk cost $comparisons comparisons — fast path not engaged")
    // parity with the per-key reference walk on a sample of files
    files.take(512).foreach { case (_, st) =>
      val types = Map("bh" -> (LongType: org.apache.spark.sql.types.DataType))
      val fast = {
        val c = new java.util.IdentityHashMap[
          org.apache.spark.sql.catalyst.expressions.Expression, AnyRef]()
        LakeFileIndex.mayMatch(st, types, filter, Nil, c)
      }
      val slow = LakeFileIndex.mayMatch(st, types, filter, Nil, null)
      assert(fast == slow, s"fast/slow prune disagree on $st")
    }
  }

  test("plain SQL WHERE over a lake view prunes files from manifest stats") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def findScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => findScans(a.executedPlan)
      case s: QueryStageExec => findScans(s.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(findScans)
    }
    val dir = fresh("lake_sqlprune")
    val t = SnapshotTable.forPath(spark, dir)
    t.appendWithStats(
      spark.range(0, 400).select(col("id"), (col("id") * 2).as("x"))
        .repartitionByRange(4, col("id")).toDF(),
      Seq("id"))
    spark.sql(s"CREATE LAKE VIEW lake_sqlprune_v FROM '$dir'")
    val q = spark.sql(
      "SELECT id, x FROM lake_sqlprune_v WHERE id >= 110 AND id <= 120 ORDER BY id")
    // correctness first: the residual filter keeps results exact (collect
    // THIS dataset — metrics live on the executed plan of this very query)
    assert(q.collect().map(_.getLong(0)).toSeq == (110L to 120L))
    // then the plan: only 1 of the 4 range-clustered files was opened —
    // the WHERE reached the manifest with no scanRange() opt-in
    val scans = findScans(q.queryExecution.executedPlan)
    assert(scans.nonEmpty, "no FileSourceScanExec in the executed plan")
    val numFiles = scans.map(_.metrics("numFiles").value).sum
    assert(numFiles == 1, s"expected 1 file read after manifest pruning, got $numFiles")
    // a predicate outside every file's range reads nothing
    val none = spark.sql("SELECT id FROM lake_sqlprune_v WHERE id = 5000")
    assert(none.collect().isEmpty)
    assert(findScans(none.queryExecution.executedPlan)
      .map(_.metrics("numFiles").value).sum == 0L)
  }

  test("manifest-prune evaluator: conservative on unknown shapes, exact on ranges") {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.{IntegerType, StringType => SStr}
    val stats = Map("id" -> ("100", "200"), "name" -> ("apple", "mango"))
    val types = Map("id" -> (IntegerType: org.apache.spark.sql.types.DataType),
      "name" -> (SStr: org.apache.spark.sql.types.DataType))
    val id = AttributeReference("id", IntegerType)()
    val name = AttributeReference("name", SStr)()
    def may(e: Expression): Boolean = LakeFileIndex.mayMatch(stats, types, e)
    assert(may(EqualTo(id, Literal(150))))
    assert(!may(EqualTo(id, Literal(99))))
    assert(!may(GreaterThan(id, Literal(200))))
    assert(may(GreaterThanOrEqual(id, Literal(200))))
    // literal-on-left comparisons flip correctly
    assert(may(LessThan(Literal(100), id)))   // 100 < id, max=200 qualifies
    assert(!may(GreaterThan(Literal(99), id))) // id < 99, min=100 cannot
    assert(!may(In(id, Seq(Literal(1), Literal(2)))))
    assert(may(In(id, Seq(Literal(1), Literal(150)))))
    assert(may(Or(EqualTo(id, Literal(1)), EqualTo(id, Literal(150)))))
    assert(!may(And(EqualTo(id, Literal(150)), EqualTo(id, Literal(1)))))
    // string stats compare lexically
    assert(may(EqualTo(name, Literal("banana"))))
    assert(!may(EqualTo(name, Literal("zebra"))))
    // LIKE 'p%' prunes through the prefix interval [p, succ(p))
    assert(may(StartsWith(name, Literal("ma"))))     // mango starts with ma
    assert(may(StartsWith(name, Literal("b"))))      // b* fits inside [apple, mango]
    assert(!may(StartsWith(name, Literal("z"))))     // beyond max
    assert(!may(StartsWith(name, Literal("aa"))))    // min's prefix 'ap' > 'aa'
    assert(may(StartsWith(name, Literal("apple pie")))) // min <= p <= max
    // string order is binary UTF-8 (Spark's), not UTF-16: U+1D11E (surrogate
    // pair) sorts ABOVE U+FFFD in UTF-8; a UTF-16 compare would invert it
    val uStats = Map("name" -> ("�", "𝄞"))
    def mayU(e: Expression): Boolean = LakeFileIndex.mayMatch(uStats, types, e)
    assert(mayU(EqualTo(name, Literal("𝄞"))),
      "supplementary-plane max must keep its own value under binary order")
    // unknown shapes keep the file (pruning must stay a superset)
    assert(may(IsNull(id)))
    assert(may(EqualTo(Cast(id, SStr), Literal("150"))))
    // no stats for the column → keep
    assert(may(EqualTo(AttributeReference("other", IntegerType)(), Literal(5))))
  }

  test("manifest-prune evaluator: long stats >= 2^53 compare exactly, not as doubles") {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.LongType
    // 2^53 and 2^53+1 collide after a double round-trip; a strict bound on
    // the collision must NOT prune the file (copyOnWrite reuses this to
    // pick DML rewrite files, so a mis-prune would silently skip rows)
    val two53 = 9007199254740992L
    val stats = Map("id" -> ((two53 + 1).toString, (two53 + 1).toString))
    val types = Map("id" -> (LongType: org.apache.spark.sql.types.DataType))
    val id = AttributeReference("id", LongType)()
    def may(e: Expression): Boolean = LakeFileIndex.mayMatch(stats, types, e)
    // file holds 2^53+1; predicate id > 2^53 matches it — as doubles the
    // stat and literal tie and the strict compare used to drop the file
    assert(may(GreaterThan(id, Literal(two53))),
      "strict > on a double-rounding tie must keep the file")
    assert(may(EqualTo(id, Literal(two53 + 1))))
    // exact compare also prunes what doubles could not distinguish
    assert(!may(EqualTo(id, Literal(two53))),
      "equality on the adjacent long must prune under exact comparison")
    assert(!may(GreaterThan(id, Literal(two53 + 1))))
    assert(may(GreaterThanOrEqual(id, Literal(two53 + 1))))
    // decimal literals share the exact path
    val decStats = Map("d" -> ("123456789012345678.99", "123456789012345679.01"))
    val dTypes = Map("d" -> (org.apache.spark.sql.types.DecimalType(38, 2):
      org.apache.spark.sql.types.DataType))
    val d = AttributeReference("d", org.apache.spark.sql.types.DecimalType(38, 2))()
    val dec = org.apache.spark.sql.types.Decimal("123456789012345679.00")
    assert(LakeFileIndex.mayMatch(decStats, dTypes,
      EqualTo(d, Literal.create(dec, org.apache.spark.sql.types.DecimalType(38, 2)))))
    val decBelow = org.apache.spark.sql.types.Decimal("123456789012345678.98")
    assert(!LakeFileIndex.mayMatch(decStats, dTypes,
      EqualTo(d, Literal.create(decBelow, org.apache.spark.sql.types.DecimalType(38, 2)))))
  }

  test("partition transforms: month + bucket prune partitions from plain SQL") {
    val dir = fresh("lake_part")
    val t = SnapshotTable.forPath(spark, dir)
    // 6 months of data × 4 id-buckets
    val df = spark.range(0, 600).select(col("id"),
      date_add(to_date(lit("1994-01-01")), (col("id") % 180).cast("int")).as("d"))
    t.appendPartitioned(df.toDF(), Seq("month(d)", "bucket(4,id)"))
    val (files, _) = t.snapshot()
    assert(files.size == 24, s"expected 6 months × 4 buckets = 24 files, got ${files.size}")
    // month range predicate on the SOURCE column prunes to one month's files
    val march = t.read().filter(col("d") >= "1994-03-01" && col("d") <= "1994-03-31")
    val expected = (0L until 600L).filter { i =>
      val d = java.time.LocalDate.of(1994, 1, 1).plusDays(i % 180)
      d.getMonthValue == 3
    }
    assert(march.select("id").as[Long].collect().toSet == expected.toSet)
    assert(filesRead(march.select("id")) == 4,
      "month predicate should prune to 1 month x 4 buckets")
    // bucket equality prunes to one bucket per month
    val one = t.read().filter(col("id") === 7L)
    assert(one.select("d").as[java.sql.Date].collect().map(_.toString).toSeq ==
      Seq("1994-01-08"))
    assert(filesRead(t.read().filter(col("id") === 7L).select("d")) == 6,
      "equality should prune to 1 bucket x 6 months")
    // conjunction prunes to a single file
    val pin = t.read().filter(col("id") === 7L && col("d") >= "1994-01-01"
      && col("d") <= "1994-01-31").select("id")
    assert(filesRead(pin) == 1, "month + bucket conjunction should hit one file")
    // SQL path: same pruning through a lake view
    spark.sql(s"CREATE LAKE VIEW lake_part_v FROM '$dir'")
    val q = spark.sql("""SELECT id FROM lake_part_v
      WHERE d >= DATE'1994-02-01' AND d <= DATE'1994-02-28'""")
    q.collect()
    assert(findScans(q.queryExecution.executedPlan)
      .map(_.metrics("numFiles").value).sum == 4)
  }

  test("partition layout survives copy-on-write DML and renames") {
    val dir = fresh("lake_part_dml")
    val t = SnapshotTable.forPath(spark, dir)
    val df = spark.range(0, 400).select(col("id"),
      date_add(to_date(lit("1994-01-01")), (col("id") % 120).cast("int")).as("d"))
    t.appendPartitioned(df.toDF(), Seq("month(d)"), statsCols = Seq("id"))
    // DML rewrite carries the spec forward: new files are re-partitioned
    // and re-record transform stats (pruning does not silently degrade)
    t.deleteWhere(col("id") < 10L)
    val last = t.commits.last
    assert(last.partitionSpec == Seq("month(d)"))
    assert(last.statsCols == Seq("id"))
    assert(last.stats.nonEmpty &&
      last.stats.values.forall(m => m.contains("month(d)") && m.contains("id")))
    val march = t.read().filter(col("d") >= "1994-03-01" && col("d") <= "1994-03-31")
    val monthsOnDisk = last.stats.values.map(m => m("month(d)")._1).toSet
    assert(monthsOnDisk.size == 4, s"rewrite should keep 4 month partitions: $monthsOnDisk")
    assert(filesRead(march.select("id")) < filesRead(t.read().select("id")),
      "transform pruning should still cut files after the rewrite")
    // rename: layout metadata follows to the new column name
    t.renameColumn("d", "event_date")
    assert(t.commits.last.partitionSpec == Seq("month(event_date)"))
    t.updateWhere(col("id") === 11L, Map("id" -> lit(10011L)))
    assert(t.commits.last.partitionSpec == Seq("month(event_date)"))
    assert(t.read().filter(col("id") === 10011L).count() == 1)
  }

  test("transform prune evaluator: bucket equality-only, monotonic ranges") {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.{DateType, IntegerType, LongType}
    val bucket = PartitionTransform.parse("bucket(4,id)")
    val month = PartitionTransform.parse("month(d)")
    val tfs = Seq(bucket, month)
    val id = AttributeReference("id", LongType)()
    val d = AttributeReference("d", DateType)()
    val types = Map("id" -> (LongType: org.apache.spark.sql.types.DataType),
      "d" -> (DateType: org.apache.spark.sql.types.DataType))
    // this file holds bucket 2 and months [290, 291] (1994-03/04)
    val b2 = {
      val h = Murmur3Hash(Seq(Literal(7L)), 42).eval(null).asInstanceOf[Int]
      (((h % 4) + 4) % 4).toString
    }
    val stats = Map("bucket(4,id)" -> (b2, b2), "month(d)" -> ("290", "291"))
    def may(e: Expression): Boolean = LakeFileIndex.mayMatch(stats, types, e, tfs)
    val mar1 = Literal(java.time.LocalDate.of(1994, 3, 1).toEpochDay.toInt, DateType)
    val may1 = Literal(java.time.LocalDate.of(1994, 5, 1).toEpochDay.toInt, DateType)
    val jan1 = Literal(java.time.LocalDate.of(1994, 1, 31).toEpochDay.toInt, DateType)
    assert(may(EqualTo(id, Literal(7L))), "matching bucket must keep the file")
    assert(!may(EqualTo(id, Literal(8L))) || {
      // only assert pruning when 8's bucket genuinely differs from 7's
      val h8 = Murmur3Hash(Seq(Literal(8L)), 42).eval(null).asInstanceOf[Int]
      (((h8 % 4) + 4) % 4).toString == b2
    }, "non-matching bucket must prune")
    // bucket must NOT prune ranges (hash order is meaningless)
    assert(may(GreaterThan(id, Literal(100000L))))
    // month transform prunes date ranges through the source column
    assert(may(GreaterThanOrEqual(d, mar1)))
    assert(!may(GreaterThanOrEqual(d, may1)), "file ends in April; May+ must prune")
    assert(!may(LessThanOrEqual(d, jan1)), "file starts in March; Jan- must prune")
    assert(may(EqualTo(d, mar1)))
    assert(!may(EqualTo(d, may1)))
    // unknown literal shapes keep the file
    assert(may(EqualTo(d, Literal("1994-03-01"))))
    // timestamp_ntz literals (the fixture's timestamp flavor) map through
    // epoch-day arithmetic the same way dates do
    val ts = AttributeReference("d", org.apache.spark.sql.types.TimestampNTZType)()
    def ntz(iso: String): Literal = Literal(
      java.time.LocalDateTime.parse(iso).toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L,
      org.apache.spark.sql.types.TimestampNTZType)
    assert(may(GreaterThanOrEqual(ts, ntz("1994-03-15T10:30:00"))))
    assert(!may(GreaterThanOrEqual(ts, ntz("1994-05-01T00:00:00"))))
    assert(!may(LessThan(ts, ntz("1994-02-01T00:00:00"))))
  }

  test("row-level DML rewrites only the files its predicate can touch") {
    val dir = fresh("lake_partial")
    val t = SnapshotTable.forPath(spark, dir)
    t.appendWithStats(
      spark.range(0, 800).select(col("id"), (col("id") * 2).as("x"))
        .repartitionByRange(8, col("id")).toDF(),
      Seq("id"))
    val before = t.snapshot()._1.toSet
    assert(before.size == 8)

    // DELETE of one id can only live in one range-clustered file
    t.deleteWhere(col("id") === 150L)
    val afterDelete = t.snapshot()._1.toSet
    assert((before -- afterDelete).size == 1,
      s"exactly one file should be replaced, got ${(before -- afterDelete).size}")
    assert((afterDelete -- before).nonEmpty)
    assert(t.read().count() == 799)
    assert(t.read().filter(col("id") === 150L).count() == 0)
    // carried files kept their manifest stats: pruning still works
    assert(t.scanRange("id", 710, 720).inputFiles.length == 1)

    // UPDATE with a narrow predicate: only that file rewritten
    val beforeUpd = t.snapshot()._1.toSet
    t.updateWhere(col("id") === 700L, Map("x" -> lit(-1L)))
    val afterUpd = t.snapshot()._1.toSet
    assert((beforeUpd -- afterUpd).size == 1)
    assert(t.read().filter(col("x") === -1L).count() == 1)
    assert(t.read().count() == 799)

    // MERGE whose delta spans one file's key range: the rest carried
    import spark.implicits._
    val beforeMerge = t.snapshot()._1.toSet
    t.mergeByKey(Seq((300L, 999L), (310L, 998L)).toDF("id", "x"), "id")
    val afterMerge = t.snapshot()._1.toSet
    assert((beforeMerge -- afterMerge).size == 1,
      s"merge should rewrite 1 file, replaced ${(beforeMerge -- afterMerge).size}")
    assert(t.read().filter(col("id") === 300L).select("x").as[Long].head() == 999L)
    assert(t.read().count() == 799)

    // time travel to the pre-DML snapshot still sees the original 8 files
    assert(t.asOf(1L).count() == 800)
    // vacuum reclaims exactly the replaced files (grace 0 for the test)
    val deleted = t.vacuum(retainLast = 1, graceMs = 0)
    assert(deleted.nonEmpty && deleted.toSet.subsetOf(
      (before ++ afterDelete ++ afterUpd) -- afterMerge))
    assert(t.read().count() == 799)
  }

  test("metadata stays flat over a long log: cache parses only new commits, checkpoint bounds cold start") {
    val dir = fresh("lake_meta")
    val t = SnapshotTable.create(spark, dir, Seq((1L, "a")).toDF("id", "v"))
    // synthesize a 600-commit history by writing raw log files (same shape
    // publish() emits) — keeps the test off 600 Spark write jobs
    val logDir = Paths.get(dir, SnapshotTable.LogDirName)
    val base = t.commits.head
    (2L to 600L).foreach { v =>
      Files.write(logDir.resolve(f"v$v%08d.json"),
        SnapshotTable.renderCommit(base.copy(version = v, action = "append",
          timestampMs = base.timestampMs + v, files = Nil)).getBytes("UTF-8"))
    }
    SnapshotTable.invalidateLogCache()
    SnapshotTable.commitFilesParsed.set(0)
    assert(t.latestVersion == 600L)
    val coldParses = SnapshotTable.commitFilesParsed.get()
    assert(coldParses == 600L, s"cold resolution should parse the full log once, got $coldParses")
    // warm operations re-list but parse NOTHING
    (1 to 5).foreach(_ => t.snapshot())
    assert(SnapshotTable.commitFilesParsed.get() == coldParses,
      "warm snapshot resolution must not re-parse commit files")
    // a commit against the warm cache re-parses nothing (its locked log
    // read is served from cache), and a later read parses ONLY the new file
    t.append(Seq((2L, "b")).toDF("id", "v"))
    t.snapshot()
    val afterCommit = SnapshotTable.commitFilesParsed.get() - coldParses
    assert(afterCommit <= 1,
      s"commit + read parsed $afterCommit old files; the log cache is broken")
  }

  test("checkpoint consolidates the log and bounds cold-start parsing") {
    val dir = fresh("lake_ckpt")
    val t = SnapshotTable.create(spark, dir, Seq((1L, "a")).toDF("id", "v"))
    val logDir = Paths.get(dir, SnapshotTable.LogDirName)
    val base = t.commits.head
    // raw history up to one shy of the checkpoint cadence, then a REAL
    // commit lands exactly on the interval and writes the checkpoint
    (2L until SnapshotTable.CheckpointInterval).foreach { v =>
      Files.write(logDir.resolve(f"v$v%08d.json"),
        SnapshotTable.renderCommit(base.copy(version = v, action = "append",
          timestampMs = base.timestampMs + v, files = Nil)).getBytes("UTF-8"))
    }
    SnapshotTable.invalidateLogCache()
    t.append(Seq((2L, "b")).toDF("id", "v"))
    assert(t.latestVersion == SnapshotTable.CheckpointInterval.toLong)
    val ckpts = Files.list(logDir).iterator.asScala
      .map(_.getFileName.toString).filter(_.matches("ckpt-v\\d{8}\\.json")).toVector
    assert(ckpts == Vector(f"ckpt-v${SnapshotTable.CheckpointInterval}%08d.json"),
      s"expected exactly one checkpoint, got $ckpts")
    // cold start: only commits AFTER the checkpoint are parsed from files
    t.append(Seq((3L, "c")).toDF("id", "v"))
    SnapshotTable.invalidateLogCache()
    SnapshotTable.commitFilesParsed.set(0)
    val (files, _) = t.snapshot()
    assert(SnapshotTable.commitFilesParsed.get() == 1L,
      s"cold start after checkpoint parsed ${SnapshotTable.commitFilesParsed.get()} files, expected 1")
    // and the replayed state is identical to a full-log replay
    SnapshotTable.invalidateLogCache()
    Files.delete(logDir.resolve(f"ckpt-v${SnapshotTable.CheckpointInterval}%08d.json"))
    val (filesFull, _) = t.snapshot()
    assert(files == filesFull, "checkpoint replay diverged from raw-log replay")
    // time travel through the (now deleted) checkpointed range still works
    assert(t.asOf(1L).count() == 1)
  }

  test("compact merges small append files; vacuum drops unreferenced ones") {
    val dir = fresh("lake_compact")
    val t = SnapshotTable.forPath(spark, dir)
    (1L to 5L).foreach(i => t.append(Seq((i, s"v$i")).toDF("id", "v")))
    val (beforeFiles, _) = t.snapshot()
    assert(beforeFiles.size >= 5)
    t.compact(numFiles = 1)
    val (afterFiles, _) = t.snapshot()
    assert(afterFiles.size == 1, s"compaction left ${afterFiles.size} files")
    assert(t.read().count() == 5)
    // vacuum keeping only the compacted snapshot: the 5 small files go away,
    // the compacted file survives, current reads are unaffected
    val deleted = t.vacuum(retainLast = 1, graceMs = 0L)
    assert(deleted.size >= 5, s"expected the pre-compaction files gone, got $deleted")
    assert(t.read().orderBy("id").as[(Long, String)].collect().length == 5)
    // expired version is no longer readable (expire_snapshots contract)
    intercept[Exception] { t.asOf(1L).collect() }
  }

  test("Writer.mergeByKey routes lake tables through the atomic log commit") {
    val dir = fresh("lake_writer")
    SnapshotTable.create(spark, dir, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    Writer.mergeByKey(Seq((2L, "B")).toDF("id", "v"), dir, "id")
    val t = SnapshotTable.forPath(spark, dir)
    assert(t.read().orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "B")))
    assert(t.latestVersion == 2L, "merge must be one atomic commit")
  }

  test("overwriteIf rejects a stale base version (optimistic concurrency)") {
    val dir = fresh("lake_cas")
    val t = SnapshotTable.create(spark, dir, Seq((1L, "a")).toDF("id", "v"))
    t.append(Seq((2L, "b")).toDF("id", "v")) // table moves to v2
    intercept[java.util.ConcurrentModificationException] {
      t.overwriteIf(Seq((9L, "z")).toDF("id", "v"), expectedBase = 1L)
    }
    // the conflicting overwrite published nothing — both rows still there
    assert(t.read().orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b")))
    assert(t.latestVersion == 2L)
    // at the true base it publishes
    assert(t.overwriteIf(Seq((9L, "z")).toDF("id", "v"), expectedBase = 2L) == 3L)
  }

  test("appends racing copy-on-write DML are never lost (lost-update fix)") {
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val dir = fresh("lake_lostupd")
    val t = SnapshotTable.create(spark, dir, Seq((-1L, "seed")).toDF("id", "v"))
    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      // writer A: 6 appends of distinct keyed rows; writer B: 6 full-table
      // rewrites (DELETE of a never-matching predicate). Pre-fix, a rewrite
      // computed from a snapshot read before an append would overwrite the
      // log and silently erase that append's rows.
      val appender = Future {
        (1L to 6L).foreach(i => t.append(Seq((i, s"row$i")).toDF("id", "v")))
      }
      val rewriter = Future {
        (1 to 6).foreach(_ => t.deleteWhere(col("id") < -100L))
      }
      Await.result(appender, 120.seconds)
      Await.result(rewriter, 120.seconds)
    } finally pool.shutdown()
    val ids = t.read().select("id").as[Long].collect().toSet
    assert(ids == (Set(-1L) ++ (1L to 6L)),
      s"every concurrently appended row must survive the rewrites, got $ids")
  }

  test("scan construction makes zero filesystem status calls (sizes ride the manifest)") {
    val dir = fresh("lake_manifest_sizes")
    val t = SnapshotTable.create(spark, dir,
      (1 to 300).map(i => (i.toLong, s"r$i")).toDF("id", "s"))
    t.append((301 to 400).map(i => (i.toLong, s"r$i")).toDF("id", "s"))
    LakeFileIndex.fsStatusCalls.set(0)
    val df = t.read()
    assert(df.count() == 400)
    // sizeInBytes must come from the manifest too (it drives broadcast
    // decisions) and match the real on-disk footprint
    val realBytes = df.inputFiles.map(f =>
      Files.size(Paths.get(f.stripPrefix("file:")))).sum
    val planned = df.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(planned > 0 && planned >= realBytes,
      s"plan stats $planned vs on-disk $realBytes")
    assert(LakeFileIndex.fsStatusCalls.get == 0,
      s"scan construction hit the filesystem ${LakeFileIndex.fsStatusCalls.get} times")
  }

  test("legacy commits without manifest sizes fall back to getFileStatus") {
    val dir = fresh("lake_legacy_sizes")
    val t = SnapshotTable.create(spark, dir, Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    // strip __bytes from every commit json — simulating a log written
    // before sizes were recorded
    val logDir = Paths.get(dir, "_graft_log")
    Files.list(logDir).iterator.asScala.filter(_.toString.endsWith(".json")).foreach { p =>
      val txt = new String(Files.readAllBytes(p), "UTF-8")
      val cleaned = txt.replaceAll(""""__bytes"\s*:\s*\[[^\]]*\],?""", "")
        .replaceAll(",\\s*}", "}").replaceAll(",\\s*]", "]")
      Files.write(p, cleaned.getBytes("UTF-8"))
    }
    spark.catalog.refreshByPath(dir)
    SnapshotTable.invalidateLogCache() // edited json in place: drop parsed prefix
    val raw = Files.list(logDir).iterator.asScala
      .filter(_.toString.endsWith(".json"))
      .map(p => new String(Files.readAllBytes(p), "UTF-8")).mkString
    assert(!raw.contains("__bytes"), "test setup failed to strip sizes")
    LakeFileIndex.fsStatusCalls.set(0)
    val t2 = SnapshotTable.forPath(spark, dir)
    // a REAL data scan (count() alone is answered from the manifest and
    // never builds file statuses)
    assert(t2.read().orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(LakeFileIndex.fsStatusCalls.get > 0,
      "legacy commits must fall back to filesystem statuses")
  }

  test("commit timestamps are clamped monotonic for TIMESTAMP AS OF") {
    val dir = fresh("lake_clock")
    val t = SnapshotTable.create(spark, dir, Seq((1L, "a")).toDF("id", "v"))
    // simulate a backwards clock step: doctor v1's timestamp into the future
    val logDir = Paths.get(dir, SnapshotTable.LogDirName)
    val v1 = logDir.resolve("v00000001.json")
    val future = System.currentTimeMillis() + 3600000L
    val doctored = new String(Files.readAllBytes(v1), "UTF-8")
      .replaceFirst("\"timestampMs\":\\d+", s""""timestampMs":$future""")
    Files.write(v1, doctored.getBytes("UTF-8"))
    t.append(Seq((2L, "b")).toDF("id", "v")) // commits at "now" < doctored ts
    val ts = t.commits.map(_.timestampMs)
    assert(ts == ts.sorted, s"commit timestamps must be non-decreasing: $ts")
    // TIMESTAMP AS OF the doctored instant must see BOTH commits — pre-fix
    // the out-of-order v2 timestamp hid v2 from takeWhile log replay
    assert(t.asOfTimestamp(future).count() == 2L)
  }

  test("OPTIMIZE ZORDER BY: every clustered column prunes; lexicographic sort only the first") {
    import org.apache.spark.sql.functions.col
    val dir = fresh("lake_zorder")
    val dirLex = fresh("lake_lex")
    // 64x64 grid hash-scattered over 16 files: every file spans the full
    // (x, y) domain, so nothing can prune before clustering
    val grid = spark.range(0, 4096).select(
      (col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"),
      col("id").as("payload")).repartition(16)
    SnapshotTable.create(spark, dir, grid.toDF())
    SnapshotTable.create(spark, dirLex, grid.toDF())
    val before = SnapshotTable.forPath(spark, dir).read()
      .orderBy("payload").collect().toSeq

    spark.sql(s"OPTIMIZE LAKE '$dir' ZORDER BY (x, y) INTO 16 FILES")
    SnapshotTable.forPath(spark, dirLex).compactSorted(Seq("x", "y"), numFiles = 16)

    // the rewrite is a pure re-layout: identical rows
    val after = SnapshotTable.forPath(spark, dir).read()
      .orderBy("payload").collect().toSeq
    assert(after == before, "Z-order rewrite changed the data")

    // Z-order: BOTH clustered columns prune (each file covers ~a quadrant)
    val zx = filesRead(SnapshotTable.forPath(spark, dir).read().filter(col("x") < 8))
    val zy = filesRead(SnapshotTable.forPath(spark, dir).read().filter(col("y") < 8))
    assert(zx <= 8, s"x predicate read $zx of 16 z-ordered files")
    assert(zy <= 8, s"y predicate read $zy of 16 z-ordered files")
    // lexicographic (x, y) sort: x prunes, but every file spans the full
    // y domain — the second column cannot prune (the gap Z-order closes)
    val lx = filesRead(SnapshotTable.forPath(spark, dirLex).read().filter(col("x") < 8))
    val ly = filesRead(SnapshotTable.forPath(spark, dirLex).read().filter(col("y") < 8))
    assert(lx <= 8, s"x predicate read $lx of 16 lexicographically sorted files")
    assert(zy < ly, s"Z-order y pruning ($zy) not better than lexicographic ($ly)")
  }

  test("STATS columns write parquet bloom filters (within-file skipping for point lookups)") {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    def bloomOffsets(dir: String): Map[String, Long] = {
      val file = SnapshotTable.forPath(spark, dir).snapshot()._1.head
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file),
        org.apache.spark.sql.graft.Bridge.hadoopConf(spark)))
      try reader.getFooter.getBlocks.get(0).getColumns.asScala
        .map(c => c.getPath.toDotString -> c.getBloomFilterOffset).toMap
      finally reader.close()
    }
    val df = (1 to 5000).map(i => (i.toLong, s"k_$i", i % 7)).toDF("id", "key", "grp")
    // STATS (key) → bloom filter on key only
    val withStats = fresh("lake_bloom_on")
    spark.sql(s"DROP TABLE IF EXISTS __nonexistent") // keep session warm
    SnapshotTable.create(spark, withStats, df) // plain create: no stats cols
    val plain = bloomOffsets(withStats)
    assert(plain.values.forall(_ < 0), s"no STATS → no blooms: $plain")
    val declared = fresh("lake_bloom_decl")
    spark.sql(s"""CREATE LAKE '$declared' STATS (key)
                 |AS SELECT id, concat('k_', id) AS key, id % 7 AS grp
                 |FROM range(1, 5001)""".stripMargin)
    val offs = bloomOffsets(declared)
    assert(offs("key") >= 0, s"STATS column must carry a bloom filter: $offs")
    assert(offs("id") < 0 && offs("grp") < 0,
      s"undeclared columns must not pay for blooms: $offs")
    // values unchanged through the bloom-bearing files
    assert(SnapshotTable.forPath(spark, declared).read()
      .filter(col("key") === "k_1234").count() == 1L)
  }

  test("commit log drives the Hadoop FileSystem API for scheme'd table paths") {
    // the WHOLE metadata life cycle — create, append, DML, refs, time
    // travel, checkpointless replay, vacuum — at a `file:`-scheme
    // location: every log I/O goes through Hadoop FileSystem (LakeIO's
    // scheme'd branch), the precondition for a lake at s3a://…/abfs://…
    val dir = "file:" + fresh("lake_hdfs")
    val t = SnapshotTable.create(spark, dir,
      (1 to 100).map(i => (i.toLong, s"n_$i", i % 4)).toDF("id", "name", "grp"))
    t.append((101 to 120).map(i => (i.toLong, s"n_$i", i % 4)).toDF("id", "name", "grp"))
    assert(t.latestVersion == 2L)
    assert(t.read().count() == 120L)
    // copy-on-write DML through the scheme'd log
    t.deleteWhere(col("id") > 110)
    assert(t.read().count() == 110L)
    // time travel across the scheme'd commit chain
    assert(t.read(Some(1L)).count() == 100L)
    assert(t.read(Some(2L)).count() == 120L)
    // refs (write + list + read + drop) on the Hadoop path
    t.createTag("prewipe", Some(2L))
    assert(t.listRefs.map(_.name) == Seq("prewipe"))
    assert(t.readRef("prewipe").count() == 120L)
    // vacuum reclaims the DML-orphaned files without touching live ones
    t.dropRef("prewipe")
    val doomed = t.vacuum(retainLast = 1, graceMs = 0L)
    assert(doomed.nonEmpty, "vacuum found nothing to reclaim after COW DML")
    assert(t.read().count() == 110L)
    assert(t.read().filter(col("grp") === 1).count() ===
      (1 to 110).count(_ % 4 == 1).toLong)
    // and SQL sees the same table through the TVF surface
    assert(spark.sql(s"SELECT count(*) FROM lake_scan('$dir')")
      .collect().head.getLong(0) == 110L)
  }

  test("equivalent-but-different path spellings (file:///) commit, scan, and vacuum safely") {
    // ADVICE r9: the commit log records `$dir/$file` in the CALLER's
    // spelling while walks yield Hadoop-qualified URIs (file:/x) — an
    // aliased spelling like file:///x must neither break writes
    // (relativize) nor make vacuum treat every live file as unreferenced
    val dir = "file://" + fresh("lake_alias") // → file:///tmp/… triple slash
    val t = SnapshotTable.create(spark, dir,
      (1 to 50).map(i => (i.toLong, i % 3)).toDF("id", "grp"))
    t.append((51 to 60).map(i => (i.toLong, i % 3)).toDF("id", "grp"))
    t.deleteWhere(col("id") > 55)
    assert(t.read().count() == 55L)
    // vacuum under the aliased spelling reclaims ONLY the COW-orphaned
    // files; live data survives and the table still reads
    val doomed = t.vacuum(retainLast = 1, graceMs = 0L)
    assert(doomed.nonEmpty, "vacuum found nothing to reclaim after COW DML")
    assert(t.read().count() == 55L, "vacuum under an aliased spelling ate live data")
    assert(t.read().agg(org.apache.spark.sql.functions.sum(col("id"))).head().getLong(0)
      == (1 to 55).map(_.toLong).sum)
  }

  test("table properties: SET/UNSET/SHOW, inheritance across commits, checkpoint replay, per-table autocompact") {
    val dir = fresh("lake_props")
    val t = SnapshotTable.create(spark, dir,
      (1 to 20).map(i => (i.toLong, i.toString)).toDF("id", "s"))
    assert(t.properties.isEmpty)
    spark.sql(s"ALTER LAKE '$dir' SET TBLPROPERTIES ('owner.team' = 'data', 'autocompact.files' = '3')")
    val shown = spark.sql(s"SHOW TBLPROPERTIES IN LAKE '$dir'").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(shown == Seq(("autocompact.files", "3"), ("owner.team", "data")))
    // properties survive unrelated commits (inheritance, not re-declaration)
    t.append((21 to 25).map(i => (i.toLong, i.toString)).toDF("id", "s"))
    assert(SnapshotTable.forPath(spark, dir).properties ==
      Map("owner.team" -> "data", "autocompact.files" -> "3"))
    // the per-table autocompact property fires without ANY session conf:
    // appends above pushed live files past 3, so upkeep compacted
    val live = SnapshotTable.forPath(spark, dir).snapshotWithStats()._1.size
    assert(live <= 3, s"autocompact.files='3' property did not compact ($live live files)")
    assert(SnapshotTable.forPath(spark, dir).read().count() == 25L)
    // UNSET drops one key, keeps the other; unsetting the last key yields
    // EMPTY (declared), not inherit-from-older-commit
    spark.sql(s"ALTER LAKE '$dir' UNSET TBLPROPERTIES ('autocompact.files')")
    assert(SnapshotTable.forPath(spark, dir).properties == Map("owner.team" -> "data"))
    spark.sql(s"ALTER LAKE '$dir' UNSET TBLPROPERTIES ('owner.team')")
    assert(SnapshotTable.forPath(spark, dir).properties.isEmpty,
      "cleared property map must not resurrect older declarations")
    // codec roundtrip including checkpoint replay: force enough commits to
    // cross a checkpoint boundary and re-read cold
    spark.sql(s"ALTER LAKE '$dir' SET TBLPROPERTIES ('k' = 'v2')")
    (1 to 12).foreach(i => SnapshotTable.forPath(spark, dir)
      .append(Seq((100L + i, "x")).toDF("id", "s")))
    assert(SnapshotTable.forPath(spark, dir).properties == Map("k" -> "v2"))
  }

  test("EXPLAIN lake DML: metadata-only copy-on-write analysis, nothing executes") {
    val dir = fresh("lake_explain_dml")
    // three disjoint-range files with id stats → the prune is decisive
    spark.sql(s"""CREATE LAKE '$dir' STATS (id)
                 |AS SELECT id, 'a' AS v FROM range(0, 100)""".stripMargin)
    spark.sql(s"INSERT INTO LAKE '$dir' SELECT id, 'b' AS v FROM range(100, 200)")
    spark.sql(s"INSERT INTO LAKE '$dir' SELECT id, 'c' AS v FROM range(200, 300)")
    val t = SnapshotTable.forPath(spark, dir)
    val vBefore = t.latestVersion
    val r = spark.sql(
      s"EXPLAIN DELETE FROM LAKE '$dir' WHERE id < 50").head()
    assert(r.getString(0) == "copy-on-write delete")
    val (total, rewritten, carried) =
      (r.getString(1).toInt, r.getString(2).toInt, r.getString(3).toInt)
    assert(rewritten < total && rewritten + carried == total,
      s"expected a decisive prune, got $r")
    // an upper bound covering every matching row, decisively under the table
    assert(r.getString(4).toLong >= 50L && r.getString(4).toLong <= 100L,
      s"rows bound: $r")
    assert(r.getString(5).toLong > 0L, s"bytes known: $r")
    assert(r.getString(6) == "true", s"partial-rewrite eligible: $r")
    // PLAN FOR form + UPDATE flavor parse too
    val u = spark.sql(s"EXPLAIN PLAN FOR UPDATE LAKE '$dir' " +
      "SET v = 'z' WHERE id >= 250").head()
    assert(u.getString(0) == "copy-on-write update" && u.getString(2).toInt < total)
    // nothing executed: same version, same data
    assert(SnapshotTable.forPath(spark, dir).latestVersion == vBefore)
    assert(t.read().count() == 300L)
    // the real DELETE agrees with the forecast: it carries exactly the
    // files the explain said it would
    spark.sql(s"DELETE FROM LAKE '$dir' WHERE id < 50")
    assert(SnapshotTable.forPath(spark, dir).read().count() == 250L)
    // MERGE flavor: the source's key span (260..280) bounds the rewrite
    val m = spark.sql(s"EXPLAIN MERGE INTO LAKE '$dir' ON id USING " +
      "(SELECT id, 'm' AS v FROM range(260, 280)) " +
      "WHEN MATCHED THEN UPDATE SET v = 'm'").head()
    assert(m.getString(0).startsWith("copy-on-write merge"))
    assert(m.getString(2).toInt < m.getString(1).toInt, s"span prune: $m")
    assert(SnapshotTable.forPath(spark, dir).read().count() == 250L) // dry
    // INSERT flavor: append forecast — sticky layout + next version,
    // source never executes
    val ins = spark.sql(s"EXPLAIN INSERT INTO LAKE '$dir' " +
      "SELECT id, 'n' AS v FROM range(10)").head()
    assert(ins.getString(0) == "append" && ins.getString(2) == "id", ins.toString)
    assert(ins.getString(5).toLong ==
      SnapshotTable.forPath(spark, dir).latestVersion + 1)
    assert(SnapshotTable.forPath(spark, dir).read().count() == 250L) // dry
    // a command body inside the forecaster is refused BEFORE executing —
    // the never-executes contract would otherwise commit a real append
    val other = fresh("lake_explain_other")
    spark.sql(s"CREATE LAKE '$other' AS SELECT id FROM range(3)")
    val eCmd = intercept[Exception](spark.sql(
      s"EXPLAIN INSERT INTO LAKE '$dir' INSERT INTO LAKE '$other' SELECT id, 'x' AS v FROM range(5)"))
    assert(eCmd.getMessage.contains("QUERY body"), eCmd.getMessage)
    assert(SnapshotTable.forPath(spark, other).read().count() == 3L,
      "the nested command must not have executed")
    // a SET string literal containing 'where' is data, not the split point
    val lit = spark.sql(s"EXPLAIN UPDATE LAKE '$dir' " +
      "SET v = 'keep where possible' WHERE id >= 250").head()
    assert(lit.getString(0) == "copy-on-write update", lit.toString)
    // EXPLAIN under a session branch pin forecasts the BRANCH's snapshot
    spark.sql(s"CREATE BRANCH fc FROM LAKE '$dir'")
    spark.sql(s"DELETE FROM LAKE '$dir' AT BRANCH fc WHERE id < 100")
    spark.sql(s"USE BRANCH fc IN LAKE '$dir'")
    try {
      val br = spark.sql(s"EXPLAIN DELETE FROM LAKE '$dir' WHERE id < 100").head()
      // main still holds ids [50,100); the branch deleted them — the
      // branch forecast has zero ROWS left to rewrite (a statless empty
      // COW output may still count as a touchable file, conservatively)
      assert(br.getString(4).toLong == 0L,
        s"branch forecast must see the branch's snapshot: $br")
    } finally spark.sql(s"USE DEFAULT IN LAKE '$dir'")
    val mainFc = spark.sql(s"EXPLAIN DELETE FROM LAKE '$dir' WHERE id < 100").head()
    assert(mainFc.getString(2).toInt > 0 && mainFc.getString(4).toLong >= 50L,
      s"main forecast: $mainFc")
  }
}
