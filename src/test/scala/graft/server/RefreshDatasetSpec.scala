package graft.server

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** REFRESH DATASET over promoted datasets (reference SqlRefreshDataset,
  * `parserImpls.ftl:1475` — the unlimited-splits incremental metadata
  * refresh). The load-bearing behaviors pinned here:
  *  - promoted parquet scans plan from the MAINTAINED file index: a file
  *    dropped into the folder is INVISIBLE until a refresh (zero
  *    per-query directory listings — at 100M files that listing is the
  *    planning bottleneck);
  *  - FOR FILES stats only the named files (O(changed)): present →
  *    indexed, missing → dropped under DELETE WHEN MISSING, kept under
  *    MAINTAIN WHEN MISSING;
  *  - FOR REGEX reconciles only matching paths; the bare form is a full
  *    reconcile; FOR PARTITIONS re-lists one hive directory;
  *  - AUTO PROMOTION promotes a quoted path (format inferred) first;
  *  - lake/delta datasets refuse scoped forms (their log IS the index);
  *  - ERROR ON CONCURRENT REFRESH refuses when a refresh is in flight.
  */
class RefreshDatasetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val http = HttpClient.newHttpClient()

  private def post(path: String, body: String): (Int, String) = {
    val port = GraftRestServer.port.getOrElse(GraftRestServer.start(spark))
    val req = HttpRequest.newBuilder(URI.create(s"http://localhost:$port$path"))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body)).build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  private def sqlRest(q: String): (Int, String) =
    post("/sql", s"""{"sql": "${q.replace("\"", "\\\"")}"}""")

  /** Write `df` as ONE parquet file at exactly `target`. */
  private def writeOne(df: org.apache.spark.sql.DataFrame, target: String): Unit = {
    val tmp = Files.createTempDirectory("rfds_one").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.createDirectories(Paths.get(target).getParent)
    Files.copy(part.toPath, Paths.get(target))
  }

  test("maintained index: new files invisible until refreshed; FOR FILES is incremental") {
    import spark.implicits._
    val dir = Files.createTempDirectory("rfds_inc").toString
    writeOne(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), s"$dir/f1.parquet")
    val (pc, pb) = post("/catalog/promote", s"""{"path":"$dir","name":"rfds_ds"}""")
    assert(pc == 200, pb.take(300))
    assert(sqlRest("SELECT count(*) AS n FROM rfds_ds")._2.contains("\"n\":3"))

    // a file dropped into the folder is NOT visible: scans plan from the
    // maintained index, not a per-query listing
    writeOne(Seq((4L, "d"), (5L, "e"), (6L, "f")).toDF("id", "v"), s"$dir/f2.parquet")
    assert(sqlRest("SELECT count(*) AS n FROM rfds_ds")._2.contains("\"n\":3"))

    // file-scoped refresh: stats ONLY f2, picks it up
    val r1 = spark.sql("REFRESH DATASET rfds_ds FOR FILES ('f2.parquet')").head()
    assert(r1.getString(3) == "1" && r1.getString(4) == "0", r1.toString)
    assert(sqlRest("SELECT count(*) AS n FROM rfds_ds")._2.contains("\"n\":6"))

    // MAINTAIN WHEN MISSING keeps a deleted file indexed; DELETE drops it
    assert(new java.io.File(s"$dir/f1.parquet").delete())
    val r2 = spark.sql(
      "REFRESH DATASET rfds_ds FOR FILES ('f1.parquet') MAINTAIN WHEN MISSING").head()
    assert(r2.getString(4) == "0", r2.toString)
    val r3 = spark.sql(
      "REFRESH DATASET rfds_ds FOR FILES ('f1.parquet') DELETE WHEN MISSING").head()
    assert(r3.getString(4) == "1", r3.toString)
    assert(sqlRest("SELECT count(*) AS n FROM rfds_ds")._2.contains("\"n\":3"))
  }

  test("FOR REGEX scoping, bare full reconcile, FORCE UPDATE, lake refusal") {
    import spark.implicits._
    val dir = Files.createTempDirectory("rfds_rx").toString
    writeOne(Seq((1L, "x")).toDF("id", "v"), s"$dir/base.parquet")
    assert(post("/catalog/promote", s"""{"path":"$dir","name":"rfds_rx"}""")._1 == 200)
    writeOne(Seq((2L, "y")).toDF("id", "v"), s"$dir/a_new.parquet")
    writeOne(Seq((3L, "z")).toDF("id", "v"), s"$dir/b_new.parquet")
    // regex-scoped: only a_* reconciled, b_new stays unindexed
    val r1 = spark.sql("REFRESH DATASET rfds_rx FOR REGEX 'a_.*'").head()
    assert(r1.getString(3) == "1", r1.toString)
    assert(sqlRest("SELECT count(*) AS n FROM rfds_rx")._2.contains("\"n\":2"))
    // bare refresh reconciles everything, eagerly with FORCE UPDATE
    val r2 = spark.sql("REFRESH DATASET rfds_rx FORCE UPDATE").head()
    assert(r2.getString(3) == "1" && r2.getString(5).contains("plan rebuilt"), r2.toString)
    assert(sqlRest("SELECT count(*) AS n FROM rfds_rx")._2.contains("\"n\":3"))

    // a lake promotion is log-backed: scoped refresh refuses, bare evicts
    val lakeDir = Files.createTempDirectory("rfds_lake").toString
    graft.sources.SnapshotTable.create(spark, lakeDir, Seq((1L, "l")).toDF("id", "v"))
    assert(post("/catalog/promote",
      s"""{"path":"$lakeDir","name":"rfds_lake"}""")._1 == 200)
    val e = intercept[Exception](
      spark.sql("REFRESH DATASET rfds_lake FOR FILES ('x.parquet')"))
    assert(e.getMessage.contains("log-backed") || e.getMessage.contains("commit"),
      e.getMessage)
    assert(spark.sql("REFRESH DATASET rfds_lake").head().getString(5)
      .contains("log-backed"))
    // unpromoted name refuses with guidance
    val e2 = intercept[Exception](spark.sql("REFRESH DATASET nonesuch"))
    assert(e2.getMessage.contains("not a promoted dataset"), e2.getMessage)
    // the ALTER spelling (SqlRefreshTable) routes the scoped clauses to
    // the same handler; a no-change regex refresh reports 0/0
    val r3 = spark.sql(
      "ALTER DATASET rfds_rx REFRESH METADATA FOR REGEX 'b_.*' LAZY UPDATE").head()
    assert(r3.getString(3) == "0" && r3.getString(4) == "0", r3.toString)
  }

  test("FOR PARTITIONS re-lists one hive directory; AUTO PROMOTION promotes a path") {
    import spark.implicits._
    val dir = Files.createTempDirectory("rfds_part").toString + "/pds"
    Seq((1L, 1), (2L, 1), (3L, 2)).toDF("id", "p")
      .write.partitionBy("p").parquet(dir)
    // AUTO PROMOTION: quoted path, name = folder tail
    val r0 = spark.sql(s"REFRESH DATASET '$dir' AUTO PROMOTION").head()
    assert(r0.getString(0) == "pds" && r0.getString(2).toInt >= 2, r0.toString)
    assert(sqlRest("SELECT count(*) AS n FROM pds WHERE p = 2")._2.contains("\"n\":1"))
    // drop a file into p=2 only; partition-scoped refresh finds it and
    // leaves the p=1 slice untouched
    writeOne(Seq(4L).toDF("id"), s"$dir/p=2/late.parquet")
    val r1 = spark.sql("REFRESH DATASET pds FOR PARTITIONS (p = '2')").head()
    assert(r1.getString(3) == "1" && r1.getString(4) == "0", r1.toString)
    assert(sqlRest("SELECT count(*) AS n FROM pds WHERE p = 2")._2.contains("\"n\":2"))
    assert(sqlRest("SELECT count(*) AS n FROM pds")._2.contains("\"n\":4"))
    // the dataset the statement created is queryable from the SAME
    // surface (POST /catalog/promote parity), not only via REST
    assert(spark.sql("SELECT count(*) AS n FROM pds").head().getLong(0) == 4L)
  }

  test("AUTO PROMOTION guards: name collision refuses, bad path persists nothing, out-of-root file refused") {
    import spark.implicits._
    // collision: a dataset named like the folder tail already exists
    val d1 = Files.createTempDirectory("rfds_c1").toString + "/coll"
    writeOne(Seq(1L).toDF("id"), s"$d1/f.parquet")
    assert(post("/catalog/promote", s"""{"path":"$d1","name":"coll"}""")._1 == 200)
    val d2 = Files.createTempDirectory("rfds_c2").toString + "/coll"
    writeOne(Seq(2L).toDF("id"), s"$d2/f.parquet")
    val e1 = intercept[Exception](spark.sql(s"REFRESH DATASET '$d2' AUTO PROMOTION"))
    assert(e1.getMessage.contains("already exists"), e1.getMessage)
    // the original dataset still serves ITS path
    assert(sqlRest("SELECT max(id) AS m FROM coll")._2.contains("\"m\":1"))

    // a bad path must not leave a broken registry entry behind
    val e2 = intercept[Exception](
      spark.sql("REFRESH DATASET '/no/such/dir_rfds' AUTO PROMOTION"))
    assert(e2 != null)
    val e3 = intercept[Exception](spark.sql("REFRESH DATASET dir_rfds"))
    assert(e3.getMessage.contains("not a promoted dataset"), e3.getMessage)

    // an out-of-root file argument is refused at refresh time (indexed,
    // it would brick every later scan on basePath resolution)
    val stray = Files.createTempDirectory("rfds_stray").toString
    writeOne(Seq(9L).toDF("id"), s"$stray/s.parquet")
    val e4 = intercept[Exception](spark.sql(
      s"REFRESH DATASET coll FOR FILES ('$stray/s.parquet')"))
    assert(e4.getMessage.contains("outside the dataset root"), e4.getMessage)
    assert(sqlRest("SELECT count(*) AS n FROM coll")._2.contains("\"n\":1"))
  }
}
