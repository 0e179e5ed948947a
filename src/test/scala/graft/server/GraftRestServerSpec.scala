package graft.server

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Over-loopback proof of the REST SQL endpoint: a plain HTTP client
  * POSTs SQL to /sql and gets JSON rows matching in-process execution —
  * mirrors the reference's `POST /api/v3/sql` (SQLResource.java:81). */
class GraftRestServerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private lazy val http = HttpClient.newHttpClient()

  private def post(body: String): (Int, String) = {
    val port = GraftRestServer.port.getOrElse(GraftRestServer.start(spark))
    val req = HttpRequest.newBuilder(URI.create(s"http://localhost:$port/sql"))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body)).build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  private def jsonEscape(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")

  /** The rows array of a response, as a sorted set of row-object strings. */
  private def rowsOf(body: String): Seq[String] = {
    val i = body.indexOf("\"rows\":[")
    assert(i >= 0, s"no rows array in: ${body.take(300)}")
    val arr = body.substring(i + 8, body.lastIndexOf("]"))
    if (arr.isEmpty) Seq.empty
    else arr.split("(?<=\\}),(?=\\{)").toSeq.sorted
  }

  test("tpch_q01 over REST matches in-process execution") {
    val q =
      s"""SELECT l_returnflag, l_linestatus,
         |       count(*) AS count_order,
         |       cast(sum(l_quantity) AS decimal(20,2)) AS sum_qty
         |FROM parquet.`$sf/lineitem.parquet`
         |WHERE l_shipdate <= date '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin
    val (code, body) = post(s"""{"sql": "${jsonEscape(q)}"}""")
    assert(code == 200, s"HTTP $code: ${body.take(300)}")
    assert(body.contains("\"rowCount\":6"), s"rowCount wrong: ${body.take(200)}")
    assert(body.contains("\"schema\":["), "schema missing")
    val local = spark.sql(q).toJSON.collect().toSeq.sorted
    assert(rowsOf(body) == local, "REST rows differ from in-process toJSON")
  }

  test("lake DDL + query round-trips through REST") {
    val dir = java.nio.file.Files.createTempDirectory("rest_lake").toString
    val (c1, b1) = post(
      s"""{"sql": "CREATE LAKE '$dir' AS SELECT id, id * 2 AS v FROM range(50)"}""")
    assert(c1 == 200, s"DDL failed: $b1")
    val (c2, b2) = post(s"""{"sql": "SELECT count(*) AS n, sum(v) AS s FROM lake_scan('$dir')"}""")
    assert(c2 == 200, b2)
    assert(rowsOf(b2) == Seq(s"""{"n":50,"s":${(0 until 50).map(_ * 2).sum}}"""),
      s"lake query over REST wrong: $b2")
  }

  test("repeated REST statements hit the plan cache across per-request sessions") {
    graft.accel.PlanCache.clearAll()
    try {
      val q = """{"sql": "SELECT count(*) AS n_pc_rest FROM range(4096)"}"""
      val (c1, b1) = post(q); assert(c1 == 200, b1)
      val (_, hits0, _) = graft.accel.PlanCache.stats
      val (c2, b2) = post(q); assert(c2 == 200, b2)
      assert(rowsOf(b2) == Seq("""{"n_pc_rest":4096}"""))
      val (_, hits1, _) = graft.accel.PlanCache.stats
      assert(hits1 == hits0 + 1,
        s"second REST request must reuse the first's plan (hits $hits0 -> $hits1)")
    } finally graft.accel.PlanCache.clearAll()
  }

  test("limit field caps rows; bad requests get JSON errors") {
    val (c1, b1) = post("""{"sql": "SELECT id FROM range(100)", "limit": 7}""")
    assert(c1 == 200 && b1.contains("\"rowCount\":7"), s"limit not applied: ${b1.take(200)}")
    val (c2, b2) = post("""{"nope": 1}""")
    assert(c2 == 400 && b2.contains("\"error\""), s"missing-sql not rejected: $b2")
    val (c3, b3) = post("""{"sql": "SELEKT garbage"}""")
    assert(c3 == 400 && b3.contains("\"error\""), s"parse error not surfaced: ${b3.take(200)}")
  }

  test("auth enforcement over REST: anonymous and grant-less refused, granted principal served") {
    import graft.auth.Privileges
    Privileges.clear()
    try {
      spark.sql("CREATE USER rest_admin PASSWORD 'rp' ADMIN")
      spark.sql("CREATE USER rest_alice PASSWORD 'ap'")
      spark.sql("ALTER AUTH ENFORCE ON")
      val q = s"SELECT count(*) AS n FROM parquet.`$sf/region.parquet`"
      // anonymous request: refused by the analysis-time check
      val (c0, b0) = post(s"""{"sql": "${jsonEscape(q)}"}""")
      assert(c0 == 400 && b0.contains("lacks SELECT"), s"anonymous not refused: $b0")
      // authenticated but grant-less: refused
      val (c1, b1) = post(
        s"""{"sql": "${jsonEscape(q)}", "user": "rest_alice", "password": "ap"}""")
      assert(c1 == 400 && b1.contains("lacks SELECT"), s"grant-less not refused: $b1")
      // wrong password: authentication itself refuses
      val (c2, b2) = post(
        s"""{"sql": "${jsonEscape(q)}", "user": "rest_alice", "password": "wrong"}""")
      assert(c2 == 400 && b2.contains("authentication failed"), s"bad pw accepted: $b2")
      // grant (admin, in-process) → the same request serves
      spark.sql("AUTHENTICATE USER rest_admin PASSWORD 'rp'")
      spark.sql(s"GRANT SELECT ON '$sf/region.parquet' TO USER rest_alice")
      val (c3, b3) = post(
        s"""{"sql": "${jsonEscape(q)}", "user": "rest_alice", "password": "ap"}""")
      assert(c3 == 200 && b3.contains("\"n\":5"), s"granted read failed: $b3")
    } finally {
      Privileges.clear()
      spark.conf.unset(graft.auth.Privileges.TokenConf)
      spark.conf.unset(graft.auth.Privileges.UserConf)
    }
  }

  private def get(path: String): (Int, String) = {
    val port = GraftRestServer.port.getOrElse(GraftRestServer.start(spark))
    val req = HttpRequest.newBuilder(URI.create(s"http://localhost:$port$path")).GET().build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  test("GET /catalog lists datasets and /catalog/<name> serves its fields") {
    spark.sql("SELECT 1 AS a, 'x' AS b").createOrReplaceTempView("rest_cat_v")
    val (c1, b1) = get("/catalog")
    assert(c1 == 200 && b1.contains("rest_cat_v"), s"catalog listing missing view: ${b1.take(300)}")
    val inProc = graft.catalog.InfoSchema.tables(spark).count()
    // every in-process row appears in the REST body (same relation)
    assert(b1.count(_ == '{') - 1 >= inProc - 1)
    val (c2, b2) = get("/catalog/rest_cat_v")
    assert(c2 == 200 && b2.contains("\"fields\":["), b2.take(300))
    assert(b2.contains("\"a\"") && b2.contains("\"b\""), s"fields missing: ${b2.take(300)}")
    val (c3, b3) = get("/catalog/no_such_dataset_xyz")
    assert(c3 == 404 && b3.contains("\"error\""), b3.take(200))
  }

  private def postRaw(path: String, body: String): (Int, String) = {
    val port = GraftRestServer.port.getOrElse(GraftRestServer.start(spark))
    val req = HttpRequest.newBuilder(URI.create(s"http://localhost:$port$path"))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body)).build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  test("collaboration wiki + tags: version handshake, 409 on stale, 404 on unknown") {
    graft.catalog.Collaboration.reset()
    spark.sql("SELECT 1 AS a").createOrReplaceTempView("rest_collab_v")
    // empty defaults before anything is saved
    val (g0, b0) = get("/catalog/rest_collab_v/collaboration/wiki")
    assert(g0 == 200 && b0.contains("\"text\":\"\"") && b0.contains("\"version\":null"), b0)
    val (t0, tb0) = get("/catalog/rest_collab_v/collaboration/tag")
    assert(t0 == 200 && tb0.contains("\"tags\":[]"), tb0)
    // first save: no version field
    val (w1, wb1) = postRaw("/catalog/rest_collab_v/collaboration/wiki",
      """{"text": "the events table wiki"}""")
    assert(w1 == 200 && wb1.contains("\"version\":0"), wb1)
    // update MUST present the stored version; bumps it
    val (w2, wb2) = postRaw("/catalog/rest_collab_v/collaboration/wiki",
      """{"text": "updated", "version": 0}""")
    assert(w2 == 200 && wb2.contains("\"version\":1"), wb2)
    // a stale version is the reference's ConcurrentModification -> 409
    val (w3, wb3) = postRaw("/catalog/rest_collab_v/collaboration/wiki",
      """{"text": "lost update", "version": 0}""")
    assert(w3 == 409 && wb3.contains("does not match"), s"$w3 $wb3")
    val (g1, gb1) = get("/catalog/rest_collab_v/collaboration/wiki")
    assert(g1 == 200 && gb1.contains("\"text\":\"updated\""), gb1)
    // tags: save, read back, duplicate refused as 400
    val (tg1, tgb1) = postRaw("/catalog/rest_collab_v/collaboration/tag",
      """{"tags": ["gold", "pii"]}""")
    assert(tg1 == 200 && tgb1.contains("\"gold\"") && tgb1.contains("\"version\":0"), tgb1)
    val (tg2, tgb2) = postRaw("/catalog/rest_collab_v/collaboration/tag",
      """{"tags": ["gold", "gold"], "version": 0}""")
    assert(tg2 == 400 && tgb2.contains("unique"), s"$tg2 $tgb2")
    // unknown dataset is 404 for both verbs
    val (u1, _) = get("/catalog/no_such_ds_zzz/collaboration/wiki")
    assert(u1 == 404)
    val (u2, _) = postRaw("/catalog/no_such_ds_zzz/collaboration/wiki",
      """{"text": "x"}""")
    assert(u2 == 404)
  }

  test("GET /catalog?q= searches names, tags, and wiki text") {
    graft.catalog.Collaboration.reset()
    spark.sql("SELECT 1 AS a").createOrReplaceTempView("search_alpha")
    spark.sql("SELECT 1 AS a").createOrReplaceTempView("search_beta")
    graft.catalog.Collaboration.setTags("search_beta", Seq("goldset"), None)
    graft.catalog.Collaboration.setWiki("search_alpha",
      "curated quarterly revenue numbers", None)
    // name match
    val (c1, b1) = get("/catalog?q=search_al")
    assert(c1 == 200 && b1.contains("search_alpha") && !b1.contains("search_beta"), b1.take(300))
    // tag match finds beta only
    val (c2, b2) = get("/catalog?q=goldset")
    assert(c2 == 200 && b2.contains("search_beta") && !b2.contains("search_alpha"), b2.take(300))
    // wiki text match finds alpha only
    val (c3, b3) = get("/catalog?q=quarterly%20revenue")
    assert(c3 == 200 && b3.contains("search_alpha") && !b3.contains("search_beta"), b3.take(300))
    // no match -> empty data array, still 200
    val (c4, b4) = get("/catalog?q=zzz_nothing_matches")
    assert(c4 == 200 && b4.contains("\"data\":[]"), b4.take(200))
    // percent-encoded specials decode exactly once: '%' and '&' inside the
    // needle must neither 500 nor split the parameter
    graft.catalog.Collaboration.setWiki("search_beta", "grew 50% y/y", None)
    val (c5, b5) = get("/catalog?q=50%25")
    assert(c5 == 200 && b5.contains("search_beta"), s"$c5 ${b5.take(200)}")
    val (c6, b6) = get("/catalog?q=a%26b_no_such")
    assert(c6 == 200 && b6.contains("\"data\":[]"), s"$c6 ${b6.take(200)}")
  }

  private def getAuthed(path: String, user: String, pw: String): (Int, String) = {
    val port = GraftRestServer.port.getOrElse(GraftRestServer.start(spark))
    val cred = java.util.Base64.getEncoder.encodeToString(s"$user:$pw".getBytes)
    val req = HttpRequest.newBuilder(URI.create(s"http://localhost:$port$path"))
      .header("Authorization", s"Basic $cred").GET().build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  test("GET /catalog tree: reflections listed, lake version info served") {
    // a reflection appears in the tree (reference CatalogResource's
    // entity inventory includes acceleration objects)
    val rdir = java.nio.file.Files.createTempDirectory("rest_refl").toString + "/r"
    spark.sql(s"CREATE REFLECTION rest_cat_refl USING PATH '$rdir' AS " +
      s"SELECT n_nationkey, n_name FROM parquet.`$sf/nation.parquet`")
    try {
      val (c1, b1) = get("/catalog")
      assert(c1 == 200 && b1.contains("\"reflections\":[") &&
        b1.contains("rest_cat_refl"), b1.take(400))
    } finally spark.sql("DROP REFLECTION rest_cat_refl")
    // lake version info: latest snapshot + refs over the wire
    val dir = java.nio.file.Files.createTempDirectory("rest_lake").toString + "/t"
    spark.sql(s"CREATE LAKE '$dir' AS SELECT id FROM range(10)")
    spark.sql(s"INSERT INTO LAKE '$dir' SELECT id + 10 AS id FROM range(5)")
    spark.sql(s"CREATE BRANCH rest_b FROM LAKE '$dir'")
    val enc = java.net.URLEncoder.encode(dir, "UTF-8")
    val (c2, b2) = get(s"/catalog/lake?path=$enc")
    assert(c2 == 200 && b2.contains("\"version\":2"), b2.take(300))
    assert(b2.contains("\"rest_b\"") && b2.contains("\"branch\""), b2.take(400))
    val (c3, b3) = get("/catalog/lake?path=/no/such/dir")
    assert(c3 == 404 && b3.contains("error"), b3.take(200))
  }

  test("GET /catalog honors grants while enforcing: 401 anonymous, 403 ungranted, tree filtered") {
    import graft.auth.Privileges
    Privileges.clear()
    spark.sql("SELECT 1 AS a").createOrReplaceTempView("rest_gated_v")
    spark.sql("SELECT 2 AS b").createOrReplaceTempView("rest_hidden_v")
    try {
      spark.sql("CREATE USER rc_admin PASSWORD 'ap' ADMIN")
      spark.sql("CREATE USER rc_carol PASSWORD 'cp'")
      spark.sql("GRANT SELECT ON rest_gated_v TO USER rc_carol")
      spark.sql("ALTER AUTH ENFORCE ON")
      // anonymous: refused outright
      val (ca, _) = get("/catalog")
      assert(ca == 401)
      val (cb, _) = get("/catalog/rest_gated_v")
      assert(cb == 401)
      // carol: sees only her granted dataset in the tree
      val (cc, bc) = getAuthed("/catalog", "rc_carol", "cp")
      assert(cc == 200 && bc.contains("rest_gated_v") &&
        !bc.contains("rest_hidden_v"), bc.take(400))
      // detail: granted 200, ungranted 403 (schema disclosure is a leak)
      val (cd, bd) = getAuthed("/catalog/rest_gated_v", "rc_carol", "cp")
      assert(cd == 200 && bd.contains("\"a\""), bd.take(300))
      val (ce, _) = getAuthed("/catalog/rest_hidden_v", "rc_carol", "cp")
      assert(ce == 403)
      // bad credentials: 401
      val (cf, _) = getAuthed("/catalog", "rc_carol", "wrong")
      assert(cf == 401)
    } finally {
      Privileges.clear()
      spark.conf.unset(graft.auth.Privileges.TokenConf)
      spark.conf.unset(graft.auth.Privileges.UserConf)
      spark.catalog.dropTempView("rest_gated_v")
      spark.catalog.dropTempView("rest_hidden_v")
    }
  }

  test("GET /jobs lists history and /jobs/<id>/profile matches in-process metrics") {
    // run a tracked statement so history + profile exist
    spark.sql(s"SELECT count(*) AS n FROM parquet.`$sf/nation.parquet`").collect()
    val recs = graft.catalog.QueryHistory.records
    assert(recs.nonEmpty)
    val (c1, b1) = get("/jobs")
    assert(c1 == 200, b1.take(300))
    // the history ring is SHARED across the JVM — concurrently-running
    // suites may append (and evict) between our snapshot and the GET, so
    // assert on the listing's own newest id (must be at least as new as
    // our statement) and fetch the detail by a LISTED id, never by a
    // possibly-evicted one
    val idRe = "\"id\":(\\d+)".r
    val listedIds = idRe.findAllMatchIn(b1).map(_.group(1).toLong).toSeq
    assert(listedIds.nonEmpty && listedIds.head >= recs.last.id,
      s"listing must lead with a job at least as new as ours: ${b1.take(300)}")
    val (c2, b2) = get(s"/jobs/${listedIds.head}")
    assert(c2 == 200 && b2.contains("\"durationMs\":"), b2.take(300))
    // profile: use the latest profiled id (profiles ride successful
    // actions); retry once if a concurrent storm evicted it mid-check
    def profileRound(): (Int, String, Seq[graft.catalog.OperatorProfile]) = {
      val pid = graft.catalog.QueryHistory.latestProfiledId.get
      val ops = graft.catalog.QueryHistory.profileOf(pid)
      val (c, b) = get(s"/jobs/$pid/profile")
      (c, b, ops)
    }
    val (c3, b3, ops) = profileRound() match {
      case (404, _, _) => profileRound()
      case ok => ok
    }
    assert(c3 == 200, b3.take(300))
    ops.foreach(o => assert(b3.contains(s"""\"operator\":\"${o.operator}\""""),
      s"operator ${o.operator} missing from REST profile"))
    val (c4, b4) = get("/jobs/999999999/profile")
    assert(c4 == 404 && b4.contains("\"error\""), b4.take(200))
    val (c5, b5) = get("/jobs/not_a_number")
    assert(c5 == 400, b5.take(200))
  }

  test("REST sessions are isolated: temp views do not leak across requests") {
    val (c1, _) = post("""{"sql": "CREATE TEMPORARY VIEW rest_iso AS SELECT 1 AS v"}""")
    assert(c1 == 200)
    val (c2, b2) = post("""{"sql": "SELECT v FROM rest_iso"}""")
    assert(c2 == 400 && b2.contains("\"error\""),
      s"temp view leaked across REST sessions: $b2")
  }

  test("POST /jobs/<id>/cancel kills a running statement over the wire") {
    import graft.engine.RunningQueries
    import scala.concurrent.{ExecutionContext, Future}
    implicit val ec: ExecutionContext = ExecutionContext.global
    val port = GraftRestServer.port.getOrElse(GraftRestServer.start(spark))
    val before = RunningQueries.list.map(_.id).toSet
    val victim = Future {
      scala.util.Try(graft.Graft.sql(spark,
        "SELECT sum(id * id) AS s FROM range(60000000000)").collect())
    }
    val deadline = System.nanoTime() + 30e9.toLong
    def fresh = RunningQueries.list.filterNot(r => before(r.id))
    while (fresh.isEmpty && System.nanoTime() < deadline) Thread.sleep(20)
    val id = fresh.head.id
    val req = HttpRequest.newBuilder(
        URI.create(s"http://localhost:$port/jobs/$id/cancel"))
      .POST(HttpRequest.BodyPublishers.noBody()).build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    assert(resp.statusCode() == 200 && resp.body().contains("cancelled"),
      s"${resp.statusCode()}: ${resp.body()}")
    // the victim dies (cancelled) instead of running 60B rows
    val r = scala.concurrent.Await.result(victim,
      scala.concurrent.duration.Duration(120, "s"))
    assert(r.isFailure, "cancelled statement must not complete")
    // unknown id → 404
    val miss = http.send(HttpRequest.newBuilder(
        URI.create(s"http://localhost:$port/jobs/999999/cancel"))
      .POST(HttpRequest.BodyPublishers.noBody()).build(),
      HttpResponse.BodyHandlers.ofString())
    assert(miss.statusCode() == 404)
  }

  test("cancel is auth-gated while enforcing: anonymous 401, non-owner 403, owner 200") {
    import graft.auth.Privileges
    import graft.engine.RunningQueries
    import scala.concurrent.{ExecutionContext, Future}
    implicit val ec: ExecutionContext = ExecutionContext.global
    val port = GraftRestServer.port.getOrElse(GraftRestServer.start(spark))
    def cancel(id: Long, body: String): (Int, String) = {
      val resp = http.send(HttpRequest.newBuilder(
          URI.create(s"http://localhost:$port/jobs/$id/cancel"))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofString())
      (resp.statusCode(), resp.body())
    }
    Privileges.clear()
    try {
      spark.sql("CREATE USER root_u PASSWORD 'rp' ADMIN")
      spark.sql("CREATE USER mallory PASSWORD 'mp'")
      spark.sql("CREATE USER owner_u PASSWORD 'op'")
      spark.sql("ALTER AUTH ENFORCE ON")
      // long-running statement owned by owner_u on its own session
      val sess = spark.newSession()
      Privileges.login(sess, "owner_u", "op")
      val before = RunningQueries.list.map(_.id).toSet
      val victim = Future {
        scala.util.Try(graft.Graft.sql(sess,
          "SELECT sum(id * id) AS s FROM range(60000000000)").collect())
      }
      val deadline = System.nanoTime() + 30e9.toLong
      def fresh = RunningQueries.list.filterNot(r => before(r.id))
      while (fresh.isEmpty && System.nanoTime() < deadline) Thread.sleep(20)
      val run = fresh.head
      assert(run.owner.contains("owner_u"), s"ledger owner: ${run.owner}")
      // anonymous → 401
      val (cAnon, bAnon) = cancel(run.id, "")
      assert(cAnon == 401 && bAnon.contains("credentials"), s"$cAnon $bAnon")
      // bad password → 401
      assert(cancel(run.id, """{"user":"mallory","password":"wrong"}""")._1 == 401)
      // authenticated non-owner, non-admin → 403
      val (cMal, bMal) = cancel(run.id, """{"user":"mallory","password":"mp"}""")
      assert(cMal == 403 && bMal.contains("neither admin nor the owner"),
        s"$cMal $bMal")
      assert(RunningQueries.list.exists(_.id == run.id),
        "refused cancel must not kill the statement")
      // the owner may kill their own statement
      val (cOwn, bOwn) = cancel(run.id, """{"user":"owner_u","password":"op"}""")
      assert(cOwn == 200 && bOwn.contains("cancelled"), s"$cOwn $bOwn")
      val r = scala.concurrent.Await.result(victim,
        scala.concurrent.duration.Duration(120, "s"))
      assert(r.isFailure, "cancelled statement must not complete")
    } finally {
      Privileges.clear()
      spark.conf.unset(Privileges.TokenConf)
      spark.conf.unset(Privileges.UserConf)
    }
  }

  private def delete(path: String): (Int, String) = {
    val port = GraftRestServer.port.getOrElse(GraftRestServer.start(spark))
    val req = HttpRequest.newBuilder(URI.create(s"http://localhost:$port$path"))
      .DELETE().build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  test("POST /catalog/promote formats a folder into a dataset; DELETE unpromotes") {
    import spark.implicits._
    // a plain parquet folder → inferred format, registered, queryable
    val pq = java.nio.file.Files.createTempDirectory("rest_promote_pq").toString
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      .write.mode("overwrite").parquet(pq)
    val (c1, b1) = postRaw("/catalog/promote",
      s"""{"path":"$pq","name":"rest_promoted"}""")
    assert(c1 == 200 && b1.contains("\"format\":\"parquet\""), b1.take(300))
    // immediately queryable through /sql and listed by /catalog
    val (c2, b2) = post("""{"sql":"SELECT count(*) AS n FROM rest_promoted"}""")
    assert(c2 == 200 && b2.contains("\"n\":3"), b2.take(300))
    assert(get("/catalog")._2.contains("rest_promoted"))
    // a graft-lake folder infers format "lake" and serves versioned reads
    val lakeDir = java.nio.file.Files.createTempDirectory("rest_promote_lake").toString
    graft.sources.SnapshotTable.create(spark, lakeDir,
      Seq((10L, "x")).toDF("id", "v"))
    val (c3, b3) = postRaw("/catalog/promote",
      s"""{"path":"$lakeDir","name":"rest_promoted_lake"}""")
    assert(c3 == 200 && b3.contains("\"format\":\"lake\""), b3.take(300))
    val (c4, b4) = post("""{"sql":"SELECT v FROM rest_promoted_lake"}""")
    assert(c4 == 200 && b4.contains("\"v\":\"x\""), b4.take(300))
    // malformed requests refuse
    assert(postRaw("/catalog/promote", """{"name":"only_name"}""")._1 == 400)
    assert(postRaw("/catalog/promote",
      s"""{"path":"$pq","name":"bad name!"}""")._1 == 400)
    // unpromote drops the dataset; a second delete is 404
    val (c5, b5) = delete("/catalog/rest_promoted")
    assert(c5 == 200 && b5.contains("\"dropped\":true"), b5.take(200))
    assert(post("""{"sql":"SELECT * FROM rest_promoted"}""")._2.contains("error"))
    assert(delete("/catalog/rest_promoted")._1 == 404)
    delete("/catalog/rest_promoted_lake")
  }

  test("schema learning: REFRESH METADATA learns drift, DISABLE pins, pin survives restart") {
    import spark.implicits._
    val reg = java.nio.file.Files.createTempDirectory("rest_sl_reg").toString +
      "/promotions.json"
    val folder = java.nio.file.Files.createTempDirectory("rest_schema_learn").toString
    Seq((1L, "a")).toDF("id", "v").write.mode("append").parquet(folder)
    spark.conf.set("spark.graft.rest.promotionsFile", reg)
    try {
      GraftRestServer.stop()
      assert(postRaw("/catalog/promote",
        s"""{"path":"$folder","name":"sl_ds"}""")._1 == 200)
      def cols(): Set[String] = {
        val (c, b) = post("""{"sql":"SELECT * FROM sl_ds LIMIT 1"}""")
        assert(c == 200, b.take(300))
        """\{"name":"(\w+)"""".r.findAllMatchIn(b).map(_.group(1)).toSet
      }
      assert(cols() == Set("id", "v"))
      // drift a new column in; the frozen listing serves until REFRESH
      Seq((2L, "b", 9L)).toDF("id", "v", "extra")
        .write.mode("append").parquet(folder)
      assert(post("""{"sql":"ALTER TABLE sl_ds REFRESH METADATA"}""")._1 == 200)
      assert(cols() == Set("id", "v", "extra")) // learning ON by default
      // DISABLE pins the schema captured now — remove a column on disk,
      // the pinned read serves it as NULL and never shows new drift
      assert(post("""{"sql":"ALTER TABLE sl_ds DISABLE SCHEMA LEARNING"}""")._1 == 200)
      Seq((3L, "c", 1L, 2L)).toDF("id", "v", "extra", "extra2")
        .write.mode("append").parquet(folder)
      assert(post("""{"sql":"ALTER TABLE sl_ds REFRESH METADATA"}""")._1 == 200)
      assert(cols() == Set("id", "v", "extra")) // extra2 not learned
      // the pin is durable: a restart reloads it from the registry
      GraftRestServer.stop()
      assert(cols() == Set("id", "v", "extra"))
      // ENABLE re-learns everything on disk
      assert(post("""{"sql":"ALTER TABLE sl_ds ENABLE SCHEMA LEARNING"}""")._1 == 200)
      assert(cols() == Set("id", "v", "extra", "extra2"))
      // toggling a non-promoted name refuses
      assert(post("""{"sql":"ALTER TABLE nope_ds DISABLE SCHEMA LEARNING"}""")
        ._2.contains("not a promoted dataset"))
    } finally {
      delete("/catalog/sl_ds")
      spark.conf.unset("spark.graft.rest.promotionsFile")
      GraftRestServer.stop()
    }
  }

  test("ALTER TABLE FORGET METADATA drops the promotion, keeps the data, refuses unknowns") {
    import spark.implicits._
    val folder = java.nio.file.Files.createTempDirectory("rest_forget").toString
    Seq((1L, "x")).toDF("id", "v").write.mode("overwrite").parquet(folder)
    assert(postRaw("/catalog/promote",
      s"""{"path":"$folder","name":"forget_ds"}""")._1 == 200)
    assert(post("""{"sql":"SELECT count(*) AS n FROM forget_ds"}""")._2.contains("\"n\":1"))
    // FORGET drops only the DEFINITION (reference SqlForgetTable)
    assert(post("""{"sql":"ALTER TABLE forget_ds FORGET METADATA"}""")._1 == 200)
    assert(post("""{"sql":"SELECT * FROM forget_ds"}""")._2.contains("error"))
    assert(spark.read.parquet(folder).count() == 1) // data untouched
    // forgotten → re-promotable; unknown names refuse
    assert(postRaw("/catalog/promote",
      s"""{"path":"$folder","name":"forget_ds"}""")._1 == 200)
    assert(post("""{"sql":"ALTER TABLE never_was FORGET METADATA"}""")
      ._2.contains("not a promoted dataset"))
    delete("/catalog/forget_ds")
  }

  test("promotions survive a server restart via the durable registry") {
    import spark.implicits._
    val reg = java.nio.file.Files.createTempDirectory("rest_reg").toString +
      "/promotions.json"
    val data = java.nio.file.Files.createTempDirectory("rest_durable").toString
    Seq((1L, "keep")).toDF("id", "v").write.mode("overwrite").parquet(data)
    spark.conf.set("spark.graft.rest.promotionsFile", reg)
    try {
      GraftRestServer.stop() // fresh start under the conf'd registry path
      val (c1, b1) = postRaw("/catalog/promote",
        s"""{"path":"$data","name":"durable_ds"}""")
      assert(c1 == 200, b1.take(200))
      assert(new java.io.File(reg).exists,
        "registry file must be written on promote")
      // full restart: stop() drops ALL in-memory promotion state, so the
      // dataset can only come back through the registry reload
      GraftRestServer.stop()
      GraftRestServer.start(spark)
      val (c2, b2) = post("""{"sql":"SELECT v FROM durable_ds"}""")
      assert(c2 == 200 && b2.contains("\"v\":\"keep\""), b2.take(300))
      // unpromote persists the removal — a further restart must not
      // resurrect the dataset
      assert(delete("/catalog/durable_ds")._1 == 200)
      GraftRestServer.stop()
      GraftRestServer.start(spark)
      assert(post("""{"sql":"SELECT v FROM durable_ds"}""")._2.contains("error"))
    } finally {
      spark.conf.unset("spark.graft.rest.promotionsFile")
      delete("/catalog/durable_ds")
    }
  }

  private def postRawAuthed(path: String, body: String,
                            user: String, pw: String): (Int, String) = {
    val port = GraftRestServer.port.getOrElse(GraftRestServer.start(spark))
    val cred = java.util.Base64.getEncoder.encodeToString(s"$user:$pw".getBytes)
    val req = HttpRequest.newBuilder(URI.create(s"http://localhost:$port$path"))
      .header("Authorization", s"Basic $cred")
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body)).build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  test("promotion cannot shadow an existing dataset name without authority over it") {
    import spark.implicits._
    import graft.auth.Privileges
    Privileges.clear()
    val mine = java.nio.file.Files.createTempDirectory("rest_shadow_eve").toString
    val shared = java.nio.file.Files.createTempDirectory("rest_shadow_adm").toString
    Seq((1L, "eve")).toDF("id", "who").write.mode("overwrite").parquet(mine)
    Seq((1L, "real")).toDF("id", "who").write.mode("overwrite").parquet(shared)
    try {
      spark.sql("CREATE USER shadow_admin PASSWORD 'sp' ADMIN")
      spark.sql("CREATE USER shadow_eve PASSWORD 'ep'")
      spark.sql("ALTER AUTH ENFORCE ON")
      spark.sql("AUTHENTICATE USER shadow_admin PASSWORD 'sp'")
      spark.sql(s"GRANT ALTER ON '$mine' TO USER shadow_eve")
      // admin promotes the shared dataset name
      val (ca, ba) = postRawAuthed("/catalog/promote",
        s"""{"path":"$shared","name":"shadow_ds"}""", "shadow_admin", "sp")
      assert(ca == 200, ba.take(200))
      // eve holds ALTER on HER path — but re-pointing the TAKEN name
      // would hijack everyone's queries: 403 on the name
      val (ce, be) = postRawAuthed("/catalog/promote",
        s"""{"path":"$mine","name":"shadow_ds"}""", "shadow_eve", "ep")
      assert(ce == 403 && be.contains("already exists"), s"$ce ${be.take(200)}")
      // a FREE name under her own path grant is fine
      val (cf, bf) = postRawAuthed("/catalog/promote",
        s"""{"path":"$mine","name":"shadow_eve_ds"}""", "shadow_eve", "ep")
      assert(cf == 200, bf.take(200))
      // the admin may re-point the taken name (authority over the name)
      val (cr, br) = postRawAuthed("/catalog/promote",
        s"""{"path":"$shared","name":"shadow_ds"}""", "shadow_admin", "sp")
      assert(cr == 200, br.take(200))
    } finally {
      Privileges.clear()
      spark.conf.unset(Privileges.TokenConf)
      spark.conf.unset(Privileges.UserConf)
      delete("/catalog/shadow_ds")
      delete("/catalog/shadow_eve_ds")
    }
  }
}
