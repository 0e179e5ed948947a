package graft.catalog

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.auth.Privileges

/** Named-source lifecycle + live state (reference dac SourceResource /
  * SourceState; `ALTER SOURCE ... REFRESH STATUS` =
  * `RefreshSourceStatusHandler.java:49`, `... CLEAR PERMISSION CACHE` =
  * SqlClearSourcePermissionCache, alter.ftl:58-60). Pinned:
  *  - probes are REAL: jdbc opens a connection, files/lake stat the FS,
  *    a broken target reports `bad` with the failure message;
  *  - CREATE SOURCE TYPE jdbc publishes the conf `external_query`
  *    resolves — a new source is immediately queryable;
  *  - REFRESH STATUS observes state transitions (dir deleted → bad);
  *  - the permission cache memoizes grant closures but is invalidated
  *    on every grant/revoke — a revocation is NEVER served stale — and
  *    CLEAR PERMISSION CACHE drops the memo explicitly.
  */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    graft.catalog.InfoSchema.register(s)
    s
  }

  private def withSources(body: => Unit): Unit =
    try body finally Sources.clear(spark)

  test("jdbc source: real probe, external_query through the registered name") {
    withSources {
      import spark.implicits._
      val url = "jdbc:derby:memory:srcspec;create=true"
      Seq((1L, "x"), (2L, "y")).toDF("id", "name")
        .write.format("jdbc")
        .option("url", url).option("dbtable", "SRC_T")
        .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
        .option("createTableColumnTypes", "name VARCHAR(32)")
        .mode("overwrite").save()
      val row = spark.sql(
        s"""CREATE SOURCE remote_db TYPE jdbc (
           |  'url' = '$url',
           |  'driver' = 'org.apache.derby.jdbc.EmbeddedDriver')""".stripMargin).head()
      assert(row.getString(2) == "good", row.toString)
      // the registered name IS an external_query source — no manual conf
      val got = spark.sql(
        """SELECT id FROM external_query('remote_db',
          |  'SELECT "id" FROM APP.SRC_T ORDER BY "id"')""".stripMargin)
        .collect().map(_.getLong(0)).toSeq
      assert(got == Seq(1L, 2L))
      // a jdbc source pointing nowhere probes bad, not thrown
      val bad = spark.sql(
        "CREATE SOURCE broken_db TYPE jdbc ('url' = 'jdbc:derby:memory:nope')")
        .head()
      assert(bad.getString(2) == "bad" && bad.getString(3).nonEmpty, bad.toString)
      // duplicate refuses; IF NOT EXISTS passes through
      intercept[Exception](spark.sql(
        s"CREATE SOURCE remote_db TYPE jdbc ('url' = '$url')"))
      spark.sql(s"CREATE SOURCE IF NOT EXISTS remote_db TYPE jdbc ('url' = '$url')")
      // drop unregisters and clears the published conf
      spark.sql("DROP SOURCE remote_db")
      intercept[Exception](spark.sql(
        "SELECT * FROM external_query('remote_db', 'SELECT 1')"))
    }
  }

  test("registry is the resolution authority: cross-session create/drop coherence") {
    withSources {
      import spark.implicits._
      val url = "jdbc:derby:memory:srcxsess;create=true"
      Seq((7L, "q")).toDF("id", "name")
        .write.format("jdbc")
        .option("url", url).option("dbtable", "XS_T")
        .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
        .option("createTableColumnTypes", "name VARCHAR(32)")
        .mode("overwrite").save()
      spark.sql(
        s"""CREATE SOURCE xsess_db TYPE jdbc (
           |  'url' = '$url',
           |  'driver' = 'org.apache.derby.jdbc.EmbeddedDriver')""".stripMargin)
      // a DIFFERENT session (runtime conf NOT inherited by newSession)
      // resolves the source immediately — the registry, not session conf,
      // is the channel
      val other = spark.newSession()
      val got = other.sql(
        """SELECT id FROM external_query('xsess_db',
          |  'SELECT "id" FROM APP.XS_T')""".stripMargin)
        .collect().map(_.getLong(0)).toSeq
      assert(got == Seq(7L))
      // DROP issued from the OTHER session unregisters it for everyone —
      // including the creating session (no stale per-session conf keys
      // keep the supposedly-dropped connection reachable)
      other.sql("DROP SOURCE xsess_db")
      intercept[Exception](other.sql(
        "SELECT * FROM external_query('xsess_db', 'SELECT 1')"))
      intercept[Exception](spark.sql(
        "SELECT * FROM external_query('xsess_db', 'SELECT 1')"))
    }
  }

  test("files/lake probes, REFRESH STATUS transitions, SHOW SOURCES, sys_sources") {
    withSources {
      import spark.implicits._
      val dir = Files.createTempDirectory("srcfiles").toString
      assert(spark.sql(
        s"CREATE SOURCE staging TYPE files ('path' = '$dir')").head().getString(2) == "good")
      // a plain dir is a WARN lake (exists, no commit log); a real lake is good
      assert(spark.sql(
        s"CREATE SOURCE notlake TYPE lake ('path' = '$dir')").head().getString(2) == "warn")
      val lakeDir = Files.createTempDirectory("srclake").toString
      graft.sources.SnapshotTable.forPath(spark, lakeDir)
        .append(Seq((1, "a")).toDF("id", "v"))
      assert(spark.sql(
        s"CREATE SOURCE mylake TYPE lake ('path' = '$lakeDir')").head().getString(2) == "good")
      // unknown type refuses loudly
      val e = intercept[Exception](spark.sql(
        "CREATE SOURCE z TYPE mongo ('path' = '/x')"))
      assert(e.getMessage.contains("unknown source type"), e.getMessage)

      // deleting the dir flips the NEXT refresh to bad, with the path named
      assert(new java.io.File(dir).delete())
      val r = spark.sql("ALTER SOURCE staging REFRESH STATUS").head()
      assert(r.getString(1) == "bad" && r.getString(2).contains(dir), r.toString)
      // ...and the stored state reflects it everywhere
      val shown = spark.sql("SHOW SOURCES").collect()
        .map(x => (x.getString(0), x.getString(2))).toMap
      assert(shown("staging") == "bad" && shown("mylake") == "good")
      assert(spark.sql(
        "SELECT status FROM sys_sources WHERE name = 'staging'").head().getString(0) == "bad")
      // unknown source refuses on both ALTER forms
      intercept[Exception](spark.sql("ALTER SOURCE nope REFRESH STATUS"))
      intercept[Exception](spark.sql("ALTER SOURCE nope CLEAR PERMISSION CACHE"))
    }
  }

  test("REST /source lifecycle mirrors the SQL DDL (SourceResource parity)") {
    withSources {
      val http = java.net.http.HttpClient.newHttpClient()
      val port = graft.server.GraftRestServer.port
        .getOrElse(graft.server.GraftRestServer.start(spark))
      def call(method: String, path: String, body: String = ""): (Int, String) = {
        val b = java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://localhost:$port$path"))
        val req = (method match {
          case "GET" => b.GET()
          case "DELETE" => b.DELETE()
          case m => b.method(m,
            java.net.http.HttpRequest.BodyPublishers.ofString(body))
        }).build()
        val r = http.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
        (r.statusCode(), r.body())
      }
      val dir = Files.createTempDirectory("srcrest").toString
      // PUT creates (with a real probe), GET reads it back, list includes it
      val (c1, b1) = call("PUT", "/source/rest_files",
        s"""{"type":"files","path":"$dir"}""")
      assert(c1 == 200 && b1.contains("\"status\":\"good\""), b1)
      assert(call("GET", "/source/rest_files")._2.contains(s""""path":"$dir""""))
      assert(call("GET", "/source")._2.contains("rest_files"))
      // the SQL surface sees REST-created sources and vice versa
      assert(spark.sql("SHOW SOURCES").collect().exists(_.getString(0) == "rest_files"))
      // POST refresh re-probes: deleting the dir flips to bad
      assert(new java.io.File(dir).delete())
      val (c2, b2) = call("POST", "/source/rest_files/refresh")
      assert(c2 == 200 && b2.contains("\"status\":\"bad\""), b2)
      // PUT is validate-then-swap: a bad update body must NOT destroy the
      // existing source
      val (cBad, _) = call("PUT", "/source/rest_files", """{"type":"bogus"}""")
      assert(cBad == 400)
      val (cBad2, _) = call("PUT", "/source/rest_files", """{"type":"jdbc"}""")
      assert(cBad2 == 400) // jdbc without url
      assert(call("GET", "/source/rest_files")._1 == 200,
        "a refused update destroyed the existing source")
      // PUT replaces; DELETE unregisters; unknown is 404
      val dir2 = Files.createTempDirectory("srcrest2").toString
      val (c3, b3) = call("PUT", "/source/rest_files",
        s"""{"type":"files","path":"$dir2"}""")
      assert(c3 == 200 && b3.contains("\"status\":\"good\""), b3)
      assert(call("DELETE", "/source/rest_files")._1 == 200)
      assert(call("GET", "/source/rest_files")._1 == 404)
      assert(call("POST", "/source/nope/refresh")._1 == 404)
    }
  }

  test("permission cache: memoized closures never serve a stale revocation; CLEAR drops them") {
    withSources {
      val dir = Files.createTempDirectory("srcperm").toString
      spark.sql(s"CREATE SOURCE permsrc TYPE files ('path' = '$dir')")
      Privileges.clear()
      spark.conf.unset(Privileges.TokenConf)
      try {
        spark.sql("CREATE USER root_u PASSWORD 'rp' ADMIN")
        spark.sql("CREATE USER gina PASSWORD 'gp'")
        spark.sql("GRANT SELECT ON nation TO USER gina")
        graft.engine.Tables.ensure(spark, TestSpark.sf)
        spark.sql("ALTER AUTH ENFORCE ON")
        spark.sql("AUTHENTICATE USER gina PASSWORD 'gp'")
        // warm the closure memo, read allowed
        assert(spark.sql("SELECT count(*) AS n FROM nation").head().getLong(0) == 25L)
        // revocation invalidates the memo in-line: the very next read refuses
        spark.sql("AUTHENTICATE USER root_u PASSWORD 'rp'")
        spark.sql("REVOKE ALL ON nation FROM USER gina")
        spark.sql("AUTHENTICATE USER gina PASSWORD 'gp'")
        intercept[Exception](spark.sql("SELECT count(*) FROM nation"))
        // re-grant, warm again, then CLEAR PERMISSION CACHE reports the
        // dropped closures and the world keeps working
        spark.sql("AUTHENTICATE USER root_u PASSWORD 'rp'")
        spark.sql("GRANT SELECT ON nation TO USER gina")
        spark.sql("AUTHENTICATE USER gina PASSWORD 'gp'")
        assert(spark.sql("SELECT count(*) AS n FROM nation").head().getLong(0) == 25L)
        spark.sql("AUTHENTICATE USER root_u PASSWORD 'rp'")
        val dropped = spark.sql("ALTER SOURCE permsrc CLEAR PERMISSION CACHE")
          .head().getString(1).toInt
        assert(dropped >= 1, s"expected warm closures, got $dropped")
        spark.sql("AUTHENTICATE USER gina PASSWORD 'gp'")
        assert(spark.sql("SELECT count(*) AS n FROM nation").head().getLong(0) == 25L)
        // both ALTER SOURCE forms are admin-gated under enforcement: a
        // non-admin must not drop the engine cache or drive server-side
        // connection attempts
        intercept[SecurityException](
          spark.sql("ALTER SOURCE permsrc CLEAR PERMISSION CACHE"))
        intercept[SecurityException](
          spark.sql("ALTER SOURCE permsrc REFRESH STATUS"))
        // REST GET /source hides connection config (urls may carry
        // credentials) from non-admin principals under enforcement
        val http = java.net.http.HttpClient.newHttpClient()
        val port = graft.server.GraftRestServer.port
          .getOrElse(graft.server.GraftRestServer.start(spark))
        def getAs(user: String, pw: String): String = {
          val cred = java.util.Base64.getEncoder
            .encodeToString(s"$user:$pw".getBytes("UTF-8"))
          val req = java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(s"http://localhost:$port/source/permsrc"))
            .header("Authorization", s"Basic $cred").GET().build()
          http.send(req, java.net.http.HttpResponse.BodyHandlers.ofString()).body()
        }
        assert(!getAs("gina", "gp").contains("\"config\""),
          "non-admin GET /source must not see connection config")
        assert(getAs("root_u", "rp").contains("\"config\""),
          "admin GET /source must see connection config")
      } finally {
        Privileges.clear()
        spark.conf.unset(Privileges.TokenConf)
        spark.conf.unset(Privileges.UserConf)
      }
    }
  }

  test("permission-cache generation stamp: a completed revoke is never served stale under racing readers") {
    Privileges.clear()
    try {
      spark.sql("CREATE USER root_u PASSWORD 'rp' ADMIN")
      spark.sql("CREATE USER rex PASSWORD 'xp'")
      val user = Privileges.listUsers.find(_.name == "rex").get
      // reader threads hammer the memoized closure path, maximizing the
      // window where a pre-revoke closure could be inserted post-clear —
      // the generation-stamped key makes such inserts unreachable
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      (1 to 4).foreach(_ => pool.submit(new Runnable {
        override def run(): Unit =
          while (!stop.get()) Privileges.allowed(user, "select", "nation")
      }))
      try {
        for (i <- 1 to 300) {
          Privileges.grant(spark, "select", "nation", "user", "rex")
          assert(Privileges.allowed(user, "select", "nation"), s"grant lost at $i")
          Privileges.revoke(spark, "select", "nation", "user", "rex")
          assert(!Privileges.allowed(user, "select", "nation"),
            s"STALE ALLOW after completed revoke at iteration $i")
        }
      } finally { stop.set(true); pool.shutdownNow() }
    } finally Privileges.clear()
  }
}
