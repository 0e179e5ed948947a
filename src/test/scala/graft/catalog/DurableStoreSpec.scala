package graft.catalog

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.auth.Privileges

/** Durable control plane (GraftStore — the reference's KV store,
  * `services/datastore`): a coordinator restart must keep every GRANT
  * enforced, every saved script runnable, every named source queryable,
  * every pipe triggerable against its EXISTING checkpoint, and every
  * reflection goal substituting. The "restart" here is the real thing as
  * far as the registries are concerned: in-memory state is dropped
  * wholesale (`resetMemoryForTest`), then [[GraftStore.loadAll]] rebuilds
  * it from disk exactly as `GraftSession.local` / `GraftRestServer.start`
  * do at process start. Session tokens deliberately do NOT survive —
  * clients re-authenticate after a restart. */
class DurableStoreSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    graft.catalog.InfoSchema.register(s)
    s
  }

  private def asPrincipal(user: String, pw: String): Unit =
    spark.sql(s"AUTHENTICATE USER $user PASSWORD '$pw'")

  private def clearAll(): Unit = {
    Privileges.clear(); Scripts.clear(); Sources.clear(spark)
    graft.streaming.Pipes.clear(); graft.accel.Reflections.clear()
    spark.conf.unset(Privileges.TokenConf)
    spark.conf.unset(Privileges.UserConf)
  }

  private def simulateRestart(): Unit = {
    Privileges.resetMemoryForTest()
    Scripts.resetMemoryForTest()
    Sources.resetMemoryForTest()
    graft.streaming.Pipes.resetMemoryForTest()
    graft.accel.Reflections.resetMemoryForTest()
    GraftStore.loadAll(spark)
  }

  test("restart: grants enforce, scripts run, sources resolve, pipes keep their checkpoints, reflections substitute") {
    // the DEFAULT store dir (<warehouse>/graft_store) is what a real
    // deployment gets, and the warehouse is a STATIC conf shared by every
    // session over the context — so persist (mutator session), delete
    // (whatever session is active at clear()) and loadAll all resolve the
    // same directory. DirConf is a launch-time override, not a
    // per-session one; the spec exercises the default path.
    clearAll()
    try {
      graft.accel.Reflections.install(spark)
      val root = Files.createTempDirectory("graft_store_world").toString

      // -- world: a lake table, a second (ungranted) table --------------
      spark.sql(s"CREATE LAKE '$root/granted' AS " +
        "SELECT id, id % 7 AS k, id * 2 AS v FROM range(1000)")
      spark.sql(s"CREATE LAKE '$root/private' AS SELECT id FROM range(5)")

      // auth: admin + a user with ONE dataset grant, then enforce
      spark.sql("CREATE USER adm PASSWORD 'ap' ADMIN")
      spark.sql("CREATE USER bob PASSWORD 'bp'")
      spark.sql(s"GRANT SELECT ON '$root/granted' TO USER bob")
      spark.sql("ALTER AUTH ENFORCE ON")
      asPrincipal("adm", "ap")

      // saved script (owner adm)
      spark.sql("CREATE SCRIPT sum_by_k AS " +
        s"'SELECT k, sum(v) AS sv FROM lake_scan(''$root/granted'') GROUP BY k'")

      // named jdbc source with a real table behind it
      val url = "jdbc:derby:memory:durspec;create=true"
      import spark.implicits._
      Seq((1L, "x")).toDF("id", "name").write.format("jdbc")
        .option("url", url).option("dbtable", "DUR_T")
        .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
        .option("createTableColumnTypes", "name VARCHAR(16)")
        .mode("overwrite").save()
      spark.sql(s"""CREATE SOURCE dur_src TYPE jdbc (
        |  'url' = '$url',
        |  'driver' = 'org.apache.derby.jdbc.EmbeddedDriver')""".stripMargin)

      // pipe over a listing dir; first TRIGGER loads f1 into the checkpoint
      val data = s"$root/pipe_in"; Files.createDirectories(Paths.get(data))
      Files.write(Paths.get(s"$data/f1.json"), """{"a":1}""".getBytes)
      spark.sql(s"CREATE PIPE dur_pipe FROM '$data' FORMAT json " +
        s"SCHEMA 'a BIGINT' INTO LAKE '$root/pipe_out' CHECKPOINT '$root/pipe_chk'")
      assert(spark.sql("TRIGGER PIPE dur_pipe").collect().head.getString(1) == "1")

      // reflection goal through DDL (defining SQL persists)
      spark.sql(s"CREATE REFLECTION dur_refl USING PATH '$root/mv/dur_refl' AS " +
        s"SELECT k, sum(v) AS sv FROM lake_scan('$root/granted') GROUP BY k")
      val served = spark.sql(
        s"SELECT k, sum(v) AS sv FROM lake_scan('$root/granted') GROUP BY k")
      assert(served.queryExecution.sparkPlan.toString.contains("dur_refl"),
        "reflection must serve before the restart")
      val want = served.orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

      // -- RESTART -------------------------------------------------------
      simulateRestart()

      // tokens are gone: the old session token no longer authenticates
      assert(Privileges.principalOf(spark).isEmpty,
        "session tokens must not survive a restart")
      // enforcement itself survived: anonymous reads refuse
      intercept[Exception](
        spark.sql(s"SELECT count(*) FROM lake_scan('$root/granted')").collect())

      // the pre-restart GRANT still enforces after re-auth: bob reads his
      // granted dataset, nothing else
      asPrincipal("bob", "bp")
      assert(spark.sql(s"SELECT count(*) AS n FROM lake_scan('$root/granted')")
        .head().getLong(0) == 1000L)
      intercept[SecurityException](
        spark.sql(s"SELECT count(*) FROM lake_scan('$root/private')").collect())

      asPrincipal("adm", "ap")
      // script still runs (ownership survived with it)
      assert(spark.sql("RUN SCRIPT sum_by_k").count() == 7)
      assert(Scripts.read(spark, "sum_by_k").owner == "adm")
      // source still resolves from the registry
      assert(spark.sql(
        """SELECT id FROM external_query('dur_src', 'SELECT "id" FROM APP.DUR_T')""")
        .head().getLong(0) == 1L)
      // pipe triggers against its EXISTING checkpoint: only the new file
      // lands, f1 is not double-loaded
      Files.write(Paths.get(s"$data/f2.json"), """{"a":2}""".getBytes)
      assert(spark.sql("TRIGGER PIPE dur_pipe").collect().head.getString(1) == "1")
      assert(graft.sources.SnapshotTable.forPath(spark, s"$root/pipe_out")
        .read().count() == 2)
      // reflection goal reattached: same plan substitution, same rows
      val again = spark.sql(
        s"SELECT k, sum(v) AS sv FROM lake_scan('$root/granted') GROUP BY k")
      assert(again.queryExecution.sparkPlan.toString.contains("dur_refl"),
        "reflection must keep serving after the restart")
      assert(again.orderBy("k").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq == want)

      // a restart must also preserve STALENESS: append, reflection stops
      // serving until refreshed (base-version pins came from the store)
      spark.sql(s"INSERT INTO LAKE '$root/granted' " +
        "SELECT id, id % 7 AS k, id * 2 AS v FROM range(1000, 1010)")
      simulateRestart()
      asPrincipal("adm", "ap")
      val r = graft.accel.Reflections.list.find(_.name == "dur_refl").get
      assert(!graft.accel.Reflections.isFresh(spark, r),
        "stored base-version pins must keep a stale reflection stale")
    } finally {
      clearAll()
    }
  }

  test("clear() deletes the durable section: a deliberate reset does not resurrect") {
    clearAll()
    try {
      spark.sql("CREATE USER ghost PASSWORD 'gp' ADMIN")
      Privileges.clear()
      simulateRestart()
      assert(Privileges.listUsers.isEmpty,
        "cleared users must not come back from the store")
    } finally {
      clearAll()
    }
  }

  test("two coordinators on one store dir: the stale writer refuses, never last-writer-wins") {
    clearAll()
    try {
      val dirPath = GraftStore.storeDir(spark)
      // writer A (this process) commits generation 0
      val a0 = GraftStore.newObject; a0.put("writer", "A"); a0.put("v", 1)
      GraftStore.save(spark, "castest", a0)
      val fs = dirPath.getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      assert(fs.exists(new org.apache.hadoop.fs.Path(dirPath, "castest.0.json")))
      // simulate writer B (another process): it loaded gen 0 and committed
      // gen 1 directly — A's in-memory view is now STALE
      val b = GraftStore.newObject; b.put("writer", "B"); b.put("v", 2)
      val bPath = new org.apache.hadoop.fs.Path(dirPath, "castest.1.json")
      val os = fs.create(bPath, false)
      try os.write(b.toString.getBytes("UTF-8")) finally os.close()
      // A's next save must detect the foreign generation and refuse —
      // blind-writing would silently drop B's mutation
      val c = GraftStore.newObject; c.put("writer", "A"); c.put("v", 3)
      intercept[java.util.ConcurrentModificationException] {
        GraftStore.save(spark, "castest", c)
      }
      // B's write survives; A reloads and can then mutate on top of it
      assert(GraftStore.load(spark, "castest").get.path("writer").asText() == "B")
      GraftStore.save(spark, "castest", c)
      val back = GraftStore.load(spark, "castest").get
      assert(back.path("v").asInt() == 3)
      // superseded generations retire; the live file is owner-only (the
      // store carries password hashes and source credentials)
      assert(!fs.exists(new org.apache.hadoop.fs.Path(dirPath, "castest.0.json")))
      val live = fs.getFileStatus(new org.apache.hadoop.fs.Path(dirPath, "castest.2.json"))
      assert(live.getPermission.toShort == 0x180.toShort,
        s"section file should be 0600, got ${live.getPermission}")
    } finally {
      GraftStore.delete(spark, "castest")
      clearAll()
    }
  }

  test("saveResync: a foreign generation bump reloads the registry and asks for a retry") {
    clearAll()
    try {
      val dirPath = GraftStore.storeDir(spark)
      val a = GraftStore.newObject; a.put("v", 1)
      GraftStore.save(spark, "rsync", a)
      // foreign coordinator commits gen 1 directly
      val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val b = GraftStore.newObject; b.put("v", 99)
      val os = fs.create(new org.apache.hadoop.fs.Path(dirPath, "rsync.1.json"), false)
      try os.write(b.toString.getBytes("UTF-8")) finally os.close()
      var reloads = 0
      val c = GraftStore.newObject; c.put("v", 2)
      val reload = (s: org.apache.spark.sql.SparkSession) => {
        reloads += 1
        GraftStore.load(s, "rsync") // what real registries' loadFrom does
        ()
      }
      val e = intercept[IllegalStateException] {
        GraftStore.saveResync(spark, "rsync", c)(reload)
      }
      assert(e.getMessage.contains("retry the statement"), e.getMessage)
      assert(reloads == 1)
      // the reload resynced the generation: the retried save now lands
      GraftStore.saveResync(spark, "rsync", c)(reload)
      assert(reloads == 1, "a clean save must not trigger another reload")
      assert(GraftStore.load(spark, "rsync").get.path("v").asInt() == 2)
    } finally {
      GraftStore.delete(spark, "rsync")
      clearAll()
    }
  }

  test("legacy bare section file reads as generation 0 and migrates on the next save") {
    clearAll()
    try {
      val dirPath = GraftStore.storeDir(spark)
      val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(dirPath)
      val legacy = new org.apache.hadoop.fs.Path(dirPath, "lgcy.json")
      val o = GraftStore.newObject; o.put("from", "legacy")
      val os = fs.create(legacy, true)
      try os.write(o.toString.getBytes("UTF-8")) finally os.close()
      assert(GraftStore.load(spark, "lgcy").get.path("from").asText() == "legacy")
      val n = GraftStore.newObject; n.put("from", "new")
      GraftStore.save(spark, "lgcy", n)
      assert(!fs.exists(legacy), "legacy bare file should retire after migration")
      assert(fs.exists(new org.apache.hadoop.fs.Path(dirPath, "lgcy.1.json")))
      assert(GraftStore.load(spark, "lgcy").get.path("from").asText() == "new")
    } finally {
      GraftStore.delete(spark, "lgcy")
      clearAll()
    }
  }

  test("pointer-claim mode: arbitration runs on the coordination dir, store dir carries only payload") {
    // object-store deployments (no atomic create-new) set ClaimDirConf:
    // claims must land in the LOCAL coordination dir (the lake
    // PointerCommitArbiter pattern) while section payload stays in the
    // store dir; the conflict contract is unchanged
    clearAll()
    val coord = Files.createTempDirectory("graft_store_coord").toString
    try {
      spark.conf.set(GraftStore.ClaimDirConf, coord)
      val o = GraftStore.newObject; o.put("k", "v1")
      GraftStore.saveOrThrow(spark, "ptr", o)
      val dirPath = GraftStore.storeDir(spark)
      val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val storeNames = fs.listStatus(dirPath).toSeq.map(_.getPath.getName)
      assert(storeNames.contains("ptr.0.json"))
      assert(!storeNames.exists(n => n.startsWith("ptr.") && n.endsWith(".claim")),
        s"claims must NOT touch the store dir in pointer mode: $storeNames")
      def coordEntries(): Seq[String] = {
        val st = java.nio.file.Files.list(java.nio.file.Paths.get(coord))
        try {
          val b = Seq.newBuilder[String]
          st.iterator().forEachRemaining(p => b += p.getFileName.toString)
          b.result()
        } finally st.close()
      }
      val claims = coordEntries()
      assert(claims.exists(_.endsWith(".ptr.0.claim")),
        s"claim must land in the coordination dir: $claims")
      // a second generation supersedes; delete() clears coord claims too
      val o2 = GraftStore.newObject; o2.put("k", "v2")
      GraftStore.saveOrThrow(spark, "ptr", o2)
      assert(GraftStore.load(spark, "ptr").get.path("k").asText() == "v2")
      GraftStore.delete(spark, "ptr")
      val left = coordEntries()
      assert(!left.exists(_.contains(".ptr.")),
        s"delete must release coordination-dir claims: $left")
    } finally {
      spark.conf.unset(GraftStore.ClaimDirConf)
      GraftStore.delete(spark, "ptr")
      clearAll()
    }
  }

  test("two-PROCESS arbitration tier: one winner per generation across a real process boundary") {
    // The two-writer conflict test above runs in ONE JVM; this tier spawns
    // a real second JVM (scripts/run-main.sh -> graft.tools.StoreRacer) so
    // the claim-file CAS is exercised under a true process boundary — the
    // reference KV store's serialization guarantee. Invariant: every
    // successful save takes exactly one fresh generation, so
    // winsA + winsB == final generation + 1; a lost claim never mutates
    // the store. Opt-in with -Dgraft.scale=1 (boots a second SparkContext).
    assume(sys.props.get("graft.scale").contains("1"),
      "opt-in: run with -Dgraft.scale=1")
    clearAll()
    val root = Files.createTempDirectory("graft_store_race").toString
    val storeDir = s"$root/store"
    val section = "race"
    val st = GraftStore
    try {
      spark.conf.set(GraftStore.DirConf, storeDir)
      val pb = new ProcessBuilder("scripts/run-main.sh",
        "graft.tools.StoreRacer", storeDir, section, "200", "B")
      pb.directory(new java.io.File("."))
      // Spark's boot logging lands on stderr; an undrained pipe fills its
      // buffer and blocks the child — spool it to a file instead
      pb.redirectError(new java.io.File(s"$root/racer.stderr"))
      val child = pb.start()
      val out = new java.io.BufferedReader(
        new java.io.InputStreamReader(child.getInputStream))
      // race while the child lives: save, reload on conflict
      var winsA = 0
      var conflictsA = 0
      var i = 0
      while (child.isAlive) {
        val payload = st.newObject
        payload.put("writer", "A"); payload.put("round", i)
        try { st.saveOrThrow(spark, section, payload); winsA += 1 }
        catch {
          case _: java.util.ConcurrentModificationException =>
            conflictsA += 1
            st.load(spark, section)
        }
        i += 1
        Thread.sleep(5)
      }
      assert(child.waitFor(60, java.util.concurrent.TimeUnit.SECONDS))
      assert(child.exitValue() == 0, "racer JVM must exit cleanly")
      val line = Iterator.continually(out.readLine()).takeWhile(_ != null)
        .find(_.startsWith("RACER B")).getOrElse(fail("no RACER report"))
      val Report = """RACER B wins=(\d+) conflicts=(\d+)""".r
      val (winsB, conflictsB) = line.trim match {
        case Report(w, c) => (w.toInt, c.toInt)
        case other => fail(s"unparseable racer report: $other")
      }
      // final generation from the on-disk section files
      val dirPath = new org.apache.hadoop.fs.Path(storeDir)
      val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val gens = fs.listStatus(dirPath).toSeq.map(_.getPath.getName).collect {
        case n if n.startsWith(section + ".") && n.endsWith(".json") =>
          n.stripPrefix(section + ".").stripSuffix(".json").toLong
      }
      assert(gens.nonEmpty, "store must hold a committed section file")
      val finalGen = gens.max
      info(s"A: wins=$winsA conflicts=$conflictsA; B: wins=$winsB " +
        s"conflicts=$conflictsB; finalGen=$finalGen")
      assert(winsA >= 1 && winsB >= 1, "both processes must win some generations")
      assert(conflictsA + conflictsB >= 1, "the race must produce real contention")
      assert(winsA + winsB == finalGen + 1,
        s"every generation must have exactly ONE winner: " +
          s"$winsA + $winsB wins vs ${finalGen + 1} generations")
      // the surviving state is one writer's intact payload
      val last = GraftStore.load(spark, section).getOrElse(fail("unloadable store"))
      assert(Set("A", "B").contains(last.path("writer").asText()))
    } finally {
      spark.conf.unset(GraftStore.DirConf)
      clearAll()
    }
  }

  test("an unparseable foreign pipe entry survives this process' pipe mutations") {
    clearAll()
    try {
      val root = Files.createTempDirectory("graft_store_foreign").toString
      // a foreign (newer) coordinator wrote a pipe whose schema DDL this
      // version cannot parse — reload must retain it, and OUR next pipe
      // mutation must re-emit it verbatim instead of durably deleting it
      val rootNode = GraftStore.newObject
      val arr = rootNode.putArray("pipes")
      val o = arr.addObject()
      o.put("name", "future_pipe"); o.put("sourceDir", s"$root/in")
      o.put("format", "json"); o.put("schema", "payload QUANTUM_TYPE")
      o.put("targetDir", s"$root/out"); o.put("checkpointDir", s"$root/ck")
      o.put("sink", "parquet"); o.put("paused", false)
      o.put("futureOption", "kept-verbatim")
      GraftStore.save(spark, "pipes", rootNode)
      graft.streaming.Pipes.loadFrom(spark)
      assert(graft.streaming.Pipes.get("future_pipe").isEmpty,
        "the unparseable entry must not register as a live pipe")
      graft.streaming.Pipes.define(graft.streaming.Pipe("ours", s"$root/in",
        "json", org.apache.spark.sql.types.StructType.fromDDL("id BIGINT"),
        s"$root/out2", s"$root/ck2"))
      def names(): Seq[(String, com.fasterxml.jackson.databind.JsonNode)] = {
        val ps = GraftStore.load(spark, "pipes").get.path("pipes")
        (0 until ps.size()).map(i => ps.get(i).path("name").asText() -> ps.get(i))
      }
      val after = names()
      assert(after.map(_._1).sorted == Seq("future_pipe", "ours"), after.map(_._1).toString)
      val blob = after.toMap.apply("future_pipe")
      assert(blob.path("schema").asText() == "payload QUANTUM_TYPE" &&
        blob.path("futureOption").asText() == "kept-verbatim",
        s"foreign entry must round-trip verbatim: $blob")
      // an explicit DROP of the foreign name honors the delete
      graft.streaming.Pipes.drop("future_pipe")
      assert(names().map(_._1) == Seq("ours"))
    } finally clearAll()
  }
}
