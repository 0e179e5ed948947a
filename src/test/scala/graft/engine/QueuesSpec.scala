package graft.engine

import java.util.concurrent.atomic.AtomicInteger
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class QueuesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private implicit val ec: ExecutionContext = ExecutionContext.global

  test("a 1-slot queue serializes concurrent queries") {
    Queues.define("serial", slots = 1, timeoutMs = 30000)
    val inFlight = new AtomicInteger(0)
    val peak = new AtomicInteger(0)
    val fs = (1 to 4).map { _ =>
      Future {
        Queues.run(spark, "serial") {
          val now = inFlight.incrementAndGet()
          peak.getAndUpdate(p => math.max(p, now))
          Thread.sleep(50)
          inFlight.decrementAndGet()
          spark.range(100).count()
        }
      }
    }
    val counts = Await.result(Future.sequence(fs), 60.seconds)
    assert(counts.forall(_ == 100L))
    assert(peak.get() == 1, s"1-slot queue admitted ${peak.get()} at once")
    Queues.drop("serial")
  }

  test("a 2-slot queue admits two at once but not three") {
    Queues.define("duo", slots = 2, timeoutMs = 30000)
    val inFlight = new AtomicInteger(0)
    val peak = new AtomicInteger(0)
    val fs = (1 to 6).map { _ =>
      Future {
        Queues.run(spark, "duo") {
          val now = inFlight.incrementAndGet()
          peak.getAndUpdate(p => math.max(p, now))
          Thread.sleep(60)
          inFlight.decrementAndGet()
        }
      }
    }
    Await.result(Future.sequence(fs), 60.seconds)
    assert(peak.get() <= 2, s"2-slot queue admitted ${peak.get()} at once")
    Queues.drop("duo")
  }

  test("admission times out when the queue is full") {
    Queues.define("tiny", slots = 1, timeoutMs = 100)
    val blocker = Future {
      Queues.run(spark, "tiny") { Thread.sleep(1500); "held" }
    }
    Thread.sleep(200) // let the blocker take the slot
    val ex = intercept[Queues.AdmissionTimeout] {
      Queues.run(spark, "tiny") { "never" }
    }
    assert(ex.getMessage.contains("tiny"))
    assert(Await.result(blocker, 30.seconds) == "held")
    val st = Queues.status.find(_.name == "tiny").get
    assert(st.timedOut == 1L && st.admitted == 1L)
    Queues.drop("tiny")
  }

  test("admitted queries run in the queue's scheduler pool, restored after") {
    Queues.define("etl", slots = 2, timeoutMs = 5000, pool = "etl_pool")
    val sc = spark.sparkContext
    sc.setLocalProperty("spark.scheduler.pool", null)
    val seen = Queues.run(spark, "etl") {
      sc.getLocalProperty("spark.scheduler.pool")
    }
    assert(seen == "etl_pool")
    assert(sc.getLocalProperty("spark.scheduler.pool") == null)
    Queues.drop("etl")
  }

  test("lazy SELECT holds its slot until the first action completes (admitLazy)") {
    Queues.define("lazyq", slots = 1, timeoutMs = 30000)
    try {
      spark.conf.set(graft.Graft.QueueConf, "lazyq")
      val df = graft.Graft.sql(spark, "SELECT count(*) AS n FROM range(1000)")
      // no action yet: submission is admitted but the slot is NOT released
      val st0 = Queues.status.find(_.name == "lazyq").get
      assert(st0.running == 1L,
        s"slot released before the lazy statement executed (running=${st0.running})")
      // the statement's lifetime carries the queue's scheduler pool
      assert(spark.sparkContext.getLocalProperty("spark.scheduler.pool") == "lazyq")
      assert(df.head().getLong(0) == 1000L)
      // release rides the (async) QueryExecutionListener bus
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (Queues.status.find(_.name == "lazyq").get.running != 0L
          && System.nanoTime() < deadline) Thread.sleep(50)
      assert(Queues.status.find(_.name == "lazyq").get.running == 0L,
        "slot not released after the statement's first action")
      // DDL through the same path executes inside admission and frees at once
      graft.Graft.sql(spark, "CREATE QUEUE lazyq_inner SLOTS 2")
      assert(Queues.status.find(_.name == "lazyq").get.running == 0L,
        "eager command held its slot past execution")
      Queues.drop("lazyq_inner")
    } finally {
      spark.conf.unset(graft.Graft.QueueConf)
      spark.sparkContext.setLocalProperty("spark.scheduler.pool", null)
      Queues.drop("lazyq")
    }
  }

  test("an abandoned lazy statement's slot is reaped after GC (no permanent leak)") {
    Queues.define("leakq", slots = 1, timeoutMs = 250)
    try {
      spark.conf.set(graft.Graft.QueueConf, "leakq")
      var df = graft.Graft.sql(spark, "SELECT id FROM range(500)")
      assert(Queues.status.find(_.name == "leakq").get.running == 1L)
      df = null // drop the only strong reference to the frame — never executed
      // next admissions reap cleared WeakReferences; GC timing is the JVM's,
      // so retry with explicit gc() until the slot frees
      var freed = false
      var attempts = 0
      while (!freed && attempts < 40) {
        attempts += 1
        System.gc()
        try {
          graft.Graft.sql(spark, "SELECT 1").collect()
          freed = true
        } catch { case _: Queues.AdmissionTimeout => }
      }
      assert(freed, "abandoned lazy statement leaked its slot permanently")
    } finally {
      spark.conf.unset(graft.Graft.QueueConf)
      spark.sparkContext.setLocalProperty("spark.scheduler.pool", null)
      Queues.drop("leakq")
    }
  }

  test("sys_queues view and SQL DDL surface the queue state live") {
    spark.sql("CREATE QUEUE adhoc SLOTS 3 TIMEOUT 1000")
    graft.catalog.InfoSchema.register(spark)
    Queues.run(spark, "adhoc") { spark.range(10).count() }
    val row = spark.sql(
      "SELECT slots, admitted, running FROM sys_queues WHERE name = 'adhoc'").head()
    assert(row.getInt(0) == 3)
    assert(row.getLong(1) == 1L)
    assert(row.getLong(2) == 0L)
    val shown = spark.sql("SHOW QUEUES").collect().map(_.getString(0))
    assert(shown.contains("adhoc"))
    spark.sql("DROP QUEUE adhoc")
    assert(Queues.status.forall(_.name != "adhoc"))
  }

  test("spark.graft.queue routes every Graft.sql statement through admission") {
    Queues.define("routed", slots = 1, timeoutMs = 30000)
    try {
      val before = Queues.status.find(_.name == "routed").get.admitted
      spark.conf.set(graft.Graft.QueueConf, "routed")
      // no explicit Queues.run anywhere — the conf routes the statements
      assert(graft.Graft.sql(spark, "SELECT 1 AS x").head().getInt(0) == 1)
      graft.Graft.sql(spark, "SELECT count(*) FROM range(10)").collect()
      val after = Queues.status.find(_.name == "routed").get.admitted
      assert(after - before == 2,
        s"expected 2 admissions via conf routing, got ${after - before}")
      // a throttled queue still serializes conf-routed statements
      val inFlight = new AtomicInteger(0); val peak = new AtomicInteger(0)
      val fs = (1 to 3).map { _ =>
        Future {
          Queues.run(spark, "routed") {
            val now = inFlight.incrementAndGet()
            peak.getAndUpdate(p => math.max(p, now))
            Thread.sleep(30)
            inFlight.decrementAndGet()
          }
        }
      }
      Await.result(Future.sequence(fs), 60.seconds)
      assert(peak.get() == 1)
      // unset conf → statements stop being admission-counted
      spark.conf.unset(graft.Graft.QueueConf)
      graft.Graft.sql(spark, "SELECT 2").collect()
      val fin = Queues.status.find(_.name == "routed").get.admitted
      assert(fin == after + 3, "unrouted statement was still admitted")
    } finally {
      spark.conf.unset(graft.Graft.QueueConf)
      Queues.drop("routed")
    }
  }

  test("cost-based auto routing picks SMALL vs LARGE by planned bytes") {
    // reference BasicResourceAllocator.java:143-157 — cost > threshold → LARGE
    // Test-unique router targets (via the small/large confs) + delta
    // assertions: exact counts on queues literally named small/large would
    // flake if any concurrent suite issued Graft.sql in this window
    // (ADVICE r7).
    val qSmall = "qspec_auto_small"; val qLarge = "qspec_auto_large"
    Queues.define(qSmall, slots = 4, timeoutMs = 30000)
    Queues.define(qLarge, slots = 4, timeoutMs = 30000)
    def admitted(n: String) = Queues.status.find(_.name == n).get.admitted
    try {
      spark.conf.set(graft.Graft.QueueSmallConf, qSmall)
      spark.conf.set(graft.Graft.QueueLargeConf, qLarge)
      spark.conf.set(graft.Graft.QueueAutoConf, "true")
      // huge threshold: everything is small
      spark.conf.set(graft.Graft.QueueThresholdConf, Long.MaxValue.toString)
      val (s0, l0) = (admitted(qSmall), admitted(qLarge))
      assert(graft.Graft.sql(spark, "SELECT count(*) AS n FROM range(100)")
        .head().getLong(0) == 100L)
      assert(admitted(qSmall) - s0 == 1L)
      assert(admitted(qLarge) - l0 == 0L)
      // zero threshold: any nonzero-size plan is large
      spark.conf.set(graft.Graft.QueueThresholdConf, "0")
      graft.Graft.sql(spark, "SELECT count(*) AS n FROM range(100)").collect()
      assert(admitted(qLarge) - l0 == 1L)
      assert(admitted(qSmall) - s0 == 1L)
      // an explicitly named queue beats the router
      Queues.define("explicitq", slots = 1, timeoutMs = 30000)
      spark.conf.set(graft.Graft.QueueConf, "explicitq")
      graft.Graft.sql(spark, "SELECT 1").collect()
      assert(admitted("explicitq") == 1L)
      assert(admitted(qLarge) - l0 == 1L)
      spark.conf.unset(graft.Graft.QueueConf)
      Queues.drop("explicitq")
    } finally {
      spark.conf.unset(graft.Graft.QueueConf)
      spark.conf.unset(graft.Graft.QueueAutoConf)
      spark.conf.unset(graft.Graft.QueueThresholdConf)
      spark.conf.unset(graft.Graft.QueueSmallConf)
      spark.conf.unset(graft.Graft.QueueLargeConf)
      spark.sparkContext.setLocalProperty("spark.scheduler.pool", null)
      Queues.drop(qSmall); Queues.drop(qLarge)
    }
  }

  test("a malformed queue threshold degrades to the default instead of failing every statement") {
    try {
      spark.conf.set(graft.Graft.QueueAutoConf, "true")
      spark.conf.set(graft.Graft.QueueThresholdConf, "not-a-number")
      // ADVICE r7: this used to throw NumberFormatException out of Graft.sql
      assert(graft.Graft.sql(spark, "SELECT 5 AS x").head().getInt(0) == 5)
    } finally {
      spark.conf.unset(graft.Graft.QueueAutoConf)
      spark.conf.unset(graft.Graft.QueueThresholdConf)
      spark.sparkContext.setLocalProperty("spark.scheduler.pool", null)
    }
  }

  test("reflection statements route to their own queue; a missing routed queue leaves the statement unmanaged") {
    Queues.define("refl", slots = 2, timeoutMs = 30000)
    try {
      spark.conf.set(graft.Graft.QueueAutoConf, "true")
      spark.conf.set(graft.Graft.QueueReflectionConf, "refl")
      // reference ReflectionRoutingManager: reflection maintenance gets its
      // own queue rather than competing with user queries
      graft.Graft.sql(spark, "SHOW REFLECTIONS").collect()
      assert(Queues.status.find(_.name == "refl").get.admitted == 1L)
      // cost routing targets "large" here (threshold 0) but no such queue
      // exists: the statement runs unmanaged, like the reference with
      // queueing disabled — no error, no admission anywhere
      spark.conf.set(graft.Graft.QueueThresholdConf, "0")
      assert(graft.Graft.sql(spark, "SELECT 41 + 1 AS v").head().getInt(0) == 42)
      assert(Queues.status.find(_.name == "refl").get.admitted == 1L)
    } finally {
      spark.conf.unset(graft.Graft.QueueAutoConf)
      spark.conf.unset(graft.Graft.QueueReflectionConf)
      spark.conf.unset(graft.Graft.QueueThresholdConf)
      spark.sparkContext.setLocalProperty("spark.scheduler.pool", null)
      Queues.drop("refl")
    }
  }

  test("ROUTE ALL REFLECTIONS TO QUEUE: per-dataset override beats the global reflection queue") {
    Queues.define("refl_g", slots = 2, timeoutMs = 30000)
    Queues.define("refl_ds", slots = 2, timeoutMs = 30000)
    val dir = java.nio.file.Files.createTempDirectory("graft_rroute").toString + "/t"
    try {
      spark.sql(s"CREATE LAKE '$dir' AS SELECT id FROM range(10)")
      spark.sql(s"CREATE LAKE VIEW rroute_v FROM '$dir'")
      spark.sql("CREATE REFLECTION rroute_r USING PATH " +
        s"'${java.nio.file.Files.createTempDirectory("graft_rroute_m")}' AS " +
        "SELECT id FROM rroute_v")
      spark.conf.set(graft.Graft.QueueAutoConf, "true")
      spark.conf.set(graft.Graft.QueueReflectionConf, "refl_g")
      def admitted(q: String): Long = Queues.status.find(_.name == q).get.admitted
      // no per-dataset route yet: the global reflection queue admits
      graft.Graft.sql(spark, "REFRESH REFLECTION rroute_r").collect()
      assert(admitted("refl_g") == 1L && admitted("refl_ds") == 0L)
      // the dataset's own route now wins (reference
      // SqlAlterDatasetReflectionRouting / ReflectionRoutingManager)...
      spark.sql(s"ALTER LAKE '$dir' ROUTE ALL REFLECTIONS TO QUEUE refl_ds")
      graft.Graft.sql(spark, "REFRESH REFLECTION rroute_r").collect()
      assert(admitted("refl_ds") == 1L && admitted("refl_g") == 1L)
      // the BULK per-dataset refresh honors the same route
      graft.Graft.sql(spark, s"ALTER LAKE '$dir' REFRESH REFLECTIONS").collect()
      assert(admitted("refl_ds") == 2L && admitted("refl_g") == 1L)
      // ...and DEFAULT clears it back to the global queue
      spark.sql(s"ALTER LAKE '$dir' ROUTE ALL REFLECTIONS TO DEFAULT QUEUE")
      graft.Graft.sql(spark, "REFRESH REFLECTION rroute_r").collect()
      assert(admitted("refl_g") == 2L && admitted("refl_ds") == 2L)
      // routing to an undefined queue refuses at DDL time
      assertThrows[Exception](spark.sql(
        s"ALTER LAKE '$dir' ROUTE ALL REFLECTIONS TO QUEUE nope_q"))
    } finally {
      spark.conf.unset(graft.Graft.QueueAutoConf)
      spark.conf.unset(graft.Graft.QueueReflectionConf)
      spark.sparkContext.setLocalProperty("spark.scheduler.pool", null)
      spark.sql("DROP REFLECTION rroute_r")
      graft.accel.Reflections.setRouting(dir, None)
      Queues.drop("refl_g"); Queues.drop("refl_ds")
    }
  }

  test("ALTER FOLDER ROUTE REFLECTIONS: prefix route applies to children; the dataset's own route wins") {
    Queues.define("refl_f", slots = 2, timeoutMs = 30000)
    Queues.define("refl_own", slots = 2, timeoutMs = 30000)
    val folder = java.nio.file.Files.createTempDirectory("graft_froute").toString
    val dir = folder + "/sub/t"
    try {
      spark.sql(s"CREATE LAKE '$dir' AS SELECT id FROM range(10)")
      spark.sql(s"CREATE LAKE VIEW froute_v FROM '$dir'")
      spark.sql("CREATE REFLECTION froute_r USING PATH " +
        s"'${java.nio.file.Files.createTempDirectory("graft_froute_m")}' AS " +
        "SELECT id FROM froute_v")
      spark.conf.set(graft.Graft.QueueAutoConf, "true")
      def admitted(q: String): Long = Queues.status.find(_.name == q).get.admitted
      // a route on an ANCESTOR folder catches the nested dataset's refresh
      spark.sql(s"ALTER FOLDER '$folder' ROUTE ALL REFLECTIONS TO QUEUE refl_f")
      graft.Graft.sql(spark, "REFRESH REFLECTION froute_r").collect()
      assert(admitted("refl_f") == 1L)
      // the dataset's own route is more specific and wins over the folder's
      spark.sql(s"ALTER LAKE '$dir' ROUTE ALL REFLECTIONS TO QUEUE refl_own")
      graft.Graft.sql(spark, "REFRESH REFLECTION froute_r").collect()
      assert(admitted("refl_own") == 1L && admitted("refl_f") == 1L)
      // dropping the dataset route falls back to the folder route
      spark.sql(s"ALTER LAKE '$dir' ROUTE ALL REFLECTIONS TO DEFAULT QUEUE")
      graft.Graft.sql(spark, "REFRESH REFLECTION froute_r").collect()
      assert(admitted("refl_f") == 2L && admitted("refl_own") == 1L)
    } finally {
      spark.conf.unset(graft.Graft.QueueAutoConf)
      spark.sparkContext.setLocalProperty("spark.scheduler.pool", null)
      spark.sql("DROP REFLECTION froute_r")
      graft.accel.Reflections.setRouting(folder, None)
      graft.accel.Reflections.setRouting(dir, None)
      Queues.drop("refl_f"); Queues.drop("refl_own")
    }
  }

  test("routing rules: first match by priority routes; non-matching statements stay unmanaged") {
    try {
      graft.Graft.sql(spark, "CREATE QUEUE rr_heavy SLOTS 4")
      graft.Graft.sql(spark, "CREATE QUEUE rr_light SLOTS 4")
      // higher-priority (lower number) rule must win when both match
      graft.Graft.sql(spark,
        "CREATE ROUTING RULE rr_a PRIORITY 10 WHEN statement LIKE '%rr_probe%' ROUTE TO rr_heavy")
      graft.Graft.sql(spark,
        "CREATE ROUTING RULE rr_b PRIORITY 20 WHEN statement LIKE '%rr_probe%' ROUTE TO rr_light")
      def admitted(q: String): Long =
        Queues.status.find(_.name == q).map(_.admitted).getOrElse(-1L)
      val h0 = admitted("rr_heavy"); val l0 = admitted("rr_light")
      graft.Graft.sql(spark, "SELECT 1 AS rr_probe").collect()
      assert(admitted("rr_heavy") == h0 + 1, "matching statement routes to the priority-10 queue")
      assert(admitted("rr_light") == l0, "the lower-priority rule never fires")
      graft.Graft.sql(spark, "SELECT 2 AS unrouted").collect()
      assert(admitted("rr_heavy") == h0 + 1 && admitted("rr_light") == l0,
        "non-matching statements bypass the rules")
      // sys view + SHOW surface the rules in priority order
      val shown = graft.Graft.sql(spark, "SHOW ROUTING RULES").collect()
        .map(r => (r.getString(0), r.getString(3))).toSeq
      assert(shown == Seq(("rr_a", "rr_heavy"), ("rr_b", "rr_light")))
      assert(spark.sql("SELECT queue FROM sys_routing_rules WHERE name = 'rr_a'")
        .head().getString(0) == "rr_heavy")
    } finally { Queues.clearRules(); Queues.drop("rr_heavy"); Queues.drop("rr_light") }
  }

  test("routing rules: malformed conditions refuse at DEFINE; ROUTE TO an undefined queue refuses") {
    try {
      graft.Graft.sql(spark, "CREATE QUEUE rr_q SLOTS 4")
      val e = intercept[Exception](graft.Graft.sql(spark,
        "CREATE ROUTING RULE rr_bad PRIORITY 1 WHEN 1=1 ROUTE TO rr_missing"))
      assert(e.getMessage.contains("undefined queue"))
      // a condition that can't analyze against the context schema fails
      // LOUDLY at definition (r10 VERDICT #5 — previously it silently
      // never matched, per statement, forever)
      val bad = intercept[Exception](graft.Graft.sql(spark,
        "CREATE ROUTING RULE rr_broken PRIORITY 1 WHEN no_such_col = 1 ROUTE TO rr_q"))
      assert(bad.getMessage.contains("no_such_col") ||
        bad.getMessage.contains("UNRESOLVED"), bad.getMessage.take(200))
      assert(graft.Graft.sql(spark, "SHOW ROUTING RULES").collect().isEmpty,
        "a refused rule must not be registered")
      // a condition that ANALYZES but cannot EVALUATE as a bound raw
      // predicate (scalar subquery) must also refuse at DEFINE — route()'s
      // NonFatal skip would otherwise silence it per statement forever
      val sub = intercept[Exception](graft.Graft.sql(spark,
        "CREATE ROUTING RULE rr_sub PRIORITY 1 " +
          "WHEN est_cost > (SELECT 5) ROUTE TO rr_q"))
      assert(sub.getMessage != null &&
        (sub.getMessage.contains("cannot be evaluated") ||
          sub.getMessage.contains("subquer")), sub.getMessage.take(300))
      assert(graft.Graft.sql(spark, "SHOW ROUTING RULES").collect().isEmpty,
        "a non-evaluable rule must not be registered")
      graft.Graft.sql(spark,
        "CREATE ROUTING RULE rr_ok PRIORITY 2 WHEN query_type = 'query' ROUTE TO rr_q")
      val a0 = Queues.status.find(_.name == "rr_q").get.admitted
      graft.Graft.sql(spark, "SELECT 42 AS rr_ctx_probe").collect()
      assert(Queues.status.find(_.name == "rr_q").get.admitted == a0 + 1,
        "the healthy query_type rule routes")
      // a rule whose TARGET QUEUE vanished after definition is skipped at
      // routing time (the surviving runtime-skip case)
      graft.Graft.sql(spark, "CREATE QUEUE rr_gone SLOTS 1")
      graft.Graft.sql(spark,
        "CREATE ROUTING RULE rr_stale PRIORITY 1 WHEN query_type = 'query' ROUTE TO rr_gone")
      Queues.drop("rr_gone")
      val a1 = Queues.status.find(_.name == "rr_q").get.admitted
      graft.Graft.sql(spark, "SELECT 43 AS rr_ctx_probe2").collect()
      assert(Queues.status.find(_.name == "rr_q").get.admitted == a1 + 1,
        "a rule whose queue was dropped is skipped; the next rule routes")
      graft.Graft.sql(spark, "DROP ROUTING RULE rr_stale")
      graft.Graft.sql(spark, "DROP ROUTING RULE rr_ok")
      assert(graft.Graft.sql(spark, "SHOW ROUTING RULES").collect().isEmpty)
    } finally { Queues.clearRules(); Queues.drop("rr_q") }
  }

  test("routing rules: user_name and roles context routes per principal") {
    try {
      graft.auth.Privileges.clear()
      spark.conf.unset(graft.auth.Privileges.TokenConf)
      spark.conf.unset(graft.auth.Privileges.UserConf)
      graft.Graft.sql(spark, "CREATE QUEUE rr_vip SLOTS 4")
      graft.Graft.sql(spark, "CREATE USER rr_alice PASSWORD 'ap'")
      graft.Graft.sql(spark, "CREATE ROLE rr_gold")
      graft.Graft.sql(spark, "GRANT ROLE rr_gold TO USER rr_alice")
      graft.Graft.sql(spark,
        "CREATE ROUTING RULE rr_u PRIORITY 1 WHEN array_contains(roles, 'rr_gold') ROUTE TO rr_vip")
      def admitted: Long = Queues.status.find(_.name == "rr_vip").get.admitted
      val a0 = admitted
      graft.Graft.sql(spark, "SELECT 1 AS anon_probe").collect()
      assert(admitted == a0, "anonymous session has no roles — rule must not fire")
      graft.Graft.sql(spark, "AUTHENTICATE USER rr_alice PASSWORD 'ap'")
      graft.Graft.sql(spark, "SELECT 1 AS alice_probe").collect()
      assert(admitted == a0 + 1, "role-bearing principal routes to the vip queue")
    } finally {
      Queues.clearRules(); Queues.drop("rr_vip")
      graft.auth.Privileges.clear()
      spark.conf.unset(graft.auth.Privileges.TokenConf)
      spark.conf.unset(graft.auth.Privileges.UserConf)
    }
  }

  test("ALTER ENGINE resizes admission; SHOW ENGINES reports; malformed refuses") {
    try {
      // engine with an existing queue: slots resize to MAX_REPLICAS
      Queues.define("eng1", slots = 2)
      val r = spark.sql(
        "ALTER ENGINE eng1 SET (MIN_REPLICAS = 1, MAX_REPLICAS = 6)").collect().head
      assert(r.getString(1) == "1" && r.getString(2) == "6" && r.getString(3) == "6")
      assert(Queues.definition("eng1").get.slots == 6)
      // reversed key order (the reference grammar allows both)
      spark.sql("ALTER ENGINE eng1 SET (MAX_REPLICAS = 4, MIN_REPLICAS = 2)")
      assert(Queues.definition("eng1").get.slots == 4)
      // single-bound form keeps the other bound
      spark.sql("ALTER ENGINE eng1 SET (MAX_REPLICAS = 8)")
      val shown = spark.sql("SHOW ENGINES").collect()
        .map(x => (x.getString(0), x.getString(1), x.getString(2))).toSeq
      assert(shown.contains(("eng1", "2", "8")), shown.mkString)
      // an engine with no prior queue gets one sized to the max
      spark.sql("ALTER ENGINE eng_new SET (MAX_REPLICAS = 3)")
      assert(Queues.definition("eng_new").get.slots == 3)
      // invalid bounds and junk bodies refuse loudly
      assertThrows[Exception](spark.sql(
        "ALTER ENGINE eng1 SET (MIN_REPLICAS = 9, MAX_REPLICAS = 2)"))
      assertThrows[Exception](spark.sql(
        "ALTER ENGINE eng1 SET (REPLICAS = 2)"))
    } finally { Queues.drop("eng1"); Queues.drop("eng_new") }
  }
}
