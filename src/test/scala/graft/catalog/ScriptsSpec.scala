package graft.catalog

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.auth.Privileges

/** Saved SQL scripts (reference `services/script/ScriptServiceImpl` +
  * `SqlGrantOnScript`, grant.ftl:191): lifecycle, reference limits,
  * owner/admin/grant access matrix, RUN SCRIPT as plan pass-through
  * executing UNDER THE CALLER's privileges, cycle cap, sys_scripts. */
class ScriptsSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    graft.engine.Tables.ensure(s, TestSpark.sf)
    graft.catalog.InfoSchema.register(s)
    s
  }

  private def asPrincipal(user: String, pw: String): Unit =
    spark.sql(s"AUTHENTICATE USER $user PASSWORD '$pw'")

  private def withWorld(body: => Unit): Unit = {
    Privileges.clear(); Scripts.clear()
    spark.conf.unset(Privileges.TokenConf)
    try body
    finally {
      Privileges.clear(); Scripts.clear()
      spark.conf.unset(Privileges.TokenConf)
      spark.conf.unset(Privileges.UserConf)
    }
  }

  test("lifecycle, RUN pass-through, limits, sys_scripts") {
    withWorld {
      spark.sql("CREATE SCRIPT top_nations AS " +
        "'SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey LIMIT 3'")
      // RUN SCRIPT returns the inner statement's own result shape
      val rows = spark.sql("RUN SCRIPT top_nations").collect()
      assert(rows.length == 3 && rows.head.getAs[Number](0).longValue() == 0L)
      // quote escaping: '' in the stored text round-trips as '
      spark.sql("CREATE SCRIPT quoted AS 'SELECT ''x'' AS s'")
      assert(spark.sql("RUN SCRIPT quoted").head().getString(0) == "x")
      assert(spark.sql("DESCRIBE SCRIPT quoted").head().getString(2) ==
        "SELECT 'x' AS s")
      // ALTER replaces content; DROP removes; unknown refuses
      spark.sql("ALTER SCRIPT quoted AS 'SELECT 1 AS one'")
      assert(spark.sql("RUN SCRIPT quoted").head().getInt(0) == 1)
      spark.sql("DROP SCRIPT quoted")
      intercept[Exception](spark.sql("RUN SCRIPT quoted"))
      // duplicate name refuses; reference limits enforced
      intercept[Exception](spark.sql("CREATE SCRIPT top_nations AS 'SELECT 2'"))
      intercept[Exception](spark.sql(
        s"CREATE SCRIPT ${"x" * 200} AS 'SELECT 1'"))
      // a script chain runs; a CYCLE is cut at the depth cap
      spark.sql("CREATE SCRIPT outer_s AS 'RUN SCRIPT top_nations'")
      assert(spark.sql("RUN SCRIPT outer_s").count() == 3)
      spark.sql("CREATE SCRIPT loop_s AS 'RUN SCRIPT loop_s'")
      val e = intercept[Exception](spark.sql("RUN SCRIPT loop_s"))
      assert(e.getMessage.contains("nesting"), e.getMessage)
      // metadata (no content) rides sys_scripts
      val sys = spark.sql("SELECT name FROM sys_scripts ORDER BY name")
        .collect().map(_.getString(0)).toSeq
      assert(sys == Seq("loop_s", "outer_s", "top_nations"))
    }
  }

  test("access matrix: owner/admin/VIEW-MODIFY-DELETE grants; run is caller-privileged") {
    withWorld {
      spark.sql("CREATE USER root_u PASSWORD 'rp' ADMIN")
      spark.sql("CREATE USER ana PASSWORD 'ap'")
      spark.sql("CREATE USER ben PASSWORD 'bp'")
      spark.sql("GRANT SELECT ON nation TO USER ana")
      spark.sql("ALTER AUTH ENFORCE ON")
      asPrincipal("ana", "ap")
      spark.sql("CREATE SCRIPT ana_q AS 'SELECT count(*) AS n FROM nation'")
      assert(spark.sql("RUN SCRIPT ana_q").head().getLong(0) == 25L)
      // ben: the script is not merely refused — it's INVISIBLE (the
      // per-owner namespace never discloses existence to strangers)
      asPrincipal("ben", "bp")
      assert(spark.sql("SHOW SCRIPTS").count() == 0)
      val eInv = intercept[Exception](spark.sql("DESCRIBE SCRIPT ana_q"))
      assert(eInv.getMessage.contains("unknown script"), eInv.getMessage)
      intercept[Exception](spark.sql("RUN SCRIPT ana_q"))
      intercept[Exception](spark.sql("ALTER SCRIPT ana_q AS 'SELECT 1'"))
      intercept[Exception](spark.sql("GRANT VIEW ON SCRIPT ana_q TO USER ben"))
      // ben may even own a SAME-NAMED script without colliding with
      // ana's (per-user namespace); resolution prefers his own
      spark.sql("CREATE SCRIPT ana_q AS 'SELECT 7 AS mine'")
      assert(spark.sql("RUN SCRIPT ana_q").head().getInt(0) == 7)
      spark.sql("DROP SCRIPT ana_q")
      asPrincipal("ana", "ap")
      spark.sql("GRANT VIEW ON SCRIPT ana_q TO USER ben")
      asPrincipal("ben", "bp")
      assert(spark.sql("SHOW SCRIPTS").count() == 1)
      assert(spark.sql("DESCRIBE SCRIPT ana_q").head().getString(1) == "ana")
      // SHOW GRANTS ON SCRIPT lists owner + grantees for anyone who may
      // see the script
      val g = spark.sql("SHOW GRANTS ON SCRIPT ana_q").collect()
        .map(r => (r.getString(1), r.getString(2))).toSet
      assert(g == Set(("ana", "ownership"), ("ben", "view")), g.toString)
      // RUN executes under the CALLER: ben holds VIEW on the script but
      // no SELECT on nation — stored SQL is not stored authority
      val e = intercept[Exception](spark.sql("RUN SCRIPT ana_q").collect())
      assert(e.getMessage.contains("lacks SELECT"), e.getMessage)
      // MODIFY unlocks ALTER but not DROP; invalid privilege refuses
      intercept[SecurityException](spark.sql("DROP SCRIPT ana_q"))
      asPrincipal("root_u", "rp")
      spark.sql("GRANT MODIFY ON SCRIPT ana_q TO USER ben") // admin may share
      intercept[Exception](spark.sql("GRANT SELECT ON SCRIPT ana_q TO USER ben"))
      asPrincipal("ben", "bp")
      spark.sql("ALTER SCRIPT ana_q AS 'SELECT 42 AS n'")
      intercept[SecurityException](spark.sql("DROP SCRIPT ana_q"))
      // owner always drops — and the script's grants die with it: a
      // recreated namesake starts with a clean slate
      asPrincipal("ana", "ap")
      spark.sql("DROP SCRIPT ana_q")
      spark.sql("CREATE SCRIPT ana_q AS 'SELECT 1 AS n'")
      asPrincipal("ben", "bp")
      assert(spark.sql("SHOW SCRIPTS").count() == 0,
        "stale grants resurrected onto the recreated script")
      intercept[Exception](spark.sql("DESCRIBE SCRIPT ana_q"))
      // sys_scripts is visibility-scoped like SHOW SCRIPTS
      assert(spark.sql("SELECT * FROM sys_scripts").count() == 0)
      // CREATE requires a principal while enforcement is on
      spark.conf.unset(Privileges.TokenConf)
      val eAnon = intercept[SecurityException](
        spark.sql("CREATE SCRIPT anon_s AS 'SELECT 1'"))
      assert(eAnon.getMessage.contains("authenticated"), eAnon.getMessage)
    }
  }

  test("SHOW SCRIPTS|SOURCES LIMIT n: bounded-heap selection over a >cap registry") {
    withWorld {
      // two owners so the registry exceeds the 1000-per-user cap overall
      (0 until 600).foreach(i => Scripts.create(spark, f"pag_a_$i%04d", "SELECT 1"))
      spark.sql("CREATE USER pag PASSWORD 'pp'")
      asPrincipal("pag", "pp")
      (0 until 600).foreach(i => Scripts.create(spark, f"pag_b_$i%04d", "SELECT 1"))
      assert(Scripts.visible(spark).size == 1200)
      // LIMIT selects the first k of the (name, owner) order WITHOUT a
      // full-registry driver sort (bounded heap, O(n log k))
      val limited = spark.sql("SHOW SCRIPTS LIMIT 7").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
      assert(limited == Scripts.visible(spark).take(7).map(s => (s.name, s.owner)))
      assert(spark.sql("SHOW SCRIPTS LIMIT 0").count() == 0)
      // sources ride the same shape
      val d = java.nio.file.Files.createTempDirectory("pag_src").toString
      Seq("src_c", "src_a", "src_b").foreach(n =>
        spark.sql(s"CREATE SOURCE $n TYPE files ('path' = '$d')"))
      val srcs = spark.sql("SHOW SOURCES LIMIT 2").collect().map(_.getString(0)).toSeq
      assert(srcs == Seq("src_a", "src_b"), srcs.toString)
      Sources.clear(spark)
    }
  }

  test("pre-enforcement <anonymous> scripts become admin-managed once enforcement turns on") {
    withWorld {
      // single-user mode: no principal, enforcement off — creation is
      // allowed under the synthetic <anonymous> owner (documented contract)
      spark.sql("CREATE SCRIPT legacy_s AS 'SELECT 11 AS n'")
      assert(spark.sql("RUN SCRIPT legacy_s").head().getInt(0) == 11)
      spark.sql("CREATE USER adm PASSWORD 'ap' ADMIN")
      spark.sql("CREATE USER norm PASSWORD 'np'")
      spark.sql("ALTER AUTH ENFORCE ON")
      // no principal can ever authenticate as <anonymous>: a regular user
      // neither sees nor manages the pre-enforcement script...
      asPrincipal("norm", "np")
      assert(spark.sql("SHOW SCRIPTS").count() == 0)
      intercept[Exception](spark.sql("RUN SCRIPT legacy_s"))
      intercept[Exception](spark.sql("ALTER SCRIPT legacy_s AS 'SELECT 0'"))
      // ...an ADMIN still can (view, run, re-share to a real user, drop)
      asPrincipal("adm", "ap")
      assert(spark.sql("RUN SCRIPT legacy_s").head().getInt(0) == 11)
      spark.sql("GRANT VIEW ON SCRIPT legacy_s TO USER norm")
      asPrincipal("norm", "np")
      assert(spark.sql("RUN SCRIPT legacy_s").head().getInt(0) == 11)
      asPrincipal("adm", "ap")
      spark.sql("DROP SCRIPT legacy_s")
      assert(spark.sql("SHOW SCRIPTS").count() == 0)
    }
  }
}
