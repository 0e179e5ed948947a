package graft.auth

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.engine.Tables

/** Users/roles/privileges semantics pinned against the reference's grant
  * model (Parser.tdd:656-660, grant.ftl/role.ftl; dac enforcement):
  * authenticated principals, analysis-time SELECT checks, grants via users
  * and roles, views as the security layer, admin bypass, and the admin
  * gate on auth DDL while enforcement is on. */
class PrivilegesSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    Tables.ensure(s, TestSpark.sf)
    graft.catalog.InfoSchema.register(s)
    s
  }

  private def asPrincipal(user: String, pw: String): Unit =
    spark.sql(s"AUTHENTICATE USER $user PASSWORD '$pw'")

  private def anonymous(): Unit = {
    spark.conf.unset(Privileges.TokenConf)
    spark.conf.unset(Privileges.UserConf)
  }

  private def withAuthWorld(body: => Unit): Unit = {
    Privileges.clear(); anonymous()
    try body
    finally { Privileges.clear(); anonymous() }
  }

  test("user/role DDL, grants, SHOW GRANTS and sys views") {
    withAuthWorld {
      spark.sql("CREATE USER root_u PASSWORD 'rp' ADMIN")
      spark.sql("CREATE USER alice PASSWORD 'ap'")
      spark.sql("CREATE ROLE analyst")
      spark.sql("GRANT ROLE analyst TO USER alice")
      spark.sql("GRANT SELECT ON nation TO USER alice")
      spark.sql("GRANT SELECT ON region TO ROLE analyst")
      val grants = spark.sql("SHOW GRANTS FOR alice").collect()
        .map(r => (r.getString(0), r.getString(2), r.getString(3))).toSet
      assert(grants == Set(("user", "select", "nation")))
      val sysP = spark.sql(
        "SELECT object FROM sys_privileges WHERE grantee = 'analyst'").collect()
      assert(sysP.map(_.getString(0)).toSeq == Seq("region"))
      val u = spark.sql(
        "SELECT is_admin, roles FROM sys_users WHERE name = 'alice'").head()
      assert(!u.getBoolean(0) && u.getString(1) == "analyst")
      assert(spark.sql("SELECT * FROM sys_roles").collect()
        .map(_.getString(0)).toSet == Set("admin", "analyst"))
      // wrong password refuses
      intercept[SecurityException](spark.sql("AUTHENTICATE USER alice PASSWORD 'no'"))
    }
  }

  test("enforcement: anonymous and ungranted reads refuse; grants, roles, and admin allow") {
    withAuthWorld {
      spark.sql("CREATE USER root_u PASSWORD 'rp' ADMIN")
      spark.sql("CREATE USER alice PASSWORD 'ap'")
      spark.sql("CREATE USER bob PASSWORD 'bp'")
      spark.sql("CREATE ROLE analyst")
      spark.sql("GRANT ROLE analyst TO USER bob")
      spark.sql("GRANT SELECT ON nation TO USER alice")
      spark.sql("GRANT SELECT ON nation TO ROLE analyst")
      spark.sql("ALTER AUTH ENFORCE ON")
      // anonymous session: guarded read refused, relation-free SQL fine
      val e1 = intercept[Exception](spark.sql("SELECT * FROM nation"))
      assert(e1.toString.contains("lacks SELECT"), e1.toString)
      assert(spark.sql("SELECT 1 AS x").head().getInt(0) == 1)
      // authenticated but ungranted object
      asPrincipal("alice", "ap")
      assert(spark.sql("SELECT count(*) AS n FROM nation").head().getLong(0) == 25L)
      val e2 = intercept[Exception](spark.sql("SELECT * FROM region"))
      assert(e2.toString.contains("lacks SELECT"), e2.toString)
      // via role membership
      asPrincipal("bob", "bp")
      assert(spark.sql("SELECT count(*) AS n FROM nation").head().getLong(0) == 25L)
      // revoke closes the door again
      asPrincipal("root_u", "rp")
      spark.sql("REVOKE SELECT ON nation FROM ROLE analyst")
      asPrincipal("bob", "bp")
      intercept[Exception](spark.sql("SELECT count(*) FROM nation"))
      // admin reads anything
      asPrincipal("root_u", "rp")
      assert(spark.sql("SELECT count(*) AS n FROM region").head().getLong(0) == 5L)
      spark.sql("ALTER AUTH ENFORCE OFF")
    }
  }

  test("a granted view covers its subtree — base tables need no grant") {
    withAuthWorld {
      spark.sql("CREATE USER root_u PASSWORD 'rp' ADMIN")
      spark.sql("CREATE USER carol PASSWORD 'cp'")
      spark.sql("""CREATE OR REPLACE TEMP VIEW auth_secure_v AS
                   SELECT n_regionkey, count(*) AS n FROM nation GROUP BY n_regionkey""")
      spark.sql("GRANT SELECT ON auth_secure_v TO USER carol")
      spark.sql("ALTER AUTH ENFORCE ON")
      asPrincipal("carol", "cp")
      // the curated view serves...
      assert(spark.sql("SELECT sum(n) AS s FROM auth_secure_v").head().getLong(0) == 25L)
      // ...but the base table stays refused
      intercept[Exception](spark.sql("SELECT * FROM nation"))
      asPrincipal("root_u", "rp")
      spark.sql("ALTER AUTH ENFORCE OFF")
    }
  }

  test("auth DDL is admin-gated while enforcing; enforcement needs an admin to exist") {
    withAuthWorld {
      // no admin user yet: enforcement refuses to lock everyone out
      intercept[Exception](spark.sql("ALTER AUTH ENFORCE ON"))
      spark.sql("CREATE USER root_u PASSWORD 'rp' ADMIN")
      spark.sql("CREATE USER mallory PASSWORD 'mp'")
      spark.sql("ALTER AUTH ENFORCE ON")
      // a non-admin principal cannot mint users, grants, or disable auth
      asPrincipal("mallory", "mp")
      intercept[SecurityException](spark.sql("CREATE USER eve PASSWORD 'e'"))
      intercept[SecurityException](
        spark.sql("GRANT SELECT ON nation TO USER mallory"))
      intercept[SecurityException](spark.sql("ALTER AUTH ENFORCE OFF"))
      asPrincipal("root_u", "rp")
      spark.sql("ALTER AUTH ENFORCE OFF")
    }
  }

  test("grants on quoted paths guard path-addressed reads") {
    withAuthWorld {
      val p = Tables(spark, TestSpark.sf).path("region")
      spark.sql("CREATE USER root_u PASSWORD 'rp' ADMIN")
      spark.sql("CREATE USER dave PASSWORD 'dp'")
      spark.sql(s"GRANT SELECT ON '$p' TO USER dave")
      spark.sql("ALTER AUTH ENFORCE ON")
      asPrincipal("dave", "dp")
      assert(spark.sql(s"SELECT count(*) AS n FROM parquet.`$p`").head().getLong(0) == 5L)
      val other = Tables(spark, TestSpark.sf).path("nation")
      intercept[Exception](spark.sql(s"SELECT * FROM parquet.`$other`"))
      asPrincipal("root_u", "rp")
      spark.sql("ALTER AUTH ENFORCE OFF")
    }
  }

  test("GRANT OWNERSHIP: owners read, delegate grants, and transfer; non-owners refused") {
    withAuthWorld {
      spark.sql("CREATE USER root_u PASSWORD 'rp' ADMIN")
      spark.sql("CREATE USER owner_o PASSWORD 'op'")
      spark.sql("CREATE USER reader_r PASSWORD 'xp'")
      spark.sql("GRANT OWNERSHIP ON nation TO USER owner_o")
      spark.sql("ALTER AUTH ENFORCE ON")
      // the owner reads WITHOUT any select grant
      asPrincipal("owner_o", "op")
      assert(spark.sql("SELECT count(*) FROM nation").head.getLong(0) > 0)
      // the owner may GRANT on the owned object (delegated administration)
      spark.sql("GRANT SELECT ON nation TO USER reader_r")
      asPrincipal("reader_r", "xp")
      assert(spark.sql("SELECT count(*) FROM nation").head.getLong(0) > 0)
      // a non-owner non-admin may NOT grant on it, nor take ownership
      intercept[Exception](spark.sql("GRANT SELECT ON nation TO USER reader_r"))
      intercept[Exception](spark.sql("GRANT OWNERSHIP ON nation TO USER reader_r"))
      // the owner transfers ownership; the old owner loses its powers
      asPrincipal("owner_o", "op")
      spark.sql("GRANT OWNERSHIP ON nation TO USER reader_r")
      intercept[Exception](spark.sql("GRANT SELECT ON nation TO USER owner_o"))
      // SHOW GRANTS ON lists the owner first, then grantees
      asPrincipal("root_u", "rp")
      val rows = spark.sql("SHOW GRANTS ON nation").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      assert(rows.head == ("reader_r", "ownership"), rows.toString)
      assert(rows.contains(("reader_r", "select")))
      spark.sql("ALTER AUTH ENFORCE OFF")
    }
  }

  test("REVOKE vs ALL: REVOKE ALL strips everything; REVOKE SELECT against ALL refuses") {
    withAuthWorld {
      spark.sql("CREATE USER root_u PASSWORD 'rp' ADMIN")
      spark.sql("CREATE USER carol PASSWORD 'cp'")
      spark.sql("GRANT ALL ON nation TO USER carol")
      spark.sql("ALTER AUTH ENFORCE ON")
      asPrincipal("carol", "cp")
      assert(spark.sql("SELECT count(*) FROM nation").head.getLong(0) > 0)
      // a SELECT-only revoke against a standing ALL grant is refused loudly
      asPrincipal("root_u", "rp")
      val e = intercept[Exception](
        spark.sql("REVOKE SELECT ON nation FROM USER carol"))
      assert(e.getMessage.contains("REVOKE ALL"), e.getMessage)
      // carol still reads (nothing silently half-revoked)...
      asPrincipal("carol", "cp")
      assert(spark.sql("SELECT count(*) FROM nation").head.getLong(0) > 0)
      // ...until REVOKE ALL strips every action on the object
      asPrincipal("root_u", "rp")
      spark.sql("REVOKE ALL ON nation FROM USER carol")
      asPrincipal("carol", "cp")
      val denied = intercept[Exception](spark.sql("SELECT count(*) FROM nation").collect())
      assert(denied.toString.contains("lacks SELECT"), denied.toString)
      asPrincipal("root_u", "rp")
      spark.sql("ALTER AUTH ENFORCE OFF")
    }
  }

  test("ALTER USER SET PASSWORD: self or admin; old tokens revoked") {
    withAuthWorld {
      spark.sql("CREATE USER root_u PASSWORD 'rp' ADMIN")
      spark.sql("CREATE USER bob PASSWORD 'old'")
      spark.sql("ALTER AUTH ENFORCE ON") // admin gate active (off = bootstrap)
      // self-service change
      asPrincipal("bob", "old")
      spark.sql("ALTER USER bob SET PASSWORD 'new'")
      // the change revoked bob's token — the session is anonymous again
      assert(Privileges.principalOf(spark).isEmpty)
      intercept[SecurityException](asPrincipal("bob", "old"))
      asPrincipal("bob", "new") // new credential works
      // a non-admin cannot change ANOTHER user's password
      intercept[Exception](spark.sql("ALTER USER root_u SET PASSWORD 'x'"))
      // an admin can
      asPrincipal("root_u", "rp")
      spark.sql("ALTER USER bob SET PASSWORD 'admin_set'")
      asPrincipal("bob", "admin_set")
    }
  }

  test("write-side enforcement: lake mutations need the matching privilege, per action") {
    withAuthWorld {
      val dir = java.nio.file.Files.createTempDirectory("auth_dml").toString + "/t"
      spark.sql(s"CREATE LAKE '$dir' AS SELECT id, id * 2 AS v FROM range(30)")
      spark.sql("CREATE USER root_u PASSWORD 'rp' ADMIN")
      spark.sql("CREATE USER dana PASSWORD 'dp'")
      spark.sql(s"GRANT SELECT ON '$dir' TO USER dana")
      spark.sql("ALTER AUTH ENFORCE ON")
      asPrincipal("dana", "dp")
      // SELECT grant covers reads but NOT mutations — each verb has its own
      val ins = intercept[Exception](
        spark.sql(s"INSERT INTO LAKE '$dir' SELECT id, id FROM range(5)"))
      assert(ins.toString.contains("lacks INSERT"), ins.toString)
      val del = intercept[Exception](
        spark.sql(s"DELETE FROM LAKE '$dir' WHERE id > 20"))
      assert(del.toString.contains("lacks DELETE"), del.toString)
      val upd = intercept[Exception](
        spark.sql(s"UPDATE LAKE '$dir' SET v = 0 WHERE id = 1"))
      assert(upd.toString.contains("lacks UPDATE"), upd.toString)
      val opt = intercept[Exception](spark.sql(s"OPTIMIZE LAKE '$dir'"))
      assert(opt.toString.contains("lacks ALTER"), opt.toString)
      // refused mutations left the table untouched
      assert(spark.sql(s"SELECT count(*) AS n FROM lake_scan('$dir')")
        .head().getLong(0) == 30L)
      // grant the verbs: each unlocks exactly its statement
      asPrincipal("root_u", "rp")
      spark.sql(s"GRANT INSERT ON '$dir' TO USER dana")
      spark.sql(s"GRANT DELETE ON '$dir' TO USER dana")
      asPrincipal("dana", "dp")
      spark.sql(s"INSERT INTO LAKE '$dir' SELECT id + 100 AS id, id AS v FROM range(5)")
      spark.sql(s"DELETE FROM LAKE '$dir' WHERE id >= 25 AND id < 30")
      assert(spark.sql(s"SELECT count(*) AS n FROM lake_scan('$dir')")
        .head().getLong(0) == 30L) // +5 inserted, -5 deleted
      // still no UPDATE/ALTER
      intercept[Exception](spark.sql(s"UPDATE LAKE '$dir' SET v = 0 WHERE id = 1"))
      // the owner needs no grants: ownership covers every action
      asPrincipal("root_u", "rp")
      spark.sql(s"GRANT OWNERSHIP ON '$dir' TO USER dana")
      asPrincipal("dana", "dp")
      spark.sql(s"UPDATE LAKE '$dir' SET v = 99 WHERE id = 1")
      assert(spark.sql(s"SELECT v FROM lake_scan('$dir') WHERE id = 1")
        .head().getLong(0) == 99L)
      asPrincipal("root_u", "rp") // only an admin may flip enforcement
      spark.sql("ALTER AUTH ENFORCE OFF")
    }
  }
}
