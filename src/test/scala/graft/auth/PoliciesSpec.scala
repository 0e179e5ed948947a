package graft.auth

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.engine.Tables

/** Row-access + column-masking policies (reference alter.ftl:92,162 —
  * SqlAlterTableAddRowAccessPolicy / SqlAlterTableSetColumnMasking): the
  * dataset re-registers as base → row-filter → mask-projection, policy
  * UDFs discriminate principals via query_user(), and the DDL is
  * admin-gated while enforcement is on. */
class PoliciesSpec extends AnyFunSuite {
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

  private def withPolicyWorld(body: => Unit): Unit = {
    Privileges.clear(); Policies.clear(); anonymous()
    try body
    finally { Privileges.clear(); Policies.clear(); anonymous() }
  }

  test("row access policy filters per principal; masking hides a column; drop restores") {
    withPolicyWorld {
      // a 4-row dataset with an owner column; the policy lets a principal
      // see only their own rows (admins see via is-null fallback)
      import spark.implicits._
      Seq((1L, "alice", 10.0), (2L, "alice", 20.0),
        (3L, "bob", 30.0), (4L, "bob", 40.0))
        .toDF("id", "owner", "amount").createOrReplaceTempView("accounts")
      spark.sql("CREATE OR REPLACE TEMPORARY FUNCTION own_rows(o STRING) " +
        "RETURNS BOOLEAN RETURN graft_principal() IS NULL OR o = graft_principal()")
      spark.sql("CREATE OR REPLACE TEMPORARY FUNCTION mask_amount(a DOUBLE) " +
        "RETURNS DOUBLE RETURN CASE WHEN graft_principal() IS NULL THEN a ELSE -1.0 END")

      spark.sql("CREATE USER root_u PASSWORD 'rp' ADMIN")
      spark.sql("CREATE USER alice PASSWORD 'ap'")
      spark.sql("CREATE USER bob PASSWORD 'bp'")

      spark.sql("ALTER TABLE accounts ADD ROW ACCESS POLICY own_rows(owner)")
      spark.sql("ALTER TABLE accounts MODIFY COLUMN amount " +
        "SET MASKING POLICY mask_amount(amount)")

      // anonymous: policy UDFs fall through (query_user() has no principal
      // here — NULL branch) and all rows show unmasked
      anonymous()
      assert(spark.sql("SELECT count(*) FROM accounts").head.getLong(0) == 4L)

      // alice sees only her 2 rows, amounts masked
      asPrincipal("alice", "ap")
      val aliceRows = spark.sql(
        "SELECT id, owner, amount FROM accounts ORDER BY id").collect()
      assert(aliceRows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
      assert(aliceRows.forall(_.getDouble(2) == -1.0), "mask must hide amounts")

      // bob sees only his
      asPrincipal("bob", "bp")
      assert(spark.sql("SELECT id FROM accounts ORDER BY id").collect()
        .map(_.getLong(0)).toSeq == Seq(3L, 4L))

      // SHOW POLICIES and the live sys_policies view list both attachments
      val shown = spark.sql("SHOW POLICIES").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(shown == Set(("accounts", "row_access"), ("accounts", "masking:amount")))
      val sysP = spark.sql("SELECT dataset, kind FROM sys_policies").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(sysP == shown, s"sys_policies diverged from SHOW POLICIES: $sysP")

      // policy DDL is admin-gated while enforcement is on
      spark.sql("ALTER AUTH ENFORCE ON")
      asPrincipal("bob", "bp")
      intercept[Exception](spark.sql(
        "ALTER TABLE accounts DROP ROW ACCESS POLICY own_rows"))
      // the admin may detach; full table returns (amount still masked)
      asPrincipal("root_u", "rp")
      spark.sql("GRANT SELECT ON accounts TO USER bob")
      spark.sql("ALTER TABLE accounts DROP ROW ACCESS POLICY own_rows")
      spark.sql("ALTER TABLE accounts MODIFY COLUMN amount " +
        "UNSET MASKING POLICY mask_amount")
      spark.sql("ALTER AUTH ENFORCE OFF")
      anonymous()
      val restored = spark.sql("SELECT sum(amount) FROM accounts").head.getDouble(0)
      assert(restored == 100.0, s"restored view must be unfiltered/unmasked: $restored")
      assert(spark.sql("SHOW POLICIES").count() == 0L)
    }
  }

  test("result cache keys principal-dependent plans per principal (no cross-user leak)") {
    withPolicyWorld {
      import spark.implicits._
      graft.accel.ResultCache.clearAll()
      Seq((1L, "alice"), (2L, "alice"), (3L, "bob"))
        .toDF("id", "owner").createOrReplaceTempView("rc_accounts")
      spark.sql("CREATE OR REPLACE TEMPORARY FUNCTION rc_own(o STRING) " +
        "RETURNS BOOLEAN RETURN graft_principal() IS NULL OR o = graft_principal()")
      spark.sql("CREATE USER alice PASSWORD 'ap'")
      spark.sql("CREATE USER bob PASSWORD 'bp'")
      spark.sql("ALTER TABLE rc_accounts ADD ROW ACCESS POLICY rc_own(owner)")

      asPrincipal("alice", "ap")
      val a = spark.sql("SELECT n FROM cached('SELECT count(*) AS n FROM rc_accounts')")
        .head.getLong(0)
      asPrincipal("bob", "bp")
      val b = spark.sql("SELECT n FROM cached('SELECT count(*) AS n FROM rc_accounts')")
        .head.getLong(0)
      assert(a == 2L && b == 1L,
        s"cached policy-view result leaked across principals: alice=$a bob=$b")
      graft.accel.ResultCache.clearAll()
    }
  }

  test("policy DDL refuses unknown datasets, columns, and functions") {
    withPolicyWorld {
      import spark.implicits._
      Seq((1L, "x")).toDF("id", "v").createOrReplaceTempView("pol_t")
      intercept[Exception](spark.sql(
        "ALTER TABLE no_such_view ADD ROW ACCESS POLICY f(id)"))
      intercept[Exception](spark.sql(
        "ALTER TABLE pol_t ADD ROW ACCESS POLICY no_such_fn(id)"))
      intercept[Exception](spark.sql(
        "ALTER TABLE pol_t MODIFY COLUMN ghost SET MASKING POLICY mask_full(ghost)"))
      // duplicate row policy refused until dropped
      spark.sql("CREATE OR REPLACE TEMPORARY FUNCTION pol_true(x BIGINT) " +
        "RETURNS BOOLEAN RETURN true")
      spark.sql("ALTER TABLE pol_t ADD ROW ACCESS POLICY pol_true(id)")
      intercept[Exception](spark.sql(
        "ALTER TABLE pol_t ADD ROW ACCESS POLICY pol_true(id)"))
      spark.sql("ALTER TABLE pol_t DROP ROW ACCESS POLICY pol_true")
      assert(spark.sql("SELECT count(*) FROM pol_t").head.getLong(0) == 1L)
    }
  }
}
