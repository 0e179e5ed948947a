package graft.auth

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Branch/tag-scoped privileges — the reference's GRANT ON REFERENCE
  * surface (`sabot/grammar/src/main/codegen/includes/grant.ftl:240-256`
  * `GRANT ... ON BRANCH|TAG ref IN CATALOG cat TO ...`; the OSS edition
  * parses but refuses at `CommandCreator.java:669` — we implement the
  * semantics). Pinned here:
  *  - COMMIT on a branch authorizes mutations targeting THAT branch only;
  *    main and sibling branches stay refused without table-wide grants.
  *  - USAGE on a ref authorizes pinning reads to it (USE BRANCH|TAG,
  *    MERGE DRY RUN) without table-wide SELECT.
  *  - CREATE_BRANCH / CREATE_TAG granted ON CATALOG gate ref creation
  *    (SqlGrantCatalog.Privilege).
  *  - REVOKE closes access; the ALL-vs-narrow refusal mirrors the table
  *    grant contract; invalid privileges and unknown refs refuse loudly.
  */
class RefGrantsSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
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

  /** A two-commit lake table with a `dev` branch and an `other` branch. */
  private def freshLake(): String = {
    val dir = Files.createTempDirectory("refgrants").toString
    import spark.implicits._
    val t = graft.sources.SnapshotTable.forPath(spark, dir)
    t.append(Seq((1, "a"), (2, "b")).toDF("id", "v"))
    spark.sql(s"CREATE BRANCH dev FROM LAKE '$dir'")
    spark.sql(s"CREATE BRANCH other FROM LAKE '$dir'")
    Seq((3, "c")).toDF("id", "v").createOrReplaceTempView("refgrants_feed")
    dir
  }

  test("COMMIT on a branch authorizes writes to that branch only") {
    withAuthWorld {
      val dir = freshLake()
      spark.sql("CREATE USER root_u PASSWORD 'rp' ADMIN")
      spark.sql("CREATE USER carol PASSWORD 'cp'")
      spark.sql("ALTER AUTH ENFORCE ON")

      asPrincipal("carol", "cp")
      val e1 = intercept[SecurityException](spark.sql(
        s"INSERT INTO LAKE '$dir' AT BRANCH dev SELECT * FROM refgrants_feed"))
      assert(e1.getMessage.contains("COMMIT on branch 'dev'"), e1.getMessage)

      asPrincipal("root_u", "rp")
      spark.sql(s"GRANT COMMIT ON BRANCH dev IN CATALOG '$dir' TO USER carol")

      asPrincipal("carol", "cp")
      // branch-targeted statement DML: all three forms pass on dev...
      spark.sql(s"INSERT INTO LAKE '$dir' AT BRANCH dev SELECT * FROM refgrants_feed")
      spark.sql(s"UPDATE LAKE '$dir' AT BRANCH dev SET v = 'cc' WHERE id = 3")
      spark.sql(s"DELETE FROM LAKE '$dir' AT BRANCH dev WHERE id = 1")
      // ...and the session-pinned branch route too (root pins usage-free
      // path: carol needs USAGE or SELECT to pin — grant usage for this leg)
      asPrincipal("root_u", "rp")
      spark.sql(s"GRANT USAGE ON BRANCH dev IN CATALOG '$dir' TO USER carol")
      asPrincipal("carol", "cp")
      spark.sql(s"USE BRANCH dev IN LAKE '$dir'")
      spark.sql(s"INSERT INTO LAKE '$dir' SELECT * FROM refgrants_feed")
      spark.sql(s"USE DEFAULT IN LAKE '$dir'")
      // main and the sibling branch stay refused
      intercept[SecurityException](spark.sql(
        s"INSERT INTO LAKE '$dir' SELECT * FROM refgrants_feed"))
      intercept[SecurityException](spark.sql(
        s"UPDATE LAKE '$dir' SET v = 'x' WHERE id = 2"))
      intercept[SecurityException](spark.sql(
        s"INSERT INTO LAKE '$dir' AT BRANCH other SELECT * FROM refgrants_feed"))
      // the branch writes really landed on dev and NOT main (verified as
      // admin — carol holds no table-wide SELECT)
      asPrincipal("root_u", "rp")
      val t = graft.sources.SnapshotTable.forPath(spark, dir)
      assert(t.readRef("dev").count() == 3L) // 2 base - 1 deleted + 2 inserted
      assert(t.read().count() == 2L)
      asPrincipal("carol", "cp")

      // revoke closes the door
      asPrincipal("root_u", "rp")
      spark.sql(s"REVOKE COMMIT ON BRANCH dev IN CATALOG '$dir' FROM USER carol")
      asPrincipal("carol", "cp")
      intercept[SecurityException](spark.sql(
        s"INSERT INTO LAKE '$dir' AT BRANCH dev SELECT * FROM refgrants_feed"))
    }
  }

  test("USAGE on a ref authorizes pinning reads; tags covered; DROP follows COMMIT") {
    withAuthWorld {
      val dir = freshLake()
      spark.sql(s"CREATE TAG snap FROM LAKE '$dir'")
      // a commit on dev so the dry run below reports a real fast-forward
      spark.sql(s"INSERT INTO LAKE '$dir' AT BRANCH dev SELECT * FROM refgrants_feed")
      spark.sql("CREATE USER root_u PASSWORD 'rp' ADMIN")
      spark.sql("CREATE USER dave PASSWORD 'dp'")
      spark.sql("ALTER AUTH ENFORCE ON")

      asPrincipal("dave", "dp")
      val e1 = intercept[SecurityException](
        spark.sql(s"USE BRANCH dev IN LAKE '$dir'"))
      assert(e1.getMessage.contains("USAGE on branch 'dev'"), e1.getMessage)
      intercept[SecurityException](spark.sql(s"USE TAG snap IN LAKE '$dir'"))
      intercept[SecurityException](spark.sql(
        s"MERGE BRANCH dev INTO LAKE '$dir' DRY RUN"))

      asPrincipal("root_u", "rp")
      spark.sql(s"GRANT USAGE ON BRANCH dev IN CATALOG '$dir' TO USER dave")
      spark.sql(s"GRANT USAGE ON TAG snap IN CATALOG '$dir' TO USER dave")

      asPrincipal("dave", "dp")
      spark.sql(s"USE BRANCH dev IN LAKE '$dir'")
      spark.sql(s"USE TAG snap IN LAKE '$dir'")
      spark.sql(s"USE DEFAULT IN LAKE '$dir'")
      assert(spark.sql(s"MERGE BRANCH dev INTO LAKE '$dir' DRY RUN")
        .head().getString(0) == "fast_forward")
      // usage is read-only: no write leaks from it
      intercept[SecurityException](spark.sql(
        s"INSERT INTO LAKE '$dir' AT BRANCH dev SELECT * FROM refgrants_feed"))
      // DROP BRANCH needs ALTER or COMMIT on the ref — usage isn't enough
      intercept[SecurityException](spark.sql(s"DROP BRANCH dev FROM LAKE '$dir'"))
      asPrincipal("root_u", "rp")
      spark.sql(s"GRANT COMMIT ON BRANCH dev IN CATALOG '$dir' TO USER dave")
      asPrincipal("dave", "dp")
      spark.sql(s"DROP BRANCH dev FROM LAKE '$dir'")
      // ...but not the sibling he holds nothing on
      intercept[SecurityException](spark.sql(s"DROP BRANCH other FROM LAKE '$dir'"))
    }
  }

  test("CREATE_BRANCH / CREATE_TAG ON CATALOG gate ref creation") {
    withAuthWorld {
      val dir = freshLake()
      spark.sql("CREATE USER root_u PASSWORD 'rp' ADMIN")
      spark.sql("CREATE USER erin PASSWORD 'ep'")
      spark.sql("ALTER AUTH ENFORCE ON")

      asPrincipal("erin", "ep")
      val e1 = intercept[SecurityException](
        spark.sql(s"CREATE BRANCH feat FROM LAKE '$dir'"))
      assert(e1.getMessage.contains("CREATE_BRANCH"), e1.getMessage)

      asPrincipal("root_u", "rp")
      spark.sql(s"GRANT CREATE_BRANCH ON CATALOG '$dir' TO USER erin")
      asPrincipal("erin", "ep")
      spark.sql(s"CREATE BRANCH feat FROM LAKE '$dir'")
      // tag creation is a separate privilege
      intercept[SecurityException](spark.sql(s"CREATE TAG t1 FROM LAKE '$dir'"))
      asPrincipal("root_u", "rp")
      spark.sql(s"GRANT CREATE_TAG ON CATALOG '$dir' TO USER erin")
      asPrincipal("erin", "ep")
      spark.sql(s"CREATE TAG t1 FROM LAKE '$dir'")
      // catalog revoke closes it again
      asPrincipal("root_u", "rp")
      spark.sql(s"REVOKE CREATE_BRANCH ON CATALOG '$dir' FROM USER erin")
      asPrincipal("erin", "ep")
      intercept[SecurityException](spark.sql(s"CREATE BRANCH feat2 FROM LAKE '$dir'"))
    }
  }

  test("validation and SHOW GRANTS ON BRANCH") {
    withAuthWorld {
      val dir = freshLake()
      spark.sql("CREATE USER root_u PASSWORD 'rp' ADMIN")
      spark.sql("CREATE USER fred PASSWORD 'fp'")
      spark.sql("CREATE ROLE writers")

      // invalid privilege on a ref refuses loudly
      val e1 = intercept[Exception](spark.sql(
        s"GRANT SELECT ON BRANCH dev IN CATALOG '$dir' TO USER fred"))
      assert(e1.getMessage.contains("not grantable"), e1.getMessage)
      // unknown ref refuses at grant time (revoke would still land)
      intercept[Exception](spark.sql(
        s"GRANT COMMIT ON BRANCH nope IN CATALOG '$dir' TO USER fred"))
      // tag/branch kind mismatch refuses
      spark.sql(s"CREATE TAG snap FROM LAKE '$dir'")
      intercept[Exception](spark.sql(
        s"GRANT USAGE ON BRANCH snap IN CATALOG '$dir' TO USER fred"))

      spark.sql(s"GRANT USAGE, COMMIT ON BRANCH dev IN CATALOG '$dir' TO USER fred")
      spark.sql(s"GRANT ALL ON BRANCH dev IN CATALOG '$dir' TO ROLE writers")
      val rows = spark.sql(s"SHOW GRANTS ON BRANCH dev IN CATALOG '$dir'")
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
      assert(rows == Set(("user", "fred", "usage"), ("user", "fred", "commit"),
        ("role", "writers", "all")))
      // narrow revoke under a standing ALL refuses (mirrors table grants)
      val e2 = intercept[Exception](spark.sql(
        s"REVOKE COMMIT ON BRANCH dev IN CATALOG '$dir' FROM ROLE writers"))
      assert(e2.getMessage.contains("REVOKE ALL"), e2.getMessage)
      spark.sql(s"REVOKE ALL ON BRANCH dev IN CATALOG '$dir' FROM ROLE writers")
      assert(spark.sql(s"SHOW GRANTS ON BRANCH dev IN CATALOG '$dir'")
        .collect().length == 2)
      // ref grants surface in sys_privileges with the @branch: suffix
      val obj = Privileges.refObj(dir, "branch", "dev")
      val sysRows = spark.sql(
        s"SELECT privilege FROM sys_privileges WHERE object = '$obj'").collect()
      assert(sysRows.map(_.getString(0)).toSet == Set("usage", "commit"))
      // a typo'd ref-privilege REVOKE refuses loudly instead of silently
      // leaving access standing
      val e3 = intercept[Exception](spark.sql(
        s"REVOKE COMIT ON BRANCH dev IN CATALOG '$dir' FROM USER fred"))
      assert(e3.getMessage.contains("not revocable"), e3.getMessage)
    }
  }

  test("GRANT ON ALL DATASETS IN FOLDER|SOURCE: one container grant covers the subtree") {
    withAuthWorld {
      import spark.implicits._
      val root = java.nio.file.Files.createTempDirectory("bulkgrant").toString
      spark.sql(s"CREATE LAKE '$root/t1' AS SELECT id FROM range(5)")
      spark.sql(s"CREATE LAKE '$root/sub/t2' AS SELECT id FROM range(7)")
      spark.sql("CREATE USER root_u PASSWORD 'rp' ADMIN")
      spark.sql("CREATE USER ivy PASSWORD 'ip'")
      spark.sql("ALTER AUTH ENFORCE ON")
      asPrincipal("ivy", "ip")
      intercept[Exception](spark.sql(s"SELECT count(*) FROM lake_scan('$root/t1')"))
      asPrincipal("root_u", "rp")
      spark.sql(s"GRANT SELECT ON ALL DATASETS IN FOLDER '$root' TO USER ivy")
      asPrincipal("ivy", "ip")
      // both nested datasets covered by the ONE container grant
      assert(spark.sql(s"SELECT count(*) AS n FROM lake_scan('$root/t1')")
        .head().getLong(0) == 5L)
      assert(spark.sql(s"SELECT count(*) AS n FROM lake_scan('$root/sub/t2')")
        .head().getLong(0) == 7L)
      // read-only: the container grant was SELECT
      intercept[SecurityException](spark.sql(
        s"DELETE FROM LAKE '$root/t1' WHERE id = 1"))
      // a sibling OUTSIDE the prefix stays refused
      val other = java.nio.file.Files.createTempDirectory("bulkother").toString
      asPrincipal("root_u", "rp")
      spark.sql(s"CREATE LAKE '$other/t3' AS SELECT id FROM range(3)")
      asPrincipal("ivy", "ip")
      intercept[Exception](spark.sql(s"SELECT count(*) FROM lake_scan('$other/t3')"))
      // the SOURCE spelling resolves through the registry; jdbc refuses
      asPrincipal("root_u", "rp")
      spark.sql(s"REVOKE SELECT ON ALL DATASETS IN FOLDER '$root' FROM USER ivy")
      spark.sql(s"CREATE SOURCE bulk_src TYPE files ('path' = '$root')")
      spark.sql("GRANT SELECT ON ALL DATASETS IN SOURCE bulk_src TO USER ivy")
      asPrincipal("ivy", "ip")
      assert(spark.sql(s"SELECT count(*) AS n FROM lake_scan('$root/sub/t2')")
        .head().getLong(0) == 7L)
      asPrincipal("root_u", "rp")
      spark.sql("CREATE SOURCE bulk_jdbc TYPE jdbc ('url' = 'jdbc:derby:memory:bulkg;create=true')")
      val e = intercept[Exception](spark.sql(
        "GRANT SELECT ON ALL DATASETS IN SOURCE bulk_jdbc TO USER ivy"))
      assert(e.getMessage.contains("external:"), e.getMessage)
      graft.catalog.Sources.clear(spark)
    }
  }

  test("catalog privileges live under their own key: REVOKE ALL ON CATALOG can't strip table grants") {
    withAuthWorld {
      val dir = freshLake()
      spark.sql("CREATE USER root_u PASSWORD 'rp' ADMIN")
      spark.sql("CREATE USER hank PASSWORD 'hp'")
      spark.sql(s"GRANT SELECT ON '$dir' TO USER hank")
      spark.sql(s"GRANT INSERT ON '$dir' TO USER hank")
      spark.sql(s"GRANT CREATE_BRANCH ON CATALOG '$dir' TO USER hank")
      spark.sql("ALTER AUTH ENFORCE ON")
      asPrincipal("root_u", "rp")
      // revoking every CATALOG privilege must not touch the table grants
      spark.sql(s"REVOKE ALL ON CATALOG '$dir' FROM USER hank")
      asPrincipal("hank", "hp")
      spark.sql(s"INSERT INTO LAKE '$dir' SELECT * FROM refgrants_feed") // INSERT intact
      intercept[SecurityException](spark.sql(s"CREATE BRANCH h1 FROM LAKE '$dir'"))
      // ...and the table-side REVOKE ALL leaves a standing catalog grant
      asPrincipal("root_u", "rp")
      spark.sql(s"GRANT CREATE_TAG ON CATALOG '$dir' TO USER hank")
      spark.sql(s"REVOKE ALL ON '$dir' FROM USER hank")
      asPrincipal("hank", "hp")
      spark.sql(s"CREATE TAG htag FROM LAKE '$dir'") // catalog grant intact
      intercept[SecurityException](spark.sql(
        s"INSERT INTO LAKE '$dir' SELECT * FROM refgrants_feed"))
      // narrow catalog revoke under a standing catalog ALL refuses
      asPrincipal("root_u", "rp")
      spark.sql(s"GRANT ALL ON CATALOG '$dir' TO USER hank")
      val e = intercept[Exception](spark.sql(
        s"REVOKE CREATE_TAG ON CATALOG '$dir' FROM USER hank"))
      assert(e.getMessage.contains("REVOKE ALL"), e.getMessage)
    }
  }

  test("container grants cover dataset paths only, never the synthetic @ref/@catalog keys") {
    withAuthWorld {
      import spark.implicits._
      val root = Files.createTempDirectory("contgrant").toString
      val dir = s"$root/t1"
      val t = graft.sources.SnapshotTable.forPath(spark, dir)
      t.append(Seq((1, "a")).toDF("id", "v"))
      spark.sql(s"CREATE BRANCH dev FROM LAKE '$dir'")
      spark.sql("CREATE USER root_u PASSWORD 'rp' ADMIN")
      spark.sql("CREATE USER judy PASSWORD 'jp'")
      // a NARROW container grant (not ALL): COMMIT+USAGE on all datasets
      // in the folder must convey those actions on the DATASET paths, but
      // not on the per-ref (@branch:/@tag:) or @catalog sub-object keys —
      // GRANT ON ALL DATASETS names datasets, not branch/catalog scopes
      Privileges.grantOnAllDatasets(spark, "commit", root, "user", "judy",
        granting = true)
      Privileges.grantOnAllDatasets(spark, "usage", root, "user", "judy",
        granting = true)
      spark.sql("ALTER AUTH ENFORCE ON")
      asPrincipal("judy", "jp")
      val u = Privileges.principalOf(spark).get
      // dataset-path coverage stands...
      assert(Privileges.allowed(u, "commit", Privileges.normObj(dir)))
      // ...but the synthetic keys are NOT covered by the container prefix
      assert(!Privileges.allowedOnRef(u, "commit", dir, "branch", "dev"))
      assert(!Privileges.allowedOnRef(u, "usage", dir, "branch", "dev"))
      assert(!Privileges.allowed(u, "create_branch", Privileges.catalogObj(dir)))
      // behavioral: USE BRANCH needs SELECT on the table or USAGE on the
      // ref — the container USAGE grant supplies neither
      intercept[SecurityException](
        Privileges.requireRefUsage(spark, dir, "branch", "dev", "USE BRANCH"))
      // an EXPLICIT per-ref grant still works (the fix must not break the
      // real per-ref surface)
      asPrincipal("root_u", "rp")
      spark.sql(s"GRANT USAGE ON BRANCH dev IN CATALOG '$dir' TO USER judy")
      asPrincipal("judy", "jp")
      Privileges.requireRefUsage(spark, dir, "branch", "dev", "USE BRANCH")
      // '@' is a LEGAL path character: a dataset under the folder whose
      // path contains '@' (user dirs, emails) stays covered — only the
      // exact synthetic @branch:/@tag:/@catalog suffixes are excluded
      val u2 = Privileges.principalOf(spark).get
      assert(Privileges.allowed(u2, "commit",
        Privileges.normObj(s"$root/team@eu/t")))
      assert(!Privileges.allowed(u2, "commit",
        Privileges.normObj(s"$root/team@eu/t") + "@branch:dev"))
    }
  }
}
