package graft.server

import java.sql.DriverManager

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Over-loopback proof of the network entry point: a real JDBC client
  * (the HiveServer2 driver) connects to the in-process Thrift endpoint,
  * runs analytical SQL and graft lake DDL through the wire, and results
  * match in-process execution of the same statements. */
class GraftServerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def withConnection[A](f: java.sql.Connection => A): A = {
    val port = GraftServer.port.getOrElse(GraftServer.start(spark))
    Class.forName("org.apache.hive.jdbc.HiveDriver")
    val conn = DriverManager.getConnection(
      s"jdbc:hive2://localhost:$port/default", "graft", "")
    try f(conn) finally conn.close()
  }

  /** Collect a wire result set as sorted rows of strings. */
  private def fetch(st: java.sql.Statement, sql: String): Seq[Seq[String]] = {
    val rs = st.executeQuery(sql)
    val n = rs.getMetaData.getColumnCount
    val buf = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    while (rs.next()) buf += (1 to n).map(i => String.valueOf(rs.getString(i)))
    rs.close()
    buf.toSeq.sortBy(_.mkString("|"))
  }

  /** Same rendering for an in-process DataFrame. */
  private def local(sql: String): Seq[Seq[String]] =
    spark.sql(sql).collect()
      .map(r => (0 until r.length).map(i => String.valueOf(r.get(i))).toSeq)
      .toSeq.sortBy(_.mkString("|"))

  test("a foreign (non-HiveServer2) listener on the port fails the handshake probe") {
    // TOCTOU guard: reservePort frees the probed port before the thrift
    // service binds, so a foreign process could own it. awaitListening must
    // demand a real HiveServer2 handshake and time out against anything else.
    val foreign = new java.net.ServerSocket(0)
    try {
      val ex = intercept[IllegalStateException] {
        GraftServer.awaitListening(foreign.getLocalPort, timeoutMs = 2500)
      }
      assert(ex.getMessage.contains("handshake"), ex.getMessage)
    } finally foreign.close()
  }

  test("tpch_q01 over the wire matches in-process execution") {
    val q =
      s"""SELECT l_returnflag, l_linestatus,
         |       count(*) AS count_order,
         |       cast(sum(l_quantity) AS decimal(20,2)) AS sum_qty,
         |       cast(sum(l_extendedprice) AS decimal(20,2)) AS sum_base_price
         |FROM parquet.`$sf/lineitem.parquet`
         |WHERE l_shipdate <= date '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin
    withConnection { conn =>
      val st = conn.createStatement()
      val wire = fetch(st, q)
      st.close()
      assert(wire.nonEmpty)
      assert(wire == local(q), "wire result differs from in-process result")
    }
  }

  test("concurrent wire connections get isolated sessions and serve in parallel") {
    val port = GraftServer.port.getOrElse(GraftServer.start(spark))
    Class.forName("org.apache.hive.jdbc.HiveDriver")
    def connect() = DriverManager.getConnection(
      s"jdbc:hive2://localhost:$port/default", "graft", "")
    val c1 = connect(); val c2 = connect()
    try {
      // temp views are session-scoped: same name, different content, no bleed
      c1.createStatement().execute("CREATE TEMPORARY VIEW iso_v AS SELECT 1 AS v")
      c2.createStatement().execute("CREATE TEMPORARY VIEW iso_v AS SELECT 2 AS v")
      val s1 = c1.createStatement(); val s2 = c2.createStatement()
      assert(fetch(s1, "SELECT v FROM iso_v") == Seq(Seq("1")))
      assert(fetch(s2, "SELECT v FROM iso_v") == Seq(Seq("2")),
        "wire sessions shared temp-view state")
      // concurrent statements over both connections all answer correctly
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration._
      implicit val ec: ExecutionContext = ExecutionContext.global
      val fs = (1 to 6).map { i =>
        Future {
          val st = (if (i % 2 == 0) c1 else c2).createStatement()
          try fetch(st, s"SELECT count(*) AS n FROM range(${i * 100})")
          finally st.close()
        }
      }
      val got = Await.result(Future.sequence(fs), 120.seconds)
      assert(got.zipWithIndex.forall { case (rows, idx) =>
        rows == Seq(Seq(((idx + 1) * 100).toString))
      }, s"concurrent wire results wrong: $got")
      s1.close(); s2.close()
    } finally { c1.close(); c2.close() }
  }

  test("graft lake DDL/DML round-trips through the wire") {
    val dir = java.nio.file.Files.createTempDirectory("wire_lake").toString
    withConnection { conn =>
      val st = conn.createStatement()
      // CTAS a lake table, append to it, read its history — all via the
      // extension parser inherited by the wire session
      st.execute(
        s"CREATE LAKE '$dir' AS SELECT id, id * 2 AS v FROM range(100)")
      st.execute(
        s"INSERT INTO LAKE '$dir' SELECT id, id * 2 AS v FROM range(100, 150)")
      val hist = fetch(st, s"DESCRIBE LAKE '$dir'")
      assert(hist.size == 2, s"expected 2 commits, got $hist")
      // view + query through the same wire session
      st.execute(s"CREATE LAKE VIEW wire_t FROM '$dir'")
      val agg = fetch(st, "SELECT count(*) AS n, sum(v) AS s FROM wire_t")
      st.close()
      assert(agg == Seq(Seq("150", (0 until 150).map(_ * 2L).sum.toString)))
      // and the committed table is visible to in-process readers too
      val t = graft.sources.SnapshotTable.forPath(spark, dir)
      assert(t.read().count() == 150)
    }
  }

  test("auth enforcement over the Thrift wire: AUTHENTICATE binds the connection's principal") {
    import graft.auth.Privileges
    Privileges.clear()
    try {
      spark.sql("CREATE USER wire_admin PASSWORD 'wp' ADMIN")
      spark.sql("CREATE USER wire_alice PASSWORD 'ap'")
      val p = s"$sf/region.parquet"
      spark.sql("ALTER AUTH ENFORCE ON")
      withConnection { conn =>
        val st = conn.createStatement()
        val q = s"SELECT count(*) AS n FROM parquet.`$p`"
        // the wire session starts anonymous: guarded read refused
        val e0 = intercept[Exception](fetch(st, q))
        assert(e0.toString.contains("lacks SELECT"), e0.toString)
        // authenticated but grant-less: still refused
        st.execute("AUTHENTICATE USER wire_alice PASSWORD 'ap'")
        val e1 = intercept[Exception](fetch(st, q))
        assert(e1.toString.contains("lacks SELECT"), e1.toString)
        // grant lands (admin, in-process) and the SAME connection serves
        spark.sql("AUTHENTICATE USER wire_admin PASSWORD 'wp'")
        spark.sql(s"GRANT SELECT ON '$p' TO USER wire_alice")
        assert(fetch(st, q) == Seq(Seq("5")))
        st.close()
      }
    } finally {
      Privileges.clear()
      spark.conf.unset(Privileges.TokenConf)
      spark.conf.unset(Privileges.UserConf)
    }
  }

  test("wire statements land in sys_queries with their principal (jobs service is wire-first)") {
    import graft.auth.Privileges
    Privileges.clear()
    try {
      spark.sql("CREATE USER hist_user PASSWORD 'hp'")
      val before = graft.catalog.QueryHistory.records.map(_.id).toSet
      withConnection { conn =>
        val st = conn.createStatement()
        st.execute("AUTHENTICATE USER hist_user PASSWORD 'hp'")
        assert(fetch(st, s"SELECT count(*) AS n FROM parquet.`$sf/nation.parquet`")
          == Seq(Seq("25")))
        st.close()
      }
      val fresh = graft.catalog.QueryHistory.records.filterNot(r => before(r.id))
      val mine = fresh.filter(_.userName == "hist_user")
      assert(mine.nonEmpty,
        s"no history record for the wire principal; fresh: ${fresh.map(r => (r.action, r.userName)).take(10)}")
      val r = mine.head
      assert(r.status == "SUCCESS" && r.durationMs >= 0.0 && r.tsMs > 0)
      // and the sys view serves the principal column
      graft.catalog.InfoSchema.register(spark)
      val viewRows = spark.sql(
        "SELECT user_name FROM sys_queries WHERE user_name = 'hist_user'").collect()
      assert(viewRows.nonEmpty)
    } finally {
      Privileges.clear()
      spark.conf.unset(Privileges.TokenConf)
      spark.conf.unset(Privileges.UserConf)
    }
  }

  test("row policies and USE BRANCH discriminate principals per wire session") {
    import graft.auth.{Policies, Privileges}
    Privileges.clear(); Policies.clear()
    try {
      spark.sql("CREATE USER wp_alice PASSWORD 'ap'")
      spark.sql("CREATE USER wp_bob PASSWORD 'bp'")
      withConnection { conn =>
        val st = conn.createStatement()
        // dataset + policy defined ON the wire session (temp views are
        // session-scoped; the policy registry rewrites this session's view)
        st.execute("CREATE TEMPORARY VIEW wp_acct AS SELECT * FROM VALUES " +
          "(1, 'wp_alice'), (2, 'wp_alice'), (3, 'wp_bob') AS t(id, owner)")
        st.execute("CREATE OR REPLACE TEMPORARY FUNCTION wp_own(o STRING) " +
          "RETURNS BOOLEAN RETURN graft_principal() IS NULL OR o = graft_principal()")
        st.execute("ALTER TABLE wp_acct ADD ROW ACCESS POLICY wp_own(owner)")
        assert(fetch(st, "SELECT count(*) AS n FROM wp_acct") == Seq(Seq("3")))
        st.execute("AUTHENTICATE USER wp_alice PASSWORD 'ap'")
        assert(fetch(st, "SELECT count(*) AS n FROM wp_acct") == Seq(Seq("2")))
        st.execute("AUTHENTICATE USER wp_bob PASSWORD 'bp'")
        assert(fetch(st, "SELECT count(*) AS n FROM wp_acct") == Seq(Seq("1")))

        // session version context travels the wire too: pin the session to
        // a branch, stage a row, read it back — main stays clean
        val dir = java.nio.file.Files.createTempDirectory("wire_useref").toString
        st.execute(s"CREATE LAKE '$dir' AS SELECT 1 AS id")
        st.execute(s"CREATE BRANCH wb FROM LAKE '$dir'")
        st.execute(s"USE BRANCH wb IN LAKE '$dir'")
        st.execute(s"INSERT INTO LAKE '$dir' SELECT 2 AS id")
        assert(fetch(st, s"SELECT count(*) AS n FROM lake_scan('$dir')") == Seq(Seq("2")))
        st.execute(s"USE DEFAULT IN LAKE '$dir'")
        assert(fetch(st, s"SELECT count(*) AS n FROM lake_scan('$dir')") == Seq(Seq("1")))
        st.close()
      }
    } finally {
      Privileges.clear(); Policies.clear()
      spark.conf.unset(Privileges.TokenConf)
      spark.conf.unset(Privileges.UserConf)
    }
  }

  test("wire queries serve from the result cache until a lake commit advances the base") {
    graft.accel.ResultCache.clearAll()
    val dir = java.nio.file.Files.createTempDirectory("wire_cache").toString
    spark.sql(s"CREATE LAKE '$dir' AS SELECT id, id * 2 AS v FROM range(100)")
    // lake_scan's quote doubles inside the cached('...') string literal
    val q = s"SELECT * FROM cached('SELECT count(*) AS n, sum(v) AS s FROM lake_scan(''$dir'')')"
    withConnection { conn =>
      val st = conn.createStatement()
      val first = fetch(st, q)
      assert(first == Seq(Seq("100", (0 until 100).map(_ * 2L).sum.toString)))
      val (_, h1, m1) = graft.accel.ResultCache.stats
      // repeat over the wire: a HIT on the shared registry, same rows
      assert(fetch(st, q) == first)
      val (_, h2, m2) = graft.accel.ResultCache.stats
      assert(h2 == h1 + 1 && m2 == m1, s"expected wire cache hit: $h1->$h2, $m1->$m2")
      // a lake commit THROUGH THE WIRE advances the base table: the entry
      // is stale, the next wire query recomputes against the new snapshot
      st.execute(s"INSERT INTO LAKE '$dir' SELECT id, id * 2 AS v FROM range(100, 120)")
      val after = fetch(st, q)
      assert(after == Seq(Seq("120", (0 until 120).map(_ * 2L).sum.toString)),
        s"stale cached result served after a wire commit: $after")
      val (_, h3, m3) = graft.accel.ResultCache.stats
      assert(m3 == m2 + 1, s"expected staleness miss after commit: $m2->$m3 (hits $h2->$h3)")
      st.close()
    }
  }
}
