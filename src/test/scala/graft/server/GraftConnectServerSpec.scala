package graft.server

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Over-loopback proof of the Spark Connect endpoint: the REAL Connect JVM
  * client (`sc://localhost:<port>`, gRPC + Arrow batches) runs analytical
  * SQL, the DataFrame API, and graft lake DDL through the wire, and
  * results match in-process execution of the same statements. */
class GraftConnectServerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def withClient[A](f: org.apache.spark.sql.connect.SparkSession => A): A = {
    val port = GraftConnectServer.start(spark)
    val client = org.apache.spark.sql.connect.SparkSession.builder()
      .remote(s"sc://localhost:$port").create()
    try f(client) finally client.close()
  }

  private def render(rows: Array[org.apache.spark.sql.Row]): Seq[Seq[String]] =
    rows.map(r => (0 until r.length).map(i => String.valueOf(r.get(i))).toSeq)
      .toSeq.sortBy(_.mkString("|"))

  test("tpch_q01 over the Connect wire matches in-process execution") {
    val q =
      s"""SELECT l_returnflag, l_linestatus,
         |       count(*) AS count_order,
         |       cast(sum(l_quantity) AS decimal(20,2)) AS sum_qty,
         |       cast(sum(l_extendedprice) AS decimal(20,2)) AS sum_base_price
         |FROM parquet.`$sf/lineitem.parquet`
         |WHERE l_shipdate <= date '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin
    withClient { client =>
      val wire = render(client.sql(q).collect())
      assert(wire.nonEmpty)
      assert(wire == render(spark.sql(q).collect()),
        "Connect wire result differs from in-process result")
    }
  }

  test("DataFrame API over the Connect wire: read/filter/agg round-trip") {
    withClient { client =>
      val n = client.read.parquet(s"$sf/orders.parquet")
        .filter("o_orderstatus = 'F'")
        .groupBy("o_orderpriority").count()
        .collect()
      val local = spark.read.parquet(s"$sf/orders.parquet")
        .filter("o_orderstatus = 'F'")
        .groupBy("o_orderpriority").count()
        .collect()
      assert(render(n) == render(local),
        "Connect DataFrame result differs from in-process result")
    }
  }

  test("auth enforcement over the Connect wire: grant-less refused, authenticated grantee served") {
    import graft.auth.Privileges
    Privileges.clear()
    try {
      spark.sql("CREATE USER conn_admin PASSWORD 'cp' ADMIN")
      spark.sql("CREATE USER conn_bob PASSWORD 'bp'")
      spark.sql(s"GRANT SELECT ON '$sf/region.parquet' TO USER conn_bob")
      spark.sql("ALTER AUTH ENFORCE ON")
      withClient { client =>
        val q = s"SELECT count(*) AS n FROM parquet.`$sf/region.parquet`"
        // anonymous Connect session: refused at analysis
        val e0 = intercept[Exception](client.sql(q).collect())
        assert(e0.toString.contains("lacks SELECT"), e0.toString)
        // AUTHENTICATE binds the principal to this client's server session
        client.sql("AUTHENTICATE USER conn_bob PASSWORD 'bp'").collect()
        assert(client.sql(q).collect().head.getLong(0) == 5L)
        // wire-first jobs service: the Connect statement landed in the
        // shared history ring under the bound principal
        org.apache.spark.sql.graft.Bridge.waitListenerBus(spark)
        assert(graft.catalog.QueryHistory.records.exists(_.userName == "conn_bob"),
          "Connect statement missing from sys_queries with its principal")
      }
    } finally {
      Privileges.clear()
      spark.conf.unset(Privileges.TokenConf)
      spark.conf.unset(Privileges.UserConf)
    }
  }

  test("graft lake DDL/DML round-trips through the Connect wire") {
    val dir = java.nio.file.Files.createTempDirectory("connect_lake").toString
    withClient { client =>
      // the Connect-side session is created BY the service over the shared
      // context — extensions must arrive via spark.sql.extensions conf
      client.sql(s"CREATE LAKE '$dir' AS SELECT id, id * 2 AS v FROM range(100)").collect()
      client.sql(s"INSERT INTO LAKE '$dir' SELECT id, id * 2 AS v FROM range(100, 150)").collect()
      val hist = client.sql(s"DESCRIBE LAKE '$dir'").collect()
      assert(hist.length == 2, s"expected 2 commits over the wire, got ${hist.length}")
      val agg = render(client.sql(
        s"SELECT count(*) AS n, sum(v) AS s FROM lake_scan('$dir')").collect())
      assert(agg == Seq(Seq("150", (0 until 150).map(_ * 2L).sum.toString)),
        s"wire lake query wrong: $agg")
      // the same lake dir reads identically from the in-process session
      val localN = spark.sql(s"SELECT count(*) AS n FROM lake_scan('$dir')")
        .collect()(0).getLong(0)
      assert(localN == 150L, s"lake table wrong after wire DML: $localN rows")
    }
  }

  test("concurrent Connect clients get isolated sessions") {
    val port = GraftConnectServer.start(spark)
    def connect() = org.apache.spark.sql.connect.SparkSession.builder()
      .remote(s"sc://localhost:$port").create()
    val c1 = connect(); val c2 = connect()
    try {
      c1.sql("CREATE TEMPORARY VIEW conn_iso AS SELECT 1 AS v").collect()
      c2.sql("CREATE TEMPORARY VIEW conn_iso AS SELECT 2 AS v").collect()
      assert(c1.sql("SELECT v FROM conn_iso").collect()(0).getInt(0) == 1)
      assert(c2.sql("SELECT v FROM conn_iso").collect()(0).getInt(0) == 2,
        "Connect sessions shared temp-view state")
    } finally { c1.close(); c2.close() }
  }
}
