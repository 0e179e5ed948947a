package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Federation paths (reference `plugins/{hive,hive2,hive3,...}` and the
  * JDBC-ARP dialect layer `common/.../common/dialect/arp/`): the same
  * query surface reading through a Hive metastore catalog and through a
  * JDBC source, both oracle-checked against the raw fixture tables.
  */
object Federation {

  /** Query a Hive-catalog table: CTAS the nation fixture into the embedded
    * metastore (HiveExternalCatalog / derby), then aggregate through the
    * catalog path — the reference's most-used federation plugin. */
  val hiveCatalogNation: QueryFn = (s, dir) => {
    Tables.ensure(s, dir)
    s.sql("CREATE DATABASE IF NOT EXISTS graft_fed")
    s.sql("DROP TABLE IF EXISTS graft_fed.nation_h")
    s.sql("CREATE TABLE graft_fed.nation_h STORED AS PARQUET AS SELECT * FROM nation")
    s.sql("""SELECT n_regionkey, count(*) AS n, min(n_name) AS first_name
             FROM graft_fed.nation_h GROUP BY n_regionkey ORDER BY n_regionkey""")
  }
  val hiveCatalogNationSql: String = """
    SELECT n_regionkey, count(*) AS n, min(n_name) AS first_name
    FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"""

  /** JDBC round-trip (reference JDBC-ARP): write the region fixture into an
    * in-JVM Derby database, read it back through Spark's JDBC source with a
    * pushed filter, aggregate. */
  val jdbcRoundtrip: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val url = "jdbc:derby:memory:graftfed;create=true"
    t.region.select(col("r_regionkey"), col("r_name"))
      .write.format("jdbc")
      .option("url", url).option("dbtable", "REGION_J")
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      .mode("overwrite").save()
    s.read.format("jdbc")
      .option("url", url).option("dbtable", "REGION_J")
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      .load()
      .filter(col("r_regionkey") >= 1) // pushed to the JDBC source
      .agg(count(lit(1)).as("n"), sum(col("r_regionkey")).as("key_sum"),
        min(col("r_name")).as("first_name"))
  }
  val jdbcRoundtripSql: String = """
    SELECT count(*) AS n, CAST(sum(r_regionkey) AS BIGINT) AS key_sum,
           min(r_name) AS first_name
    FROM region WHERE r_regionkey >= 1"""

  /** JDBC SUBTREE pushdown through the DataSource-V2 JDBC catalog: the
    * whole GROUP BY aggregate ships to the remote database and Spark reads
    * back pre-aggregated rows (plan shows `PushedAggregates`) — the
    * reference's JDBC-ARP subtree pushdown (`PlannerPhase.java:171`
    * JDBC_PUSHDOWN; dialect rules `common/dialect/arp/`), not just
    * filters. At 100 TB of remote warehouse data this is the difference
    * between moving the TABLE and moving the ANSWER. */
  val jdbcAggPushdown: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val url = "jdbc:derby:memory:graftfedv2;create=true"
    t.nation.select(col("n_nationkey"), col("n_regionkey"), col("n_name"))
      .write.format("jdbc")
      .option("url", url).option("dbtable", "NATION_V2")
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      // Derby's default StringType mapping is CLOB, which it refuses to
      // aggregate — VARCHAR keeps MAX(n_name) remotely computable
      .option("createTableColumnTypes", "n_name VARCHAR(64)")
      .mode("overwrite").save()
    s.conf.set("spark.sql.catalog.graft_jdbc",
      "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog")
    s.conf.set("spark.sql.catalog.graft_jdbc.url", url)
    s.conf.set("spark.sql.catalog.graft_jdbc.driver", "org.apache.derby.jdbc.EmbeddedDriver")
    s.conf.set("spark.sql.catalog.graft_jdbc.pushDownAggregate", "true")
    s.conf.set("spark.sql.catalog.graft_jdbc.pushDownLimit", "true")
    s.sql("""SELECT n_regionkey, count(*) AS n, max(n_name) AS last_name
             FROM graft_jdbc.APP.NATION_V2
             GROUP BY n_regionkey ORDER BY n_regionkey""")
  }
  val jdbcAggPushdownSql: String = """
    SELECT n_regionkey, count(*) AS n, max(n_name) AS last_name
    FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"""

  /** JDBC JOIN-subtree pushdown (reference ARP full-subtree pushdown,
    * `PlannerPhase.java:171`): two tables in the SAME remote Derby
    * database join REMOTELY — the graft Derby dialect declares
    * `supportsJoin`, `spark.sql.optimizer.datasourceV2JoinPushdown`
    * turns the optimizer rule on, and the plan collapses to ONE JDBC
    * scan whose SQL is the join (FederationSpec pins the plan shape).
    * At warehouse scale this moves the joined ANSWER instead of two
    * whole tables. */
  val jdbcJoinPushdown: QueryFn = (s, dir) => {
    org.apache.spark.sql.jdbc.GraftDerbyJoinDialect.ensureRegistered
    val t = Tables.ensure(s, dir)
    val url = "jdbc:derby:memory:graftfedj;create=true"
    t.nation.select(col("n_nationkey"), col("n_regionkey"), col("n_name"))
      .write.format("jdbc")
      .option("url", url).option("dbtable", "NATION_FJ")
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      .option("createTableColumnTypes", "n_name VARCHAR(64)")
      .mode("overwrite").save()
    t.region.select(col("r_regionkey"), col("r_name"))
      .write.format("jdbc")
      .option("url", url).option("dbtable", "REGION_FJ")
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      .option("createTableColumnTypes", "r_name VARCHAR(64)")
      .mode("overwrite").save()
    s.conf.set("spark.sql.catalog.graft_jdbcj",
      "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog")
    s.conf.set("spark.sql.catalog.graft_jdbcj.url", url)
    s.conf.set("spark.sql.catalog.graft_jdbcj.driver", "org.apache.derby.jdbc.EmbeddedDriver")
    s.conf.set("spark.sql.optimizer.datasourceV2JoinPushdown", "true")
    s.sql("""SELECT n.n_nationkey, n.n_name, r.r_name
             FROM graft_jdbcj.APP.NATION_FJ n
             JOIN graft_jdbcj.APP.REGION_FJ r ON n.n_regionkey = r.r_regionkey
             ORDER BY n.n_nationkey""")
  }
  val jdbcJoinPushdownSql: String = """
    SELECT n_nationkey, n_name, r_name
    FROM nation JOIN region ON n_regionkey = r_regionkey
    ORDER BY n_nationkey"""

  /** EXTERNAL QUERY (reference `ExternalQueryTranslatableTable.java` —
    * `source.external_query('sql')`): raw remote-dialect SQL ships
    * verbatim to the registered JDBC source; Spark reads back only the
    * result rows. */
  val jdbcExternalQuery: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val url = "jdbc:derby:memory:graftfedx;create=true"
    t.region.select(col("r_regionkey"), col("r_name"))
      .write.format("jdbc")
      .option("url", url).option("dbtable", "REGION_EQ")
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      .option("createTableColumnTypes", "r_name VARCHAR(64)")
      .mode("overwrite").save()
    s.conf.set("spark.sql.catalog.graft_jdbcx.url", url)
    s.conf.set("spark.sql.catalog.graft_jdbcx.driver", "org.apache.derby.jdbc.EmbeddedDriver")
    // Derby-dialect SQL (FETCH FIRST + quoted lowercase identifiers —
    // Spark could not have generated this text)
    s.sql("""SELECT r_regionkey, r_name
             FROM external_query('graft_jdbcx',
               'SELECT "r_regionkey", "r_name" FROM APP.REGION_EQ
                WHERE "r_regionkey" >= 1 ORDER BY "r_regionkey"
                FETCH FIRST 3 ROWS ONLY')
             ORDER BY r_regionkey""")
  }
  val jdbcExternalQuerySql: String = """
    SELECT r_regionkey, r_name FROM region
    WHERE r_regionkey >= 1 ORDER BY r_regionkey LIMIT 3"""

  /** The same external read routed through the SOURCE LIFECYCLE
    * (reference SourceResource → source catalog): CREATE SOURCE probes
    * the connection and publishes the name `external_query` resolves —
    * the registry, not hand-set conf keys, is what makes the remote
    * reachable. */
  val sourceLifecycleQuery: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val url = "jdbc:derby:memory:graftsrclc;create=true"
    t.nation.select(col("n_nationkey"), col("n_name"))
      .write.format("jdbc")
      .option("url", url).option("dbtable", "NATION_SRC")
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      .option("createTableColumnTypes", "n_name VARCHAR(64)")
      .mode("overwrite").save()
    val row = s.sql(
      s"""CREATE SOURCE IF NOT EXISTS fed_lifecycle TYPE jdbc (
         |  'url' = '$url',
         |  'driver' = 'org.apache.derby.jdbc.EmbeddedDriver')""".stripMargin).head()
    require(row.getString(2) == "good", s"source probe failed: $row")
    s.sql("""SELECT n_nationkey, n_name
             FROM external_query('fed_lifecycle',
               'SELECT "n_nationkey", "n_name" FROM APP.NATION_SRC
                WHERE "n_nationkey" < 10 ORDER BY "n_nationkey"')
             ORDER BY n_nationkey""")
  }
  val sourceLifecycleQuerySql: String = """
    SELECT n_nationkey, n_name FROM nation
    WHERE n_nationkey < 10 ORDER BY n_nationkey"""

  /** Arrow IPC easy-format round trip (reference `exec/store/easy/arrow`):
    * export a supplier selection as Arrow record-batch files with the
    * distributed writer, read them back with the distributed reader, and
    * hash-gate the result against the raw fixture. */
  val arrowRoundtrip: QueryFn = (s, dir) => {
    val t = graft.engine.Tables.ensure(s, dir)
    val arrowDir = Lake.scratchDir("graft_arrow_rt") + "/supplier"
    graft.sources.ArrowFiles.write(
      t.supplier.select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
        dbl(money(col("s_acctbal"))).as("bal"))
        .filter(col("s_suppkey") % 3 === 0),
      arrowDir)
    graft.sources.ArrowFiles.read(s, arrowDir).orderBy(col("s_suppkey"))
  }
  val arrowRoundtripSql: String = """
    SELECT s_suppkey, s_name, s_nationkey,
           CAST(CAST(s_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS bal
    FROM supplier WHERE s_suppkey % 3 = 0 ORDER BY s_suppkey"""

  /** WET round trip: export the documents fixture as WET-style WARC
    * (conversion records, one gzip member per record — the Common-Crawl
    * layout), stream it back with the record reader, and reconstruct
    * doc_id + text from the container fields. Oracle = the raw fixture. */
  val warcRoundtrip: QueryFn = (s, dir) => {
    val t = graft.engine.Tables.ensure(s, dir)
    val warcDir = Lake.scratchDir("graft_warc_rt") + "/wet"
    graft.sources.WarcFiles.write(
      t.documents.select(
        concat(lit("https://corpus.example/doc/"), col("doc_id")).as("target_uri"),
        col("text")),
      warcDir)
    graft.sources.WarcFiles.readText(s, warcDir)
      .select(
        regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1).cast("bigint").as("doc_id"),
        col("text"))
      .orderBy(col("doc_id"))
  }
  val warcRoundtripSql: String =
    "SELECT doc_id, text FROM documents ORDER BY doc_id"

  /** WARC response scan: wrap each document in a deterministic HTTP
    * envelope (status varies by doc_id), write `response` records, read
    * back through the HTTP view which parses status/content-type/body out
    * of the payload — the raw-crawl half of the WARC surface. */
  val warcHttpScan: QueryFn = (s, dir) => {
    val t = graft.engine.Tables.ensure(s, dir)
    val warcDir = Lake.scratchDir("graft_warc_http") + "/crawl"
    val status = when(col("doc_id") % 7 === 0, lit(404)).otherwise(lit(200))
    val reason = when(col("doc_id") % 7 === 0, lit("Not Found")).otherwise(lit("OK"))
    graft.sources.WarcFiles.write(
      t.documents.select(
        concat(lit("https://corpus.example/doc/"), col("doc_id")).as("target_uri"),
        encode(concat(
          lit("HTTP/1.1 "), status, lit(" "), reason, lit("\r\n"),
          lit("Content-Type: text/html; charset=UTF-8\r\n\r\n"),
          col("text")), "UTF-8").as("payload")),
      warcDir, warcType = "response")
    graft.sources.WarcFiles.readHttp(s, warcDir)
      .select(
        regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1).cast("bigint").as("doc_id"),
        col("http_status").cast("int").as("http_status"),
        col("http_content_type"),
        decode(col("body"), "UTF-8").as("body_text"))
      .orderBy(col("doc_id"))
  }
  val warcHttpScanSql: String = """
    SELECT doc_id,
           CAST(CASE WHEN doc_id % 7 = 0 THEN 404 ELSE 200 END AS INT) AS http_status,
           'text/html; charset=UTF-8' AS http_content_type,
           text AS body_text
    FROM documents ORDER BY doc_id"""

  /** The raw-crawl ingestion pipeline end to end through a NOTIFIED
    * FORMAT WARC pipe in its HTTP shape: documents wrapped as HTTP
    * responses (half declaring charset=UTF-8, half declaring none — the
    * decode falls back to UTF-8), dropped as archives, notified,
    * triggered into a lake table, read back. The oracle replays from the
    * documents table: the pipe must neither lose, duplicate, nor
    * transcode-mangle a record. */
  val warcHttpPipe: QueryFn = (s, dir) => {
    val t = graft.engine.Tables.ensure(s, dir)
    val root = Lake.scratchDir("graft_warc_http_pipe")
    val drops = root + "/drops"
    val spool = root + "/spool"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(spool))
    val ctype = when(col("doc_id") % 2 === 0,
      lit("text/html; charset=UTF-8")).otherwise(lit("text/html"))
    graft.sources.WarcFiles.write(
      t.documents.filter(col("doc_id") < 300).select(
        concat(lit("https://crawl.example/p/"), col("doc_id")).as("target_uri"),
        encode(concat(lit("HTTP/1.1 200 OK\r\nContent-Type: "), ctype,
          lit("\r\n\r\n<html><body>"), col("text"), lit("</body></html>")),
          "UTF-8").as("payload")),
      drops, warcType = "response")
    val files = new java.io.File(drops).listFiles().toSeq
      .filter(_.getName.endsWith(".warc.gz")).map(_.getAbsolutePath).sorted
    s.sql(s"CREATE PIPE warc_http_pipe_q FROM '$root/never' FORMAT warc " +
      "SCHEMA 'target_uri STRING, warc_date STRING, http_status INT, " +
      "http_content_type STRING, html STRING' " +
      s"INTO LAKE '$root/lake' CHECKPOINT '$root/_chk' " +
      s"NOTIFICATION_PROVIDER local_dir NOTIFICATION_QUEUE_REFERENCE '$spool'")
    files.zipWithIndex.foreach { case (f, i) =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$spool/e$i"), f.getBytes("UTF-8"))
    }
    s.sql("TRIGGER PIPE warc_http_pipe_q").collect()
    s.sql("DROP PIPE warc_http_pipe_q").collect()
    graft.sources.SnapshotTable.forPath(s, s"$root/lake").read()
      .select(
        regexp_extract(col("target_uri"), "/p/(\\d+)$", 1).cast("bigint").as("doc_id"),
        col("http_status"), col("http_content_type"), col("html"))
      .orderBy(col("doc_id"))
  }
  val warcHttpPipeSql: String = """
    SELECT doc_id,
           CAST(200 AS INT) AS http_status,
           CASE WHEN doc_id % 2 = 0 THEN 'text/html; charset=UTF-8'
                ELSE 'text/html' END AS http_content_type,
           '<html><body>' || text || '</body></html>' AS html
    FROM documents WHERE doc_id < 300 ORDER BY doc_id"""

  val queries: Map[String, QueryFn] = Map(
    "hive_catalog_nation" -> hiveCatalogNation,
    "jdbc_roundtrip" -> jdbcRoundtrip,
    "jdbc_agg_pushdown" -> jdbcAggPushdown,
    "jdbc_join_pushdown" -> jdbcJoinPushdown,
    "jdbc_external_query" -> jdbcExternalQuery,
    "source_lifecycle_query" -> sourceLifecycleQuery,
    "arrow_roundtrip" -> arrowRoundtrip,
    "warc_roundtrip" -> warcRoundtrip,
    "warc_http_scan" -> warcHttpScan,
    "warc_http_pipe" -> warcHttpPipe)

  val oracle: Map[String, String] = Map(
    "hive_catalog_nation" -> hiveCatalogNationSql,
    "jdbc_roundtrip" -> jdbcRoundtripSql,
    "jdbc_agg_pushdown" -> jdbcAggPushdownSql,
    "jdbc_join_pushdown" -> jdbcJoinPushdownSql,
    "jdbc_external_query" -> jdbcExternalQuerySql,
    "source_lifecycle_query" -> sourceLifecycleQuerySql,
    "arrow_roundtrip" -> arrowRoundtripSql,
    "warc_roundtrip" -> warcRoundtripSql,
    "warc_http_scan" -> warcHttpScanSql,
    "warc_http_pipe" -> warcHttpPipeSql)
}
