package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Federation coverage (reference `plugins/hive*` + JDBC-ARP dialects):
  * Hive-metastore-backed tables (embedded derby metastore) and a JDBC V1
  * round-trip with filter pushdown, all in-process. */
class FederationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("session uses a real Hive external catalog") {
    assert(spark.conf.get("spark.sql.catalogImplementation") == "hive")
  }

  test("Hive-catalog table: CTAS, catalog listing, read-back") {
    spark.sql("CREATE DATABASE IF NOT EXISTS fed_spec")
    spark.sql("DROP TABLE IF EXISTS fed_spec.t_parquet")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      .createOrReplaceTempView("fed_src")
    spark.sql("CREATE TABLE fed_spec.t_parquet STORED AS PARQUET AS SELECT * FROM fed_src")
    assert(spark.catalog.tableExists("fed_spec.t_parquet"))
    val got = spark.sql("SELECT id, v FROM fed_spec.t_parquet ORDER BY id")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("Hive ORC table through the catalog (reference hive-ORC path)") {
    spark.sql("CREATE DATABASE IF NOT EXISTS fed_spec")
    spark.sql("DROP TABLE IF EXISTS fed_spec.t_orc")
    Seq((10L, 1.5), (20L, 2.5)).toDF("k", "x").createOrReplaceTempView("fed_orc_src")
    spark.sql("CREATE TABLE fed_spec.t_orc STORED AS ORC AS SELECT * FROM fed_orc_src")
    val got = spark.sql("SELECT sum(x) AS sx FROM fed_spec.t_orc").head().getDouble(0)
    assert(got == 4.0)
  }

  test("ANALYZE TABLE computes table and column statistics (CBO inputs)") {
    // reference §4.4: services/statistics feeds the cost model; Spark's
    // equivalent is catalog statistics consumed by CBO (enabled in
    // GraftSession) — requires a persistent catalog table, now available
    // through the Hive metastore
    spark.sql("CREATE DATABASE IF NOT EXISTS fed_spec")
    spark.sql("DROP TABLE IF EXISTS fed_spec.t_stats")
    Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "grp")
      .createOrReplaceTempView("fed_stats_src")
    spark.sql("CREATE TABLE fed_spec.t_stats STORED AS PARQUET AS SELECT * FROM fed_stats_src")
    spark.sql("ANALYZE TABLE fed_spec.t_stats COMPUTE STATISTICS FOR ALL COLUMNS")
    val desc = spark.sql("DESCRIBE TABLE EXTENDED fed_spec.t_stats")
      .collect().map(r => r.getString(0) + "|" + r.getString(1)).mkString("\n")
    assert(desc.contains("Statistics"), s"no table stats in:\n$desc")
    assert(desc.contains("3 rows"), s"row count missing in:\n$desc")
    val colStats = spark.sql("DESCRIBE EXTENDED fed_spec.t_stats id")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(colStats.get("distinct_count").exists(_.trim == "3"), s"col stats: $colStats")
  }

  test("JDBC round-trip against embedded Derby with filter pushdown") {
    val url = "jdbc:derby:memory:fedspec;create=true"
    Seq((1L, "aa"), (2L, "bb"), (3L, "cc")).toDF("id", "name")
      .write.format("jdbc")
      .option("url", url).option("dbtable", "T_J")
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      .mode("overwrite").save()
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "T_J")
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      .load()
      .filter(col("id") >= 2)
    // the filter must reach the JDBC source, not run in Spark
    val explained = back.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(explained.contains("PushedFilters") && explained.contains("id"),
      s"JDBC filter not pushed:\n$explained")
    assert(back.orderBy("id").select("name").as[String].collect().toSeq == Seq("bb", "cc"))
  }

  test("JDBC V2 catalog pushes whole aggregates and limits to the source") {
    val url = "jdbc:derby:memory:fedspecv2;create=true"
    Seq((1L, 10L, "a"), (2L, 10L, "b"), (3L, 20L, "c"), (4L, 20L, "d"), (5L, 20L, "e"))
      .toDF("id", "grp", "name")
      .write.format("jdbc")
      .option("url", url).option("dbtable", "T_AGG")
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      // Derby maps StringType to CLOB by default, which it refuses to
      // MAX over — remote aggregation needs a comparable column type
      .option("createTableColumnTypes", "name VARCHAR(64)")
      .mode("overwrite").save()
    spark.conf.set("spark.sql.catalog.fedspec_jdbc",
      "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog")
    spark.conf.set("spark.sql.catalog.fedspec_jdbc.url", url)
    spark.conf.set("spark.sql.catalog.fedspec_jdbc.driver",
      "org.apache.derby.jdbc.EmbeddedDriver")
    spark.conf.set("spark.sql.catalog.fedspec_jdbc.pushDownAggregate", "true")
    spark.conf.set("spark.sql.catalog.fedspec_jdbc.pushDownLimit", "true")
    val agg = spark.sql(
      """SELECT grp, count(*) AS n, max(name) AS mx
        |FROM fedspec_jdbc.APP.T_AGG GROUP BY grp ORDER BY grp""".stripMargin)
    val explained = agg.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(explained.contains("PushedAggregates"),
      s"aggregate not pushed to JDBC source:\n$explained")
    assert(explained.contains("PushedGroupByExpressions"),
      s"grouping not pushed to JDBC source:\n$explained")
    assert(agg.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq ==
      Seq((10L, 2L, "b"), (20L, 3L, "e")))
    // LIMIT cannot push to Derby — Spark's DerbyDialect has no limit
    // clause (Derby wants FETCH FIRST, dialect returns ""), so assert the
    // query still answers correctly through the unpushed path
    val lim = spark.sql("SELECT id FROM fedspec_jdbc.APP.T_AGG LIMIT 2")
    assert(lim.count() == 2)
  }

  test("JDBC V2 catalog pushes a whole JOIN subtree: one remote scan, one remote SQL") {
    import spark.implicits._
    org.apache.spark.sql.jdbc.GraftDerbyJoinDialect.ensureRegistered
    val url = "jdbc:derby:memory:fedspecjoin;create=true"
    def save(df: org.apache.spark.sql.DataFrame, table: String, types: String): Unit =
      df.write.format("jdbc")
        .option("url", url).option("dbtable", table)
        .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
        .option("createTableColumnTypes", types)
        .mode("overwrite").save()
    save(Seq((1L, 10L, "a1"), (2L, 20L, "a2"), (3L, 10L, "a3"))
      .toDF("id", "fk", "name"), "T_FACT", "name VARCHAR(64)")
    save(Seq((10L, "dim10"), (20L, "dim20"), (30L, "dim30"))
      .toDF("pk", "label"), "T_DIM", "label VARCHAR(64)")
    spark.conf.set("spark.sql.catalog.fedspec_join",
      "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog")
    spark.conf.set("spark.sql.catalog.fedspec_join.url", url)
    spark.conf.set("spark.sql.catalog.fedspec_join.driver",
      "org.apache.derby.jdbc.EmbeddedDriver")
    spark.conf.set("spark.sql.optimizer.datasourceV2JoinPushdown", "true")
    val q = spark.sql(
      """SELECT f.id, f.name, d.label
        |FROM fedspec_join.APP.T_FACT f
        |JOIN fedspec_join.APP.T_DIM d ON f.fk = d.pk
        |ORDER BY f.id""".stripMargin)
    val explained = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // ONE scan node carrying the pushed join — no Spark-side join at all
    assert(explained.contains("PushedJoins"),
      s"join not pushed to the JDBC source:\n$explained")
    assert(!explained.contains("SortMergeJoin") &&
      !explained.contains("BroadcastHashJoin") &&
      !explained.contains("ShuffledHashJoin"),
      s"a Spark-side join remains in the plan:\n$explained")
    assert(explained.contains("T_FACT") && explained.contains("T_DIM"),
      s"both relations must appear inside the single pushed scan:\n$explained")
    // values unchanged through the remote join
    assert(q.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq ==
      Seq((1L, "a1", "dim10"), (2L, "a2", "dim20"), (3L, "a3", "dim10")))
  }
}
