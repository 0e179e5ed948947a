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

  val queries: Map[String, QueryFn] = Map(
    "hive_catalog_nation" -> hiveCatalogNation,
    "jdbc_roundtrip" -> jdbcRoundtrip)

  val oracle: Map[String, String] = Map(
    "hive_catalog_nation" -> hiveCatalogNationSql,
    "jdbc_roundtrip" -> jdbcRoundtripSql)
}
