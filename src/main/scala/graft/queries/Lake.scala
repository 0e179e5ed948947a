package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.sources.SnapshotTable

/** Oracle-checked queries over the graft-lake snapshot table format
  * (SnapshotTable.scala; reference Iceberg scan
  * `exec/store/iceberg/IcebergScanPrel.java:96`). Each query builds a lake
  * table in a fresh temp dir from fixture data, runs commits through the
  * log, and returns a result DuckDB can reproduce from the raw fixture —
  * so MERGE semantics, time travel, and incremental scans are all
  * hash-gated, not just spec-asserted.
  */
object Lake {

  /** Stable per-JVM scratch dir for a named lake fixture: re-runs (bench
    * does 3 interleaved passes) wipe and reuse the same path instead of
    * leaking a fresh `graft_lake_*` temp dir per invocation, and the whole
    * root is removed on JVM exit.
    *
    * NOT safe for CONCURRENT invocations of the same named query in one
    * JVM (the wipe would race a mid-flight run) — acceptable because the
    * registered queries are a sequential verification/bench corpus, not a
    * serving surface; the bench and Verify both run them one at a time. */
  def scratchDir(name: String): String = {
    val p = ScratchRoot.resolve(name)
    if (Files.exists(p)) deleteTree(p)
    Files.createDirectories(p)
    p.toString
  }

  private lazy val ScratchRoot: java.nio.file.Path = {
    val root = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"),
      s"graft_lake_scratch_${ProcessHandle.current.pid}")
    Files.createDirectories(root)
    sys.addShutdownHook(deleteTree(root))
    root
  }

  private def deleteTree(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator.asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    }

  /** MERGE-by-key through the snapshot log, driven entirely by SQL text
    * (`MERGE INTO LAKE ... KEY ... USING <query>`, the reference's MERGE
    * statement surface — `Parser.tdd:624`): update every 10th customer's
    * balance, insert a shifted copy of the first 50 keys, keep the rest. */
  val lakeMergeByKey: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val base = t.customer
      .select(col("c_custkey"), col("c_name"), dbl(money(col("c_acctbal"))).as("bal"))
    val upd = t.customer.filter(col("c_custkey") % 10 === 0)
      .select(col("c_custkey"), col("c_name"),
        dbl(money(col("c_acctbal")) + 100).as("bal"))
    val ins = t.customer.filter(col("c_custkey") <= 50)
      .select((col("c_custkey") + 10000000L).as("c_custkey"), col("c_name"),
        dbl(money(col("c_acctbal"))).as("bal"))
    val lakeDir = scratchDir("graft_lake_merge")
    SnapshotTable.create(s, lakeDir, base)
    upd.unionByName(ins).createOrReplaceTempView("lake_merge_delta")
    s.sql(s"MERGE INTO LAKE '$lakeDir' KEY c_custkey USING SELECT * FROM lake_merge_delta")
    s.sql(s"CREATE LAKE VIEW lake_merge_v FROM '$lakeDir'")
    s.sql("SELECT c_custkey, c_name, bal FROM lake_merge_v ORDER BY c_custkey")
  }
  val lakeMergeByKeySql: String = """
    WITH base AS (
      SELECT c_custkey, c_name,
             CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS bal
      FROM customer),
    upd AS (
      SELECT c_custkey, c_name,
             CAST(CAST(c_acctbal AS DECIMAL(12,2)) + 100 AS DOUBLE) AS bal
      FROM customer WHERE c_custkey % 10 = 0),
    ins AS (
      SELECT c_custkey + 10000000 AS c_custkey, c_name,
             CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS bal
      FROM customer WHERE c_custkey <= 50)
    SELECT c_custkey, c_name, bal FROM (
      SELECT * FROM base WHERE c_custkey % 10 <> 0
      UNION ALL SELECT * FROM upd
      UNION ALL SELECT * FROM ins) m
    ORDER BY c_custkey"""

  /** ANSI clause MERGE through SQL (reference SqlMergeIntoTable /
    * Iceberg copy-on-write MERGE): one statement deletes matched
    * negative-delta customers, adds the delta to the rest of the matched
    * set, and inserts the unmatched rows — first-clause-wins semantics,
    * hash-gated against DuckDB. */
  val lakeMergeClauses: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val base = t.customer
      .select(col("c_custkey"), col("c_name"), dbl(money(col("c_acctbal"))).as("bal"))
    // matched rows carry the clause selector in bal: %10 keys go negative
    // (delete), the rest of the %5 keys carry +10 (update adds it)
    val upd = t.customer.filter(col("c_custkey") % 5 === 0)
      .select(col("c_custkey"), col("c_name"),
        when(col("c_custkey") % 10 === 0, lit(-1.0)).otherwise(lit(10.0)).as("bal"))
    val ins = t.customer.filter(col("c_custkey") <= 30)
      .select((col("c_custkey") + 20000000L).as("c_custkey"), col("c_name"),
        dbl(money(col("c_acctbal"))).as("bal"))
    val lakeDir = scratchDir("graft_lake_clauses")
    SnapshotTable.create(s, lakeDir, base)
    upd.unionByName(ins).createOrReplaceTempView("lake_clause_delta")
    s.sql(
      s"""MERGE INTO LAKE '$lakeDir' ON c_custkey
         |USING (SELECT * FROM lake_clause_delta)
         |WHEN MATCHED AND s.bal < 0 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET bal =
         |  CAST(CAST(t.bal AS DECIMAL(12,2)) + CAST(s.bal AS DECIMAL(12,2)) AS DOUBLE)
         |WHEN NOT MATCHED THEN INSERT""".stripMargin)
    s.sql(s"CREATE LAKE VIEW lake_clause_v FROM '$lakeDir'")
    s.sql("SELECT c_custkey, c_name, bal FROM lake_clause_v ORDER BY c_custkey")
  }
  val lakeMergeClausesSql: String = """
    WITH base AS (
      SELECT c_custkey, c_name,
             CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS bal
      FROM customer),
    merged AS (
      SELECT c_custkey, c_name,
             CASE WHEN c_custkey % 5 = 0
                  THEN CAST(CAST(bal AS DECIMAL(12,2)) + CAST(10.0 AS DECIMAL(12,2)) AS DOUBLE)
                  ELSE bal END AS bal
      FROM base WHERE c_custkey % 10 <> 0),
    ins AS (
      SELECT c_custkey + 20000000 AS c_custkey, c_name,
             CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS bal
      FROM customer WHERE c_custkey <= 30)
    SELECT c_custkey, c_name, bal FROM (
      SELECT * FROM merged UNION ALL SELECT * FROM ins) m
    ORDER BY c_custkey"""

  /** Row-level CDC (SnapshotTable.changesBetween — Delta CDF / Iceberg
    * changelog surface): DELETE + UPDATE through SQL DML, then read the
    * change feed across both commits; an update shows as delete(old) +
    * insert(new), all hash-gated against DuckDB. */
  val lakeChanges: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val base = t.supplier
      .select(col("s_suppkey"), col("s_nationkey"), dbl(money(col("s_acctbal"))).as("bal"))
    val lakeDir = scratchDir("graft_lake_cdc")
    SnapshotTable.create(s, lakeDir, base)
    s.sql(s"DELETE FROM LAKE '$lakeDir' WHERE bal < 0")
    s.sql(s"""UPDATE LAKE '$lakeDir' SET bal =
             |CAST(CAST(bal AS DECIMAL(12,2)) + 50 AS DOUBLE)
             |WHERE s_nationkey = 3""".stripMargin)
    s.sql(s"CREATE LAKE CHANGES VIEW lake_cdc_v FROM '$lakeDir' BETWEEN 1 AND 3")
    s.sql("""SELECT s_suppkey, s_nationkey, bal, _change_type FROM lake_cdc_v
            |ORDER BY s_suppkey, _change_type""".stripMargin)
  }
  val lakeChangesSql: String = """
    WITH base AS (
      SELECT s_suppkey, s_nationkey,
             CAST(CAST(s_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS bal
      FROM supplier)
    SELECT s_suppkey, s_nationkey, bal, _change_type FROM (
      SELECT s_suppkey, s_nationkey, bal, 'delete' AS _change_type
      FROM base WHERE bal < 0
      UNION ALL
      SELECT s_suppkey, s_nationkey, bal, 'delete' AS _change_type
      FROM base WHERE bal >= 0 AND s_nationkey = 3
      UNION ALL
      SELECT s_suppkey, s_nationkey,
             CAST(CAST(bal AS DECIMAL(12,2)) + 50 AS DOUBLE) AS bal,
             'insert' AS _change_type
      FROM base WHERE bal >= 0 AND s_nationkey = 3) c
    ORDER BY s_suppkey, _change_type"""

  /** Write-audit-publish through branch SQL (reference Nessie-style
    * versioning, `versionSupport.ftl:126`): stage an append on a branch
    * (invisible to main), audit it, fast-forward merge, read the merged
    * table — all hash-gated against DuckDB computing the same final
    * state from the raw fixture. */
  val lakeBranchWap: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val base = t.nation.select(col("n_nationkey"), col("n_name"))
    val lakeDir = scratchDir("graft_lake_wap")
    SnapshotTable.create(s, lakeDir, base)
    s.sql(s"CREATE BRANCH staging FROM LAKE '$lakeDir'")
    t.region.select((col("r_regionkey") + 100L).as("n_nationkey"),
        concat(lit("REGION-"), col("r_name")).as("n_name"))
      .createOrReplaceTempView("lake_wap_delta")
    s.sql(s"INSERT INTO LAKE '$lakeDir' AT BRANCH staging " +
      "SELECT n_nationkey, n_name FROM lake_wap_delta")
    // audit gate: main must not see the staged rows yet
    val mainCount = SnapshotTable.forPath(s, lakeDir).read().count()
    require(mainCount == base.count(), s"staged rows leaked to main: $mainCount")
    s.sql(s"MERGE BRANCH staging INTO LAKE '$lakeDir'")
    s.sql(s"CREATE LAKE VIEW lake_wap_v FROM '$lakeDir'")
    s.sql("SELECT n_nationkey, n_name FROM lake_wap_v ORDER BY n_nationkey")
  }
  val lakeBranchWapSql: String = """
    SELECT n_nationkey, n_name FROM (
      SELECT n_nationkey, n_name FROM nation
      UNION ALL
      SELECT r_regionkey + 100 AS n_nationkey,
             'REGION-' || r_name AS n_name
      FROM region) m
    ORDER BY n_nationkey"""

  /** Diverged-base three-way merge (reference Nessie merge,
    * `versionSupport.ftl:589`): the branch stages a DELETE and an append,
    * MAIN takes a concurrent append past the fork base, and MERGE BRANCH
    * still publishes — the two sides' file diffs commute (disjoint
    * removal sets), so the merged table carries the branch's deletion,
    * the branch's rows, AND main's rows. Hash-gated against DuckDB
    * computing the same final state from the raw fixtures. */
  val lakeBranchMerge3: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val base = t.nation.select(col("n_nationkey"), col("n_name"))
    val lakeDir = scratchDir("graft_lake_merge3")
    SnapshotTable.create(s, lakeDir, base)
    s.sql(s"CREATE BRANCH etl FROM LAKE '$lakeDir'")
    // branch-side copy-on-write DML: invisible to main until the merge
    SnapshotTable.forPath(s, lakeDir)
      .deleteFromBranch("etl", col("n_nationkey") >= 20)
    t.region.select((col("r_regionkey") + 100L).as("n_nationkey"),
        concat(lit("ETL-"), col("r_name")).as("n_name"))
      .createOrReplaceTempView("lake_merge3_etl")
    s.sql(s"INSERT INTO LAKE '$lakeDir' AT BRANCH etl " +
      "SELECT n_nationkey, n_name FROM lake_merge3_etl")
    // concurrent ingest on MAIN moves the head past the fork base
    t.region.select((col("r_regionkey") + 200L).as("n_nationkey"),
        concat(lit("MAIN-"), col("r_name")).as("n_name"))
      .createOrReplaceTempView("lake_merge3_main")
    s.sql(s"INSERT INTO LAKE '$lakeDir' " +
      "SELECT n_nationkey, n_name FROM lake_merge3_main")
    require(SnapshotTable.forPath(s, lakeDir).read().count() ==
      base.count() + 5, "main head should have only its own append")
    s.sql(s"MERGE BRANCH etl INTO LAKE '$lakeDir'")
    s.sql(s"CREATE LAKE VIEW lake_merge3_v FROM '$lakeDir'")
    s.sql("SELECT n_nationkey, n_name FROM lake_merge3_v ORDER BY n_nationkey")
  }
  val lakeBranchMerge3Sql: String = """
    SELECT n_nationkey, n_name FROM (
      SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 20
      UNION ALL
      SELECT r_regionkey + 100 AS n_nationkey,
             'ETL-' || r_name AS n_name FROM region
      UNION ALL
      SELECT r_regionkey + 200 AS n_nationkey,
             'MAIN-' || r_name AS n_name FROM region) m
    ORDER BY n_nationkey"""

  /** Session version context (reference SqlUseVersion — USE BRANCH): pin
    * the session to a branch, insert WITHOUT an AT clause (routes to the
    * branch), and scan WITHOUT an AT clause (reads the branch). The main
    * head is audited untouched mid-query, then the session is unpinned and
    * the branch published — final state hash-gated against DuckDB. */
  val lakeSessionRef: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val base = t.nation.select(col("n_nationkey"), col("n_name"))
    val lakeDir = scratchDir("graft_lake_useref")
    SnapshotTable.create(s, lakeDir, base)
    s.sql(s"CREATE BRANCH dev FROM LAKE '$lakeDir'")
    s.sql(s"USE BRANCH dev IN LAKE '$lakeDir'")
    try {
      t.region.select((col("r_regionkey") + 200L).as("n_nationkey"),
          concat(lit("DEV-"), col("r_name")).as("n_name"))
        .createOrReplaceTempView("lake_useref_delta")
      // no AT clause anywhere below: the session pin does the routing
      s.sql(s"INSERT INTO LAKE '$lakeDir' " +
        "SELECT n_nationkey, n_name FROM lake_useref_delta")
      val mainCount = SnapshotTable.forPath(s, lakeDir).read().count()
      require(mainCount == base.count(), s"session insert leaked to main: $mainCount")
      s.sql(s"SELECT n_nationkey, n_name FROM lake_scan('$lakeDir') " +
        "ORDER BY n_nationkey")
    } finally s.sql(s"USE DEFAULT IN LAKE '$lakeDir'")
  }
  val lakeSessionRefSql: String = """
    SELECT n_nationkey, n_name FROM (
      SELECT n_nationkey, n_name FROM nation
      UNION ALL
      SELECT r_regionkey + 200 AS n_nationkey,
             'DEV-' || r_name AS n_name
      FROM region) m
    ORDER BY n_nationkey"""

  /** VERSION AS OF: v1 = full nation, v2 overwrites with a filtered set;
    * reading v1 must still return the original rows (time travel). */
  val lakeTimeTravel: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val v1 = t.nation.select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    val lakeDir = scratchDir("graft_lake_tt")
    val table = SnapshotTable.create(s, lakeDir, v1)
    table.overwrite(v1.filter(col("n_regionkey") =!= 0))
    table.asOf(1L).orderBy(col("n_nationkey"))
  }
  val lakeTimeTravelSql: String = """
    SELECT n_nationkey, n_name, n_regionkey
    FROM nation ORDER BY n_nationkey"""

  /** Incremental scan: two appends, read only the second commit's rows
    * (the incremental-refresh read path). */
  val lakeIncrementalScan: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val c = t.customer.select(col("c_custkey"), col("c_mktsegment"))
    val lakeDir = scratchDir("graft_lake_inc")
    val table = SnapshotTable.forPath(s, lakeDir)
    table.append(c.filter(col("c_custkey") <= 100))
    val v2 = table.append(c.filter(col("c_custkey") > 100 && col("c_custkey") <= 250))
    table.changes(v2 - 1, v2).orderBy(col("c_custkey"))
  }
  val lakeIncrementalScanSql: String = """
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE c_custkey > 100 AND c_custkey <= 250 ORDER BY c_custkey"""

  /** DELETE WHERE + UPDATE SET through the snapshot log (copy-on-write
    * row-level DML): delete low-balance suppliers, raise one nation's
    * balances, read the final state. */
  val lakeDeleteUpdate: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val base = t.supplier
      .select(col("s_suppkey"), col("s_nationkey"), dbl(money(col("s_acctbal"))).as("bal"))
    val lakeDir = scratchDir("graft_lake_dml")
    val table = SnapshotTable.create(s, lakeDir, base)
    table.deleteWhere(col("bal") < 0)
    table.updateWhere(col("s_nationkey") === 3,
      Map("bal" -> dbl(money(col("bal")) + 50)))
    table.read().orderBy(col("s_suppkey"))
  }
  val lakeDeleteUpdateSql: String = """
    WITH kept AS (
      SELECT s_suppkey, s_nationkey,
             CAST(CAST(s_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS bal
      FROM supplier
      WHERE NOT (CAST(CAST(s_acctbal AS DECIMAL(12,2)) AS DOUBLE) < 0))
    SELECT s_suppkey, s_nationkey,
           CASE WHEN s_nationkey = 3
                THEN CAST(CAST(bal AS DECIMAL(12,2)) + 50 AS DOUBLE)
                ELSE bal END AS bal
    FROM kept ORDER BY s_suppkey"""

  /** Manifest-pruned range scan, driven entirely through plain SQL: the
    * WHERE reaches LakeFileIndex at plan time and prunes the range-clustered
    * files from commit stats — no scanRange() opt-in (the everyday path the
    * reference serves with PruneScanRuleBase). SnapshotTableSpec pins the
    * plan shape (1 of 4 files read); this entry pins the results. */
  val lakePrunedScan: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val lakeDir = scratchDir("graft_lake_stats")
    val table = SnapshotTable.forPath(s, lakeDir)
    table.appendWithStats(
      t.customer.select(col("c_custkey"), col("c_mktsegment"))
        .repartitionByRange(8, col("c_custkey")),
      Seq("c_custkey"))
    s.sql(s"CREATE LAKE VIEW lake_pruned_v FROM '$lakeDir'")
    s.sql("""SELECT c_custkey, c_mktsegment FROM lake_pruned_v
            |WHERE c_custkey >= 100 AND c_custkey <= 200
            |ORDER BY c_custkey""".stripMargin)
  }
  val lakePrunedScanSql: String = """
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE c_custkey >= 100 AND c_custkey <= 200 ORDER BY c_custkey"""

  /** Partition-transform pruning through plain SQL (Iceberg partition-spec
    * model; reference PruneScanRuleBase's transform handling): orders are
    * written year-partitioned + custkey-bucketed, and a WHERE on the SOURCE
    * columns prunes whole partitions at plan time. SnapshotTableSpec pins
    * the pruned file counts; this entry pins the results. */
  val lakePartitionedScan: QueryFn = (s, dir) => {
    Tables.ensure(s, dir)
    val lakeDir = scratchDir("graft_lake_part")
    // partitioned CTAS driven entirely by SQL text
    s.sql(s"""CREATE LAKE '$lakeDir'
             |PARTITION BY (year(o_orderdate), bucket(4,o_custkey))
             |AS SELECT o_orderkey, o_custkey, o_orderdate,
             |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price
             |FROM orders""".stripMargin)
    s.sql(s"CREATE LAKE VIEW lake_part_q_v FROM '$lakeDir'")
    s.sql("""SELECT o_orderkey, o_custkey, o_orderdate, price FROM lake_part_q_v
            |WHERE o_orderdate >= DATE'1996-01-01' AND o_orderdate <= DATE'1996-12-31'
            |ORDER BY o_orderkey""".stripMargin)
  }
  val lakePartitionedScanSql: String = """
    SELECT o_orderkey, o_custkey, o_orderdate,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price
    FROM orders
    WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate <= DATE '1996-12-31'
    ORDER BY o_orderkey"""

  /** Per-partition totals straight from the manifest (reference
    * `table_partitions(..)`, `MetadataFunctionsMacro.java:40`): the
    * row counts come from the commit log's per-file stats — ZERO data
    * reads — and must equal DuckDB grouping the raw fixture. */
  val lakePartitionsMeta: QueryFn = (s, dir) => {
    Tables.ensure(s, dir)
    val lakeDir = scratchDir("graft_lake_partmeta")
    s.sql(s"""CREATE LAKE '$lakeDir' PARTITION BY (identity(o_orderpriority))
             |AS SELECT o_orderkey, o_orderpriority FROM orders""".stripMargin)
    s.sql(s"""SELECT partition['o_orderpriority'] AS o_orderpriority,
             |  row_count
             |FROM lake_partitions('$lakeDir')
             |ORDER BY o_orderpriority""".stripMargin)
  }
  val lakePartitionsMetaSql: String = """
    SELECT o_orderpriority, count(*) AS row_count
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  /** Metadata COUNT(*): two appends and a copy-on-write DELETE, then a
    * bare count answered from the manifest `__rows` entries with no scan
    * (plans.CountFromManifest; reference CountOnScanToValuesRule,
    * PlannerPhase.java:337). The oracle recomputes the same count from
    * the fixture, so the manifest numbers — written at commit, carried by
    * reference through DML — are hash-gated against real data. */
  val lakeCountMeta: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val lakeDir = scratchDir("graft_lake_count")
    val lake = SnapshotTable.create(s, lakeDir,
      t.orders.filter(col("o_orderkey") % 2 === 0))
    lake.append(t.orders.filter(col("o_orderkey") % 2 === 1))
    lake.deleteWhere(col("o_orderstatus") === "F")
    s.sql(s"CREATE LAKE VIEW lake_count_v FROM '$lakeDir'")
    s.sql("SELECT COUNT(*) AS n_rows FROM lake_count_v")
  }
  val lakeCountMetaSql: String =
    "SELECT COUNT(*) AS n_rows FROM orders WHERE o_orderstatus <> 'F'"

  /** Inline lake relation through the `lake_scan` table function: query a
    * lake table (and a time-travel snapshot of it) straight from a FROM
    * clause — the reference's query-on-path surface (`dfs."/path"`,
    * FormatCreator). Version-1 row count rides along as a scalar subquery,
    * so both the current and the historical snapshot are hash-gated. */
  val lakeScanTvf: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val lakeDir = scratchDir("graft_lake_scantvf")
    SnapshotTable.create(s, lakeDir,
      t.supplier.select(col("s_suppkey"), col("s_nationkey"),
        dbl(money(col("s_acctbal"))).as("bal")))
    s.sql(s"INSERT INTO LAKE '$lakeDir' " +
      "SELECT s_suppkey + 1000000 AS s_suppkey, s_nationkey, " +
      "CAST(CAST(s_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS bal " +
      "FROM supplier WHERE s_suppkey <= 100")
    s.sql(
      s"""SELECT s.s_suppkey, s.s_nationkey, s.bal,
         |       (SELECT count(*) FROM lake_scan('$lakeDir', 1)) AS n_v1
         |FROM lake_scan('$lakeDir') s
         |WHERE s.s_suppkey % 7 = 0
         |ORDER BY s.s_suppkey""".stripMargin)
  }
  val lakeScanTvfSql: String = """
    WITH lake AS (
      SELECT s_suppkey, s_nationkey,
             CAST(CAST(s_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS bal
      FROM supplier
      UNION ALL
      SELECT s_suppkey + 1000000, s_nationkey,
             CAST(CAST(s_acctbal AS DECIMAL(12,2)) AS DOUBLE)
      FROM supplier WHERE s_suppkey <= 100)
    SELECT s_suppkey, s_nationkey, bal,
           (SELECT count(*) FROM supplier) AS n_v1
    FROM lake WHERE s_suppkey % 7 = 0 ORDER BY s_suppkey"""

  /** Metadata MIN/MAX/COUNT: stats-covered lake table built from orders
    * (two commits + a copy-on-write DELETE), then a bare extremum query
    * answered from the manifest's per-file min/max (plans.CountFromManifest;
    * the Iceberg-style aggregate-from-metadata extension of the reference's
    * CountOnScanToValuesRule). The oracle recomputes the same extrema from
    * the fixture, so manifest stats — written at commit, re-recorded
    * through DML — are hash-gated against real data. */
  val lakeMinmaxMeta: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val lakeDir = scratchDir("graft_lake_minmax")
    t.orders.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      .createOrReplaceTempView("lake_minmax_src_even")
    t.orders.filter(col("o_orderkey") % 2 === 1)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      .createOrReplaceTempView("lake_minmax_src_odd")
    s.sql(s"CREATE LAKE '$lakeDir' STATS (o_custkey, o_orderdate) AS " +
      "SELECT * FROM lake_minmax_src_even")
    s.sql(s"INSERT INTO LAKE '$lakeDir' SELECT * FROM lake_minmax_src_odd")
    s.sql(s"DELETE FROM LAKE '$lakeDir' WHERE o_custkey < 100")
    s.sql(s"CREATE LAKE VIEW lake_minmax_v FROM '$lakeDir'")
    s.sql("""SELECT min(o_custkey) AS mn_c, max(o_custkey) AS mx_c,
            |       min(o_orderdate) AS mn_d, max(o_orderdate) AS mx_d,
            |       count(*) AS n
            |FROM lake_minmax_v""".stripMargin)
  }
  val lakeMinmaxMetaSql: String = """
    SELECT min(o_custkey) AS mn_c, max(o_custkey) AS mx_c,
           min(o_orderdate) AS mn_d, max(o_orderdate) AS mx_d,
           count(*) AS n
    FROM orders WHERE o_custkey >= 100"""

  /** Co-located join over co-bucketed lake tables: both sides are written
    * PARTITION BY (bucket(8, custkey)), so their scans report
    * HashPartitioning(custkey, 8) and the join + per-customer aggregation
    * plan with zero exchanges (BucketedLakeSpec pins the plan shape; this
    * query hash-gates the VALUES the shuffle-free plan produces against
    * DuckDB's plain join). The 100 TB path: the one big fact-to-fact
    * shuffle is paid once at write time, then every join on the bucket
    * key skips it (reference: hash-distribution elision,
    * `exec/planner/physical/HashToRandomExchangePrel.java`). */
  val lakeBucketJoin: QueryFn = (s, dir) => {
    Tables.ensure(s, dir)
    val cd = scratchDir("graft_lake_bkt_c")
    val od = scratchDir("graft_lake_bkt_o")
    s.sql(s"""CREATE LAKE '$cd' PARTITION BY (bucket(8,c_custkey))
             |AS SELECT c_custkey, c_name FROM customer""".stripMargin)
    s.sql(s"""CREATE LAKE '$od' PARTITION BY (bucket(8,o_custkey))
             |AS SELECT o_orderkey, o_custkey,
             |  CAST(o_totalprice AS DECIMAL(12,2)) AS price
             |FROM orders""".stripMargin)
    s.sql(s"CREATE LAKE VIEW lake_bkt_c FROM '$cd'")
    s.sql(s"CREATE LAKE VIEW lake_bkt_o FROM '$od'")
    s.sql("""SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
            |  CAST(SUM(price) AS DOUBLE) AS total
            |FROM lake_bkt_c c JOIN lake_bkt_o o ON c.c_custkey = o.o_custkey
            |GROUP BY c_custkey, c_name
            |ORDER BY c_custkey""".stripMargin)
  }
  val lakeBucketJoinSql: String = """
    SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c_custkey, c_name
    ORDER BY c_custkey"""

  /** Interop export round trip: lake table (with a DELETE so the snapshot
    * differs from the raw fixture) → EXPORT LAKE (hive-partitioned parquet
    * + Iceberg v2 metadata tree) → read back with PLAIN `spark.read.parquet`
    * — no graft code on the read path — and hash-gate against DuckDB on the
    * raw fixture. Proves any engine can consume the exported data
    * (reference `exec/store/iceberg/` interop surface; LakeExportSpec
    * additionally checks the avro manifests). */
  val lakeExport: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val base = t.supplier.select(col("s_suppkey"), col("s_name"),
      col("s_nationkey"), dbl(money(col("s_acctbal"))).as("bal"))
    val lakeDir = scratchDir("graft_lake_exp_src")
    SnapshotTable.create(s, lakeDir, base)
    s.sql(s"DELETE FROM LAKE '$lakeDir' WHERE bal < 0")
    val expDir = scratchDir("graft_lake_exp_dst") + "/tree"
    s.sql(s"EXPORT LAKE '$lakeDir' TO '$expDir' PARTITION BY (s_nationkey)")
    s.read.parquet(s"$expDir/data")
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"), col("bal"))
      .orderBy(col("s_suppkey"))
  }
  val lakeExportSql: String = """
    SELECT s_suppkey, s_name, s_nationkey,
           CAST(CAST(s_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS bal
    FROM supplier
    WHERE CAST(CAST(s_acctbal AS DECIMAL(12,2)) AS DOUBLE) >= 0
    ORDER BY s_suppkey"""

  /** Iceberg interop READ leg: lake snapshot → EXPORT LAKE (Iceberg v2
    * metadata tree) → read back THROUGH the metadata tree with the
    * `iceberg_scan` TVF (manifest-list → manifests → file list; the
    * identity-partition column restored from manifest partition records,
    * since the hive-layout files omit it) — reference native Iceberg scan
    * `exec/store/iceberg/IcebergScanPrel.java:96`. */
  val icebergRead: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val base = t.supplier.select(col("s_suppkey"), col("s_name"),
      col("s_nationkey"), dbl(money(col("s_acctbal"))).as("bal"))
    val lakeDir = scratchDir("graft_iceberg_src")
    SnapshotTable.create(s, lakeDir, base)
    s.sql(s"DELETE FROM LAKE '$lakeDir' WHERE bal < 0")
    val expDir = scratchDir("graft_iceberg_dst") + "/tree"
    s.sql(s"EXPORT LAKE '$lakeDir' TO '$expDir' PARTITION BY (s_nationkey)")
    s.sql(s"""SELECT s_nationkey, COUNT(*) AS n_suppliers,
             |  CAST(SUM(CAST(bal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
             |FROM iceberg_scan('$expDir')
             |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin)
  }
  /** Iceberg v2 merge-on-read: export, compute the exact (file, position)
    * pairs of every supplier with s_suppkey % 7 = 0 FROM THE PUBLISHED
    * FILES (layout-independent — positions come from _metadata.row_index
    * at run time), publish them as position deletes, and read the table
    * back through the deletes. Hash-gated against DuckDB filtering the
    * raw fixture — the MOR subtraction must be value-exact. */
  val icebergPosDelete: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val base = t.supplier.select(col("s_suppkey"), col("s_name"),
      col("s_nationkey"), dbl(money(col("s_acctbal"))).as("bal"))
    val lakeDir = scratchDir("graft_iceberg_mor_src")
    SnapshotTable.create(s, lakeDir, base)
    val expDir = scratchDir("graft_iceberg_mor_dst") + "/tree"
    s.sql(s"EXPORT LAKE '$lakeDir' TO '$expDir'")
    val victims = s.read.parquet(s"$expDir/data")
      .selectExpr("_metadata.file_path AS fp", "_metadata.row_index AS pos",
        "s_suppkey")
      .filter(col("s_suppkey") % 7 === 0)
      .collect() // driver-small: |supplier|/7 rows of (path, long)
      .groupBy(_.getString(0)).map { case (f, rs) =>
        f.replaceFirst("^file:", "") -> rs.map(_.getLong(1)).toSeq
      }
    graft.sources.LakeExport.publishPositionDeletes(s, expDir, victims)
    s.sql(s"""SELECT s_nationkey, COUNT(*) AS n_suppliers,
             |  CAST(SUM(CAST(bal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
             |FROM iceberg_scan('$expDir')
             |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin)
  }
  val icebergPosDeleteSql: String = """
    SELECT s_nationkey, COUNT(*) AS n_suppliers,
           CAST(SUM(CAST(CAST(CAST(s_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
    FROM supplier
    WHERE s_suppkey % 7 <> 0
    GROUP BY s_nationkey ORDER BY s_nationkey"""

  val icebergReadSql: String = """
    SELECT s_nationkey, COUNT(*) AS n_suppliers,
           CAST(SUM(CAST(CAST(CAST(s_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
    FROM supplier
    WHERE CAST(CAST(s_acctbal AS DECIMAL(12,2)) AS DOUBLE) >= 0
    GROUP BY s_nationkey ORDER BY s_nationkey"""

  /** Delta interop round trip: lake snapshot → EXPORT LAKE FORMAT DELTA
    * (parquet + `_delta_log` commit 0 with add actions/stats) → read back
    * by REPLAYING the log with the `delta_scan` TVF, partition columns
    * restored from the log's partitionValues (Delta data files omit them)
    * — reference `exec/store/deltalake/DeltaLakeFormatPlugin.java`. */
  val deltaRoundtrip: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val base = t.orders.select(col("o_orderkey"), col("o_custkey"),
      col("o_orderpriority"), dbl(money(col("o_totalprice"))).as("price"))
    val lakeDir = scratchDir("graft_delta_src")
    SnapshotTable.create(s, lakeDir, base)
    s.sql(s"DELETE FROM LAKE '$lakeDir' WHERE o_orderkey % 7 = 0")
    val expDir = scratchDir("graft_delta_dst") + "/tbl"
    s.sql(s"EXPORT LAKE '$lakeDir' TO '$expDir' PARTITION BY (o_orderpriority) FORMAT DELTA")
    s.sql(s"""SELECT o_orderpriority, COUNT(*) AS n_orders,
             |  CAST(SUM(CAST(price AS DECIMAL(14,2))) AS DOUBLE) AS total_price
             |FROM delta_scan('$expDir')
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
  }
  /** Delta merge-on-read through DELETION VECTORS: export, compute the
    * exact (file, position) of every order with o_orderkey % 9 = 0 from
    * the published files at run time (layout-independent), publish them
    * as a DV commit (Z85 path, RoaringBitmapArray bitmap, CRC framing),
    * and read the table back through the vectors — hash-gated vs DuckDB
    * filtering the raw fixture. */
  val deltaDvRead: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val base = t.orders.select(col("o_orderkey"), col("o_custkey"),
      col("o_orderpriority"), dbl(money(col("o_totalprice"))).as("price"))
    val lakeDir = scratchDir("graft_delta_dv_src")
    SnapshotTable.create(s, lakeDir, base)
    val expDir = scratchDir("graft_delta_dv_dst") + "/tbl"
    graft.sources.DeltaInterop.exportTo(s, lakeDir, expDir)
    val st = graft.sources.DeltaInterop.readState(s, expDir)
    // absolute scan path (scheme-normalized) → log-relative path, so the
    // victim grouping is one hash lookup per row, not a linear scan of
    // the file list (O(victims×files) driver work otherwise)
    def norm(p: String) = p.replaceFirst("^(file:)?/+", "/")
    val relOf = st.files.map(f => norm(s"$expDir/${f.path}") -> f.path).toMap
    val victims = s.read.parquet(st.files.map(f => s"$expDir/${f.path}"): _*)
      .selectExpr("o_orderkey", "_metadata.file_path AS fp",
        "_metadata.row_index AS pos")
      .filter(col("o_orderkey") % 9 === 0)
      .collect() // driver-small: |orders|/9 descriptor rows
      .groupBy(r => relOf(norm(r.getString(1))))
      .map { case (p, rs) => p -> rs.map(_.getLong(2)).toSeq }
    graft.sources.DeltaInterop.publishDeletionVectors(s, expDir, victims)
    s.sql(s"""SELECT o_orderpriority, COUNT(*) AS n_orders,
             |  CAST(SUM(CAST(price AS DECIMAL(14,2))) AS DOUBLE) AS total_price
             |FROM delta_scan('$expDir')
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
  }
  val deltaDvReadSql: String = """
    SELECT o_orderpriority, COUNT(*) AS n_orders,
           CAST(SUM(CAST(CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS DECIMAL(14,2))) AS DOUBLE) AS total_price
    FROM orders
    WHERE o_orderkey % 9 <> 0
    GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  val deltaRoundtripSql: String = """
    SELECT o_orderpriority, COUNT(*) AS n_orders,
           CAST(SUM(CAST(CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS DECIMAL(14,2))) AS DOUBLE) AS total_price
    FROM orders
    WHERE o_orderkey % 7 <> 0
    GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  /** COUNT(DISTINCT) through the APPROXIMATE STATS opt-in (reference
    * SqlSetApprox → CountDistinctConvertlet): the table is flagged, so the
    * optimizer plans the distinct counts as HLL++ sketches — no Expand,
    * no second shuffle keyed on the values. The fixture columns' distinct
    * sets sit in the sketch's linear-counting range where the estimate IS
    * the exact count (value-set-dependent, not row-count-dependent, so it
    * holds at every SF — `ApproxStatsSpec` pins both the plan rewrite and
    * the exactness), which is what lets DuckDB's exact replay hash-match
    * an approximate plan. */
  val lakeApproxNdv: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val lakeDir = scratchDir("graft_lake_approx")
    val table = SnapshotTable.forPath(s, lakeDir)
    table.append(t.customer.select(
      col("c_custkey"), col("c_mktsegment"), col("c_nationkey")))
    s.sql(s"ALTER LAKE '$lakeDir' ENABLE APPROXIMATE STATS")
    s.sql(s"CREATE LAKE VIEW lake_approx_v FROM '$lakeDir'")
    s.sql("""SELECT c_nationkey % 5 AS grp,
            |  count(distinct c_mktsegment) AS ndv_seg,
            |  count(*) AS n_rows
            |FROM lake_approx_v
            |GROUP BY c_nationkey % 5 ORDER BY grp""".stripMargin)
  }
  val lakeApproxNdvSql: String = """
    SELECT c_nationkey % 5 AS grp,
           count(distinct c_mktsegment) AS ndv_seg,
           count(*) AS n_rows
    FROM customer GROUP BY 1 ORDER BY grp"""

  /** REFRESH DATASET end-to-end through the maintained file index
    * (reference SqlRefreshDataset): auto-promote a parquet folder, drop
    * a late file in (INVISIBLE — scans plan from the index, not a
    * listing), pick it up with a FILE-SCOPED refresh, and read the
    * reconciled dataset back. The oracle is plain `nation` — both
    * halves together are exactly the fixture. */
  val refreshDatasetScan: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    // repeated invocations (bench passes) must re-promote cleanly
    try s.sql("ALTER TABLE rds_nation FORGET METADATA")
    catch { case _: Exception => () }
    val scratch = scratchDir("graft_rfds_q")
    val base = s"$scratch/rds_nation"
    t.nation.filter(col("n_nationkey") < 20)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .coalesce(1).write.parquet(base)
    s.sql(s"REFRESH DATASET '$base' AUTO PROMOTION")
    // the late arrival lands as a FILE in the folder, bypassing the index
    val tmp = s"$scratch/late_stage"
    t.nation.filter(col("n_nationkey") >= 20)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(s"$base/late.parquet"))
    s.sql("REFRESH DATASET rds_nation FOR FILES ('late.parquet')")
    s.sql("""SELECT n_nationkey, n_name, n_regionkey FROM rds_nation
            |ORDER BY n_nationkey""".stripMargin)
  }
  val refreshDatasetScanSql: String = """
    SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey"""

  val queries: Map[String, QueryFn] = Map(
    "refresh_dataset_scan" -> refreshDatasetScan,
    "lake_approx_ndv" -> lakeApproxNdv,
    "iceberg_read" -> icebergRead,
    "iceberg_pos_delete" -> icebergPosDelete,
    "delta_roundtrip" -> deltaRoundtrip,
    "delta_dv_read" -> deltaDvRead,
    "lake_export" -> lakeExport,
    "lake_bucket_join" -> lakeBucketJoin,
    "lake_minmax_meta" -> lakeMinmaxMeta,
    "lake_scan_tvf" -> lakeScanTvf,
    "lake_count_meta" -> lakeCountMeta,
    "lake_pruned_scan" -> lakePrunedScan,
    "lake_partitioned_scan" -> lakePartitionedScan,
    "lake_partitions_meta" -> lakePartitionsMeta,
    "lake_delete_update" -> lakeDeleteUpdate,
    "lake_merge_by_key" -> lakeMergeByKey,
    "lake_merge_clauses" -> lakeMergeClauses,
    "lake_changes" -> lakeChanges,
    "lake_branch_wap" -> lakeBranchWap,
    "lake_branch_merge3" -> lakeBranchMerge3,
    "lake_session_ref" -> lakeSessionRef,
    "lake_time_travel" -> lakeTimeTravel,
    "lake_incremental_scan" -> lakeIncrementalScan)

  val oracle: Map[String, String] = Map(
    "iceberg_read" -> icebergReadSql,
    "iceberg_pos_delete" -> icebergPosDeleteSql,
    "delta_roundtrip" -> deltaRoundtripSql,
    "delta_dv_read" -> deltaDvReadSql,
    "lake_export" -> lakeExportSql,
    "lake_bucket_join" -> lakeBucketJoinSql,
    "lake_minmax_meta" -> lakeMinmaxMetaSql,
    "lake_scan_tvf" -> lakeScanTvfSql,
    "lake_count_meta" -> lakeCountMetaSql,
    "lake_approx_ndv" -> lakeApproxNdvSql,
    "refresh_dataset_scan" -> refreshDatasetScanSql,
    "lake_pruned_scan" -> lakePrunedScanSql,
    "lake_partitioned_scan" -> lakePartitionedScanSql,
    "lake_partitions_meta" -> lakePartitionsMetaSql,
    "lake_delete_update" -> lakeDeleteUpdateSql,
    "lake_merge_by_key" -> lakeMergeByKeySql,
    "lake_merge_clauses" -> lakeMergeClausesSql,
    "lake_changes" -> lakeChangesSql,
    "lake_branch_wap" -> lakeBranchWapSql,
    "lake_branch_merge3" -> lakeBranchMerge3Sql,
    "lake_session_ref" -> lakeSessionRefSql,
    "lake_time_travel" -> lakeTimeTravelSql,
    "lake_incremental_scan" -> lakeIncrementalScanSql)
}
