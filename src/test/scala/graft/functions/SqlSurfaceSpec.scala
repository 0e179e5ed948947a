package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SqlSurfaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("SQL UDF aliases expand at plan time") {
    Functions.registerAll(spark)
    val r = spark.sql("""
      SELECT charsubstring('hello world', 7, 5) AS a,
             strpos('hello', 'll') AS b,
             col_like('foobar', 'foo%') AS c,
             mask_hash('secret') AS d,
             mask_show_last_n('1234567890', 4) AS e""").head()
    assert(r.getString(0) == "world")
    assert(r.getInt(1) == 3)
    assert(r.getBoolean(2))
    assert(r.getString(3).length == 64)
    assert(r.getString(4).endsWith("7890"))
    assert(!r.getString(4).startsWith("123"))
  }

  test("geo SQL UDFs agree with the Column API implementation") {
    Functions.registerAll(spark)
    val viaSql = spark.sql(
      "SELECT geo_distance(48.8566, 2.3522, 51.5074, -0.1278) AS d").head().getDouble(0)
    assert(viaSql > 330000 && viaSql < 360000)
    assert(spark.sql(
      "SELECT geo_nearby(48.8566, 2.3522, 48.8570, 2.3530, 1000.0)").head().getBoolean(0))
  }

  test("joda pattern translation") {
    assert(JodaFormat.translate("YYYY-MM-dd") == "yyyy-MM-dd")
    assert(JodaFormat.translate("YYYY-MM-dd HH:mm:ss.SSS") == "yyyy-MM-dd HH:mm:ss.SSS")
    assert(JodaFormat.translate("'Year:' YYYY") == "'Year:' yyyy")
    assert(JodaFormat.translate("e YYYY") == "u yyyy")
  }

  test("to_date with joda pattern parses reference-style literals") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val d = Seq("2024/03/05").toDF("s")
      .select(JodaFormat.toDateJoda(col("s"), "YYYY/MM/dd")).head().getDate(0)
    assert(d.toString == "2024-03-05")
  }

  test("SHOW FUNCTIONS LIKE / DESCRIBE FUNCTION surface the SQL UDF registry") {
    // reference SqlShowFunctions (`SHOW FUNCTIONS [LIKE 'pattern']`) and
    // SqlDescribeFunction — served by Spark's native statements, which see
    // every CREATE FUNCTION the registry installs
    Functions.registerAll(spark)
    val shown = spark.sql("SHOW USER FUNCTIONS LIKE 'geo*'")
      .collect().map(_.getString(0)).toSet
    assert(Set("geo_distance", "geo_nearby", "geo_beyond").subsetOf(shown), shown.toString)
    val desc = spark.sql("DESCRIBE FUNCTION EXTENDED geo_distance")
      .collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("geo_distance"), desc)
    assert(desc.toLowerCase.contains("asin"), desc) // the SQL body is surfaced
    // a user-created function shows up immediately
    spark.sql("CREATE OR REPLACE TEMPORARY FUNCTION show_fn_probe(x INT) " +
      "RETURNS INT RETURN x + 41")
    assert(spark.sql("SHOW USER FUNCTIONS LIKE 'show_fn*'").count() == 1)
    assert(spark.sql("SELECT show_fn_probe(1)").head().getInt(0) == 42)
  }

  test("tabular SQL UDF is usable in a FROM clause") {
    Functions.registerAll(spark)
    // generic TVF from the registry
    val got = spark.sql("SELECT i FROM int_range(4) ORDER BY i")
      .collect().map(_.getInt(0)).toSeq
    assert(got == Seq(1, 2, 3, 4))
    // parameterized-view shape over a fixture table (reference
    // TabularUserDefinedFunctionExpanderRule: the body is expanded into the
    // calling plan, so pushdown/pruning still apply through the TVF)
    graft.engine.Tables.ensure(spark, TestSpark.sf)
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION nations_of(rk BIGINT)
      RETURNS TABLE(n_nationkey BIGINT, n_name STRING)
      RETURN SELECT n_nationkey, n_name FROM nation WHERE n_regionkey = rk""")
    val viaTvf = spark.sql(
      "SELECT n_name FROM nations_of(2) ORDER BY n_nationkey").collect().map(_.getString(0)).toSeq
    val direct = spark.sql(
      "SELECT n_name FROM nation WHERE n_regionkey = 2 ORDER BY n_nationkey")
      .collect().map(_.getString(0)).toSeq
    assert(viaTvf == direct && viaTvf.nonEmpty)
    // join through the TVF keeps resolving
    val joined = spark.sql("""
      SELECT r.r_name, count(*) AS n
      FROM region r JOIN nations_of(2) nv ON r.r_regionkey = 2
      GROUP BY r.r_name""").count()
    assert(joined == 1)
  }

  test("sys_reflections and sys_pipes expose registry state") {
    import java.nio.file.Files
    graft.engine.Tables.ensure(spark, TestSpark.sf)
    val dir = Files.createTempDirectory("graft_sysv").toString
    graft.accel.Reflections.create("sysv_r",
      spark.sql("SELECT n_regionkey, count(*) AS n FROM nation GROUP BY n_regionkey"),
      s"$dir/sysv_r")
    graft.streaming.Pipes.define(graft.streaming.Pipe("sysv_p", s"$dir/in", "json",
      org.apache.spark.sql.types.StructType.fromDDL("id BIGINT"), s"$dir/out", s"$dir/chk"))
    graft.catalog.InfoSchema.register(spark)
    val refl = spark.sql("SELECT name, path FROM sys_reflections").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(refl.exists { case (n, p) => n == "sysv_r" && p.endsWith("sysv_r") })
    val pipes = spark.sql("SELECT name, format FROM sys_pipes").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(pipes.contains(("sysv_p", "json")))
    val fns = spark.sql("SELECT name FROM sys_functions").collect()
      .map(_.getString(0)).toSet
    assert(fns.contains("cosine_sim") && fns.contains("geo_distance"),
      "registered engine functions must appear in sys_functions")
    graft.accel.Reflections.drop("sysv_r")
    graft.streaming.Pipes.drop("sysv_p")
  }

  test("sys_streams lists an active streaming query with progress, empties on stop") {
    import java.nio.file.Files
    graft.catalog.InfoSchema.register(spark)
    val in = Files.createTempDirectory("graft_sysstr_in").toString
    Files.write(java.nio.file.Paths.get(in, "a.json"), """{"id":1}""".getBytes)
    val q = spark.readStream.schema("id LONG").json(in)
      .writeStream.format("memory").queryName("sysstr_q")
      .option("checkpointLocation",
        Files.createTempDirectory("graft_sysstr_ck").toString)
      .start()
    try {
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT name, batch_id, num_input_rows FROM sys_streams WHERE name = 'sysstr_q'")
        .collect()
      assert(rows.length == 1, s"expected the active stream: ${rows.toSeq}")
      assert(rows.head.getLong(1) >= 0L && rows.head.getLong(2) >= 1L, rows.head.toString)
      // and the SQL verb face of the same listing
      val shown = spark.sql("SHOW STREAMS").collect()
        .map(r => (r.getString(1), r.getString(3)))
      assert(shown.exists { case (n, in) => n == "sysstr_q" && in.toLong >= 1L },
        s"SHOW STREAMS must list the active query: ${shown.toSeq}")
    } finally q.stop()
    assert(spark.sql("SELECT * FROM sys_streams WHERE name = 'sysstr_q'").count() == 0,
      "a stopped stream must leave the view")
    // the HISTORY ring keeps the trail the live view just dropped:
    // a start marker, at least one progress batch with rows, and (listener
    // delivery is async) eventually a termination marker under the id
    val qid = q.id.toString
    def hist() = spark.sql(
      s"SELECT event, batch_id, num_input_rows FROM sys_stream_progress " +
        s"WHERE id = '$qid'").collect()
    val deadline = System.currentTimeMillis() + 10000
    while (!hist().exists(_.getString(0) == "terminated") &&
           System.currentTimeMillis() < deadline) Thread.sleep(100)
    val h = hist()
    assert(h.exists(_.getString(0) == "started"), h.mkString(","))
    assert(h.exists(r => r.getString(0) == "progress" && r.getLong(2) >= 1L),
      s"a progress record with rows must persist: ${h.mkString(",")}")
    assert(h.exists(_.getString(0) == "terminated"), h.mkString(","))
  }

  test("information_schema and sys views are queryable") {
    graft.engine.Tables.ensure(spark, TestSpark.sf)
    graft.catalog.InfoSchema.register(spark)
    val tables = spark.sql(
      "SELECT table_name FROM information_schema_tables ORDER BY table_name")
      .collect().map(_.getString(0)).toSet
    assert(tables.contains("lineitem") && tables.contains("documents"))
    val cols = spark.sql("""
      SELECT column_name FROM information_schema_columns
      WHERE table_name = 'lineitem'""").collect().map(_.getString(0)).toSet
    assert(cols.contains("l_orderkey"))
    assert(spark.sql("SELECT * FROM sys_options WHERE name LIKE 'spark.sql%'").count() > 0)
    assert(spark.sql("SELECT * FROM sys_nodes").count() >= 0)
  }

  test("sys introspection parity: version/memory/threads/timezones (r14)") {
    graft.engine.Tables.ensure(spark, graft.TestSpark.sf)
    val v = spark.sql("SELECT * FROM sys_version").collect()
    assert(v.length == 1 && v(0).getString(0).startsWith("graft-on-spark-"))
    val mem = spark.sql(
      "SELECT heap_current, heap_max FROM sys_memory").collect()
    assert(mem.nonEmpty && mem.forall(r => r.getLong(0) > 0 && r.getLong(1) >= r.getLong(0)))
    val th = spark.sql(
      "SELECT thread_name, thread_state FROM sys_threads").collect()
    assert(th.length > 5 && th.exists(_.getString(0).toLowerCase.contains("main")))
    // timezone tables derive from java.time, never a copied literal map
    val tz = spark.sql(
      "SELECT offset_jan, offset_jul, observes_dst FROM sys_timezone_names " +
        "WHERE name = 'Europe/Berlin'").collect()
    assert(tz.length == 1 && tz(0).getString(0) == "+01:00" &&
      tz(0).getString(1) == "+02:00" && tz(0).getBoolean(2))
    val utc = spark.sql(
      "SELECT offset_jan FROM sys_timezone_names WHERE name = 'UTC'").collect()
    assert(utc.length == 1 && utc(0).getString(0) == "+00:00")
    val abbrs = spark.sql(
      "SELECT abbreviation, offset, is_dst FROM sys_timezone_abbreviations").collect()
    assert(abbrs.map(_.getString(0)).toSet.intersect(Set("CET", "CEST", "UTC")).size >= 2)
    val cest = abbrs.filter(_.getString(0) == "CEST")
    assert(cest.forall(r => r.getBoolean(2) && r.getString(1) == "+02:00"))
  }

  test("sys accel introspection: materializations/refreshes/dependencies (r14)") {
    val t = graft.engine.Tables.ensure(spark, graft.TestSpark.sf)
    val dir = java.nio.file.Files.createTempDirectory("sys_accel").toString
    val before = spark.sql(
      "SELECT count(*) FROM sys_refreshes").head().getLong(0)
    graft.accel.Reflections.create("sys_mat_probe",
      t.nation.groupBy("n_regionkey").count(), s"$dir/mv")
    try {
      val m = spark.sql("""SELECT bytes, data_files, state FROM sys_materializations
        WHERE reflection_id = 'sys_mat_probe'""").collect()
      assert(m.length == 1 && m(0).getLong(0) > 0 && m(0).getLong(1) > 0)
      assert(m(0).getString(2) == "CAN_ACCELERATE")
      val rf = spark.sql("""SELECT kind, series_ordinal FROM sys_refreshes
        WHERE reflection_id = 'sys_mat_probe'""").collect()
      assert(rf.length == 1 && rf(0).getString(0) == "create" && rf(0).getInt(1) == 1)
      assert(spark.sql("SELECT count(*) FROM sys_refreshes").head().getLong(0) == before + 1)
      val deps = spark.sql("""SELECT dependency_type, dependency_id FROM sys_dependencies
        WHERE reflection_id = 'sys_mat_probe'""").collect()
      assert(deps.nonEmpty && deps.forall(_.getString(0) == "DATASET"))
    } finally graft.accel.Reflections.drop("sys_mat_probe")
  }

  test("sys_services tracks live wire endpoints; sys_boot is the static conf (r14)") {
    val boot = spark.sql("SELECT value FROM sys_boot WHERE name = 'spark.master'").collect()
    assert(boot.length == 1 && boot(0).getString(0).startsWith("local["))
    // another suite may have left the REST endpoint up (suites share the
    // JVM); start() is idempotent, so only stop if WE started it
    val wasRunning = graft.server.GraftRestServer.port.isDefined
    val port = graft.server.GraftRestServer.start(spark)
    try {
      val rows = spark.sql(
        "SELECT service, port FROM sys_services WHERE service = 'rest'").collect()
      assert(rows.length == 1 && rows(0).getInt(1) == port)
    } finally if (!wasRunning) graft.server.GraftRestServer.stop()
    // outside the finally: a cleanup-assertion failure must not mask the
    // try-body's own failure
    if (!wasRunning) assert(spark.sql(
      "SELECT count(*) FROM sys_services WHERE service = 'rest'").head().getLong(0) == 0)
  }

  test("sys_fragments shows live stages of active jobs (r15)") {
    graft.catalog.InfoSchema.register(spark)
    // idle: the view answers (possibly with the observing query's own job)
    val idle = spark.sql("SELECT * FROM sys_fragments")
    assert(idle.columns.toSeq == Seq("job_id", "stage_id", "attempt", "name",
      "num_tasks", "active_tasks", "complete_tasks", "failed_tasks"))
    idle.collect() // must not throw
    // a deliberately slow background job must surface while running —
    // only 2 concurrent tasks so the polling queries still get cores
    // (the 4-core test scheduler is FIFO; saturating it would queue the
    // observer behind the observed). The tasks idle until the observer
    // has seen them (local mode shares the JVM, so the volatile flag
    // reaches the task closures) — under full-suite load a fixed-length
    // job could end between polls.
    SqlSurfaceSpec.fragTestStop = false
    val bg = new Thread(() =>
      try spark.range(2).repartition(2).rdd.foreach { _ =>
        var i = 0
        while (!SqlSurfaceSpec.fragTestStop && i < 300) { Thread.sleep(100); i += 1 }
      } catch { case _: Throwable => () })
    bg.setDaemon(true)
    bg.start()
    try {
      var seen = 0L
      val deadline = System.currentTimeMillis() + 25000
      while (seen == 0 && System.currentTimeMillis() < deadline) {
        seen = spark.sql(
          "SELECT count(*) FROM sys_fragments WHERE active_tasks > 0")
          .head().getLong(0)
        if (seen == 0) Thread.sleep(100)
      }
      assert(seen > 0, "running stage never surfaced in sys_fragments")
    } finally {
      SqlSurfaceSpec.fragTestStop = true
      bg.join(40000)
    }
  }

  test("sys_cache_* family reads the live Spark cache (r16 — CACHE_MANAGER_* analog)") {
    graft.catalog.InfoSchema.register(spark)
    import spark.implicits._
    val df = (0 until 1000).map(i => (i.toLong, s"row_$i")).toDF("id", "s")
    df.createOrReplaceTempView("cache_probe_t")
    spark.sql("CACHE TABLE cache_probe_t")
    try {
      spark.sql("SELECT count(*) FROM cache_probe_t").collect() // materialize
      val ds = spark.sql(
        "SELECT * FROM sys_cache_datasets WHERE loaded").collect()
      assert(ds.nonEmpty, "a loaded cached table must surface in sys_cache_datasets")
      assert(ds.forall(_.getAs[String]("storage_level").nonEmpty))
      val objs = spark.sql(
        "SELECT * FROM sys_cache_objects WHERE cached_partitions > 0").collect()
      assert(objs.nonEmpty, "materialized cache blocks must surface in sys_cache_objects")
      assert(objs.exists(r => r.getAs[Long]("mem_bytes") > 0 ||
        r.getAs[Long]("disk_bytes") > 0))
      val mp = spark.sql("SELECT * FROM sys_cache_mount_points").collect()
      assert(mp.nonEmpty && mp.forall(r => r.getAs[Long]("total_space_bytes") > 0))
      val sp = spark.sql("SELECT * FROM sys_cache_storage_plugins").head()
      assert(sp.getAs[String]("storage_plugin_name") == "spark-cache")
      assert(sp.getAs[Long]("cached_objects") >= 1L)
      assert(sp.getAs[Long]("max_available_memory_bytes") > 0L)
    } finally spark.sql("UNCACHE TABLE cache_probe_t")
    // after uncache the probe's entry is gone (other suites may cache too,
    // so assert on OUR table's disappearance, not emptiness)
    val left = spark.sql("SELECT * FROM sys_cache_objects").collect()
      .flatMap(r => Option(r.getAs[String]("name")))
    assert(!left.exists(_.contains("cache_probe_t")),
      s"uncached table must leave sys_cache_objects: ${left.toSeq}")
  }

  test("sys_membership flattens user role edges (r14)") {
    spark.sql("CREATE USER sysm_user PASSWORD 'x'")
    spark.sql("CREATE ROLE sysm_role")
    spark.sql("GRANT ROLE sysm_role TO USER sysm_user")
    try {
      val rows = spark.sql("""SELECT member_name, member_type FROM sys_membership
        WHERE role_name = 'sysm_role'""").collect()
      assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq
        .contains(("sysm_user", "USER")))
    } finally {
      spark.sql("DROP ROLE sysm_role")
      spark.sql("DROP USER sysm_user")
    }
  }
}

/** Cross-closure signal for the sys_fragments test: local-mode tasks run
  * in this JVM, so the volatile flag ends the background job once the
  * observer has seen it. */
object SqlSurfaceSpec {
  @volatile var fragTestStop: Boolean = false
}
