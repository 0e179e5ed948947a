package graft.catalog

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.sources.SnapshotTable

/** ANALYZE LAKE ... COMPUTE STATISTICS feeding Spark CBO: persisted row
  * counts/NDV/min/max give the planner real cardinalities, and the
  * equi-height histogram fixes range-predicate selectivity on SKEWED
  * columns where min/max-linear interpolation is catastrophically wrong —
  * asserted both at the estimate level (within 2× of truth) and at the
  * plan level (a join flips to broadcast that min/max stats alone would
  * plan as sort-merge). */
class CboStatsSpec extends AnyFunSuite {
  // A CLONED session: suites run in parallel on one shared session, and
  // this spec both toggles plan-shaping confs (AQE, broadcast threshold)
  // and asserts conf-sensitive plan choices — a clone's SQLConf is
  // isolated in both directions (e.g. BucketedLakeSpec sets
  // autoBroadcastJoinThreshold=-1 on the shared session mid-run).
  private lazy val spark = TestSpark.spark.newSession()
  import spark.implicits._

  // 400k rows; 95% of v mass at 1..10, 5% spread over 500..999 (the skew)
  private def skewed(n: Int) = spark.range(n).select(
    col("id"),
    when(col("id") % 20 =!= 0, col("id") % 10 + 1)
      .otherwise(lit(500) + col("id") % 500).as("v"))

  /** Plan-stats access is LAZY and reads the thread's active-session conf
    * (SQLConf.get) at evaluation time — under parallel suites the pool
    * thread may carry another session's context, so pin ours first (the
    * production consumers, FilterEstimation inside planning, always run
    * under the owning session's withActive). */
  private def withOurConf[A](body: => A): A = {
    org.apache.spark.sql.SparkSession.setActiveSession(spark)
    body
  }

  private def filterEstimate(df: org.apache.spark.sql.DataFrame): BigInt =
    withOurConf(df.queryExecution.optimizedPlan.stats.rowCount.getOrElse(BigInt(-1)))

  test("histogram fixes skewed range selectivity; min/max alone does not") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cbo_hist").toString
    val n = 400000
    SnapshotTable.create(spark, dir, skewed(n))
    val truth = SnapshotTable.forPath(spark, dir).read()
      .filter(col("v") >= 700).count()
    assert(truth == n / 20 * 300 / 500, s"fixture skew drifted: $truth")

    // min/max only: linear interpolation over [1, 999] estimates ~30% of
    // rows for v >= 700 — an order of magnitude over the 3% truth
    spark.sql(s"ANALYZE LAKE '$dir' COMPUTE STATISTICS")
    val linear = filterEstimate(
      SnapshotTable.forPath(spark, dir).read().filter(col("v") >= 700))
    assert(linear > BigInt(truth) * 5,
      s"min/max-linear should badly overestimate: $linear vs truth $truth")

    // with the histogram the estimate lands within 2× of truth
    spark.sql(s"ANALYZE LAKE '$dir' COMPUTE STATISTICS WITH HISTOGRAM")
    val hist = filterEstimate(
      SnapshotTable.forPath(spark, dir).read().filter(col("v") >= 700))
    assert(hist > 0 && hist <= BigInt(truth) * 2 && hist * 2 >= BigInt(truth),
      s"histogram estimate $hist not within 2x of truth $truth")
  }

  test("histogram selectivity flips a join to broadcast that min/max stats would not") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cbo_join_a").toString
    val dim = java.nio.file.Files.createTempDirectory("graft_cbo_join_b").toString
    val n = 400000
    SnapshotTable.create(spark, dir, skewed(n))
    // the other side: big enough that ITS raw bytes exceed the threshold
    SnapshotTable.create(spark, dim,
      spark.range(n).select(col("id"), (col("id") * 7).as("w")))

    def joinPlan(): org.apache.spark.sql.execution.SparkPlan = {
      val fact = SnapshotTable.forPath(spark, dir).read().filter(col("v") >= 700)
      val other = SnapshotTable.forPath(spark, dim).read()
      fact.join(other, "id").queryExecution.sparkPlan
    }
    def hasBroadcast(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      p.collect {
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
      }.nonEmpty

    val conf = spark.conf
    val oldAqe = conf.get("spark.sql.adaptive.enabled")
    val oldThresh = conf.get("spark.sql.autoBroadcastJoinThreshold")
    // static planning decision under test: AQE re-plans from runtime sizes
    // and would mask the CBO-side estimate either way
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.autoBroadcastJoinThreshold", (512 * 1024).toString)
    try {
      spark.sql(s"ANALYZE LAKE '$dir' COMPUTE STATISTICS")
      assert(!hasBroadcast(joinPlan()),
        "min/max-linear overestimate must keep the join sort-merge")
      spark.sql(s"ANALYZE LAKE '$dir' COMPUTE STATISTICS WITH HISTOGRAM")
      assert(hasBroadcast(joinPlan()),
        "histogram selectivity must shrink the filtered side under the " +
          "broadcast threshold")
    } finally {
      conf.set("spark.sql.adaptive.enabled", oldAqe)
      conf.set("spark.sql.autoBroadcastJoinThreshold", oldThresh)
    }
  }

  test("DATE columns get v2-form min/max and day-unit histograms") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cbo_date").toString
    val n = 200000
    // 95% of events in one week of 2024; 5% spread over 2020..2029
    val df = spark.range(n).select(
      col("id"),
      when(col("id") % 20 =!= 0,
        date_add(lit(java.sql.Date.valueOf("2024-06-01")),
          (col("id") % 7).cast("int")))
        .otherwise(date_add(lit(java.sql.Date.valueOf("2020-01-01")),
          (col("id") % 3650).cast("int"))).as("d"))
    SnapshotTable.create(spark, dir, df)
    val t = SnapshotTable.forPath(spark, dir)
    val truth = t.read().filter(col("d") >= lit(java.sql.Date.valueOf("2027-01-01"))).count()
    assert(truth > 0 && truth < n / 10, s"fixture drifted: $truth")
    spark.sql(s"ANALYZE LAKE '$dir' COMPUTE STATISTICS")
    val linear = filterEstimate(t.read().filter(col("d") >= lit(java.sql.Date.valueOf("2027-01-01"))))
    assert(linear > BigInt(truth) * 4,
      s"min/max-linear should badly overestimate the date range: $linear vs $truth")
    spark.sql(s"ANALYZE LAKE '$dir' COMPUTE STATISTICS WITH HISTOGRAM 32 BUCKETS")
    val hist = filterEstimate(t.read().filter(col("d") >= lit(java.sql.Date.valueOf("2027-01-01"))))
    assert(hist > 0 && hist <= BigInt(truth) * 2 && hist * 2 >= BigInt(truth),
      s"date histogram estimate $hist not within 2x of truth $truth")
    // external form: calendar-date strings for min/max (the v2 decode
    // parses them directly), epoch-DAY doubles for the histogram bins
    // (the unit FilterEstimation converts date literals to)
    val props = t.properties
    val dNode = props(CboStats.ColPrefix + "d")
    assert(dNode.contains("\"min\":\"2020-01-01\""), dNode)
    assert(dNode.contains("\"hist\"") && dNode.contains("19"), dNode)
  }

  test("TIMESTAMP columns estimate ranges through micros-unit histograms") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cbo_ts").toString
    val n = 200000
    // 95% of events in one hour; 5% spread over a year
    val base = lit(java.sql.Timestamp.valueOf("2024-06-01 00:00:00"))
    val df = spark.range(n).select(
      col("id"),
      when(col("id") % 20 =!= 0,
        timestamp_add("SECOND", (col("id") % 3600).cast("int"), base))
        .otherwise(timestamp_add("HOUR", (col("id") % 8760).cast("int"), base))
        .as("ts"))
    SnapshotTable.create(spark, dir, df)
    val t = SnapshotTable.forPath(spark, dir)
    val cut = lit(java.sql.Timestamp.valueOf("2024-12-01 00:00:00"))
    val truth = t.read().filter(col("ts") >= cut).count()
    assert(truth > 0 && truth < n / 10, s"fixture drifted: $truth")
    spark.sql(s"ANALYZE LAKE '$dir' COMPUTE STATISTICS")
    val linear = filterEstimate(t.read().filter(col("ts") >= cut))
    assert(linear > BigInt(truth) * 4,
      s"min/max-linear should badly overestimate: $linear vs $truth")
    spark.sql(s"ANALYZE LAKE '$dir' COMPUTE STATISTICS WITH HISTOGRAM 32 BUCKETS")
    val hist = filterEstimate(t.read().filter(col("ts") >= cut))
    assert(hist > 0 && hist <= BigInt(truth) * 2 && hist * 2 >= BigInt(truth),
      s"timestamp histogram estimate $hist not within 2x of truth $truth")
  }

  test("FOR COLUMNS scopes the pass; scoped persistence merges, not replaces") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cbo_cols").toString
    SnapshotTable.create(spark, dir, skewed(5000)
      .withColumn("w", col("id") * 3))
    // full analyze, then re-analyze ONLY v with a histogram
    spark.sql(s"ANALYZE LAKE '$dir' COMPUTE STATISTICS")
    spark.sql(s"ANALYZE LAKE '$dir' FOR COLUMNS (v) " +
      "COMPUTE STATISTICS WITH HISTOGRAM 8 BUCKETS")
    val t = SnapshotTable.forPath(spark, dir)
    val props = t.properties
    // v gained its histogram; id and w keep their earlier stats
    assert(props(CboStats.ColPrefix + "v").contains("\"hist\""))
    assert(props.contains(CboStats.ColPrefix + "id"))
    assert(props.contains(CboStats.ColPrefix + "w"))
    assert(!props(CboStats.ColPrefix + "w").contains("\"hist\""))
    // the scoped read-only profile reports only the named columns
    val rows = spark.sql(s"ANALYZE LAKE '$dir' FOR COLUMNS (w, v)").collect()
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("v", "w"))
  }

  test("categorical equality selectivity: frequent items fix the 1/NDV estimate") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cbo_cat").toString
    val n = 200000
    // status: 60% 'HOT', the rest spread over 1000 cold values
    val df = spark.range(n).select(
      col("id"),
      when(col("id") % 5 < 3, lit("HOT"))
        .otherwise(concat(lit("cold_"), (col("id") % 1000).cast("string")))
        .as("status"))
    SnapshotTable.create(spark, dir, df)
    val t = SnapshotTable.forPath(spark, dir)
    val truth = t.read().filter(col("status") === "HOT").count()
    assert(truth == n / 5 * 3, s"fixture drifted: $truth")
    spark.sql(s"ANALYZE LAKE '$dir' COMPUTE STATISTICS")

    // with the hook disabled the estimate is the string contract's 1/NDV
    // — three orders of magnitude under the 60% truth
    spark.conf.set("spark.graft.cbo.categorical", "false")
    val naive =
      try filterEstimate(t.read().filter(col("status") === "HOT"))
      finally spark.conf.set("spark.graft.cbo.categorical", "true")
    assert(naive > 0 && naive * 50 < BigInt(truth),
      s"1/NDV should badly underestimate the hot item: $naive vs $truth")

    // frequent items put the estimate within 2x of truth
    val est = filterEstimate(t.read().filter(col("status") === "HOT"))
    assert(est <= BigInt(truth) * 2 && est * 2 >= BigInt(truth),
      s"frequent-item estimate $est not within 2x of truth $truth")
    // IN over two KNOWN items estimates their combined mass (pick a cold
    // item actually stored in the top-k; an item outside the top-k
    // disables the adjust, as the cold_42 probe below pins)
    val storedCold = {
      val fi = spark.sql(s"SELECT frequent_items FROM lake_stats('$dir') " +
        "WHERE col_name = 'status'").head().getString(0)
      "\"(cold_\\d+)\"".r.findFirstMatchIn(fi)
        .map(_.group(1)).getOrElse(fail(s"no cold item in top-k: $fi"))
    }
    val inTruth = t.read().filter(col("status").isin("HOT", storedCold)).count()
    val inEst = filterEstimate(
      t.read().filter(col("status").isin("HOT", storedCold)))
    assert(inEst <= BigInt(inTruth) * 2 && inEst * 2 >= BigInt(inTruth),
      s"IN estimate $inEst not within 2x of truth $inTruth ($storedCold)")
    // an unknown literal keeps the conservative default (no freq entry)
    val cold = filterEstimate(t.read().filter(col("status") === "cold_42"))
    assert(cold < BigInt(truth) / 50, s"cold literal should stay ~1/NDV: $cold")

    // the broadcast decision visibly improves: under 1/NDV the filtered
    // fact side looks tiny and gets BROADCAST — the classic skew OOM —
    // with the true 60% mass it correctly stays sort-merge
    val dim = java.nio.file.Files.createTempDirectory("graft_cbo_cat_d").toString
    SnapshotTable.create(spark, dim,
      spark.range(n).select(col("id"), (col("id") * 3).as("w")))
    def joinPlan(): org.apache.spark.sql.execution.SparkPlan = {
      val fact = t.read().filter(col("status") === "HOT")
      val other = SnapshotTable.forPath(spark, dim).read()
      withOurConf(fact.join(other, "id").queryExecution.sparkPlan)
    }
    def hasBroadcast(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      p.collect {
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
      }.nonEmpty
    val conf = spark.conf
    val oldAqe = conf.get("spark.sql.adaptive.enabled")
    val oldThresh = conf.get("spark.sql.autoBroadcastJoinThreshold")
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.autoBroadcastJoinThreshold", (512 * 1024).toString)
    try {
      conf.set("spark.graft.cbo.categorical", "false")
      assert(hasBroadcast(joinPlan()),
        "1/NDV underestimate should (wrongly) choose broadcast")
      conf.set("spark.graft.cbo.categorical", "true")
      assert(!hasBroadcast(joinPlan()),
        "the frequent-item estimate must keep the 120k-row side off the " +
          "broadcast path")
    } finally {
      conf.set("spark.sql.adaptive.enabled", oldAqe)
      conf.set("spark.sql.autoBroadcastJoinThreshold", oldThresh)
    }

    // lake_stats exposes the items
    val fi = spark.sql(s"SELECT frequent_items FROM lake_stats('$dir') " +
      "WHERE col_name = 'status'").head().getString(0)
    assert(fi != null && fi.contains("\"HOT\"") && fi.contains(truth.toString), fi)
  }

  test("time-travel and branch-staged scans do not inherit head stats") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cbo_tt").toString
    SnapshotTable.create(spark, dir, skewed(10000)) // v1
    val t = SnapshotTable.forPath(spark, dir)
    t.append(skewed(30000)) // v2 — head now 40000 rows
    spark.sql(s"ANALYZE LAKE '$dir' COMPUTE STATISTICS")
    def rc(df: org.apache.spark.sql.DataFrame): Option[BigInt] =
      withOurConf(df.queryExecution.optimizedPlan.stats.rowCount)
    // head scan (and an explicit pin AT the head — note ANALYZE itself
    // commits the props, so the head moved past v2) carries the count
    assert(rc(t.read()).contains(BigInt(40000)))
    assert(rc(t.asOf(t.latestVersion)).contains(BigInt(40000)))
    // VERSION AS OF an older snapshot describes 10000 rows — the head's
    // 40000-row stats must NOT attach (systematically wrong cardinality)
    assert(rc(t.asOf(1L)).forall(_ != BigInt(40000)),
      s"time travel inherited head stats: ${rc(t.asOf(1L))}")
    // a branch with staged commits reads a different snapshot too
    t.createBranch("staged")
    t.appendToBranch("staged", skewed(5))
    assert(rc(t.readRef("staged")).forall(_ != BigInt(40000)),
      s"branch scan inherited head stats: ${rc(t.readRef("staged"))}")
    // but a tag pinned AT the tip IS the head snapshot — stats apply
    t.createTag("tip")
    assert(rc(t.readRef("tip")).contains(BigInt(40000)))
    t.dropRef("staged"); t.dropRef("tip")
  }

  test("stats survive the lake round trip and diff scans skip them") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cbo_rt").toString
    SnapshotTable.create(spark, dir, skewed(10000))
    spark.sql(s"ANALYZE LAKE '$dir' COMPUTE STATISTICS WITH HISTOGRAM 8 BUCKETS")
    val t = SnapshotTable.forPath(spark, dir)
    val props = t.properties
    assert(props(CboStats.RowCountKey) == "10000")
    assert(props.contains(CboStats.ColPrefix + "v"))
    assert(props(CboStats.ColPrefix + "v").contains("\"hist\""))
    // the full scan reports the analyzed row count to the planner
    assert(withOurConf(t.read().queryExecution.optimizedPlan.stats.rowCount)
      .contains(BigInt(10000)))
    // a non-full scan (version = -1 path, e.g. the CDC diff) must not
    // inherit full-table cardinality
    t.append(skewed(100))
    val diff = t.changesBetween(1L, 2L)
    val rc = withOurConf(diff.queryExecution.optimizedPlan.stats.rowCount)
    assert(rc.forall(_ < BigInt(10000)), s"diff scan inherited stats: $rc")
    // a DROP + re-ADD of the same NAME with a different type must not
    // feed the old typed min/max to the planner's decoder (it would
    // throw during planning); NDV/nulls stay, min/max/hist drop
    spark.sql(s"ALTER LAKE '$dir' DROP COLUMN v")
    spark.sql(s"ALTER LAKE '$dir' ADD COLUMN v STRING")
    val swapped = t.read().filter(col("v").isNotNull)
    val rcSwap = withOurConf(swapped.queryExecution.optimizedPlan.stats.rowCount)
    assert(rcSwap.isDefined, "type-swapped column must not break planning")
    spark.sql(s"ALTER LAKE '$dir' DROP COLUMN v")
    spark.sql(s"ALTER LAKE '$dir' ADD COLUMN v BIGINT")

    // lake_stats TVF surfaces what the planner will use
    val stats = spark.sql(s"SELECT * FROM lake_stats('$dir')").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(stats.keySet == Set("id", "v"))
    assert(stats("v").getAs[Long]("n_rows") == 10000L)
    assert(stats("v").getAs[Int]("histogram_bins") == 8)
    assert(stats("v").getAs[String]("histogram").contains("\"bins\""))
    assert(stats("id").getAs[Long]("n_nulls") == 0L)
    assert(stats("id").getAs[Long]("analyzed_version") == 1L)
  }

  test("sys_table_statistics lists the persisted profile of analyzed tables") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cbo_sysview").toString
    SnapshotTable.create(spark, dir,
      spark.range(100).selectExpr("id", "cast(id % 5 AS string) AS tag"))
    spark.sql(s"ANALYZE LAKE '$dir' COMPUTE STATISTICS WITH HISTOGRAM")
    graft.catalog.InfoSchema.register(spark)
    val rows = spark.sql(
        s"SELECT * FROM sys_table_statistics WHERE table_path = '$dir'")
      .collect().map(r => r.getAs[String]("column_name") -> r).toMap
    assert(rows.keySet == Set("id", "tag"), rows.keySet.toString)
    assert(rows("id").getAs[Long]("row_count") == 100L)
    // NDV is the approx-distinct profile value — exactness not guaranteed
    val ndv = rows("id").getAs[Long]("ndv")
    assert(ndv >= 90L && ndv <= 110L, s"ndv $ndv")
    assert(rows("id").getAs[Int]("histogram_bins") > 0)
    assert(rows("id").getAs[String]("min_value") == "0")
    // categorical string column: frequent items persisted, no histogram
    assert(rows("tag").getAs[Int]("frequent_items") == 5)
    assert(rows("tag").getAs[Int]("histogram_bins") == 0)
    assert(rows("tag").getAs[Long]("size_bytes") > 0L)
    // the view is LIVE: a re-ANALYZE at the next version shows through
    spark.sql(s"INSERT INTO LAKE '$dir' SELECT CAST(100 AS BIGINT) AS id, 'x' AS tag")
    spark.sql(s"ANALYZE LAKE '$dir' COMPUTE STATISTICS")
    val after = spark.sql("SELECT row_count FROM sys_table_statistics " +
      s"WHERE table_path = '$dir' AND column_name = 'id'").head().getLong(0)
    assert(after == 101L)
  }
}
