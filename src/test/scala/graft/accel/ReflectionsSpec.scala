package graft.accel

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.engine.Tables

class ReflectionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def aggQuery() = {
    val t = Tables(spark, TestSpark.sf)
    t.lineitem.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
  }

  test("matching query is answered from the materialization") {
    Reflections.clear()
    Reflections.install(spark)
    val dir = Files.createTempDirectory("graft_refl").toString
    Reflections.create("r_flag_agg", aggQuery(), s"$dir/r_flag_agg")

    val q = aggQuery()
    // the physical scan's Location reveals what is actually read
    val planStr = q.queryExecution.sparkPlan.toString
    assert(planStr.contains("r_flag_agg"), s"no substitution in:\n$planStr")
    assert(!planStr.contains("lineitem.parquet"), "base table still scanned")

    // results identical to the unaccelerated answer
    val expect = aggQuery().queryExecution.logical
    Reflections.drop("r_flag_agg")
    val cold = aggQuery().orderBy("l_returnflag", "l_linestatus").collect()
    Reflections.create("r_flag_agg", aggQuery(), s"$dir/r_flag_agg")
    val hot = aggQuery().orderBy("l_returnflag", "l_linestatus").collect()
    assert(cold.sameElements(hot))
    Reflections.clear()
  }

  test("reflection accelerates an aggregate over a lake-table scan") {
    import spark.implicits._
    Reflections.clear()
    Reflections.install(spark)
    val lakeDir = Files.createTempDirectory("graft_refl_lake").toString
    graft.sources.SnapshotTable.create(spark, lakeDir,
      spark.range(0, 1000).select(col("id"), (col("id") % 7).as("k"),
        (col("id") * 2).as("v")).toDF())
    val lake = graft.sources.SnapshotTable.forPath(spark, lakeDir)
    def q() = lake.read().groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    val mvDir = Files.createTempDirectory("graft_refl_lake_mv").toString
    val cold = q().orderBy("k").as[(Long, Long, Long)].collect().toSeq
    Reflections.create("r_lake_agg", q(), s"$mvDir/r_lake_agg")
    val planStr = q().queryExecution.sparkPlan.toString
    assert(planStr.contains("r_lake_agg"), s"no substitution over lake scan:\n$planStr")
    val hot = q().orderBy("k").as[(Long, Long, Long)].collect().toSeq
    assert(cold == hot)
    // projection subsumption over the lake reflection also serves from the MV
    val rollPlan = lake.read().groupBy(col("k")).agg(count(lit(1)).as("n"))
      .queryExecution.sparkPlan.toString
    assert(rollPlan.contains("r_lake_agg"),
      s"agg-subset query not served from the lake reflection:\n$rollPlan")

    // STALENESS: the lake advances → the reflection must stop serving
    // (the fingerprint still matches — it keys on the table PATH — so
    // without the version gate this query would silently return the
    // pre-append aggregate)
    lake.append(spark.range(1000, 1100).select(col("id"), (col("id") % 7).as("k"),
      (col("id") * 2).as("v")).toDF())
    val stalePlan = q().queryExecution.sparkPlan.toString
    assert(!stalePlan.contains("r_lake_agg"),
      s"stale reflection must not serve after a lake append:\n$stalePlan")
    val afterAppend = q().orderBy("k").as[(Long, Long, Long)].collect().toSeq
    assert(afterAppend.map(_._2).sum == 1100L, "post-append query must see new rows")
    // refresh re-pins the base version and serving resumes
    Reflections.refresh("r_lake_agg", q())
    val refreshedPlan = q().queryExecution.sparkPlan.toString
    assert(refreshedPlan.contains("r_lake_agg"),
      s"refreshed reflection should serve again:\n$refreshedPlan")
    assert(q().orderBy("k").as[(Long, Long, Long)].collect().toSeq == afterAppend)
    Reflections.clear()
  }

  test("substitution survives operators stacked on top") {
    Reflections.clear()
    Reflections.install(spark)
    val dir = Files.createTempDirectory("graft_refl2").toString
    Reflections.create("r2", aggQuery(), s"$dir/r2")
    val q = aggQuery().filter(col("n") > 0).orderBy(desc("qty")).limit(2)
    val planStr = q.queryExecution.sparkPlan.toString
    assert(planStr.contains("/r2"), s"no substitution in:\n$planStr")
    assert(q.collect().length == 2)
    Reflections.clear()
  }

  test("dropped reflection stops substituting") {
    Reflections.clear()
    Reflections.install(spark)
    val dir = Files.createTempDirectory("graft_refl3").toString
    Reflections.create("r3", aggQuery(), s"$dir/r3")
    Reflections.drop("r3")
    val planStr = aggQuery().queryExecution.sparkPlan.toString
    assert(!planStr.contains("/r3"))
    assert(planStr.contains("lineitem.parquet"))
  }

  test("roll-up subsumption: coarser grouping served by a superset reflection") {
    Reflections.clear()
    Reflections.install(spark)
    val t = Tables(spark, TestSpark.sf)
    def roll() = t.lineitem.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("qty"), count(lit(1)).as("n"))
    val cold = roll().orderBy("l_returnflag").collect()

    val dir = Files.createTempDirectory("graft_refl5").toString
    Reflections.create("r5", aggQuery(), s"$dir/r5")
    val q = roll()
    val planStr = q.queryExecution.sparkPlan.toString
    assert(planStr.contains("/r5"), s"no roll-up substitution in:\n$planStr")
    assert(!planStr.contains("lineitem.parquet"), "base table still scanned")
    val hot = q.orderBy("l_returnflag").collect()
    assert(cold.sameElements(hot), "roll-up answer differs from base answer")
    Reflections.clear()
  }

  test("projection subsumption: DISTINCT grouping-subset served by reflection") {
    Reflections.clear()
    Reflections.install(spark)
    val t = Tables(spark, TestSpark.sf)
    def distinctFlags() = t.lineitem.select(col("l_returnflag")).distinct()
    val cold = distinctFlags().orderBy("l_returnflag").collect()

    val dir = Files.createTempDirectory("graft_refl6").toString
    Reflections.create("r6", aggQuery(), s"$dir/r6")
    val q = distinctFlags()
    val planStr = q.queryExecution.sparkPlan.toString
    assert(planStr.contains("/r6"), s"no substitution in:\n$planStr")
    val hot = q.orderBy("l_returnflag").collect()
    assert(cold.sameElements(hot))
    Reflections.clear()
  }

  test("roll-up COUNT over an EMPTY reflection returns 0, not NULL") {
    Reflections.clear()
    Reflections.install(spark)
    val t = Tables(spark, TestSpark.sf)
    def noRows() = t.lineitem.filter(col("l_quantity") < -1) // matches nothing
    val dir = Files.createTempDirectory("graft_refl9").toString
    Reflections.create("r9",
      noRows().groupBy(col("l_returnflag")).agg(count(lit(1)).as("n")), s"$dir/r9")
    // global COUNT rolls up from the (empty) materialization: must be 0
    val q = noRows().agg(count(lit(1)).as("n"))
    val planStr = q.queryExecution.sparkPlan.toString
    assert(planStr.contains("/r9"), s"no roll-up substitution in:\n$planStr")
    val row = q.collect()(0)
    assert(!row.isNullAt(0) && row.getLong(0) == 0L,
      s"COUNT over empty reflection must be 0, got $row")
    Reflections.clear()
  }

  test("no subsumption when query groups outside the reflection's keys") {
    Reflections.clear()
    Reflections.install(spark)
    val t = Tables(spark, TestSpark.sf)
    val dir = Files.createTempDirectory("graft_refl7").toString
    Reflections.create("r7", aggQuery(), s"$dir/r7")
    val q = t.lineitem.groupBy(col("l_suppkey")).agg(count(lit(1)).as("n"))
    val planStr = q.queryExecution.sparkPlan.toString
    assert(!planStr.contains("/r7"), "substituted a non-subsumed grouping")
    assert(planStr.contains("lineitem"), "base table should be scanned")
    Reflections.clear()
  }

  test("no subsumption for non-roll-up aggregates (avg) or distinct aggs") {
    Reflections.clear()
    Reflections.install(spark)
    val t = Tables(spark, TestSpark.sf)
    val dir = Files.createTempDirectory("graft_refl8").toString
    Reflections.create("r8", aggQuery(), s"$dir/r8")
    // avg is not re-aggregable from sum-only outputs; count distinct never is
    val q1 = t.lineitem.groupBy(col("l_returnflag")).agg(avg(col("l_quantity")).as("a"))
    assert(!q1.queryExecution.sparkPlan.toString.contains("/r8"))
    val q2 = t.lineitem.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_linestatus")).as("nd"))
    assert(!q2.queryExecution.sparkPlan.toString.contains("/r8"))
    Reflections.clear()
  }

  test("incremental refresh rewrites only touched partitions") {
    import spark.implicits._
    Reflections.clear()
    Reflections.install(spark)
    val dir = Files.createTempDirectory("graft_refl4").toString
    val base = Seq(("2024-01-01", 1L), ("2024-01-02", 2L)).toDF("day", "v")
    Reflections.create("r4", base, s"$dir/r4")
    // partitioned materialization + delta for one day
    base.write.mode("overwrite").partitionBy("day").parquet(s"$dir/r4")
    spark.catalog.refreshByPath(s"$dir/r4")
    Reflections.refreshIncremental("r4",
      Seq(("2024-01-02", 20L)).toDF("day", "v"), "day")
    val rows = spark.read.parquet(s"$dir/r4")
      .orderBy("day").select("v").as[Long].collect().toSeq
    assert(rows == Seq(1L, 20L))
    Reflections.clear()
  }

  test("two eligible roll-up reflections: candidate order is deterministic (by name)") {
    Reflections.clear()
    Reflections.install(spark)
    val t = Tables(spark, TestSpark.sf)
    def roll() = t.lineitem.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("qty"))
    val dir = Files.createTempDirectory("graft_refl6").toString
    // both materializations can serve the roll-up; the name-ordered first
    // ("aa_refl") must win on every planning, not TrieMap iteration luck
    Reflections.create("zz_refl", aggQuery(), s"$dir/zz_refl")
    Reflections.create("aa_refl", aggQuery(), s"$dir/aa_refl")
    (1 to 3).foreach { _ =>
      val planStr = roll().queryExecution.sparkPlan.toString
      assert(planStr.contains("/aa_refl"),
        s"expected the name-ordered first reflection to serve the query:\n$planStr")
    }
    Reflections.clear()
  }

  test("filter subsumption: narrower query filter served with a residual over the materialization") {
    Reflections.clear()
    Reflections.install(spark)
    val t = Tables(spark, TestSpark.sf)
    // reflection: WHERE l_quantity > 5 GROUP BY l_returnflag, l_linestatus
    def wide() = t.lineitem.filter(col("l_quantity") > 5)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("qty"), count(lit(1)).as("n"))
    // query: strictly narrower filter (extra conjunct on a grouping column),
    // coarser grouping — answerable from the materialization with a
    // residual l_linestatus = 'F' on top of the scan
    def narrow() = t.lineitem
      .filter(col("l_quantity") > 5 && col("l_linestatus") === "F")
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("qty"), count(lit(1)).as("n"))
    val cold = narrow().orderBy("l_returnflag").collect()

    val dir = Files.createTempDirectory("graft_refl_fsub").toString
    Reflections.create("r_fsub", wide(), s"$dir/r_fsub")
    val q = narrow()
    val planStr = q.queryExecution.sparkPlan.toString
    assert(planStr.contains("/r_fsub"), s"no filter-subsumption substitution in:\n$planStr")
    assert(!planStr.contains("lineitem.parquet"), "base table still scanned")
    val hot = q.orderBy("l_returnflag").collect()
    assert(cold.sameElements(hot), "residual-filtered answer differs from base answer")
    Reflections.clear()
  }

  test("no filter subsumption when the residual references a non-grouping column") {
    Reflections.clear()
    Reflections.install(spark)
    val t = Tables(spark, TestSpark.sf)
    val dir = Files.createTempDirectory("graft_refl_fsub2").toString
    Reflections.create("r_fsub2",
      t.lineitem.filter(col("l_quantity") > 5)
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n")),
      s"$dir/r_fsub2")
    // residual l_suppkey < 10 isn't evaluable over the materialization
    // (l_suppkey is not a reflection output) — must fall back to base scan
    val q = t.lineitem.filter(col("l_quantity") > 5 && col("l_suppkey") < 10)
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
    val planStr = q.queryExecution.sparkPlan.toString
    assert(!planStr.contains("/r_fsub2"), "substituted an unanswerable residual")
    assert(planStr.contains("lineitem"), "base table should be scanned")
    Reflections.clear()
  }

  test("no filter subsumption when the query filter is WIDER than the reflection's") {
    Reflections.clear()
    Reflections.install(spark)
    val t = Tables(spark, TestSpark.sf)
    val dir = Files.createTempDirectory("graft_refl_fsub3").toString
    Reflections.create("r_fsub3",
      t.lineitem.filter(col("l_quantity") > 5 && col("l_linestatus") === "F")
        .groupBy(col("l_returnflag"), col("l_linestatus")).agg(count(lit(1)).as("n")),
      s"$dir/r_fsub3")
    // query needs rows the materialization dropped (only l_quantity > 5)
    val q = t.lineitem.filter(col("l_quantity") > 5)
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
    val planStr = q.queryExecution.sparkPlan.toString
    assert(!planStr.contains("/r_fsub3"), "substituted a materialization missing rows")
    Reflections.clear()
  }

  test("substitution pass fingerprints only shape-eligible nodes on a deep plan") {
    Reflections.clear()
    Reflections.install(spark)
    val t = Tables(spark, TestSpark.sf)
    val dir = Files.createTempDirectory("graft_refl_cost").toString
    Reflections.create("r_cost", aggQuery(), s"$dir/r_cost")
    // a deep multi-join plan with NO aggregate anywhere: nothing matches the
    // reflection's root shape (Aggregate, 4 cols), so the pass must
    // fingerprint nothing at all
    var q = t.nation.select(col("n_nationkey"), col("n_regionkey"))
    (1 to 10).foreach { i =>
      q = q.join(t.region.select(col("r_regionkey").as(s"rk_$i")),
        col("n_regionkey") === col(s"rk_$i")).drop(s"rk_$i")
    }
    Reflections.fingerprintsComputed.set(0)
    q.queryExecution.optimizedPlan // force the optimizer (and the pass) to run
    val n = Reflections.fingerprintsComputed.get()
    assert(n == 0L,
      s"substitution pass fingerprinted $n nodes of a plan with no eligible shapes")
    Reflections.clear()
  }

  test("join subtree: a reflected aggregate joined to another table scans the MV") {
    Reflections.clear()
    Reflections.install(spark)
    val t = Tables(spark, TestSpark.sf)
    def agg() = t.orders.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), sum(col("o_totalprice")).as("spend"))
    def q() = agg().join(t.customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("n_orders"), col("spend"))
    val cold = q().orderBy("c_name").collect().toSeq
    val dir = Files.createTempDirectory("graft_refl_join").toString
    Reflections.create("r_cust_orders", agg(), s"$dir/r_cust_orders")
    val planStr = q().queryExecution.sparkPlan.toString
    assert(planStr.contains("r_cust_orders"),
      s"join subtree not served from the materialization:\n$planStr")
    assert(!planStr.contains("orders.parquet"), "base orders table still scanned")
    val hot = q().orderBy("c_name").collect().toSeq
    assert(cold == hot)
    Reflections.clear()
  }

  test("roll-up over a JOIN-defined reflection: coarser grouping + residual filter") {
    Reflections.clear()
    Reflections.install(spark)
    val t = Tables(spark, TestSpark.sf)
    def joined() = t.orders.join(t.customer, col("o_custkey") === col("c_custkey"))
    // decimal money: a double sum re-aggregated from partial sums would
    // differ in rounding from the direct sum and fail exact comparison
    val price = col("o_totalprice").cast("decimal(18,2)")
    // reflection: grouped by (c_nationkey, o_orderstatus) over the join
    def refl() = joined().groupBy(col("c_nationkey"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sum(price).as("spend"))
    // query: same join, coarser grouping, plus a residual on a grouping col
    def q() = joined().where(col("c_nationkey") < 10)
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"), sum(price).as("spend"))
    val cold = q().orderBy("c_nationkey").collect().toSeq
    val dir = Files.createTempDirectory("graft_refl_joindef").toString
    Reflections.create("r_nation_status", refl(), s"$dir/r_nation_status")
    val planStr = q().queryExecution.sparkPlan.toString
    assert(planStr.contains("r_nation_status"),
      s"join-defined roll-up not served from the materialization:\n$planStr")
    assert(!planStr.contains("orders.parquet") && !planStr.contains("customer.parquet"),
      "base tables still scanned")
    val hot = q().orderBy("c_nationkey").collect().toSeq
    assert(cold == hot)
    Reflections.clear()
  }

  test("join-shape matching refuses outer joins and residuals off grouping keys") {
    Reflections.clear()
    Reflections.install(spark)
    val t = Tables(spark, TestSpark.sf)
    def refl() = t.orders.join(t.customer, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey")).agg(sum(col("o_totalprice")).as("spend"))
    val dir = Files.createTempDirectory("graft_refl_joinneg").toString
    Reflections.create("r_join_neg", refl(), s"$dir/r_join_neg")
    // LEFT OUTER join with the same shape must NOT be served
    val outer = t.orders.join(t.customer,
        col("o_custkey") === col("c_custkey"), "left")
      .groupBy(col("c_nationkey")).agg(sum(col("o_totalprice")).as("spend"))
    assert(!outer.queryExecution.sparkPlan.toString.contains("r_join_neg"),
      "outer join wrongly served from an inner-join materialization")
    // residual on a NON-grouping column must not be served
    val badResidual = t.orders.join(t.customer, col("o_custkey") === col("c_custkey"))
      .where(col("o_orderstatus") === "F")
      .groupBy(col("c_nationkey")).agg(sum(col("o_totalprice")).as("spend"))
    assert(!badResidual.queryExecution.sparkPlan.toString.contains("r_join_neg"),
      "non-grouping residual wrongly transplanted")
    Reflections.clear()
  }

  test("same-named filter-only column across join sides refuses the roll-up (side-blind conjuncts)") {
    // ADVICE r6 high: the ambiguity guard used j.left/right.output, but the
    // rule runs post column-pruning, so a column referenced ONLY by a
    // pushed-down filter is absent from the join outputs. Both tables here
    // carry a 'status' used only in filters: the reflection filters
    // fact.status, the query filters dim.status — side-blind nameCanon makes
    // the conjunct sets equal, and the old guard saw disjoint outputs
    // ({fk,val} vs {dk,name}), so the roll-up silently served WRONG rows.
    import spark.implicits._
    Reflections.clear()
    Reflections.install(spark)
    val dir = Files.createTempDirectory("graft_refl_sideblind").toString
    Seq((1L, 10L, "ok"), (1L, 20L, "bad"), (2L, 30L, "ok"))
      .toDF("fk", "val", "status").write.parquet(s"$dir/fact")
    Seq((1L, "alpha", "ok"), (2L, "beta", "bad"))
      .toDF("dk", "name", "status").write.parquet(s"$dir/dim")
    def fact = spark.read.parquet(s"$dir/fact")
    def dim = spark.read.parquet(s"$dir/dim")
    def refl() = fact.where(col("status") === "ok").drop("status")
      .join(dim.drop("status"), col("fk") === col("dk"))
      .groupBy(col("name")).agg(sum(col("val")).as("sv"))
    // query filters the DIM side's status: beta rows must vanish entirely
    def q() = fact.drop("status")
      .join(dim.where(col("status") === "ok").drop("status"),
        col("fk") === col("dk"))
      .groupBy(col("name")).agg(sum(col("val")).as("sv"))
    val cold = q().orderBy("name").as[(String, Long)].collect().toSeq
    assert(cold == Seq(("alpha", 30L)), s"fixture broken: $cold")
    Reflections.create("r_sideblind", refl(), s"$dir/r_sideblind")
    val planStr = q().queryExecution.sparkPlan.toString
    assert(!planStr.contains("r_sideblind"),
      s"cross-side same-named filter column wrongly matched:\n$planStr")
    assert(q().orderBy("name").as[(String, Long)].collect().toSeq == cold)
    // control: the IDENTICAL query to the defining one still serves — the
    // guard refuses by ambiguity, not by banning shared names outright
    val exactPlan = refl().queryExecution.sparkPlan.toString
    assert(exactPlan.contains("r_sideblind"),
      s"exact match should still serve under the schema guard:\n$exactPlan")
    Reflections.clear()
  }

  test("self-join roll-up: side-qualified conjuncts bind filters to the correct leg") {
    // both legs are the SAME table, so every column name exists on both
    // sides — only the join-tree path in the conjunct key tells them apart.
    // sum() is taken over leg 1's price, so filtering leg 1 vs leg 2 gives
    // genuinely different answers and a side-blind matcher would serve one
    // query's plan for the other.
    Reflections.clear()
    Reflections.install(spark)
    val t = Tables(spark, TestSpark.sf)
    val price = col("o1.o_totalprice").cast("decimal(18,2)")
    def joined() = t.orders.as("o1")
      .join(t.orders.as("o2"), col("o1.o_custkey") === col("o2.o_custkey"))
    def refl() = joined()
      .groupBy(col("o1.o_orderstatus").as("st1"), col("o2.o_orderstatus").as("st2"))
      .agg(count(lit(1)).as("n"), sum(price).as("spend"))
    def q1() = joined().where(col("o1.o_orderstatus") === "F")
      .groupBy(col("o2.o_orderstatus").as("st"))
      .agg(count(lit(1)).as("n"), sum(price).as("spend"))
    def q2() = joined().where(col("o2.o_orderstatus") === "F")
      .groupBy(col("o1.o_orderstatus").as("st"))
      .agg(count(lit(1)).as("n"), sum(price).as("spend"))
    val cold1 = q1().orderBy("st").collect().toSeq
    val cold2 = q2().orderBy("st").collect().toSeq
    assert(cold1 != cold2, "fixture: legs must disagree for the test to discriminate")
    val dir = Files.createTempDirectory("graft_refl_self").toString
    Reflections.create("r_self", refl(), s"$dir/r_self")
    val p1 = q1().queryExecution.sparkPlan.toString
    assert(p1.contains("r_self"), s"self-join roll-up not served:\n$p1")
    assert(q1().orderBy("st").collect().toSeq == cold1, "leg-1 filter bound to wrong leg")
    val p2 = q2().queryExecution.sparkPlan.toString
    assert(p2.contains("r_self"), s"flipped-leg roll-up not served:\n$p2")
    assert(q2().orderBy("st").collect().toSeq == cold2, "leg-2 filter bound to wrong leg")
    Reflections.clear()
  }

  test("LEFT-join MV: left/post-join residuals served, right pre-join filter refused") {
    import spark.implicits._
    Reflections.clear()
    Reflections.install(spark)
    val dir = Files.createTempDirectory("graft_refl_left").toString
    // fk=3 has no dim match → the MV carries a null-extended group
    Seq((1L, 10L), (1L, 20L), (2L, 30L), (3L, 99L))
      .toDF("fk", "v").write.parquet(s"$dir/fact")
    Seq((1L, "a"), (2L, "b")).toDF("dk", "g").write.parquet(s"$dir/dim")
    def fact = spark.read.parquet(s"$dir/fact")
    def dim = spark.read.parquet(s"$dir/dim")
    def refl() = fact.join(dim, col("fk") === col("dk"), "left")
      .groupBy(col("g"), col("fk")).agg(sum(col("v")).as("sv"))
    // pre-join LEFT-side filter: removes whole left rows the same way pre-
    // or post-join, so it is residual-safe
    def qLeft() = fact.where(col("fk") < 3)
      .join(dim, col("fk") === col("dk"), "left")
      .groupBy(col("g")).agg(sum(col("v")).as("sv"))
    // pre-join RIGHT-side filter: fires BEFORE null-extension (fk=2 becomes
    // a null-extended row, it does not disappear) — not replayable
    def qRight() = fact.join(dim.where(col("g") === "a"), col("fk") === col("dk"), "left")
      .groupBy(col("g")).agg(sum(col("v")).as("sv"))
    // post-join filter (g IS NULL is not null-rejecting, so the optimizer
    // keeps the join LEFT and the filter above): residual-safe
    def qPost() = fact.join(dim, col("fk") === col("dk"), "left")
      .where(col("g").isNull)
      .groupBy(col("fk")).agg(sum(col("v")).as("sv"))
    val coldLeft = qLeft().orderBy("g").collect().toSeq
    val coldRight = qRight().orderBy("g").collect().toSeq
    val coldPost = qPost().orderBy("fk").collect().toSeq
    Reflections.create("r_left", refl(), s"$dir/r_left")
    val pLeft = qLeft().queryExecution.sparkPlan.toString
    assert(pLeft.contains("r_left"), s"left-side residual over LEFT-join MV not served:\n$pLeft")
    assert(qLeft().orderBy("g").collect().toSeq == coldLeft)
    val pRight = qRight().queryExecution.sparkPlan.toString
    assert(!pRight.contains("r_left"),
      s"right-side pre-join filter wrongly replayed against a LEFT-join MV:\n$pRight")
    assert(qRight().orderBy("g").collect().toSeq == coldRight)
    val pPost = qPost().queryExecution.sparkPlan.toString
    assert(pPost.contains("r_left"), s"post-join residual over LEFT-join MV not served:\n$pPost")
    assert(qPost().orderBy("fk").collect().toSeq == coldPost)
    Reflections.clear()
  }

  test("INNER query over a LEFT-join MV: served only with a null-rejecting right residual") {
    import spark.implicits._
    Reflections.clear()
    Reflections.install(spark)
    val dir = Files.createTempDirectory("graft_refl_innerleft").toString
    Seq((1L, 10L), (1L, 20L), (2L, 30L), (3L, 99L))
      .toDF("fk", "v").write.parquet(s"$dir/fact")
    Seq((1L, "a"), (2L, "b")).toDF("dk", "g").write.parquet(s"$dir/dim")
    def fact = spark.read.parquet(s"$dir/fact")
    def dim = spark.read.parquet(s"$dir/dim")
    def refl() = fact.join(dim, col("fk") === col("dk"), "left")
      .groupBy(col("g"), col("fk")).agg(sum(col("v")).as("sv"))
    // inner join + null-rejecting filter on a right grouping column: the
    // residual drops exactly the MV's null-extended rows → sound
    def qInner() = fact.join(dim, col("fk") === col("dk"))
      .where(col("g") === "a")
      .groupBy(col("g")).agg(sum(col("v")).as("sv"))
    val coldInner = qInner().orderBy("g").collect().toSeq
    Reflections.create("r_il", refl(), s"$dir/r_il")
    val pInner = qInner().queryExecution.sparkPlan.toString
    assert(pInner.contains("r_il"),
      s"inner query with null-rejecting residual not served from LEFT-join MV:\n$pInner")
    assert(qInner().orderBy("g").collect().toSeq == coldInner)
    Reflections.clear()

    // adversarial: join on coalesce(dk,-1)=fk so the optimizer cannot infer
    // isnotnull on the right key, and filter g IS NULL (NOT null-rejecting).
    // Without the gate the MV's null-extended group (sv=99) would be served
    // for a true-inner query whose answer is EMPTY.
    Reflections.install(spark)
    def cond = coalesce(col("dk"), lit(-1L)) === col("fk")
    def reflC() = fact.join(dim, cond, "left")
      .groupBy(col("g"), col("fk"), col("dk")).agg(sum(col("v")).as("sv"))
    def qNull() = fact.join(dim, cond)
      .where(col("g").isNull)
      .groupBy(col("fk")).agg(sum(col("v")).as("sv"))
    val coldNull = qNull().orderBy("fk").collect().toSeq
    assert(coldNull.isEmpty, s"fixture: true inner answer must be empty, got $coldNull")
    Reflections.create("r_ilc", reflC(), s"$dir/r_ilc")
    val pNull = qNull().queryExecution.sparkPlan.toString
    assert(!pNull.contains("r_ilc"),
      s"non-null-rejecting residual wrongly served an inner query from a LEFT-join MV:\n$pNull")
    assert(qNull().orderBy("fk").collect().toSeq == coldNull)
    Reflections.clear()
  }

  test("same-schema parquet at a different path is NOT matched (fingerprint includes paths)") {
    Reflections.clear()
    Reflections.install(spark)
    val dir = Files.createTempDirectory("graft_refl_path").toString
    import spark.implicits._
    val a = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    val b = Seq((10L, "p"), (20L, "q")).toDF("id", "v")
    a.write.parquet(s"$dir/a"); b.write.parquet(s"$dir/b")
    // reflection over a simple scan of A; a scan of B has an IDENTICAL
    // schema and plan shape — LogicalRelation.toString omits the path, so a
    // schema-only fingerprint would serve B's query from A's data
    Reflections.create("r_path", spark.read.parquet(s"$dir/a"), s"$dir/r_path")
    val got = spark.read.parquet(s"$dir/b").orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(10L, 20L), s"scan of an unrelated same-schema table was hijacked: $got")
    Reflections.clear()
  }

  test("creating a reflection while another is live registers the TRUE defining plan") {
    Reflections.clear()
    Reflections.install(spark)
    val t = Tables(spark, TestSpark.sf)
    val dir = Files.createTempDirectory("graft_refl_live").toString
    Reflections.create("live_a", aggQuery(), s"$dir/live_a")
    // live_b's defining query would optimize to a scan of live_a's
    // materialization; registration must bypass substitution or live_b's
    // roll-up identity is a reflection scan, not the lineitem aggregate
    Reflections.create("live_b", aggQuery(), s"$dir/live_b")
    Reflections.drop("live_a")
    val q = t.lineitem.groupBy(col("l_returnflag")).agg(sum(col("l_quantity")).as("qty"))
    val planStr = q.queryExecution.sparkPlan.toString
    assert(planStr.contains("/live_b"), s"live_b lost its roll-up identity:\n$planStr")
    Reflections.clear()
  }

  test("one reflection substituted into two subtrees of one query keeps attributes distinct") {
    Reflections.clear()
    Reflections.install(spark)
    val dir = Files.createTempDirectory("graft_refl7").toString
    Reflections.create("r7", aggQuery(), s"$dir/r7")
    // self-join of the accelerated subtree: both sides resolve to the same
    // cached scan, which must be re-instanced (fresh exprIds) per use
    val a = aggQuery().as("a")
    val b = aggQuery().as("b")
    val q = a.join(b, Seq("l_returnflag", "l_linestatus"))
      .select(col("l_returnflag"), (col("a.n") + col("b.n")).as("n2"))
    val planStr = q.queryExecution.sparkPlan.toString
    assert(planStr.contains("/r7"), s"no substitution in:\n$planStr")
    assert(q.collect().nonEmpty)
    Reflections.clear()
  }

  test("ALTER LAKE REFRESH REFLECTIONS: bulk refresh of every reflection anchored on the dataset") {
    import spark.implicits._
    Reflections.clear()
    Reflections.install(spark)
    val lakeDir = Files.createTempDirectory("graft_refl_bulk").toString + "/t"
    spark.sql(s"CREATE LAKE '$lakeDir' AS " +
      "SELECT id, id % 7 AS k, id * 2 AS v FROM range(1000)")
    spark.sql(s"CREATE LAKE VIEW refl_bulk_v FROM '$lakeDir'")
    val mv = Files.createTempDirectory("graft_refl_bulk_mv").toString
    spark.sql(s"CREATE REFLECTION rb_sum USING PATH '$mv/rb_sum' AS " +
      "SELECT k, sum(v) AS sv FROM refl_bulk_v GROUP BY k")
    spark.sql(s"CREATE REFLECTION rb_cnt USING PATH '$mv/rb_cnt' AS " +
      "SELECT k, count(*) AS n FROM refl_bulk_v GROUP BY k")
    // both go stale after an append...
    spark.sql(s"INSERT INTO LAKE '$lakeDir' " +
      "SELECT id, id % 7 AS k, id * 2 AS v FROM range(1000, 1100)")
    def fresh(): Map[String, Boolean] =
      Reflections.list.map(r => r.name -> Reflections.isFresh(spark, r)).toMap
    assert(fresh() == Map("rb_sum" -> false, "rb_cnt" -> false), fresh().toString)
    // ...ONE dataset-scoped statement refreshes both (reference
    // SqlRefreshReflectionsForDataset)
    val refreshed = spark.sql(s"ALTER LAKE '$lakeDir' REFRESH REFLECTIONS")
      .collect().map(_.getString(0)).toSet
    assert(refreshed == Set("rb_sum", "rb_cnt"))
    assert(fresh() == Map("rb_sum" -> true, "rb_cnt" -> true), fresh().toString)
    // a dataset with no anchored reflections refuses loudly
    val empty = Files.createTempDirectory("graft_refl_none").toString + "/t"
    spark.sql(s"CREATE LAKE '$empty' AS SELECT id FROM range(5)")
    assertThrows[Exception](spark.sql(s"ALTER LAKE '$empty' REFRESH REFLECTIONS"))
    spark.sql("DROP REFLECTION rb_sum"); spark.sql("DROP REFLECTION rb_cnt")
    Reflections.clear()
  }

  test("ENABLE|DISABLE RAW|AGGREGATE ACCELERATION: per-dataset, per-kind opt-out of substitution") {
    import spark.implicits._
    Reflections.clear()
    Reflections.install(spark)
    val lakeDir = Files.createTempDirectory("graft_accel_tog").toString + "/t"
    spark.sql(s"CREATE LAKE '$lakeDir' AS " +
      "SELECT id, id % 5 AS k, id * 3 AS v FROM range(500)")
    spark.sql(s"CREATE LAKE VIEW accel_tog_v FROM '$lakeDir'")
    val mv = Files.createTempDirectory("graft_accel_tog_mv").toString
    // one aggregate reflection (Aggregate defining plan)
    spark.sql(s"CREATE REFLECTION tog_agg USING PATH '$mv/agg' AS " +
      "SELECT k, sum(v) AS sv FROM accel_tog_v GROUP BY k")
    val q = "SELECT k, sum(v) AS sv FROM accel_tog_v GROUP BY k"
    def served(): Boolean =
      spark.sql(q).queryExecution.sparkPlan.toString.contains("/agg")
    assert(served(), "aggregate reflection must serve before any toggle")
    // disabling RAW acceleration must NOT affect an aggregate reflection
    spark.sql(s"ALTER LAKE '$lakeDir' DISABLE RAW ACCELERATION")
    assert(served(), "RAW toggle must not gate an aggregate reflection")
    // disabling AGGREGATE acceleration stops substitution without dropping
    spark.sql(s"ALTER LAKE '$lakeDir' DISABLE AGGREGATE ACCELERATION")
    assert(!served(), "aggregate substitution must stop while disabled")
    assert(Reflections.list.exists(_.name == "tog_agg"), "reflection stays registered")
    assert(Reflections.accelToggles(lakeDir) == Set("raw", "aggregate"))
    // results stay correct either way (base-table plan serves)
    assert(spark.sql(q).collect().map(_.getLong(1)).sum ==
      (0L until 500L).map(_ * 3).sum)
    // re-enable restores serving
    spark.sql(s"ALTER LAKE '$lakeDir' ENABLE AGGREGATE ACCELERATION")
    assert(served(), "substitution must resume after ENABLE")
    // unknown kind refuses
    assertThrows[Exception](
      Reflections.setAccelToggle(lakeDir, "fancy", enable = false))
    spark.sql("DROP REFLECTION tog_agg")
    Reflections.clear()
  }

  test("dependency-ordered bulk refresh: upstream first, data flows through the chain, cycles refuse") {
    Reflections.clear()
    Reflections.install(spark)
    val root = Files.createTempDirectory("graft_refl_dep").toString
    val t = s"$root/t"
    spark.sql(s"CREATE LAKE '$t' AS SELECT id, id % 5 AS k, id AS v FROM range(100)")
    // A aggregates the base table; B aggregates A's MATERIALIZATION —
    // the reference DependencyGraph shape (B must rebuild after A)
    spark.sql(s"CREATE REFLECTION dep_a USING PATH '$root/mv/a' AS " +
      s"SELECT k, sum(v) AS sv FROM lake_scan('$t') GROUP BY k")
    spark.sql(s"CREATE REFLECTION dep_b USING PATH '$root/mv/b' AS " +
      s"SELECT sum(sv) AS total FROM parquet.`$root/mv/a`")
    assert(Reflections.dependencies()("dep_b") == Set("dep_a"))
    assert(Reflections.dependencies()("dep_a") == Set.empty)
    // one statement refreshes the whole chain, upstream first
    spark.sql(s"INSERT INTO LAKE '$t' SELECT id, id % 5 AS k, id AS v FROM range(100, 150)")
    val order = spark.sql("REFRESH REFLECTIONS").collect().map(_.getString(0)).toSeq
    assert(order.indexOf("dep_a") >= 0 && order.indexOf("dep_b") > order.indexOf("dep_a"),
      s"upstream must refresh first: $order")
    // ...and B's data went THROUGH refreshed A: total = sum over 150 rows
    val total = spark.read.parquet(s"$root/mv/b").head().getLong(0)
    assert(total == (0L until 150L).sum, s"stale chain: $total")
    // a cycle refuses loudly, naming its members: redefine A (at its SAME
    // materialization path, which B reads) to read B's materialization
    spark.sql("DROP REFLECTION dep_a")
    spark.sql(s"CREATE REFLECTION dep_a USING PATH '$root/mv/a' AS " +
      s"SELECT total AS t2 FROM parquet.`$root/mv/b`")
    val e = intercept[Exception](spark.sql("REFRESH REFLECTIONS").collect())
    assert(e.getMessage != null && e.getMessage.contains("cycle"), e.toString)
    Reflections.clear()
  }

  test("LOAD MATERIALIZATION: out-of-band rebuild taken live after validation") {
    Reflections.clear()
    Reflections.install(spark)
    import spark.implicits._
    val root = Files.createTempDirectory("graft_refl_load").toString
    val mv = s"$root/mv"
    // the materialization is OWNED by an upstream job (external shape)
    Seq((1L, 10L), (2L, 20L)).toDF("k", "sv").write.parquet(mv)
    spark.sql(s"CREATE LAKE '$root/t' AS SELECT id % 3 AS k, id AS v FROM range(30)")
    Reflections.createExternal("ld_r",
      spark.sql(s"SELECT k, sum(v) AS sv FROM lake_scan('$root/t') GROUP BY k"),
      mv, Some(s"SELECT k, sum(v) AS sv FROM lake_scan('$root/t') GROUP BY k"))
    // upstream rebuilds the materialization out of band...
    Seq((1L, 11L), (2L, 21L), (3L, 31L)).toDF("k", "sv")
      .write.mode("overwrite").parquet(mv)
    // ...LOAD takes it live: the substituted answer shows the NEW rows
    val row = spark.sql("LOAD MATERIALIZATION ld_r").head()
    assert(row.getString(0) == "ld_r")
    val served = spark.sql(s"SELECT k, sum(v) AS sv FROM lake_scan('$root/t') GROUP BY k")
    assert(served.queryExecution.sparkPlan.toString.contains("/mv"),
      "must serve from the materialization")
    assert(served.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 11L), (2L, 21L), (3L, 31L)))
    // a broken rebuild (missing defining columns) refuses and changes nothing
    Seq((1L, "x")).toDF("k", "other").write.mode("overwrite").parquet(s"$root/mv2")
    val r0 = Reflections.list.find(_.name == "ld_r").get
    Seq((9L, "y")).toDF("wrong", "cols").write.mode("overwrite").parquet(mv)
    val e = intercept[Exception](spark.sql("LOAD MATERIALIZATION ld_r").collect())
    assert(e.getMessage.contains("lacks columns"), e.getMessage)
    assert(Reflections.list.find(_.name == "ld_r").get.baseVersions == r0.baseVersions)
    intercept[Exception](spark.sql("LOAD MATERIALIZATION nope").collect())
    Reflections.clear()
  }

  test("MAINTAIN REFLECTIONS: refresh-period metadata honored, current goals untouched") {
    Reflections.clear()
    Reflections.install(spark)
    val root = Files.createTempDirectory("graft_refl_maint").toString
    spark.sql(s"CREATE LAKE '$root/t' AS SELECT id, id % 3 AS k FROM range(30)")
    spark.sql(s"CREATE REFLECTION mnt_a USING PATH '$root/mv/a' AS " +
      s"SELECT k, count(*) AS n FROM lake_scan('$root/t') GROUP BY k")
    // no policy → MAINTAIN is a no-op on it (manual reflections are the
    // operator's business)
    val none = spark.sql("MAINTAIN REFLECTIONS").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(none("mnt_a") == "current")
    // policy set, but the goal was just refreshed → still current
    spark.sql("ALTER REFLECTION mnt_a REFRESH EVERY 5 MINUTES")
    assert(Reflections.refreshPolicyOf("mnt_a").contains(5L))
    val fresh = spark.sql("MAINTAIN REFLECTIONS").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(fresh("mnt_a") == "current")
    // age the goal past its period → MAINTAIN refreshes it
    Reflections.noteRefreshed("mnt_a", System.currentTimeMillis() - 6 * 60000L)
    val due = spark.sql("MAINTAIN REFLECTIONS").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(due("mnt_a") == "refreshed", due.toString)
    // MANUAL clears the policy; unknown reflection refuses
    spark.sql("ALTER REFLECTION mnt_a REFRESH MANUAL")
    assert(Reflections.refreshPolicyOf("mnt_a").isEmpty)
    intercept[Exception](
      spark.sql("ALTER REFLECTION nope REFRESH EVERY 1 MINUTES"))
    Reflections.clear()
  }

  test("maintenance refreshes as SYSTEM; a due API reflection reports skipped, not current") {
    Reflections.clear()
    Reflections.install(spark)
    val priv = graft.auth.Privileges
    val root = Files.createTempDirectory("graft_refl_sys").toString
    spark.sql(s"CREATE LAKE '$root/t' AS SELECT id, id % 3 AS k FROM range(30)")
    spark.sql(s"CREATE REFLECTION sysctx_r USING PATH '$root/mv/r' AS " +
      s"SELECT k, count(*) AS n FROM lake_scan('$root/t') GROUP BY k")
    priv.clear()
    try {
      // maintenance is an ADMIN statement (it runs every goal's stored
      // SQL under SYSTEM, so the statement itself must not be reachable
      // by arbitrary principals) — a grantless user is refused outright
      spark.sql("CREATE USER refl_admin PASSWORD 'rp' ADMIN")
      spark.sql("CREATE USER refl_cron PASSWORD 'cp'")
      spark.sql("ALTER AUTH ENFORCE ON")
      spark.sql("AUTHENTICATE USER refl_cron PASSWORD 'cp'")
      intercept[Exception](spark.sql("REFRESH REFLECTIONS").collect())
      intercept[Exception](spark.sql("MAINTAIN REFLECTIONS").collect())
      // the ADMIN cron principal refreshes; the stored SQL (authorized at
      // CREATE time) runs under SYSTEM — the reference manager's contract
      spark.sql("AUTHENTICATE USER refl_admin PASSWORD 'rp'")
      val res = spark.sql("REFRESH REFLECTIONS").collect()
        .map(r => (r.getString(0), r.getString(1))).toMap
      assert(res("sysctx_r") == "refreshed", res.toString)
      spark.sql("ALTER AUTH ENFORCE OFF")
    } finally {
      priv.clear()
      spark.conf.unset(priv.TokenConf)
      spark.conf.unset(priv.UserConf)
    }
    // a DUE API-created reflection (no stored SQL) is due-but-unrefreshable:
    // MAINTAIN must say so instead of reporting it 'current'
    import spark.implicits._
    Reflections.create("sysctx_api",
      spark.sql(s"SELECT k, count(*) AS n FROM lake_scan('$root/t') GROUP BY k"),
      s"$root/mv/api")
    Reflections.setRefreshPolicy("sysctx_api", Some(1L))
    Reflections.noteRefreshed("sysctx_api", System.currentTimeMillis() - 10 * 60000L)
    val m = spark.sql("MAINTAIN REFLECTIONS").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(m("sysctx_api") == "skipped: no stored SQL", m.toString)
    Reflections.clear()
  }

  test("refresh re-checks the creating principal: revoked SELECT stops SYSTEM-identity refresh") {
    // refreshChain runs stored SQL as SYSTEM (a cron user without base
    // grants must not poison the chain) — so the CREATE-time
    // authorization is re-validated first: a creator whose SELECT was
    // revoked, or who was dropped, must not keep their reflection
    // refreshing through the SYSTEM identity (definer-rights leak)
    val P = graft.auth.Privileges
    Reflections.clear(); P.clear()
    Reflections.install(spark)
    val root = Files.createTempDirectory("graft_refl_owner").toString
    val t = s"$root/t"
    spark.sql(s"CREATE LAKE '$t' AS SELECT id, id % 5 AS k, id AS v FROM range(100)")
    try {
      spark.sql("CREATE USER adm PASSWORD 'ap' ADMIN")
      spark.sql("CREATE USER eve PASSWORD 'ep'")
      spark.sql(s"GRANT SELECT ON '$t' TO USER eve")
      spark.sql("ALTER AUTH ENFORCE ON")
      spark.sql("AUTHENTICATE USER eve PASSWORD 'ep'")
      spark.sql(s"CREATE REFLECTION own_r USING PATH '$root/mv/r' AS " +
        s"SELECT k, sum(v) AS sv FROM lake_scan('$t') GROUP BY k")
      // the admin's own goal rides the same chain and must keep working
      spark.sql("AUTHENTICATE USER adm PASSWORD 'ap'")
      spark.sql(s"CREATE REFLECTION adm_r USING PATH '$root/mv/a' AS " +
        s"SELECT count(1) AS n FROM lake_scan('$t')")
      def chain(): Map[String, String] = spark.sql("REFRESH REFLECTIONS")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      val before = chain()
      assert(before("own_r") == "refreshed" && before("adm_r") == "refreshed",
        before.toString)
      // revoke the creator's SELECT → her goal stops; the admin's stays
      spark.sql(s"REVOKE SELECT ON '$t' FROM USER eve")
      val revoked = chain()
      assert(revoked("own_r").startsWith("skipped: privileges revoked"),
        revoked.toString)
      assert(revoked("adm_r") == "refreshed", revoked.toString)
      // re-granting restores maintenance — the skip is a gate, not a tomb
      spark.sql(s"GRANT SELECT ON '$t' TO USER eve")
      assert(chain()("own_r") == "refreshed")
      // a DROPPED creator is a revocation too
      spark.sql("DROP USER eve")
      assert(chain()("own_r").startsWith("skipped: privileges revoked"))
    } finally {
      Reflections.clear(); P.clear()
      spark.conf.unset(P.TokenConf)
      spark.conf.unset(P.UserConf)
    }
  }
}
