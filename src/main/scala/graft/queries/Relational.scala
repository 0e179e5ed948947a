package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Operator-inventory coverage: one named query per SURVEY §2 row, each
  * shaped to force the specific Spark operator (verified via plan-shape
  * specs in OperatorPlanSpec) and hash-matched against DuckDB.
  *
  * Reference anchors per group:
  *  - joins: dremio-oss `sabot/op/join/` (vhash/merge/nlje — SURVEY §2.3)
  *  - aggs: `sabot/op/aggregate/` + GROUPING SETS via Calcite expansion
  *    (`AggregatePrel.java:83`, SURVEY §2.4)
  *  - windows: `sabot/op/windowframe/WindowFrameOperator.java:56` (§2.5)
  *  - sort/limit/topn/sample/setops: §2.6
  */
object Relational {

  // ---------- joins (SURVEY §2.3) ----------

  /** Inner equi-join, shuffle-hash strategy (reference default:
    * VectorizedHashJoinOperator). */
  val joinInnerHash: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    t.lineitem.hint("shuffle_hash")
      .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("n_items"), dbl(sum(money(col("l_extendedprice")))).as("total"))
      .orderBy(col("s_name"))
  }
  val joinInnerHashSql: String = """
    SELECT s_name, COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_name ORDER BY s_name"""

  /** Sort-merge join (reference MergeJoinOperator.java:56). */
  val joinMerge: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    t.orders.hint("merge")
      .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), dbl(sum(col("l_quantity"))).as("qty"))
      .orderBy(col("o_orderstatus"))
  }
  val joinMergeSql: String = """
    SELECT o_orderstatus, COUNT(*) AS n, CAST(SUM(l_quantity) AS DOUBLE) AS qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderstatus ORDER BY o_orderstatus"""

  /** Broadcast hash join, explicit hint (reference HashJoinPrule
    * BROADCAST_INSTANCE). */
  val joinBroadcast: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    t.lineitem
      .join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"))
      .orderBy(col("p_brand"))
  }
  val joinBroadcastSql: String = """
    SELECT p_brand, COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand ORDER BY p_brand"""

  /** LEFT OUTER join keeping unmatched left rows. */
  val joinLeftOuter: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    t.customer
      .join(t.orders.filter(col("o_totalprice") > 300000.0),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_rows"), count(col("o_orderkey")).as("n_orders"))
      .orderBy(col("c_mktsegment"))
  }
  val joinLeftOuterSql: String = """
    SELECT c_mktsegment, COUNT(*) AS n_rows, COUNT(o_orderkey) AS n_orders
    FROM customer LEFT OUTER JOIN orders
      ON c_custkey = o_custkey AND o_totalprice > 300000.0
    GROUP BY c_mktsegment ORDER BY c_mktsegment"""

  /** RIGHT OUTER join (parts with no lineitems survive). */
  val joinRightOuter: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    t.lineitem
      .join(t.part, col("l_partkey") === col("p_partkey"), "right_outer")
      .groupBy(col("p_size"))
      .agg(count(col("l_orderkey")).as("n_lineitems"), count(lit(1)).as("n_rows"))
      .orderBy(col("p_size"))
  }
  val joinRightOuterSql: String = """
    SELECT p_size, COUNT(l_orderkey) AS n_lineitems, COUNT(*) AS n_rows
    FROM lineitem RIGHT OUTER JOIN part ON l_partkey = p_partkey
    GROUP BY p_size ORDER BY p_size"""

  /** FULL OUTER join with unmatched rows on both sides. */
  val joinFullOuter: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val bigCust = t.customer.filter(col("c_acctbal") > 9000.0)
      .select(col("c_custkey"), col("c_nationkey"))
    val recentOrders = t.orders.filter(col("o_orderdate") >= tsLit("2001-01-01"))
      .select(col("o_custkey"), col("o_orderkey"))
    bigCust.join(recentOrders, col("c_custkey") === col("o_custkey"), "full_outer")
      .agg(count(lit(1)).as("n_rows"),
        count(col("c_custkey")).as("n_left"),
        count(col("o_orderkey")).as("n_right"),
        sum(when(col("c_custkey").isNull, 1).otherwise(0)).as("right_only"),
        sum(when(col("o_orderkey").isNull, 1).otherwise(0)).as("left_only"))
  }
  val joinFullOuterSql: String = """
    SELECT COUNT(*) AS n_rows, COUNT(c_custkey) AS n_left, COUNT(o_orderkey) AS n_right,
           CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS right_only,
           CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS left_only
    FROM (SELECT c_custkey, c_nationkey FROM customer WHERE c_acctbal > 9000.0) bc
    FULL OUTER JOIN (SELECT o_custkey, o_orderkey FROM orders
                     WHERE o_orderdate >= TIMESTAMP '2001-01-01') ro
      ON c_custkey = o_custkey"""

  /** Cross join (reference NLJEOperator cartesian path). */
  val joinCross: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    t.region.crossJoin(t.customer.select(col("c_mktsegment")).distinct())
      .select(col("r_name"), col("c_mktsegment"))
      .orderBy(col("r_name"), col("c_mktsegment"))
  }
  val joinCrossSql: String = """
    SELECT r_name, c_mktsegment
    FROM region CROSS JOIN (SELECT DISTINCT c_mktsegment FROM customer) s
    ORDER BY r_name, c_mktsegment"""

  /** Theta (non-equi) join — reference plans these on NLJEOperator
    * (`sabot/op/join/nlje/NLJEOperator.java:64`); Spark:
    * BroadcastNestedLoopJoin. */
  val joinTheta: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val n1 = t.nation.select(col("n_nationkey").as("a_key"), col("n_regionkey").as("a_region"))
    val n2 = t.nation.select(col("n_nationkey").as("b_key"), col("n_regionkey").as("b_region"))
    n1.join(n2, col("a_key") < col("b_key") && col("a_region") === col("b_region"))
      .groupBy(col("a_region"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("a_region"))
  }
  val joinThetaSql: String = """
    SELECT n1.n_regionkey AS a_region, COUNT(*) AS n_pairs
    FROM nation n1 JOIN nation n2
      ON n1.n_nationkey < n2.n_nationkey AND n1.n_regionkey = n2.n_regionkey
    GROUP BY n1.n_regionkey ORDER BY a_region"""

  /** Pure non-equi (theta) join — no equi-conjunct to extract, so Spark
    * must plan a nested-loop join (reference NLJEOperator). */
  val joinNonEquiNlj: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val r1 = t.region.select(col("r_regionkey").as("a_key"))
    val r2 = t.region.select(col("r_regionkey").as("b_key"))
    r1.join(r2, col("a_key") < col("b_key"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("a_key") * col("b_key")).as("keyprod"))
  }
  val joinNonEquiNljSql: String = """
    SELECT COUNT(*) AS n_pairs, CAST(SUM(r1.r_regionkey * r2.r_regionkey) AS BIGINT) AS keyprod
    FROM region r1 JOIN region r2 ON r1.r_regionkey < r2.r_regionkey"""

  // ---------- aggregation (SURVEY §2.4) ----------

  /** ROLLUP (Calcite expands before physical planning in the reference —
    * AggregatePrel.java:83; Spark: Expand node). */
  val aggRollup: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    t.orders
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dbl(sum(money(col("o_totalprice")))).as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
        coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
        col("n"), col("total"))
      .orderBy(col("status"), col("priority"))
  }
  val aggRollupSql: String = """
    SELECT COALESCE(o_orderstatus, '(all)') AS status,
           COALESCE(o_orderpriority, '(all)') AS priority,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY status, priority"""

  /** CUBE. */
  val aggCube: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    t.lineitem
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dbl(sum(col("l_quantity"))).as("qty"))
      .select(
        coalesce(col("l_returnflag"), lit("(all)")).as("rf"),
        coalesce(col("l_linestatus"), lit("(all)")).as("ls"),
        col("n"), col("qty"))
      .orderBy(col("rf"), col("ls"))
  }
  val aggCubeSql: String = """
    SELECT COALESCE(l_returnflag, '(all)') AS rf,
           COALESCE(l_linestatus, '(all)') AS ls,
           COUNT(*) AS n, CAST(SUM(l_quantity) AS DOUBLE) AS qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY rf, ls"""

  /** GROUPING SETS with GROUPING() marker, via the SQL entry point. */
  val aggGroupingSets: QueryFn = (s, dir) => {
    Tables.ensure(s, dir)
    s.sql("""
      SELECT COALESCE(c_mktsegment, '(all)') AS seg,
             COALESCE(CAST(c_nationkey AS STRING), '(all)') AS nat,
             CAST(GROUPING(c_mktsegment) AS INT) AS g_seg,
             COUNT(*) AS n,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS bal
      FROM customer
      GROUP BY GROUPING SETS ((c_mktsegment, c_nationkey), (c_mktsegment), ())
      ORDER BY seg, nat""")
  }
  val aggGroupingSetsSql: String = """
    SELECT COALESCE(c_mktsegment, '(all)') AS seg,
           COALESCE(CAST(c_nationkey AS VARCHAR), '(all)') AS nat,
           CAST(GROUPING(c_mktsegment) AS INT) AS g_seg,
           COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS bal
    FROM customer
    GROUP BY GROUPING SETS ((c_mktsegment, c_nationkey), (c_mktsegment), ())
    ORDER BY seg, nat"""

  /** Multiple DISTINCT aggregates (reference:
    * DremioExpandDistinctAggregatesRule; Spark: Expand-based rewrite). */
  val aggDistinct: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    // spread: the Expand (×3 for the three distinct groupings) fuses into
    // the single-split scan; every aggregate here is an integer count, so
    // partition order cannot change a value (guide §2 — scale-adaptive)
    graft.engine.Parallelism.spread(
        t.lineitem.select(col("l_returnflag"), col("l_partkey"), col("l_suppkey")))
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("nd_parts"),
        countDistinct(col("l_suppkey")).as("nd_supps"),
        countDistinct(col("l_partkey"), col("l_suppkey")).as("nd_pairs"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }
  val aggDistinctSql: String = """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS nd_parts,
           COUNT(DISTINCT l_suppkey) AS nd_supps,
           COUNT(DISTINCT (l_partkey, l_suppkey)) AS nd_pairs,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** Statistical aggregates reduced to exact sum/count combos — the same
    * reduction the reference planner applies
    * (`DremioAggregateReduceFunctionsRule.java:34`), done here with decimal
    * sums so both engines agree bit-for-bit. */
  val aggStats: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val x = money(col("l_extendedprice"))
    val q = money(col("l_quantity"))
    // Moment stats run over small-magnitude columns (quantity ≤ 50,
    // linenumber ≤ 7): every exact decimal intermediate — including
    // n·Sab − Sa·Sb — stays below 2^53, so the decimal→double conversion
    // is value-preserving in ANY implementation. (Large-magnitude columns
    // like price² produce >17-digit decimals whose double conversion is
    // not correctly rounded in every engine — price gets mean only.)
    val qd = col("l_quantity").cast("decimal(4,0)")
    val ld = col("l_linenumber").cast("decimal(4,0)")
    t.lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(x).cast("decimal(18,2)").as("sp"),
        sum(qd).cast("decimal(12,0)").as("sq"),
        sum(qd * qd).cast("decimal(14,0)").as("sqq"),
        sum(ld).cast("decimal(12,0)").as("sl"),
        sum(ld * ld).cast("decimal(14,0)").as("sll"),
        sum(qd * ld).cast("decimal(14,0)").as("sql_"))
      .withColumn("nd", col("n").cast("decimal(7,0)"))
      .withColumn("m2q", dbl(col("nd") * col("sqq") - col("sq") * col("sq")))
      .withColumn("m2l", dbl(col("nd") * col("sll") - col("sl") * col("sl")))
      .withColumn("m2ql", dbl(col("nd") * col("sql_") - col("sq") * col("sl")))
      .withColumn("denom", dbl(col("nd") * (col("nd") - 1)))
      .select(
        col("l_returnflag"),
        col("n"),
        (dbl(col("sp")) / col("n")).as("mean_price"),
        (dbl(col("sq")) / col("n")).as("mean_qty"),
        (col("m2q") / col("denom")).as("var_qty"),
        sqrt(col("m2q") / col("denom")).as("stddev_qty"),
        (col("m2ql") / col("denom")).as("covar_ql"),
        (col("m2ql") / (sqrt(col("m2q")) * sqrt(col("m2l")))).as("corr_ql"))
      .orderBy(col("l_returnflag"))
  }
  val aggStatsSql: String = """
    WITH sums AS (
      SELECT l_returnflag, COUNT(*) AS n,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(19,2)) AS sp,
        CAST(SUM(CAST(l_quantity AS DECIMAL(4,0))) AS DECIMAL(19,0)) AS sq,
        CAST(SUM(CAST(l_quantity AS DECIMAL(4,0)) * CAST(l_quantity AS DECIMAL(4,0))) AS DECIMAL(19,0)) AS sqq,
        CAST(SUM(CAST(l_linenumber AS DECIMAL(4,0))) AS DECIMAL(19,0)) AS sl,
        CAST(SUM(CAST(l_linenumber AS DECIMAL(4,0)) * CAST(l_linenumber AS DECIMAL(4,0))) AS DECIMAL(19,0)) AS sll,
        CAST(SUM(CAST(l_quantity AS DECIMAL(4,0)) * CAST(l_linenumber AS DECIMAL(4,0))) AS DECIMAL(19,0)) AS sql_
      FROM lineitem GROUP BY l_returnflag),
    moments AS (
      SELECT l_returnflag, n, CAST(sp AS DOUBLE) AS spd, CAST(sq AS DOUBLE) AS sqd,
        CAST(CAST(n AS DECIMAL(7,0))*sqq - sq*sq AS DOUBLE) AS m2q,
        CAST(CAST(n AS DECIMAL(7,0))*sll - sl*sl AS DOUBLE) AS m2l,
        CAST(CAST(n AS DECIMAL(7,0))*sql_ - sq*sl AS DOUBLE) AS m2ql,
        CAST(CAST(n AS DECIMAL(7,0))*(CAST(n AS DECIMAL(7,0))-1) AS DOUBLE) AS denom
      FROM sums)
    SELECT l_returnflag, n,
      spd/n AS mean_price,
      sqd/n AS mean_qty,
      m2q/denom AS var_qty,
      sqrt(m2q/denom) AS stddev_qty,
      m2ql/denom AS covar_ql,
      m2ql/(sqrt(m2q)*sqrt(m2l)) AS corr_ql
    FROM moments ORDER BY l_returnflag"""

  /** LISTAGG / ARRAY_AGG with deterministic WITHIN-GROUP ordering
    * (reference ListAggAccumulator / arrayagg — SURVEY §2.4). */
  val aggListagg: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    t.nation
      .groupBy(col("n_regionkey"))
      .agg(
        array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"),
        count(lit(1)).as("n"))
      .orderBy(col("n_regionkey"))
  }
  val aggListaggSql: String = """
    SELECT n_regionkey, STRING_AGG(n_name, ',' ORDER BY n_name) AS nations, COUNT(*) AS n
    FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"""

  /** LISTAGG ... WITHIN GROUP (ORDER BY ...) — the reference's ordered
    * string aggregation, via Spark 4's native listagg. */
  val aggListaggWithinGroup: QueryFn = (s, dir) => {
    Tables.ensure(s, dir)
    s.sql("""
      SELECT n_regionkey,
             listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS nations
      FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""")
  }
  val aggListaggWithinGroupSql: String = """
    SELECT n_regionkey, STRING_AGG(n_name, ',' ORDER BY n_name) AS nations
    FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"""

  /** NDV via HLL sketch (reference NdvAccumulators/HLL —
    * approximate, so rows-only check; exact companion is aggDistinct). */
  val aggNdvSketch: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    t.lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        hll_sketch_estimate(hll_sketch_agg(col("l_partkey"))).as("ndv_parts"),
        approx_count_distinct(col("l_suppkey")).as("ndv_supps"))
      .orderBy(col("l_returnflag"))
  }

  /** Mergeable-sketch pipeline: per-group HLL sketches unioned to a total
    * (reference HLL / HLL_MERGE / HLL_DECODE surface). Rows-only. */
  val aggHllMerge: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    t.lineitem
      .groupBy(col("l_returnflag"))
      .agg(hll_sketch_agg(col("l_partkey")).as("sketch"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("ndv_total"))
  }

  /** APPROX_PERCENTILE (reference t-digest surface; Spark uses
    * KLL/QuantileSummaries — same contract, different sketch → rows-only)
    * alongside exact interpolated percentiles. */
  val aggPercentileApprox: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    t.lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("median_approx"),
        percentile_approx(col("l_extendedprice"), lit(0.95), lit(10000)).as("p95_approx"))
      .orderBy(col("l_returnflag"))
  }

  /** Boolean / bitwise aggregates (reference BooleanAggrFunctions.java +
    * AggrBitwiseLogicalTypeFunctions templates). */
  val aggBoolBit: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    t.lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        bool_and(col("l_quantity") > 0).as("all_positive"),
        bool_or(col("l_discount") > 0.09).as("any_high_disc"),
        bit_and(col("l_linenumber")).as("band"),
        bit_or(col("l_linenumber")).as("bor"),
        bit_xor(col("l_linenumber")).as("bxor"))
      .orderBy(col("l_returnflag"))
  }
  val aggBoolBitSql: String = """
    SELECT l_returnflag,
      BOOL_AND(l_quantity > 0) AS all_positive,
      BOOL_OR(l_discount > 0.09) AS any_high_disc,
      CAST(BIT_AND(l_linenumber) AS INT) AS band,
      CAST(BIT_OR(l_linenumber) AS INT) AS bor,
      CAST(BIT_XOR(l_linenumber) AS INT) AS bxor
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** Exact interpolated percentiles (reference MEDIAN/PERCENTILE_CONT via
    * t-digest; here the exact form — both engines interpolate identically). */
  val aggPercentileExact: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    t.lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5)").as("median_qty"),
        expr("percentile(l_quantity, array(0.25, 0.75))[0]").as("q1_qty"))
      .orderBy(col("l_returnflag"))
  }
  val aggPercentileExactSql: String = """
    SELECT l_returnflag,
      quantile_cont(l_quantity, 0.5) AS median_qty,
      quantile_cont(l_quantity, 0.25) AS q1_qty
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  // ---------- windows (SURVEY §2.5) ----------

  /** Ranking family over partition-sorted input (WindowFunction.java:55-65:
    * RANK/DENSE_RANK/PERCENT_RANK/CUME_DIST). */
  val windowRanking: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("o_orderstatus"))
    t.orders.select(
      col("o_orderkey"), col("o_orderpriority"), col("o_orderstatus"),
      rank().over(w).as("rnk"),
      dense_rank().over(w).as("drnk"),
      percent_rank().over(w).as("prnk"),
      cume_dist().over(w).as("cd"))
      .orderBy(col("o_orderkey"))
  }
  val windowRankingSql: String = """
    SELECT o_orderkey, o_orderpriority, o_orderstatus,
      RANK() OVER w AS rnk, DENSE_RANK() OVER w AS drnk,
      PERCENT_RANK() OVER w AS prnk, CUME_DIST() OVER w AS cd
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderstatus)
    ORDER BY o_orderkey"""

  /** NTILE bucketing (reference WindowFunction NTILE) — the remaining
    * member of the distribution-window family. The ORDER BY carries a
    * unique tiebreak (o_orderkey): NTILE assigns by row position, so a
    * nondeterministic order within equal keys would flip bucket
    * assignments between engines. */
  val windowNtile: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    t.orders.select(
      col("o_orderkey"), col("o_orderpriority"),
      ntile(8).over(w).as("oct"),
      ntile(100).over(w).as("pctile"))
      .orderBy(col("o_orderkey"))
  }
  val windowNtileSql: String = """
    SELECT o_orderkey, o_orderpriority,
      CAST(NTILE(8) OVER w AS INT) AS oct,
      CAST(NTILE(100) OVER w AS INT) AS pctile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_orderkey"""

  /** ROW_NUMBER top-N per group (reference TopN + window pattern). */
  val windowTopnPerGroup: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t.orders
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("rn"))
      .orderBy(col("o_custkey"), col("rn"))
  }
  val windowTopnPerGroupSql: String = """
    SELECT o_custkey, o_orderkey, o_orderdate, rn
    FROM (SELECT o_custkey, o_orderkey, o_orderdate,
            ROW_NUMBER() OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey) AS rn
          FROM orders) x
    WHERE rn <= 3 ORDER BY o_custkey, rn"""

  /** QUALIFY clause (graft parser rewrite; Dremio/Snowflake/DuckDB
    * syntax Spark lacks): filter on a window over post-grouping rows,
    * referencing a select-list alias. DuckDB runs QUALIFY natively, so
    * the oracle is the same clause — the rewrite is proven against a
    * real QUALIFY implementation, not a hand-translated subquery. */
  val windowQualify: QueryFn = (s, dir) => {
    Tables.ensure(s, dir)
    s.sql("""
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders QUALIFY rk <= 5
      ORDER BY o_orderpriority, rk""")
  }
  val windowQualifySql: String = """
    SELECT o_orderpriority, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice DESC, o_orderkey) AS rk
    FROM orders QUALIFY rk <= 5
    ORDER BY o_orderpriority, rk"""

  /** LEAD/LAG/FIRST_VALUE/LAST_VALUE/NTH_VALUE/NTILE. */
  val windowLeadLag: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t.orders.select(
      col("o_custkey"), col("o_orderkey"),
      lag(col("o_totalprice"), 1, 0.0).over(w).as("prev_price"),
      lead(col("o_totalprice"), 1, 0.0).over(w).as("next_price"),
      first_value(col("o_orderkey")).over(wFull).as("first_order"),
      last_value(col("o_orderkey")).over(wFull).as("last_order"),
      nth_value(col("o_orderkey"), 2).over(wFull).as("second_order"),
      ntile(4).over(w).as("quartile"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }
  val windowLeadLagSql: String = """
    SELECT o_custkey, o_orderkey,
      LAG(o_totalprice, 1, 0.0) OVER w AS prev_price,
      LEAD(o_totalprice, 1, 0.0) OVER w AS next_price,
      FIRST_VALUE(o_orderkey) OVER wf AS first_order,
      LAST_VALUE(o_orderkey) OVER wf AS last_order,
      NTH_VALUE(o_orderkey, 2) OVER wf AS second_order,
      NTILE(4) OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY o_custkey, o_orderkey"""

  /** Framed aggregates, ROWS frame (WindowPOP.java:39 frameUnitsRows=true):
    * running totals via decimal sums for cross-engine exactness. */
  val windowRowsFrame: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wSlide = w.rowsBetween(-2, 0)
    t.orders.select(
      col("o_custkey"), col("o_orderkey"),
      dbl(sum(money(col("o_totalprice"))).over(wRun)).as("running_total"),
      count(lit(1)).over(wRun).as("running_n"),
      dbl(sum(money(col("o_totalprice"))).over(wSlide)).as("sliding3_total"),
      dbl(min(money(col("o_totalprice"))).over(wRun)).as("running_min"),
      dbl(max(money(col("o_totalprice"))).over(wRun)).as("running_max"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }
  val windowRowsFrameSql: String = """
    SELECT o_custkey, o_orderkey,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER wr AS DOUBLE) AS running_total,
      COUNT(*) OVER wr AS running_n,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER ws AS DOUBLE) AS sliding3_total,
      CAST(MIN(CAST(o_totalprice AS DECIMAL(12,2))) OVER wr AS DOUBLE) AS running_min,
      CAST(MAX(CAST(o_totalprice AS DECIMAL(12,2))) OVER wr AS DOUBLE) AS running_max
    FROM orders
    WINDOW wr AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      ws AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    ORDER BY o_custkey, o_orderkey"""

  /** RANGE frame with value offset (frameUnitsRows=false). */
  val windowRangeFrame: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val w = Window.partitionBy(col("l_returnflag")).orderBy(col("l_orderkey"))
      .rangeBetween(-100, 0)
    t.lineitem
      .filter(col("l_orderkey") <= 1000)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        count(lit(1)).over(w).as("n_in_range"),
        dbl(sum(col("l_quantity")).over(w)).as("qty_in_range"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
  }
  val windowRangeFrameSql: String = """
    SELECT l_orderkey, l_linenumber, l_returnflag,
      COUNT(*) OVER w AS n_in_range,
      CAST(SUM(l_quantity) OVER w AS DOUBLE) AS qty_in_range
    FROM lineitem WHERE l_orderkey <= 1000
    WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_orderkey
                 RANGE BETWEEN 100 PRECEDING AND CURRENT ROW)
    ORDER BY l_orderkey, l_linenumber, l_returnflag"""

  // ---------- sort / limit / topn / sample / setops (SURVEY §2.6) ----------

  /** Global multi-key sort with explicit NULL placement (reference defaults
    * NULLS LAST on ASC — SURVEY §7.4; Spark default is NULLS FIRST, so the
    * ordering is pinned explicitly). */
  val sortMultiNulls: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    t.lineitem
      .select(col("l_orderkey"), col("l_linenumber"),
        nullif(col("l_returnflag"), lit("N")).as("rf_nullable"),
        col("l_quantity"))
      .orderBy(col("rf_nullable").asc_nulls_last, col("l_quantity").desc,
        col("l_orderkey"), col("l_linenumber"))
      .limit(500)
  }
  val sortMultiNullsSql: String = """
    SELECT l_orderkey, l_linenumber,
           NULLIF(l_returnflag, 'N') AS rf_nullable, l_quantity
    FROM lineitem
    ORDER BY rf_nullable ASC NULLS LAST, l_quantity DESC, l_orderkey, l_linenumber
    LIMIT 500"""

  /** Top-K: order+limit lowers to TakeOrderedAndProject (reference
    * TopNOperator.java:58). */
  val topkOrders: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    t.orders
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select(col("o_orderkey"), col("o_totalprice"))
      .limit(25)
  }
  val topkOrdersSql: String = """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 25"""

  /** OFFSET + FETCH (reference LimitOperator offset+fetch). */
  val limitOffset: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    t.orders
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select(col("o_orderkey"), col("o_totalprice"))
      .offset(10).limit(50)
  }
  val limitOffsetSql: String = """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 50 OFFSET 10"""

  /** Deterministic systematic sample (key-mod predicate — reproducible on
    * both engines; seeded Bernoulli TABLESAMPLE is inherently
    * engine-specific, exercised rows-only in sampleBernoulli). */
  val sampleSystematic: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    t.lineitem
      .filter(col("l_orderkey") % 97 === 0)
      .agg(count(lit(1)).as("n"), dbl(sum(col("l_quantity"))).as("qty"))
  }
  val sampleSystematicSql: String = """
    SELECT COUNT(*) AS n, CAST(SUM(l_quantity) AS DOUBLE) AS qty
    FROM lineitem WHERE l_orderkey % 97 = 0"""

  /** Seeded Bernoulli sample — REPLAYABLE-seed form under a FULL oracle
    * (the dedup_simhash graduation pattern): each row's uniform draw is
    * the first 8 md5 hex digits of "seed|l_orderkey|l_linenumber" read as
    * a 32-bit integer, kept when u < ⌊0.01·2³²⌋. Independent per row,
    * deterministic given the seed, identical in every engine AND under
    * any partitioning/retry (the engine-native `sample()` RNG draws per
    * partition, so its count is both engine-specific and layout-dependent
    * — the very property that kept this rows-only; engine-native sampling
    * stays exercised by sample_stratified / sample_per_source). */
  val sampleBernoulli: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val u = conv(substring(md5(concat_ws("|",
      lit(42), col("l_orderkey"), col("l_linenumber"))), 1, 8), 16, 10)
      .cast("long")
    // spread evaluated and REVERTED (r17 A/B at 32 cores: ON med 0.74 vs
    // OFF 0.71 — the exchange of 600k key rows costs what the distributed
    // md5 saves); the row-hash pass is the price of the replayable oracle
    t.lineitem.select(col("l_orderkey"), col("l_linenumber"))
      .filter(u < lit(42949672L)) // ⌊0.01 · 2³²⌋
      .agg(count(lit(1)).as("n_sampled"))
  }
  val sampleBernoulliSql: String = """
    SELECT COUNT(*) AS n_sampled FROM lineitem
    WHERE list_reduce(list_transform(generate_series(1, 8),
        i -> CAST(strpos('0123456789abcdef',
               substr(md5(concat_ws('|', 42, l_orderkey, l_linenumber)), i, 1))
             - 1 AS BIGINT)),
      (a, b) -> a * 16 + b) < 42949672"""

  /** UNION ALL (reference UnionAllOperator.java:35). */
  val setopUnionAll: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    t.customer.select(col("c_nationkey").as("nkey"))
      .unionByName(t.supplier.select(col("s_nationkey").as("nkey")))
      .groupBy(col("nkey")).agg(count(lit(1)).as("n"))
      .orderBy(col("nkey"))
  }
  val setopUnionAllSql: String = """
    SELECT nkey, COUNT(*) AS n FROM (
      SELECT c_nationkey AS nkey FROM customer
      UNION ALL
      SELECT s_nationkey AS nkey FROM supplier) u
    GROUP BY nkey ORDER BY nkey"""

  /** UNION DISTINCT (reference rewrites UNION → UNION ALL + DISTINCT,
    * CoreRules.UNION_TO_DISTINCT). */
  val setopUnionDistinct: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    t.customer.select(col("c_nationkey").as("nkey"))
      .union(t.supplier.select(col("s_nationkey").as("nkey")))
      .distinct()
      .orderBy(col("nkey"))
  }
  val setopUnionDistinctSql: String = """
    SELECT c_nationkey AS nkey FROM customer
    UNION
    SELECT s_nationkey AS nkey FROM supplier
    ORDER BY nkey"""

  /** INTERSECT (reference INTERSECT_TO_DISTINCT rewrite; Spark: left-semi). */
  val setopIntersect: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    t.customer.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      .intersect(t.orders.select(col("o_custkey").as("c_custkey")))
      .orderBy(col("c_custkey"))
  }
  val setopIntersectSql: String = """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders
    ORDER BY c_custkey"""

  /** EXCEPT (reference MinusToJoin rule; Spark: left-anti). */
  val setopExcept: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    t.customer.filter(col("c_acctbal") > 5000.0).select(col("c_custkey"))
      .except(t.orders.filter(col("o_orderdate") >= tsLit("2000-01-01"))
        .select(col("o_custkey").as("c_custkey")))
      .orderBy(col("c_custkey"))
  }
  val setopExceptSql: String = """
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '2000-01-01'
    ORDER BY c_custkey"""

  /** EXCEPT ALL — bag difference preserving multiplicity (reference
    * MinusToJoin handles both distinct and ALL forms). */
  val setopExceptAll: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    t.orders.select(col("o_custkey").as("k"))
      .exceptAll(t.customer.select(col("c_custkey").as("k")))
      .orderBy(col("k"))
  }
  val setopExceptAllSql: String = """
    SELECT o_custkey AS k FROM orders
    EXCEPT ALL SELECT c_custkey AS k FROM customer ORDER BY k"""

  /** INTERSECT ALL — bag intersection (min multiplicity). */
  val setopIntersectAll: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    t.orders.select(col("o_custkey").as("k"))
      .intersectAll(t.orders.filter(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("k")))
      .orderBy(col("k"))
  }
  val setopIntersectAllSql: String = """
    SELECT o_custkey AS k FROM orders
    INTERSECT ALL SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
    ORDER BY k"""

  /** IGNORE NULLS window navigation (reference WindowFunction FIRST/LAST
    * with null treatment) + NTILE bucketing. */
  val windowIgnoreNulls: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t.events.select(
      col("user_id"), col("event_id"),
      last(when(col("value") > 90, col("value")), ignoreNulls = true)
        .over(w).as("last_big"),
      ntile(5).over(w).as("bucket5"))
      .orderBy(col("user_id"), col("event_id"))
  }
  val windowIgnoreNullsSql: String = """
    SELECT user_id, event_id,
      LAST_VALUE(CASE WHEN value > 90 THEN value END IGNORE NULLS)
        OVER (PARTITION BY user_id ORDER BY ts, event_id) AS last_big,
      NTILE(5) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS bucket5
    FROM events ORDER BY user_id, event_id"""

  /** Fuzzy self-join on customer names within edit distance 1
    * ([[graft.operators.FuzzyJoin]] — SymSpell deletion-neighborhood
    * candidates + exact levenshtein verify; never all-pairs). DuckDB
    * replays it AS the all-pairs join, which is exactly the point: same
    * answer, quadratic oracle vs linear-fan-out engine. */
  val fuzzyJoinNames: QueryFn = (s, dir) => {
    val c = Tables.ensure(s, dir).customer
      .select(col("c_custkey").as("id"), col("c_name").as("name"))
    graft.operators.FuzzyJoin.selfJoin(c, "id", "name", maxEdits = 1)
      .select(col("a_id"), col("b_id"), col("dist"))
      .orderBy(col("a_id"), col("b_id"))
  }
  val fuzzyJoinNamesSql: String = """
    SELECT a.c_custkey AS a_id, b.c_custkey AS b_id,
           CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
    FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    ORDER BY a_id, b_id"""

  /** Literal VALUES rowset through the SQL entry (reference ValuesCreator). */
  val valuesInline: QueryFn = (s, dir) => {
    s.sql("""
      SELECT id, name, CAST(score AS DOUBLE) AS score
      FROM VALUES (1, 'alpha', 1.5), (2, 'beta', 2.5), (3, 'gamma', NULL) AS t(id, name, score)
      ORDER BY id""")
  }
  val valuesInlineSql: String = """
    SELECT id, name, CAST(score AS DOUBLE) AS score
    FROM (VALUES (1, 'alpha', 1.5), (2, 'beta', 2.5), (3, 'gamma', NULL)) t(id, name, score)
    ORDER BY id"""

  /** IN-subquery through the SQL entry (decorrelates to semi join). */
  val inSubquery: QueryFn = (s, dir) => {
    Tables.ensure(s, dir)
    s.sql("""
      SELECT p_brand, COUNT(*) AS n FROM part
      WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
      GROUP BY p_brand ORDER BY p_brand""")
  }
  val inSubquerySql: String = """
    SELECT p_brand, COUNT(*) AS n FROM part
    WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
    GROUP BY p_brand ORDER BY p_brand"""

  /** Correlated scalar subquery (reference DremioRelDecorrelator;
    * Catalyst RewriteCorrelatedScalarSubquery). */
  val scalarSubquery: QueryFn = (s, dir) => {
    Tables.ensure(s, dir)
    s.sql("""
      SELECT n_name,
        (SELECT COUNT(*) FROM customer WHERE c_nationkey = n_nationkey) AS n_customers
      FROM nation ORDER BY n_name""")
  }
  val scalarSubquerySql: String = """
    SELECT n_name,
      (SELECT COUNT(*) FROM customer WHERE c_nationkey = n_nationkey) AS n_customers
    FROM nation ORDER BY n_name"""

  /** FLATTEN/unnest with position (reference FlattenOperator.java:57;
    * Spark: Generate/posexplode). */
  val explodePos: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    t.embeddings
      .filter(col("vec_id") < 20)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "val")))
      .orderBy(col("vec_id"), col("pos"))
  }
  val explodePosSql: String = """
    SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
           UNNEST(embedding) AS val
    FROM embeddings WHERE vec_id < 20
    ORDER BY vec_id, pos"""

  /** PIVOT via conditional aggregation (both engines agree on the
    * conditional-agg lowering). */
  val pivotStatus: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    t.orders
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(dbl(sum(money(col("o_totalprice")))))
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0.0)).as("total_f"),
        coalesce(col("O"), lit(0.0)).as("total_o"),
        coalesce(col("P"), lit(0.0)).as("total_p"))
      .orderBy(col("o_orderpriority"))
  }
  val pivotStatusSql: String = """
    SELECT o_orderpriority,
      COALESCE(CAST(SUM(CASE WHEN o_orderstatus='F' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE), 0.0) AS total_f,
      COALESCE(CAST(SUM(CASE WHEN o_orderstatus='O' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE), 0.0) AS total_o,
      COALESCE(CAST(SUM(CASE WHEN o_orderstatus='P' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE), 0.0) AS total_p
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  /** UNPIVOT (wide→long melt; reference exposes PIVOT/UNPIVOT through
    * Calcite — Spark: Dataset.unpivot / UNPIVOT SQL). */
  val unpivotPart: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    t.part.select(col("p_partkey"),
        dbl(money(col("p_retailprice"))).as("retail"),
        col("p_size").cast("double").as("size"))
      .unpivot(Array(col("p_partkey")), Array(col("retail"), col("size")),
        "metric", "value")
      .orderBy(col("p_partkey"), col("metric"))
  }
  val unpivotPartSql: String = """
    SELECT p_partkey, metric, value FROM (
      SELECT p_partkey, CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS DOUBLE) AS retail,
             CAST(p_size AS DOUBLE) AS size FROM part) t
    UNPIVOT (value FOR metric IN (retail, size))
    ORDER BY p_partkey, metric"""

  /** Correlated LATERAL subquery with per-row ORDER BY + LIMIT (reference
    * Calcite LogicalCorrelate; Spark: lateral join with DomainJoin
    * decorrelation). */
  val lateralTopPerRow: QueryFn = (s, dir) => {
    Tables.ensure(s, dir)
    s.sql("""
      SELECT r_name, ln.n_name FROM region,
      LATERAL (SELECT n_name FROM nation WHERE n_regionkey = r_regionkey
               ORDER BY n_name LIMIT 2) ln
      ORDER BY r_name, n_name""")
  }
  val lateralTopPerRowSql: String = """
    SELECT r_name, ln.n_name FROM region,
    LATERAL (SELECT n_name FROM nation WHERE n_regionkey = r_regionkey
             ORDER BY n_name LIMIT 2) ln
    ORDER BY r_name, n_name"""

  /** Column profile (reference statistics service,
    * `services/statistics/StatisticsServiceImpl.java:76`): one aggregation
    * pass computes every column's count/NDV/min/max; exact NDV here so the
    * DuckDB oracle can reproduce it bit-for-bit (HLL is the scale path —
    * see `catalog.Statistics.profile`). */
  val profileCustomer: QueryFn = (s, dir) => {
    val t = graft.engine.Tables.ensure(s, dir)
    graft.catalog.Statistics.profile(
      t.customer.select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        dbl(money(col("c_acctbal"))).as("bal")),
      exactNdv = true).orderBy(col("col_name"))
  }
  val profileCustomerSql: String = """
    WITH src AS (
      SELECT c_custkey, c_name, c_mktsegment,
             CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS bal
      FROM customer)
    SELECT * FROM (
      SELECT 'bal' AS col_name, COUNT(*) AS n_rows,
             COUNT(*) - COUNT(bal) AS n_nulls, COUNT(DISTINCT bal) AS ndv,
             CAST(MIN(bal) AS VARCHAR) AS min_value,
             CAST(MAX(bal) AS VARCHAR) AS max_value FROM src
      UNION ALL
      SELECT 'c_custkey', COUNT(*), COUNT(*) - COUNT(c_custkey),
             COUNT(DISTINCT c_custkey),
             CAST(MIN(c_custkey) AS VARCHAR), CAST(MAX(c_custkey) AS VARCHAR) FROM src
      UNION ALL
      SELECT 'c_mktsegment', COUNT(*), COUNT(*) - COUNT(c_mktsegment),
             COUNT(DISTINCT c_mktsegment),
             CAST(MIN(c_mktsegment) AS VARCHAR), CAST(MAX(c_mktsegment) AS VARCHAR) FROM src
      UNION ALL
      SELECT 'c_name', COUNT(*), COUNT(*) - COUNT(c_name),
             COUNT(DISTINCT c_name),
             CAST(MIN(c_name) AS VARCHAR), CAST(MAX(c_name) AS VARCHAR) FROM src) p
    ORDER BY col_name"""

  val queries: Map[String, QueryFn] = Map(
    "profile_customer" -> profileCustomer,
    "unpivot_part" -> unpivotPart,
    "lateral_top_per_row" -> lateralTopPerRow,
    "join_inner_hash" -> joinInnerHash,
    "join_merge" -> joinMerge,
    "join_broadcast" -> joinBroadcast,
    "join_left_outer" -> joinLeftOuter,
    "join_right_outer" -> joinRightOuter,
    "join_full_outer" -> joinFullOuter,
    "join_cross" -> joinCross,
    "join_theta" -> joinTheta,
    "join_nonequi_nlj" -> joinNonEquiNlj,
    "agg_rollup" -> aggRollup,
    "agg_cube" -> aggCube,
    "agg_grouping_sets" -> aggGroupingSets,
    "agg_distinct" -> aggDistinct,
    "agg_stats" -> aggStats,
    "agg_listagg" -> aggListagg,
    "agg_bool_bit" -> aggBoolBit,
    "agg_listagg_wg" -> aggListaggWithinGroup,
    "agg_percentile_exact" -> aggPercentileExact,
    "agg_ndv_sketch" -> aggNdvSketch,
    "agg_hll_merge" -> aggHllMerge,
    "agg_percentile_approx" -> aggPercentileApprox,
    "window_ranking" -> windowRanking,
    "window_ntile" -> windowNtile,
    "window_topn_per_group" -> windowTopnPerGroup,
    "window_qualify" -> windowQualify,
    "window_lead_lag" -> windowLeadLag,
    "window_rows_frame" -> windowRowsFrame,
    "window_range_frame" -> windowRangeFrame,
    "sort_multi_nulls" -> sortMultiNulls,
    "topk_orders" -> topkOrders,
    "limit_offset" -> limitOffset,
    "sample_systematic" -> sampleSystematic,
    "sample_bernoulli" -> sampleBernoulli,
    "setop_union_all" -> setopUnionAll,
    "setop_union_distinct" -> setopUnionDistinct,
    "setop_intersect" -> setopIntersect,
    "setop_except" -> setopExcept,
    "setop_except_all" -> setopExceptAll,
    "setop_intersect_all" -> setopIntersectAll,
    "window_ignore_nulls" -> windowIgnoreNulls,
    "values_inline" -> valuesInline,
    "fuzzy_join_names" -> fuzzyJoinNames,
    "in_subquery" -> inSubquery,
    "scalar_subquery" -> scalarSubquery,
    "explode_pos" -> explodePos,
    "pivot_status" -> pivotStatus)

  val oracle: Map[String, String] = Map(
    "profile_customer" -> profileCustomerSql,
    "unpivot_part" -> unpivotPartSql,
    "lateral_top_per_row" -> lateralTopPerRowSql,
    "join_inner_hash" -> joinInnerHashSql,
    "join_merge" -> joinMergeSql,
    "join_broadcast" -> joinBroadcastSql,
    "join_left_outer" -> joinLeftOuterSql,
    "join_right_outer" -> joinRightOuterSql,
    "join_full_outer" -> joinFullOuterSql,
    "join_cross" -> joinCrossSql,
    "join_theta" -> joinThetaSql,
    "join_nonequi_nlj" -> joinNonEquiNljSql,
    "agg_rollup" -> aggRollupSql,
    "agg_cube" -> aggCubeSql,
    "agg_grouping_sets" -> aggGroupingSetsSql,
    "agg_distinct" -> aggDistinctSql,
    "agg_stats" -> aggStatsSql,
    "agg_listagg" -> aggListaggSql,
    "agg_bool_bit" -> aggBoolBitSql,
    "agg_listagg_wg" -> aggListaggWithinGroupSql,
    "agg_percentile_exact" -> aggPercentileExactSql,
    "window_ranking" -> windowRankingSql,
    "window_ntile" -> windowNtileSql,
    "window_topn_per_group" -> windowTopnPerGroupSql,
    "window_qualify" -> windowQualifySql,
    "window_lead_lag" -> windowLeadLagSql,
    "window_rows_frame" -> windowRowsFrameSql,
    "window_range_frame" -> windowRangeFrameSql,
    "sort_multi_nulls" -> sortMultiNullsSql,
    "topk_orders" -> topkOrdersSql,
    "limit_offset" -> limitOffsetSql,
    "sample_systematic" -> sampleSystematicSql,
    "sample_bernoulli" -> sampleBernoulliSql,
    "setop_union_all" -> setopUnionAllSql,
    "setop_union_distinct" -> setopUnionDistinctSql,
    "setop_intersect" -> setopIntersectSql,
    "setop_except" -> setopExceptSql,
    "setop_except_all" -> setopExceptAllSql,
    "setop_intersect_all" -> setopIntersectAllSql,
    "window_ignore_nulls" -> windowIgnoreNullsSql,
    "values_inline" -> valuesInlineSql,
    "fuzzy_join_names" -> fuzzyJoinNamesSql,
    "in_subquery" -> inSubquerySql,
    "scalar_subquery" -> scalarSubquerySql,
    "explode_pos" -> explodePosSql,
    "pivot_status" -> pivotStatusSql)
}
