package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** TPC-H-style corpus adapted to the fixture star schema (FIXTURES.md §A).
  *
  * The reference ships this corpus as its own end-to-end suite
  * (dremio-oss `sabot/kernel/src/test/resources/queries/tpch/` 23 .sql files, run by
  * `TestTpchDistributed.java:27`); queries needing columns absent from the
  * fixtures (partsupp, commitdate, shipmode, phone…) are re-cut to the
  * available schema, keeping the operator shape (join graph, agg pattern,
  * subquery form) intact.
  *
  * Every query is written DataFrame-first and leaves join-strategy choice to
  * Catalyst/AQE except where a side is structurally tiny (region/nation:
  * 5/25 rows at every scale factor — broadcast is always right).
  *
  * Oracle parity: all money arithmetic goes through decimal casts (see
  * [[graft.queries.money]]) so Spark and DuckDB agree bit-for-bit.
  */
object Tpch {

  private def discPrice = money(col("l_extendedprice")) * (lit(1) - pct(col("l_discount")))

  private val discPriceSql =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1-l_discount AS DECIMAL(4,2))"

  /** Q1 pricing summary: full-scan agg with decomposable functions — Spark
    * plans partial+final HashAggregate (two-phase agg, SURVEY §2.4). */
  val q01: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    t.lineitem
      .filter(col("l_shipdate") <= tsLit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dbl(sum(col("l_quantity"))).as("sum_qty"),
        dbl(sum(money(col("l_extendedprice")))).as("sum_base_price"),
        dbl(sum(discPrice)).as("sum_disc_price"),
        dbl(sum(discPrice * (lit(1) + pct(col("l_tax"))))).as("sum_charge"),
        (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (dbl(sum(money(col("l_extendedprice")))) / count(lit(1))).as("avg_price"),
        (dbl(sum(pct(col("l_discount")))) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }
  val q01Sql: String = s"""
    SELECT l_returnflag, l_linestatus,
      CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM($discPriceSql) AS DOUBLE) AS sum_disc_price,
      CAST(SUM($discPriceSql * CAST(1+l_tax AS DECIMAL(4,2))) AS DOUBLE) AS sum_charge,
      SUM(l_quantity)/COUNT(*) AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)/COUNT(*) AS avg_price,
      CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)/COUNT(*) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""

  /** Q3 shipping priority: fact-fact join + dim filter + top-k on agg. */
  val q03: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    t.lineitem.filter(col("l_shipdate") > tsLit("1996-06-30"))
      .join(t.orders.filter(col("o_orderdate") < tsLit("1996-06-30")),
        col("l_orderkey") === col("o_orderkey"))
      .join(t.customer.filter(col("c_mktsegment") === "BUILDING"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(dbl(sum(discPrice)).as("revenue"))
      .select(col("l_orderkey"), col("revenue"),
        col("o_orderdate"), col("o_orderpriority"))
      .orderBy(desc("revenue"), col("l_orderkey"))
      .limit(10)
  }
  val q03Sql: String = s"""
    SELECT l_orderkey,
      CAST(SUM($discPriceSql) AS DOUBLE) AS revenue,
      o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1996-06-30'
      AND l_shipdate > TIMESTAMP '1996-06-30'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10"""

  /** Q4 order priority checking: EXISTS → left-semi join (SURVEY §2.3 —
    * the reference plans EXISTS away to semi-join shapes too). */
  val q04: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    t.orders
      .filter(col("o_orderdate") >= tsLit("1996-01-01") &&
        col("o_orderdate") < tsLit("1997-01-01"))
      .join(t.lineitem.filter(col("l_returnflag") === "R"),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }
  val q04Sql: String = """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  /** Q5 local supplier volume: 6-way snowflake join; region/nation broadcast. */
  val q05: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val asiaNations = t.nation
      .join(broadcast(t.region.filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
    t.customer
      .join(broadcast(asiaNations), col("c_nationkey") === col("n_nationkey"))
      .join(t.orders.filter(col("o_orderdate") >= tsLit("1996-01-01") &&
        col("o_orderdate") < tsLit("1997-01-01")), col("c_custkey") === col("o_custkey"))
      .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
      .join(t.supplier, col("l_suppkey") === col("s_suppkey") &&
        col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(dbl(sum(discPrice)).as("revenue"))
      .orderBy(desc("revenue"), col("n_name"))
  }
  val q05Sql: String = s"""
    SELECT n_name, CAST(SUM($discPriceSql) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name ORDER BY revenue DESC, n_name"""

  /** Q6 forecasting revenue: pure scan+filter+agg; predicates push to parquet. */
  val q06: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    t.lineitem
      .filter(col("l_shipdate") >= tsLit("1996-01-01") &&
        col("l_shipdate") < tsLit("1997-01-01") &&
        pct(col("l_discount")).between(0.02, 0.04) &&
        col("l_quantity") < 24)
      .agg(dbl(sum(money(col("l_extendedprice")) * pct(col("l_discount")))).as("revenue"))
  }
  val q06Sql: String = """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND CAST(l_discount AS DECIMAL(4,2)) BETWEEN 0.02 AND 0.04
      AND l_quantity < 24"""

  /** Q7 volume shipping: self-alias of nation on both legs of the join. */
  val q07: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val sn = t.nation.select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val cn = t.nation.select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
    t.supplier
      .join(broadcast(sn), col("s_nationkey") === col("sn_key"))
      .join(t.lineitem, col("s_suppkey") === col("l_suppkey"))
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(cn), col("c_nationkey") === col("cn_key"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .filter(col("l_shipdate") >= tsLit("1996-01-01") && col("l_shipdate") < tsLit("1998-01-01"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(dbl(sum(discPrice)).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }
  val q07Sql: String = s"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      CAST(year(l_shipdate) AS INT) AS l_year,
      CAST(SUM($discPriceSql) AS DOUBLE) AS revenue
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year"""

  /** Q8 national market share: conditional agg ratio over a snowflake. */
  val q08: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val sn = t.nation.select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val cnr = t.nation
      .join(broadcast(t.region.filter(col("r_name") === "AMERICA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("cn_key"))
    val vol = discPrice
    t.lineitem
      .join(t.part.filter(col("p_type") === "ECONOMY"), col("l_partkey") === col("p_partkey"))
      .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(sn), col("s_nationkey") === col("sn_key"))
      .join(t.orders.filter(col("o_orderdate") >= tsLit("1995-01-01") &&
        col("o_orderdate") <= tsLit("1996-12-31")), col("l_orderkey") === col("o_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(cnr), col("c_nationkey") === col("cn_key"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg((dbl(sum(when(col("supp_nation") === "NATION_3", vol).otherwise(money(lit(0))))) /
        dbl(sum(vol))).as("mkt_share"))
      .orderBy(col("o_year"))
  }
  val q08Sql: String = s"""
    SELECT CAST(year(o_orderdate) AS INT) AS o_year,
      CAST(SUM(CASE WHEN n1.n_name = 'NATION_3' THEN $discPriceSql
                    ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
        / CAST(SUM($discPriceSql) AS DOUBLE) AS mkt_share
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    JOIN region ON n2.n_regionkey = r_regionkey
    WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
      AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
    GROUP BY o_year ORDER BY o_year"""

  /** Q10 returned item reporting: top 20 customers by lost revenue. */
  val q10: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    t.customer
      .join(t.orders.filter(col("o_orderdate") >= tsLit("1996-01-01") &&
        col("o_orderdate") < tsLit("1996-07-01")), col("c_custkey") === col("o_custkey"))
      .join(t.lineitem.filter(col("l_returnflag") === "R"),
        col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.ensure(s, dir).nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(dbl(sum(discPrice)).as("revenue"))
      .orderBy(desc("revenue"), col("c_custkey"))
      .limit(20)
  }
  val q10Sql: String = s"""
    SELECT c_custkey, c_name, c_acctbal, n_name,
      CAST(SUM($discPriceSql) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20"""

  /** Q13 customer distribution: LEFT OUTER join + two-level aggregation. */
  val q13: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    t.customer
      .join(t.orders.filter(col("o_orderpriority") =!= "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))
  }
  val q13Sql: String = """
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey) c_orders
    GROUP BY c_count ORDER BY custdist DESC, c_count DESC"""

  /** Q14 promotion effect: conditional-agg percentage. */
  val q14: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    t.lineitem
      .filter(col("l_shipdate") >= tsLit("1996-09-01") && col("l_shipdate") < tsLit("1996-10-01"))
      .join(t.part, col("l_partkey") === col("p_partkey"))
      .agg((lit(100.0) * dbl(sum(when(col("p_type") === "PROMO", discPrice)
        .otherwise(money(lit(0))))) / dbl(sum(discPrice))).as("promo_revenue"))
  }
  val q14Sql: String = s"""
    SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $discPriceSql
                                 ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
      / CAST(SUM($discPriceSql) AS DOUBLE) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'"""

  /** Q15 top supplier: agg view + scalar-subquery max (window-free form
    * computes the max with a tiny self-agg broadcast join). */
  val q15: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val revenue = t.lineitem
      .filter(col("l_shipdate") >= tsLit("1996-01-01") && col("l_shipdate") < tsLit("1996-04-01"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(dbl(sum(discPrice)).as("total_revenue"))
    val maxRev = revenue.agg(max(col("total_revenue")).as("mx"))
    t.supplier
      .join(revenue, col("s_suppkey") === col("supplier_no"))
      .join(broadcast(maxRev), col("total_revenue") === col("mx"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }
  val q15Sql: String = s"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, CAST(SUM($discPriceSql) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey"""

  /** Q17 small-quantity-order revenue: correlated avg subquery → per-key agg
    * + re-join (the decorrelated shape the reference also plans, SURVEY §4.1). */
  val q17: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val perPart = t.lineitem.groupBy(col("l_partkey").as("agg_partkey"))
      .agg(((sum(col("l_quantity")) / count(col("l_quantity"))) * lit(0.2)).as("qty_thresh"))
    t.lineitem
      .join(t.part.filter(col("p_brand") === "Brand#1"), col("l_partkey") === col("p_partkey"))
      .join(perPart, col("l_partkey") === col("agg_partkey"))
      .filter(col("l_quantity") < col("qty_thresh"))
      .agg((dbl(sum(money(col("l_extendedprice")))) / lit(7.0)).as("avg_yearly"))
  }
  val q17Sql: String = """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)/7.0 AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN (SELECT l_partkey AS agg_partkey,
                 (SUM(l_quantity)/COUNT(l_quantity))*0.2 AS qty_thresh
          FROM lineitem GROUP BY l_partkey) pa
      ON l_partkey = agg_partkey
    WHERE p_brand = 'Brand#1' AND l_quantity < qty_thresh"""

  /** Q18 large-volume customer: HAVING on grouped fact, re-joined upward. */
  val q18: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val big = t.lineitem.groupBy(col("l_orderkey").as("big_orderkey"))
      .agg(sum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > 150)
    t.customer
      .join(t.orders, col("c_custkey") === col("o_custkey"))
      .join(big, col("o_orderkey") === col("big_orderkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"),
        col("o_totalprice"), dbl(col("total_qty")).as("total_qty"))
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
      .limit(100)
  }
  val q18Sql: String = """
    SELECT c_custkey, c_name, o_orderkey, o_orderdate,
           o_totalprice, CAST(total_qty AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN (SELECT l_orderkey AS big_orderkey, SUM(l_quantity) AS total_qty
          FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150) big
      ON o_orderkey = big_orderkey
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"""

  /** Q19 discounted revenue: disjunctive multi-range predicate join. */
  val q19: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    t.lineitem
      .join(t.part, col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 25) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 35) &&
          col("l_quantity").between(20, 30)))
      .agg(dbl(sum(discPrice)).as("revenue"))
  }
  val q19Sql: String = s"""
    SELECT CAST(SUM($discPriceSql) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)"""

  /** Q22 global sales opportunity: scalar subquery threshold + anti join. */
  val q22: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val avgBal = t.customer.filter(col("c_acctbal") > 0.0)
      .agg((dbl(sum(money(col("c_acctbal")))) / count(col("c_acctbal"))).as("avg_bal"))
    t.customer
      .join(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(t.orders.filter(col("o_orderdate") >= tsLit("2000-01-01")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"), dbl(sum(money(col("c_acctbal")))).as("totacctbal"))
      .orderBy(col("c_nationkey"))
  }
  val q22Sql: String = """
    SELECT c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)/COUNT(c_acctbal)
                       FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_nationkey ORDER BY c_nationkey"""

  val queries: Map[String, QueryFn] = Map(
    "tpch_q01" -> q01, "tpch_q03" -> q03, "tpch_q04" -> q04, "tpch_q05" -> q05,
    "tpch_q06" -> q06, "tpch_q07" -> q07, "tpch_q08" -> q08, "tpch_q10" -> q10,
    "tpch_q13" -> q13, "tpch_q14" -> q14, "tpch_q15" -> q15, "tpch_q17" -> q17,
    "tpch_q18" -> q18, "tpch_q19" -> q19, "tpch_q22" -> q22)

  val oracle: Map[String, String] = Map(
    "tpch_q01" -> q01Sql, "tpch_q03" -> q03Sql, "tpch_q04" -> q04Sql,
    "tpch_q05" -> q05Sql, "tpch_q06" -> q06Sql, "tpch_q07" -> q07Sql,
    "tpch_q08" -> q08Sql, "tpch_q10" -> q10Sql, "tpch_q13" -> q13Sql,
    "tpch_q14" -> q14Sql, "tpch_q15" -> q15Sql, "tpch_q17" -> q17Sql,
    "tpch_q18" -> q18Sql, "tpch_q19" -> q19Sql, "tpch_q22" -> q22Sql)
}
