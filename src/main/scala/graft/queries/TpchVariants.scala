package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** TPC-H queries whose originals touch columns absent from the fixtures
  * (partsupp, commitdate, shipmode, container…), re-cut per FIXTURES.md §B:
  * the *operator shape* (correlated scalar subquery, double-correlated
  * EXISTS/NOT EXISTS, NOT IN anti join, nested aggregation threshold) is
  * preserved on the available star schema.
  */
object TpchVariants {

  private def discPrice = money(col("l_extendedprice")) * (lit(1) - pct(col("l_discount")))
  private val discPriceSql =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1-l_discount AS DECIMAL(4,2))"

  /** Q2 shape: per-group max via correlated subquery (here: the
    * best-balance European supplier for each STANDARD part). */
  val q02v: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val euNations = t.nation
      .join(broadcast(t.region.filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val cand = t.lineitem
      .join(t.part.filter(col("p_type") === "STANDARD" && col("p_size") <= 10),
        col("l_partkey") === col("p_partkey"))
      .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(euNations), col("s_nationkey") === col("n_nationkey"))
      .select(col("p_partkey"), col("s_suppkey"), col("s_name"),
        col("s_acctbal"), col("n_name")).distinct()
    val w = Window.partitionBy(col("p_partkey"))
    cand.withColumn("max_bal", max(col("s_acctbal")).over(w))
      .filter(col("s_acctbal") === col("max_bal"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"), col("p_partkey"))
      .orderBy(desc("s_acctbal"), col("p_partkey"), col("s_name"))
      .limit(100)
  }
  val q02vSql: String = """
    WITH cand AS (
      SELECT DISTINCT p_partkey, s_suppkey, s_name, s_acctbal, n_name
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE p_type = 'STANDARD' AND p_size <= 10 AND r_name = 'EUROPE')
    SELECT s_acctbal, s_name, n_name, p_partkey
    FROM cand c
    WHERE s_acctbal = (SELECT MAX(s_acctbal) FROM cand c2 WHERE c2.p_partkey = c.p_partkey)
    ORDER BY s_acctbal DESC, p_partkey, s_name LIMIT 100"""

  /** Q9 shape: profit by supplier-nation and year (supply cost approximated
    * from p_retailprice since partsupp is absent). */
  val q09v: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val amount = discPrice -
      money(col("p_retailprice")) * col("l_quantity").cast("decimal(4,0)") *
        lit("0.05").cast("decimal(3,2)")
    t.lineitem
      .join(t.part.filter(col("p_type") === "PROMO"), col("l_partkey") === col("p_partkey"))
      .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(dbl(sum(amount)).as("sum_profit"))
      .orderBy(col("nation"), desc("o_year"))
  }
  val q09vSql: String = s"""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
      CAST(SUM($discPriceSql
        - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(4,0))
          * CAST(0.05 AS DECIMAL(3,2))) AS DOUBLE) AS sum_profit
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN orders ON l_orderkey = o_orderkey
    WHERE p_type = 'PROMO'
    GROUP BY n_name, year(o_orderdate) ORDER BY nation, o_year DESC"""

  /** Q12 shape: two conditional counts after a fact join (shipmode →
    * linestatus as the class column). */
  val q12v: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    t.orders
      .join(t.lineitem.filter(col("l_shipdate") >= tsLit("1996-01-01") &&
        col("l_shipdate") < tsLit("1997-01-01")), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0))
          .as("high_line_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0))
          .as("low_line_count"))
      .orderBy(col("l_linestatus"))
  }
  val q12vSql: String = """
    SELECT l_linestatus,
      CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus ORDER BY l_linestatus"""

  /** Q16 shape: distinct-supplier counts per part group with a NOT IN
    * exclusion subquery (→ anti join). */
  val q16v: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val excluded = t.supplier.filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    t.lineitem
      .join(t.part.filter(col("p_brand") =!= "Brand#1"), col("l_partkey") === col("p_partkey"))
      .join(excluded, t.lineitem("l_suppkey") === excluded("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(desc("supplier_cnt"), col("p_brand"), col("p_type"), col("p_size"))
      .limit(50)
  }
  val q16vSql: String = """
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1'
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size LIMIT 50"""

  /** Q20 shape: nested aggregation threshold (suppliers moving >0.5% of the
    * PROMO-part volume in 1996) + semi join up to the supplier list. */
  val q20v: QueryFn = (s, dir) => {
    val t = Tables.ensure(s, dir)
    val promo1996 = t.lineitem
      .filter(col("l_shipdate") >= tsLit("1996-01-01") && col("l_shipdate") < tsLit("1997-01-01"))
      .join(t.part.filter(col("p_type") === "PROMO"), col("l_partkey") === col("p_partkey"))
    val perSupp = promo1996.groupBy(col("l_suppkey")).agg(sum(col("l_quantity")).as("supp_qty"))
    val thresh = promo1996.agg((sum(col("l_quantity")) * lit(0.005)).as("cut"))
    val qualifying = perSupp.join(broadcast(thresh)).filter(col("supp_qty") > col("cut"))
    t.supplier
      .join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy(col("s_suppkey"))
  }
  val q20vSql: String = """
    WITH promo AS (
      SELECT l_suppkey, l_quantity FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE p_type = 'PROMO'
        AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01')
    SELECT s_suppkey, s_name FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM promo GROUP BY l_suppkey
      HAVING SUM(l_quantity) > (SELECT SUM(l_quantity) * 0.005 FROM promo))
    ORDER BY s_suppkey"""

  /** Q21 shape: double-correlated EXISTS + NOT EXISTS (suppliers that were
    * the only 'R'-flag supplier on a multi-supplier finished order). */
  val q21v: QueryFn = (s, dir) => {
    Tables.ensure(s, dir)
    s.sql("""
      SELECT s_name, COUNT(*) AS numwait
      FROM supplier
      JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN orders ON o_orderkey = l1.l_orderkey
      WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_returnflag = 'R')
      GROUP BY s_name
      ORDER BY numwait DESC, s_name LIMIT 20""")
  }
  val q21vSql: String = """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name LIMIT 20"""

  /** Q11 shape: group value exceeding a scalar fraction of the global
    * total (HAVING > correlated-free scalar subquery; partsupp absent, so
    * supplier revenue share stands in for stock value). The ×1000 integer
    * multiply keeps the threshold comparison in exact decimal arithmetic
    * on both engines. */
  val q11v: QueryFn = (s, dir) => {
    Tables.ensure(s, dir)
    s.sql("""
      SELECT l_suppkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS value
      FROM lineitem
      GROUP BY l_suppkey
      HAVING SUM(CAST(l_extendedprice AS DECIMAL(12,2))) * 1000 >
             (SELECT SUM(CAST(l_extendedprice AS DECIMAL(12,2))) FROM lineitem) * 2
      ORDER BY value DESC, l_suppkey""")
  }
  val q11vSql: String = """
    SELECT l_suppkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS value
    FROM lineitem
    GROUP BY l_suppkey
    HAVING SUM(CAST(l_extendedprice AS DECIMAL(12,2))) * 1000 >
           (SELECT SUM(CAST(l_extendedprice AS DECIMAL(12,2))) FROM lineitem) * 2
    ORDER BY value DESC, l_suppkey"""

  val queries: Map[String, QueryFn] = Map(
    "tpch_q11v" -> q11v,
    "tpch_q02v" -> q02v, "tpch_q09v" -> q09v, "tpch_q12v" -> q12v,
    "tpch_q16v" -> q16v, "tpch_q20v" -> q20v, "tpch_q21v" -> q21v)

  val oracle: Map[String, String] = Map(
    "tpch_q02v" -> q02vSql, "tpch_q09v" -> q09vSql, "tpch_q11v" -> q11vSql,
    "tpch_q12v" -> q12vSql,
    "tpch_q16v" -> q16vSql, "tpch_q20v" -> q20vSql, "tpch_q21v" -> q21vSql)
}
