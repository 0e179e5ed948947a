package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Co-located (shuffle-free) joins over co-bucketed lake tables.
  *
  * A `bucket(n, col)` layout writes each data file named with its Spark
  * bucket id, and the scan attaches a `BucketSpec` once every live file
  * carries one — so the scan reports `HashPartitioning(col, n)` and a
  * join of two tables bucketed the same way on their join keys, or an
  * aggregation on the bucket column, needs NO exchange. At 100 TB the
  * shuffle skipped here is the dominant cost of the join (Iceberg bucket
  * transform + storage-partitioned join; reference: hash-distribution
  * elision when child distribution already satisfies —
  * `exec/planner/physical/HashToRandomExchangePrel.java`).
  */
class BucketedLakeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** Execute, then count exchanges in the FINAL (post-AQE) plan. */
  private def shuffles(df: DataFrame): Int = {
    df.collect()
    "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).length
  }

  private def custDf = (1L to 400L).map(i => (i, s"cust_$i", (i % 5).toInt))
    .toDF("cust_id", "name", "segment")
  private def ordDf = (1L to 2000L).map(i => (i, i % 400 + 1, i * 1.5))
    .toDF("order_id", "cust_id", "amount")

  /** Force the shuffle-or-not decision to be the scan partitioning's:
    * no broadcast shortcut. */
  private def noBroadcast[A](body: => A): A = {
    val k = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(k)
    spark.conf.set(k, "-1")
    try body finally spark.conf.set(k, prev)
  }

  test("co-bucketed join and bucket-column aggregation run with zero exchanges") {
    val cd = fresh("bkt_c"); val od = fresh("bkt_o")
    val c = SnapshotTable.create(spark, cd, custDf)
    c.overwritePartitioned(custDf, Seq("bucket(4,cust_id)"))
    val o = SnapshotTable.create(spark, od, ordDf)
    o.overwritePartitioned(ordDf, Seq("bucket(4,cust_id)"))
    noBroadcast {
      val j = c.read().join(o.read().withColumnRenamed("name", "_n"), Seq("cust_id"))
        .groupBy("cust_id").agg(count(lit(1)).as("n"), sum("amount").as("amt"))
      assert(shuffles(j) == 0, j.queryExecution.executedPlan.toString)
      // values agree with the plain (shuffled) plan over the same data
      val plain = custDf.join(ordDf, Seq("cust_id"))
        .groupBy("cust_id").agg(count(lit(1)).as("n"), sum("amount").as("amt"))
      assert(j.orderBy("cust_id").collect().toSeq ==
        plain.orderBy("cust_id").collect().toSeq)
    }
  }

  test("non-bucketed tables DO shuffle — the zero above is the layout's doing") {
    val cd = fresh("bkt_c_plain"); val od = fresh("bkt_o_plain")
    val c = SnapshotTable.create(spark, cd, custDf)
    val o = SnapshotTable.create(spark, od, ordDf)
    noBroadcast {
      val j = c.read().join(o.read().withColumnRenamed("name", "_n"), Seq("cust_id"))
      assert(shuffles(j) > 0)
    }
  }

  test("copy-on-write DELETE preserves bucket naming: join stays shuffle-free") {
    val cd = fresh("bkt_c_dml"); val od = fresh("bkt_o_dml")
    val c = SnapshotTable.create(spark, cd, custDf)
    c.overwritePartitioned(custDf, Seq("bucket(4,cust_id)"))
    val o = SnapshotTable.create(spark, od, ordDf)
    o.overwritePartitioned(ordDf, Seq("bucket(4,cust_id)"))
    o.deleteWhere(col("amount") > 2400.0) // rewrites touched files
    noBroadcast {
      val j = c.read().join(o.read().withColumnRenamed("name", "_n"), Seq("cust_id"))
      assert(shuffles(j) == 0, j.queryExecution.executedPlan.toString)
      val expect = custDf.join(ordDf.filter(col("amount") <= 2400.0), Seq("cust_id"))
      assert(j.count() == expect.count())
    }
  }

  test("mixed identity+bucket layout still reads bucketed") {
    val od = fresh("bkt_mixed")
    val o = SnapshotTable.create(spark, od, ordDf.withColumn("seg", col("order_id") % 3))
    o.overwritePartitioned(ordDf.withColumn("seg", col("order_id") % 3),
      Seq("identity(seg)", "bucket(4,cust_id)"))
    noBroadcast {
      val agg = o.read().groupBy("cust_id").agg(sum("amount").as("amt"))
      assert(shuffles(agg) == 0, agg.queryExecution.executedPlan.toString)
      assert(agg.count() == 400)
    }
  }

  test("unbucketed legacy files force the fallback: first commit had no layout") {
    val od = fresh("bkt_legacy")
    val o = SnapshotTable.create(spark, od, ordDf) // v1: plain files
    o.appendPartitioned(ordDf.withColumn("order_id", col("order_id") + 10000),
      Seq("bucket(4,cust_id)")) // v2: bucketed files
    // live snapshot mixes both → no BucketSpec → still correct, shuffled
    noBroadcast {
      val agg = o.read().groupBy("cust_id").agg(count(lit(1)).as("n"))
      assert(shuffles(agg) > 0)
      assert(o.read().count() == 4000)
    }
  }

  test("differing power-of-two bucket counts coalesce instead of shuffling") {
    val cd = fresh("bkt_c8"); val od = fresh("bkt_o4")
    val c = SnapshotTable.create(spark, cd, custDf)
    c.overwritePartitioned(custDf, Seq("bucket(8,cust_id)"))
    val o = SnapshotTable.create(spark, od, ordDf)
    o.overwritePartitioned(ordDf, Seq("bucket(4,cust_id)"))
    noBroadcast {
      val j = c.read().join(o.read().withColumnRenamed("name", "_n"), Seq("cust_id"))
      assert(j.count() == 2000)
      assert(shuffles(j) == 0, j.queryExecution.executedPlan.toString)
    }
  }

  test("sorted co-bucketed tables merge-join with neither shuffle nor sort") {
    val cd = fresh("bkt_c_sorted"); val od = fresh("bkt_o_sorted")
    val c = SnapshotTable.create(spark, cd, custDf)
    c.overwritePartitioned(custDf, Seq("bucket(4,cust_id)"),
      sortCols = Seq("cust_id"))
    val o = SnapshotTable.create(spark, od, ordDf)
    o.overwritePartitioned(ordDf, Seq("bucket(4,cust_id)"),
      sortCols = Seq("cust_id"))
    noBroadcast {
      val j = c.read().join(o.read().withColumnRenamed("name", "_n"), Seq("cust_id"))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), plan)
      // "Sort [" is SortExec's render; SortMergeJoin prints "SortMergeJoin ["
      assert(!plan.contains("Sort ["), plan)
      assert(j.count() == 2000)
    }
  }

  test("declared sort is sticky: a DML rewrite re-sorts and stays merge-join-ready") {
    val od = fresh("bkt_sort_dml")
    val o = SnapshotTable.create(spark, od, ordDf)
    o.overwritePartitioned(ordDf, Seq("bucket(4,cust_id)"),
      sortCols = Seq("cust_id"))
    o.deleteWhere(col("amount") > 2400.0) // COW rewrite, no sortCols threaded
    noBroadcast {
      val self = o.read().groupBy("cust_id").agg(sum("amount").as("amt"))
      assert(shuffles(self) == 0, self.queryExecution.executedPlan.toString)
    }
    // the rewrite inherited the table's declared sort (like its partition
    // spec) — merge joins still need neither shuffle nor sort, no
    // compactSorted required
    noBroadcast {
      val cd = fresh("bkt_sort_dml_c")
      val c = SnapshotTable.create(spark, cd, custDf)
      c.overwritePartitioned(custDf, Seq("bucket(4,cust_id)"),
        sortCols = Seq("cust_id"))
      val j = c.read().join(o.read().withColumnRenamed("name", "_n"), Seq("cust_id"))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(!plan.contains("Sort ["), plan)
      assert(j.count() == ordDf.where(col("amount") <= 2400.0).count())
    }
  }

  test("CREATE LAKE ... SORT BY declares the layout through SQL; appends inherit it") {
    val cd = fresh("bkt_sql_c"); val od = fresh("bkt_sql_o")
    custDf.createOrReplaceTempView("bkt_sql_cust")
    ordDf.limit(1500).createOrReplaceTempView("bkt_sql_ord")
    ordDf.filter(col("order_id") > 1500).createOrReplaceTempView("bkt_sql_ord_tail")
    spark.sql(s"""CREATE LAKE '$cd' PARTITION BY (bucket(4,cust_id))
                 |SORT BY (cust_id) AS SELECT * FROM bkt_sql_cust""".stripMargin)
    spark.sql(s"""CREATE LAKE '$od' PARTITION BY (bucket(4,cust_id))
                 |SORT BY (cust_id) AS SELECT * FROM bkt_sql_ord""".stripMargin)
    assert(spark.sql(s"SHOW CREATE LAKE '$od'").head().getString(3) == "cust_id")
    // a plain INSERT INTO LAKE carries no sort of its own — it must
    // inherit the declared one, or the table silently stops merge-joining
    spark.sql(s"INSERT INTO LAKE '$od' SELECT * FROM bkt_sql_ord_tail")
    val o = SnapshotTable.forPath(spark, od)
    assert(o.commits.last.action == "append")
    assert(o.commits.last.stats.values.forall(
      _.get(SnapshotTable.SortStatKey).exists(_._1 == "cust_id")),
      "appended files must carry the inherited per-file sort marker")
    // two files per bucket now — Spark claims no ordering, so compact.
    // Plain compact() (no sort argument!) must inherit the declared sort,
    // exactly like it inherits the partition spec.
    o.compact()
    noBroadcast {
      val c = SnapshotTable.forPath(spark, cd)
      val j = c.read().join(o.read().withColumnRenamed("name", "_n"), Seq("cust_id"))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), plan)
      assert(!plan.contains("Sort ["), plan)
      assert(j.count() == 2000)
    }
  }

  test("bucket-id file naming round-trips through Spark's parser") {
    val od = fresh("bkt_names")
    val o = SnapshotTable.create(spark, od, ordDf)
    o.overwritePartitioned(ordDf, Seq("bucket(4,cust_id)"))
    // live snapshot files only (the superseded v1 plain files stay on
    // disk until VACUUM — they are exactly what the fallback guard is for)
    val parquets = o.read().select(input_file_name().as("f")).distinct()
      .as[String].collect().toSeq.map(f => f.substring(f.lastIndexOf('/') + 1))
    assert(parquets.nonEmpty)
    parquets.foreach { n =>
      val id = org.apache.spark.sql.graft.Bridge.bucketId(n)
      assert(id.exists(i => i >= 0 && i < 4), s"unparseable bucket name: $n")
    }
    // and the recorded ids are truthful: rows in a bucket-b file hash to b
    val withFile = o.read().withColumn("f", input_file_name())
      .withColumn("expect", pmod(hash(col("cust_id")), lit(4)))
    val bad = withFile.filter(
      regexp_extract(col("f"), "_(\\d+)\\.", 1).cast("int") =!= col("expect"))
    assert(bad.count() == 0)
  }
}
