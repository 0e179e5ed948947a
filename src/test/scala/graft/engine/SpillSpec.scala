package graft.engine

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Spill-path checks (reference: external sort DiskRunManager, hash-agg
  * partition spilling, hash-join spill — SURVEY §2/§4.3; Spark supplies all
  * three via UnsafeExternalSorter/ExternalAppendOnlyUnsafeRowArray). The
  * specs force the in-memory thresholds to a handful of rows so the spill
  * path actually executes on fixture data, and assert results are identical
  * to the in-memory run — correctness under memory pressure is the 100 TB
  * property that matters.
  */
class SpillSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("window frames spill and stay correct") {
    val q = () => graft.SparkEntry.queries("window_rows_frame")(spark, TestSpark.sf)
    val inMem = q().collect()
    withConf("spark.sql.windowExec.buffer.spill.threshold" -> "8",
      "spark.sql.windowExec.buffer.in.memory.threshold" -> "8") {
      val spilled = q().collect()
      assert(spilled.sameElements(inMem))
    }
  }

  test("sort-merge join buffers spill and stay correct") {
    val q = () => graft.SparkEntry.queries("join_merge")(spark, TestSpark.sf)
    val inMem = q().collect()
    withConf("spark.sql.sortMergeJoinExec.buffer.spill.threshold" -> "4",
      "spark.sql.sortMergeJoinExec.buffer.in.memory.threshold" -> "4") {
      val spilled = q().collect()
      assert(spilled.sameElements(inMem))
    }
  }

  test("object hash aggregate falls back to sort-based and stays correct") {
    val t = Tables(spark, TestSpark.sf)
    val q = () => t.nation
      .groupBy(col("n_regionkey"))
      .agg(array_join(array_sort(collect_list(col("n_name"))), ",").as("ns"))
      .orderBy(col("n_regionkey"))
    val inMem = q().collect()
    withConf("spark.sql.objectHashAggregate.sortBased.fallbackThreshold" -> "1") {
      val fellBack = q().collect()
      assert(fellBack.sameElements(inMem))
    }
  }
}
