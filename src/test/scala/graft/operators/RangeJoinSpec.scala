package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("point-in-interval matches [start, end) including bin-boundary cases") {
    val intervals = Seq(
      (1L, "u", ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      (2L, "u", ts("2024-01-01 10:30:00"), ts("2024-01-01 12:30:00")), // spans 3 bins
      (3L, "v", ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"))
    ).toDF("iv_id", "k", "s", "e")
    val points = Seq(
      (10L, "u", ts("2024-01-01 10:00:00")), // == start: in
      (11L, "u", ts("2024-01-01 11:00:00")), // == end of iv1: out; in iv2
      (12L, "u", ts("2024-01-01 12:29:59")), // last second of iv2
      (13L, "u", ts("2024-01-01 09:59:59")), // just before
      (14L, "w", ts("2024-01-01 10:30:00"))  // wrong key
    ).toDF("p_id", "k", "t")
    val got = RangeJoin.pointInInterval(points, intervals, Seq("k"),
        "t", "s", "e", binSeconds = 3600)
      .select($"p_id", $"iv_id").as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 1L), (11L, 2L), (12L, 2L)))
  }

  test("matches the naive theta join on fixture events and plans no NLJ") {
    val ev = graft.engine.Tables.ensure(spark, TestSpark.sf).events
    val iv = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("iv_id"), $"user_id", $"ts".as("s"))
      .withColumn("e", $"s" + expr("INTERVAL 1 HOUR"))
    val pt = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts".as("t"), $"event_id".as("p_id"))
    val fast = RangeJoin.pointInInterval(pt, iv, Seq("user_id"),
      "t", "s", "e", binSeconds = 3600).select($"p_id", $"iv_id")
    val naive = pt.join(iv.withColumnRenamed("user_id", "u2"),
        $"user_id" === $"u2" && $"t" >= $"s" && $"t" < $"e")
      .select($"p_id", $"iv_id")
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
    val plan = fast.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }
}
