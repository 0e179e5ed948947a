package graft.catalog

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class StatisticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("profile computes per-column count/nulls/ndv/min/max in one pass") {
    val df = Seq(
      (1L, Some("a"), 1.5),
      (2L, None, 2.5),
      (3L, Some("a"), 2.5),
      (4L, Some("b"), -1.0)).toDF("id", "tag", "x")
    val p = Statistics.profile(df, exactNdv = true)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(p("id") == ((4L, 0L, 4L, "1", "4")))
    assert(p("tag") == ((4L, 1L, 2L, "a", "b")))
    assert(p("x") == ((4L, 0L, 3L, "-1.0", "2.5")))
    // rows come back ordered by column name
    val names = Statistics.profile(df).collect().map(_.getString(0)).toSeq
    assert(names == names.sorted)
    // the HLL path is within the sketch's error envelope on small inputs
    val approx = Statistics.profile(df).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(math.abs(approx("id") - 4L) <= 1)
  }

  test("frequentItems returns exact top-k with deterministic tiebreak") {
    val df = (Seq.fill(5)("x") ++ Seq.fill(3)("y") ++ Seq.fill(3)("a") ++ Seq("z"))
      .toDF("v")
    val top = Statistics.frequentItems(df, "v", 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(top == Seq(("x", 5L), ("a", 3L), ("y", 3L)))
  }

  test("ANALYZE LAKE profiles the current snapshot through SQL") {
    val dir = Files.createTempDirectory("graft_analyze").toString
    graft.sources.SnapshotTable.create(spark, dir,
      spark.range(0, 100).select(col("id"), (col("id") % 10).as("k")).toDF())
    val rows = spark.sql(s"ANALYZE LAKE '$dir'").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(3))).toMap
    assert(rows("id")._1 == "100")
    assert(rows.contains("k"))
    // HLL ndv on 0..99 is within a few percent of exact
    assert(math.abs(rows("id")._2.toLong - 100L) <= 5)
  }
}
