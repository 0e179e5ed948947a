package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** TIME-type convention (SURVEY §7.4): Spark 4.1 native TIME columns with
  * INT millis-of-day interchange, matching the reference's TIME model
  * (CompleteType.java:160 — millis-of-day, no timezone). */
class TimeTypeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("TIME literals and casts work end to end") {
    val r = spark.sql("SELECT TIME'12:34:56.789' AS t").head()
    assert(r.get(0).toString.startsWith("12:34:56.789"))
    val casted = spark.sql("SELECT CAST('08:09:10' AS TIME) AS t")
    assert(casted.schema.head.dataType.typeName.startsWith("time"))
  }

  test("millis-of-day roundtrip is lossless at reference precision") {
    val df = Seq(0, 1, 45296789, 86399999).toDF("ms") // edge + midday values
    val back = df
      .withColumn("t", TimeConv.fromMillisOfDay(col("ms")))
      .withColumn("ms2", TimeConv.toMillisOfDay(col("t")))
    val rows = back.select("ms", "ms2").as[(Int, Int)].collect()
    rows.foreach { case (a, b) => assert(a == b, s"roundtrip $a -> $b") }
  }

  test("TIME ordering and grouping behave like time-of-day") {
    val df = spark.sql("""
      SELECT t FROM VALUES (TIME'23:00:00'), (TIME'01:30:00'), (TIME'12:00:00') v(t)""")
    val sorted = df.orderBy("t").collect().map(_.get(0).toString)
    assert(sorted.head.startsWith("01:30") && sorted.last.startsWith("23:00"))
  }
}
