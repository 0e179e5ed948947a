package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Decimal edge cases at the precision-38 boundary (reference
  * BaseDecimalFunctionTests; both engines cap at 38 — SURVEY §7.4 pins the
  * chosen scale-inference behavior, `allowPrecisionLoss` default). */
class DecimalEdgeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("decimal(38,0) round-trips max magnitude") {
    val big = "9" * 38
    val r = spark.sql(s"SELECT CAST('$big' AS DECIMAL(38,0)) AS d").head()
    assert(r.getDecimal(0).toPlainString == big)
  }

  test("sum of decimal(12,2) stays exact over many rows") {
    val df = (1 to 10000).map(i => i / 100.0).toDF("x")
    val s = df.select(sum(col("x").cast(DecimalType(12, 2))).as("s")).head().getDecimal(0)
    // exact: sum i/100 for i=1..10000 = (10000*10001/2)/100 = 500050.00
    assert(s.compareTo(new java.math.BigDecimal("500050.00")) == 0)
  }

  test("multiplication precision growth caps at 38 with scale adjustment") {
    val r = spark.sql(
      "SELECT CAST(1.23 AS DECIMAL(20,2)) * CAST(4.56 AS DECIMAL(20,2)) AS p").schema("p")
    val dt = r.dataType.asInstanceOf[DecimalType]
    assert(dt.precision <= 38)
    assert(spark.sql(
      "SELECT CAST(CAST(1.23 AS DECIMAL(20,2)) * CAST(4.56 AS DECIMAL(20,2)) AS DOUBLE)")
      .head().getDouble(0) == 5.6088)
  }

  test("overflow behavior is NULL under non-ANSI (Dremio-compatible coercion mode)") {
    assert(spark.conf.get("spark.sql.ansi.enabled") == "false")
    val r = spark.sql(
      "SELECT CAST('99999999999999999999' AS DECIMAL(10,0)) AS d").head()
    assert(r.isNullAt(0))
  }

  test("implicit varchar<->numeric comparison coerces (Dremio-style promiscuous casts)") {
    val r = spark.sql("SELECT '42' = 42 AS eq, '3.5' + 1 AS plus").head()
    assert(r.getBoolean(0))
    assert(r.getDouble(1) == 4.5)
  }

  test("division scale: decimal / decimal keeps quotient precision") {
    val q = spark.sql(
      "SELECT CAST(1 AS DECIMAL(38,18)) / CAST(3 AS DECIMAL(38,18)) AS q").head().getDecimal(0)
    assert(q.toPlainString.startsWith("0.333333"))
  }
}
