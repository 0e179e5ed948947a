package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** CONVERT_TO/CONVERT_FROM-family coverage (reference
  * `exec/expr/fn/impl/conv/` — 43 converters; SURVEY §2.8): base64, hex,
  * big-endian ints, UTF-8, plus the TIME-type convention (SURVEY §7.4:
  * Dremio TIME = millis-since-midnight; Spark has no TIME type, so the
  * engine's convention is an int millis column). Pinned expected values —
  * these are byte-format contracts, not oracle-comparable floats.
  */
class ConversionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("base64 / unbase64 round trip (CONVERT_TO/FROM BASE64)") {
    val r = Seq("graft engine").toDF("s").select(
      base64(col("s").cast("binary")).as("b64"),
      unbase64(base64(col("s").cast("binary"))).cast("string").as("back")).head()
    assert(r.getString(0) == "Z3JhZnQgZW5naW5l")
    assert(r.getString(1) == "graft engine")
  }

  test("hex / unhex (CONVERT_TO/FROM UTF8 via hex)") {
    val r = Seq("AB").toDF("s").select(
      hex(col("s").cast("binary")).as("h"),
      unhex(hex(col("s").cast("binary"))).cast("string").as("back"),
      hex(lit(255L)).as("hnum")).head()
    assert(r.getString(0) == "4142")
    assert(r.getString(1) == "AB")
    assert(r.getString(2) == "FF")
  }

  test("big-endian int bytes (CONVERT_FROM INT_BE analog)") {
    // int 1 as 4 BE bytes
    val bytes = Seq(1).toDF("i")
      .select(expr("reverse(substring(cast(cast(i as binary) as binary), 1, 4))"))
    // Spark's cast int->binary is already big-endian; verify directly:
    val be = Seq(258).toDF("i").select(hex(col("i").cast("binary"))).head().getString(0)
    assert(be == "00000102") // 258 = 0x0102, 4-byte big-endian
    assert(bytes.count() == 1)
  }

  test("crc32 / soundex (reference checksum + Soundex.java)") {
    val r = Seq("graft").toDF("s").select(
      crc32(col("s").cast("binary")).as("c"),
      soundex(col("s")).as("sx"),
      soundex(lit("Robert")).as("sx2")).head()
    assert(r.getLong(0) == 31255620L) // zlib.crc32(b"graft")
    assert(r.getString(1) == "G613")
    assert(r.getString(2) == "R163")
  }

  test("TIME convention: millis-since-midnight int column") {
    val t = graft.engine.Tables(spark, TestSpark.sf)
    def timeOfDayMillis(c: org.apache.spark.sql.Column) =
      ((unix_micros(c.cast("timestamp")) / 1000) -
        (unix_micros(date_trunc("DAY", c).cast("timestamp")) / 1000)).cast("long")
    val r = t.events.select(col("ts"), timeOfDayMillis(col("ts")).as("tod"))
      .filter(col("tod") < 0 || col("tod") >= 86400000L)
    assert(r.count() == 0) // convention invariant: 0 <= TIME < 24h in millis
    val pinned = Seq("2024-01-01 01:02:03.456").toDF("s")
      .select(timeOfDayMillis(to_timestamp(col("s")))).head().getLong(0)
    assert(pinned == (1 * 3600 + 2 * 60 + 3) * 1000L + 456)
  }
}
