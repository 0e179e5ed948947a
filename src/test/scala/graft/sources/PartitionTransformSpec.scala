package graft.sources

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The load-bearing invariant of partition pruning: a transform's two
  * faces — the WRITE-side Column expression and the PRUNE-side driver
  * literal mapping — must agree on every value, or pruning silently drops
  * files that contain matches. Checked value-by-value over adversarial
  * inputs (negatives, extremes, pre-epoch dates, leap days, non-BMP
  * strings). */
class PartitionTransformSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def writeSide(t: PartitionTransform,
                        df: org.apache.spark.sql.DataFrame): Seq[Any] =
    df.select(t.column(col("v"))).collect().toSeq.map(_.get(0))

  private def litSide(t: PartitionTransform, l: Literal): Any =
    t.literal(l).map(_.value).orNull

  test("bucket: column expression and literal mapping agree on longs and strings") {
    val longs = Seq(-5L, 0L, 7L, 42L, 1234567890123L, Long.MaxValue, Long.MinValue)
    val t = PartitionTransform.parse("bucket(16,v)")
    writeSide(t, longs.toDF("v")).zip(longs).foreach { case (w, v) =>
      assert(litSide(t, Literal(v)) == w, s"bucket mismatch for $v")
    }
    val strs = Seq("", "a", "hello", "héllo wörld", "🎉🎊", "same", "Same")
    val ts = PartitionTransform.parse("bucket(8,v)")
    writeSide(ts, strs.toDF("v")).zip(strs).foreach { case (w, v) =>
      assert(litSide(ts, Literal(UTF8String.fromString(v), StringType)) == w,
        s"bucket mismatch for '$v'")
    }
  }

  test("truncate: floor-to-width matches for negative and positive integers") {
    val vals = Seq(-17L, -10L, -1L, 0L, 1L, 9L, 10L, 123L, 999999999L)
    val t = PartitionTransform.parse("truncate(10,v)")
    writeSide(t, vals.toDF("v")).zip(vals).foreach { case (w, v) =>
      assert(litSide(t, Literal(v)) == w, s"truncate mismatch for $v")
    }
    // int-typed column + int literal (the analyzer's literal type for an
    // int column) also agree
    val ints = Seq(-7, 0, 25)
    writeSide(t, ints.toDF("v")).zip(ints).foreach { case (w, v) =>
      assert(litSide(t, Literal(v)) == w)
    }
  }

  test("truncate_str: prefix counts codepoints, not UTF-16 units") {
    val vals = Seq("", "ab", "abc", "abcdef", "héllo", "🎉🎊abc", "🎉🎊🎈🎆", "日本語のテキスト")
    val t = PartitionTransform.parse("truncate_str(3,v)")
    writeSide(t, vals.toDF("v")).zip(vals).foreach { case (w, v) =>
      assert(litSide(t, Literal(UTF8String.fromString(v), StringType)).toString ==
        String.valueOf(w), s"truncate_str mismatch for '$v'")
    }
  }

  test("year/month/day: date columns agree incl. pre-epoch and leap days") {
    val days = Seq("1969-07-20", "1969-12-31", "1970-01-01", "1994-03-15",
      "2000-02-29", "2024-02-29", "2024-12-31")
      .map(java.time.LocalDate.parse)
    val df = days.map(java.sql.Date.valueOf).toDF("v")
    for (spec <- Seq("year(v)", "month(v)", "day(v)")) {
      val t = PartitionTransform.parse(spec)
      writeSide(t, df).zip(days).foreach { case (w, d) =>
        assert(litSide(t, Literal(d.toEpochDay.toInt, DateType)) == w,
          s"$spec mismatch for $d")
      }
    }
  }

  test("year/month/day/hour: timestamp columns agree with micros literals (UTC)") {
    val instants = Seq("1969-07-20T20:17:00Z", "1970-01-01T00:00:00Z",
      "1994-03-15T23:59:59Z", "2024-02-29T12:00:00Z", "2024-06-01T00:59:59.5Z",
      "2024-06-01T01:00:00Z")
      .map(java.time.Instant.parse)
    val df = instants.toDF("v")
    for (spec <- Seq("year(v)", "month(v)", "day(v)", "hour(v)")) {
      val t = PartitionTransform.parse(spec)
      writeSide(t, df).zip(instants).foreach { case (w, i) =>
        val micros = i.getEpochSecond * 1000000L + i.getNano / 1000L
        assert(litSide(t, Literal(micros, TimestampType)) == w,
          s"$spec mismatch for $i")
      }
    }
    // hour over a DATE column maps through midnight (days * 24)
    val hd = PartitionTransform.parse("hour(v)")
    val dateDf = Seq(java.sql.Date.valueOf("1994-03-15")).toDF("v")
    val d = java.time.LocalDate.parse("1994-03-15").toEpochDay
    assert(writeSide(hd, dateDf) == Seq(d * 24L))
    assert(litSide(hd, Literal(d.toInt, DateType)) == d * 24L)
  }

  test("identity: literal passes through; parse round-trips every repr") {
    val t = PartitionTransform.parse("identity(v)")
    assert(litSide(t, Literal(42L)) == 42L)
    for (s <- Seq("identity(c)", "bucket(16,c)", "truncate(10,c)",
      "truncate_str(4,c)", "year(c)", "month(c)", "day(c)", "hour(c)"))
      assert(PartitionTransform.parse(s).repr == s)
    intercept[IllegalArgumentException](PartitionTransform.parse("minute(c)"))
  }
}
