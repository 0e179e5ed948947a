package graft.sources

import java.time.LocalDate

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg-style partition transforms for graft-lake tables (reference:
  * the Iceberg transform handling inside the planner prune rule,
  * dremio-oss `exec/planner/logical/partition/PruneScanRuleBase.java:117`,
  * and `exec/store/iceberg/` partition-spec plumbing).
  *
  * A transform has two faces that MUST agree:
  *  - `column`: the write-side Column expression — data files are
  *    directory-partitioned by its value, and each file records the
  *    transform's (min, max) (= one value per file) in the commit manifest
  *    under the `repr` key;
  *  - `literal`: the prune-side mapping of a predicate literal into
  *    partition space, evaluated on the driver at plan time.
  * Agreement is by construction: `bucket` evaluates the same Murmur3Hash
  * expression Spark's `hash()` compiles to; date transforms use the same
  * UTC epoch arithmetic the session (spark.sql.session.timeZone=UTC)
  * applies on write.
  *
  * Pruning semantics per transform:
  *  - monotonic transforms (identity, truncate, year/month/day) prune
  *    equality AND range predicates: `c >= L` implies `t(c) >= t(L)`
  *    (non-strict — transforms are many-to-one, so strictness is lost);
  *  - `bucket` prunes only equality / IN (hash order is meaningless).
  * Anything a transform cannot map (type mismatch, null) keeps the file —
  * pruning stays a strict superset of the true result.
  */
sealed abstract class PartitionTransform {
  def srcCol: String

  /** Stable identity: the manifest stats key and the commit-log spec entry. */
  def repr: String

  /** Write-side partition value. */
  def column(c: Column): Column

  /** Prune-side: transformed predicate literal, or None to keep the file. */
  def literal(l: Literal): Option[Literal]

  /** Range predicates prune only through order-preserving transforms. */
  def monotonic: Boolean

  /** Epoch day for date/timestamp/timestamp_ntz literals (UTC), else None. */
  protected final def epochDay(l: Literal): Option[Long] = l.dataType match {
    case DateType => Some(l.value.asInstanceOf[Int].toLong)
    case TimestampType | TimestampNTZType =>
      Some(Math.floorDiv(l.value.asInstanceOf[Long], 86400000000L))
    case _ => None
  }
}

object PartitionTransform {

  final case class IdentityT(srcCol: String) extends PartitionTransform {
    val repr = s"identity($srcCol)"
    def column(c: Column): Column = c
    def literal(l: Literal): Option[Literal] = Some(l)
    def monotonic = true
  }

  /** Murmur3(seed 42) mod n — the same kernel `functions.hash` compiles to,
    * evaluated driver-side for the predicate literal. */
  final case class BucketT(n: Int, srcCol: String) extends PartitionTransform {
    require(n > 0, s"bucket($n, $srcCol): bucket count must be positive")
    val repr = s"bucket($n,$srcCol)"
    def column(c: Column): Column = pmod(hash(c), lit(n))
    def literal(l: Literal): Option[Literal] =
      if (l.value == null) None
      else {
        val h = Murmur3Hash(Seq(l), 42).eval(null).asInstanceOf[Int]
        Some(Literal(((h % n) + n) % n))
      }
    def monotonic = false
  }

  /** Integral: floor-to-width (`c - pmod(c, w)`); string: prefix of length
    * `w` (both order-preserving). */
  final case class TruncateT(w: Int, srcCol: String) extends PartitionTransform {
    require(w > 0, s"truncate($w, $srcCol): width must be positive")
    val repr = s"truncate($w,$srcCol)"
    def column(c: Column): Column =
      c.cast(LongType) - pmod(c.cast(LongType), lit(w.toLong))
    def literal(l: Literal): Option[Literal] = l.value match {
      case null => None
      case _ => l.dataType match {
        case ByteType | ShortType | IntegerType | LongType =>
          val v = l.value.asInstanceOf[Number].longValue()
          Some(Literal(Math.floorDiv(v, w.toLong) * w.toLong))
        case _ => None
      }
    }
    def monotonic = true
  }

  /** Prefix truncate for strings (separate transform so the write-side
    * column is well-typed without runtime type dispatch). */
  final case class TruncateStrT(w: Int, srcCol: String) extends PartitionTransform {
    require(w > 0, s"truncate_str($w, $srcCol): width must be positive")
    val repr = s"truncate_str($w,$srcCol)"
    def column(c: Column): Column = substring(c, 1, w)
    def literal(l: Literal): Option[Literal] = l.value match {
      case s: UTF8String =>
        // count CODEPOINTS like SQL substring does — String.take(w) counts
        // UTF-16 units and would disagree on non-BMP text (emoji), making
        // the prune-side prefix wrong
        val str = s.toString
        val cut = str.offsetByCodePoints(0, math.min(w, str.codePointCount(0, str.length)))
        Some(Literal(UTF8String.fromString(str.substring(0, cut)), StringType))
      case _ => None
    }
    def monotonic = true
  }

  final case class YearT(srcCol: String) extends PartitionTransform {
    val repr = s"year($srcCol)"
    def column(c: Column): Column = year(c.cast(DateType)) - lit(1970)
    def literal(l: Literal): Option[Literal] =
      epochDay(l).map(d => Literal(LocalDate.ofEpochDay(d).getYear - 1970))
    def monotonic = true
  }

  /** Months since 1970-01 (Iceberg's month transform — monotonic across
    * year boundaries, unlike a bare MONTH()). */
  final case class MonthT(srcCol: String) extends PartitionTransform {
    val repr = s"month($srcCol)"
    def column(c: Column): Column = {
      val d = c.cast(DateType)
      (year(d) - lit(1970)) * lit(12) + month(d) - lit(1)
    }
    def literal(l: Literal): Option[Literal] = epochDay(l).map { days =>
      val ld = LocalDate.ofEpochDay(days)
      Literal((ld.getYear - 1970) * 12 + ld.getMonthValue - 1)
    }
    def monotonic = true
  }

  final case class DayT(srcCol: String) extends PartitionTransform {
    val repr = s"day($srcCol)"
    def column(c: Column): Column =
      datediff(c.cast(DateType), to_date(lit("1970-01-01")))
    def literal(l: Literal): Option[Literal] = epochDay(l).map(d => Literal(d.toInt))
    def monotonic = true
  }

  /** Hours since epoch (floor) — the finest Iceberg time transform, for
    * event streams where a day is still too coarse. Double arithmetic on
    * the write side is exact here: epoch seconds ≪ 2^53 and the relative
    * error is orders below the 1/3600 floor-boundary gap. */
  final case class HourT(srcCol: String) extends PartitionTransform {
    val repr = s"hour($srcCol)"
    def column(c: Column): Column = // via timestamp so DATE inputs work too
      floor(c.cast(TimestampType).cast(DoubleType) / lit(3600.0)).cast(LongType)
    def literal(l: Literal): Option[Literal] = l.dataType match {
      case TimestampType | TimestampNTZType =>
        Some(Literal(Math.floorDiv(l.value.asInstanceOf[Long], 3600000000L)))
      case DateType => Some(Literal(l.value.asInstanceOf[Int].toLong * 24L))
      case _ => None
    }
    def monotonic = true
  }

  /** Same transform over a renamed source column (identity if no match). */
  def rename(t: PartitionTransform, oldName: String, newName: String): PartitionTransform =
    if (!t.srcCol.equalsIgnoreCase(oldName)) t
    else t match {
      case IdentityT(_) => IdentityT(newName)
      case BucketT(n, _) => BucketT(n, newName)
      case TruncateT(w, _) => TruncateT(w, newName)
      case TruncateStrT(w, _) => TruncateStrT(w, newName)
      case YearT(_) => YearT(newName)
      case MonthT(_) => MonthT(newName)
      case DayT(_) => DayT(newName)
      case HourT(_) => HourT(newName)
    }

  private val Re = """(\w+)\s*\(\s*(?:(\d+)\s*,\s*)?([\w.]+)\s*\)""".r

  /** Parse a spec entry (the commit-log string form): `identity(c)`,
    * `bucket(16,c)`, `truncate(10,c)`, `truncate_str(4,c)`, `year(c)`,
    * `month(c)`, `day(c)`. */
  def parse(s: String): PartitionTransform = s.trim match {
    case Re("identity", null, c) => IdentityT(c)
    case Re("bucket", n, c) if n != null => BucketT(n.toInt, c)
    case Re("truncate", w, c) if w != null => TruncateT(w.toInt, c)
    case Re("truncate_str", w, c) if w != null => TruncateStrT(w.toInt, c)
    case Re("year", null, c) => YearT(c)
    case Re("month", null, c) => MonthT(c)
    case Re("day", null, c) => DayT(c)
    case Re("hour", null, c) => HourT(c)
    case other => throw new IllegalArgumentException(
      s"unknown partition transform: '$other' (supported: identity(c), " +
        "bucket(n,c), truncate(w,c), truncate_str(w,c), year(c), month(c), " +
        "day(c), hour(c))")
  }
}
