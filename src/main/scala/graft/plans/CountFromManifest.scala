package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.{DateTimeUtils, TypeUtils}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.sources.{LakeFileIndex, SnapshotTable}

/** Answer bare `COUNT(*)` / `MIN(col)` / `MAX(col)` aggregates over an
  * unfiltered lake-table scan from the commit manifest — no file is opened
  * at all.
  *
  * COUNT is the reference's metadata-count optimization
  * (`CountOnScanToValuesRule`, dremio-oss `exec/planner/PlannerPhase.java:337`);
  * MIN/MAX is the Iceberg-style extension over the same manifest: per-file
  * column min/max recorded at commit (for `STATS (cols)` tables) fold to
  * the exact global extremum, because commit-side stats are min/max
  * aggregates of the data actually written. At 100 TB the difference is a
  * full-table scan vs a driver-side fold over numbers the commits already
  * recorded.
  *
  * Fires only when provably exact:
  *  - global aggregate (no GROUP BY), every output a non-distinct,
  *    unfiltered `count(*)`/`count(1)`, or `min`/`max` of a DIRECT scan
  *    column with a manifest stat on EVERY file (one legacy or
  *    stats-less file → unknowable without a scan → keep the scan);
  *  - the child is the lake scan itself, or pass-through Projects over it
  *    (a Project never changes cardinality). A Filter, Union, or any
  *    other node blocks the rewrite;
  *  - the column's type round-trips the manifest's string rendering
  *    exactly (integral/floating/decimal/boolean/date/string). An
  *    all-null file records the string "null" and contributes nothing
  *    (SQL MIN/MAX ignore nulls) — except for STRING columns, where a
  *    real value could also render as "null", so the rule declines.
  */
class CountFromManifest(spark: SparkSession) extends Rule[LogicalPlan] {

  private def lakeIndex(p: LogicalPlan): Option[LakeFileIndex] = p match {
    case Project(exprs, child) if exprs.forall(_.isInstanceOf[AttributeReference]) =>
      lakeIndex(child)
    case l: LogicalRelation =>
      l.relation match {
        case fs: HadoopFsRelation =>
          fs.location match {
            case idx: LakeFileIndex => Some(idx)
            case _ => None
          }
        case _ => None
      }
    case _ => None
  }

  /** Parse a manifest stat string back to the column type's CATALYST value
    * (None = this file's column is all-null; parse failure = give up). */
  private def parseStat(s: String, dt: DataType): Either[Unit, Option[Any]] = {
    if (s == "null") {
      if (dt == StringType) Left(()) // ambiguous with a real "null" string
      else Right(None)
    } else try {
      Right(Some(dt match {
        case LongType => s.toLong
        case IntegerType => s.toInt
        case ShortType => s.toShort
        case ByteType => s.toByte
        case DoubleType => s.toDouble
        case FloatType => s.toFloat
        case BooleanType => s.toBoolean
        case StringType => UTF8String.fromString(s)
        case DateType => DateTimeUtils.fromJavaDate(java.sql.Date.valueOf(s))
        case d: DecimalType =>
          org.apache.spark.sql.types.Decimal(BigDecimal(s), d.precision, d.scale)
        case _ => return Left(())
      }))
    } catch { case scala.util.control.NonFatal(_) => Left(()) }
  }

  /** Exact global min/max of `a` from per-file manifest stats, or None if
    * any file lacks a stat / any value fails the round trip. The inner
    * Option is the SQL value (None = all files all-null → NULL). */
  private def manifestExtremum(idx: LakeFileIndex, a: AttributeReference,
                               wantMin: Boolean): Option[Option[Any]] = {
    val perFile = idx.columnStats(a.name) match {
      case Some(sts) => sts
      case None => return None
    }
    if (perFile.isEmpty) return Some(None) // empty snapshot → NULL
    val picked = perFile.map { case (mn, mx) => if (wantMin) mn else mx }
    val parsed = picked.map(parseStat(_, a.dataType))
    if (parsed.exists(_.isLeft)) return None
    val vals = parsed.collect { case Right(Some(v)) => v }
    if (vals.isEmpty) Some(None)
    else {
      val ord = TypeUtils.getInterpretedOrdering(a.dataType)
      Some(Some(if (wantMin) vals.min(ord) else vals.max(ord)))
    }
  }

  /** The manifest answer for one aggregate output, if provable. */
  private def answer(idx: LakeFileIndex, e: NamedExpression): Option[Any] = e match {
    case Alias(AggregateExpression(Count(Seq(Literal(v, _))), Complete, false, None, _), _)
        if v != null =>
      idx.manifestRowCount.map(n => n: Any)
    case Alias(AggregateExpression(Min(a: AttributeReference), Complete, false, None, _), _) =>
      manifestExtremum(idx, a, wantMin = true).map(_.orNull)
    case Alias(AggregateExpression(Max(a: AttributeReference), Complete, false, None, _), _) =>
      manifestExtremum(idx, a, wantMin = false).map(_.orNull)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(Nil, exprs, child, _) if exprs.nonEmpty =>
      lakeIndex(child) match {
        case Some(idx) =>
          val answers = exprs.map(answer(idx, _))
          if (answers.forall(_.isDefined))
            LocalRelation(agg.output, Seq(InternalRow.fromSeq(answers.map(_.get))))
          else agg
        case None => agg
      }
  }
}
