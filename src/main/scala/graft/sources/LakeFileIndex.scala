package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer-integrated manifest pruning for graft-lake scans: a custom
  * `FileIndex` whose `listFiles` drops data files whose per-file min/max
  * manifest stats cannot satisfy the query's pushed data filters — so a
  * plain SQL `WHERE c BETWEEN 100 AND 200` over a lake view prunes files
  * exactly like the explicit `scanRange` API, with no user opt-in. This is
  * the Spark-native seat of the reference's planner-side prune rule
  * (dremio-oss `exec/planner/logical/partition/PruneScanRuleBase.java:117`)
  * and the same integration point Delta's TahoeFileIndex uses.
  *
  * Pruning is strictly a superset: a file with no recorded stats, or a
  * predicate shape the evaluator doesn't understand, is always read; the
  * full predicate is still evaluated by Spark (and pushed to parquet
  * row-group stats), so results are exact regardless of stats quality.
  *
  * Scale: the file list and stats come from the commit log already parsed
  * on the driver — `listFiles` is pure in-memory filtering, O(files ·
  * conjuncts), no filesystem calls at plan time beyond one `getFileStatus`
  * per data file (cached for the life of the snapshot; a production log
  * would carry sizes in the manifest the way Iceberg manifests do).
  */
final class LakeFileIndex(
    spark: SparkSession,
    tableDir: String,
    // absolute path -> column -> (min, max) as manifest strings
    filesWithStats: Seq[(String, Map[String, (String, String)])],
    dataSchema: StructType) extends FileIndex {

  import LakeFileIndex._

  override def rootPaths: Seq[Path] = Seq(new Path(tableDir))
  override def partitionSchema: StructType = new StructType()

  // File list is pinned at construction (snapshot isolation): later commits
  // never mutate committed files, so refresh() has nothing to re-list.
  private lazy val statuses: Seq[(FileStatus, Map[String, (String, String)])] = {
    val fs = new Path(tableDir).getFileSystem(
      org.apache.spark.sql.graft.Bridge.hadoopConf(spark))
    filesWithStats.map { case (p, st) => fs.getFileStatus(new Path(p)) -> st }
  }

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val types: Map[String, org.apache.spark.sql.types.DataType] =
      dataSchema.fields.map(f => f.name.toLowerCase -> f.dataType).toMap
    val kept = statuses.collect {
      case (fst, stats) if dataFilters.forall(f => mayMatch(stats, types, f)) => fst
    }
    Seq(PartitionDirectory(InternalRow.empty, kept.toArray))
  }

  override def inputFiles: Array[String] = filesWithStats.map(_._1).toArray
  override def refresh(): Unit = ()
  override def sizeInBytes: Long = statuses.map(_._1.getLen).sum
}

object LakeFileIndex {

  /** Can a file with these manifest stats contain a row matching `e`?
    * Returns true unless provably false — every unknown shape keeps the
    * file (pruning must be a superset of the true result). */
  private[sources] def mayMatch(
      stats: Map[String, (String, String)],
      types: Map[String, org.apache.spark.sql.types.DataType],
      e: Expression): Boolean = e match {
    case And(l, r) => mayMatch(stats, types, l) && mayMatch(stats, types, r)
    case Or(l, r) => mayMatch(stats, types, l) || mayMatch(stats, types, r)
    case EqualTo(a: AttributeReference, l: Literal) => rangeHas(stats, types, a, l, l)
    case EqualTo(l: Literal, a: AttributeReference) => rangeHas(stats, types, a, l, l)
    case EqualNullSafe(a: AttributeReference, l: Literal) => rangeHas(stats, types, a, l, l)
    case EqualNullSafe(l: Literal, a: AttributeReference) => rangeHas(stats, types, a, l, l)
    case GreaterThan(a: AttributeReference, l: Literal) => maxAbove(stats, types, a, l, strict = true)
    case GreaterThanOrEqual(a: AttributeReference, l: Literal) => maxAbove(stats, types, a, l, strict = false)
    case LessThan(a: AttributeReference, l: Literal) => minBelow(stats, types, a, l, strict = true)
    case LessThanOrEqual(a: AttributeReference, l: Literal) => minBelow(stats, types, a, l, strict = false)
    // literal-on-left comparisons flip
    case GreaterThan(l: Literal, a: AttributeReference) => minBelow(stats, types, a, l, strict = true)
    case GreaterThanOrEqual(l: Literal, a: AttributeReference) => minBelow(stats, types, a, l, strict = false)
    case LessThan(l: Literal, a: AttributeReference) => maxAbove(stats, types, a, l, strict = true)
    case LessThanOrEqual(l: Literal, a: AttributeReference) => maxAbove(stats, types, a, l, strict = false)
    case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
      vs.exists(v => rangeHas(stats, types, a, v.asInstanceOf[Literal], v.asInstanceOf[Literal]))
    case InSet(a: AttributeReference, vs) =>
      vs.exists(v => rangeHas(stats, types, a, Literal.create(v, a.dataType), Literal.create(v, a.dataType)))
    // IsNull/IsNotNull/Not/functions/casts: no null counts in the manifest
    // and no interval algebra for arbitrary exprs — keep the file
    case _ => true
  }

  // [min,max] ∩ [lo,hi] ≠ ∅ where lo=hi=the literal for equality
  private def rangeHas(stats: Map[String, (String, String)],
                       types: Map[String, org.apache.spark.sql.types.DataType],
                       a: AttributeReference, lo: Literal, hi: Literal): Boolean =
    maxAbove(stats, types, a, lo, strict = false) &&
      minBelow(stats, types, a, hi, strict = false)

  /** false only when the file's max is provably below the literal. */
  private def maxAbove(stats: Map[String, (String, String)],
                       types: Map[String, org.apache.spark.sql.types.DataType],
                       a: AttributeReference, l: Literal, strict: Boolean): Boolean =
    statBound(stats, a).forall { case (_, mx) =>
      cmp(mx, l, types.get(a.name.toLowerCase)).forall(c => if (strict) c > 0 else c >= 0)
    }

  /** false only when the file's min is provably above the literal. */
  private def minBelow(stats: Map[String, (String, String)],
                       types: Map[String, org.apache.spark.sql.types.DataType],
                       a: AttributeReference, l: Literal, strict: Boolean): Boolean =
    statBound(stats, a).forall { case (mn, _) =>
      cmp(mn, l, types.get(a.name.toLowerCase)).forall(c => if (strict) c < 0 else c <= 0)
    }

  private def statBound(stats: Map[String, (String, String)],
                        a: AttributeReference): Option[(String, String)] =
    stats.collectFirst { case (k, v) if k.equalsIgnoreCase(a.name) => v }

  /** Compare a manifest stat string against a literal. None → incomparable
    * (caller keeps the file). Numeric columns compare as doubles; string
    * columns lexically (manifest stats for strings ARE the string values).
    * Date/timestamp/etc literals carry internal encodings that don't match
    * the manifest's display strings, so they are left incomparable. */
  private def cmp(stat: String, l: Literal,
                  dt: Option[org.apache.spark.sql.types.DataType]): Option[Int] = {
    def num(litVal: Double): Option[Int] =
      try Some(java.lang.Double.compare(stat.toDouble, litVal))
      catch { case _: NumberFormatException => None }
    l.value match {
      case null => None
      case s: UTF8String if dt.contains(StringType) => Some(stat.compareTo(s.toString))
      case d: org.apache.spark.sql.types.Decimal => num(d.toDouble)
      case n: java.lang.Number => num(n.doubleValue())
      case _ => None
    }
  }
}
